"""Format-dispatched table I/O: one entry point over the source formats a
validation pipeline meets (the reference is I/O-free — its only inputs are
schema documents via SetLoader, SURVEY §2.1 — so this surface is the
engine's own).

- parquet: column pruning + row-group filtering pushed INTO the read
  (`columns=` / `filter=` reach ray.data.read_parquet) — the only format
  whose scan cost shrinks with the projection;
- csv / json(l): full-row scan formats; the projection is applied as the
  first operator after the read so only requested columns enter the
  pipeline (and the object store);
- lance: gated behind an import-try (wheel not present in this
  environment) with a clear error naming the missing dependency.
"""

from __future__ import annotations

import os


_EXT_FORMAT = {
    ".parquet": "parquet", ".pq": "parquet",
    ".csv": "csv",
    ".json": "json", ".jsonl": "json", ".ndjson": "json",
    ".lance": "lance",
}


def _infer_format(path: str) -> str:
    ext = os.path.splitext(path.rstrip("/"))[1].lower()
    fmt = _EXT_FORMAT.get(ext)
    if fmt is None:
        raise ValueError(
            f"cannot infer table format from {path!r}; pass format=")
    return fmt


def read_table(paths, format: str = None, columns: list[str] = None,
               **read_kwargs):
    """→ ray.data.Dataset. ``paths``: file, directory, or list.
    ``format`` inferred from the extension when omitted."""
    import ray.data as rd
    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    fmt = format or _infer_format(first)
    if fmt == "parquet":
        return rd.read_parquet(paths, columns=columns, **read_kwargs)
    if fmt == "csv":
        ds = rd.read_csv(paths, **read_kwargs)
    elif fmt == "json":
        ds = rd.read_json(paths, **read_kwargs)
    elif fmt == "lance":
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "lance format requires the `lance` wheel, which is not "
                "installed in this environment") from e
        ds = rd.read_lance(paths, **read_kwargs)
    else:
        raise ValueError(f"unknown table format {fmt!r}")
    if columns:
        ds = ds.select_columns(columns)
    return ds


def write_table(ds, path: str, format: str = None, **write_kwargs):
    """Dataset → files under ``path`` (directory). Parquet is the scale
    default (partitioned, resumable); csv/json for interop exports."""
    fmt = format or _infer_format(path)
    if fmt == "parquet":
        return ds.write_parquet(path, **write_kwargs)
    if fmt == "csv":
        return ds.write_csv(path, **write_kwargs)
    if fmt == "json":
        return ds.write_json(path, **write_kwargs)
    raise ValueError(f"unknown table format {fmt!r}")
