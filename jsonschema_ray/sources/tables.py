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


def write_sharded(ds, out_dir: str, key_col: str, num_shards: int = 64,
                  **write_kwargs):
    """Deterministic key-sharded parquet export with a manifest commit
    marker — the resumable training-data output layout.

    ``shard = siphash64(key) % num_shards`` is a pure function of the
    key value (stable across runs, repartitioning, and cluster sizes),
    so every run lays the same rows in the same ``shard=N/`` directory
    and a consumer can skip shards it already ingested. The manifest
    (``_MANIFEST.json``: per-shard row counts from the written parquet
    footers, key column, shard count) is written LAST as the commit
    marker — a torn export has no manifest and readers refuse it
    loudly. A non-empty ``out_dir`` that is not a sharded export (no
    manifest, no staging marker) is refused rather than clobbered; an
    existing export or torn export is replaced.

    Scale shape: ONE pass over the corpus (the hash-mod tag is a
    per-batch map; Ray's partitioned write groups rows into shard
    directories without a driver gather). Returns the manifest dict.
    """
    import glob
    import json
    import os
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sketches.hashing import hash64_array

    if num_shards < 1:
        raise ValueError(f"write_sharded: num_shards must be >= 1, "
                         f"got {num_shards}")
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        entries = os.listdir(out_dir)
        if "_MANIFEST.json" not in entries and "_STAGING" not in entries:
            raise ValueError(
                f"out_dir {out_dir!r} is non-empty and not a sharded "
                "export (no _MANIFEST.json) — refusing to overwrite")
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    open(os.path.join(out_dir, "_STAGING"), "w").close()

    def tag(b: pa.Table) -> pa.Table:
        col = b.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = hash64_array(col)                      # nulls → sentinel
        shard = (h % np.uint64(num_shards)).astype(np.int64)
        return b.append_column("shard", pa.array(shard))

    ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True) \
        .write_parquet(out_dir, partition_cols=["shard"], **write_kwargs)

    counts = {}
    for f in glob.glob(os.path.join(out_dir, "shard=*", "*.parquet")):
        s = int(os.path.basename(os.path.dirname(f)).split("=", 1)[1])
        counts[s] = counts.get(s, 0) + pq.read_metadata(f).num_rows
    manifest = {"key_col": key_col, "num_shards": num_shards,
                "rows": int(sum(counts.values())),
                "shard_rows": {str(s): int(n)
                               for s, n in sorted(counts.items())}}
    with open(os.path.join(out_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f)
    os.remove(os.path.join(out_dir, "_STAGING"))
    return manifest


def read_sharded(out_dir: str, shards: list[int] | None = None,
                 columns: list[str] = None, **read_kwargs):
    """Read back a :func:`write_sharded` export — all shards, or only
    the named ones (the resume path: a consumer reads the shards its
    own ledger lacks). Refuses a torn export (no committed manifest)."""
    import json
    import os

    import ray.data as rd

    mpath = os.path.join(out_dir, "_MANIFEST.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"{out_dir!r} has no _MANIFEST.json — not a committed "
            "sharded export (torn write, or wrong directory)")
    with open(mpath) as f:
        manifest = json.load(f)
    import glob
    if shards is None:
        wanted = sorted(int(k) for k in manifest["shard_rows"])
    else:
        missing = [s for s in shards
                   if str(s) not in manifest["shard_rows"]]
        if missing:
            raise ValueError(f"shards {missing} not in the manifest "
                             f"(export has {manifest['num_shards']} "
                             "shards; empty shards hold no rows)")
        wanted = list(shards)
    # expand to files: Ray's read_parquet does not expand directories
    # inside a path LIST
    paths = [f for s in wanted
             for f in sorted(glob.glob(
                 os.path.join(out_dir, f"shard={s}", "*.parquet")))]
    if not paths:
        import pyarrow as pa
        return rd.from_arrow(pa.table({}))
    return rd.read_parquet(paths, columns=columns, **read_kwargs)
