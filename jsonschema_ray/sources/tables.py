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
    footers, key column, shard count, serialized row schema) is written
    LAST as the commit marker — a torn export has no manifest and
    readers refuse it loudly.

    The write is STAGED: everything lands in a sibling ``.staging``
    directory and only a fully committed build swaps into ``out_dir``,
    so a doomed run (typo'd key column, crash mid-write) never destroys
    an existing good export. A non-empty ``out_dir`` that is not a
    sharded export is refused rather than clobbered. ``shard`` is a
    reserved output column name and refused on the input.

    Scale shape: ONE pass over the corpus (the hash-mod tag is a
    per-batch map; Ray's partitioned write groups rows into shard
    directories without a driver gather). Returns the manifest dict.
    """
    import base64
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
    # validate BEFORE touching any directory, whenever Ray already
    # knows the schema (in-memory / read sources; a lazy pipeline's
    # schema would cost an execution — its tag() check still fails
    # before the staged swap, so the committed export survives)
    known = ds.schema(fetch_if_missing=False)
    if known is not None:
        names = known.names
        if key_col not in names:
            raise ValueError(f"write_sharded: key column {key_col!r} "
                             f"not in the dataset (columns: {names})")
        if "shard" in names:
            raise ValueError("write_sharded: 'shard' is the reserved "
                             "partition column — rename the input's")
    if os.path.isdir(out_dir) and os.listdir(out_dir)             and "_MANIFEST.json" not in os.listdir(out_dir):
        raise ValueError(
            f"out_dir {out_dir!r} is non-empty and not a sharded "
            "export (no _MANIFEST.json) — refusing to overwrite")
    stage = out_dir.rstrip("/") + ".staging"
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)

    def tag(b: pa.Table) -> pa.Table:
        if "shard" in b.column_names:
            raise ValueError("write_sharded: 'shard' is the reserved "
                             "partition column — rename the input's")
        col = b.column(key_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        h = hash64_array(col)                      # nulls → sentinel
        shard = (h % np.uint64(num_shards)).astype(np.int64)
        return b.append_column("shard", pa.array(shard))

    ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True) \
        .write_parquet(stage, partition_cols=["shard"], **write_kwargs)

    counts = {}
    schema = None
    for f in glob.glob(os.path.join(stage, "shard=*", "*.parquet")):
        s_ = int(os.path.basename(os.path.dirname(f)).split("=", 1)[1])
        counts[s_] = counts.get(s_, 0) + pq.read_metadata(f).num_rows
        if schema is None:
            schema = pq.read_schema(f)   # hive write drops 'shard'
    manifest = {"key_col": key_col, "num_shards": num_shards,
                "rows": int(sum(counts.values())),
                "shard_rows": {str(s_): int(n)
                               for s_, n in sorted(counts.items())},
                "schema_b64": base64.b64encode(
                    schema.serialize().to_pybytes()).decode()
                if schema is not None else None}
    with open(os.path.join(stage, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f)
    # commit: swap the staged build in (the old export is gone only
    # after the new one is fully built)
    old = out_dir.rstrip("/") + ".old"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.isdir(out_dir):
        os.rename(out_dir, old)
    os.rename(stage, out_dir)
    shutil.rmtree(old, ignore_errors=True)
    return manifest


def read_sharded(out_dir: str, shards: list[int] | None = None,
                 columns: list[str] = None, **read_kwargs):
    """Read back a :func:`write_sharded` export — all shards, or only
    the named ones (the resume path: a consumer reads the shards its
    own ledger lacks). Schema-preserving: the read passes
    ``partitioning=None`` so the hive path component is NOT re-inferred
    as a string column (shard membership is the directory; the manifest
    has per-shard counts). A shard id in ``[0, num_shards)`` that holds
    no rows reads as zero rows, typed from the manifest's stored
    schema; out-of-range ids are refused. Refuses a torn export (no
    committed manifest)."""
    import base64
    import glob
    import json
    import os

    import pyarrow as pa
    import ray.data as rd

    mpath = os.path.join(out_dir, "_MANIFEST.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"{out_dir!r} has no _MANIFEST.json — not a committed "
            "sharded export (torn write, or wrong directory)")
    with open(mpath) as f:
        manifest = json.load(f)
    if shards is None:
        wanted = sorted(int(k) for k in manifest["shard_rows"])
    else:
        bad = [s for s in shards
               if not 0 <= int(s) < manifest["num_shards"]]
        if bad:
            raise ValueError(
                f"shards {bad} out of range for a "
                f"{manifest['num_shards']}-shard export")
        wanted = list(shards)   # absent ids are legitimately empty
    paths = [f for s in wanted
             for f in sorted(glob.glob(
                 os.path.join(out_dir, f"shard={s}", "*.parquet")))]
    if not paths:
        if manifest.get("schema_b64"):
            schema = pa.ipc.read_schema(pa.BufferReader(
                base64.b64decode(manifest["schema_b64"])))
            if columns:
                schema = pa.schema([schema.field(c) for c in columns])
            return rd.from_arrow(pa.Table.from_arrays(
                [pa.array([], type=f.type) for f in schema],
                schema=schema))
        return rd.from_arrow(pa.table({}))
    return rd.read_parquet(paths, columns=columns, partitioning=None,
                           **read_kwargs)
