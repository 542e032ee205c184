"""Exact deduplication: hash-partition + per-group first-wins (ray_guide
'Exact dedup' pattern; the table-level analog of uniqueItems,
validator.go:1067-1111).

Scale design: group on a 64-bit CONTENT HASH (narrow) rather than the text
itself, so the shuffle moves 8-byte keys + ids; exactness is preserved by
re-verifying the full text inside each hash bucket (collisions split)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches.hashing import hash64_array


def _add_hash(batch: pa.Table, *, col_name: str) -> pa.Table:
    col = batch.column(col_name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h = hash64_array(col).view(np.int64)
    return batch.append_column("_content_hash", pa.array(h))


def _with_hash(ds, text_col: str, columns=None, batch_size: int = 65536):
    import functools
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds.map_batches(
        functools.partial(_add_hash, col_name=text_col),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = 64):
    """→ Dataset with one row per distinct ``text_col`` value — the row with
    the smallest ``id_col`` wins (deterministic). One coarse hash-partition
    shuffle on the content hash; within each partition a fully vectorized
    pandas groupby picks winners (exact even under hash collisions: the
    group key is the text itself)."""
    from ..util import partitioned_group_apply
    hashed = _with_hash(ds, text_col)

    def winners(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(id_col)
                .groupby(text_col, sort=False, as_index=False).first()
                .drop(columns=["_content_hash"]))

    return partitioned_group_apply(hashed, ["_content_hash"], winners,
                                   num_partitions=num_partitions)


def exact_dedup_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_partitions: int = 64):
    """→ Dataset of ``(doc_id, n_copies)``: min id + multiplicity per
    distinct text (equivalent SQL: SELECT min(id), count(*) GROUP BY text)."""
    from ..util import partitioned_group_apply
    hashed = _with_hash(ds, text_col, columns=[text_col, id_col])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(text_col, sort=False)[id_col].agg(["min", "count"])
        return pd.DataFrame({id_col: agg["min"].to_numpy(),
                             "n_copies": agg["count"].to_numpy()
                             .astype(np.int64)})

    return partitioned_group_apply(hashed, ["_content_hash"], stats,
                                   num_partitions=num_partitions)
