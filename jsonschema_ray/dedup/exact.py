"""Exact deduplication: hash-partition + per-group first-wins (ray_guide
'Exact dedup' pattern; the table-level analog of uniqueItems,
validator.go:1067-1111).

Scale design: the ONLY shuffle moves (hash_hi:int64, hash_lo:int64,
id) rows — a 128-bit content hash as the group key, never the text.
The two 64-bit halves are computed under DIFFERENT siphash keys
(sketches/hashing.py ``_sip_key``), so they are genuinely independent
functions: a corpus-level collision needs ~2^64 distinct documents
(128-bit birthday bound). For 64-bit numeric columns the hash is a
splitmix64 bijection — zero collisions outright. ``exact_dedup`` emits
surviving full rows WITHOUT shuffling them: the narrow pass finds the
LOSER ids (usually tiny), and a second broadcast-filter scan drops
them — two streaming reads beat one 100-TB shuffle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches.hashing import hash64_array


def _add_hash128(batch: pa.Table, *, col_name: str) -> pa.Table:
    col = batch.column(col_name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    h1 = hash64_array(col).view(np.int64)
    h2 = hash64_array(col, seed=0x5851F42D4C957F2D).view(np.int64)
    batch = batch.append_column("_h1", pa.array(h1))
    return batch.append_column("_h2", pa.array(h2))


def _hashed_ids(ds, text_col: str, id_col: str, batch_size: int = 65536):
    """(hash_hi, hash_lo, id) — the narrow shuffle input."""
    import functools

    def fn(b: pa.Table) -> pa.Table:
        b = _add_hash128(b, col_name=text_col)
        return b.select(["_h1", "_h2", id_col])

    return ds.select_columns([text_col, id_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)


def exact_dedup_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_partitions: int = None):
    """→ Dataset of ``(doc_id, n_copies)``: min id + multiplicity per
    distinct text (equivalent SQL: SELECT min(id), count(*) GROUP BY
    text). Shuffle carries 16-byte hashes + ids only."""
    from ..util import partitioned_group_apply
    hashed = _hashed_ids(ds, text_col, id_col)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["_h1", "_h2"], sort=False)[id_col] \
            .agg(["min", "count"])
        return pd.DataFrame({id_col: agg["min"].to_numpy(),
                             "n_copies": agg["count"].to_numpy()
                             .astype(np.int64)})

    return partitioned_group_apply(hashed, ["_h1", "_h2"], stats,
                                   num_partitions=num_partitions)


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = None,
                broadcast_ids_cap: int = 1 << 30):
    """→ Dataset with one row per distinct ``text_col`` value — the row
    with the smallest ``id_col`` wins (deterministic). The text never
    shuffles: the narrow 128-bit-hash pass identifies the LOSER ids
    (duplicate rows to drop — |rows| − |distinct texts|, tiny for the
    mostly-unique corpora this targets, unlike the winner set which is
    corpus-proportional), and a second streaming scan broadcast-filters
    them out. If the loser set itself exceeds ``broadcast_ids_cap``
    (pathologically duplicated corpus), falls back to a distributed
    inner join of the corpus against the winner ids — one full shuffle,
    degraded but correct."""
    import ray

    from ..util import auto_partitions, partitioned_group_apply, \
        worker_cached
    hashed = _hashed_ids(ds, text_col, id_col)

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        mins = df.groupby(["_h1", "_h2"], sort=False)[id_col] \
            .transform("min")
        return df.loc[df[id_col] != mins, [id_col]]

    losers_ds = partitioned_group_apply(
        hashed, ["_h1", "_h2"], losers,
        num_partitions=num_partitions).materialize()
    if losers_ds.size_bytes() <= broadcast_ids_cap:
        drop = np.sort(losers_ds.to_pandas()[id_col].to_numpy())
        drop_ref = ray.put(drop)

        def keep(b: pa.Table) -> pa.Table:
            w = worker_cached(("dedup_drop", drop_ref.hex()),
                              lambda: ray.get(drop_ref))
            vals = b.column(id_col).to_numpy(zero_copy_only=False)
            if len(w) == 0:
                return b
            pos = np.clip(np.searchsorted(w, vals), 0, len(w) - 1)
            return b.filter(pa.array(w[pos] != vals))

        return ds.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)
    winner_ids = exact_dedup_stats(
        ds, text_col=text_col, id_col=id_col,
        num_partitions=num_partitions).select_columns([id_col])
    jp = max(2, (num_partitions or auto_partitions()) // 4)
    return ds.join(winner_ids, "inner", jp, on=(id_col,))
