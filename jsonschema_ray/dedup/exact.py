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


def _triple_match(b: pa.Table, *, text_col: str, id_col: str,
                  did: np.ndarray, dh1: np.ndarray,
                  dh2: np.ndarray) -> np.ndarray:
    """Row mask: batch rows whose (id, hash128(text)) triple is in the
    sorted-by-id broadcast triple set. Hashes are computed ONLY for rows
    whose id hits the set (candidate-proportional — the common unique-id
    corpus pays zero rehashing)."""
    vals = b.column(id_col).to_numpy(zero_copy_only=False)
    out = np.zeros(b.num_rows, dtype=bool)
    if len(did) == 0 or b.num_rows == 0:
        return out
    lo = np.searchsorted(did, vals, side="left")
    hi = np.searchsorted(did, vals, side="right")
    cand = hi > lo
    if not cand.any():
        return out
    cidx = np.nonzero(cand)[0]
    sub = _add_hash128(b.take(pa.array(cidx, type=pa.int64())),
                       col_name=text_col)
    h1 = sub.column("_h1").to_numpy()
    h2 = sub.column("_h2").to_numpy()
    clo, chi = lo[cidx], hi[cidx]
    match = np.zeros(len(cidx), dtype=bool)
    single = (chi - clo) == 1
    match[single] = (dh1[clo[single]] == h1[single]) & \
        (dh2[clo[single]] == h2[single])
    for i in np.nonzero(~single)[0]:  # rare: ids duplicated in the set
        match[i] = bool(((dh1[clo[i]:chi[i]] == h1[i])
                         & (dh2[clo[i]:chi[i]] == h2[i])).any())
    out[cidx[match]] = True
    return out


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = None,
                broadcast_ids_cap: int = 1 << 30,
                dup_winner_cap: int = 256 << 20):
    """→ Dataset with one row per distinct ``text_col`` value — a row
    with the smallest ``id_col`` for that value wins (deterministic).
    Duplicate ids are fully supported: the drop set is (id, hash128)
    TRIPLES, so a loser id that also names a DIFFERENT text elsewhere
    never drags that row down with it, and identical full rows (same id
    AND same text — where a broadcast filter cannot tell copies apart)
    are flagged in the narrow pass, dropped from the stream, and exactly
    one copy re-added from a tiny cap-gated gather.

    The text never shuffles on the main path: the narrow 128-bit-hash
    pass identifies the LOSER triples (|rows| − |distinct texts|, tiny
    for the mostly-unique corpora this targets, unlike the winner set
    which is corpus-proportional), and a second streaming scan
    broadcast-filters them out, rehashing ONLY rows whose id hits the
    drop set. If the loser set exceeds ``broadcast_ids_cap``
    (pathologically duplicated corpus), falls back to ONE full-row
    hash-partition on the content hash with an in-partition first-wins —
    a full shuffle, degraded but correct for every id pattern."""
    import functools

    import ray
    import ray.data as rd

    from ..util import partitioned_group_apply, worker_cached
    hashed = _hashed_ids(ds, text_col, id_col)

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["_h1", "_h2"], sort=False)[id_col]
        mins = g.transform("min")
        is_min = df[id_col] == mins
        out = df.loc[~is_min, [id_col, "_h1", "_h2"]]
        out = out.assign(_dw=np.zeros(len(out), dtype=bool))
        md = df.loc[is_min]
        sizes = md.groupby(["_h1", "_h2"], sort=False)[id_col] \
            .transform("size")
        dw = md.loc[sizes > 1, [id_col, "_h1", "_h2"]].drop_duplicates()
        if len(dw):
            out = pd.concat(
                [out, dw.assign(_dw=np.ones(len(dw), dtype=bool))],
                ignore_index=True)
        return out

    losers_ds = partitioned_group_apply(
        hashed, ["_h1", "_h2"], losers,
        num_partitions=num_partitions).materialize()
    if losers_ds.size_bytes() > broadcast_ids_cap:
        # degraded path: ONE full-row shuffle keyed on the content hash,
        # first-wins (min id, one copy) inside each partition — correct
        # under any id duplication, at the cost of moving the text
        rehashed = ds.map_batches(
            functools.partial(_add_hash128, col_name=text_col),
            batch_format="pyarrow", zero_copy_batch=True)

        def firstwin(df: pd.DataFrame) -> pd.DataFrame:
            first = df.sort_values(id_col, kind="stable") \
                .groupby(["_h1", "_h2"], sort=False).head(1)
            return first.drop(columns=["_h1", "_h2"])

        return partitioned_group_apply(rehashed, ["_h1", "_h2"], firstwin,
                                       num_partitions=num_partitions)

    ldf = losers_ds.to_pandas()
    if ldf.empty:
        return ds
    order = np.argsort(ldf[id_col].to_numpy(), kind="stable")
    state = (ldf[id_col].to_numpy()[order],
             ldf["_h1"].to_numpy()[order], ldf["_h2"].to_numpy()[order])
    drop_ref = ray.put(state)

    def keep(b: pa.Table) -> pa.Table:
        did, dh1, dh2 = worker_cached(("dedup_drop", drop_ref.hex()),
                                      lambda: ray.get(drop_ref))
        hit = _triple_match(b, text_col=text_col, id_col=id_col,
                            did=did, dh1=dh1, dh2=dh2)
        if not hit.any():
            return b
        return b.filter(pa.array(~hit))

    main = ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)
    dw = ldf.loc[ldf["_dw"]]
    if dw.empty:
        return main

    # identical full rows: every copy was dropped above; gather the tiny
    # flagged subset in one extra scan and re-add exactly one copy each
    dworder = np.argsort(dw[id_col].to_numpy(), kind="stable")
    dwstate = (dw[id_col].to_numpy()[dworder],
               dw["_h1"].to_numpy()[dworder], dw["_h2"].to_numpy()[dworder])
    dw_ref = ray.put(dwstate)

    def grab(b: pa.Table) -> pa.Table:
        gid, gh1, gh2 = worker_cached(("dedup_dw", dw_ref.hex()),
                                      lambda: ray.get(dw_ref))
        hit = _triple_match(b, text_col=text_col, id_col=id_col,
                            did=gid, dh1=gh1, dh2=gh2)
        sub = b.filter(pa.array(hit))
        return _add_hash128(sub, col_name=text_col)

    copies = ds.map_batches(grab, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    if copies.size_bytes() > dup_winner_cap:
        raise ValueError(
            "exact_dedup: flagged identical-row copies exceed "
            f"dup_winner_cap ({copies.size_bytes()} > {dup_winner_cap} B) "
            "— lower broadcast_ids_cap to force the full-shuffle path")
    tbl = pa.concat_tables(
        [pa.Table.from_batches(t.to_batches(), schema=t.schema)
         for t in ray.get(copies.to_arrow_refs())])
    cdf = tbl.select([id_col, "_h1", "_h2"]).to_pandas()
    first_idx = np.sort(
        cdf.groupby([id_col, "_h1", "_h2"], sort=False).head(1)
        .index.to_numpy())
    one_each = tbl.take(pa.array(first_idx, type=pa.int64())) \
        .drop_columns(["_h1", "_h2"])
    return main.union(rd.from_arrow(one_each))
