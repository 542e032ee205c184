"""Exact deduplication: hash-partition + per-group first-wins (ray_guide
'Exact dedup' pattern; the table-level analog of uniqueItems,
validator.go:1067-1111).

Scale design: the ONLY shuffle moves (hash_hi:int64, hash_lo:int64,
id) rows — a 128-bit content hash as the group key, never the text.
The two 64-bit halves are computed under DIFFERENT siphash keys
(sketches/hashing.py ``_sip_key``), so they are genuinely independent
functions: a corpus-level collision needs ~2^64 distinct documents
(128-bit birthday bound). For 64-bit numeric columns the hash is a
splitmix64 bijection — zero collisions among VALUES (a null element maps
to one fixed pseudorandom sentinel, see sketches/hashing._null_sentinel).
``exact_dedup`` emits surviving full rows WITHOUT shuffling them: the
narrow pass finds the LOSER (id, hash) triples plus a null-id channel
(usually tiny), and a second broadcast-filter scan drops them — two
streaming reads beat one 100-TB shuffle."""

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

    def fn(b: pa.Table) -> pa.Table:
        b = _add_hash128(b, col_name=text_col)
        return b.select(["_h1", "_h2", id_col])

    return ds.select_columns([text_col, id_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)


def _hashed_ids_flagged(ds, text_col: str, id_col: str,
                        batch_size: int = 65536):
    """(hash_hi, hash_lo, id_filled, _nid) — like :func:`_hashed_ids`
    but null ids are FILLED (0 / "") and flagged in ``_nid`` so the
    pandas partition roundtrip never converts the id column to float64
    (which would silently round ids > 2^53 and make NaN lose every
    min-id comparison)."""
    import pyarrow.compute as pc

    def fn(b: pa.Table) -> pa.Table:
        b = _add_hash128(b, col_name=text_col)
        ids = b.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        nid = pc.is_null(ids)
        if ids.null_count:
            if pa.types.is_string(ids.type) \
                    or pa.types.is_large_string(ids.type):
                fill = ""
            elif pa.types.is_binary(ids.type) \
                    or pa.types.is_large_binary(ids.type):
                fill = b""
            else:
                fill = 0
            ids = pc.fill_null(ids, fill)
        return pa.table({"_h1": b.column("_h1"), "_h2": b.column("_h2"),
                         id_col: ids, "_nid": nid})

    return ds.select_columns([text_col, id_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)


def _hash_group_firsts(tbl: pa.Table, id_col: str
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Per (_h1,_h2) group of an Arrow partition: (row index of the
    min-``id_col`` row — nulls lose; all-null groups yield their first
    null row — and the group size). Pure Arrow + numpy so null-bearing
    int64 id columns never ride a pandas roundtrip (which converts them
    to float64, silently rounding ids past 2^53 — the corruption class
    _hashed_ids_flagged exists to prevent)."""
    import pyarrow.compute as pc
    order = pc.sort_indices(
        tbl, sort_keys=[("_h1", "ascending"), ("_h2", "ascending"),
                        (id_col, "ascending")],
        null_placement="at_end").to_numpy()
    h1 = tbl.column("_h1").to_numpy(zero_copy_only=False)[order]
    h2 = tbl.column("_h2").to_numpy(zero_copy_only=False)[order]
    first = np.ones(len(order), dtype=bool)
    first[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
    starts = np.nonzero(first)[0]
    counts = np.diff(np.append(starts, len(order))).astype(np.int64)
    return order[starts], counts


def exact_dedup_stats(ds, text_col: str = "text", id_col: str = "doc_id",
                      num_partitions: int = None):
    """→ Dataset of ``(doc_id, n_copies)``: min non-null id + multiplicity
    per distinct text (equivalent SQL: SELECT min(id), count(*) GROUP BY
    text — min skips nulls; an all-null-id group emits a null id).
    Shuffle carries 16-byte hashes + ids only; the per-partition groupby
    runs in ARROW so null-bearing int64 ids keep their exact values."""
    from ..util import partitioned_group_apply
    hashed = _hashed_ids(ds, text_col, id_col)
    id_type = ds.schema().base_schema.field(id_col).type

    def stats(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return pa.table({id_col: pa.array([], type=id_type),
                             "n_copies": pa.array([], type=pa.int64())})
        firsts, counts = _hash_group_firsts(tbl, id_col)
        ids = tbl.column(id_col).take(pa.array(firsts, type=pa.int64()))
        return pa.table({id_col: ids, "n_copies": pa.array(counts)})

    return partitioned_group_apply(hashed, ["_h1", "_h2"], stats,
                                   num_partitions=num_partitions,
                                   batch_format="pyarrow")


def _triple_match(b: pa.Table, *, text_col: str, id_col: str,
                  did: np.ndarray, dh1: np.ndarray, dh2: np.ndarray,
                  nh1: np.ndarray = None, nh2: np.ndarray = None
                  ) -> np.ndarray:
    """Row mask: non-null-id rows whose (id, hash128(text)) triple is in
    the sorted-by-id broadcast triple set, plus NULL-id rows whose hash
    pair is in the (nh1, nh2) null-entry set (null ids cannot be matched
    by value). Hashes are computed ONLY for rows whose id hits the set
    (candidate-proportional — the common unique-id corpus pays zero
    rehashing)."""
    import pyarrow.compute as pc
    out = np.zeros(b.num_rows, dtype=bool)
    if b.num_rows == 0:
        return out
    ids_arr = b.column(id_col)
    if isinstance(ids_arr, pa.ChunkedArray):
        ids_arr = ids_arr.combine_chunks()
    valid = pc.is_valid(ids_arr).to_numpy(zero_copy_only=False)
    vals = ids_arr.to_numpy(zero_copy_only=False)
    cidx = np.zeros(0, dtype=np.int64)
    if len(did) and valid.any():
        vidx = np.nonzero(valid)[0]
        vv = vals[vidx]
        lo = np.searchsorted(did, vv, side="left")
        hi = np.searchsorted(did, vv, side="right")
        cand = hi > lo
        cidx = vidx[cand]
        clo, chi = lo[cand], hi[cand]
    nidx = np.nonzero(~valid)[0] if nh1 is not None and len(nh1) \
        else np.zeros(0, dtype=np.int64)
    if len(cidx) == 0 and len(nidx) == 0:
        return out
    allidx = np.concatenate([cidx, nidx])
    sub = _add_hash128(b.take(pa.array(allidx, type=pa.int64())),
                       col_name=text_col)
    h1 = sub.column("_h1").to_numpy()
    h2 = sub.column("_h2").to_numpy()
    nc = len(cidx)
    if nc:
        match = np.zeros(nc, dtype=bool)
        single = (chi - clo) == 1
        match[single] = (dh1[clo[single]] == h1[:nc][single]) & \
            (dh2[clo[single]] == h2[:nc][single])
        for i in np.nonzero(~single)[0]:  # rare: ids duplicated in set
            match[i] = bool(((dh1[clo[i]:chi[i]] == h1[i])
                             & (dh2[clo[i]:chi[i]] == h2[i])).any())
        out[cidx[match]] = True
    for j, row in enumerate(nidx):  # null-id rows are rare: plain loop
        p1, p2 = h1[nc + j], h2[nc + j]
        lo = np.searchsorted(nh1, p1, side="left")
        hi = np.searchsorted(nh1, p1, side="right")
        if hi > lo and (nh2[lo:hi] == p2).any():
            out[row] = True
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
    hashed = _hashed_ids_flagged(ds, text_col, id_col)

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        # null-id rows (flagged _nid, id filled) never win against a
        # non-null id; a text present ONLY under null ids keeps exactly
        # one copy via the flagged re-add (copies are indistinguishable)
        nn = df.loc[~df["_nid"]]
        g = nn.groupby(["_h1", "_h2"], sort=False)[id_col]
        mins = g.transform("min")
        is_min = nn[id_col] == mins
        out = nn.loc[~is_min, [id_col, "_h1", "_h2"]]
        out = out.assign(_dw=np.zeros(len(out), dtype=bool),
                         _nid=np.zeros(len(out), dtype=bool))
        md = nn.loc[is_min]
        sizes = md.groupby(["_h1", "_h2"], sort=False)[id_col] \
            .transform("size")
        dw = md.loc[sizes > 1, [id_col, "_h1", "_h2"]].drop_duplicates()
        parts = [out]
        if len(dw):
            parts.append(dw.assign(_dw=np.ones(len(dw), dtype=bool),
                                   _nid=np.zeros(len(dw), dtype=bool)))
        na = df.loc[df["_nid"], [id_col, "_h1", "_h2"]]
        if len(na):
            napairs = na.drop_duplicates(["_h1", "_h2"])
            nnpairs = nn[["_h1", "_h2"]].drop_duplicates()
            merged = napairs.merge(nnpairs, on=["_h1", "_h2"],
                                   how="left", indicator=True)
            # text also has a non-null-id row → every null copy loses;
            # text exists only under null ids → drop all + re-add one
            lose = merged["_merge"] == "both"
            parts.append(merged.loc[lose, [id_col, "_h1", "_h2"]]
                         .assign(_dw=False, _nid=True))
            parts.append(merged.loc[~lose, [id_col, "_h1", "_h2"]]
                         .assign(_dw=True, _nid=True))
        return pd.concat(parts, ignore_index=True) if len(parts) > 1 \
            else out

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

        def firstwin(tbl: pa.Table) -> pa.Table:
            # ARROW in-partition first-wins: the full rows (arbitrary
            # user payload columns) must not ride a pandas roundtrip —
            # one null in any int64 column would flip it to float64 and
            # silently round values past 2^53
            if tbl.num_rows == 0:
                return tbl.drop_columns(["_h1", "_h2"])
            firsts, _ = _hash_group_firsts(tbl, id_col)
            take = pa.array(np.sort(firsts), type=pa.int64())
            return tbl.take(take).drop_columns(["_h1", "_h2"])

        return partitioned_group_apply(rehashed, ["_h1", "_h2"], firstwin,
                                       num_partitions=num_partitions,
                                       batch_format="pyarrow")

    ldf = losers_ds.to_pandas()
    if ldf.empty:
        return ds

    def split_state(frame: pd.DataFrame):
        """(sorted id-triples, sorted null-entry hash pairs)."""
        t = frame.loc[~frame["_nid"]]
        order = np.argsort(t[id_col].to_numpy(), kind="stable")
        nulls = frame.loc[frame["_nid"]]
        norder = np.argsort(nulls["_h1"].to_numpy(), kind="stable")
        return (t[id_col].to_numpy()[order],
                t["_h1"].to_numpy()[order], t["_h2"].to_numpy()[order],
                nulls["_h1"].to_numpy()[norder],
                nulls["_h2"].to_numpy()[norder])

    drop_ref = ray.put(split_state(ldf))

    def keep(b: pa.Table) -> pa.Table:
        did, dh1, dh2, nh1, nh2 = worker_cached(
            ("dedup_drop", drop_ref.hex()), lambda: ray.get(drop_ref))
        hit = _triple_match(b, text_col=text_col, id_col=id_col,
                            did=did, dh1=dh1, dh2=dh2, nh1=nh1, nh2=nh2)
        if not hit.any():
            return b
        return b.filter(pa.array(~hit))

    main = ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)
    dw = ldf.loc[ldf["_dw"]]
    if dw.empty:
        return main

    # indistinguishable copies (identical full rows, or null-id-only
    # texts): every copy was dropped above; gather the tiny flagged
    # subset in one extra scan and re-add exactly one copy each
    dw_ref = ray.put(split_state(dw))

    def grab(b: pa.Table) -> pa.Table:
        gid, gh1, gh2, gn1, gn2 = worker_cached(
            ("dedup_dw", dw_ref.hex()), lambda: ray.get(dw_ref))
        hit = _triple_match(b, text_col=text_col, id_col=id_col,
                            did=gid, dh1=gh1, dh2=gh2, nh1=gn1, nh2=gn2)
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
        cdf.groupby([id_col, "_h1", "_h2"], sort=False,
                    dropna=False).head(1).index.to_numpy())
    one_each = tbl.take(pa.array(first_idx, type=pa.int64())) \
        .drop_columns(["_h1", "_h2"])
    return main.union(rd.from_arrow(one_each))
