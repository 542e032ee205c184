"""Embedding-cosine near-duplicate detection: random-hyperplane LSH
(Charikar 2002 SimHash for angles) to bucket, exact cosine verify over
candidate pairs, OR-amplified across ``tables`` independent hyperplane
sets (recall ≈ 1-(1-p^planes)^tables instead of a single table's
p^planes).

Scale shape (same discipline as dedup.minhash):
  - the ONLY corpus-sized shuffle moves (bucket:int64, key:int64) rows —
    16 bytes per (row, table); the vectors NEVER travel with it.  ``key``
    is the id itself for integer ids, else hash64(id).
  - in-bucket candidate pairs (capped against skew) are deduped across
    tables, then unit vectors for CANDIDATE keys only are recomputed in
    a broadcast-filtered second pass over the corpus; the exact cosine
    runs via a chunked driver gather (pairs driver-resident under a cap)
    or two distributed hash joins above it — candidate-proportional
    work throughout, every driver touch cap-gated."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _unit_rows(batch: pa.Table, vec_col: str) -> np.ndarray:
    """(n, dim) float32 unit vectors from a list<float> column — the
    zero-norm guard lives ONCE in ann.search._unit_rows (shared with the
    exact verify path so bucketing and verification can't diverge)."""
    from ..ann.search import _unit_rows as unit_rows_mat, embedding_matrix
    return unit_rows_mat(embedding_matrix(batch.column(vec_col))) \
        .astype(np.float32)


def _row_keys(batch: pa.Table, id_col: str, int_ids: bool) -> np.ndarray:
    """int64 shuffle key per row. Integer ids are their own key — taken
    via Arrow casts so a null in the batch never detours the column
    through float64 (which silently rounds ALL ids past 2^53 in that
    batch, colliding/mismatching keys ACROSS passes — the bucket pass
    and the candidate-units pass batch differently, so a rounded-here/
    exact-there id loses its pairs). Null ids key to the same fixed
    sentinel hash64_array gives them on the string path (two null-id
    rows therefore pair with each other — the documented convention)."""
    import pyarrow.compute as pc

    from ..sketches.hashing import _null_sentinel, hash64_array
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if int_ids:
        if ids.null_count:
            mask = pc.is_null(ids).to_numpy(zero_copy_only=False)
            vals = pc.fill_null(ids.cast(pa.int64()), 0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            vals[mask] = np.int64(_null_sentinel(0).astype(np.int64))
            return vals
        return ids.cast(pa.int64()).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
    return hash64_array(ids).view(np.int64)


def _hyperplane_bucket(batch: pa.Table, *, vec_col: str, id_col: str,
                       planes: int, seed: int, tables: int,
                       int_ids: bool) -> pa.Table:
    """NARROW bucket rows: (bucket, key) only — 16 B × tables per input
    row through the one large shuffle. The embedding width is observed
    from the batch itself (and keys the cached hyperplane tensor), so
    any corpus width works without a caller-supplied ``dim``."""
    from ..ann.search import embedding_matrix
    from ..util import worker_cached
    vecs = embedding_matrix(batch.column(vec_col))
    dim = vecs.shape[1]
    H = worker_cached(("hyperplanes", dim, planes, seed, tables),
                      lambda: np.random.default_rng(seed)
                      .standard_normal((tables, dim, planes)))
    n = len(vecs)
    keys = _row_keys(batch, id_col, int_ids)
    buckets = []
    for t in range(tables):
        signs = (vecs @ H[t]) > 0
        b = np.zeros(n, dtype=np.uint64)
        for k in range(planes):
            b |= signs[:, k].astype(np.uint64) << np.uint64(k)
        # table id in the high bits: a bucket never spans tables
        buckets.append((np.uint64(t) << np.uint64(56)) | b)
    return pa.table({
        "bucket": pa.array(np.concatenate(buckets).view(np.int64)),
        "key": pa.array(np.tile(keys, tables)),
    })


_EMPTY_KP = pd.DataFrame({"key_a": pd.Series([], dtype=np.int64),
                          "key_b": pd.Series([], dtype=np.int64)})


def _bucket_pairs(max_bucket: int):
    """Per coarse partition: every intra-bucket (capped) key pair —
    vectorized via util.segment_pairs; no vectors, no cosine here."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return _EMPTY_KP.copy()
        from ..util import segment_pairs
        bucket = df["bucket"].to_numpy()
        a_idx, b_idx, order = segment_pairs([bucket], max_bucket)
        if len(a_idx) == 0:
            return _EMPTY_KP.copy()
        keys = df["key"].to_numpy()[order]
        ka, kb = keys[a_idx], keys[b_idx]
        same = ka == kb
        lo, hi = np.minimum(ka, kb), np.maximum(ka, kb)
        return pd.DataFrame({"key_a": lo[~same], "key_b": hi[~same]}) \
            .drop_duplicates(["key_a", "key_b"])
    return fn


def _candidate_units_batch(b: pa.Table, *, vec_col, id_col, int_ids,
                           wanted_ref) -> pa.Table:
    """Second narrow pass: unit vectors ONLY for candidate keys
    (membership via the sorted broadcast key array)."""
    import ray

    from ..util import worker_cached
    wanted = worker_cached(("embdup_wanted", wanted_ref.hex()),
                           lambda: ray.get(wanted_ref))
    keys = _row_keys(b, id_col, int_ids)
    if len(wanted) == 0 or len(keys) == 0:
        sel = np.zeros(len(keys), dtype=bool)
    else:
        pos = np.clip(np.searchsorted(wanted, keys), 0, len(wanted) - 1)
        sel = wanted[pos] == keys
    idx = np.nonzero(sel)[0]
    take = pa.array(idx, type=pa.int64())
    unit = _unit_rows(b.take(take) if len(idx) < b.num_rows else b,
                      vec_col) if len(idx) else \
        np.zeros((0, 1), dtype=np.float32)
    return pa.table({
        "key": pa.array(keys[idx], type=pa.int64()),
        id_col: b.column(id_col).take(take),
        "vec": pa.array([u.tobytes() for u in unit], type=pa.binary()),
    })


def _keyed_units_batch(b: pa.Table, *, vec_col, id_col,
                       int_ids) -> pa.Table:
    """Join-fallback input: (key, id, unit bytes) for EVERY row — only
    used when the candidate-key set exceeds the broadcast cap."""
    unit = _unit_rows(b, vec_col)
    return pa.table({
        "key": pa.array(_row_keys(b, id_col, int_ids), type=pa.int64()),
        id_col: b.column(id_col),
        "vec": pa.array([u.tobytes() for u in unit], type=pa.binary()),
    })


def _pair_cos_batch(b: pa.Table, *, threshold: float) -> pa.Table:
    """Joined (pair × vec_a × vec_b) rows → (id_a, id_b, cosine ≥ t)
    with id_a < id_b by ORIGINAL id value."""
    n = b.num_rows
    ida = b["id_a"].to_numpy(zero_copy_only=False)
    idb = b["id_b"].to_numpy(zero_copy_only=False)
    if n == 0:
        cos = np.zeros(0)
        hit = np.zeros(0, dtype=bool)
    else:
        va = np.frombuffer(b"".join(b["vec_a"].to_pylist()),
                           dtype=np.float32).reshape(n, -1).astype(np.float64)
        vb = np.frombuffer(b"".join(b["vec_b"].to_pylist()),
                           dtype=np.float32).reshape(n, -1).astype(np.float64)
        cos = (va * vb).sum(axis=1)
        hit = cos >= threshold
    ia, ib = ida[hit], idb[hit]
    swap = ia > ib
    id_type = b.schema.field("id_a").type
    return pa.table({
        "id_a": pa.array(np.where(swap, ib, ia), type=id_type),
        "id_b": pa.array(np.where(swap, ia, ib), type=id_type),
        "cosine": pa.array(np.round(cos[hit], 6), type=pa.float64()),
    })


def embedding_near_duplicates(ds, vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              threshold: float = 0.95, planes: int = 12,
                              seed: int = 11, max_bucket: int = 4096,
                              batch_size: int = 8192, tables: int = 4,
                              num_partitions: int = None,
                              driver_pairs_cap: int = 256 << 20,
                              broadcast_key_cap: int = 8 << 30,
                              broadcast_vec_cap: int = 1 << 30):
    """→ Dataset of pairs ``(id_a, id_b, cosine)`` with cosine ≥ threshold
    that share an LSH bucket in ANY of ``tables`` hyperplane tables
    (OR-amplified recall, exact precision). See module doc for the
    cap-gated scale shape."""
    import functools

    import ray
    import ray.data as rd

    from ..util import auto_partitions, partitioned_group_apply
    from .pairsops import collect_keys_if_small, distinct_pairs, \
        pair_key_dataset
    num_partitions = num_partitions or auto_partitions()
    source = ds.select_columns([id_col, vec_col])
    id_type = ds.schema().base_schema.field(id_col).type
    int_ids = pa.types.is_integer(id_type)
    empty = pa.table({"id_a": pa.array([], type=id_type),
                      "id_b": pa.array([], type=id_type),
                      "cosine": pa.array([], type=pa.float64())})

    bucketed = source.map_batches(
        functools.partial(_hyperplane_bucket, vec_col=vec_col,
                          id_col=id_col, planes=planes, seed=seed,
                          tables=tables, int_ids=int_ids),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    raw = partitioned_group_apply(bucketed, ["bucket"],
                                  _bucket_pairs(max_bucket),
                                  num_partitions=num_partitions
                                  ).materialize()

    kdf = pairs_ds = None
    if raw.size_bytes() <= driver_pairs_cap:
        kdf = raw.to_pandas().drop_duplicates(["key_a", "key_b"])
        if kdf.empty:
            return rd.from_arrow(empty)
        wanted = np.unique(np.concatenate([kdf["key_a"].to_numpy(),
                                           kdf["key_b"].to_numpy()]))
    else:
        pairs_ds = distinct_pairs(raw, ["key_a", "key_b"],
                                  num_partitions).materialize()
        keys_ds = pair_key_dataset(pairs_ds, ["key_a", "key_b"],
                                   num_partitions=num_partitions
                                   ).materialize()
        wanted = collect_keys_if_small(keys_ds, broadcast_key_cap)

    jp = max(2, num_partitions // 16)
    if wanted is not None:
        wanted_ref = ray.put(wanted)
        feats = source.map_batches(
            functools.partial(_candidate_units_batch, vec_col=vec_col,
                              id_col=id_col, int_ids=int_ids,
                              wanted_ref=wanted_ref),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size).materialize()  # candidates only
    else:
        keyed = source.map_batches(
            functools.partial(_keyed_units_batch, vec_col=vec_col,
                              id_col=id_col, int_ids=int_ids),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size)
        feats = keyed.join(keys_ds, "inner", jp,
                           on=("key",)).materialize()

    if kdf is not None and feats.size_bytes() <= broadcast_vec_cap:
        # pairs + features are both driver-resident → one chunked gather
        from .pairsops import expand_pair_ranges
        fdf = feats.to_pandas()
        order = np.argsort(fdf["key"].to_numpy(), kind="stable")
        fkeys = fdf["key"].to_numpy()[order]
        fids = fdf[id_col].to_numpy()[order]
        n_f = len(fkeys)
        dim_f = (len(fdf["vec"].iloc[0]) // 4) if n_f else 1
        fmat = np.frombuffer(b"".join(fdf["vec"].iloc[order]),
                             dtype=np.float32).reshape(n_f, dim_f) \
            .astype(np.float64)
        ka = kdf["key_a"].to_numpy()
        kb = kdf["key_b"].to_numpy()
        # expand each key pair over ALL rows per key: a duplicate id
        # shares one key across several vector rows, and scoring only the
        # first row would let a same-id decoy vector suppress a true
        # duplicate the join path (same input, larger cap) reports
        alo = np.searchsorted(fkeys, ka, side="left")
        ahi = np.searchsorted(fkeys, ka, side="right")
        blo = np.searchsorted(fkeys, kb, side="left")
        bhi = np.searchsorted(fkeys, kb, side="right")
        ra, rb = expand_pair_ranges(alo, ahi, blo, bhi)
        parts = []
        for lo in range(0, len(ra), 16_384):  # LLC-sized chunks
            parts.append((fmat[ra[lo:lo + 16_384]] *
                          fmat[rb[lo:lo + 16_384]]).sum(axis=1))
        cos = np.concatenate(parts) if parts else np.zeros(0)
        hit = cos >= threshold
        ia = fids[ra[hit]]
        ib = fids[rb[hit]]
        swap = ia > ib
        return rd.from_arrow(pa.table({
            "id_a": pa.array(np.where(swap, ib, ia), type=id_type),
            "id_b": pa.array(np.where(swap, ia, ib), type=id_type),
            "cosine": pa.array(np.round(cos[hit], 6),
                               type=pa.float64())}))

    if pairs_ds is not None:
        pairs = pairs_ds
        if pairs.count() == 0:
            return rd.from_arrow(empty)
    else:
        pairs = rd.from_arrow(pa.Table.from_pandas(kdf,
                                                   preserve_index=False))
    left = pairs.join(
        feats.rename_columns({"key": "key_a", id_col: "id_a",
                              "vec": "vec_a"}),
        "inner", jp, on=("key_a",))
    both = left.join(
        feats.rename_columns({"key": "key_b", id_col: "id_b",
                              "vec": "vec_b"}),
        "inner", jp, on=("key_b",))
    return both.map_batches(
        functools.partial(_pair_cos_batch, threshold=threshold),
        batch_format="pyarrow", zero_copy_batch=True)


def exact_cosine_pairs(ds, vec_col: str = "embedding",
                       id_col: str = "vec_id", threshold: float = 0.9,
                       batch_size: int = 4096,
                       broadcast_cap: int = 1 << 30):
    """EXACT all-pairs cosine ≥ threshold → Dataset (id_a, id_b, cosine),
    id_a < id_b — the small-corpus ground-truth verifier for
    :func:`embedding_near_duplicates` (which is the scale path; all-pairs
    is O(n²) by definition). The full unit matrix is broadcast once
    (cap-gated), each batch computes its rows × corpus block of the
    cosine matrix vectorized; only threshold survivors leave the task."""
    import functools

    import ray
    import ray.data as rd

    source = ds.select_columns([id_col, vec_col]).materialize()
    if source.size_bytes() > broadcast_cap:
        raise ValueError(
            "exact_cosine_pairs is the all-pairs verifier; corpus exceeds "
            f"broadcast cap ({source.size_bytes()} > {broadcast_cap} B) — "
            "use embedding_near_duplicates (LSH) at scale")
    id_type = ds.schema().base_schema.field(id_col).type
    fdf = source.to_pandas()
    from ..ann.search import _unit_rows as _unit_rows_mat
    ids_all = fdf[id_col].to_numpy()
    U_all = _unit_rows_mat(np.stack(
        [np.asarray(v, dtype=np.float64) for v in fdf[vec_col]]))
    ref = ray.put((ids_all, U_all))

    def block(b: pa.Table) -> pa.Table:
        from ..util import worker_cached
        ids_a, U_a = worker_cached(("exactcos", ref.hex()),
                                   lambda: ray.get(ref))
        from ..ann.search import embedding_matrix, \
            _unit_rows as _unit_rows_mat
        Ub = _unit_rows_mat(embedding_matrix(b.column(vec_col)))
        idb = b.column(id_col).to_numpy(zero_copy_only=False)
        cos = Ub @ U_a.T                       # (batch, corpus)
        bi, ai = np.nonzero(cos >= threshold)
        ia_v, ib_v = idb[bi], ids_a[ai]
        keep = ia_v < ib_v                     # canonical + no self-pairs
        return pa.table({
            "id_a": pa.array(ia_v[keep], type=id_type),
            "id_b": pa.array(ib_v[keep], type=id_type),
            "cosine": pa.array(np.round(cos[bi, ai][keep], 6),
                               type=pa.float64()),
        })

    return source.map_batches(block, batch_format="pyarrow",
                              zero_copy_batch=True, batch_size=batch_size)


# ---------------------------------------------------------------------------
# incremental embedding near-dup: persist unit vectors once, dedup each
# arriving shard against them (the embedding face of the minhash index)


def write_embedding_index(ds, out_dir: str, vec_col: str = "embedding",
                          id_col: str = "vec_id"):
    """Persist unit vectors as parquet ``(id, unit: list<float>)`` — the
    index arriving shards near-dup against. Settings (dim) are recorded
    in ``_META.json`` and validated at query time; an existing index is
    replaced, a non-index directory refused (same contract as
    write_minhash_signatures).

    Crash-safety + cost contract (mirrors write_minhash_signatures):
    the corpus unit-vector pass executes exactly ONCE (``write_parquet``
    is the only execution; row count and — when the input schema doesn't
    already carry it — ``dim`` come from the written files), and
    ``_META.json`` is written LAST as the commit marker, so a torn build
    fails loudly at query time instead of silently missing duplicates."""
    import glob as _glob
    import json as _json
    import os

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        entries = os.listdir(out_dir)
        if "_META.json" not in entries and "_STAGING" not in entries:
            raise ValueError(
                f"out_dir {out_dir!r} is non-empty and not an embedding "
                "index (no _META.json) — refusing to overwrite")
        import shutil
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    open(os.path.join(out_dir, "_STAGING"), "w").close()
    # dim is read back from the written files below — probing the INPUT
    # schema here would sample-execute a lazy input pipeline (a second
    # partial execution of exactly the pass this function must pay once)
    dim = None

    def fn(b: pa.Table) -> pa.Table:
        u = _unit_rows(b, vec_col)  # (n, d) float32
        # flat-values list construction — no per-row Python lists on the
        # corpus-sized write; plain list<float> (not fixed-size) so empty
        # blocks with unknown dim share the schema
        if u.size >= (1 << 31):  # int32 list offsets would wrap; a
            # LargeList block would break schema unification with the
            # int32 blocks, so refuse loudly (unreachable with Ray's
            # default ~128 MB block sizing — needs one 8 GB+ block)
            raise ValueError(
                f"single block carries {u.size} floats ≥ 2^31 — "
                "lower the block/batch size for write_embedding_index")
        offs = pa.array(np.arange(len(u) + 1, dtype=np.int32)
                        * (u.shape[1] if u.size else 0))
        flat = pa.array(u.ravel(), type=pa.float32())
        return pa.table({
            id_col: b.column(id_col),
            "unit": pa.ListArray.from_arrays(offs, flat),
        })

    out = ds.select_columns([id_col, vec_col]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True)
    out.write_parquet(out_dir)  # the ONLY corpus execution
    import pyarrow.parquet as _pq
    files = sorted(_glob.glob(os.path.join(out_dir, "*.parquet")))
    n = sum(_pq.read_metadata(f).num_rows for f in files)
    if n == 0:
        for f in files:
            os.remove(f)
    else:
        for f in files:  # dim from the first written row (one page read)
            pf = _pq.ParquetFile(f)
            for rb in pf.iter_batches(batch_size=1, columns=["unit"]):
                if rb.num_rows:
                    dim = len(rb.column("unit")[0])
                    break
            if dim is not None:
                break
    with open(os.path.join(out_dir, "_META.json"), "w") as f:
        _json.dump({"dim": dim, "id_col": id_col, "rows": n}, f)
    os.remove(os.path.join(out_dir, "_STAGING"))


def _inc_new_units_batch(b: pa.Table, *, vec_col, id_col) -> pa.Table:
    """Join-fallback input, new side: (nkey, new_id, unit bytes) for
    every arriving row — the hash join against the pair set filters."""
    from ..sketches.hashing import hash64_array
    u = _unit_rows(b, vec_col)
    return pa.table({
        "nkey": pa.array(hash64_array(b.column(id_col)).view(np.int64)),
        "new_id": b.column(id_col),
        "unit_n": pa.array([r.tobytes() for r in u], type=pa.binary()),
    })


def _inc_seen_units_batch(b: pa.Table, *, seen_id_col) -> pa.Table:
    """Join-fallback input, seen side: (skey, seen_id, unit bytes) from
    the STORED unit vectors."""
    from ..ann.search import embedding_matrix
    from ..sketches.hashing import hash64_array
    u = embedding_matrix(b.column("unit")).astype(np.float32)
    return pa.table({
        "skey": pa.array(hash64_array(b.column(seen_id_col))
                         .view(np.int64)),
        "seen_id": b.column(seen_id_col),
        "unit_s": pa.array([r.tobytes() for r in u], type=pa.binary()),
    })


def _inc_pair_cos_batch(b: pa.Table, *, threshold) -> pa.Table:
    """Joined (pair × unit_n × unit_s) rows → thresholded
    (new_id, seen_id, cosine) — cross-side, so no canonical swap."""
    n = b.num_rows
    if n == 0:
        cos = np.zeros(0)
        hit = np.zeros(0, dtype=bool)
    else:
        va = np.frombuffer(b"".join(b["unit_n"].to_pylist()),
                           dtype=np.float32).reshape(n, -1) \
            .astype(np.float64)
        vb = np.frombuffer(b"".join(b["unit_s"].to_pylist()),
                           dtype=np.float32).reshape(n, -1) \
            .astype(np.float64)
        cos = (va * vb).sum(axis=1)
        hit = cos >= threshold
    idx = pa.array(np.nonzero(hit)[0], type=pa.int64())
    return pa.table({
        "new_id": b["new_id"].take(idx),
        "seen_id": b["seen_id"].take(idx),
        "cosine": pa.array(np.round(cos[hit], 6), type=pa.float64()),
    })


def _incremental_embedding_joined(pairs, new_src, seen, *, vec_col,
                                  id_col, seen_id_col, threshold,
                                  num_partitions, empty) -> pd.DataFrame:
    """Distributed degrade path for :func:`incremental_embedding_neardup`
    (candidate pairs exceeded ``gather_cap``): the shared
    pairsops.cross_pairs_joined skeleton (partitioned pair dedup + two
    hash joins + thresholded collect) with unit-vector payloads."""
    import functools

    from .pairsops import cross_pairs_joined
    nunit = new_src.map_batches(
        functools.partial(_inc_new_units_batch, vec_col=vec_col,
                          id_col=id_col),
        batch_format="pyarrow", zero_copy_batch=True)
    sunit = seen.map_batches(
        functools.partial(_inc_seen_units_batch,
                          seen_id_col=seen_id_col),
        batch_format="pyarrow", zero_copy_batch=True)
    return cross_pairs_joined(
        pairs, nunit, sunit,
        functools.partial(_inc_pair_cos_batch, threshold=threshold),
        num_partitions, empty)


def incremental_embedding_neardup(new_ds, index_dir: str,
                                  vec_col: str = "embedding",
                                  id_col: str = "vec_id",
                                  threshold: float = 0.95,
                                  planes: int = 12, seed: int = 11,
                                  tables: int = 4, max_bucket: int = 4096,
                                  batch_size: int = 8192,
                                  num_partitions: int = None,
                                  gather_cap: int = 1 << 30
                                  ) -> pd.DataFrame:
    """Cosine near-dup pairs between an ARRIVING shard and a persisted
    unit-vector index (:func:`write_embedding_index`) → pandas DataFrame
    ``(new_id, seen_id, cosine)`` with cosine ≥ threshold, exact over
    LSH candidates (hyperplane buckets, OR-amplified over ``tables``).

    Scale shape mirrors incremental_minhash_neardup: both sides bucket
    to narrow (bucket, key, side) rows through ONE hash partition —
    vectors never ride the shuffle — candidates are cross-side only
    (capped per bucket, salt-selected), and unit vectors for candidate
    keys are gathered candidate-proportionally for the exact cosine.
    Above ``gather_cap`` the plan degrades (never dies) to a fully
    distributed pair-dedup + two hash joins
    (:func:`_incremental_embedding_joined`)."""
    import functools
    import glob as _glob
    import json as _json
    import os

    import ray
    import ray.data as rd

    from ..ann.search import embedding_matrix
    from ..sketches.hashing import _splitmix64
    from ..util import auto_partitions, partitioned_group_apply, \
        worker_cached
    from .minhash import _wanted_keys_mask
    num_partitions = num_partitions or auto_partitions()
    with open(os.path.join(index_dir, "_META.json")) as f:
        meta = _json.load(f)
    dim = meta.get("dim")
    seen_id_col = meta.get("id_col", id_col)

    id_type = new_ds.schema().base_schema.field(id_col).type
    empty = pa.table({"new_id": pa.array([], type=id_type),
                      "seen_id": pa.array([], type=id_type),
                      "cosine": pa.array([], type=pa.float64())}) \
        .to_pandas()
    files = sorted(_glob.glob(os.path.join(index_dir, "*.parquet")))
    if not files:
        if meta.get("rows"):
            raise FileNotFoundError(
                f"embedding index {index_dir!r} records {meta['rows']} "
                "rows but has no parquet files — torn or tampered index")
        return empty

    def buckets_of(units: np.ndarray, keys: np.ndarray) -> pa.Table:
        H = worker_cached(("inc_hyp", units.shape[1], planes, seed,
                           tables),
                          lambda: np.random.default_rng(seed)
                          .standard_normal((tables, units.shape[1],
                                            planes)))
        n = len(units)
        bs = []
        for t in range(tables):
            signs = (units @ H[t]) > 0
            b = np.zeros(n, dtype=np.uint64)
            for p in range(planes):
                b |= signs[:, p].astype(np.uint64) << np.uint64(p)
            bs.append((np.uint64(t) << np.uint64(56)) | b)
        return np.concatenate(bs).view(np.int64)

    def seen_bucket_batch(b: pa.Table) -> pa.Table:
        from ..sketches.hashing import hash64_array
        units = embedding_matrix(b.column("unit"))
        if dim is not None and units.shape[1] != dim and len(units):
            raise ValueError(f"index dim {units.shape[1]} != meta {dim}")
        keys = hash64_array(b.column(seen_id_col)).view(np.int64)
        bk = buckets_of(units, keys)
        return pa.table({"bucket": pa.array(bk),
                         "key": pa.array(np.tile(keys, tables)),
                         "_side": pa.array(np.zeros(len(bk),
                                                    dtype=np.int8))})

    def new_bucket_batch(b: pa.Table) -> pa.Table:
        from ..sketches.hashing import hash64_array
        units = _unit_rows(b, vec_col).astype(np.float64)
        if dim is not None and len(units) and units.shape[1] != dim:
            raise ValueError(
                f"new shard dim {units.shape[1]} != index dim {dim}")
        keys = hash64_array(b.column(id_col)).view(np.int64)
        bk = buckets_of(units, keys)
        return pa.table({"bucket": pa.array(bk),
                         "key": pa.array(np.tile(keys, tables)),
                         "_side": pa.array(np.ones(len(bk),
                                                   dtype=np.int8))})

    seen = rd.read_parquet(files)
    union = seen.map_batches(seen_bucket_batch, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=batch_size) \
        .union(new_ds.select_columns([id_col, vec_col]).map_batches(
            new_bucket_batch, batch_format="pyarrow",
            zero_copy_batch=True, batch_size=batch_size))

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_n, out_s = [], []
        for bh, g in df.groupby("bucket", sort=False):
            sides = g["_side"].to_numpy()
            nk = np.unique(g["key"].to_numpy()[sides == 1])
            sk = np.unique(g["key"].to_numpy()[sides == 0])
            if len(nk) == 0 or len(sk) == 0:
                continue
            # mask first: bh is a Python int groupby key; although table
            # ids in the high bits keep it positive for tables < 128,
            # np.uint64 of a negative Python int raises under numpy >= 2
            # — same guard as the minhash twin
            salt = np.uint64(int(bh) & 0xFFFFFFFFFFFFFFFF)
            with np.errstate(over="ignore"):
                if len(sk) > max_bucket:
                    sk = sk[np.argsort(_splitmix64(
                        sk.view(np.uint64) ^ salt))][:max_bucket]
                cap_n = max(1, max_bucket // len(sk))
                if len(nk) > cap_n:
                    nk = nk[np.argsort(_splitmix64(
                        nk.view(np.uint64) ^ salt))][:cap_n]
            out_n.append(np.repeat(nk, len(sk)))
            out_s.append(np.tile(sk, len(nk)))
        if not out_n:
            return pd.DataFrame({"nkey": pd.Series([], dtype=np.int64),
                                 "skey": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"nkey": np.concatenate(out_n),
                             "skey": np.concatenate(out_s)}) \
            .drop_duplicates()

    pairs = partitioned_group_apply(union, ["bucket"], bucket_pairs,
                                    num_partitions=num_partitions
                                    ).materialize()
    if pairs.size_bytes() > gather_cap:
        # degrade, never die (pairsops.py contract): distributed
        # pair-dedup + two hash joins; only the result is collected
        return _incremental_embedding_joined(
            pairs, new_ds.select_columns([id_col, vec_col]), seen,
            vec_col=vec_col, id_col=id_col, seen_id_col=seen_id_col,
            threshold=threshold, num_partitions=num_partitions,
            empty=empty)
    pdf = pairs.to_pandas()
    if "nkey" not in pdf.columns or pdf.empty:
        return empty
    pdf = pdf.drop_duplicates(["nkey", "skey"])

    # candidate-proportional unit-vector gathers, uniform
    # (key, id, unit-bytes) output regardless of side/id name
    def gather(ds_side, wanted, col, the_id_col, from_raw: bool):
        wref = ray.put(wanted)

        def fn(b: pa.Table) -> pa.Table:
            keys, sel = _wanted_keys_mask(b.column(the_id_col), wref)
            idx = np.nonzero(sel)[0]
            sub = b.take(pa.array(idx, type=pa.int64()))
            u = (_unit_rows(sub, col) if from_raw
                 else embedding_matrix(sub.column(col)).astype(
                     np.float32))
            return pa.table({"key": pa.array(keys[idx]),
                             "id": sub.column(the_id_col),
                             "unit": pa.array(
                                 [r.tobytes() for r in u],
                                 type=pa.binary())})

        return ds_side.map_batches(fn, batch_format="pyarrow",
                                   zero_copy_batch=True).to_pandas()

    nmap = gather(new_ds.select_columns([id_col, vec_col]),
                  np.unique(pdf["nkey"].to_numpy()), vec_col, id_col,
                  True)
    smap = gather(seen, np.unique(pdf["skey"].to_numpy()), "unit",
                  seen_id_col, False)

    def sorted_side(frame: pd.DataFrame):
        order = np.argsort(frame["key"].to_numpy(), kind="stable")
        keys = frame["key"].to_numpy()[order]
        ids = frame["id"].to_numpy()[order]
        m = np.frombuffer(b"".join(frame["unit"].iloc[order]),
                          dtype=np.float32) \
            .reshape(len(frame), -1).astype(np.float64) \
            if len(frame) else np.zeros((0, dim or 1))
        return keys, ids, m

    nkeys, nids, nmat = sorted_side(nmap)
    skeys, sids, smat = sorted_side(smap)
    pn = pdf["nkey"].to_numpy()
    ps = pdf["skey"].to_numpy()
    nlo = np.searchsorted(nkeys, pn, side="left")
    nhi = np.searchsorted(nkeys, pn, side="right")
    slo = np.searchsorted(skeys, ps, side="left")
    shi = np.searchsorted(skeys, ps, side="right")
    from .pairsops import expand_pair_ranges
    ni, si = expand_pair_ranges(nlo, nhi, slo, shi)
    if len(ni) == 0:
        return empty
    parts = []
    for lo in range(0, len(ni), 16_384):  # LLC-sized gather chunks
        parts.append((nmat[ni[lo:lo + 16_384]] *
                      smat[si[lo:lo + 16_384]]).sum(axis=1))
    cos = np.concatenate(parts)
    hit = cos >= threshold
    if not hit.any():
        return empty
    return pd.DataFrame({"new_id": nids[ni[hit]],
                         "seen_id": sids[si[hit]],
                         "cosine": np.round(cos[hit], 6)}) \
        .drop_duplicates(["new_id", "seen_id"]) \
        .sort_values(["new_id", "seen_id"]).reset_index(drop=True)
