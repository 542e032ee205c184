"""MinHash + LSH near-duplicate detection over text (Broder 1997 resemblance
sketches; banding per Leskovec/Rajaraman/Ullman ch.3), as the ray_guide
near-dup pipeline: shingle+minhash per batch → explode to
(band_id, band_hash, key) rows → groupby bands → candidate key pairs →
re-derive candidate signatures in a second narrow pass → estimate / verify.

Scale shape (the only LARGE shuffle is the band explode):
  - band rows are (band_id:int16, band_hash:int64, key:int64) — 18 bytes
    per (doc, band); signatures NEVER travel through the shuffle.  ``key``
    is a 64-bit hash of the doc id (collision odds ~n²/2⁶⁵ — negligible
    below ~10⁹ candidate docs).
  - only candidate signatures (resp. texts, for exact verify) are
    re-computed in a broadcast-filtered second pass over the corpus and
    paired with the candidates either by a driver-resident chunked gather
    (small candidate sets — the table is already on the driver for the
    broadcast) or two distributed Ray Data hash joins above a size cap —
    candidates-proportional work throughout.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches.hashing import _splitmix64

_MERSENNE = np.uint64((1 << 61) - 1)


_FNV = np.uint64(1099511628211)


def kgram_hashes_flat(texts: list, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized k-CODE-POINT-gram hashing for a whole batch: ONE
    polynomial rolling hash over the concatenated utf-32 units (never
    materializes shingle strings — hashing 2M five-char strings through
    siphash cost 7 s per batch; this path is ~50× cheaper). Code-point
    units (not utf-8 bytes) so gram boundaries match SQL ``substr``
    semantics for non-ASCII text; for pure-ASCII input the unit VALUES
    equal the old utf-8 bytes, so hashes are bit-identical to the former
    byte-gram form. Texts shorter than k contribute one whole-text gram.
    Returns (flat uint64 hashes, bounds[n+1])."""
    from ..sketches.hashing import _splitmix64
    enc = [(t or "") for t in texts]
    n = len(enc)
    lens = np.fromiter((len(t) for t in enc), count=n, dtype=np.int64)
    counts = np.where(lens >= k, lens - k + 1, (lens > 0).astype(np.int64))
    bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])
    total_out = int(bounds[-1])
    out = np.zeros(total_out, dtype=np.uint64)
    total = int(lens.sum())
    if total == 0:
        return out, bounds
    allb = np.frombuffer("".join(enc).encode("utf-32-le"),
                         dtype=np.uint32).astype(np.uint64)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    W = total - k + 1
    if W > 0:
        with np.errstate(over="ignore"):
            acc = np.zeros(W, dtype=np.uint64)
            for j in range(k):
                acc *= _FNV
                acc += allb[j:j + W]
        # windows crossing a doc boundary start in the last k-1 positions
        # of a doc: O(docs·k) bad indices instead of O(windows) bookkeeping
        valid = np.ones(W, dtype=bool)
        if k > 1:
            bad = (offs[1:, None] - np.arange(1, k)[None, :]).ravel()
            bad = bad[(bad >= 0) & (bad < W)]
            valid[bad] = False
        compact = _splitmix64(acc[valid])
        if not ((lens > 0) & (lens < k)).any():
            out = compact  # doc order is preserved; slots align exactly
            return out, bounds
        # general path: scatter long-doc windows around short-doc slots
        long_docs = lens >= k
        dest_parts = [np.arange(bounds[d], bounds[d + 1])
                      for d in np.nonzero(long_docs)[0]]
        if dest_parts:
            out[np.concatenate(dest_parts)] = compact
    # short docs (0 < len < k): one whole-text gram each (rare path)
    for d in np.nonzero((lens > 0) & (lens < k))[0]:
        b = allb[offs[d]:offs[d + 1]]
        acc = np.uint64(0)
        with np.errstate(over="ignore"):
            for byte in b:
                acc = acc * _FNV + byte
        out[bounds[d]] = _splitmix64(np.array([acc]))[0]
    return out, bounds


def shingle_hashes(text: str, k: int) -> np.ndarray:
    flat, _ = kgram_hashes_flat([text], k)
    return np.unique(flat)


def jaccard_shingles(a: str, b: str, k: int = 5) -> float:
    ha, hb = shingle_hashes(a, k), shingle_hashes(b, k)
    if len(ha) == 0 and len(hb) == 0:
        return 1.0
    inter = len(np.intersect1d(ha, hb, assume_unique=True))
    union = len(ha) + len(hb) - inter
    return inter / union if union else 0.0


class MinHashStage:
    """map_batches stage: per doc, m minhash values over k-char shingles,
    exploded to one NARROW row per LSH band (band_id, band_hash, key) —
    the signature itself never leaves the task. Permutation coefficients
    are derived deterministically in __init__ (once per worker)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_hashes: int = 128, k: int = 5, bands: int = 32,
                 seed: int = 7):
        assert num_hashes % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.m, self.k, self.bands = num_hashes, k, bands
        self.rows_per_band = num_hashes // bands
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, num_hashes,
                              dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, (1 << 61) - 1, num_hashes, dtype=np.uint64)

    def _signatures(self, texts: list) -> np.ndarray:
        """Batch-vectorized signatures: ONE flat hash pass over every
        shingle of every doc (per-doc pa.array+siphash calls dominated the
        profile at 2-3 ms/doc), then a chunked permute+segment-min."""
        n = len(texts)
        flat, bounds = kgram_hashes_flat(texts, self.k)
        sigs = np.zeros((n, self.m), dtype=np.uint64)
        if len(flat) == 0:
            return sigs
        fh = flat & _MERSENNE
        starts = bounds[:-1]
        nonempty = bounds[1:] > starts
        safe_starts = np.minimum(starts, len(fh) - 1)
        with np.errstate(over="ignore"):
            # one flat permuted vector + segment-min per permutation: no
            # (m × shingles) matrix materializes, reduceat does the doc min
            for i in range(self.m):
                v = self.a[i] * fh + self.b[i]
                v = (v & _MERSENNE) + (v >> np.uint64(61))
                mins = np.minimum.reduceat(v, safe_starts)
                sigs[nonempty, i] = mins[nonempty]
        return sigs

    def band_hashes(self, sigs: np.ndarray) -> np.ndarray:
        """(n, m) signatures → (bands*n,) int64 band hashes, band-major."""
        n = sigs.shape[0]
        r = self.rows_per_band
        out = np.empty(self.bands * n, dtype=np.int64)
        for b in range(self.bands):
            seg = sigs[:, b * r:(b + 1) * r]
            acc = np.zeros(n, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(r):
                    acc = _splitmix64(acc ^ seg[:, j])
            out[b * n:(b + 1) * n] = acc.view(np.int64)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sketches.hashing import hash64_array
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        sigs = self._signatures(texts)
        keys = hash64_array(batch.column(self.id_col)).view(np.int64)
        return pa.table({
            "band_id": pa.array(np.repeat(
                np.arange(self.bands, dtype=np.int16), n)),
            "band_hash": pa.array(self.band_hashes(sigs)),
            "key": pa.array(np.tile(keys, self.bands)),
        })


_EMPTY_PAIRS = pd.DataFrame({"key_a": pd.Series([], dtype=np.int64),
                             "key_b": pd.Series([], dtype=np.int64)})


def _cached_stage(text_col, id_col, num_hashes, k, bands) -> MinHashStage:
    from ..util import worker_cached
    return worker_cached(("minhash", text_col, id_col, num_hashes, k, bands),
                         lambda: MinHashStage(text_col=text_col,
                                              id_col=id_col,
                                              num_hashes=num_hashes, k=k,
                                              bands=bands))


def _minhash_batch(batch, *, text_col, id_col, num_hashes, k, bands):
    return _cached_stage(text_col, id_col, num_hashes, k, bands)(batch)


def _partition_candidates(max_bucket: int):
    """Per coarse partition: group by (band_id, band_hash); every
    intra-bucket pair is a candidate (capped per bucket). Emits NORMALIZED
    int64 key pairs only — estimation happens after the sig join."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return _EMPTY_PAIRS.copy()
        from ..util import segment_pairs
        bid = df["band_id"].to_numpy().astype(np.int64)
        bhash = df["band_hash"].to_numpy()
        a_idx, b_idx, order = segment_pairs([bid, bhash], max_bucket)
        if len(a_idx) == 0:
            return _EMPTY_PAIRS.copy()
        keys = df["key"].to_numpy()[order]
        ka, kb = keys[a_idx], keys[b_idx]
        same = ka == kb  # hash-identical ids can't pair with themselves
        lo, hi = np.minimum(ka, kb), np.maximum(ka, kb)
        return pd.DataFrame({"key_a": lo[~same], "key_b": hi[~same]}) \
            .drop_duplicates(["key_a", "key_b"])
    return fn


def _wanted_keys_mask(id_arr, wanted_ref) -> np.ndarray:
    """Vectorized membership of hash64(id) in the broadcast candidate-key
    set (sorted int64 array fetched once per worker)."""
    import ray

    from ..sketches.hashing import hash64_array
    from ..util import worker_cached
    wanted = worker_cached(("minhash_wanted", wanted_ref.hex()),
                           lambda: np.sort(ray.get(wanted_ref)))
    keys = hash64_array(id_arr).view(np.int64)
    if len(wanted) == 0 or len(keys) == 0:
        return keys, np.zeros(len(keys), dtype=bool)
    pos = np.clip(np.searchsorted(wanted, keys), 0, len(wanted) - 1)
    return keys, wanted[pos] == keys


def _candidate_sigs_batch(batch, *, text_col, id_col, num_hashes, k, bands,
                          wanted_ref):
    """Second narrow pass: recompute signatures ONLY for candidate docs
    (membership via broadcast key set) — candidates-proportional output."""
    stage = _cached_stage(text_col, id_col, num_hashes, k, bands)
    keys, sel = _wanted_keys_mask(batch.column(id_col), wanted_ref)
    idx = np.nonzero(sel)[0]
    take = pa.array(idx, type=pa.int64())
    texts = batch.column(text_col).take(take).to_pylist()
    sigs = stage._signatures(texts)
    return pa.table({
        "key": pa.array(keys[idx], type=pa.int64()),
        id_col: batch.column(id_col).take(take),
        "sig": pa.array([s.tobytes() for s in sigs], type=pa.binary()),
    })


def _pair_est_batch(b: pa.Table, *, id_col, threshold, num_hashes,
                    round_to=6) -> pa.Table:
    """Joined (pair × sig_a × sig_b) rows → (id_a, id_b, jaccard_est) with
    est ≥ threshold and id_a < id_b by ORIGINAL id value."""
    n = b.num_rows
    ida = b["id_a"].to_numpy(zero_copy_only=False)
    idb = b["id_b"].to_numpy(zero_copy_only=False)
    if n == 0:
        est = np.zeros(0)
        hit = np.zeros(0, dtype=bool)
    else:
        sa = np.frombuffer(b"".join(b["sig_a"].to_pylist()),
                           dtype=np.uint64).reshape(n, num_hashes)
        sb = np.frombuffer(b"".join(b["sig_b"].to_pylist()),
                           dtype=np.uint64).reshape(n, num_hashes)
        est = (sa == sb).mean(axis=1)
        hit = est >= threshold
    ia, ib = ida[hit], idb[hit]
    swap = ia > ib
    id_type = b.schema.field("id_a").type
    return pa.table({
        "id_a": pa.array(np.where(swap, ib, ia), type=id_type),
        "id_b": pa.array(np.where(swap, ia, ib), type=id_type),
        "jaccard_est": pa.array(np.round(est[hit], round_to),
                                type=pa.float64()),
    })


def _candidate_pairs(ds, text_col, id_col, num_hashes, k, bands, max_bucket,
                     num_partitions, batch_size):
    """Band explode (narrow rows) → bucket pairs, partition-deduped.
    Returns a MATERIALIZED Dataset of (key_a, key_b) int64 pairs that may
    still contain cross-band duplicates — the caller picks driver-side or
    distributed dedup by measured size."""
    import functools

    from ..util import partitioned_group_apply
    exploded = ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(_minhash_batch, text_col=text_col, id_col=id_col,
                          num_hashes=num_hashes, k=k, bands=bands),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    pairs = partitioned_group_apply(
        exploded, ["band_id", "band_hash"],
        _partition_candidates(max_bucket),
        num_partitions=num_partitions)
    return pairs.materialize()


def _key_batch(b: pa.Table, *, id_col) -> pa.Table:
    """Append ``key`` = int64 hash64(id) (the pairing key) to a batch."""
    from ..sketches.hashing import hash64_array
    keys = hash64_array(b.column(id_col)).view(np.int64)
    return b.append_column("key", pa.array(keys))


def _sigs_from_keyed_batch(b: pa.Table, *, text_col, id_col, num_hashes,
                           k, bands) -> pa.Table:
    """Signatures for an already key-filtered (joined) candidate batch."""
    stage = _cached_stage(text_col, id_col, num_hashes, k, bands)
    sigs = stage._signatures(b.column(text_col).to_pylist())
    return pa.table({
        "key": b.column("key"),
        id_col: b.column(id_col),
        "sig": pa.array([s.tobytes() for s in sigs], type=pa.binary()),
    })


def minhash_near_duplicates(ds, text_col: str = "text",
                            id_col: str = "doc_id", threshold: float = 0.7,
                            num_hashes: int = 128, k: int = 5,
                            bands: int = 32, max_bucket: int = 4096,
                            num_partitions: int = None,
                            batch_size: int = 4096,
                            broadcast_sig_cap: int = 1 << 30,
                            driver_pairs_cap: int = 256 << 20,
                            broadcast_key_cap: int = 8 << 30,
                            rows_hint: int = None):
    """→ Dataset of near-dup candidate pairs ``(id_a, id_b, jaccard_est)``
    with estimated shingle-Jaccard ≥ threshold (id_a < id_b).

    Scale shape: the only corpus-sized shuffle carries 18-byte band rows;
    candidate signatures are recomputed in a broadcast-filtered second
    pass. Every remaining step is cap-gated by MEASURED size — nothing
    corpus- or candidate-proportional is unconditionally driver-resident:
      - pair dedup: driver pandas under ``driver_pairs_cap`` (the pair set
        feeds a broadcast anyway), else a distributed partitioned dedup;
      - candidate-key set: per-node ``ray.put`` broadcast under
        ``broadcast_key_cap`` (8 B/candidate, plasma-shared per node),
        else membership via a distributed inner join;
      - pair estimation: chunked driver gather while the sig table fits
        ``broadcast_sig_cap`` AND the pairs are driver-resident, else two
        distributed hash joins attach sig_a / sig_b to the pairs."""
    import functools

    import ray
    import ray.data as rd

    from ..util import auto_partitions
    from .pairsops import collect_keys_if_small, distinct_pairs, \
        pair_key_dataset
    if num_partitions is None:
        num_partitions = auto_partitions()
        if rows_hint:
            # cap at what the band-row volume warrants (~16k rows/part) —
            # same rule as checks/neardup.py rows_hint; at scale the
            # row-derived count exceeds the cluster-derived one
            num_partitions = min(num_partitions,
                                 max(8, (rows_hint * bands) // 16384))
    source = ds.select_columns([id_col, text_col])
    raw = _candidate_pairs(source, text_col, id_col, num_hashes, k, bands,
                           max_bucket, num_partitions, batch_size)
    # schema from the RAW dataset: metadata-only (a projected
    # plan's .schema() executes a sampling pass, ~1 s)
    id_type = ds.schema().base_schema.field(id_col).type
    empty = pa.table({"id_a": pa.array([], type=id_type),
                      "id_b": pa.array([], type=id_type),
                      "jaccard_est": pa.array([], type=pa.float64())})
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
        sigtab = source.map_batches(
            functools.partial(_candidate_sigs_batch, text_col=text_col,
                              id_col=id_col, num_hashes=num_hashes, k=k,
                              bands=bands, wanted_ref=wanted_ref),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size).materialize()  # candidates only
    else:
        # last-resort membership: the candidate-key set itself exceeds the
        # per-node broadcast budget, so candidates are selected by a
        # distributed inner join (the corpus text crosses ONE shuffle —
        # degraded but correct; the broadcast paths never pay this)
        keyed = source.map_batches(
            functools.partial(_key_batch, id_col=id_col),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size)
        cand_rows = keyed.join(keys_ds, "inner", jp, on=("key",))
        sigtab = cand_rows.map_batches(
            functools.partial(_sigs_from_keyed_batch, text_col=text_col,
                              id_col=id_col, num_hashes=num_hashes, k=k,
                              bands=bands),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=batch_size).materialize()
    n_sigs = sigtab.count()
    if kdf is not None and n_sigs * num_hashes * 8 <= broadcast_sig_cap:
        # small-candidate path: the sig table is ALREADY driver-resident
        # for the broadcast, so estimate right here (chunked gathers — the
        # unchunked 500 MB temporaries thrash cache 10×) instead of paying
        # a whole extra Ray execution for one tiny block
        from .pairsops import expand_pair_ranges
        sdf = sigtab.to_pandas()
        order = np.argsort(sdf["key"].to_numpy(), kind="stable")
        skeys = sdf["key"].to_numpy()[order]
        smat = np.frombuffer(b"".join(sdf["sig"].iloc[order]),
                             dtype=np.uint64).reshape(n_sigs, num_hashes)
        sids = sdf[id_col].to_numpy()[order]
        ka = kdf["key_a"].to_numpy()
        kb = kdf["key_b"].to_numpy()
        # expand each key pair over ALL rows per key: a duplicate id
        # shares one key across several signature rows, and scoring only
        # the first row would let a same-id decoy text suppress a true
        # near-duplicate the join path (same input, larger cap) reports
        alo = np.searchsorted(skeys, ka, side="left")
        ahi = np.searchsorted(skeys, ka, side="right")
        blo = np.searchsorted(skeys, kb, side="left")
        bhi = np.searchsorted(skeys, kb, side="right")
        ra, rb = expand_pair_ranges(alo, ahi, blo, bhi)
        parts = []
        # 16k-pair chunks: the gathered (chunk, m) temporaries fit
        # the LLC — measured 11x faster than 100k chunks
        for lo in range(0, len(ra), 16_384):
            parts.append((smat[ra[lo:lo + 16_384]] ==
                          smat[rb[lo:lo + 16_384]]).mean(axis=1))
        est = np.concatenate(parts) if parts else np.zeros(0)
        hit = est >= threshold
        ia = sids[ra[hit]]
        ib = sids[rb[hit]]
        swap = ia > ib
        return rd.from_arrow(pa.table({
            "id_a": pa.array(np.where(swap, ib, ia), type=id_type),
            "id_b": pa.array(np.where(swap, ia, ib), type=id_type),
            "jaccard_est": pa.array(np.round(est[hit], 6),
                                    type=pa.float64())}))
    # join width scales with CANDIDATE volume, not corpus size: a few
    # aggregators suffice below ~10M pairs; callers at larger scale raise
    # num_partitions and this follows
    if pairs_ds is not None:
        pairs = pairs_ds  # distributed pairs feed the joins directly
        if pairs.count() == 0:
            return rd.from_arrow(empty)
    else:
        pairs = rd.from_arrow(pa.Table.from_pandas(kdf,
                                                   preserve_index=False))
    left = pairs.join(
        sigtab.rename_columns({"key": "key_a", id_col: "id_a",
                               "sig": "sig_a"}),
        "inner", jp, on=("key_a",))
    both = left.join(
        sigtab.rename_columns({"key": "key_b", id_col: "id_b",
                               "sig": "sig_b"}),
        "inner", jp, on=("key_b",))
    return both.map_batches(
        functools.partial(_pair_est_batch, id_col=id_col,
                          threshold=threshold, num_hashes=num_hashes),
        batch_format="pyarrow", zero_copy_batch=True)


def _exact_jaccard_batch(b: pa.Table, *, k, threshold) -> pa.Table:
    """Joined (pair × text_a × text_b) rows → (id_a, id_b, jaccard) with
    EXACT k-gram Jaccard ≥ threshold. One flat hash pass per batch; the
    per-pair set intersection runs over candidate pairs only."""
    n = b.num_rows
    jac = np.zeros(n)
    if n:
        ta = b["text_a"].to_pylist()
        tb = b["text_b"].to_pylist()
        flat, bounds = kgram_hashes_flat(ta + tb, k)
        for i in range(n):
            ha = np.unique(flat[bounds[i]:bounds[i + 1]])
            hb = np.unique(flat[bounds[n + i]:bounds[n + i + 1]])
            if len(ha) == 0 and len(hb) == 0:
                jac[i] = 1.0
                continue
            inter = np.intersect1d(ha, hb, assume_unique=True).size
            union = ha.size + hb.size - inter
            jac[i] = inter / union if union else 0.0
    hit = jac >= threshold
    idx = pa.array(np.nonzero(hit)[0], type=pa.int64())
    return pa.table({
        "id_a": b["id_a"].take(idx),
        "id_b": b["id_b"].take(idx),
        "jaccard": pa.array(np.round(jac[hit], 6), type=pa.float64()),
    })


def _exact_jaccard_gather(b: pa.Table, tids, ttexts, *, k,
                          threshold) -> pa.Table:
    """Pairs table → exact verify against a (sorted ids, texts) candidate
    text table. Each UNIQUE doc referenced by the batch is hashed exactly
    once (one flat k-gram pass + lexsort dedup → per-doc sorted unique
    gram slices); the per-pair work is then just an intersection of two
    presorted arrays — docs appear in many pairs, so hashing per pair
    side (the old path) redid ~pairs/docs × the text hashing."""
    from .ngram import _distinct_doc_grams
    from .pairsops import expand_pair_ranges
    ia = b["id_a"].to_numpy(zero_copy_only=False)
    ib = b["id_b"].to_numpy(zero_copy_only=False)
    # expand each pair over ALL candidate-table rows per id: a duplicate
    # id maps to several texts, and verifying only the first row would
    # run the exact Jaccard against a same-id decoy text and drop a true
    # pair (the join verify path sees every text combination — match it)
    alo = np.searchsorted(tids, ia, side="left")
    ahi = np.searchsorted(tids, ia, side="right")
    blo = np.searchsorted(tids, ib, side="left")
    bhi = np.searchsorted(tids, ib, side="right")
    counts = (ahi - alo) * (bhi - blo)
    prep = np.repeat(np.arange(len(ia), dtype=np.int64), counts)
    ra, rb = expand_pair_ranges(alo, ahi, blo, bhi)
    used = np.unique(np.concatenate([ra, rb])) if len(ra) else \
        np.zeros(0, dtype=np.int64)
    fs, offs = _distinct_doc_grams(list(ttexts[used]), k)
    a_idx = np.searchsorted(used, ra)
    b_idx = np.searchsorted(used, rb)
    n = len(ra)
    jac = np.zeros(n)
    for i in range(n):
        a, bb = a_idx[i], b_idx[i]
        ha = fs[offs[a]:offs[a + 1]]
        hb = fs[offs[bb]:offs[bb + 1]]
        if len(ha) == 0 and len(hb) == 0:
            jac[i] = 1.0
            continue
        inter = np.intersect1d(ha, hb, assume_unique=True).size
        union = ha.size + hb.size - inter
        jac[i] = inter / union if union else 0.0
    hit = jac >= threshold
    idx = pa.array(prep[hit], type=pa.int64())
    return pa.table({
        "id_a": b["id_a"].take(idx),
        "id_b": b["id_b"].take(idx),
        "jaccard": pa.array(np.round(jac[hit], 6), type=pa.float64()),
    })


def _exact_jaccard_broadcast(b: pa.Table, *, text_ref, k, threshold,
                             id_col) -> pa.Table:
    """Pairs batch → exact verify using the BROADCAST candidate text table
    (sorted ids, texts) — gather per batch, flat-hash both sides once."""
    import ray

    from ..util import worker_cached
    tids, ttexts = worker_cached(
        ("verify_texts", text_ref.hex()), lambda: ray.get(text_ref))
    return _exact_jaccard_gather(b, tids, ttexts, k=k, threshold=threshold)


def verified_near_duplicates(ds, text_col: str = "text",
                             id_col: str = "doc_id",
                             threshold: float = 0.7, k: int = 5,
                             broadcast_text_cap: int = 1 << 30,
                             driver_pairs_cap: int = 256 << 20,
                             broadcast_key_cap: int = 8 << 30,
                             **minhash_kw):
    """Candidate pairs from MinHash-LSH, then EXACT k-gram Jaccard verify
    (the 'n-gram Jaccard' dedup variant), fully DISTRIBUTED: candidate
    texts are fetched in a broadcast-filtered pass (or a distributed join
    when the candidate-id set exceeds ``broadcast_key_cap``), attached to
    the pairs either via one broadcast gather (small candidate text table)
    or two narrow hash joins (large), and the exact verify runs inside
    map_batches over candidate pairs.
    → pandas (id_a, id_b, jaccard ≥ threshold) — the VERIFIED pair set is
    the pipeline's final, filtered result and is returned driver-side by
    contract; use the minhash/join internals directly for a Dataset."""
    import functools

    import pyarrow.compute as pc
    import ray

    from .pairsops import pair_key_dataset
    source = ds.select_columns([id_col, text_col])
    cand = minhash_near_duplicates(
        ds, text_col=text_col, id_col=id_col,
        threshold=max(0.0, threshold - 0.2),  # slack: est is noisy
        k=k, driver_pairs_cap=driver_pairs_cap,
        broadcast_key_cap=broadcast_key_cap, **minhash_kw).materialize()
    empty = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                          "id_b": pd.Series([], dtype=object),
                          "jaccard": pd.Series([], dtype=float)})
    cdf = None
    if cand.size_bytes() <= driver_pairs_cap:
        # cand is materialized: to_pandas is a block fetch, not a new
        # execution — and the pairs being driver-resident unlocks the
        # local verify below (each tiny Ray stage costs ~0.5-1 s of
        # fixed execution spin-up, see BASELINE.md)
        cdf = cand.to_pandas()
        if cdf.empty:
            return empty
        wanted = pa.array(sorted(set(cdf["id_a"]) | set(cdf["id_b"])))
    else:
        if cand.count() == 0:
            return empty
        ids_only = cand.select_columns(["id_a", "id_b"]).materialize()
        ids_ds = pair_key_dataset(ids_only, ["id_a", "id_b"],
                                  out_col=id_col).materialize()
        if ids_ds.size_bytes() <= broadcast_key_cap:
            vals = ids_ds.to_pandas()[id_col].to_numpy()
            wanted = pa.array(np.sort(vals))
        else:
            wanted = None  # distributed-join membership below

    if wanted is not None:
        wanted_ref = ray.put(wanted)

        def fetch_texts(b: pa.Table) -> pa.Table:
            from ..util import worker_cached
            w = worker_cached(("verify_wanted", wanted_ref.hex()),
                              lambda: ray.get(wanted_ref))
            return b.filter(pc.is_in(b[id_col], value_set=w))

        texts = source.map_batches(fetch_texts, batch_format="pyarrow",
                                   zero_copy_batch=True).materialize()
    else:
        texts = source.join(ids_ds, "inner", 8,
                            on=(id_col,)).materialize()
    tdf = texts.to_pandas() if \
        texts.size_bytes() <= broadcast_text_cap else None
    if tdf is not None:
        order = np.argsort(tdf[id_col].to_numpy())
        tids = tdf[id_col].to_numpy()[order]
        ttexts = tdf[text_col].to_numpy()[order]
        if cdf is not None:
            # pairs AND candidate texts are driver-resident — verify
            # locally (a few hundred numpy set intersections) instead of
            # paying a Ray stage execution for it
            out = _exact_jaccard_gather(
                pa.Table.from_pandas(cdf[["id_a", "id_b"]]),
                tids, ttexts, k=k, threshold=threshold).to_pandas()
            if out.empty:
                return empty
            return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        text_ref = ray.put((tids, ttexts))
        ver = cand.map_batches(
            functools.partial(_exact_jaccard_broadcast, text_ref=text_ref,
                              k=k, threshold=threshold, id_col=id_col),
            batch_format="pyarrow", zero_copy_batch=True)
    else:
        jp = 8
        left = cand.join(
            texts.rename_columns({id_col: "id_a", text_col: "text_a"}),
            "inner", jp, on=("id_a",))
        both = left.join(
            texts.rename_columns({id_col: "id_b", text_col: "text_b"}),
            "inner", jp, on=("id_b",))
        ver = both.map_batches(
            functools.partial(_exact_jaccard_batch, k=k,
                              threshold=threshold),
            batch_format="pyarrow", zero_copy_batch=True)
    out = ver.to_pandas()
    if out.empty:
        return empty
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# incremental near-dup: persist signatures once, dedup each arriving shard
# against them without touching the seen corpus's text again


def _band_hashes_of(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n, m) uint64 signatures → (bands·n,) int64 band hashes,
    band-major (splitmix chain per band segment — no permutation
    coefficients needed, so no MinHashStage instance either)."""
    n, m = sigs.shape
    r = m // bands
    out = np.empty(bands * n, dtype=np.int64)
    with np.errstate(over="ignore"):
        for b in range(bands):
            seg = sigs[:, b * r:(b + 1) * r]
            acc = np.zeros(n, dtype=np.uint64)
            for j in range(r):
                acc = _splitmix64(acc ^ seg[:, j])
            out[b * n:(b + 1) * n] = acc.view(np.int64)
    return out


def _sig_matrix(col, num_hashes: int) -> np.ndarray:
    """list<int64> signature column → (n, m) uint64 matrix zero-copy-ish
    (flat values reshape — no per-row Python lists on the corpus scan)."""
    import pyarrow.compute as pc
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, num_hashes), dtype=np.uint64)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if not (lens == num_hashes).all():
        raise ValueError(
            f"signature width {set(lens.tolist())} != num_hashes "
            f"{num_hashes} — index written with different settings?")
    return pc.list_flatten(col).to_numpy(zero_copy_only=False) \
        .reshape(n, num_hashes).view(np.uint64)


def write_minhash_signatures(ds, out_dir: str, text_col: str = "text",
                             id_col: str = "doc_id",
                             num_hashes: int = 128, k: int = 5,
                             bands: int = 32):
    """Persist each doc's minhash signature as parquet ``(id, sig:
    fixed_size_list<int64>[m])`` — the INDEX later shards near-dup
    against (8·m bytes/doc; the text itself is never stored). The
    minhash settings are recorded in ``_META.json`` and VALIDATED at
    query time (a silent settings mismatch would return empty/garbage
    estimates). Bands are re-derived from the signature at query time.
    An existing index directory is REPLACED (a second write would
    otherwise append duplicate rows); a non-index directory is refused.

    Crash-safety + cost contract: the corpus signature pass executes
    exactly ONCE (``write_parquet`` is the only execution; the row count
    comes from the written footers), and ``_META.json`` is written LAST
    as the commit marker — a crash mid-write leaves a ``_STAGING``
    directory that query time refuses loudly (no ``_META.json``)
    instead of silently missing duplicates."""
    import functools
    import glob as _glob
    import json as _json
    import os

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        entries = os.listdir(out_dir)
        if "_META.json" not in entries and "_STAGING" not in entries:
            raise ValueError(
                f"out_dir {out_dir!r} is non-empty and not a signature "
                "index (no _META.json) — refusing to overwrite")
        import shutil
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    # torn-build marker: lets a rewrite recognise the dir as replaceable
    open(os.path.join(out_dir, "_STAGING"), "w").close()

    def fn(b: pa.Table, *, text_col, id_col, num_hashes, k,
           bands) -> pa.Table:
        st = _cached_stage(text_col, id_col, num_hashes, k, bands)
        sigs = st._signatures(b.column(text_col).to_pylist())
        # flat-values construction (the reverse of _sig_matrix's reshape)
        # — no per-row Python lists on the corpus-sized write
        flat = pa.array(sigs.view(np.int64).ravel(), type=pa.int64())
        return pa.table({
            id_col: b.column(id_col),
            "sig": pa.FixedSizeListArray.from_arrays(flat, num_hashes),
        })

    sigs_ds = ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(fn, text_col=text_col, id_col=id_col,
                          num_hashes=num_hashes, k=k, bands=bands),
        batch_format="pyarrow", zero_copy_batch=True)
    sigs_ds.write_parquet(out_dir)  # the ONLY corpus execution
    import pyarrow.parquet as _pq
    files = _glob.glob(os.path.join(out_dir, "*.parquet"))
    n = sum(_pq.read_metadata(f).num_rows for f in files)
    if n == 0:  # empty corpus: drop 0-row files so query sees no index
        for f in files:
            os.remove(f)
    with open(os.path.join(out_dir, "_META.json"), "w") as f:
        _json.dump({"num_hashes": num_hashes, "k": k, "id_col": id_col,
                    "rows": n}, f)
    os.remove(os.path.join(out_dir, "_STAGING"))


def _band_sig_batch(b: pa.Table, *, id_col, num_hashes, bands,
                    side: int) -> pa.Table:
    """(id, sig) rows → narrow (band_id, band_hash, key, _side) band rows
    (sides: 0 = seen index, 1 = new shard)."""
    from ..sketches.hashing import hash64_array
    n = b.num_rows
    sigs = _sig_matrix(b.column("sig"), num_hashes)
    keys = hash64_array(b.column(id_col)).view(np.int64)
    return pa.table({
        "band_id": pa.array(np.repeat(
            np.arange(bands, dtype=np.int16), n)),
        "band_hash": pa.array(_band_hashes_of(sigs, bands)),
        "key": pa.array(np.tile(keys, bands)),
        "_side": pa.array(np.full(bands * n, side, dtype=np.int8)),
    })


def _inc_new_sigs_batch(b: pa.Table, *, text_col, id_col, num_hashes, k,
                        bands) -> pa.Table:
    """Join-fallback input, new side: (nkey, new_id, sig bytes) for
    every arriving row — the hash join against the pair set does the
    candidate filtering."""
    from ..sketches.hashing import hash64_array
    st = _cached_stage(text_col, id_col, num_hashes, k, bands)
    sigs = st._signatures(b.column(text_col).to_pylist())
    return pa.table({
        "nkey": pa.array(hash64_array(b.column(id_col)).view(np.int64)),
        "new_id": b.column(id_col),
        "sig_n": pa.array([s.tobytes() for s in sigs], type=pa.binary()),
    })


def _inc_seen_sigs_batch(b: pa.Table, *, seen_id_col,
                         num_hashes) -> pa.Table:
    """Join-fallback input, seen side: (skey, seen_id, sig bytes) from
    the STORED signatures (text never re-read)."""
    from ..sketches.hashing import hash64_array
    sigs = _sig_matrix(b.column("sig"), num_hashes)
    return pa.table({
        "skey": pa.array(hash64_array(b.column(seen_id_col))
                         .view(np.int64)),
        "seen_id": b.column(seen_id_col),
        "sig_s": pa.array([s.tobytes() for s in sigs], type=pa.binary()),
    })


def _inc_pair_est_batch(b: pa.Table, *, threshold,
                        num_hashes) -> pa.Table:
    """Joined (pair × sig_n × sig_s) rows → thresholded
    (new_id, seen_id, est_jaccard) — cross-side, so no canonical swap."""
    n = b.num_rows
    if n == 0:
        est = np.zeros(0)
        hit = np.zeros(0, dtype=bool)
    else:
        sa = np.frombuffer(b"".join(b["sig_n"].to_pylist()),
                           dtype=np.uint64).reshape(n, num_hashes)
        sb = np.frombuffer(b"".join(b["sig_s"].to_pylist()),
                           dtype=np.uint64).reshape(n, num_hashes)
        est = (sa == sb).mean(axis=1)
        hit = est >= threshold
    idx = pa.array(np.nonzero(hit)[0], type=pa.int64())
    return pa.table({
        "new_id": b["new_id"].take(idx),
        "seen_id": b["seen_id"].take(idx),
        "est_jaccard": pa.array(np.round(est[hit], 6),
                                type=pa.float64()),
    })


def _incremental_minhash_joined(pairs, new_src, seen_sigs, *, text_col,
                                id_col, seen_id_col, num_hashes, k,
                                bands, threshold, num_partitions,
                                empty) -> pd.DataFrame:
    """Distributed degrade path for :func:`incremental_minhash_neardup`
    (candidate pairs exceeded ``gather_cap``): the shared
    pairsops.cross_pairs_joined skeleton (partitioned pair dedup + two
    hash joins + thresholded collect) with minhash signature payloads."""
    import functools

    from .pairsops import cross_pairs_joined
    nsig = new_src.map_batches(
        functools.partial(_inc_new_sigs_batch, text_col=text_col,
                          id_col=id_col, num_hashes=num_hashes, k=k,
                          bands=bands),
        batch_format="pyarrow", zero_copy_batch=True)
    ssig = seen_sigs.map_batches(
        functools.partial(_inc_seen_sigs_batch, seen_id_col=seen_id_col,
                          num_hashes=num_hashes),
        batch_format="pyarrow", zero_copy_batch=True)
    return cross_pairs_joined(
        pairs, nsig, ssig,
        functools.partial(_inc_pair_est_batch, threshold=threshold,
                          num_hashes=num_hashes),
        num_partitions, empty)


def incremental_minhash_neardup(new_ds, sig_dir: str,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                threshold: float = 0.7,
                                bands: int = 32, max_bucket: int = 1024,
                                num_partitions: int = None,
                                gather_cap: int = 1 << 30) -> pd.DataFrame:
    """Near-dup pairs between an ARRIVING shard and a persisted signature
    index (:func:`write_minhash_signatures`) → pandas DataFrame
    ``(new_id, seen_id, est_jaccard)`` with est ≥ threshold. The index's
    recorded (num_hashes, k) settings are used for the new side — a
    mismatch is impossible by construction.

    Scale shape: the seen corpus contributes only its stored signatures
    (text never re-read); both sides band to narrow 11 B rows through
    ONE hash partition; candidate pairs are CROSS-SIDE only (new × seen
    inside a bucket, capped per bucket with a band-salted selection so
    different bands drop different docs); signatures for candidate keys
    are gathered candidate-proportionally and the estimate is the
    fraction of agreeing components (the standard MinHash estimator) —
    rows-only by nature (LSH recall + estimator are probabilistic).

    Degrade, never die: above ``gather_cap`` the driver gather is
    replaced by a fully distributed plan (partitioned pair dedup + two
    hash joins attaching the signatures, :func:`_incremental_minhash_joined`)
    — only the thresholded result is ever collected."""
    import functools
    import glob as _glob
    import json as _json
    import os

    import ray
    import ray.data as rd

    from ..util import auto_partitions, partitioned_group_apply, \
        worker_cached
    from .pairsops import expand_pair_ranges as pairsops_expand
    num_partitions = num_partitions or auto_partitions()
    with open(os.path.join(sig_dir, "_META.json")) as f:
        meta = _json.load(f)
    num_hashes, k = int(meta["num_hashes"]), int(meta["k"])
    # the index's RECORDED id column names the stored rows everywhere
    # (banding, gather, joins) — a caller-side name only names the shard
    seen_id_col = meta.get("id_col", id_col)

    id_type = new_ds.schema().base_schema.field(id_col).type
    empty = pa.table({"new_id": pa.array([], type=id_type),
                      "seen_id": pa.array([], type=id_type),
                      "est_jaccard": pa.array([], type=pa.float64())}) \
        .to_pandas()
    sig_files = sorted(_glob.glob(os.path.join(sig_dir, "*.parquet")))
    if not sig_files:
        if meta.get("rows"):
            raise FileNotFoundError(
                f"signature index {sig_dir!r} records {meta['rows']} "
                "rows but has no parquet files — torn or tampered index")
        return empty  # legitimately empty index: nothing can match

    seen_sigs = rd.read_parquet(sig_files)
    seen_bands = seen_sigs.map_batches(
        functools.partial(_band_sig_batch, id_col=seen_id_col,
                          num_hashes=num_hashes, bands=bands, side=0),
        batch_format="pyarrow", zero_copy_batch=True)

    def new_band_batch(b: pa.Table) -> pa.Table:
        st = _cached_stage(text_col, id_col, num_hashes, k, bands)
        t = st(b)
        return t.append_column(
            "_side", pa.array(np.ones(t.num_rows, dtype=np.int8)))

    new_bands = new_ds.select_columns([id_col, text_col]).map_batches(
        new_band_batch, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out_n, out_s = [], []
        for (_, bh), g in df.groupby(["band_id", "band_hash"],
                                     sort=False):
            sides = g["_side"].to_numpy()
            nk = np.unique(g["key"].to_numpy()[sides == 1])
            sk = np.unique(g["key"].to_numpy()[sides == 0])
            if len(nk) == 0 or len(sk) == 0:
                continue
            # cap BOTH sides, selecting by a band-salted mix so each
            # band drops DIFFERENT docs (a fixed first-N prefix would
            # lose the same docs in every band — unrecoverable); mask to
            # 64 bits first: bh is a PYTHON int groupby key of the int64
            # band_hash, negative about half the time, and np.uint64 of
            # a negative Python int raises under numpy >= 2
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

    pairs = partitioned_group_apply(
        seen_bands.union(new_bands), ["band_id", "band_hash"],
        bucket_pairs, num_partitions=num_partitions).materialize()
    if pairs.size_bytes() > gather_cap:
        # degrade, never die (pairsops.py contract): distributed
        # pair-dedup + two hash joins; only the result is collected
        return _incremental_minhash_joined(
            pairs, new_ds.select_columns([id_col, text_col]), seen_sigs,
            text_col=text_col, id_col=id_col, seen_id_col=seen_id_col,
            num_hashes=num_hashes, k=k, bands=bands, threshold=threshold,
            num_partitions=num_partitions, empty=empty)
    pdf = pairs.to_pandas()
    if "nkey" not in pdf.columns or pdf.empty:
        return empty
    pdf = pdf.drop_duplicates(["nkey", "skey"])

    # candidate-proportional signature + id gathers on both sides
    # (uniform (key, id, sig-bytes) output regardless of side/id name)
    def gather(ds_side, wanted, the_id_col, from_text: bool
               ) -> pd.DataFrame:
        wref = ray.put(wanted)

        def fn(b: pa.Table) -> pa.Table:
            keys, sel = _wanted_keys_mask(b.column(the_id_col), wref)
            idx = np.nonzero(sel)[0]
            sub = b.take(pa.array(idx, type=pa.int64()))
            if from_text:
                st = _cached_stage(text_col, id_col, num_hashes, k,
                                   bands)
                sigs = st._signatures(sub.column(text_col).to_pylist())
            else:
                sigs = _sig_matrix(sub.column("sig"), num_hashes)
            return pa.table({"key": pa.array(keys[idx]),
                             "id": sub.column(the_id_col),
                             "sig": pa.array([s.tobytes() for s in sigs],
                                             type=pa.binary())})

        return ds_side.map_batches(fn, batch_format="pyarrow",
                                   zero_copy_batch=True).to_pandas()

    nmap = gather(new_ds.select_columns([id_col, text_col]),
                  np.unique(pdf["nkey"].to_numpy()), id_col, True)
    smap = gather(seen_sigs, np.unique(pdf["skey"].to_numpy()),
                  seen_id_col, False)

    def sorted_side(frame: pd.DataFrame):
        order = np.argsort(frame["key"].to_numpy(), kind="stable")
        keys = frame["key"].to_numpy()[order]
        ids = frame["id"].to_numpy()[order]
        mat = np.frombuffer(b"".join(frame["sig"].iloc[order]),
                            dtype=np.uint64) \
            .reshape(len(frame), num_hashes) if len(frame) else \
            np.zeros((0, num_hashes), dtype=np.uint64)
        return keys, ids, mat

    nkeys, nids, nmat = sorted_side(nmap)
    skeys, sids, smat = sorted_side(smap)
    pn = pdf["nkey"].to_numpy()
    ps = pdf["skey"].to_numpy()
    nlo = np.searchsorted(nkeys, pn, side="left")
    nhi = np.searchsorted(nkeys, pn, side="right")
    slo = np.searchsorted(skeys, ps, side="left")
    shi = np.searchsorted(skeys, ps, side="right")
    ni, si = pairsops_expand(nlo, nhi, slo, shi)
    if len(ni) == 0:
        return empty
    parts = []
    for lo in range(0, len(ni), 16_384):  # LLC-sized gather chunks
        parts.append((nmat[ni[lo:lo + 16_384]] ==
                      smat[si[lo:lo + 16_384]]).mean(axis=1))
    est = np.concatenate(parts)
    hit = est >= threshold
    if not hit.any():
        return empty
    return pd.DataFrame({"new_id": nids[ni[hit]],
                         "seen_id": sids[si[hit]],
                         "est_jaccard": np.round(est[hit], 6)}) \
        .drop_duplicates(["new_id", "seen_id"]) \
        .sort_values(["new_id", "seen_id"]).reset_index(drop=True)
