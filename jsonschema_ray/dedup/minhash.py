"""MinHash + LSH near-duplicate detection over text (Broder 1997 resemblance
sketches; banding per Leskovec/Rajaraman/Ullman ch.3), as the ray_guide
near-dup pipeline: shingle+minhash per batch → explode to
(band_id, band_hash, doc_id) rows → groupby bands → candidate pairs →
verify exact shingle Jaccard.

Everything before the band groupby is vectorized numpy inside map_batches;
the shuffle carries only (band_id:int8, band_hash:int64, doc_id) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sketches.hashing import _splitmix64

_MERSENNE = np.uint64((1 << 61) - 1)


def _char_shingles(text: str, k: int) -> list[str]:
    if len(text) < k:
        return [text] if text else []
    return [text[i:i + k] for i in range(len(text) - k + 1)]


_FNV = np.uint64(1099511628211)


def kgram_hashes_flat(texts: list, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized k-byte-gram hashing for a whole batch: ONE polynomial
    rolling hash over the concatenated utf-8 bytes (never materializes
    shingle strings — hashing 2M five-char strings through siphash cost 7 s
    per batch; this path is ~50×  cheaper). Texts shorter than k contribute
    one whole-text gram. Returns (flat uint64 hashes, bounds[n+1])."""
    from ..sketches.hashing import _splitmix64
    enc = [(t or "").encode("utf-8") for t in texts]
    n = len(enc)
    lens = np.fromiter((len(b) for b in enc), count=n, dtype=np.int64)
    counts = np.where(lens >= k, lens - k + 1, (lens > 0).astype(np.int64))
    bounds = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])
    total_out = int(bounds[-1])
    out = np.zeros(total_out, dtype=np.uint64)
    total = int(lens.sum())
    if total == 0:
        return out, bounds
    allb = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.uint64)
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
    """map_batches actor: per doc, m minhash values over k-char shingles,
    exploded to one row per LSH band. Permutation coefficients are derived
    deterministically in __init__ (once per actor)."""

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

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.m, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (a*x + b) mod Mersenne61 over the (m, n) outer product
            prod = (self.a[:, None] * (sh[None, :] & _MERSENNE) +
                    self.b[:, None])
            perm = (prod & _MERSENNE) + (prod >> np.uint64(61))
        return perm.min(axis=1)

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

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        n = len(texts)
        sigs = self._signatures(texts)
        r = self.rows_per_band
        band_rows = {"band_id": [], "band_hash": [], self.id_col: [],
                     "sig": []}
        sig_bytes = [s.tobytes() for s in sigs]
        for b in range(self.bands):
            seg = sigs[:, b * r:(b + 1) * r]
            # fold the band's rows into one 64-bit band hash
            acc = np.zeros(n, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(r):
                    acc = _splitmix64(acc ^ seg[:, j])
            band_rows["band_id"].append(np.full(n, b, dtype=np.int16))
            band_rows["band_hash"].append(acc.view(np.int64))
            band_rows[self.id_col].extend(ids)
            band_rows["sig"].extend(sig_bytes)
        return pa.table({
            "band_id": pa.array(np.concatenate(band_rows["band_id"])),
            "band_hash": pa.array(np.concatenate(band_rows["band_hash"])),
            self.id_col: pa.array(band_rows[self.id_col]),
            "sig": pa.array(band_rows["sig"], type=pa.binary()),
        })


_EMPTY = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                       "id_b": pd.Series([], dtype=object),
                       "jaccard_est": pd.Series([], dtype=float)})


def _minhash_batch(batch, *, text_col, id_col, num_hashes, k, bands):
    from ..util import worker_cached
    stage = worker_cached(("minhash", text_col, id_col, num_hashes, k, bands),
                          lambda: MinHashStage(text_col=text_col,
                                               id_col=id_col,
                                               num_hashes=num_hashes, k=k,
                                               bands=bands))
    return stage(batch)


def _partition_candidates(id_col: str, threshold: float, max_bucket: int):
    """Per coarse partition: pandas-group by (band_id, band_hash), verify
    buckets pairwise on the minhash signatures (vectorized)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return _EMPTY.copy()
        from ..util import segment_pairs
        bid = df["band_id"].to_numpy().astype(np.int64)
        bhash = df["band_hash"].to_numpy()
        a_idx, b_idx, order = segment_pairs([bid, bhash], max_bucket)
        if len(a_idx) == 0:
            return _EMPTY.copy()
        ids = df[id_col].to_numpy()[order]
        sig_bytes = df["sig"].to_numpy()[order]
        sigs = np.frombuffer(b"".join(sig_bytes), dtype=np.uint64) \
            .reshape(len(ids), -1)
        out = []
        for lo in range(0, len(a_idx), 1_000_000):
            ai = a_idx[lo:lo + 1_000_000]
            bi = b_idx[lo:lo + 1_000_000]
            est = (sigs[ai] == sigs[bi]).mean(axis=1)
            hit = est >= threshold
            if not hit.any():
                continue
            ia, ib = ids[ai[hit]], ids[bi[hit]]
            swap = ia > ib
            out.append(pd.DataFrame({
                "id_a": np.where(swap, ib, ia),
                "id_b": np.where(swap, ia, ib),
                "jaccard_est": np.round(est[hit], 6)}))
        if not out:
            return _EMPTY.copy()
        return pd.concat(out).drop_duplicates(["id_a", "id_b"])
    return fn


def verified_near_duplicates(ds, text_col: str = "text",
                             id_col: str = "doc_id",
                             threshold: float = 0.7, k: int = 5,
                             **minhash_kw):
    """Candidate pairs from MinHash-LSH, then EXACT k-gram Jaccard verify
    (the 'n-gram Jaccard' dedup variant): candidate ids are few, so their
    texts are fetched via a broadcast-filtered pass and verified
    driver-side. → pandas (id_a, id_b, jaccard) with exact jaccard ≥
    threshold."""
    import pyarrow.compute as pc

    cand = minhash_near_duplicates(
        ds, text_col=text_col, id_col=id_col,
        threshold=max(0.0, threshold - 0.2),  # slack: est is noisy
        k=k, **minhash_kw).to_pandas()
    if cand.empty:
        return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                             "id_b": pd.Series([], dtype=object),
                             "jaccard": pd.Series([], dtype=float)})
    wanted = pa.array(sorted(set(cand["id_a"]) | set(cand["id_b"])))
    texts = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=wanted)),
        batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    lookup = dict(zip(texts[id_col], texts[text_col]))
    jac = np.array([jaccard_shingles(lookup.get(a, ""), lookup.get(b, ""),
                                     k=k)
                    for a, b in zip(cand["id_a"], cand["id_b"])])
    out = cand.loc[jac >= threshold, ["id_a", "id_b"]].copy()
    out["jaccard"] = np.round(jac[jac >= threshold], 6)
    return out.reset_index(drop=True)


def minhash_near_duplicates(ds, text_col: str = "text",
                            id_col: str = "doc_id", threshold: float = 0.7,
                            num_hashes: int = 128, k: int = 5,
                            bands: int = 32, max_bucket: int = 4096,
                            num_partitions: int = 64,
                            batch_size: int = 4096):
    """→ Dataset of near-dup candidate pairs ``(id_a, id_b, jaccard_est)``
    with estimated shingle-Jaccard ≥ threshold (id_a < id_b). One coarse
    hash-partition shuffle on the band key; signatures travel once."""
    from ..util import partitioned_group_apply
    import functools
    exploded = ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(_minhash_batch, text_col=text_col, id_col=id_col,
                          num_hashes=num_hashes, k=k, bands=bands),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    pairs = partitioned_group_apply(
        exploded, ["band_id", "band_hash"],
        _partition_candidates(id_col, threshold, max_bucket),
        num_partitions=num_partitions)
    return partitioned_group_apply(
        pairs, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]),
        num_partitions=max(8, num_partitions // 4))
