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

from ..sketches.hashing import _splitmix64, hash64_array
from ..util import default_concurrency

_MERSENNE = np.uint64((1 << 61) - 1)


def _char_shingles(text: str, k: int) -> list[str]:
    if len(text) < k:
        return [text] if text else []
    return [text[i:i + k] for i in range(len(text) - k + 1)]


def shingle_hashes(text: str, k: int) -> np.ndarray:
    sh = _char_shingles(text, k)
    if not sh:
        return np.array([], dtype=np.uint64)
    return np.unique(hash64_array(pa.array(sh)))


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        n = len(texts)
        sigs = np.empty((n, self.m), dtype=np.uint64)
        for i, t in enumerate(texts):
            sigs[i] = self.signature(t or "")
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


def _partition_candidates(id_col: str, threshold: float, max_bucket: int):
    """Per coarse partition: pandas-group by (band_id, band_hash), verify
    buckets pairwise on the minhash signatures (vectorized)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return _EMPTY.copy()
        ids_all = df[id_col].to_numpy()
        sig_all = df["sig"].to_numpy()
        out = []
        for _, idx in df.groupby(["band_id", "band_hash"],
                                 sort=False).indices.items():
            k = len(idx)
            if k < 2:
                continue
            if k > max_bucket:  # skew guard
                idx = idx[:max_bucket]
                k = max_bucket
            ids = ids_all[idx]
            sigs = np.stack([np.frombuffer(sig_all[i], dtype=np.uint64)
                             for i in idx])
            ai, bi = np.triu_indices(k, 1)
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
    exploded = ds.select_columns([id_col, text_col]).map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                   num_hashes=num_hashes, k=k, bands=bands),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
        concurrency=default_concurrency())
    pairs = partitioned_group_apply(
        exploded, ["band_id", "band_hash"],
        _partition_candidates(id_col, threshold, max_bucket),
        num_partitions=num_partitions)
    return partitioned_group_apply(
        pairs, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]),
        num_partitions=max(8, num_partitions // 4))
