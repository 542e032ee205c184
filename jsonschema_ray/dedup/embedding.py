"""Embedding-cosine near-duplicate detection: random-hyperplane LSH
(Charikar 2002 SimHash for angles) to bucket, exact cosine verify in-bucket.

Same shuffle discipline as the other dedups: only (bucket, id, vector)
rows move; buckets are capped against skew."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa



def _hyperplane_bucket(batch: pa.Table, *, vec_col: str, id_col: str,
                       planes: int, dim: int, seed: int) -> pa.Table:
    from ..util import worker_cached
    H = worker_cached(("hyperplanes", dim, planes, seed),
                      lambda: np.random.default_rng(seed)
                      .standard_normal((dim, planes)))
    vecs = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
    signs = (vecs @ H) > 0
    bucket = np.zeros(len(vecs), dtype=np.uint64)
    for k in range(signs.shape[1]):
        bucket |= signs[:, k].astype(np.uint64) << np.uint64(k)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    return pa.table({
        "bucket": pa.array(bucket.view(np.int64)),
        id_col: batch.column(id_col),
        "unit": pa.array(list(unit.astype(np.float32))),
    })


def embedding_near_duplicates(ds, vec_col: str = "embedding",
                              id_col: str = "vec_id", dim: int = 64,
                              threshold: float = 0.95, planes: int = 12,
                              seed: int = 11, max_bucket: int = 4096,
                              batch_size: int = 8192):
    """→ Dataset of pairs ``(id_a, id_b, cosine)`` with cosine ≥ threshold
    that share an LSH bucket (approximate recall, exact precision)."""
    import functools
    bucketed = ds.select_columns([id_col, vec_col]).map_batches(
        functools.partial(_hyperplane_bucket, vec_col=vec_col,
                          id_col=id_col, planes=planes, dim=dim, seed=seed),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)

    empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                          "id_b": pd.Series([], dtype=np.int64),
                          "cosine": pd.Series([], dtype=float)})

    def partition_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return empty.copy()
        ids_all = df[id_col].to_numpy()
        unit_all = df["unit"].to_numpy()
        out = []
        for _, idx in df.groupby("bucket", sort=False).indices.items():
            k = len(idx)
            if k < 2:
                continue
            if k > max_bucket:  # skew guard
                idx = idx[:max_bucket]
                k = max_bucket
            U = np.stack(unit_all[idx]).astype(np.float64)
            ids = ids_all[idx]
            ai, bi = np.triu_indices(k, 1)
            cos = (U @ U.T)[ai, bi]
            hit = cos >= threshold
            if not hit.any():
                continue
            ia, ib = ids[ai[hit]], ids[bi[hit]]
            swap = ia > ib
            out.append(pd.DataFrame({"id_a": np.where(swap, ib, ia),
                                     "id_b": np.where(swap, ia, ib),
                                     "cosine": np.round(cos[hit], 6)}))
        if not out:
            return empty.copy()
        return pd.concat(out)

    from ..util import partitioned_group_apply
    return partitioned_group_apply(bucketed, ["bucket"], partition_pairs,
                                   num_partitions=32)
