"""Embedding-cosine near-duplicate detection: random-hyperplane LSH
(Charikar 2002 SimHash for angles) to bucket, exact cosine verify
in-bucket, OR-amplified across ``tables`` independent hyperplane sets
(recall ≈ 1-(1-p^planes)^tables instead of a single table's p^planes).

Same shuffle discipline as the other dedups: only (bucket, id, vector)
rows move; buckets are capped against skew; cross-table pair duplicates
are removed by a final narrow dedup pass over the (small) pair set."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _hyperplane_bucket(batch: pa.Table, *, vec_col: str, id_col: str,
                       planes: int, dim: int, seed: int,
                       tables: int) -> pa.Table:
    from ..ann.search import embedding_matrix
    from ..util import worker_cached
    H = worker_cached(("hyperplanes", dim, planes, seed, tables),
                      lambda: np.random.default_rng(seed)
                      .standard_normal((tables, dim, planes)))
    vecs = embedding_matrix(batch.column(vec_col))  # flatten→reshape
    n = len(vecs)
    norms = np.linalg.norm(vecs, axis=1)
    norms[norms == 0] = 1.0
    unit = vecs / norms[:, None]
    buckets, ids_rep, units_rep = [], [], []
    unit32 = unit.astype(np.float32)
    for t in range(tables):
        signs = (vecs @ H[t]) > 0
        b = np.zeros(n, dtype=np.uint64)
        for k in range(planes):
            b |= signs[:, k].astype(np.uint64) << np.uint64(k)
        # table id in the high bits: a bucket never spans tables
        buckets.append((np.uint64(t) << np.uint64(56)) | b)
    bucket = np.concatenate(buckets).view(np.int64)
    idx = pa.array(np.tile(np.arange(n, dtype=np.int64), tables))
    return pa.table({
        "bucket": pa.array(bucket),
        id_col: batch.column(id_col).take(idx),
        "unit": pa.array(list(unit32)).take(idx),
    })


def embedding_near_duplicates(ds, vec_col: str = "embedding",
                              id_col: str = "vec_id", dim: int = 64,
                              threshold: float = 0.95, planes: int = 12,
                              seed: int = 11, max_bucket: int = 4096,
                              batch_size: int = 8192, tables: int = 4):
    """→ Dataset of pairs ``(id_a, id_b, cosine)`` with cosine ≥ threshold
    that share an LSH bucket in ANY of ``tables`` hyperplane tables
    (OR-amplified recall, exact precision)."""
    import functools
    bucketed = ds.select_columns([id_col, vec_col]).map_batches(
        functools.partial(_hyperplane_bucket, vec_col=vec_col,
                          id_col=id_col, planes=planes, dim=dim, seed=seed,
                          tables=tables),
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
    pairs = partitioned_group_apply(bucketed, ["bucket"], partition_pairs,
                                    num_partitions=None)
    # cross-table duplicates of the same pair land in different buckets →
    # one narrow dedup shuffle over the (small) pair set
    return partitioned_group_apply(
        pairs, ["id_a", "id_b"],
        lambda df: df.drop_duplicates(["id_a", "id_b"]),
        num_partitions=8)
