"""Distributed PCA over an embedding column — ONE streaming pass
emitting per-batch second-moment partials (dim×dim floats per batch,
the vectors never shuffle), a driver-side eigendecomposition of the
dim×dim covariance, and an optional projection stage (a broadcast
matmul per batch). The dimension-reduction step a 100 TB embedding
pipeline runs before ANN indexing or semantic dedup.

Scale shape mirrors ``ann.kmeans``: the corpus-sized work is a
``map_batches`` combiner whose output is O(dim²) per batch regardless
of batch rows; the groupby merges exactly dim×(dim+1)/2 + dim + 1
partial cells; the driver touches one dim×dim matrix. No reference
analog (public knowledge: Pearson 1901 / standard covariance PCA).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa


def _moment_partials(b: pa.Table, *, vec_col: str) -> pa.Table:
    """Per-batch Σx (dim), Σxxᵀ (upper triangle, flattened) and n —
    null and non-finite rows excluded (the kmeans convention)."""
    from .search import embedding_matrix
    empty = pa.table({"cell": pa.array([], type=pa.int64()),
                      "v": pa.array([], type=pa.float64())})
    if b.num_rows == 0:
        return empty
    col = b.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = col.drop_null()
    if not len(col):
        return empty
    X = embedding_matrix(col)
    ok = np.isfinite(X).all(axis=1)
    if not ok.all():
        X = X[ok]
    if not len(X):
        return empty
    d = X.shape[1]
    iu = np.triu_indices(d)
    xtx = (X.T @ X)[iu]                  # upper triangle, row-major
    sums = X.sum(axis=0)
    # cell layout: [0, len(iu)) = xtx cells, then d sum cells, then n;
    # cell -d is a dimension MARKER — batches from a mixed-dim corpus
    # would otherwise merge incompatible layouts into a silently wrong
    # covariance (within-batch raggedness already raises in
    # embedding_matrix; this guards the cross-batch case)
    cells = np.concatenate([
        np.arange(len(xtx), dtype=np.int64),
        np.arange(len(xtx), len(xtx) + d, dtype=np.int64),
        np.array([len(xtx) + d, -d], dtype=np.int64)])
    vals = np.concatenate([xtx, sums, [float(len(X)), 0.0]])
    return pa.table({"cell": pa.array(cells), "v": pa.array(vals)})


def covariance(ds, vec_col: str = "embedding", strict: bool = True):
    """Streaming sample covariance of the embedding column →
    ``(cov (dim, dim), mean (dim,), n)`` — unbiased (n-1) denominator,
    null / non-finite rows excluded, one corpus pass (the per-batch
    partial is O(dim²) regardless of batch rows).

    ``strict=False`` degrades instead of dying on a corpus with fewer
    than 2 usable vectors: returns ``(None, None, n)`` — SQL's
    covar_samp/corr answer NULL there, and callers mirroring an oracle
    need the same shape, not a ValueError."""
    from ray.data.aggregate import Sum

    merged = ds.select_columns([vec_col]).map_batches(
        functools.partial(_moment_partials, vec_col=vec_col),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("cell").aggregate(Sum("v", alias_name="s")) \
        .to_pandas()
    if merged.empty:
        if not strict:
            return None, None, 0
        raise ValueError("covariance: empty corpus")
    cells = merged["cell"].to_numpy().astype(np.int64)
    dims = -cells[cells < 0]
    if len(dims) > 1:
        raise ValueError(
            f"covariance: mixed embedding dimensions across batches: "
            f"{sorted(int(x) for x in dims)}")
    keep = cells >= 0
    cells, svals = cells[keep], merged["s"].to_numpy()[keep]
    vals = np.zeros(int(cells.max()) + 1)
    vals[cells] = svals
    n = vals[-1]
    if n < 2:
        if not strict:
            return None, None, int(n)
        raise ValueError(
            f"covariance: needs >= 2 finite vectors, got {int(n)}")
    # solve d from the cell count: t + d + 1 where t = d(d+1)/2
    total = len(vals)
    d = int((-3 + np.sqrt(9 + 8 * (total - 1))) // 2)
    t = d * (d + 1) // 2
    assert t + d + 1 == total and d == int(dims[0]), (d, total, dims)
    iu = np.triu_indices(d)
    xtx = np.zeros((d, d))
    xtx[iu] = vals[:t]
    xtx = xtx + np.triu(xtx, 1).T
    mean = vals[t:t + d] / n
    cov = (xtx - n * np.outer(mean, mean)) / (n - 1.0)
    return cov, mean, int(n)


def distributed_pca(ds, vec_col: str = "embedding",
                    n_components: int | None = None):
    """→ ``(components (k, dim) rows = principal axes sorted by
    descending eigenvalue, explained_variance (k,), mean (dim,), n)``.

    Covariance uses the unbiased (n-1) denominator. Eigenvector SIGN is
    fixed deterministically (largest-|coefficient| component positive)
    — eigensolvers are sign-ambiguous and downstream projections must
    be reproducible across runs."""
    cov, mean, n = covariance(ds, vec_col=vec_col)
    d = cov.shape[0]
    w, v = np.linalg.eigh(cov)           # ascending
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    k = d if n_components is None else min(n_components, d)
    comps = v[:, :k].T
    # deterministic sign: the largest-|coeff| entry is positive; ties
    # break to the lowest index (argmax)
    flip = comps[np.arange(k), np.abs(comps).argmax(axis=1)] < 0
    comps[flip] *= -1.0
    return comps, np.maximum(w[:k], 0.0), mean, int(n)


def mahalanobis_scores(ds, cov: np.ndarray, mean: np.ndarray,
                       vec_col: str = "embedding",
                       out_col: str = "maha2",
                       ridge: float = 1e-6):
    """Append the squared Mahalanobis distance of each vector to the
    broadcast ``(cov, mean)`` — the covariance-aware outlier score a
    distribution-drift / anomaly screen runs over an embedding column.
    The precision matrix is inverted ONCE on the driver (dim×dim, with
    a ``ridge``·trace/dim Tikhonov floor so a rank-deficient corpus
    cannot produce infinities) and shipped via ray.put; each batch pays
    one matmul. Null / non-finite rows get a null score."""
    import ray

    from ..util import worker_cached
    d = cov.shape[0]
    reg = cov + np.eye(d) * (ridge * max(np.trace(cov) / d, 1e-300))
    prec = np.linalg.inv(reg)
    pref = ray.put((np.ascontiguousarray(prec),
                    np.ascontiguousarray(mean)))

    def fn(b: pa.Table) -> pa.Table:
        from .search import embedding_matrix
        P, mu = worker_cached(("maha_p", pref.hex()),
                              lambda: ray.get(pref))
        if b.num_rows == 0:
            return b.append_column(out_col,
                                   pa.array([], type=pa.float64()))
        col = b.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = np.asarray(col.is_valid())
        X = np.zeros((b.num_rows, len(mu)))
        if valid.any():
            Xv = embedding_matrix(col.drop_null())
            fin = np.isfinite(Xv).all(axis=1)
            rows = np.flatnonzero(valid)
            valid2 = valid.copy()
            valid2[rows[~fin]] = False
            X[valid2] = Xv[fin]
            valid = valid2
        C = X - mu
        d2 = np.einsum("ij,jk,ik->i", C, P, C)
        return b.append_column(out_col, pa.array(
            d2, type=pa.float64(), mask=~valid))

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def project(ds, components: np.ndarray, mean: np.ndarray,
            vec_col: str = "embedding", out_col: str = "pca"):
    """Append the k-dim projection of ``vec_col`` onto broadcast
    ``components`` — one matmul per batch; rows with null/non-finite
    vectors get a null projection."""
    import ray

    from ..util import worker_cached
    cref = ray.put((np.ascontiguousarray(components),
                    np.ascontiguousarray(mean)))

    def fn(b: pa.Table) -> pa.Table:
        from .search import embedding_matrix
        C, mu = worker_cached(("pca_c", cref.hex()),
                              lambda: ray.get(cref))
        col = b.column(vec_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if b.num_rows == 0:
            return b.append_column(out_col, pa.array(
                [], type=pa.list_(pa.float64(), C.shape[0])))
        valid = np.asarray(col.is_valid())
        X = np.zeros((b.num_rows, len(mu)))
        if valid.any():
            Xv = embedding_matrix(col.drop_null())
            fin = np.isfinite(Xv).all(axis=1)
            rows = np.flatnonzero(valid)
            valid2 = valid.copy()
            valid2[rows[~fin]] = False
            X[valid2] = Xv[fin]
            valid = valid2
        P = (X - mu) @ C.T
        flat = pa.array(P.ravel(), type=pa.float64())
        proj = pa.FixedSizeListArray.from_arrays(flat, C.shape[0])
        if not valid.all():
            import pyarrow.compute as pc
            proj = pc.if_else(pa.array(valid), proj,
                              pa.nulls(len(valid), type=proj.type))
        return b.append_column(out_col, proj)

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)
