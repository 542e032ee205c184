"""Distributed full-corpus spherical k-means (Lloyd's iterations over
unit vectors, cosine assignment) — the scale path when the sample-based
coarse quantizer (`ann.search._train_centroids`) isn't enough: semantic-
dedup clustering, full-corpus IVF training, embedding-space cartography.

Scale shape: above the driver-gather cap, each Lloyd iteration is ONE
streaming pass over the corpus (below it, the measured-size-gated fast
path gathers once and iterates locally with the identical update rule).
A batch assigns its vectors to the nearest centroid (one (n,dim)@(dim,k)
matmul against the broadcast centroid matrix) and emits per-cluster
partial sums via a sorted reduceat — (≤k × dim) partial rows per batch,
the vectors themselves never shuffle. Partials merge through ONE small
``groupby(cluster, dim).sum`` per iteration; the driver touches exactly
k×dim floats. Empty clusters keep their previous centroid (standard
Lloyd's degeneracy handling). Assignment ties break to the lowest
cluster index (np.argmax), deterministically.

No reference analog (the reference is a JSON Schema validator); the
algorithm is public knowledge (Lloyd 1982; spherical variant Dhillon &
Modha 2001)."""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa


def _finite_unit_rows(m: np.ndarray) -> np.ndarray:
    """Unit-normalize rows, EXCLUDING direction-free ones: rows with
    NaN/inf components, rows whose norm overflows float64 (finite but
    huge components), and exact-zero rows (zero-pad vectors from failed
    encoders are common in real corpora). All three would otherwise
    argmax to cluster 0 with a score of 0/NaN — skewing its count and
    the objective — and a zero row drawn as a kmeans++ seed becomes a
    permanently dead all-zero centroid (the empty-cluster rule keeps
    it forever). A NaN/inf component makes the norm NaN/inf, so one
    norm-finiteness test covers every case."""
    with np.errstate(over="ignore", invalid="ignore"):
        # overflow/NaN here IS the exclusion signal, not an error
        norm = np.linalg.norm(m, axis=1)
    ok = np.isfinite(norm) & (norm > 0)
    if not ok.all():
        m, norm = m[ok], norm[ok]
    return m / norm[:, None]


def _iter_partials(b: pa.Table, *, vec_col: str, cref) -> pa.Table:
    """One batch's contribution to one Lloyd iteration: per-cluster
    vector sums, member counts, and cosine-objective partial sums."""
    import ray

    from ..util import worker_cached
    from .search import embedding_matrix
    C = worker_cached(("kmeans_c", cref.hex()), lambda: ray.get(cref))
    empty = pa.table({
        "cluster": pa.array([], type=pa.int64()),
        "dim": pa.array([], type=pa.int64()),
        "sum_part": pa.array([], type=pa.float64()),
        "n_part": pa.array([], type=pa.int64()),
        "cos_part": pa.array([], type=pa.float64())})
    if b.num_rows == 0:
        return empty
    col = b.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        # null rows join the NaN/zero exclusion below (same
        # no-direction convention) instead of aborting the run k
        # iterations deep via embedding_matrix's ValueError
        col = col.drop_null()
    if not len(col):
        return empty
    V = _finite_unit_rows(embedding_matrix(col))
    if not len(V):
        return empty
    if V.shape[1] != C.shape[1]:
        raise ValueError(
            f"kmeans: corpus dim {V.shape[1]} != centroid dim "
            f"{C.shape[1]}")
    scores = V @ C.T                       # cosine: both sides unit
    assign = np.argmax(scores, axis=1)
    best = scores[np.arange(len(V)), assign]
    uc, inv = np.unique(assign, return_inverse=True)
    k, d = len(uc), V.shape[1]
    order = np.argsort(inv, kind="stable")
    starts = np.searchsorted(inv[order], np.arange(k))
    sums = np.add.reduceat(V[order], starts, axis=0)
    cos_sums = np.add.reduceat(best[order], starts)
    cnt = np.bincount(inv, minlength=k).astype(np.int64)
    return pa.table({
        "cluster": pa.array(np.repeat(uc.astype(np.int64), d)),
        "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
        "sum_part": pa.array(sums.ravel()),
        "n_part": pa.array(np.repeat(cnt, d)),
        # objective replicated per dim row would overcount: carry it on
        # the dim-0 row only
        "cos_part": pa.array(
            (np.repeat(cos_sums, d)
             * np.tile(np.arange(d) == 0, k)).astype(np.float64)),
    })


def _spherical_kmeanspp_init(U: np.ndarray, k: int, seed: int,
                             local_iters: int = 5) -> np.ndarray:
    """k-means++ seeding (Arthur & Vassilvitskii 2007, cosine-distance
    weights) + a few local Lloyd rounds on the UNIT-normalized sample —
    a dot-product init on raw vectors (the IVF quantizer's choice) can
    drop two seeds into one blob and leave a cluster permanently empty
    under hard argmax assignment. ``U`` must already be unit rows with
    direction-free rows excluded (``_finite_unit_rows``): a zero row
    here keeps d2 weight 1.0 against every chosen seed forever and
    would likely be drawn as a seed on zero-padded corpora."""
    rng = np.random.default_rng(seed)
    k = min(k, len(U))
    C = np.empty((k, U.shape[1]))
    C[0] = U[rng.integers(len(U))]
    d2 = np.maximum(1.0 - U @ C[0], 0.0)
    for i in range(1, k):
        tot = d2.sum()
        if tot <= 0:
            C[i:] = U[rng.integers(len(U), size=k - i)]
            break
        C[i] = U[rng.choice(len(U), p=d2 / tot)]
        d2 = np.minimum(d2, np.maximum(1.0 - U @ C[i], 0.0))
    for _ in range(local_iters):
        C, _, _ = _lloyd_step(U, C)
    return C


def _lloyd_step(V: np.ndarray, C: np.ndarray):
    """ONE local Lloyd update — the single source of the update rule
    (cosine argmax assignment with ties to the lowest index,
    per-cluster mean re-normalized, empty/zero-norm clusters keep their
    centroid) shared by the k-means++ refinement and the small-corpus
    fast path. → ``(newC, assign, scores)``."""
    scores = V @ C.T
    a = np.argmax(scores, axis=1)
    newC = C.copy()
    for c in np.unique(a):
        v = V[a == c].mean(axis=0)
        nrm = np.linalg.norm(v)
        if nrm > 0:
            newC[c] = v / nrm
    return newC, a, scores


def _gather_vec(ds, vec_col: str) -> pa.Array:
    """Small dataset → one Arrow list column, nulls dropped — no
    per-row Python list round-trip (flat values stay packed)."""
    tbls = list(ds.iter_batches(batch_format="pyarrow", batch_size=8192))
    if not tbls:
        return pa.array([], type=pa.list_(pa.float64()))
    col = pa.concat_tables(tbls, promote_options="permissive") \
        .column(vec_col).combine_chunks()
    return col.drop_null() if col.null_count else col


def _local_lloyd(V: np.ndarray, C: np.ndarray, iters: int):
    """The SAME Lloyd update the distributed loop applies (via
    ``_lloyd_step``), on a resident non-empty unit-row matrix. Float
    sums accumulate in a different order than the per-batch reduceat +
    groupby merge, so results agree to float tolerance, not
    bit-for-bit. counts/mean_cos describe the LAST assignment pass,
    matching the distributed contract."""
    for _ in range(max(1, iters)):
        C, a, scores = _lloyd_step(V, C)
    counts = np.bincount(a, minlength=len(C)).astype(np.int64)
    mean_cos = float(scores[np.arange(len(V)), a].mean())
    return C, counts, mean_cos


def distributed_kmeans(ds, vec_col: str = "embedding", k: int = 16,
                       iters: int = 10, seed: int = 5,
                       train_sample: int = 16384, cache: bool = True,
                       gather_cap_bytes: int = 64 << 20):
    """Full-corpus spherical k-means.

    Init: spherical k-means++ on a seeded uniform sample (one sampled
    pass) — a good start the full-corpus iterations then make exact.
    → ``(centroids (k,dim) float64 unit rows, counts (k,) int64,
    mean_cos float)`` where counts/mean_cos describe the LAST
    assignment pass.

    ``cache=True`` (default) materializes the projected vector column
    into the object store ONCE, so the count, the init sample and every
    Lloyd iteration read from plasma (spilling to disk under pressure)
    instead of re-executing the upstream read/decode pipeline per pass
    — an iters=10 run would otherwise scan the corpus 12 times. Pass
    ``cache=False`` to keep pure streaming when the projected vectors
    exceed cluster storage and re-reading the source is the cheaper
    trade.

    ``gather_cap_bytes`` gates the small-corpus fast path: when the
    MEASURED matrix size (n·dim·8) fits the cap, the corpus is gathered
    once and the identical Lloyd update runs locally — iters sequential
    distributed rounds cost ~1 s of fixed scheduling each, dwarfing the
    math at that scale. Results agree with the streaming loop to float
    tolerance (sum order differs). Pass ``0`` to force the distributed
    plan.
    """
    import ray
    from ray.data.aggregate import Sum

    from .search import embedding_matrix
    if k < 1:
        raise ValueError(f"distributed_kmeans: k must be >= 1, got {k}")
    source = ds.select_columns([vec_col])
    if cache:
        source = source.materialize()
    n = source.count()
    if n == 0:
        raise ValueError("distributed_kmeans: empty corpus")
    frac = min(1.0, train_sample / max(1, n))
    sample_ds = source if frac >= 1.0 \
        else source.random_sample(frac, seed=seed)
    col = _gather_vec(sample_ds, vec_col)
    if not len(col):             # random_sample can miss on tiny inputs
        col = _gather_vec(source.limit(min(n, train_sample)), vec_col)
    U = _finite_unit_rows(embedding_matrix(col)) if len(col) \
        else np.zeros((0, 0))
    if not len(U):
        raise ValueError(
            "distributed_kmeans: no finite vectors in the init sample")
    C = _spherical_kmeanspp_init(U, k, seed)
    # small-corpus fast path (see docstring). When the init sample
    # already covered the whole corpus (frac >= 1.0), U IS the full
    # unit matrix — don't gather and normalize it a second time. A
    # ragged corpus raises inside embedding_matrix on either path.
    d0 = U.shape[1]
    if n * d0 * 8 <= gather_cap_bytes:
        V = U if frac >= 1.0 else _finite_unit_rows(
            embedding_matrix(_gather_vec(source, vec_col)))
        return _local_lloyd(V, C, iters)
    counts = np.zeros(len(C), dtype=np.int64)
    mean_cos = float("nan")
    for _ in range(max(1, iters)):
        cref = ray.put(C)
        merged = source.map_batches(
            functools.partial(_iter_partials, vec_col=vec_col, cref=cref),
            batch_format="pyarrow", zero_copy_batch=True) \
            .groupby(["cluster", "dim"]) \
            .aggregate(Sum("sum_part", alias_name="s"),
                       Sum("n_part", alias_name="n"),
                       Sum("cos_part", alias_name="cos")) \
            .to_pandas()                     # exactly k×dim rows
        if merged.empty:
            raise ValueError("distributed_kmeans: empty corpus")
        d = C.shape[1]
        cl = merged["cluster"].to_numpy().astype(np.int64)
        dim = merged["dim"].to_numpy().astype(np.int64)
        sums = np.zeros((len(C), d))
        sums[cl, dim] = merged["s"].to_numpy()
        counts = np.zeros(len(C), dtype=np.int64)
        counts[cl[dim == 0]] = \
            merged.loc[dim == 0, "n"].to_numpy().astype(np.int64)
        total = counts.sum()
        mean_cos = float(merged.loc[dim == 0, "cos"].sum() / total) \
            if total else float("nan")
        newC = C.copy()                      # empty cluster: keep old
        nz = counts > 0
        means = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(means, axis=1)
        pos = norms > 0
        upd = means.copy()
        upd[pos] = means[pos] / norms[pos, None]
        newC[nz] = np.where(pos[:, None], upd, newC[nz])
        C = newC
    return C, counts, mean_cos
