"""Dedup family + text analysis + ANN against planted ground truth (the
driver testdata has no natural duplicates, so these synthesize their own)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs_with_dups(n=400, seed=0):
    rng = np.random.default_rng(seed)
    words = ("data table row batch vector hash scan merge sort group key "
             "stream window filter value column query join index").split()
    texts, ids = [], []
    for i in range(n):
        t = " ".join(rng.choice(words, 40))
        texts.append(t)
        ids.append(i)
    # exact dups: every 50th doc duplicates its predecessor
    for i in range(50, n, 50):
        texts[i] = texts[i - 1]
    # near dups: every 50th+10 doc = predecessor with one word changed
    for i in range(10, n, 50):
        w = texts[i - 1].split()
        w[5] = "changed"
        texts[i] = " ".join(w)
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts)})


def test_exact_dedup_with_planted_dups(ray_mod=None):
    import ray.data as rd
    from jsonschema_ray.dedup import exact_dedup, exact_dedup_stats
    t = _docs_with_dups()
    ds = rd.from_arrow(t)
    stats = exact_dedup_stats(ds).to_pandas()
    texts = t["text"].to_pylist()
    n_distinct = len(set(texts))
    assert len(stats) == n_distinct
    dup_groups = stats[stats["n_copies"] > 1]
    # planted: ids 49/50, 99/100, ... → min id wins
    assert set(dup_groups["doc_id"]) == {i - 1 for i in range(50, 400, 50)}
    assert (dup_groups["n_copies"] == 2).all()
    kept = exact_dedup(ds).to_pandas()
    assert len(kept) == n_distinct
    assert kept["text"].is_unique


def test_minhash_finds_planted_near_dups():
    import ray.data as rd
    from jsonschema_ray.dedup import (minhash_near_duplicates,
                                      verified_near_duplicates,
                                      jaccard_shingles)
    t = _docs_with_dups()
    ds = rd.from_arrow(t)
    pairs = minhash_near_duplicates(ds, threshold=0.6).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    planted = {(i - 1, i) for i in range(10, 400, 50)} \
        | {(i - 1, i) for i in range(50, 400, 50)}
    assert planted <= found, planted - found
    # verified variant: exact jaccard attached, all ≥ threshold
    ver = verified_near_duplicates(ds, threshold=0.6)
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    for _, r in ver.iterrows():
        exact = jaccard_shingles(texts[r["id_a"]], texts[r["id_b"]])
        assert abs(exact - r["jaccard"]) < 1e-6
        assert r["jaccard"] >= 0.6


def test_simhash_locality():
    from jsonschema_ray.checks.neardup import hamming64
    from jsonschema_ray.text import simhash64_batch
    base = "the quick brown fox jumps over the lazy dog " * 6
    variant = base.replace("lazy", "busy")
    other = "completely different content about database engines " * 6
    h = simhash64_batch(pa.array([base, variant, other]))
    d_near = hamming64(np.array([h[0]]), np.array([h[1]]))[0]
    d_far = hamming64(np.array([h[0]]), np.array([h[2]]))[0]
    assert d_near < d_far
    assert d_near <= 12


def test_embedding_neardup_planted():
    import ray.data as rd
    from jsonschema_ray.dedup import embedding_near_duplicates
    rng = np.random.default_rng(5)
    n, dim = 500, 64
    V = rng.standard_normal((n, dim)).astype(np.float32)
    # plant near-identical pairs: rows i and i+250 for i in 0..9
    for i in range(10):
        V[i + 250] = V[i] + rng.standard_normal(dim).astype(np.float32) * .01
    t = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                  "embedding": pa.array(list(V))})
    pairs = embedding_near_duplicates(rd.from_arrow(t),
                                      threshold=0.98).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    planted = {(i, i + 250) for i in range(10)}
    # hyperplane LSH recall is probabilistic; near-identical vectors land
    # in the same bucket with overwhelming probability
    assert len(planted & found) >= 9
    assert (pairs["cosine"] >= 0.98).all()


def test_ivf_recall_vs_brute_force():
    import ray.data as rd
    from jsonschema_ray.ann import brute_force_topk, ivf_topk
    rng = np.random.default_rng(9)
    n, dim = 2000, 64
    V = rng.standard_normal((n, dim)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                  "embedding": pa.array(list(V))})
    ds = rd.from_arrow(t)
    queries = [V[3], V[77]]
    bf = brute_force_topk(ds, queries, query_ids=[3, 77], k=10)
    ivf = ivf_topk(ds, queries, query_ids=[3, 77], k=10,
                   ncells=32, nprobe=16)
    for qid in (3, 77):
        b = set(bf[bf["query_id"] == qid]["vec_id"])
        v = set(ivf[ivf["query_id"] == qid]["vec_id"])
        assert len(b & v) >= 7, f"IVF recall too low for query {qid}"


def test_rolling_fingerprint_stability():
    from jsonschema_ray.text.analysis import rolling_fingerprint
    a = "some document content that is long enough for fingerprints"
    fp1 = rolling_fingerprint(pa.array([a, a + "!", "short"]))
    fp2 = rolling_fingerprint(pa.array([a]))
    assert fp1[0] == fp2[0]          # deterministic
    assert len(fp1[0]) == 4
    assert fp1[2] == []              # under window → empty
    # appending one char preserves most minima
    assert len(set(fp1[0]) & set(fp1[1])) >= 3


def test_ivf_index_build_and_probe(tmp_path):
    """Materialized IVF: build writes cell-partitioned parquet once; a
    probe reads ONLY the nprobe cells' files and still recalls the
    brute-force neighbors."""
    import os

    import ray.data as rd
    from jsonschema_ray.ann import IvfIndex, brute_force_topk
    rng = np.random.default_rng(13)
    n, dim = 2000, 64
    V = rng.standard_normal((n, dim)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                  "embedding": pa.array(list(V))})
    ds = rd.from_arrow(t)
    idx_dir = str(tmp_path / "ivf")
    idx = IvfIndex.build(ds, idx_dir, ncells=32, train_sample=1000)
    # layout: one directory per cell + saved centroids
    cells = [d for d in os.listdir(idx_dir) if d.startswith("cell=")]
    assert len(cells) >= 16
    assert os.path.exists(os.path.join(idx_dir, "centroids.npy"))
    # reload from disk and probe
    idx2 = IvfIndex.load(idx_dir)
    queries = [V[3], V[77]]
    bf = brute_force_topk(ds, queries, query_ids=[3, 77], k=10)
    res = idx2.topk(queries, query_ids=[3, 77], k=10, nprobe=16)
    for qid in (3, 77):
        b = set(bf[bf["query_id"] == qid]["vec_id"])
        v = set(res[res["query_id"] == qid]["vec_id"])
        assert len(b & v) >= 7, f"IVF-index recall too low for {qid}"
    # probe I/O: nprobe=1 touches exactly the union of 2 queries' cells
    one = idx2.topk(queries, query_ids=[3, 77], k=5, nprobe=1)
    assert len(one) >= 2  # each query found neighbors in its own cell


def test_embedding_matrix_zero_copy_paths():
    from jsonschema_ray.ann.search import embedding_matrix
    v = np.arange(12, dtype=np.float32).reshape(4, 3)
    lst = pa.array([list(r) for r in v])
    fsl = pa.array(list(v), type=pa.list_(pa.float32(), 3))
    np.testing.assert_allclose(embedding_matrix(lst), v)
    np.testing.assert_allclose(embedding_matrix(fsl), v)
    np.testing.assert_allclose(
        embedding_matrix(pa.chunked_array([lst.slice(0, 2),
                                           lst.slice(2, 2)])), v)
    try:
        embedding_matrix(pa.array([[1.0], [1.0, 2.0]]))
        raise AssertionError("ragged column must raise")
    except ValueError:
        pass


def test_exact_cosine_pairs_matches_numpy(ray_mod=None):
    import ray.data as rd

    from jsonschema_ray.dedup import exact_cosine_pairs
    rng = np.random.default_rng(13)
    n, dim = 200, 16
    V = rng.standard_normal((n, dim)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                  "embedding": pa.array(list(V))})
    got = exact_cosine_pairs(rd.from_arrow(t), threshold=0.5) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    U = V.astype(np.float64)
    U /= np.linalg.norm(U, axis=1)[:, None]
    cos = U @ U.T
    ai, bi = np.nonzero(np.triu(cos >= 0.5, k=1))
    assert len(got) == len(ai) > 0
    assert got["id_a"].tolist() == ai.tolist()
    assert got["id_b"].tolist() == bi.tolist()
    assert np.allclose(got["cosine"], np.round(cos[ai, bi], 6))
    # corpus above the broadcast cap must refuse, pointing at the LSH path
    try:
        exact_cosine_pairs(rd.from_arrow(t), broadcast_cap=0)
        raise AssertionError("expected ValueError above cap")
    except ValueError as e:
        assert "LSH" in str(e) or "scale" in str(e)


def test_ngram_jaccard_pairs_matches_brute_force():
    import pyarrow.parquet as pq
    import ray.data as rd

    from jsonschema_ray.dedup import jaccard_shingles, ngram_jaccard_pairs
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    got = ngram_jaccard_pairs(rd.from_arrow(t), threshold=0.5) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    texts = t.column("text").to_pylist()
    ids = t.column("doc_id").to_numpy()
    exp = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            jj = jaccard_shingles(texts[i] or "", texts[j] or "", 5)
            if jj >= 0.5:
                exp.append((min(ids[i], ids[j]), max(ids[i], ids[j]),
                            round(jj, 6)))
    exp.sort()
    assert len(got) == len(exp) > 0
    assert got["id_a"].tolist() == [e[0] for e in exp]
    assert got["id_b"].tolist() == [e[1] for e in exp]
    assert np.allclose(got["jaccard"], [e[2] for e in exp])
    # above the broadcast cap it must refuse, pointing at the LSH path
    try:
        ngram_jaccard_pairs(rd.from_arrow(t), broadcast_cap=0)
        raise AssertionError("expected ValueError above cap")
    except ValueError as e:
        assert "LSH" in str(e)
    # dense-matrix cap independently gated
    try:
        ngram_jaccard_pairs(rd.from_arrow(t), dense_cap_bytes=0)
        raise AssertionError("expected ValueError above dense cap")
    except ValueError as e:
        assert "dense" in str(e)


def test_ngram_jaccard_edge_docs():
    import ray.data as rd

    from jsonschema_ray.dedup import ngram_jaccard_pairs
    t = pa.table({"doc_id": [1, 2, 3, 4, 5, 6],
                  "text": ["abcdefgh", "abcdefgh",  # identical
                           "ab", "ab",              # short-doc whole-text gram
                           "", None]})  # empty gram sets pair at 1.0
    got = ngram_jaccard_pairs(rd.from_arrow(t), threshold=0.5).to_pandas()
    pairs = set(zip(got.id_a, got.id_b))
    # (5, 6): two empty gram sets score jaccard 1.0, exactly like
    # jaccard_shingles and the minhash verify path
    assert pairs == {(1, 2), (3, 4), (5, 6)}
    assert np.allclose(got.jaccard, 1.0)


def test_simhash_neardup_matches_brute_force():
    import pyarrow.parquet as pq
    import ray.data as rd

    from jsonschema_ray.dedup import simhash_near_duplicates
    from jsonschema_ray.text.analysis import simhash64_batch
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    sh = simhash64_batch(t.column("text").combine_chunks()).view(np.uint64)
    ids = t.column("doc_id").to_numpy()
    exp = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin(int(sh[i]) ^ int(sh[j])).count("1")
            if d <= 3:
                exp.add((min(ids[i], ids[j]), max(ids[i], ids[j]), d))
    got = simhash_near_duplicates(rd.from_arrow(t), max_distance=3) \
        .to_pandas()
    assert set(zip(got.id_a, got.id_b, got.distance)) == exp
    assert len(exp) > 0


def test_simhash_neardup_string_ids():
    """String id columns go through the hashed-key shuffle + translation."""
    import ray.data as rd

    from jsonschema_ray.dedup import simhash_near_duplicates
    t = pa.table({"doc_id": ["d1", "d2", "d3"],
                  "text": ["the quick brown fox jumps over the lazy dog",
                           "the quick brown fox jumps over the lazy cat",
                           "completely different words entirely here now"]})
    got = simhash_near_duplicates(rd.from_arrow(t), max_distance=16) \
        .to_pandas()
    pairs = set(zip(got.id_a, got.id_b))
    assert ("d1", "d2") in pairs
    assert ("d1", "d3") not in pairs and ("d2", "d3") not in pairs


def test_distributed_kmeans_matches_single_node_lloyd(ray_session):
    """Full-corpus spherical k-means: recovers well-separated blobs,
    matches a single-node Lloyd reference run from the same init, and is
    invariant to repartitioning (per-batch reduceat partials merge to
    the same sums)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.ann import distributed_kmeans
    from jsonschema_ray.ann.kmeans import _spherical_kmeanspp_init
    from jsonschema_ray.ann.search import _unit_rows

    rng = np.random.default_rng(2)
    centers = np.eye(8)[:3] * 10
    X = np.concatenate([c + rng.normal(0, 0.1, (200, 8))
                        for c in centers])
    t = pa.table({"embedding": [list(r) for r in X]})
    ds = rd.from_arrow(t)
    C, counts, mc = distributed_kmeans(ds, k=3, iters=6, seed=5)
    assert sorted(counts) == [200, 200, 200]
    assert mc > 0.999
    U = centers / np.linalg.norm(centers, axis=1, keepdims=True)
    assert ((U @ C.T).max(axis=1) > 0.999).all()
    # the cap-gated local fast path (taken above) must agree with the
    # FORCED distributed loop — same init, same update rule, float-sum
    # order is the only difference
    Cd, countsd, mcd = distributed_kmeans(ds, k=3, iters=6, seed=5,
                                          gather_cap_bytes=0)
    assert np.abs(Cd - C).max() < 1e-9
    assert countsd.tolist() == counts.tolist()
    assert abs(mcd - mc) < 1e-9

    # single-node Lloyd from the same init (train_sample covers the
    # whole corpus, so the sample init is the full-data init; init now
    # takes pre-normalized rows)
    from jsonschema_ray.ann.kmeans import _finite_unit_rows
    Cr = _spherical_kmeanspp_init(_finite_unit_rows(X), 3, seed=5)
    V = _unit_rows(X.copy())
    for _ in range(6):
        a = np.argmax(V @ Cr.T, axis=1)
        for c in range(3):
            m = V[a == c]
            if len(m):
                v = m.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    Cr[c] = v / n
    assert np.abs(C - Cr).max() < 1e-9

    # repartition invariance of the DISTRIBUTED loop (per-batch reduceat
    # partials merge to the same sums) — force it past the fast path
    C2, counts2, _ = distributed_kmeans(ds.repartition(7), k=3,
                                        iters=6, seed=5,
                                        gather_cap_bytes=0)
    assert np.abs(np.sort(C.ravel()) - np.sort(C2.ravel())).max() < 1e-9
    assert sorted(counts2.tolist()) == sorted(counts.tolist())

    # k > n degrades to n centroids — on BOTH physical plans
    for cap in (64 << 20, 0):
        C3, cnt3, _ = distributed_kmeans(rd.from_arrow(t.slice(0, 2)),
                                         k=5, iters=2, seed=1,
                                         gather_cap_bytes=cap)
        assert C3.shape[0] == 2 and cnt3.tolist() == [1, 1]


def test_distributed_kmeans_excludes_nonfinite_vectors(ray_session):
    """A NaN embedding row must not poison any centroid (it would argmax
    to cluster 0 and sum NaN into its mean forever)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.ann import distributed_kmeans
    rng = np.random.default_rng(4)
    centers = np.eye(4)[:2] * 10
    X = np.concatenate([c + rng.normal(0, 0.1, (50, 4)) for c in centers])
    rows = [list(r) for r in X]
    rows.append([float("nan")] * 4)
    rows.append([float("inf"), 0.0, 0.0, 0.0])
    rows.append([0.0] * 4)            # zero-pad row: no direction
    rows.append([1e300] * 4)          # finite components, norm overflows
    rows.append(None)                 # null row: skipped, not a crash
    ds = rd.from_arrow(pa.table({"embedding": rows}))
    # exclusion semantics on BOTH physical plans: the local fast path
    # and the forced distributed loop (the logic lives in different
    # functions)
    by_plan = {}
    for cap in (64 << 20, 0):
        C, counts, mc = distributed_kmeans(ds, k=2, iters=4, seed=5,
                                           gather_cap_bytes=cap)
        assert np.isfinite(C).all()
        assert sorted(counts.tolist()) == [50, 50]  # bad rows excluded
        assert mc > 0.99
        by_plan[cap] = (C, counts)
    C, counts = by_plan[64 << 20]     # local-plan result for the
    # bit-identity comparison below (plans differ in float-sum order)
    # direction-free rows must not be seedable either: a corpus that is
    # mostly zero-pads still recovers the two real blobs
    pad = [[0.0] * 4] * 500
    ds2 = rd.from_arrow(pa.table({"embedding": [list(r) for r in X] + pad}))
    for cap in (64 << 20, 0):   # incl. the distributed plan's
        # all-excluded-batch `empty` partial path
        C2, counts2, _ = distributed_kmeans(ds2, k=2, iters=4, seed=5,
                                            gather_cap_bytes=cap)
        assert (np.linalg.norm(C2, axis=1) > 0.99).all()
        assert sorted(counts2.tolist()) == [50, 50]
    # cache=False (pure streaming, re-scan per pass) is bit-identical
    C3, counts3, mc3 = distributed_kmeans(ds, k=2, iters=4, seed=5,
                                          cache=False)
    assert np.array_equal(C3, C) and counts3.tolist() == counts.tolist()

    import pytest
    with pytest.raises(ValueError, match="k must be"):
        distributed_kmeans(ds, k=0, iters=1)
    with pytest.raises(ValueError, match="no finite vectors"):
        distributed_kmeans(
            rd.from_arrow(pa.table({"embedding": [[0.0] * 4, None]})),
            k=1, iters=1)


def test_distributed_pca_matches_numpy(ray_session):
    """One-pass moment partials + driver eigh == single-node numpy PCA
    on the gathered matrix; repartition-invariant; sign deterministic;
    null/NaN/inf rows excluded; projection stage round-trips."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.ann import distributed_pca, pca_project

    rng = np.random.default_rng(9)
    # anisotropic Gaussian: dominant axis along (1,1,0,0)/sqrt2
    base = rng.normal(0, 1, (3000, 4)) * np.array([5.0, 0.5, 0.2, 0.05])
    rot = np.array([[1, 1, 0, 0], [1, -1, 0, 0],
                    [0, 0, 1, 1], [0, 0, 1, -1]]) / np.sqrt(2)
    X = base @ rot.T + np.array([1.0, -2.0, 0.5, 0.0])
    rows = [list(r) for r in X] + [None, [float("nan")] * 4,
                                   [float("inf"), 0, 0, 0]]
    ds = rd.from_arrow(pa.table({"embedding": rows}))
    comps, ev, mean, n = distributed_pca(ds, n_components=2)
    assert n == 3000
    # reference: numpy PCA on the clean matrix
    Xc = X - X.mean(axis=0)
    w, v = np.linalg.eigh(Xc.T @ Xc / (len(X) - 1))
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    assert np.abs(ev - w[:2]).max() < 1e-8 * w[0]
    for i in range(2):
        assert abs(abs(comps[i] @ v[:, i]) - 1.0) < 1e-9
    assert np.abs(mean - X.mean(axis=0)).max() < 1e-9
    # dominant axis is the rotated first coordinate
    assert abs(abs(comps[0] @ rot[:, 0]) - 1.0) < 0.05
    # sign rule: largest-|coeff| entry positive
    assert comps[0][np.abs(comps[0]).argmax()] > 0
    # repartition invariance (partials merge to the same moments)
    comps2, ev2, mean2, n2 = distributed_pca(ds.repartition(7),
                                             n_components=2)
    assert np.abs(comps2 - comps).max() < 1e-9
    assert np.abs(ev2 - ev).max() < 1e-8 * max(ev[0], 1.0)

    # projection: k-dim list column, nulls for bad rows, values equal
    # the direct matmul. Consume as ARROW — Ray's to_pandas TensorArray
    # auto-cast dies on null-bearing list columns.
    proj = pa.concat_tables(
        pca_project(ds, comps, mean).select_columns(["pca"])
        .iter_batches(batch_format="pyarrow")).column("pca")
    proj = proj.combine_chunks()
    assert proj.null_count == 3            # null / NaN / inf rows
    valid = np.asarray(proj.is_valid())
    assert not valid[-3:].any()
    got = np.asarray(proj.drop_null().flatten()).reshape(-1, 2)
    want = (X - mean) @ comps.T
    assert np.abs(got - want).max() < 1e-9

    import pytest
    with pytest.raises(ValueError, match="empty corpus|>= 2"):
        distributed_pca(rd.from_arrow(
            pa.table({"embedding": [[1.0, 2.0]]})))
    # mixed-dim corpus across batches: LOUD error, never a silently
    # merged corrupt covariance (the dim-marker cell)
    d4 = rd.from_arrow(pa.table({"embedding": [[1.0] * 4] * 3}))
    d8 = rd.from_arrow(pa.table({"embedding": [[1.0] * 8] * 3}))
    with pytest.raises(ValueError, match="mixed embedding dim"):
        distributed_pca(d4.union(d8))


def test_mahalanobis_scores_match_numpy(ray_session):
    """Broadcast quadratic form == single-node numpy on the gathered
    matrix; null/NaN rows get null scores; a planted far-out point
    dominates the top-k; rank-deficient covariance stays finite via
    the ridge floor."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.ann import covariance, mahalanobis_scores

    rng = np.random.default_rng(17)
    X = rng.normal(0, 1, (500, 6))
    X[7] = 40.0                       # planted outlier
    rows = [list(r) for r in X] + [None, [float("nan")] * 6]
    ds = rd.from_arrow(pa.table({"embedding": rows}))
    cov, mean, n = covariance(ds)
    assert n == 500
    got = pa.concat_tables(
        mahalanobis_scores(ds, cov, mean).select_columns(["maha2"])
        .iter_batches(batch_format="pyarrow")).column("maha2")
    got = got.combine_chunks()
    assert got.null_count == 2 and len(got) == 502
    d = cov.shape[0]
    reg = cov + np.eye(d) * (1e-6 * np.trace(cov) / d)
    P = np.linalg.inv(reg)
    C = X - mean
    want = np.einsum("ij,jk,ik->i", C, P, C)
    vals = np.asarray(got.drop_null())
    assert np.abs(vals - want).max() < 1e-9 * max(want.max(), 1.0)
    assert int(np.argmax(vals)) == 7

    # rank-deficient: all mass on one axis — still finite everywhere
    Y = np.zeros((50, 4)); Y[:, 0] = rng.normal(0, 1, 50)
    dsy = rd.from_arrow(pa.table({"embedding": [list(r) for r in Y]}))
    cy, my, _ = covariance(dsy)
    sy = pa.concat_tables(
        mahalanobis_scores(dsy, cy, my).select_columns(["maha2"])
        .iter_batches(batch_format="pyarrow")).column("maha2")
    assert np.isfinite(np.asarray(sy.combine_chunks())).all()


def test_pca_topk_recall_on_lowrank_data(ray_session):
    """Compress-then-search: on planted rank-4 data the top-4 PCA
    projection preserves cosine geometry, so reduced-space exact top-k
    must recall (almost) everything full-dim top-k finds."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.ann import (brute_force_topk, distributed_pca,
                                    pca_project)

    rng = np.random.default_rng(41)
    n, dim, rank = 800, 32, 4
    B = rng.normal(0, 1, (rank, dim))
    X = rng.normal(0, 1, (n, rank)) @ B        # exactly rank-4
    t = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                  "embedding": pa.array([list(r) for r in X])})
    ds = rd.from_arrow(t)
    comps, ev, mean, _ = distributed_pca(ds, n_components=rank)
    # rank-4 data: components 5+ would carry ~zero variance
    assert ev[rank - 1] > 1e-6
    proj = pca_project(ds, comps, mean)
    Q = X[:3]
    qp = (Q - mean) @ comps.T
    full = brute_force_topk(ds, Q, query_ids=[0, 1, 2], k=10)
    red = brute_force_topk(proj, qp, query_ids=[0, 1, 2],
                           vec_col="pca", k=10)
    for qid in (0, 1, 2):
        a = set(full[full["query_id"] == qid]["vec_id"])
        b = set(red[red["query_id"] == qid]["vec_id"])
        # centering shifts cosine geometry slightly; the planted rank
        # keeps the overlap near-total
        assert len(a & b) >= 8, (qid, a, b)
