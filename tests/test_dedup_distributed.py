"""Forced-distributed-path equivalence for the dedup family (VERDICT-r2
items 1-4): every cap-gated driver shortcut must produce IDENTICAL
results when its cap is forced to 0 and the distributed path runs
instead — pairs dedup, candidate-key broadcast, sig/vec attach, and the
phash key translation all have join fallbacks that degrade, never die."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs_table():
    rng = np.random.default_rng(3)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel"]
    base = [" ".join(rng.choice(words, 30)) for _ in range(40)]
    texts, ids = [], []
    for i, t in enumerate(base):
        texts.append(t)
        ids.append(2 * i)
        if i % 3 == 0:
            w = t.split()
            w[5] = "zulu"
            texts.append(" ".join(w))
            ids.append(2 * i + 1)
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": texts})


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("kw", [
    dict(driver_pairs_cap=0),
    dict(driver_pairs_cap=0, broadcast_sig_cap=0),
    dict(driver_pairs_cap=0, broadcast_sig_cap=0, broadcast_key_cap=0),
])
def test_minhash_forced_distributed_matches(ray_session, kw):
    import ray.data as rd

    from jsonschema_ray.dedup import minhash_near_duplicates
    ds = rd.from_arrow(_docs_table())
    ref = _sorted(minhash_near_duplicates(ds, threshold=0.6).to_pandas())
    assert len(ref) > 0
    out = _sorted(minhash_near_duplicates(ds, threshold=0.6,
                                          **kw).to_pandas())
    pd.testing.assert_frame_equal(ref, out, check_dtype=False)


def test_verified_forced_distributed_matches(ray_session):
    import ray.data as rd

    from jsonschema_ray.dedup import verified_near_duplicates
    ds = rd.from_arrow(_docs_table())
    ref = _sorted(verified_near_duplicates(ds, threshold=0.6))
    assert len(ref) > 0
    out = _sorted(verified_near_duplicates(
        ds, threshold=0.6, driver_pairs_cap=0, broadcast_key_cap=0,
        broadcast_text_cap=0))
    pd.testing.assert_frame_equal(ref, out, check_dtype=False)


@pytest.mark.parametrize("kw", [
    dict(driver_pairs_cap=0),
    dict(driver_pairs_cap=0, broadcast_vec_cap=0),
    dict(driver_pairs_cap=0, broadcast_vec_cap=0, broadcast_key_cap=0),
])
def test_embedding_forced_distributed_matches(ray_session, kw):
    import ray.data as rd

    from jsonschema_ray.dedup import embedding_near_duplicates
    rng = np.random.default_rng(5)
    n, dim = 400, 32
    V = rng.standard_normal((n, dim)).astype(np.float32)
    for i in range(8):
        V[i + 200] = V[i] + rng.standard_normal(dim).astype(np.float32) * .01
    t = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                  "embedding": pa.array(list(V))})
    ds = rd.from_arrow(t)
    ref = _sorted(embedding_near_duplicates(ds,
                                            threshold=0.98).to_pandas())
    assert len(ref) >= 8
    out = _sorted(embedding_near_duplicates(ds, threshold=0.98,
                                            **kw).to_pandas())
    pd.testing.assert_frame_equal(ref, out, check_dtype=False)


def test_embedding_string_ids(ray_session):
    import ray.data as rd

    from jsonschema_ray.dedup import embedding_near_duplicates
    rng = np.random.default_rng(5)
    n, dim = 300, 16
    V = rng.standard_normal((n, dim)).astype(np.float32)
    for i in range(6):
        V[i + 150] = V[i] + rng.standard_normal(dim).astype(np.float32) * .01
    ids = [f"v{i:04d}" for i in range(n)]
    t = pa.table({"vec_id": pa.array(ids), "embedding": pa.array(list(V))})
    pairs = embedding_near_duplicates(rd.from_arrow(t),
                                      threshold=0.98).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert {(f"v{i:04d}", f"v{i + 150:04d}") for i in range(6)} <= found


def test_exact_dedup_join_fallback_matches(ray_session):
    import ray.data as rd

    from jsonschema_ray.dedup import exact_dedup
    texts = [f"doc {i % 30}" for i in range(100)]
    t = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64)),
                  "text": texts,
                  "extra": pa.array(np.arange(100.0))})
    ref = _sorted(exact_dedup(rd.from_arrow(t)).to_pandas())
    assert sorted(ref["doc_id"]) == sorted(range(30))
    out = _sorted(exact_dedup(rd.from_arrow(t),
                              broadcast_ids_cap=0).to_pandas())
    pd.testing.assert_frame_equal(ref, out, check_dtype=False)


def test_phash_translate_join_fallback_matches(ray_session, monkeypatch):
    import ray.data as rd

    import jsonschema_ray.checks.neardup as nd
    from jsonschema_ray.checks import phash_near_duplicates
    rng = np.random.default_rng(7)
    n = 600
    h = rng.integers(0, 1 << 63, n, dtype=np.int64)
    for i in range(12):
        h[i + 300] = h[i] ^ (1 << int(rng.integers(0, 64))) \
            ^ (1 << int(rng.integers(0, 64)))
    t = pa.table({"image_id": pa.array([f"img{i:04d}" for i in range(n)]),
                  "phash": pa.array(h)})
    ds = rd.from_arrow(t)
    ref = _sorted(phash_near_duplicates(ds, max_distance=4).to_pandas())
    assert len(ref) >= 12
    orig = nd._translate_pair_keys
    monkeypatch.setattr(
        nd, "_translate_pair_keys",
        lambda ds, pairs, id_col: orig(ds, pairs, id_col,
                                       broadcast_cap=0, driver_pairs_cap=0))
    out = _sorted(phash_near_duplicates(ds, max_distance=4).to_pandas())
    pd.testing.assert_frame_equal(ref, out, check_dtype=False)


def test_seeded_string_hashes_independent():
    from jsonschema_ray.sketches.hashing import hash64_array
    a = pa.array([f"s{i}" for i in range(64)])
    h0 = hash64_array(a, 0)
    h1 = hash64_array(a, 0x5851F42D4C957F2D)
    # independence proxy: h1 is NOT a pointwise function of h0's low bits
    # (the old bug made h1 = f(h0) exactly); determinism across calls
    assert not np.array_equal(h0, h1)
    assert np.array_equal(h1, hash64_array(a, 0x5851F42D4C957F2D))
    # distinct seeds give distinct functions
    h2 = hash64_array(a, 12345)
    assert not np.array_equal(h1, h2)


# ---------------------------------------------------------------------------
# connected components (round-3 clustering operator)


def _cc_sorted(ds):
    return ds.to_pandas().sort_values("node").reset_index(drop=True)


def test_components_driver_matches_union_find(ray_session):
    import ray.data

    from jsonschema_ray.dedup import (connected_components,
                                      union_find_components)
    rng = np.random.default_rng(7)
    src = rng.integers(0, 500, 300)
    dst = rng.integers(0, 500, 300)
    edges = ray.data.from_arrow(pa.table(
        {"id_a": pa.array(src, type=pa.int64()),
         "id_b": pa.array(dst, type=pa.int64())}))
    nodes, comp = union_find_components(src, dst)
    got = _cc_sorted(connected_components(edges))
    assert (got["node"].to_numpy() == nodes).all()
    assert (got["component"].to_numpy() == comp).all()


def test_components_distributed_matches_driver(ray_session):
    import ray.data

    from jsonschema_ray.dedup import connected_components
    rng = np.random.default_rng(11)
    src = rng.integers(0, 200, 150)
    dst = rng.integers(0, 200, 150)
    edges = ray.data.from_arrow(pa.table(
        {"id_a": pa.array(src, type=pa.int64()),
         "id_b": pa.array(dst, type=pa.int64())}))
    a = _cc_sorted(connected_components(edges))
    b = _cc_sorted(connected_components(edges, driver_cap=0))
    pd.testing.assert_frame_equal(a, b)


def test_components_chain_and_selfloop(ray_session):
    """A long chain exercises multi-round label propagation; self-loops
    and duplicate edges must be harmless."""
    import ray.data

    from jsonschema_ray.dedup import connected_components
    # chain 10-11-...-25, one self loop, an isolated pair, dup edges
    src = list(range(10, 25)) + [40, 50, 50]
    dst = list(range(11, 26)) + [40, 51, 51]
    edges = ray.data.from_arrow(pa.table(
        {"id_a": pa.array(src, type=pa.int64()),
         "id_b": pa.array(dst, type=pa.int64())}))
    got = _cc_sorted(connected_components(edges, driver_cap=0))
    comp = dict(zip(got["node"], got["component"]))
    assert all(comp[n] == 10 for n in range(10, 26))
    assert comp[40] == 40 and comp[50] == 50 and comp[51] == 50


def test_components_path_graph_log_rounds(ray_session):
    """A 10k-node path graph (the adversarial chain shape) must converge
    through the distributed plan: pointer doubling makes rounds ~log2(n)
    instead of n (round-4 star-contraction fix; the old propagation-only
    loop RAISED after max_rounds=64 here)."""
    import ray.data

    from jsonschema_ray.dedup import connected_components
    n = 10_000
    src = np.arange(0, n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    edges = ray.data.from_arrow(pa.table(
        {"id_a": pa.array(src), "id_b": pa.array(dst)}))
    got = _cc_sorted(connected_components(edges, driver_cap=0,
                                          max_rounds=24))
    assert len(got) == n
    assert (got["component"].to_numpy() == 0).all()


def test_components_string_ids_driver_path(ray_session):
    import ray.data

    from jsonschema_ray.dedup import connected_components
    edges = ray.data.from_arrow(pa.table(
        {"id_a": pa.array(["b", "c", "x"]),
         "id_b": pa.array(["a", "b", "y"])}))
    got = _cc_sorted(connected_components(edges))
    comp = dict(zip(got["node"], got["component"]))
    assert comp == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_kgram_hashes_are_codepoint_based():
    """Gram boundaries must follow CODE POINTS (SQL substr semantics),
    not utf-8 bytes; ASCII hash values stay identical to the byte form."""
    from jsonschema_ray.dedup.minhash import jaccard_shingles, \
        kgram_hashes_flat
    # 'für die' : 7 code points → 3 distinct 5-grams; byte-grams would
    # have seen 8 bytes → 4 grams and different windows
    flat, bounds = kgram_hashes_flat(["für die"], 5)
    assert bounds[1] - bounds[0] == 3
    # identical non-ASCII texts → jaccard 1; shifted by one → < 1
    assert jaccard_shingles("héllo wörld", "héllo wörld", 5) == 1.0
    assert jaccard_shingles("héllo wörld", "xhéllo wörld", 5) < 1.0
    # ASCII: short doc contributes the whole text as one gram
    flat2, b2 = kgram_hashes_flat(["abc"], 5)
    assert b2[1] - b2[0] == 1


def test_exact_ks_null_values_excluded(ray_session):
    """Null sample values are dropped on the Ray side exactly as the
    oracle's IS NOT NULL guard drops them."""
    import math

    import pyarrow as pa
    import ray.data

    from jsonschema_ray.checks import exact_ks
    ds = ray.data.from_arrow(pa.table({
        "value": pa.array([1.0, 2.0, None, 3.0, None, 2.0]),
        "grp": pa.array([0, 0, 0, 1, 1, 1], type=pa.int8())}))
    ks, n_a, n_b = exact_ks(
        ds, "value", lambda t: t["grp"].to_numpy(zero_copy_only=False))
    assert (n_a, n_b) == (2, 2)
    assert not math.isnan(ks)


def test_incremental_minhash_neardup(ray_session, tmp_path):
    import ray.data as rd

    from jsonschema_ray.dedup import (incremental_minhash_neardup,
                                      write_minhash_signatures)
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    seen_texts = [base, base.replace("green", "blue"),
                  "completely different document about databases and "
                  "distributed systems running at large scale"]
    seen = pa.table({"doc_id": ["s0", "s1", "s2"], "text": seen_texts})
    sig_dir = str(tmp_path / "sigs")
    write_minhash_signatures(rd.from_arrow(seen), sig_dir)

    new = pa.table({
        "doc_id": ["n0", "n1"],
        "text": [base + "!",                       # near-dup of s0/s1
                 "an entirely unrelated poem about the sea and the sky "
                 "written in a very different style with other words"]})
    out = incremental_minhash_neardup(rd.from_arrow(new), sig_dir,
                                      threshold=0.5)
    got = set(zip(out["new_id"], out["seen_id"]))
    assert ("n0", "s0") in got
    assert all(n != "n1" for n, _ in got)          # unrelated doc clean
    assert (out["est_jaccard"] >= 0.5).all()


def test_incremental_minhash_edge_cases(ray_session, tmp_path):
    import ray.data as rd

    from jsonschema_ray.dedup import (incremental_minhash_neardup,
                                      write_minhash_signatures)
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep green forest tonight")
    seen = pa.table({"doc_id": ["s0"], "text": [base]})
    sig_dir = str(tmp_path / "sigs")
    write_minhash_signatures(rd.from_arrow(seen), sig_dir, num_hashes=64)
    # settings mismatch is impossible: the query reads them from _META
    new = pa.table({"doc_id": ["n0"], "text": [base]})
    out = incremental_minhash_neardup(rd.from_arrow(new), sig_dir,
                                      threshold=0.9)
    assert out.values.tolist() == [["n0", "s0", 1.0]]
    # empty result keeps its schema
    far = pa.table({"doc_id": ["nX"], "text": ["zzz completely other"]})
    out2 = incremental_minhash_neardup(rd.from_arrow(far), sig_dir,
                                       threshold=0.9)
    assert list(out2.columns) == ["new_id", "seen_id", "est_jaccard"]
    assert len(out2) == 0
    # duplicate new ids: the true duplicate behind a same-id decoy is found
    dup = pa.table({"doc_id": ["n1", "n1"],
                    "text": ["an unrelated decoy text entirely", base]})
    out3 = incremental_minhash_neardup(rd.from_arrow(dup), sig_dir,
                                       threshold=0.9)
    assert ("n1", "s0") in set(zip(out3["new_id"], out3["seen_id"]))
    # rewriting the index replaces, never appends
    write_minhash_signatures(rd.from_arrow(seen), sig_dir, num_hashes=64)
    import glob
    import pyarrow.parquet as pq
    n_rows = sum(pq.read_metadata(f).num_rows
                 for f in glob.glob(sig_dir + "/*.parquet"))
    assert n_rows == 1
    # a non-index dir is refused
    other = tmp_path / "data"
    other.mkdir()
    (other / "x.txt").write_text("keep me")
    with pytest.raises(ValueError, match="refusing"):
        write_minhash_signatures(rd.from_arrow(seen), str(other))
    # empty index: typed empty result, no crash
    empty_dir = str(tmp_path / "emptysigs")
    write_minhash_signatures(
        rd.from_arrow(pa.table({"doc_id": pa.array([], type=pa.string()),
                                "text": pa.array([], type=pa.string())})),
        empty_dir)
    out4 = incremental_minhash_neardup(rd.from_arrow(new), empty_dir)
    assert len(out4) == 0 and list(out4.columns) == \
        ["new_id", "seen_id", "est_jaccard"]


def test_incremental_embedding_neardup(ray_session, tmp_path):
    import ray.data as rd

    from jsonschema_ray.dedup import (incremental_embedding_neardup,
                                      write_embedding_index)
    rng = np.random.default_rng(5)
    dim = 24
    seen_v = rng.standard_normal((40, dim)).astype(np.float32)
    seen = pa.table({"vec_id": pa.array([f"s{i}" for i in range(40)]),
                     "embedding": pa.array(list(seen_v))})
    idx_dir = str(tmp_path / "embidx")
    write_embedding_index(rd.from_arrow(seen), idx_dir)

    new_v = np.stack([
        seen_v[3] + rng.standard_normal(dim).astype(np.float32) * 0.01,
        rng.standard_normal(dim).astype(np.float32)])
    new = pa.table({"vec_id": pa.array(["n0", "n1"]),
                    "embedding": pa.array(list(new_v))})
    out = incremental_embedding_neardup(rd.from_arrow(new), idx_dir,
                                        threshold=0.98)
    got = set(zip(out["new_id"], out["seen_id"]))
    assert ("n0", "s3") in got
    assert all(n != "n1" for n, _ in got)
    # empty result keeps the schema
    far = pa.table({"vec_id": pa.array(["nX"]),
                    "embedding": pa.array(
                        [rng.standard_normal(dim).astype(np.float32)])})
    out2 = incremental_embedding_neardup(rd.from_arrow(far), idx_dir,
                                         threshold=0.999)
    assert list(out2.columns) == ["new_id", "seen_id", "cosine"]
    # dim mismatch is refused loudly
    bad = pa.table({"vec_id": pa.array(["b0"]),
                    "embedding": pa.array(
                        [rng.standard_normal(8).astype(np.float32)])})
    with pytest.raises(Exception):
        incremental_embedding_neardup(rd.from_arrow(bad), idx_dir)
    # rewrite replaces; non-index dir refused
    write_embedding_index(rd.from_arrow(seen), idx_dir)
    other = tmp_path / "keep"
    other.mkdir()
    (other / "f.txt").write_text("x")
    with pytest.raises(ValueError, match="refusing"):
        write_embedding_index(rd.from_arrow(seen), str(other))


def test_write_sharded_deterministic_and_committed(ray_session, tmp_path):
    """Key-sharded export: shard assignment is a pure function of the
    key (stable across repartitioning), the manifest is the LAST write
    inside a STAGED build that swaps in only when complete (a doomed
    run never destroys the committed export), the read is
    schema-preserving (no hive-inferred string 'shard' column), empty
    in-range shards read as typed zero rows, and foreign dirs are
    refused."""
    import os
    import shutil

    import pytest
    import ray.data as rd

    from jsonschema_ray.sources.tables import read_sharded, write_sharded

    base = str(tmp_path / "export")
    t = pa.table({"doc_id": pa.array(list(range(500)) + [None],
                                     type=pa.int64()),
                  "text": [f"d{i}" for i in range(501)]})
    m = write_sharded(rd.from_arrow(t), base, "doc_id", num_shards=8)
    assert m["rows"] == 501
    m2 = write_sharded(rd.from_arrow(t).repartition(7), base, "doc_id",
                       num_shards=8)
    assert m2["shard_rows"] == m["shard_rows"]

    # schema-preserving round trip: original columns only, and the
    # read-back re-exports cleanly (no duplicate 'shard' crash)
    full = read_sharded(base)
    assert sorted(full.schema().names) == ["doc_id", "text"]
    df = full.to_pandas()
    assert len(df) == 501
    m3 = write_sharded(read_sharded(base), str(tmp_path / "re"),
                       "doc_id", num_shards=8)
    assert m3["shard_rows"] == m["shard_rows"]

    # per-shard read returns exactly the manifest count, same ids every
    # run (purity); an in-range EMPTY shard reads as typed zero rows
    s0 = sorted(int(k) for k in m["shard_rows"])[0]
    p1 = sorted(read_sharded(base, shards=[s0]).to_pandas()
                .doc_id.dropna().tolist())
    write_sharded(rd.from_arrow(t), base, "doc_id", num_shards=8)
    p2 = sorted(read_sharded(base, shards=[s0]).to_pandas()
                .doc_id.dropna().tolist())
    assert p1 == p2 and len(p1) > 0
    few = write_sharded(rd.from_arrow(t.slice(0, 1)),
                        str(tmp_path / "few"), "doc_id", num_shards=64)
    empty_ids = [s for s in range(64)
                 if str(s) not in few["shard_rows"]][:2]
    got = read_sharded(str(tmp_path / "few"), shards=empty_ids)
    assert got.count() == 0
    assert sorted(got.schema().names) == ["doc_id", "text"]
    with pytest.raises(ValueError, match="out of range"):
        read_sharded(base, shards=[99])

    # doomed writes never touch the committed export: typo'd key
    # column refused up front; reserved 'shard' input refused
    with pytest.raises(ValueError, match="key column"):
        write_sharded(rd.from_arrow(t), base, "doc_idd", num_shards=8)
    with pytest.raises(ValueError, match="reserved"):
        write_sharded(rd.from_arrow(t.append_column(
            "shard", pa.array([0] * 501, type=pa.int64()))),
            base, "doc_id", num_shards=8)
    assert read_sharded(base).count() == 501   # export intact

    # torn/foreign dirs: no manifest → reader AND writer refuse
    shutil.move(os.path.join(base, "_MANIFEST.json"),
                str(tmp_path / "m.json"))
    with pytest.raises(FileNotFoundError, match="_MANIFEST"):
        read_sharded(base)
    with pytest.raises(ValueError, match="refusing to overwrite"):
        write_sharded(rd.from_arrow(t), base, "doc_id", num_shards=8)

    with pytest.raises(ValueError, match="num_shards"):
        write_sharded(rd.from_arrow(t), str(tmp_path / "x"), "doc_id",
                      num_shards=0)
