"""Round-4 hardening pins for the incremental near-dup family:
degrade-above-cap (distributed join fallback == driver gather),
single-execution index writers with _META-last commit semantics,
cross-id-column index threading, and the vectorized duplicate-id
estimator at scale."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs(ids, texts):
    return pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})


BASE = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest tonight under a silver moon")


def _corpus(n, seed=3):
    rng = np.random.default_rng(seed)
    words = BASE.split()
    out = []
    for i in range(n):
        if i % 3 == 0:
            out.append(BASE + f" variant {i % 7}")
        else:
            out.append(" ".join(rng.choice(words, size=25)) + f" tail{i}")
    return out


def test_incremental_minhash_degrades_above_cap(ray_session, tmp_path):
    """gather_cap=0 must give the SAME pairs via the distributed
    two-hash-join fallback — degrade, never die (VERDICT r3 item 1)."""
    import ray.data as rd

    from jsonschema_ray.dedup import (incremental_minhash_neardup,
                                      write_minhash_signatures)
    seen = _docs([f"s{i}" for i in range(30)], _corpus(30, seed=1))
    new = _docs([f"n{i}" for i in range(12)], _corpus(12, seed=1))
    sig_dir = str(tmp_path / "sigs")
    write_minhash_signatures(rd.from_arrow(seen), sig_dir)
    kw = dict(threshold=0.5, num_partitions=4)
    base = incremental_minhash_neardup(rd.from_arrow(new), sig_dir, **kw)
    assert len(base) > 0  # the pin is meaningful only with real matches
    forced = incremental_minhash_neardup(rd.from_arrow(new), sig_dir,
                                         gather_cap=0, **kw)
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), forced.reset_index(drop=True))
    # empty result through the fallback keeps the schema
    far = _docs(["x0"], ["zzz completely unrelated words qqq www"])
    out = incremental_minhash_neardup(rd.from_arrow(far), sig_dir,
                                      gather_cap=0, threshold=0.9)
    assert list(out.columns) == ["new_id", "seen_id", "est_jaccard"]
    assert len(out) == 0


def test_incremental_embedding_degrades_above_cap(ray_session, tmp_path):
    import ray.data as rd

    from jsonschema_ray.dedup import (incremental_embedding_neardup,
                                      write_embedding_index)
    rng = np.random.default_rng(7)
    dim = 16
    seen_v = rng.standard_normal((50, dim)).astype(np.float32)
    seen = pa.table({"vec_id": pa.array([f"s{i}" for i in range(50)]),
                     "embedding": pa.array(list(seen_v))})
    idx_dir = str(tmp_path / "embidx")
    write_embedding_index(rd.from_arrow(seen), idx_dir)
    new_v = np.stack([seen_v[i] + rng.standard_normal(dim)
                      .astype(np.float32) * 0.01 for i in range(10)])
    new = pa.table({"vec_id": pa.array([f"n{i}" for i in range(10)]),
                    "embedding": pa.array(list(new_v))})
    kw = dict(threshold=0.98, num_partitions=4)
    base = incremental_embedding_neardup(rd.from_arrow(new), idx_dir,
                                         **kw)
    assert len(base) >= 10
    forced = incremental_embedding_neardup(rd.from_arrow(new), idx_dir,
                                           gather_cap=0, **kw)
    pd.testing.assert_frame_equal(
        base.reset_index(drop=True), forced.reset_index(drop=True))


def test_minhash_writer_executes_corpus_pass_once(ray_session, tmp_path):
    """write_parquet is the ONLY execution of the signature pass
    (VERDICT r3 item 2): a counting input stage sees each row once."""
    import ray.data as rd

    from jsonschema_ray.dedup import write_minhash_signatures
    marker = str(tmp_path / "rows_seen")

    def counting(b: pa.Table) -> pa.Table:
        with open(marker, "a") as f:
            f.write(f"{b.num_rows}\n")
        return b

    src = rd.from_arrow(_docs([f"d{i}" for i in range(40)],
                              _corpus(40))) \
        .map_batches(counting, batch_format="pyarrow")
    sig_dir = str(tmp_path / "sigs")
    write_minhash_signatures(src, sig_dir)
    seen_rows = sum(int(x) for x in open(marker).read().split())
    assert seen_rows == 40  # exactly one corpus execution
    assert os.path.exists(os.path.join(sig_dir, "_META.json"))
    assert not os.path.exists(os.path.join(sig_dir, "_STAGING"))
    import json
    meta = json.load(open(os.path.join(sig_dir, "_META.json")))
    assert meta["rows"] == 40


def test_embedding_writer_executes_corpus_pass_once(ray_session,
                                                    tmp_path):
    import ray.data as rd

    from jsonschema_ray.dedup import write_embedding_index
    marker = str(tmp_path / "rows_seen")

    def counting(b: pa.Table) -> pa.Table:
        with open(marker, "a") as f:
            f.write(f"{b.num_rows}\n")
        return b

    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((25, 8)).astype(np.float32)
    src = rd.from_arrow(pa.table({
        "vec_id": pa.array([f"v{i}" for i in range(25)]),
        "embedding": pa.array(list(vecs))})) \
        .map_batches(counting, batch_format="pyarrow")
    idx_dir = str(tmp_path / "idx")
    write_embedding_index(src, idx_dir)
    seen_rows = sum(int(x) for x in open(marker).read().split())
    assert seen_rows == 25
    import json
    meta = json.load(open(os.path.join(idx_dir, "_META.json")))
    assert meta["rows"] == 25 and meta["dim"] == 8


def test_torn_index_fails_loudly(ray_session, tmp_path):
    """A crash between write_parquet and _META.json leaves a _STAGING
    dir: queries refuse it (no silent missed duplicates, ADVICE r3)
    and a re-write replaces it."""
    import ray.data as rd

    from jsonschema_ray.dedup import (incremental_minhash_neardup,
                                      write_minhash_signatures)
    sig_dir = str(tmp_path / "sigs")
    write_minhash_signatures(
        rd.from_arrow(_docs(["s0"], [BASE])), sig_dir)
    # simulate the torn state: _META.json missing, parquet present
    os.remove(os.path.join(sig_dir, "_META.json"))
    open(os.path.join(sig_dir, "_STAGING"), "w").close()
    new = rd.from_arrow(_docs(["n0"], [BASE]))
    with pytest.raises(FileNotFoundError):
        incremental_minhash_neardup(new, sig_dir)
    # the torn dir is recognised as an index remnant and replaced
    write_minhash_signatures(
        rd.from_arrow(_docs(["s0"], [BASE])), sig_dir)
    out = incremental_minhash_neardup(new, sig_dir, threshold=0.9)
    assert out.values.tolist() == [["n0", "s0", 1.0]]
    # deleted parquet files under a rows>0 _META also fail loudly
    import glob
    for f in glob.glob(os.path.join(sig_dir, "*.parquet")):
        os.remove(f)
    with pytest.raises(FileNotFoundError, match="torn or tampered"):
        incremental_minhash_neardup(new, sig_dir)


def test_index_id_column_threads_through(ray_session, tmp_path):
    """An index written under a DIFFERENT id column is queried with the
    caller's shard column name — the recorded id_col names the stored
    rows everywhere (ADVICE r3 low, minhash gather path)."""
    import ray.data as rd

    from jsonschema_ray.dedup import (incremental_embedding_neardup,
                                      incremental_minhash_neardup,
                                      write_embedding_index,
                                      write_minhash_signatures)
    seen = pa.table({"corpus_id": pa.array(["s0"]),
                     "text": pa.array([BASE])})
    sig_dir = str(tmp_path / "sigs")
    write_minhash_signatures(rd.from_arrow(seen), sig_dir,
                             id_col="corpus_id")
    new = rd.from_arrow(_docs(["n0"], [BASE]))
    out = incremental_minhash_neardup(new, sig_dir, threshold=0.9)
    assert out.values.tolist() == [["n0", "s0", 1.0]]
    # and through the distributed fallback
    out2 = incremental_minhash_neardup(new, sig_dir, threshold=0.9,
                                       gather_cap=0)
    assert out2.values.tolist() == [["n0", "s0", 1.0]]
    # embedding counterpart
    rng = np.random.default_rng(4)
    v = rng.standard_normal((3, 8)).astype(np.float32)
    eseen = pa.table({"corpus_id": pa.array(["e0", "e1", "e2"]),
                      "embedding": pa.array(list(v))})
    idx_dir = str(tmp_path / "idx")
    write_embedding_index(rd.from_arrow(eseen), idx_dir,
                          id_col="corpus_id")
    enew = rd.from_arrow(pa.table({"vec_id": pa.array(["n0"]),
                                   "embedding": pa.array([v[1]])}))
    out3 = incremental_embedding_neardup(enew, idx_dir, threshold=0.99)
    assert set(zip(out3["new_id"], out3["seen_id"])) == {("n0", "e1")}
    out4 = incremental_embedding_neardup(enew, idx_dir, threshold=0.99,
                                         gather_cap=0)
    assert set(zip(out4["new_id"], out4["seen_id"])) == {("n0", "e1")}


def test_duplicate_id_estimator_vectorized(ray_session, tmp_path):
    """Heavy id duplication (the old triple-Python-loop fallback) now
    runs through the same vectorized expansion — identical matches, and
    thousands of pairs complete quickly (VERDICT r3 item 5)."""
    import time

    import ray.data as rd

    from jsonschema_ray.dedup import (incremental_minhash_neardup,
                                      write_minhash_signatures)
    # 60 seen docs under only 6 distinct ids; 40 new docs under 4 ids —
    # every candidate pair expands to many row combinations
    seen_ids = [f"s{i % 6}" for i in range(60)]
    seen_texts = [BASE + f" v{i % 5}" for i in range(60)]
    new_ids = [f"n{i % 4}" for i in range(40)]
    new_texts = [BASE + f" v{i % 5}" for i in range(40)]
    sig_dir = str(tmp_path / "sigs")
    write_minhash_signatures(
        rd.from_arrow(_docs(seen_ids, seen_texts)), sig_dir)
    t0 = time.perf_counter()
    out = incremental_minhash_neardup(
        rd.from_arrow(_docs(new_ids, new_texts)), sig_dir,
        threshold=0.8)
    dt = time.perf_counter() - t0
    # all 4 new ids match all 6 seen ids (same base text)
    assert len(out) == 24
    assert dt < 30  # vectorized: the old loop was per-combination
    # exact duplicates estimate at 1.0
    assert (out["est_jaccard"] >= 0.8).all()
