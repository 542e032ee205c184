"""Round-4 review pins for checks/text/ann: exact big-int uniqueness
with nulls, simhash memory shape (value-preserving rewrite), packing's
null-stable schema, and IvfIndex edge/settings behavior."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def test_duplicate_keys_bigint_with_nulls():
    """Snowflake-scale int64 keys sharing a partition with nulls must
    not be float-rounded into fabricated duplicates (the per-partition
    count now stays in Arrow)."""
    import ray.data as rd

    from jsonschema_ray.checks import duplicate_keys
    big = (1 << 62) + 10_000
    t = pa.table({"k": pa.array([big, big + 512, None, None, 7, 7],
                                type=pa.int64())})
    out = duplicate_keys(rd.from_arrow(t), "k").to_pandas()
    assert len(out) == 2  # the null group and key 7 — NOT the big keys
    assert set(out["k"].dropna().astype("int64")) == {7}
    assert sorted(out["dup_count"]) == [2, 2]
    # real big-int duplicates are still caught exactly
    t2 = pa.table({"k": pa.array([big, big, big + 512], type=pa.int64())})
    out2 = duplicate_keys(rd.from_arrow(t2), "k").to_pandas()
    assert out2["k"].astype("int64").tolist() == [big]


def test_simhash_values_preserved_and_bounded():
    """The reduceat rewrite must produce the exact signatures of the
    definition (per-bit ±1 token sums, sign vector), including empty
    docs, without the (n_tokens, 64) matrix."""
    from jsonschema_ray.sketches.hashing import hash64_array
    from jsonschema_ray.text.analysis import simhash64_batch
    texts = ["the quick brown fox", "", "jumps over the lazy dog",
             "the the the", None, "single"]
    got = simhash64_batch(pa.array(texts, type=pa.string()))
    # brute-force oracle
    for i, t in enumerate(texts):
        toks = t.split() if t else []
        if not toks:
            assert got[i] == 0
            continue
        th = hash64_array(pa.array(toks))
        acc = np.zeros(64, dtype=np.int64)
        for h in th:
            for k in range(64):
                acc[k] += 1 if (int(h) >> k) & 1 else -1
        val = np.uint64(0)
        for k in range(64):
            if acc[k] > 0:
                val |= np.uint64(1) << np.uint64(k)
        assert np.uint64(got[i]).item() == val.item(), i


def test_pack_sequences_null_tokens_schema_stable(ray_session):
    """A null token count keeps the output n_tokens column integral
    (nullable), not a data-dependent float64."""
    import ray.data as rd

    from jsonschema_ray.text import pack_sequences
    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "n_tokens": pa.array([100, None, 50], type=pa.int64())})
    out = pack_sequences(rd.from_arrow(t), window=120)
    df = out.to_pandas().sort_values("doc_id")
    assert pd.api.types.is_integer_dtype(df["n_tokens"].dtype), \
        df["n_tokens"].dtype
    assert df["n_tokens"].isna().tolist() == [False, True, False]


def test_ivf_index_empty_queries_and_meta(tmp_path):
    """Empty query sets return the typed empty frame; the index records
    its columns in _META.json and load() honors them over caller
    defaults."""
    import ray.data as rd

    from jsonschema_ray.ann import IvfIndex
    rng = np.random.default_rng(3)
    V = rng.standard_normal((60, 8)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "my_id": pa.array(np.arange(60, dtype=np.int64)),
        "my_vec": pa.array(list(V))}))
    d = str(tmp_path / "ivf")
    idx = IvfIndex.build(ds, d, vec_col="my_vec", id_col="my_id",
                         ncells=4, train_sample=60)
    out = idx.topk([], k=5)
    assert len(out) == 0
    assert out["rank"].dtype == np.int64
    # load with WRONG caller defaults: the recorded columns win
    idx2 = IvfIndex.load(d)
    assert idx2.vec_col == "my_vec" and idx2.id_col == "my_id"
    r = idx2.topk(V[:2], query_ids=[0, 1], k=3, nprobe=4)
    assert len(r) == 6
    assert r[r["query_id"] == 0].iloc[0]["my_id"] == 0
