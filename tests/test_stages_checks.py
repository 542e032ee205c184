"""Ray Data stages + table-level checks over real Datasets (session-scoped
Ray fixture) and the driver testdata."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def ray_mod():
    import ray
    return ray


def test_validator_stage_pipeline(ray_mod, sf_smoke):
    import ray.data as rd
    from jsonschema_ray.stages import validate_dataset, annotate_dataset
    ds = rd.read_parquet(f"{sf_smoke}/lineitem.parquet",
                         columns=["l_orderkey", "l_linenumber", "l_quantity",
                                  "l_returnflag"])
    rs = {"required": ["l_orderkey"],
          "properties": {"l_quantity": {"maximum": 30},
                         "l_returnflag": {"enum": ["A", "N"]}}}
    viol = validate_dataset(ds, rs, key_columns=["l_orderkey",
                                                 "l_linenumber"])
    out = viol.to_pandas()
    # oracle: rows with quantity>30 plus rows with returnflag R
    import duckdb
    exp_qty, exp_flag = duckdb.sql(
        f"""SELECT sum(CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END),
                   sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
            FROM read_parquet('{sf_smoke}/lineitem.parquet')""").fetchone()
    got = out.groupby("keyword").size()
    assert got.get("maximum", 0) == exp_qty
    assert got.get("enum", 0) == exp_flag
    ann = annotate_dataset(ds, rs).to_pandas()
    assert (~ann["_valid"]).sum() <= exp_qty + exp_flag
    assert len(ann) == len(ds.take_all())


def test_column_stats(ray_mod, sf_smoke):
    import duckdb
    import ray.data as rd
    from jsonschema_ray.stages import column_stats
    ds = rd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    stats = column_stats(ds, columns=["l_quantity", "l_extendedprice",
                                      "l_returnflag"]).to_pandas()
    stats = stats.set_index("column")
    exp = duckdb.sql(
        f"""SELECT count(*), min(l_quantity), max(l_quantity),
                   count(DISTINCT l_quantity),
                   min(l_returnflag), max(l_returnflag),
                   median(l_extendedprice)
            FROM read_parquet('{sf_smoke}/lineitem.parquet')""").fetchone()
    n, qmin, qmax, qndv, fmin, fmax, emed = exp
    assert stats.loc["l_quantity", "count"] == n
    assert stats.loc["l_quantity", "min_num"] == qmin
    assert stats.loc["l_quantity", "max_num"] == qmax
    assert abs(stats.loc["l_quantity", "ndv_approx"] - qndv) / qndv < 0.05
    assert stats.loc["l_returnflag", "min_str"] == fmin
    assert stats.loc["l_returnflag", "max_str"] == fmax
    assert abs(stats.loc["l_extendedprice", "p50"] - emed) / emed < 0.05
    assert stats.loc["l_quantity", "null_count"] == 0


def test_duplicate_keys(ray_mod, sf_smoke):
    import duckdb
    import ray.data as rd
    from jsonschema_ray.checks import duplicate_keys, unique_violations
    ds = rd.read_parquet(f"{sf_smoke}/lineitem.parquet")
    dups = duplicate_keys(ds, "l_orderkey").to_pandas()
    exp = duckdb.sql(
        f"""SELECT l_orderkey, count(*) c
            FROM read_parquet('{sf_smoke}/lineitem.parquet')
            GROUP BY 1 HAVING c > 1 ORDER BY 1""").df()
    got = dups.sort_values("l_orderkey").reset_index(drop=True)
    assert len(got) == len(exp)
    assert (got["l_orderkey"].to_numpy() == exp["l_orderkey"].to_numpy()).all()
    assert (got["dup_count"].to_numpy() == exp["c"].to_numpy()).all()
    v = unique_violations(ds, "l_orderkey").to_pandas()
    assert len(v) == len(exp)
    assert set(v["keyword"]) == {"x-unique"}


def test_referential(ray_mod):
    import ray.data as rd
    from jsonschema_ray.checks import (broadcast_semi_join,
                                       referential_violations)
    facts = rd.from_arrow(pa.table({
        "k": ["a", "b", "c", "zz", None], "v": [1, 2, 3, 4, 5]}))
    ref = pa.array(["a", "b", "c", "d"])
    orphans = broadcast_semi_join(facts, "k", ref, anti=True).to_pandas()
    assert orphans["k"].tolist() == ["zz"]
    kept = broadcast_semi_join(facts, "k", ref).to_pandas()
    assert sorted(kept["k"]) == ["a", "b", "c"]
    viols = referential_violations(facts, "k", ref).to_pandas()
    assert viols["offending_value"].tolist() == ["zz"]
    assert viols["keyword"].tolist() == ["x-referential"]


def test_phash_near_duplicates(ray_mod):
    import ray.data as rd
    from jsonschema_ray.checks import phash_near_duplicates
    from jsonschema_ray.checks.neardup import hamming64
    rng = np.random.default_rng(3)
    n = 2000
    base = rng.integers(0, 2**63, n, dtype=np.int64)
    ids = [f"img-{i:05d}" for i in range(n)]
    # inject near-dup pairs: flip ≤3 bits of row i into row i+n
    flip = np.zeros(50, dtype=np.int64)
    for j in range(50):
        bits = rng.choice(63, size=rng.integers(1, 4), replace=False)
        flip[j] = np.bitwise_or.reduce(1 << bits)
    near = base[:50] ^ flip
    t = pa.table({"image_id": ids + [f"dup-{i:05d}" for i in range(50)],
                  "phash": np.concatenate([base, near])})
    pairs = phash_near_duplicates(
        rd.from_arrow(t), max_distance=4).to_pandas()
    # every injected pair must be found (recall 1 for d<=4 with 8 bands)
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    expected = {(f"dup-{i:05d}", f"img-{i:05d}") for i in range(50)}
    assert expected <= found
    # and every reported pair is a true near-dup (precision via verify step)
    ph = {r["image_id"]: r["phash"] for r in t.to_pylist()}
    for a, b in found:
        d = hamming64(np.array([ph[a]]), np.array([ph[b]]))[0]
        assert d <= 4
    # no self-pairs (regression: weak sub-band salts paired rows with their
    # own level-2 copies) and EXACT agreement with brute force
    assert (pairs["id_a"] != pairs["id_b"]).all()
    all_ph = t["phash"].to_numpy(zero_copy_only=False).astype(np.int64) \
        .view(np.uint64)
    all_ids = t["image_id"].to_pylist()
    ai, bi = np.triu_indices(len(all_ph), 1)
    d = hamming64(all_ph[ai], all_ph[bi])
    hit = d <= 4
    brute = {tuple(sorted((all_ids[x], all_ids[y])))
             for x, y in zip(ai[hit], bi[hit])
             if all_ids[x] != all_ids[y]}
    assert found == brute


def test_phash_neardup_hot_key_skew(ray_mod):
    """Pathological skew: thousands of IDENTICAL phashes (one giant
    exact-dup clique). The two-level LSH can't split identical hashes, so
    the max_bucket cap must bound the quadratic pair blowout and the run
    must complete quickly rather than emit k²/2 pairs."""
    import time

    import ray.data as rd
    from jsonschema_ray.checks import phash_near_duplicates
    n = 20_000
    t = pa.table({"image_id": [f"img-{i:05d}" for i in range(n)],
                  "phash": np.zeros(n, dtype=np.int64)})
    t0 = time.perf_counter()
    pairs = phash_near_duplicates(rd.from_arrow(t), max_bucket=256)
    cnt = pairs.count()
    wall = time.perf_counter() - t0
    # capped: at most ~bucket_cap²/2 per partition-band, far below k²/2
    assert cnt <= 256 * 255 // 2 * 8
    assert wall < 60, f"hot-key run took {wall:.0f}s"


def test_drift():
    from jsonschema_ray.checks import drift_report, ks_statistic, psi
    from jsonschema_ray.sketches import TDigest
    rng = np.random.default_rng(0)
    a, b, c = TDigest(), TDigest(), TDigest()
    a.add_values(rng.normal(0, 1, 100_000))
    b.add_values(rng.normal(0, 1, 100_000))
    c.add_values(rng.normal(0.8, 1.2, 100_000))
    assert ks_statistic(a, b) < 0.02
    assert ks_statistic(a, c) > 0.2
    assert psi(a, b) < 0.02
    assert psi(a, c) > 0.2
    rows_a = [{"column": "x", "tdigest": a.to_bytes(), "null_rate": 0.0}]
    rows_c = [{"column": "x", "tdigest": c.to_bytes(), "null_rate": 0.0}]
    rep = drift_report(rows_a, rows_c)
    assert rep[0]["drifted"] is True
    rep2 = drift_report(rows_a, rows_a)
    assert rep2[0]["drifted"] is False


def test_sketch_roundtrip_and_merge_associativity():
    from jsonschema_ray.sketches import HyperLogLog, TDigest, hash64_array
    rng = np.random.default_rng(1)
    parts = [rng.integers(0, 50_000, 30_000) for _ in range(4)]
    # HLL: merge order must not matter
    def hll_of(arrs):
        h = HyperLogLog()
        for a in arrs:
            h.merge(HyperLogLog().add_hashes(hash64_array(a)))
        return h.estimate()
    e1 = hll_of(parts)
    e2 = hll_of(parts[::-1])
    assert e1 == e2
    true = len(np.unique(np.concatenate(parts)))
    assert abs(e1 - true) / true < 0.05
    td = TDigest()
    for a in parts:
        p = TDigest()
        p.add_values(a.astype(float))
        td.merge(TDigest.from_bytes(p.to_bytes()))
    allv = np.concatenate(parts)
    assert abs(td.quantile(0.5) - np.quantile(allv, 0.5)) \
        <= 0.01 * (allv.max() - allv.min()) + 1


def test_bloom_filter_semantics():
    from jsonschema_ray.sketches.bloom import BloomFilter
    from jsonschema_ray.sketches.hashing import hash64_array
    import pyarrow as pa
    keys = pa.array([f"k-{i}" for i in range(50_000)])
    bf = BloomFilter(50_000, fp=0.01)
    bf.add_column(keys)
    # zero false negatives
    assert bf.contains_column(keys).all()
    # false-positive rate near spec
    others = pa.array([f"x-{i}" for i in range(50_000)])
    fp = bf.contains_column(others).mean()
    assert fp < 0.03, fp
    # serialization roundtrip
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert bf2.contains_column(keys).all()


def test_semi_join_with_bloom(ray_mod):
    import ray.data as rd
    from jsonschema_ray.checks import broadcast_semi_join
    facts = rd.from_arrow(pa.table({
        "k": [f"k-{i}" for i in range(1000)] + ["orphan-1", "orphan-2"],
        "v": list(range(1002))}))
    ref = pa.array([f"k-{i}" for i in range(1000)])
    semi = broadcast_semi_join(facts, "k", ref, bloom_fp=0.001).to_pandas()
    # semi-join through a bloom keeps EVERY true match
    assert len(semi) >= 1000
    anti = broadcast_semi_join(facts, "k", ref, anti=True,
                               bloom_fp=0.001).to_pandas()
    # anti-join may miss orphans (false positives) but never flags matches
    assert set(anti["k"]) <= {"orphan-1", "orphan-2"}


def test_asof_join_small_exact(ray_mod=None):
    """As-of join vs a hand-computed expectation: inclusive + strict
    modes, null keys, no-match rows, ties on the `on` value."""
    import ray.data as rd

    from jsonschema_ray.joins import asof_join
    left = rd.from_arrow(pa.table({
        "lid": [1, 2, 3, 4, 5],
        "k": pa.array([10, 10, 20, 30, None], type=pa.int64()),
        "t": pa.array([5, 2, 7, 1, 9], type=pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([10, 10, 20, 20, 99], type=pa.int64()),
        "t": pa.array([2, 4, 7, 8, 1], type=pa.int64()),
        "val": pa.array([100, 200, 300, 400, 500], type=pa.int64()),
    }))
    out = asof_join(left, right, by="k", on="t",
                    value_cols=["val"]).to_pandas() \
        .sort_values("lid").reset_index(drop=True)
    # lid1: k=10,t=5 → right (10,4)=200; lid2: t=2 → (10,2)=100 inclusive
    # lid3: k=20,t=7 → (20,7)=300 inclusive tie; lid4: k=30 → no match
    # lid5: null key → no match
    assert out["val"].tolist()[:3] == [200, 100, 300]
    assert out["val"].isna().tolist() == [False, False, False, True, True]
    strict = asof_join(left, right, by="k", on="t", value_cols=["val"],
                       inclusive=False).to_pandas() \
        .sort_values("lid").reset_index(drop=True)
    # strict: lid2 t=2 has no right < 2 → null; lid3 t=7 → nothing < 7
    assert strict["val"].tolist()[0] == 200
    assert strict["val"].isna().tolist() == [False, True, True, True, True]


def test_read_write_table_formats(tmp_path, ray_mod=None):
    """Format-dispatched table I/O: parquet/csv/json round-trips feed the
    SAME validation pipeline; lance gated with a clear error."""
    import os

    import ray.data as rd

    from jsonschema_ray.sources import read_table, write_table
    from jsonschema_ray.stages import validate_dataset
    t = pa.table({"id": [1, 2, 3], "v": [5, -1, 7]})
    base = str(tmp_path)
    for fmt in ("parquet", "csv", "json"):
        d = os.path.join(base, fmt)
        write_table(rd.from_arrow(t), d, format=fmt)
        files = [os.path.join(d, f) for f in sorted(os.listdir(d))]
        ds = read_table(files, format=fmt, columns=["id", "v"])
        viol = validate_dataset(
            ds, {"properties": {"v": {"minimum": 0}}},
            key_columns=["id"]).to_pandas()
        assert viol["id"].tolist() == [2], fmt
    # extension inference
    assert read_table(files[0].replace(".json", "") + ".json"
                      if files[0].endswith(".json") else files[0],
                      columns=["id"]).count() == 3
    try:
        read_table("/nope/table.lance")
        raise AssertionError("lance must raise ImportError")
    except ImportError as e:
        assert "lance" in str(e)
    try:
        read_table("/nope/table.xyz")
        raise AssertionError("unknown ext must raise")
    except ValueError:
        pass


def test_asof_and_range_join_property(ray_mod=None):
    """Randomized cross-check of asof_join / range_agg_join against a
    brute-force pandas reference (many keys, duplicate times, unmatched
    groups)."""
    import ray.data as rd

    from jsonschema_ray.joins import asof_join, range_agg_join
    rng = np.random.default_rng(21)
    for trial in range(3):
        nl, nr = 120, 150
        lt = pa.table({
            "lid": pa.array(range(nl), type=pa.int64()),
            "k": pa.array(rng.integers(0, 12, nl), type=pa.int64()),
            "t": pa.array(rng.integers(0, 50, nl), type=pa.int64()),
        })
        rt = pa.table({
            "k": pa.array(rng.integers(0, 15, nr), type=pa.int64()),
            "t": pa.array(rng.integers(0, 50, nr), type=pa.int64()),
            "val": pa.array(rng.integers(0, 1000, nr), type=pa.int64()),
        })
        ldf, rdf = lt.to_pandas(), rt.to_pandas()

        got = asof_join(rd.from_arrow(lt), rd.from_arrow(rt), by="k",
                        on="t", value_cols=["t"]) \
            .to_pandas().sort_values("lid").reset_index(drop=True)
        # reference: max right t <= left t within k
        exp = []
        for _, row in ldf.iterrows():
            cand = rdf[(rdf["k"] == row["k"]) & (rdf["t"] <= row["t"])]
            exp.append(cand["t"].max() if len(cand) else None)
        exp = pd.Series(exp, dtype="float64")
        assert got["t_r"].astype("float64").equals(exp), f"asof trial {trial}"

        rj = range_agg_join(rd.from_arrow(lt), rd.from_arrow(rt), by="k",
                            on="t", lower=-10, upper=0,
                            sum_cols=["val"]) \
            .to_pandas().sort_values("lid").reset_index(drop=True)
        exp_n, exp_s = [], []
        for _, row in ldf.iterrows():
            cand = rdf[(rdf["k"] == row["k"]) & (rdf["t"] <= row["t"])
                       & (rdf["t"] > row["t"] - 10)]
            exp_n.append(len(cand))
            exp_s.append(float(cand["val"].sum()))
        assert rj["n_in_range"].tolist() == exp_n, f"range n trial {trial}"
        assert np.allclose(rj["sum_val"].to_numpy(),
                           np.array(exp_s)), f"range sum trial {trial}"


def test_range_agg_join_null_left_on(ray_mod=None):
    """Left rows with a null `on` value must emit zero counts/sums
    (mirroring asof_join's null handling) instead of crashing merge_asof
    with 'Merge keys contain null values' (ADVICE-r2)."""
    import ray.data as rd

    from jsonschema_ray.joins import range_agg_join
    left = pa.table({"k": ["a", "a", "b", "b", "a"],
                     "t": pa.array([10, None, 5, None, 30],
                                   type=pa.int64())})
    right = pa.table({"k": ["a", "a", "b"],
                      "t": pa.array([8, 25, 4], type=pa.int64()),
                      "v": pa.array([1.0, 2.0, 3.0])})
    out = range_agg_join(rd.from_arrow(left), rd.from_arrow(right),
                         by="k", on="t", lower=-10, upper=0,
                         sum_cols=["v"]).to_pandas()
    assert len(out) == 5
    nulls = out[out["t"].isna()]
    assert len(nulls) == 2
    assert (nulls["n_in_range"] == 0).all() and (nulls["sum_v"] == 0).all()
    row = out[(out["k"] == "a") & (out["t"] == 10)].iloc[0]
    assert row["n_in_range"] == 1 and row["sum_v"] == 1.0


def test_phash_neardup_hashed_and_int_paths_agree(ray_mod=None):
    """The string-id path (int64 id-hash shuffle + translation) must
    produce exactly the pairs the integer-id path produces on the same
    phashes."""
    import ray.data as rd

    from jsonschema_ray.checks import phash_near_duplicates
    rng = np.random.default_rng(11)
    n = 800
    base = rng.integers(0, 2**63, n, dtype=np.int64)
    flip = (np.int64(1) << rng.integers(0, 63, 40).astype(np.int64))
    ph = np.concatenate([base, base[:40] ^ flip])
    ids_int = np.arange(len(ph), dtype=np.int64)
    t_int = pa.table({"image_id": ids_int, "phash": ph})
    t_str = pa.table({"image_id": [f"id-{i:06d}" for i in ids_int],
                      "phash": ph})
    p_int = phash_near_duplicates(rd.from_arrow(t_int),
                                  max_distance=4).to_pandas()
    p_str = phash_near_duplicates(rd.from_arrow(t_str),
                                  max_distance=4).to_pandas()
    a = set((int(r.id_a), int(r.id_b), int(r.distance))
            for r in p_int.itertuples())
    b = set((int(r.id_a[3:]), int(r.id_b[3:]), int(r.distance))
            for r in p_str.itertuples())
    assert a == b and len(a) >= 40


def test_equi_join_broadcast_and_shuffle_paths():
    """equi_join: Acero broadcast path vs Ray shuffle path agree with
    pandas merge; null keys never match; semi/anti/left_outer semantics."""
    import pandas as pd
    import ray.data as rd

    from jsonschema_ray.joins import equi_join
    L = pa.table({"k": [1, 2, 3, 4, None], "lv": ["a", "b", "c", "d", "e"]})
    R = pa.table({"k": [2, 3, 3, None], "rv": [20, 30, 31, 99]})

    def run(how, cap):
        out = equi_join(rd.from_arrow(L), rd.from_arrow(R), "k",
                        how=how, broadcast_cap=cap).to_pandas()
        return out.sort_values(list(out.columns)).reset_index(drop=True)

    for cap in (1 << 30, 0):
        got = run("inner", cap)
        assert sorted(zip(got.k, got.rv)) == [(2, 20), (3, 30), (3, 31)]
    lo = run("left_outer", 1 << 30)
    assert len(lo) == 6  # every left row survives, incl. the null key
    assert lo[lo.lv == "e"].rv.isna().all()
    assert sorted(run("semi", 1 << 30).lv) == ["b", "c"]
    assert sorted(run("anti", 1 << 30).lv) == ["a", "d", "e"]
    assert len(run("full_outer", 0)) == 7  # 3 matches + 3 left + 1 right

    # empty right side: typed results, no crash
    er = rd.from_arrow(R.slice(0, 0))
    assert equi_join(rd.from_arrow(L), er, "k",
                     broadcast_cap=1 << 30).count() == 0
    assert equi_join(rd.from_arrow(L), er, "k", how="anti",
                     broadcast_cap=1 << 30).count() == 5
    # shuffle path (cap 0) matches the broadcast plan for semi/anti
    # (rides Ray's left_semi/left_anti above the cap)
    assert sorted(run("semi", 0).lv) == ["b", "c"]
    assert sorted(run("anti", 0).lv) == ["a", "d", "e"]


def test_exact_ks_matches_reference(ray_session):
    """exact_ks must equal the definitional two-sample KS computed on the
    raw samples; empty side → NaN."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from jsonschema_ray.checks import exact_ks
    from jsonschema_ray.checks.drift import exact_ks_from_counts
    rng = np.random.default_rng(5)
    a = np.round(rng.normal(0, 1, 400), 2)
    b = np.round(rng.normal(0.4, 1.2, 300), 2)
    ds = ray.data.from_arrow(pa.table({
        "value": np.concatenate([a, b]),
        "grp": np.concatenate([np.zeros(400, np.int8),
                               np.ones(300, np.int8)])}))
    ks, n_a, n_b = exact_ks(
        ds, "value", lambda t: t["grp"].to_numpy(zero_copy_only=False))
    # definitional: ECDF gap at every sample point
    xs = np.union1d(a, b)
    fa = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    assert (n_a, n_b) == (400, 300)
    assert abs(ks - np.max(np.abs(fa - fb))) < 1e-12
    # empty side
    import math
    v = np.array([1.0, 2.0])
    assert math.isnan(exact_ks_from_counts(
        v, np.array([1, 1]), np.array([0, 0])))


def test_grouped_rollup_levels(ray_session):
    """grouped_rollup must equal the brute-force union of per-level
    groupbys, including the grand total."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from jsonschema_ray.pipelines.relational import grouped_rollup
    rng = np.random.default_rng(9)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], 500),
        "b": rng.choice(["p", "q"], 500),
        "v": rng.integers(0, 100, 500).astype("float64")})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    got = grouped_rollup(ds, ["a", "b"], {"v": "sv"},
                         count_alias="n").to_pandas()
    got = got.sort_values(["a", "b"]).reset_index(drop=True)

    lvl2 = df.groupby(["a", "b"], as_index=False).agg(
        sv=("v", "sum"), n=("v", "size"))
    lvl1 = df.groupby(["a"], as_index=False).agg(
        sv=("v", "sum"), n=("v", "size"))
    lvl1["b"] = "(all)"
    lvl0 = pd.DataFrame([{"a": "(all)", "b": "(all)",
                          "sv": df["v"].sum(), "n": len(df)}])
    exp = pd.concat([lvl2, lvl1, lvl0], ignore_index=True)[
        ["a", "b", "sv", "n"]].sort_values(["a", "b"]) \
        .reset_index(drop=True)
    got["n"] = got["n"].astype("int64")
    exp["n"] = exp["n"].astype("int64")
    pd.testing.assert_frame_equal(
        got[["a", "b", "sv", "n"]], exp, check_like=True)


def test_percent_rank_matches_definition(ray_session):
    """Sort-free percent_rank must equal rank()-1 over n-1 with ties
    sharing the min rank."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from jsonschema_ray.pipelines.relational import percent_rank_by_value
    rng = np.random.default_rng(13)
    v = rng.integers(0, 50, 300).astype("float64")   # guaranteed ties
    ds = ray.data.from_arrow(pa.table({
        "id": pa.array(np.arange(300)), "value": pa.array(v)}))
    got = percent_rank_by_value(ds, "value", keep_cols=["id"]) \
        .to_pandas().sort_values("id").reset_index(drop=True)
    s = pd.Series(v)
    exp = ((s.rank(method="min") - 1) / (len(s) - 1)).round(6)
    assert np.allclose(got["pct_rank"].to_numpy(), exp.to_numpy())


def test_psi_exact_matches_definition(ray_session):
    """psi_exact must equal the definitional fixed-bin PSI computed
    directly on the rows: per-cohort bin proportions (eps-clamped) and
    (p_a - p_b)·ln(p_a/p_b) per bin; nulls excluded; a bin one cohort
    never saw gets the clamped term, and an empty cohort → NaN total."""
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from jsonschema_ray.checks import psi_exact
    rng = np.random.default_rng(5)
    uid = np.arange(400, dtype=np.int64)
    val = np.where(uid % 2 == 0, rng.normal(50, 20, 400),
                   rng.normal(65, 25, 400))
    vals = val.tolist()
    vals[7] = None  # null excluded from cohort 1 (uid 7)
    t = pa.table({"user_id": uid, "value": pa.array(vals)})

    def grp(b):
        return (b["user_id"].to_numpy(zero_copy_only=False) % 2) \
            .astype(np.int8)

    out, total = psi_exact(rd.from_arrow(t), "value", grp, 25.0)
    # reference computation straight from the definition
    keep = np.array([v is not None for v in vals])
    bins = np.floor(val[keep] / 25.0).astype(np.int64)
    g = (uid[keep] % 2).astype(np.int8)
    ub = np.unique(bins)
    c0 = np.array([(bins[g == 0] == b).sum() for b in ub])
    c1 = np.array([(bins[g == 1] == b).sum() for b in ub])
    p0 = np.maximum(c0 / c0.sum(), 1e-6)
    p1 = np.maximum(c1 / c1.sum(), 1e-6)
    ref = (p0 - p1) * np.log(p0 / p1)
    assert (out["bin"].to_numpy() == ub).all()
    assert (out["n_a"].to_numpy() == c0).all()
    assert (out["n_b"].to_numpy() == c1).all()
    np.testing.assert_array_equal(out["psi_term"].to_numpy(), ref)
    assert total == ref.sum()
    assert out["n_b"].sum() == (g == 1).sum()  # the null really dropped

    # one cohort empty → NaN total, empty per-bin frame
    t2 = pa.table({"user_id": np.zeros(5, dtype=np.int64) * 2,
                   "value": np.arange(5).astype(float)})
    out2, tot2 = psi_exact(rd.from_arrow(t2), "value", grp, 25.0)
    assert out2.empty and math.isnan(tot2)


def test_temporal_hash_no_ns_truncation_and_unit_canonical():
    """Sketch-wave regressions: (a) ns-resolution timestamps one tick
    apart must hash DISTINCT (us-truncation collapsed 1000 ticks onto
    each microsecond — fabricated dedup duplicates, 1000x HLL ndv
    undercount); (b) the same instant/span hashes identically across
    s/ms/us/ns and across numpy vs Arrow containers; (c) NaT is
    unit-invariant; (d) Arrow nulls take the int-null sentinel."""
    import numpy as np
    import pyarrow as pa

    from jsonschema_ray.sketches import HyperLogLog
    from jsonschema_ray.sketches.hashing import _null_sentinel, \
        hash64_array

    base = np.datetime64("2024-01-01T00:00:00", "ns").astype(np.int64)
    ts = pa.array(base + np.arange(100_000), type=pa.timestamp("ns"))
    assert len(np.unique(hash64_array(ts))) == 100_000
    hll = HyperLogLog(14)
    hll.add_column(ts)
    assert abs(hll.estimate() - 100_000) / 100_000 < 0.03

    hs = {hash64_array(pa.array([1_700_000_000 * 10 ** e],
                                type=pa.timestamp(u)))[0]
          for e, u in [(0, "s"), (3, "ms"), (6, "us"), (9, "ns")]}
    assert len(hs) == 1  # one instant, four units, one hash

    nts = np.array([1000, 2000, -1], dtype="datetime64[us]")
    assert (hash64_array(nts) == hash64_array(pa.array(nts))).all()
    ntd = np.array([1000, 2000], dtype="timedelta64[us]")
    assert (hash64_array(ntd) == hash64_array(pa.array(ntd))).all()
    assert hash64_array(pa.array([5_000_000], type=pa.duration("us")))[0] \
        == hash64_array(pa.array([5], type=pa.duration("s")))[0]
    assert hash64_array(np.array(["NaT"], dtype="datetime64[us]"))[0] \
        == hash64_array(np.array(["NaT"], dtype="datetime64[ns]"))[0]
    tn = pa.array([1_700_000_000, None], type=pa.timestamp("s"))
    assert hash64_array(tn)[1] == _null_sentinel(0)
    assert hash64_array(pa.array([3600], type=pa.time32("s")))[0] \
        == hash64_array(pa.array([3600 * 10 ** 6], type=pa.time64("us")))[0]


def test_tdigest_finite_means_near_float64_max():
    """Compression accumulates m*(w/bucket_weight): the raw weighted sum
    overflowed to inf centroids from finite input near float64 max,
    poisoning every later merge/quantile/drift check."""
    import numpy as np

    from jsonschema_ray.sketches import TDigest
    td = TDigest()
    td.add_values(np.full(100_000, 1.5e308))
    assert abs(td.quantile(0.5) - 1.5e308) / 1.5e308 < 1e-10
    td2 = TDigest()
    td2.add_values(np.random.default_rng(1).normal(0, 1, 50_000))
    td2.add_values(np.full(40, 1.7e308))
    assert np.isfinite(td2.quantile(0.999))
    td3 = TDigest.from_bytes(td.to_bytes())
    td3.merge(td2)
    td3._compress()
    assert np.isfinite(td3.means).all()
    # accuracy regression guard on ordinary data
    rng = np.random.default_rng(7)
    v = rng.lognormal(0, 1, 200_000)
    td4 = TDigest()
    for lo in range(0, len(v), 10_000):
        td4.add_values(v[lo:lo + 10_000])
    for q in (0.01, 0.5, 0.99):
        assert abs((v <= td4.quantile(q)).mean() - q) < 2e-3


def test_bloom_rejects_unserializable_k_at_init():
    import pytest as _pytest

    from jsonschema_ray.sketches.bloom import BloomFilter
    with _pytest.raises(ValueError, match="k"):
        BloomFilter(10, fp=1e-78)
    BloomFilter(10_000, fp=0.01).to_bytes()  # normal params unaffected


def test_psi_exact_nonfinite_and_bad_binwidth(ray_session):
    """NaN/inf values (valid Arrow floats) must be EXCLUDED, not cast to
    an INT64_MIN bin that pollutes both cohort totals; bin_width must be
    a finite positive float; a finite value whose bin overflows int64 is
    refused loudly instead of silently dropped."""
    import pytest
    import ray.data as rd

    from jsonschema_ray.checks import psi_exact

    t = pa.table({
        "value": pa.array([10.0, 40.0, float("nan"), float("inf"),
                           float("-inf"), None, 20.0, 30.0]),
        "g": pa.array([0, 0, 0, 1, 0, 1, 1, 1], type=pa.int8())})

    def grp(b):
        return b["g"].to_numpy(zero_copy_only=False)

    out, total = psi_exact(rd.from_arrow(t), "value", grp, 25.0)
    # only the 4 finite values count: cohort A {10,40}, cohort B {20,30}
    assert out["n_a"].sum() == 2 and out["n_b"].sum() == 2
    assert set(out["bin"]) == {0, 1} and np.isfinite(total)

    for bad in (0.0, -1.0, float("nan"), float("inf")):
        with pytest.raises(ValueError, match="bin_width"):
            psi_exact(rd.from_arrow(t), "value", grp, bad)
    with pytest.raises(Exception, match="int64 bin range"):
        psi_exact(rd.from_arrow(pa.table({
            "value": pa.array([1e300]),
            "g": pa.array([0], type=pa.int8())})), "value", grp, 1e-6)


def test_exact_ks_excludes_nonfinite(ray_session):
    """NaN has no ECDF position: exact_ks drops non-finite floats from
    both the statistic and the returned cohort sizes (previously the
    pivot dropped them from the ECDF while nothing documented it)."""
    import ray.data as rd

    from jsonschema_ray.checks import exact_ks

    t = pa.table({
        "value": pa.array([1.0, 2.0, float("nan"), 3.0, None, 4.0]),
        "g": pa.array([0, 0, 0, 1, 1, 1], type=pa.int8())})

    def grp(b):
        return b["g"].to_numpy(zero_copy_only=False)

    ks, n_a, n_b = exact_ks(rd.from_arrow(t), "value", grp)
    assert (n_a, n_b) == (2, 2)
    assert ks == 1.0  # {1,2} vs {3,4}: disjoint supports


def test_psi_sketch_exact_convention_alignment():
    """psi() (sketch) and psi_exact share the clamp-only smoothing: on a
    large sample with well-populated deciles the sketch PSI lands near
    the definitional value (no renormalization skew)."""
    from jsonschema_ray.checks import psi
    from jsonschema_ray.sketches import TDigest

    rng = np.random.default_rng(7)
    a, b = rng.normal(0, 1, 200_000), rng.normal(0.4, 1, 200_000)
    ta, tb = TDigest(), TDigest()
    ta.add_values(a)
    tb.add_values(b)
    got = psi(ta, tb)
    # definitional PSI on the same deciles (exact sample quantiles)
    edges = np.quantile(a, np.linspace(0, 1, 11)[1:-1])
    pa_ = np.clip(np.diff(np.concatenate(
        ([0], np.searchsorted(np.sort(a), edges) / len(a), [1]))),
        1e-6, None)
    pb_ = np.clip(np.diff(np.concatenate(
        ([0], np.searchsorted(np.sort(b), edges) / len(b), [1]))),
        1e-6, None)
    want = float(np.sum((pb_ - pa_) * np.log(pb_ / pa_)))
    assert abs(got - want) < 0.01 and want > 0.1
