"""Randomized two-engine property net for the session-19 disciplines:
seeded random corpora (nulls, timestamp ties, coarse value grids that
land exactly on band edges, duplicate doc ids, censoring shapes) run
through BOTH the Ray pipeline and its DuckDB oracle and must agree on
every value — the adversarial companions to the hand pins, aimed at
the branches the sf corpora can't reach."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

DAY = 86_400_000_000
MIN = 60_000_000


def _write(tmp_path, name, tb):
    pq.write_table(tb, os.path.join(str(tmp_path), f"{name}.parquet"))


def _oracle(tmp_path, name):
    import duckdb

    import __ray_entry__ as E
    con = duckdb.connect()
    for t in ("events", "documents", "lineitem", "orders", "customer",
              "supplier", "nation", "region", "part", "embeddings"):
        p = os.path.join(str(tmp_path), f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{p}')")
    return con.execute(E.oracle_sql()[name]).df()


def _frames_match(got, exp, sort_cols):
    got = got.sort_values(sort_cols).reset_index(drop=True)
    exp = exp.sort_values(sort_cols).reset_index(drop=True)
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp), (len(got), len(exp))
    for c in exp.columns:
        gv, ev = got[c].to_numpy(), exp[c].to_numpy()
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            assert np.array_equal(np.asarray(gv, dtype=float),
                                  np.asarray(ev, dtype=float),
                                  equal_nan=True), c
        else:
            assert (gv.astype(str) == ev.astype(str)).all(), c


def _rand_events(rng, n):
    """Events with timestamp TIES (coarse minute grid), values on a
    coarse grid that lands exactly on the 50-wide band edges
    (including negatives and ≥1000 out-of-support values), 4 types
    and ~10% nulls per column."""
    rows = {
        "event_id": pa.array(
            [None if rng.random() < 0.05 else i
             for i in range(1, n + 1)], pa.int64()),
        "user_id": pa.array(
            [None if rng.random() < 0.1
             else int(rng.integers(1, max(n // 4, 2)))
             for _ in range(n)], pa.int64()),
        "event_type": pa.array(
            [None if rng.random() < 0.1
             else "abcd"[rng.integers(0, 4)]
             for _ in range(n)], pa.string()),
        "ts": pa.array(
            [None if rng.random() < 0.1
             else int(rng.integers(0, 40)) * DAY
             + int(rng.integers(0, 4)) * 10 * MIN
             for _ in range(n)], pa.timestamp("us")),
        "value": pa.array(
            [None if rng.random() < 0.1
             else float(rng.integers(-2, 22)) * 50.0
             for _ in range(n)], pa.float64()),
    }
    return pa.table(rows)


def _rand_orders(rng, n):
    """Orders with duplicate customers, tied spends (coarse quarter
    grid), same-day repeats and ~10% nulls per column."""
    return pa.table({
        "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
        "o_custkey": pa.array(
            [None if rng.random() < 0.1
             else int(rng.integers(1, max(n // 3, 2)))
             for _ in range(n)], pa.int64()),
        "o_orderdate": pa.array(
            [None if rng.random() < 0.1
             else int(rng.integers(0, 40)) * DAY
             for _ in range(n)], pa.timestamp("us")),
        "o_totalprice": pa.array(
            [None if rng.random() < 0.1
             else float(rng.integers(0, 50)) * 0.25
             for _ in range(n)], pa.float64()),
        "o_linenumber_pad": pa.array([0] * n, pa.int64()),
    })


def _rand_docs(rng, n):
    """Documents with DUPLICATE doc ids (row-merge paths), tiny-vocab
    texts (heavy hash/df ties), short and empty texts, ~10% nulls."""
    vocab = ["ox", "elk", "bee", "ant", "owl"]
    texts = []
    for _ in range(n):
        if rng.random() < 0.1:
            texts.append(None)
        else:
            k = int(rng.integers(0, 8))
            texts.append(" ".join(
                vocab[rng.integers(0, len(vocab))]
                for _ in range(k)))
    return pa.table({
        "doc_id": pa.array(
            [None if rng.random() < 0.05
             else int(rng.integers(1, max(n - n // 5, 2)))
             for _ in range(n)], pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string())})


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_survival_random(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import (
        survival_risk_table_customers)
    rng = np.random.default_rng(seed)
    _write(tmp_path, "orders", _rand_orders(rng, 120))
    got = survival_risk_table_customers(str(tmp_path))
    exp = _oracle(tmp_path, "survival_risk_table_customers")
    _frames_match(got, exp.astype("int64") if len(exp) else exp,
                  ["t_days"])


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_trajectory_random(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import (
        trajectory_census_customers)
    rng = np.random.default_rng(seed)
    _write(tmp_path, "orders", _rand_orders(rng, 150))
    got = trajectory_census_customers(str(tmp_path))
    exp = _oracle(tmp_path, "trajectory_census_customers")
    _frames_match(got, exp.astype("int64"), ["n_multi"])


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_decay_random(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import decay_spend_customers
    rng = np.random.default_rng(seed)
    _write(tmp_path, "orders", _rand_orders(rng, 120))
    got = decay_spend_customers(str(tmp_path))
    exp = _oracle(tmp_path, "decay_spend_customers")
    _frames_match(got, exp, ["o_custkey"])


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_twap_random(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import twap_value_by_type
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _rand_events(rng, 150))
    got = twap_value_by_type(str(tmp_path))
    exp = _oracle(tmp_path, "twap_value_by_type")
    _frames_match(got, exp, ["event_type"])


@pytest.mark.parametrize("seed", [51, 52, 53])
def test_runs_and_leadlag_random(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import (
        leadlag_daily_events, runs_test_daily_events)
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _rand_events(rng, 150))
    got = runs_test_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "runs_test_daily_events")
    _frames_match(got, exp.astype(got.dtypes.to_dict()),
                  ["event_type"])
    got = leadlag_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "leadlag_daily_events")
    _frames_match(got, exp, ["type_lead", "type_follow"])


@pytest.mark.parametrize("seed", [61, 62, 63])
def test_gap_quantiles_random(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import gap_quantiles_by_type
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _rand_events(rng, 150))
    got = gap_quantiles_by_type(str(tmp_path))
    exp = _oracle(tmp_path, "gap_quantiles_by_type")
    _frames_match(got, exp.astype(got.dtypes.to_dict())
                  if len(exp) else exp, ["event_type"])


@pytest.mark.parametrize("seed", [71, 72, 73])
def test_growth_audience_iso_random(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import (
        audience_growth_daily_events,
        growth_accounting_monthly_events, iso_week_volume_events)
    rng = np.random.default_rng(seed)
    # wide day range spanning year boundaries + month gaps
    n = 150
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "user_id": pa.array(
            [None if rng.random() < 0.1
             else int(rng.integers(1, 25)) for _ in range(n)],
            pa.int64()),
        "ts": pa.array(
            [None if rng.random() < 0.1
             else int(rng.integers(300, 900)) * DAY
             for _ in range(n)], pa.timestamp("us"))}))
    got = growth_accounting_monthly_events(str(tmp_path))
    exp = _oracle(tmp_path, "growth_accounting_monthly_events")
    _frames_match(got, exp.astype(got.dtypes.to_dict()), ["month"])
    got = audience_growth_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "audience_growth_daily_events")
    _frames_match(got, exp.astype(got.dtypes.to_dict()), ["day"])
    got = iso_week_volume_events(str(tmp_path))
    exp = _oracle(tmp_path, "iso_week_volume_events")
    _frames_match(got, exp.astype("int64"),
                  ["iso_year", "iso_week"])


@pytest.mark.parametrize("seed", [81, 82, 83])
def test_hll_markov_random(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import (
        hll_registers_events, next_action_profile_events,
        transition_entropy_events)
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _rand_events(rng, 150))
    got = hll_registers_events(str(tmp_path))
    exp = _oracle(tmp_path, "hll_registers_events")
    _frames_match(got, exp.astype("int64"), ["bucket"])
    got = next_action_profile_events(str(tmp_path))
    exp = _oracle(tmp_path, "next_action_profile_events")
    _frames_match(got, exp.astype(got.dtypes.to_dict())
                  if len(exp) else exp, ["prev_type"])
    got = transition_entropy_events(str(tmp_path))
    exp = _oracle(tmp_path, "transition_entropy_events")
    _frames_match(got, exp.astype(got.dtypes.to_dict())
                  if len(exp) else exp, ["prev_type"])


@pytest.mark.parametrize("seed", [91, 92, 93])
def test_winnow_bm25_random(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import (
        bm25_topk_documents, winnow_md5_documents)
    rng = np.random.default_rng(seed)
    _write(tmp_path, "documents", _rand_docs(rng, 80))
    got = winnow_md5_documents(str(tmp_path))
    exp = _oracle(tmp_path, "winnow_md5_documents")
    _frames_match(got, exp, ["doc_id"])
    got = bm25_topk_documents(str(tmp_path))
    exp = _oracle(tmp_path, "bm25_topk_documents")
    _frames_match(got, exp, ["rank"])


@pytest.mark.parametrize("seed", [101, 102, 103])
def test_emd_anova_random(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import (
        anova_value_by_type, emd_value_halves_events)
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _rand_events(rng, 150))
    got = emd_value_halves_events(str(tmp_path))
    exp = _oracle(tmp_path, "emd_value_halves_events")
    _frames_match(got, exp, ["n_first"])
    got = anova_value_by_type(str(tmp_path))
    exp = _oracle(tmp_path, "anova_value_by_type")
    _frames_match(got, exp, ["k_groups"])


@pytest.mark.parametrize("seed", [111, 112, 113])
def test_hill_boundary_random(tmp_path, seed):
    """Customer counts randomized AROUND the k+1 = 51 boundary so the
    no-tail arm and the just-enough arm both get hit across seeds."""
    from jsonschema_ray.pipelines.relational import hill_tail_spend
    rng = np.random.default_rng(seed)
    n = int(rng.integers(40, 90))
    _write(tmp_path, "orders", _rand_orders(rng, n * 2))
    got = hill_tail_spend(str(tmp_path))
    exp = _oracle(tmp_path, "hill_tail_spend")
    _frames_match(got, exp, ["n_cust"])


@pytest.mark.parametrize("seed", [121, 122, 123])
def test_mmr_random(tmp_path, seed):
    """Coarse 1/8-grid float32 embeddings (exactly representable →
    exact integer dots with heavy ties) through the full MMR greedy
    on both engines."""
    from jsonschema_ray.pipelines.relational import mmr_rerank_embeddings
    rng = np.random.default_rng(seed)
    n, d = 30, 8
    vecs = []
    for _ in range(n):
        if rng.random() < 0.08:
            vecs.append(None)
        else:
            vecs.append([float(x) * 0.125 for x in
                         rng.integers(-4, 5, d)])
    _write(tmp_path, "embeddings", pa.table({
        "vec_id": pa.array(
            [None if rng.random() < 0.05 else i
             for i in range(1, n + 1)], pa.int64()),
        "embedding": pa.array(
            [None if v is None else v + [0.0] * (64 - d)
             for v in vecs], pa.list_(pa.float32())),
        "label": pa.array([0] * n, pa.int32())}))
    got = mmr_rerank_embeddings(str(tmp_path))
    exp = _oracle(tmp_path, "mmr_rerank_embeddings")
    _frames_match(got, exp.astype("int64") if len(exp) else exp,
                  ["query_id", "rank"])


@pytest.mark.parametrize("seed", [131, 132, 133])
def test_kanon_lang_entropy_length_gini_random(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import (
        k_anonymity_customers, lang_entropy_by_source,
        length_gini_documents)
    rng = np.random.default_rng(seed)
    n = 120
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array(range(1, n + 1), pa.int64()),
        "c_nationkey": pa.array(
            [None if rng.random() < 0.15
             else int(rng.integers(0, 4)) for _ in range(n)],
            pa.int64()),
        "c_mktsegment": pa.array(
            [None if rng.random() < 0.15
             else "ABC"[rng.integers(0, 3)] for _ in range(n)],
            pa.string())}))
    got = k_anonymity_customers(str(tmp_path))
    exp = _oracle(tmp_path, "k_anonymity_customers")
    _frames_match(got, exp, ["n_rows"])

    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(
            [None if rng.random() < 0.05 else i
             for i in range(1, n + 1)], pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "lang": pa.array(
            [None if rng.random() < 0.2
             else "defg"[rng.integers(0, 4)] for _ in range(n)],
            pa.string()),
        "source": pa.array(
            [None if rng.random() < 0.1
             else "st"[rng.integers(0, 2)] for _ in range(n)],
            pa.string()),
        "n_chars": pa.array(
            [None if rng.random() < 0.1
             else int(rng.integers(0, 5)) * 100  # incl. exact zeros
             for _ in range(n)], pa.int64())}))
    got = lang_entropy_by_source(str(tmp_path))
    exp = _oracle(tmp_path, "lang_entropy_by_source")
    _frames_match(got, exp.astype(got.dtypes.to_dict())
                  if len(exp) else exp, ["source"])
    got = length_gini_documents(str(tmp_path))
    exp = _oracle(tmp_path, "length_gini_documents")
    _frames_match(got, exp, ["n_docs"])


@pytest.mark.parametrize("seed", [141, 142, 143])
def test_price_quantiles_band_occupancy_random(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import (
        band_occupancy_documents, price_quantiles_by_brand)
    rng = np.random.default_rng(seed)
    nparts, nlines = 12, 150
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array(range(1, nparts + 1), pa.int64()),
        "p_brand": pa.array(["B" + str(rng.integers(0, 4))
                             for _ in range(nparts)], pa.string())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array(
            [int(rng.integers(1, 60)) for _ in range(nlines)],
            pa.int64()),
        "l_linenumber": pa.array(
            [int(rng.integers(1, 8)) for _ in range(nlines)],
            pa.int64()),
        "l_partkey": pa.array(
            [None if rng.random() < 0.1
             else int(rng.integers(1, nparts + 4))  # some unknown
             for _ in range(nlines)], pa.int64()),
        "l_extendedprice": pa.array(
            [None if rng.random() < 0.1
             else float(rng.integers(0, 30)) * 0.5  # heavy ties
             for _ in range(nlines)], pa.float64())}))
    got = price_quantiles_by_brand(str(tmp_path))
    exp = _oracle(tmp_path, "price_quantiles_by_brand")
    _frames_match(got, exp.astype(got.dtypes.to_dict())
                  if len(exp) else exp, ["p_brand"])

    vocab = ["ox", "elk", "bee", "ant", "owl", "cat"]
    nd = 40
    texts = []
    for _ in range(nd):
        if rng.random() < 0.1:
            texts.append(None)
        else:
            k = int(rng.integers(0, 7))
            texts.append(" ".join(
                vocab[rng.integers(0, len(vocab))]
                for _ in range(k)))
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(
            [None if rng.random() < 0.05
             else int(rng.integers(1, nd)) for _ in range(nd)],
            pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * nd, pa.string()),
        "source": pa.array(["s"] * nd, pa.string())}))
    got = band_occupancy_documents(str(tmp_path))
    exp = _oracle(tmp_path, "band_occupancy_documents")
    _frames_match(got, exp.astype("int64") if len(exp) else exp,
                  ["band", "bucket_size"])
