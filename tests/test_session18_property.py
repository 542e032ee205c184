"""Randomized two-engine property net for the session-18 exact-integer
disciplines: seeded random corpora (nulls, ties, duplicates, negative
and same-day values included by construction) run through BOTH the Ray
pipeline and its DuckDB oracle and must agree on every value. These are
the adversarial companions to the hand pins — the generators aim at
the branches the sf corpora can't reach (ties, flats, censoring,
zero denominators)."""

import math
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


def _rand_orders(rng, n):
    """Orders with duplicate customers, tied spends (coarse price
    grid), same-day repeats and ~10% nulls in each column."""
    cust = rng.integers(1, max(n // 3, 2), n)
    day = rng.integers(0, 40, n)
    price = rng.integers(0, 50, n) * 0.25   # coarse → many exact ties
    rows = {
        "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
        "o_custkey": pa.array(
            [None if rng.random() < 0.1 else int(c) for c in cust],
            pa.int64()),
        "o_orderdate": pa.array(
            [None if rng.random() < 0.1 else int(d) * DAY
             for d in day], pa.timestamp("us")),
        "o_totalprice": pa.array(
            [None if rng.random() < 0.1 else float(p)
             for p in price], pa.float64()),
    }
    return pa.table(rows)


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_gini_random_matches_oracle(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import gini_spend_customers
    rng = np.random.default_rng(seed)
    _write(tmp_path, "orders", _rand_orders(rng, 60))
    _frames_match(gini_spend_customers(str(tmp_path)),
                  _oracle(tmp_path, "gini_spend_customers"),
                  ["n_cust"])


@pytest.mark.parametrize("seed", [11, 12, 13, 14, 15])
def test_cohort_ltv_random_matches_oracle(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import cohort_ltv_curve
    rng = np.random.default_rng(seed)
    _write(tmp_path, "orders", _rand_orders(rng, 80))
    _frames_match(cohort_ltv_curve(str(tmp_path)),
                  _oracle(tmp_path, "cohort_ltv_curve"),
                  ["cohort_month", "month_index"])


@pytest.mark.parametrize("seed", [21, 22, 23, 24, 25])
def test_spend_trend_random_matches_oracle(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import spend_trend_customers
    rng = np.random.default_rng(seed)
    _write(tmp_path, "orders", _rand_orders(rng, 80))
    _frames_match(spend_trend_customers(str(tmp_path)),
                  _oracle(tmp_path, "spend_trend_customers"),
                  ["n_cust"])


def _rand_events(rng, n):
    """Events with tied timestamps (coarse minute grid), few users,
    few types and ~10% nulls everywhere."""
    user = rng.integers(1, 6, n)
    typ = rng.choice(["a", "b", "error"], n)
    ts = rng.integers(0, 90, n) * 17 * MIN      # coarse → exact ties
    return pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "user_id": pa.array(
            [None if rng.random() < 0.1 else int(u) for u in user],
            pa.int64()),
        "event_type": pa.array(
            [None if rng.random() < 0.1 else str(t) for t in typ],
            pa.string()),
        "ts": pa.array(
            [None if rng.random() < 0.1 else int(t) for t in ts],
            pa.timestamp("us"))})


@pytest.mark.parametrize("seed", [31, 32, 33, 34, 35])
def test_interarrival_cv_random_matches_oracle(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import (
        interarrival_cv_by_type)
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _rand_events(rng, 120))
    _frames_match(interarrival_cv_by_type(str(tmp_path)),
                  _oracle(tmp_path, "interarrival_cv_by_type"),
                  ["event_type"])


@pytest.mark.parametrize("seed", [41, 42, 43, 44, 45])
def test_daily_trend_random_matches_oracle(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import daily_trend_by_type
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _rand_events(rng, 120))
    _frames_match(daily_trend_by_type(str(tmp_path)),
                  _oracle(tmp_path, "daily_trend_by_type"),
                  ["event_type"])


@pytest.mark.parametrize("seed", [51, 52, 53, 54, 55])
def test_weekend_lift_random_matches_oracle(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import weekend_lift_by_type
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _rand_events(rng, 120))
    _frames_match(weekend_lift_by_type(str(tmp_path)),
                  _oracle(tmp_path, "weekend_lift_by_type"),
                  ["event_type"])


@pytest.mark.parametrize("seed", [61, 62, 63])
def test_peak_sessions_random_matches_oracle(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import (
        peak_concurrent_sessions_events)
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _rand_events(rng, 120))
    got = peak_concurrent_sessions_events(str(tmp_path))
    exp = _oracle(tmp_path, "peak_concurrent_sessions_events")
    assert len(got) == len(exp)
    if len(got):
        for c in exp.columns:
            assert str(got.iloc[0][c]) == str(exp.iloc[0][c]), c


@pytest.mark.parametrize("seed", [71, 72, 73])
def test_time_to_first_error_random_matches_oracle(tmp_path, seed):
    from jsonschema_ray.pipelines.relational import (
        time_to_first_error_events)
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _rand_events(rng, 120))
    _frames_match(time_to_first_error_events(str(tmp_path)),
                  _oracle(tmp_path, "time_to_first_error_events"),
                  ["stat"])
