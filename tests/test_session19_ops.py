"""Session-19 operators — crafted edge branches the sf oracles can't
reach. The sf-scale value oracles run in test_driver_contract and were
hand-verified at sf0.001/0.01/0.1 against DuckDB."""

import hashlib
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

DAY = 86_400_000_000  # one day in µs
MIN = 60_000_000  # one minute in µs


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


def _events_users(tmp_path, user_ids):
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, len(user_ids) + 1), pa.int64()),
        "user_id": pa.array(user_ids, pa.int64()),
        "ts": pa.array([i * MIN for i in range(len(user_ids))],
                       pa.timestamp("us"))}))


def _hll_expected(user_ids):
    """Independent re-derivation of the register table (the test's own
    arithmetic, not the implementation's)."""
    regs = {}
    for uid in set(user_ids):
        h = int.from_bytes(
            hashlib.md5(str(uid).encode()).digest()[:8], "little")
        w = h & ((1 << 56) - 1)
        rho = 57 - w.bit_length() if w else 57
        b = h >> 56
        regs[b] = max(regs.get(b, 0), rho)
    return [{"bucket": b, "register": regs[b]} for b in sorted(regs)]


# ------------------------------------------------------------------ hll

def test_hll_registers_hand_users(tmp_path):
    """Three distinct users → registers match the test's own
    hashlib-derived bucket/rho table AND the DuckDB md5_number oracle
    (three independent md5 arithmetic paths agreeing)."""
    from jsonschema_ray.pipelines.relational import hll_registers_events
    _events_users(tmp_path, [7, 42, 9001])
    out = hll_registers_events(str(tmp_path))
    assert out.to_dict("records") == _hll_expected([7, 42, 9001])
    exp = _oracle(tmp_path, "hll_registers_events")
    assert exp.astype({"bucket": "int64", "register": "int64"}) \
        .to_dict("records") == out.to_dict("records")


def test_hll_duplicates_collapse(tmp_path):
    """A user seen 50 times contributes exactly the register a user
    seen once does — max-merge idempotence, the property that makes
    the sketch mergeable across shards."""
    from jsonschema_ray.pipelines.relational import hll_registers_events
    _events_users(tmp_path, [123] * 50 + [456])
    out = hll_registers_events(str(tmp_path))
    assert out.to_dict("records") == _hll_expected([123, 456])
    exp = _oracle(tmp_path, "hll_registers_events")
    assert exp.astype({"bucket": "int64", "register": "int64"}) \
        .to_dict("records") == out.to_dict("records")


def test_hll_bucket_collision_takes_max(tmp_path):
    """Seed a corpus large enough that at least one bucket holds >= 2
    distinct users (256 buckets, 600 users → pigeonhole) and pin that
    every register equals the MAX rho over that bucket's users, not
    the first or last seen."""
    from jsonschema_ray.pipelines.relational import hll_registers_events
    ids = list(range(1000, 1600))
    _events_users(tmp_path, ids)
    out = hll_registers_events(str(tmp_path))
    assert out.to_dict("records") == _hll_expected(ids)
    # pigeonhole really happened: fewer buckets than users
    assert len(out) < len(ids)


def test_hll_null_users_invisible_and_empty(tmp_path):
    """NULL user_id rows are invisible; an all-null corpus answers a
    typed empty frame on both engines."""
    from jsonschema_ray.pipelines.relational import hll_registers_events
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([None, 77, None], pa.int64()),
        "ts": pa.array([0, MIN, 2 * MIN], pa.timestamp("us"))}))
    out = hll_registers_events(str(tmp_path))
    assert out.to_dict("records") == _hll_expected([77])

    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1], pa.int64()),
        "user_id": pa.array([None], pa.int64()),
        "ts": pa.array([0], pa.timestamp("us"))}))
    out = hll_registers_events(str(tmp_path))
    assert list(out.columns) == ["bucket", "register"]
    assert len(out) == 0
    assert out["bucket"].dtype == "int64"
    assert out["register"].dtype == "int64"
    assert len(_oracle(tmp_path, "hll_registers_events")) == 0


def test_hll_estimate_tracks_exact_count():
    """The registers ARE a working sketch: the standard HLL harmonic
    estimate computed from the query's output lands within the
    sketch's nominal error band of the exact distinct-user count at
    sf0.001 (driver-side check — the estimate stays out of the SQL
    oracle because a 256-term float harmonic sum has no defined SQL
    accumulation order)."""
    import duckdb

    from jsonschema_ray.pipelines.relational import hll_registers_events
    sf = "/root/testdata/sf0.001"
    out = hll_registers_events(sf)
    m = 256
    regs = np.zeros(m)
    regs[out["bucket"].to_numpy()] = out["register"].to_numpy()
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs))
    nzero = m - len(out)
    if est <= 2.5 * m and nzero:  # small-range correction
        est = m * math.log(m / nzero)
    exact = duckdb.connect().execute(
        f"SELECT count(DISTINCT user_id) FROM "
        f"read_parquet('{sf}/events.parquet')").fetchone()[0]
    assert abs(est - exact) / exact < 0.15  # 1.04/sqrt(256) ≈ 6.5%, 2σ+


def _events_type_days(tmp_path, day_counts):
    """day_counts: {event_type: {day_number: count}} — expands to one
    event row per count at day*DAY µs."""
    types, ts = [], []
    for t, dc in day_counts.items():
        for d, c in dc.items():
            for _ in range(c):
                types.append(t)
                ts.append(d * DAY)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, len(types) + 1), pa.int64()),
        "user_id": pa.array([1] * len(types), pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us"))}))


# ------------------------------------------------------------ runs test

def test_runs_zero_fill_is_load_bearing(tmp_path):
    """Days 0..4 with counts [3,1,3,·,1] (day 3 never observed): the
    dense grid zero-fills day 3 → y=[3,1,3,0,1], median 1, equal days
    dropped, sides [+,+,−] → 2 runs. WITHOUT the zero-fill the − side
    would not exist at all (1 run) — the gap IS a below-median day."""
    from jsonschema_ray.pipelines.relational import runs_test_daily_events
    _events_type_days(tmp_path, {"a": {0: 3, 1: 1, 2: 3, 4: 1}})
    out = runs_test_daily_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "a", "median_count": 1, "n_above": 2,
         "n_below": 1, "n_runs": 2}]
    exp = _oracle(tmp_path, "runs_test_daily_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_runs_max_alternation(tmp_path):
    """Counts [5,1,5,1,5,3]: disc median 3 (its own day equal-dropped),
    sides [+,−,+,−,+] → every boundary is a run boundary: 5 runs,
    n_above=3, n_below=2 — the mean-reverting extreme."""
    from jsonschema_ray.pipelines.relational import runs_test_daily_events
    _events_type_days(tmp_path, {"a": {0: 5, 1: 1, 2: 5, 3: 1, 4: 5,
                                       5: 3}})
    out = runs_test_daily_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "a", "median_count": 3, "n_above": 3,
         "n_below": 2, "n_runs": 5}]
    exp = _oracle(tmp_path, "runs_test_daily_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_runs_constant_series_keeps_row(tmp_path):
    """A type whose every grid day equals its median (constant series)
    keeps its row with n_above = n_below = n_runs = 0 — the LEFT JOIN
    arm in SQL, not an absent type. A second trending type in the SAME
    corpus pins the one-run extreme: counts [1,1,9,9] → disc median 1
    (sorted[ceil(2)−1]), the two 1-days equal-dropped, sides [+,+] →
    exactly 1 run — per-type medians computed independently."""
    from jsonschema_ray.pipelines.relational import runs_test_daily_events
    _events_type_days(tmp_path, {
        "flat": {0: 2, 1: 2, 2: 2, 3: 2},
        "trend": {0: 1, 1: 1, 2: 9, 3: 9}})
    out = runs_test_daily_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "flat", "median_count": 2, "n_above": 0,
         "n_below": 0, "n_runs": 0},
        {"event_type": "trend", "median_count": 1, "n_above": 2,
         "n_below": 0, "n_runs": 1}]
    exp = _oracle(tmp_path, "runs_test_daily_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_runs_empty_and_null_rows(tmp_path):
    """Null ts / null type rows are invisible; a corpus with none left
    answers a typed empty frame on both engines."""
    from jsonschema_ray.pipelines.relational import runs_test_daily_events
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array([None, "a"], pa.string()),
        "ts": pa.array([0, None], pa.timestamp("us"))}))
    out = runs_test_daily_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["event_type", "median_count",
                                 "n_above", "n_below", "n_runs"]
    assert out["n_runs"].dtype == "int64"
    assert len(_oracle(tmp_path, "runs_test_daily_events")) == 0


def _orders_days(tmp_path, rows):
    """rows: (o_custkey|None, order_day|None) — o_orderdate at
    day*DAY µs."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            [None if r[1] is None else r[1] * DAY for r in rows],
            pa.timestamp("us"))}))


# ------------------------------------------------------------- survival

def test_survival_hand_risk_table(tmp_path):
    """A(orders day 0,5 → event t=5), B(one order day 3 → censored at
    dmax=5 → t=2), C(two SAME-DAY orders day 1 → event t=0): risk
    table [t=0: 3 at risk, 1 event | t=2: 2 at risk, 1 censor |
    t=5: 1 at risk, 1 event] — the t=0 event arm (same-day repeat)
    and the running n−Σexits identity in one corpus."""
    from jsonschema_ray.pipelines.relational import (
        survival_risk_table_customers)
    _orders_days(tmp_path, [(1, 0), (1, 5), (2, 3), (3, 1), (3, 1)])
    out = survival_risk_table_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"t_days": 0, "n_risk": 3, "n_event": 1, "n_censor": 0},
        {"t_days": 2, "n_risk": 2, "n_event": 0, "n_censor": 1},
        {"t_days": 5, "n_risk": 1, "n_event": 1, "n_censor": 0}]
    exp = _oracle(tmp_path, "survival_risk_table_customers")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")


def test_survival_censor_at_zero_and_third_order_invisible(tmp_path):
    """A lone order ON the corpus max date is a t=0 CENSOR (not an
    event, not absent); a third order never matters (customer with
    days [7,1,4] unsorted → event t=3 from the two smallest)."""
    from jsonschema_ray.pipelines.relational import (
        survival_risk_table_customers)
    _orders_days(tmp_path, [(1, 7), (1, 1), (1, 4), (2, 7)])
    out = survival_risk_table_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"t_days": 0, "n_risk": 2, "n_event": 0, "n_censor": 1},
        {"t_days": 3, "n_risk": 1, "n_event": 1, "n_censor": 0}]
    exp = _oracle(tmp_path, "survival_risk_table_customers")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")


def test_survival_nulls_and_empty(tmp_path):
    """Null custkey/orderdate rows are invisible — including for the
    global max date (a null-custkey order on a LATER day must not
    extend censoring); no surviving row → typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        survival_risk_table_customers)
    _orders_days(tmp_path, [(1, 2), (None, 9), (1, None), (2, 4)])
    out = survival_risk_table_customers(str(tmp_path))
    # dmax = 4 (the null-custkey day-9 order is invisible): cust 1
    # censored at t=2, cust 2 censored at t=0
    assert out.to_dict("records") == [
        {"t_days": 0, "n_risk": 2, "n_event": 0, "n_censor": 1},
        {"t_days": 2, "n_risk": 1, "n_event": 0, "n_censor": 1}]
    exp = _oracle(tmp_path, "survival_risk_table_customers")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")

    _orders_days(tmp_path, [(None, 3), (5, None)])
    out = survival_risk_table_customers(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["t_days", "n_risk", "n_event",
                                 "n_censor"]
    assert out["n_risk"].dtype == "int64"
    assert len(_oracle(tmp_path, "survival_risk_table_customers")) == 0


def _orders_price_days(tmp_path, rows):
    """rows: (o_custkey|None, o_totalprice|None, order_day|None)."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
        "o_orderdate": pa.array(
            [None if r[2] is None else r[2] * DAY for r in rows],
            pa.timestamp("us"))}))


# ---------------------------------------------------------------- decay

def test_decay_halving_tie_and_ck_tiebreak(tmp_path):
    """$1.00 today and $2.00 yesterday score EXACTLY equal
    (100·2^30 == 200·2^29 — the one-day half-life identity as exact
    integers, no float ever computed), and the tie ranks by customer
    key ascending on both engines."""
    from jsonschema_ray.pipelines.relational import decay_spend_customers
    _orders_price_days(tmp_path, [(1, 1.00, 30), (2, 2.00, 29)])
    out = decay_spend_customers(str(tmp_path))
    s = str(100 << 30)
    assert out.to_dict("records") == [
        {"o_custkey": 1, "score_scaled": s, "n_window_orders": 1},
        {"o_custkey": 2, "score_scaled": s, "n_window_orders": 1}]
    exp = _oracle(tmp_path, "decay_spend_customers")
    assert exp.astype({"o_custkey": "int64", "score_scaled": str,
                       "n_window_orders": "int64"}) \
        .to_dict("records") == out.to_dict("records")


def test_decay_window_boundary_closed_then_open(tmp_path):
    """An order exactly horizon days old carries weight 1 (score ==
    its cents); one day older contributes NOTHING — the customer
    vanishes if that was their only order. A two-order customer
    accumulates exact power-of-two terms."""
    from jsonschema_ray.pipelines.relational import decay_spend_customers
    _orders_price_days(tmp_path, [
        (1, 3.50, 0),            # age 30 → weight 1 → 350
        (2, 999.99, -1),         # age 31 → outside, invisible
        (3, 1.00, 30), (3, 1.00, 28)])  # 100·2^30 + 100·2^28
    out = decay_spend_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"o_custkey": 3,
         "score_scaled": str(100 * ((1 << 30) + (1 << 28))),
         "n_window_orders": 2},
        {"o_custkey": 1, "score_scaled": "350",
         "n_window_orders": 1}]
    exp = _oracle(tmp_path, "decay_spend_customers")
    assert exp.astype({"o_custkey": "int64", "score_scaled": str,
                       "n_window_orders": "int64"}) \
        .to_dict("records") == out.to_dict("records")


def test_decay_null_price_does_not_shift_horizon(tmp_path):
    """A null-price order on a LATER day is invisible INCLUDING for
    the horizon: with it dropped, dmax stays at day 10 and the day-10
    order scores at full weight (2^30), not aged by the phantom."""
    from jsonschema_ray.pipelines.relational import decay_spend_customers
    _orders_price_days(tmp_path, [(1, 1.00, 10), (2, None, 40)])
    out = decay_spend_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"o_custkey": 1, "score_scaled": str(100 << 30),
         "n_window_orders": 1}]
    exp = _oracle(tmp_path, "decay_spend_customers")
    assert exp.astype({"o_custkey": "int64", "score_scaled": str,
                       "n_window_orders": "int64"}) \
        .to_dict("records") == out.to_dict("records")


def test_decay_topk_cutoff_and_empty(tmp_path):
    """25 customers with strictly decreasing spends → exactly 20 rows,
    the five smallest absent, order matching the oracle's LIMIT 20;
    an all-null corpus answers a typed empty frame."""
    from jsonschema_ray.pipelines.relational import decay_spend_customers
    _orders_price_days(tmp_path,
                       [(i, float(100 - i), 5) for i in range(1, 26)])
    out = decay_spend_customers(str(tmp_path))
    assert len(out) == 20
    assert out["o_custkey"].tolist() == list(range(1, 21))
    exp = _oracle(tmp_path, "decay_spend_customers")
    assert exp.astype({"o_custkey": "int64", "score_scaled": str,
                       "n_window_orders": "int64"}) \
        .to_dict("records") == out.to_dict("records")

    _orders_price_days(tmp_path, [(None, 1.0, 1), (1, None, None)])
    out = decay_spend_customers(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["o_custkey", "score_scaled",
                                 "n_window_orders"]
    assert out["o_custkey"].dtype == "int64"
    assert len(_oracle(tmp_path, "decay_spend_customers")) == 0


# ----------------------------------------------------------- trajectory

def test_trajectory_census_hand_cohort(tmp_path):
    """One corpus, five customers: strict riser [1,2,3], strict fader
    [5,3,1], constant [2,2], dip-recoverer [3,1,4] (endpoints say UP —
    spend_trend would call it a riser — the full-sequence census says
    NONE of the three), and a single-order customer counting nowhere:
    n_multi=4, inc=1, dec=1, const=1."""
    from jsonschema_ray.pipelines.relational import (
        trajectory_census_customers)
    _orders_price_days(tmp_path, [
        (1, 1.00, 0), (1, 2.00, 1), (1, 3.00, 2),
        (2, 5.00, 0), (2, 3.00, 1), (2, 1.00, 2),
        (3, 2.00, 0), (3, 2.00, 1),
        (4, 3.00, 0), (4, 1.00, 1), (4, 4.00, 2),
        (5, 9.00, 0)])
    out = trajectory_census_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_multi": 4, "n_increasing": 1, "n_decreasing": 1,
         "n_constant": 1}]
    exp = _oracle(tmp_path, "trajectory_census_customers")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")


def test_trajectory_strictness_and_sameday_order(tmp_path):
    """A repeated amount anywhere breaks BOTH strict arms ([2,2,3] is
    not increasing, not constant — it counts only in n_multi); two
    SAME-DAY orders resolve by orderkey ascending, so ok1=$5, ok2=$3
    is a strict fader on both engines (flip the keys and it would be
    a riser — the tiebreak is load-bearing)."""
    from jsonschema_ray.pipelines.relational import (
        trajectory_census_customers)
    _orders_price_days(tmp_path, [
        (1, 2.00, 0), (1, 2.00, 1), (1, 3.00, 2),
        (2, 5.00, 7), (2, 3.00, 7)])
    out = trajectory_census_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_multi": 2, "n_increasing": 0, "n_decreasing": 1,
         "n_constant": 0}]
    exp = _oracle(tmp_path, "trajectory_census_customers")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")


def test_trajectory_empty_answers_zeros_row(tmp_path):
    """The answer is ALWAYS one row: an empty cleaned corpus answers
    all zeros (SQL's ungrouped aggregate over zero rows), not an
    empty frame — pinned against the oracle."""
    from jsonschema_ray.pipelines.relational import (
        trajectory_census_customers)
    _orders_price_days(tmp_path, [(None, 1.0, 0), (1, None, 1),
                                  (2, 3.0, None)])
    out = trajectory_census_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_multi": 0, "n_increasing": 0, "n_decreasing": 0,
         "n_constant": 0}]
    exp = _oracle(tmp_path, "trajectory_census_customers")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")


def _events_tv(tmp_path, rows):
    """rows: (event_id|None, event_type|None, ts_minutes|None,
    value|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([None if r[2] is None else r[2] * MIN
                        for r in rows], pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64())}))


# ----------------------------------------------------------------- twap

def _twap_oracle_match(tmp_path, out):
    exp = _oracle(tmp_path, "twap_value_by_type")
    assert len(exp) == len(out)
    for k in range(len(out)):
        for c in ("event_type", "n_events", "span_us",
                  "twap_num_scaled"):
            assert exp.loc[k, c] == out.loc[k, c], (c, k)
        a, b = exp.loc[k, "twap"], out.loc[k, "twap"]
        assert (pd.isna(a) and pd.isna(b)) or a == b


def test_twap_line_is_midpoint(tmp_path):
    """v=2.0 at t=0 and v=4.0 at t=10min: the trapezoid of a straight
    line is its midpoint — twap EXACTLY 3.0, numerator exactly
    (2e6+4e6)·6e8 = 3.6e15 as a decimal string."""
    from jsonschema_ray.pipelines.relational import twap_value_by_type
    _events_tv(tmp_path, [(1, "a", 0, 2.0), (2, "a", 10, 4.0)])
    out = twap_value_by_type(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "a", "n_events": 2, "span_us": 600_000_000,
         "twap_num_scaled": "3600000000000000", "twap": 3.0}]
    _twap_oracle_match(tmp_path, out)


def test_twap_burst_sampling_differs_from_avg(tmp_path):
    """v=1.0 held for 90 minutes then a 10-minute ramp to 5.0: plain
    AVG reads 7/3 ≈ 2.33 (the late burst of samples dominates), TWAP
    reads exactly 1.2 — the reason the integral form exists."""
    from jsonschema_ray.pipelines.relational import twap_value_by_type
    _events_tv(tmp_path, [(1, "a", 0, 1.0), (2, "a", 90, 1.0),
                          (3, "a", 100, 5.0)])
    out = twap_value_by_type(str(tmp_path))
    assert out.loc[0, "twap"] == 1.2
    assert out.loc[0, "twap_num_scaled"] == str(
        (1_000_000 + 1_000_000) * 90 * MIN
        + (1_000_000 + 5_000_000) * 10 * MIN)
    _twap_oracle_match(tmp_path, out)


def test_twap_zero_duration_spike_tie_order(tmp_path):
    """Two events at the SAME µs (a zero-duration spike): the
    (ts, event_id) tie order decides which value bridges the next
    interval. id1(v=0) then id2(v=10) at t=0, id3(v=0) at t=10min:
    the spike pair contributes 0 (dt=0) and v=10 bridges the gap →
    twap exactly 5.0; flipped ids would answer 0.0 — both engines
    must pick the same pairing."""
    from jsonschema_ray.pipelines.relational import twap_value_by_type
    _events_tv(tmp_path, [(1, "a", 0, 0.0), (2, "a", 0, 10.0),
                          (3, "a", 10, 0.0)])
    out = twap_value_by_type(str(tmp_path))
    assert out.loc[0, "twap"] == 5.0
    _twap_oracle_match(tmp_path, out)


def test_twap_single_event_null_and_invisible_rows(tmp_path):
    """A single-event type keeps its row — span 0, numerator \"0\",
    SQL-NULL twap (0/0) — beside a normal type; a null-event_id row
    is invisible (the equidepth id discipline); an all-invalid corpus
    answers a typed empty frame."""
    from jsonschema_ray.pipelines.relational import twap_value_by_type
    _events_tv(tmp_path, [(1, "lone", 5, 7.5),
                          (2, "b", 0, 1.0), (3, "b", 10, 3.0),
                          (None, "b", 5, 99.0)])
    out = twap_value_by_type(str(tmp_path))
    assert out.to_dict("records")[0] == {
        "event_type": "b", "n_events": 2, "span_us": 600_000_000,
        "twap_num_scaled": str(4_000_000 * 600_000_000), "twap": 2.0}
    lone = out.to_dict("records")[1]
    assert lone["event_type"] == "lone" and lone["n_events"] == 1
    assert lone["span_us"] == 0 and lone["twap_num_scaled"] == "0"
    assert pd.isna(lone["twap"])
    _twap_oracle_match(tmp_path, out)

    _events_tv(tmp_path, [(1, None, 0, 1.0), (2, "a", None, 1.0),
                          (3, "a", 1, None)])
    out = twap_value_by_type(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["event_type", "n_events", "span_us",
                                 "twap_num_scaled", "twap"]
    assert len(_oracle(tmp_path, "twap_value_by_type")) == 0


def _embeddings(tmp_path, rows, dim=64):
    """rows: (vec_id|None, [leading components]|None) — padded with
    zeros to ``dim`` float32 components."""
    vecs = []
    for _, v in rows:
        if v is None:
            vecs.append(None)
        else:
            vecs.append(list(v) + [0.0] * (dim - len(v)))
    _write(tmp_path, "embeddings", pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32())}))


# ------------------------------------------------------------------ mmr

def test_mmr_diversity_flips_second_pick(tmp_path):
    """q=[1,0] with candidates v2=[.8,.6], v3=[.78,−.62], v4=[.79,.61]:
    plain relevance ranks v4 second (7.9e11 > 7.8e11) but v4 is
    nearly parallel to the already-picked v2 (penalty 9.98e11) while
    v3 points away (penalty 2.52e11) — MMR picks v3 second with
    mmr_x2 exactly 5.28e11 and relegates v4 to rank 3 at −2.08e11.
    All values are hand-derived exact integer dots of the 1e6-scaled
    components; rank 1 carries the raw relevance 8e11 (no penalty
    term exists yet)."""
    from jsonschema_ray.pipelines.relational import mmr_rerank_embeddings
    _embeddings(tmp_path, [(1, [1.0, 0.0]), (2, [0.8, 0.6]),
                           (3, [0.78, -0.62]), (4, [0.79, 0.61])])
    out = mmr_rerank_embeddings(str(tmp_path))
    q1 = out[out["query_id"] == 1].to_dict("records")
    assert q1 == [
        {"query_id": 1, "rank": 1, "vec_id": 2,
         "mmr_x2": 800_000_000_000},
        {"query_id": 1, "rank": 2, "vec_id": 3,
         "mmr_x2": 528_000_000_000},
        {"query_id": 1, "rank": 3, "vec_id": 4,
         "mmr_x2": -208_000_000_000}]
    exp = _oracle(tmp_path, "mmr_rerank_embeddings")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")


def test_mmr_self_exclusion_and_degrade(tmp_path):
    """Each query is excluded from its own candidate set (a vector's
    best match is always itself); a 3-vector corpus degrades to two
    ranks per query; an orthogonal pick's penalty goes through the
    exact integer dot (q1: rank1 v3 at 6e11, rank2 v2 at 0 − 8e11)."""
    from jsonschema_ray.pipelines.relational import mmr_rerank_embeddings
    _embeddings(tmp_path, [(1, [1.0, 0.0]), (2, [0.0, 1.0]),
                           (3, [0.6, 0.8])])
    out = mmr_rerank_embeddings(str(tmp_path))
    assert not ((out["query_id"] == out["vec_id"]).any())
    assert out.groupby("query_id").size().tolist() == [2, 2]
    q1 = out[out["query_id"] == 1].to_dict("records")
    assert q1 == [
        {"query_id": 1, "rank": 1, "vec_id": 3,
         "mmr_x2": 600_000_000_000},
        {"query_id": 1, "rank": 2, "vec_id": 2,
         "mmr_x2": -800_000_000_000}]
    exp = _oracle(tmp_path, "mmr_rerank_embeddings")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")


def test_mmr_null_rows_and_empty(tmp_path):
    """A null-embedding row is invisible (not a candidate, not a
    query); a one-vector corpus has no candidates at all and answers
    a typed empty frame on both engines."""
    from jsonschema_ray.pipelines.relational import mmr_rerank_embeddings
    _embeddings(tmp_path, [(1, [1.0, 0.0]), (2, None),
                           (3, [0.0, 1.0])])
    out = mmr_rerank_embeddings(str(tmp_path))
    assert sorted(out["query_id"].unique().tolist()) == [1, 3]
    assert 2 not in out["vec_id"].tolist()
    exp = _oracle(tmp_path, "mmr_rerank_embeddings")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")

    _embeddings(tmp_path, [(1, [1.0, 0.0])])
    out = mmr_rerank_embeddings(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["query_id", "rank", "vec_id",
                                 "mmr_x2"]
    assert out["mmr_x2"].dtype == "int64"
    assert len(_oracle(tmp_path, "mmr_rerank_embeddings")) == 0


# -------------------------------------------------------------- leadlag

def test_leadlag_shifted_copy_is_directional(tmp_path):
    """b is a one-day-shifted copy of a (a=[1,5,2,4]; b zero-filled
    day 0 then [1,5,2]): a→b answers r = 1.0 EXACTLY (x and y are the
    same vector), while b→a answers r = 0.0 EXACTLY (the moments
    cancel: 3·22 − 6·11 = 0) — the direction of causation is visible
    and both endpoints are exact-rational outcomes, not approximate
    floats. b's zero-filled day 0 participates in the b→a vector
    [0,1,5]: drop the zero-fill and both numbers change."""
    from jsonschema_ray.pipelines.relational import leadlag_daily_events
    _events_type_days(tmp_path, {
        "a": {0: 1, 1: 5, 2: 2, 3: 4},
        "b": {1: 1, 2: 5, 3: 2}})
    out = leadlag_daily_events(str(tmp_path))
    recs = {(r["type_lead"], r["type_follow"]):
            (r["n_pairs"], r["r"]) for r in out.to_dict("records")}
    assert recs[("a", "b")] == (3, 1.0)
    assert recs[("b", "a")] == (3, 0.0)
    exp = _oracle(tmp_path, "leadlag_daily_events")
    assert exp.astype({"n_pairs": "int64"}).to_dict("records") \
        == out.to_dict("records")


def test_leadlag_constant_series_null_rows_kept(tmp_path):
    """A constant type has zero variance: both of its pair rows stay
    (n_pairs intact) with SQL-NULL r on both engines."""
    from jsonschema_ray.pipelines.relational import leadlag_daily_events
    _events_type_days(tmp_path, {
        "c": {0: 3, 1: 3, 2: 3},
        "v": {0: 1, 1: 2, 2: 5}})
    out = leadlag_daily_events(str(tmp_path))
    recs = {(r["type_lead"], r["type_follow"]): r
            for r in out.to_dict("records")}
    assert len(out) == 2
    assert recs[("c", "v")]["n_pairs"] == 2
    assert pd.isna(recs[("c", "v")]["r"])
    assert pd.isna(recs[("v", "c")]["r"])
    exp = _oracle(tmp_path, "leadlag_daily_events")
    assert len(exp) == 2 and exp["r"].isna().all()


def test_leadlag_degenerate_grids_empty(tmp_path):
    """A single observed day has no d+1 (typed empty frame), as does
    a single-type corpus (no ordered pair exists)."""
    from jsonschema_ray.pipelines.relational import leadlag_daily_events
    _events_type_days(tmp_path, {"a": {5: 2}, "b": {5: 3}})
    out = leadlag_daily_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["type_lead", "type_follow",
                                 "n_pairs", "r"]
    assert len(_oracle(tmp_path, "leadlag_daily_events")) == 0

    _events_type_days(tmp_path, {"a": {0: 1, 1: 2, 2: 3}})
    out = leadlag_daily_events(str(tmp_path))
    assert len(out) == 0
    assert len(_oracle(tmp_path, "leadlag_daily_events")) == 0


def _customers_qi(tmp_path, rows):
    """rows: (c_nationkey|None, c_mktsegment|None)."""
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array(range(1, len(rows) + 1), pa.int64()),
        "c_nationkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_mktsegment": pa.array([r[1] for r in rows], pa.string())}))


# ------------------------------------------------------------ anonymity

def test_k_anonymity_null_is_a_class(tmp_path):
    """Classes (1,A)×5, (1,B)×2, (NULL,A)×1: the NULL-nationkey row is
    a REAL class (an attacker sees a null too — SQL GROUP BY
    semantics, no row excluded): 8 rows, 3 classes, k_min 1, two
    classes below 5 holding 3 at-risk rows."""
    from jsonschema_ray.pipelines.relational import k_anonymity_customers
    _customers_qi(tmp_path, [(1, "A")] * 5 + [(1, "B")] * 2
                  + [(None, "A")])
    out = k_anonymity_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_rows": 8, "n_classes": 3, "k_min": 1.0,
         "n_classes_below": 2, "n_rows_at_risk": 3}]
    exp = _oracle(tmp_path, "k_anonymity_customers")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_k_anonymity_clean_release_and_empty(tmp_path):
    """Every class at or above k → zero below, zero at risk (the
    release passes); an empty table answers the SQL ungrouped-
    aggregate row with NULL k_min, not an empty frame."""
    from jsonschema_ray.pipelines.relational import k_anonymity_customers
    _customers_qi(tmp_path, [(1, "A")] * 5 + [(2, "B")] * 6)
    out = k_anonymity_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_rows": 11, "n_classes": 2, "k_min": 5.0,
         "n_classes_below": 0, "n_rows_at_risk": 0}]
    exp = _oracle(tmp_path, "k_anonymity_customers")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")

    _customers_qi(tmp_path, [])
    out = k_anonymity_customers(str(tmp_path))
    assert len(out) == 1
    assert out.loc[0, "n_rows"] == 0 and out.loc[0, "n_classes"] == 0
    assert pd.isna(out.loc[0, "k_min"])
    exp = _oracle(tmp_path, "k_anonymity_customers")
    assert len(exp) == 1 and pd.isna(exp.loc[0, "k_min"])


# ---------------------------------------------------------- next action

def test_next_action_profile_hand_timeline(tmp_path):
    """User timeline A,B,A,C,A,B: prev A has 3 pairs over 2 next
    types, top B at exactly 2/3; B and C each deterministically lead
    to A at share 1.0."""
    from jsonschema_ray.pipelines.relational import (
        next_action_profile_events)
    types = ["A", "B", "A", "C", "A", "B"]
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, 7), pa.int64()),
        "user_id": pa.array([1] * 6, pa.int64()),
        "event_type": pa.array(types, pa.string()),
        "ts": pa.array([i * MIN for i in range(6)],
                       pa.timestamp("us"))}))
    out = next_action_profile_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"prev_type": "A", "n_pairs": 3, "n_next_types": 2,
         "top_next": "B", "top_n": 2, "top_share": 0.666667},
        {"prev_type": "B", "n_pairs": 1, "n_next_types": 1,
         "top_next": "A", "top_n": 1, "top_share": 1.0},
        {"prev_type": "C", "n_pairs": 1, "n_next_types": 1,
         "top_next": "A", "top_n": 1, "top_share": 1.0}]
    exp = _oracle(tmp_path, "next_action_profile_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_next_action_tie_null_bridge_and_empty(tmp_path):
    """A count tie picks the lexicographically smallest next type on
    both engines (A→B vs A→C at 1 each → B); a NULL-type event is
    removed BEFORE pairing (A,NULL,C yields A→C — the transitions
    contract); single-event users produce no pairs → typed empty
    frame."""
    from jsonschema_ray.pipelines.relational import (
        next_action_profile_events)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, 6), pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["A", "B", "A", "C", "Z"],
                               pa.string()),
        "ts": pa.array([i * MIN for i in range(5)],
                       pa.timestamp("us"))}))
    out = next_action_profile_events(str(tmp_path))
    a = out[out["prev_type"] == "A"].to_dict("records")[0]
    assert a["top_next"] == "B" and a["top_n"] == 1
    exp = _oracle(tmp_path, "next_action_profile_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")

    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array(["A", None, "C"], pa.string()),
        "ts": pa.array([0, MIN, 2 * MIN], pa.timestamp("us"))}))
    out = next_action_profile_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"prev_type": "A", "n_pairs": 1, "n_next_types": 1,
         "top_next": "C", "top_n": 1, "top_share": 1.0}]
    exp = _oracle(tmp_path, "next_action_profile_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")

    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 2], pa.int64()),
        "event_type": pa.array(["A", "B"], pa.string()),
        "ts": pa.array([0, MIN], pa.timestamp("us"))}))
    out = next_action_profile_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["prev_type", "n_pairs",
                                 "n_next_types", "top_next",
                                 "top_n", "top_share"]
    assert len(_oracle(tmp_path, "next_action_profile_events")) == 0


def _documents(tmp_path, rows):
    """rows: (doc_id|None, text|None)."""
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string())}))


def _winnow_expected(text, w=4):
    """The test's own independent winnowing: rightmost-min per full
    window over md5 low-64 token hashes, distinct positions."""
    toks = [t for t in text.split(" ") if t]
    hs = [int.from_bytes(hashlib.md5(t.encode()).digest()[:8],
                         "little") for t in toks]
    sel = {}
    for e in range(w - 1, len(hs)):
        win = hs[e - w + 1:e + 1]
        mn = min(win)
        # rightmost position attaining the min
        off = max(j for j in range(w) if win[j] == mn)
        sel[e - w + 1 + off] = mn
    return len(sel), sum(sel.values())


# --------------------------------------------------------------- winnow

def test_winnow_hand_doc_three_way(tmp_path):
    """A 6-token doc: the implementation, the test's own independent
    winnowing loop, and the DuckDB md5_number oracle agree on count
    and fingerprint sum — three separate derivations of the
    rightmost-min selection."""
    from jsonschema_ray.pipelines.relational import winnow_md5_documents
    text = "alpha beta gamma delta epsilon zeta"
    _documents(tmp_path, [(1, text)])
    n, s = _winnow_expected(text)
    out = winnow_md5_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"doc_id": 1, "n_fingerprints": n, "fp_sum": str(s)}]
    exp = _oracle(tmp_path, "winnow_md5_documents")
    assert exp.astype({"doc_id": "int64", "n_fingerprints": "int64",
                       "fp_sum": str}).to_dict("records") \
        == out.to_dict("records")


def test_winnow_all_equal_tokens_rightmost_rule(tmp_path):
    """'x x x x x': every window is all-ties — the rightmost rule
    selects positions 3 and 4, exactly 2 fingerprints summing 2·h(x).
    This pins the distinct-position collapse under MAXIMAL ties (a
    buggy per-window dedup would report 1 or 2·(windows)); the
    engines' agreement on WHICH positions win under mixed hashes is
    pinned by the three-way hand doc above."""
    from jsonschema_ray.pipelines.relational import winnow_md5_documents
    text = "x x x x x"
    _documents(tmp_path, [(7, text)])
    n, s = _winnow_expected(text)
    assert n == 2  # positions 3 and 4 under rightmost; any tie rule → 2
    out = winnow_md5_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"doc_id": 7, "n_fingerprints": 2, "fp_sum": str(s)}]
    exp = _oracle(tmp_path, "winnow_md5_documents")
    assert exp.astype({"doc_id": "int64", "n_fingerprints": "int64",
                       "fp_sum": str}).to_dict("records") \
        == out.to_dict("records")


def test_winnow_short_docs_absent_and_row_merge(tmp_path):
    """A 3-token row has no full window → doc ABSENT; a doc split
    across two rows fingerprints each row independently and SUMS the
    partials (windows never span rows); null doc_id/text invisible;
    nothing fingerprintable → typed empty frame."""
    from jsonschema_ray.pipelines.relational import winnow_md5_documents
    t1 = "alpha beta gamma delta epsilon"
    t2 = "zeta eta theta iota"
    _documents(tmp_path, [(1, "a b c"), (2, t1), (2, t2),
                          (None, t1), (3, None)])
    n1, s1 = _winnow_expected(t1)
    n2, s2 = _winnow_expected(t2)
    out = winnow_md5_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"doc_id": 2, "n_fingerprints": n1 + n2,
         "fp_sum": str(s1 + s2)}]
    exp = _oracle(tmp_path, "winnow_md5_documents")
    assert exp.astype({"doc_id": "int64", "n_fingerprints": "int64",
                       "fp_sum": str}).to_dict("records") \
        == out.to_dict("records")

    _documents(tmp_path, [(1, "too short"), (None, t1)])
    out = winnow_md5_documents(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "n_fingerprints",
                                 "fp_sum"]
    assert len(_oracle(tmp_path, "winnow_md5_documents")) == 0


# ------------------------------------------------------------- iso week

def test_iso_week_year_boundary_footgun(tmp_path):
    """2014-12-29 (a Monday) belongs to ISO 2015-W01 and 2016-01-01
    (a Friday) to ISO 2015-W53 — the two boundary rows every naive
    '%W' bucketing misfiles; both engines must agree on the ISO
    rule (week 1 owns that week's Thursday)."""
    from datetime import date

    from jsonschema_ray.pipelines.relational import iso_week_volume_events
    d1 = (date(2014, 12, 29) - date(1970, 1, 1)).days
    d2 = (date(2016, 1, 1) - date(1970, 1, 1)).days
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([d1 * DAY, d2 * DAY], pa.timestamp("us"))}))
    out = iso_week_volume_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"iso_year": 2015, "iso_week": 1, "n_events": 1,
         "n_days": 1},
        {"iso_year": 2015, "iso_week": 53, "n_events": 1,
         "n_days": 1}]
    exp = _oracle(tmp_path, "iso_week_volume_events")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")


def test_iso_week_day_dedup_and_empty(tmp_path):
    """Two events on 1970-01-01 (a Thursday) plus one on the Friday
    (same ISO week 1) answer n_events=3, n_days=2 — the day dedup
    under a shared week; null ts invisible; all-null → typed empty
    frame. (The first draft used Sunday+Monday and the two engines
    agreed against the test: Jan 5 1970 opens ISO week 2.)"""
    from jsonschema_ray.pipelines.relational import iso_week_volume_events
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": pa.array([0, MIN, 1 * DAY, None],
                       pa.timestamp("us"))}))
    out = iso_week_volume_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"iso_year": 1970, "iso_week": 1, "n_events": 3,
         "n_days": 2}]
    exp = _oracle(tmp_path, "iso_week_volume_events")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")

    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1], pa.int64()),
        "user_id": pa.array([1], pa.int64()),
        "ts": pa.array([None], pa.timestamp("us"))}))
    out = iso_week_volume_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["iso_year", "iso_week", "n_events",
                                 "n_days"]
    assert len(_oracle(tmp_path, "iso_week_volume_events")) == 0


# ------------------------------------------------------------------ emd

def test_emd_two_band_shift_identity(tmp_path):
    """First half all in band 0, second half all two bands over: the
    EMD answers EXACTLY 2.0 band-widths — mass moved two bins —
    with the exact integer numerator 8 over n_a·n_b = 4. (KS on the
    same data reads 1.0 regardless of HOW FAR the mass moved; the
    distance-weighting is the point of EMD.)"""
    from jsonschema_ray.pipelines.relational import emd_value_halves_events
    _events_tv(tmp_path, [(1, "a", 0, 25.0), (2, "a", 1, 25.0),
                          (3, "a", 24 * 60, 125.0),
                          (4, "a", 24 * 60 + 1, 125.0)])
    out = emd_value_halves_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_first": 2, "n_second": 2, "emd_scaled": "8",
         "emd_bands": 2.0}]
    exp = _oracle(tmp_path, "emd_value_halves_events")
    assert exp.astype(str).to_dict("records") \
        == out.astype(str).to_dict("records")


def test_emd_support_exclusion_and_empty_half(tmp_path):
    """Values outside [0, 1000) are excluded (the value_bands support
    convention — 1000.0 itself is out); a single-day corpus puts
    everything in the first half and answers SQL-NULL emd with the
    counts still reported."""
    from jsonschema_ray.pipelines.relational import emd_value_halves_events
    _events_tv(tmp_path, [(1, "a", 0, 25.0), (2, "a", 1, 1000.0),
                          (3, "a", 24 * 60, -5.0),
                          (4, "a", 24 * 60 + 1, 500.0)])
    out = emd_value_halves_events(str(tmp_path))
    # mid = (0+1)//2 = 0 → day 0 first, day 1 second; 1000.0 and
    # −5.0 excluded → a = [25.0], b = [500.0]
    assert out.loc[0, "n_first"] == 1 and out.loc[0, "n_second"] == 1
    assert out.loc[0, "emd_bands"] == 10.0  # band 0 → band 10
    exp = _oracle(tmp_path, "emd_value_halves_events")
    assert exp.astype(str).to_dict("records") \
        == out.astype(str).to_dict("records")

    _events_tv(tmp_path, [(1, "a", 0, 25.0), (2, "a", 1, 30.0)])
    out = emd_value_halves_events(str(tmp_path))
    assert out.loc[0, "n_first"] == 2 and out.loc[0, "n_second"] == 0
    assert out.loc[0, "emd_scaled"] is None
    assert pd.isna(out.loc[0, "emd_bands"])
    exp = _oracle(tmp_path, "emd_value_halves_events")
    assert exp.loc[0, "emd_scaled"] is None or \
        pd.isna(exp.loc[0, "emd_scaled"])


# --------------------------------------------------- transition entropy

def test_transition_entropy_exact_anchors(tmp_path):
    """Entropy's two exactly-representable anchors in one corpus: a
    deterministic flow answers h = 0.0 (B always follows A's partner)
    and a perfect two-way split answers h = 1.0 exactly (p = 0.5 is
    a power of two — no float fuzz at either anchor). Timeline user1:
    A,B,A,C (A splits 1/1 → h=1.0); user2: C,A (C→A deterministic
    beside user1's A-then-C, making C's distribution {A:1} → 0.0);
    B's single pair answers 0.0."""
    from jsonschema_ray.pipelines.relational import (
        transition_entropy_events)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, 7), pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["A", "B", "A", "C", "C", "A"],
                               pa.string()),
        "ts": pa.array([i * MIN for i in range(6)],
                       pa.timestamp("us"))}))
    out = transition_entropy_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"prev_type": "A", "n_pairs": 2, "h_next": 1.0},
        {"prev_type": "B", "n_pairs": 1, "h_next": 0.0},
        {"prev_type": "C", "n_pairs": 1, "h_next": 0.0}]
    exp = _oracle(tmp_path, "transition_entropy_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_transition_entropy_null_bridge_and_empty(tmp_path):
    """A, NULL, B yields the A→B pair (the transitions null-bridging
    contract flows through the entropy); no transition anywhere →
    typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        transition_entropy_events)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array(["A", None, "B"], pa.string()),
        "ts": pa.array([0, MIN, 2 * MIN], pa.timestamp("us"))}))
    out = transition_entropy_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"prev_type": "A", "n_pairs": 1, "h_next": 0.0}]
    exp = _oracle(tmp_path, "transition_entropy_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")

    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 2], pa.int64()),
        "event_type": pa.array(["A", "B"], pa.string()),
        "ts": pa.array([0, MIN], pa.timestamp("us"))}))
    out = transition_entropy_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["prev_type", "n_pairs", "h_next"]
    assert len(_oracle(tmp_path, "transition_entropy_events")) == 0


# ------------------------------------------------------ audience growth

def test_audience_growth_hand_curve(tmp_path):
    """Users 1,2 first appear day 0, user 3 on day 2: the curve is
    (day0: +2, cum 2), (day2: +1, cum 3) — day 1 is ABSENT (observed
    first-days, not a dense grid — SQL GROUP BY semantics); user 1's
    return visit on day 9 adds NOTHING (cumulative-distinct collapsed
    to first-day reduction)."""
    from jsonschema_ray.pipelines.relational import (
        audience_growth_daily_events)
    _events_ts_rows = [
        (1, 0), (2, 10), (3, 2 * 24 * 60), (1, 9 * 24 * 60)]
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, 5), pa.int64()),
        "user_id": pa.array([r[0] for r in _events_ts_rows],
                            pa.int64()),
        "ts": pa.array([r[1] * MIN for r in _events_ts_rows],
                       pa.timestamp("us"))}))
    out = audience_growth_daily_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"day": "1970-01-01", "new_users": 2, "cum_users": 2},
        {"day": "1970-01-03", "new_users": 1, "cum_users": 3}]
    exp = _oracle(tmp_path, "audience_growth_daily_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_audience_growth_null_ts_cannot_advance_and_empty(tmp_path):
    """A user's null-ts event is dropped BEFORE the min — it cannot
    make them 'appear' earlier (or at all: an only-null-ts user is
    absent); all-invalid corpus → typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        audience_growth_daily_events)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([None, 5 * DAY, None], pa.timestamp("us"))}))
    out = audience_growth_daily_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"day": "1970-01-06", "new_users": 1, "cum_users": 1}]
    exp = _oracle(tmp_path, "audience_growth_daily_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")

    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1], pa.int64()),
        "user_id": pa.array([None], pa.int64()),
        "ts": pa.array([0], pa.timestamp("us"))}))
    out = audience_growth_daily_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["day", "new_users", "cum_users"]
    assert len(_oracle(tmp_path,
                       "audience_growth_daily_events")) == 0


# ----------------------------------------------------------------- bm25

def test_bm25_ranking_saturation_and_tie(tmp_path):
    """d1='the cat', d2='the dog', d3='the the the the',
    d4='the cat dog', d5='zzz yyy': query terms resolve to
    [the, cat, dog] (df desc, term asc). The ranking tells the BM25
    story in four rows: d4 tops (matches all three), d1 and d2 tie
    EXACTLY (identical tf/dl arithmetic — the doc_id tiebreak is
    load-bearing, d1 first), and d3's four-fold tf-stuffing of the
    common term still loses to one rare-term match (saturation +
    idf); d5 matches nothing and is ABSENT. Scores equal the oracle's
    at 6dp."""
    from jsonschema_ray.pipelines.relational import bm25_topk_documents
    _documents(tmp_path, [(1, "the cat"), (2, "the dog"),
                          (3, "the the the the"),
                          (4, "the cat dog"), (5, "zzz yyy")])
    out = bm25_topk_documents(str(tmp_path))
    assert out["doc_id"].tolist() == [4, 1, 2, 3]
    assert out["rank"].tolist() == [1, 2, 3, 4]
    assert out.loc[1, "score"] == out.loc[2, "score"]  # exact tie
    exp = _oracle(tmp_path, "bm25_topk_documents")
    assert exp.astype({"doc_id": "int64", "score": "float64",
                       "rank": "int64"}).to_dict("records") \
        == out.to_dict("records")


def test_bm25_topk_cutoff_and_empty(tmp_path):
    """With 15 docs each containing the query term once, only the
    top-10 (dl-ascending, then doc_id) survive the cutoff; an empty
    cleaned corpus answers a typed empty frame."""
    from jsonschema_ray.pipelines.relational import bm25_topk_documents
    docs = [(i, "common " + " ".join(["pad"] * i))
            for i in range(1, 16)]
    _documents(tmp_path, docs)
    out = bm25_topk_documents(str(tmp_path))
    assert len(out) == 10
    exp = _oracle(tmp_path, "bm25_topk_documents")
    assert exp.astype({"doc_id": "int64", "score": "float64",
                       "rank": "int64"}).to_dict("records") \
        == out.to_dict("records")

    _documents(tmp_path, [(1, None), (None, "x y z w")])
    out = bm25_topk_documents(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["doc_id", "score", "rank"]
    assert len(_oracle(tmp_path, "bm25_topk_documents")) == 0


# -------------------------------------------------------- gap quantiles

def test_gap_quantiles_hand_and_disc_convention(tmp_path):
    """One user, type a at minutes [0,10,30,60]: gaps [10,20,30] min →
    n=3, p50 = sorted[ceil(1.5)−1] = 20 min, p90 = sorted[ceil(2.7)−1]
    = 30 min — the quantile_disc ceil(q·n)−1 convention on exact µs
    ints, no interpolation, no float."""
    from jsonschema_ray.pipelines.relational import gap_quantiles_by_type
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1] * 4, pa.int64()),
        "event_type": pa.array(["a"] * 4, pa.string()),
        "ts": pa.array([0, 10 * MIN, 30 * MIN, 60 * MIN],
                       pa.timestamp("us"))}))
    out = gap_quantiles_by_type(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "a", "n_gaps": 3, "p50_us": 20 * MIN,
         "p90_us": 30 * MIN}]
    exp = _oracle(tmp_path, "gap_quantiles_by_type")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_gap_quantiles_user_and_type_boundaries(tmp_path):
    """Gaps never span users (user 2's event between user 1's two
    does not split their gap) and never span types (an interleaved
    type-b event is invisible to type a's timeline — a's single gap
    runs straight over it); a type whose users all have one event is
    ABSENT."""
    from jsonschema_ray.pipelines.relational import gap_quantiles_by_type
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([1, 2, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "a", "c"],
                               pa.string()),
        "ts": pa.array([0, 5 * MIN, 7 * MIN, 20 * MIN, 9 * MIN],
                       pa.timestamp("us"))}))
    out = gap_quantiles_by_type(str(tmp_path))
    # user 1 type a: gap 20 min (straight over the type-b event and
    # user 2's events); types b (one event) and c (one event) absent
    assert out.to_dict("records") == [
        {"event_type": "a", "n_gaps": 1, "p50_us": 20 * MIN,
         "p90_us": 20 * MIN}]
    exp = _oracle(tmp_path, "gap_quantiles_by_type")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_gap_quantiles_zero_gaps_and_empty(tmp_path):
    """Equal timestamps contribute gap 0 (any tie order — the gap is
    0 regardless); an all-single-event corpus answers a typed empty
    frame on both engines."""
    from jsonschema_ray.pipelines.relational import gap_quantiles_by_type
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "event_type": pa.array(["a", "a", "a"], pa.string()),
        "ts": pa.array([5 * MIN, 5 * MIN, 5 * MIN],
                       pa.timestamp("us"))}))
    out = gap_quantiles_by_type(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "a", "n_gaps": 2, "p50_us": 0, "p90_us": 0}]
    exp = _oracle(tmp_path, "gap_quantiles_by_type")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")

    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 2], pa.int64()),
        "event_type": pa.array(["a", "a"], pa.string()),
        "ts": pa.array([0, MIN], pa.timestamp("us"))}))
    out = gap_quantiles_by_type(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["event_type", "n_gaps", "p50_us",
                                 "p90_us"]
    assert len(_oracle(tmp_path, "gap_quantiles_by_type")) == 0


def _lineitem_brand(tmp_path, parts, lines):
    """parts: (p_partkey, p_brand); lines: (l_orderkey, l_linenumber,
    l_partkey|None, l_extendedprice|None)."""
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([p[0] for p in parts], pa.int64()),
        "p_brand": pa.array([p[1] for p in parts], pa.string())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([r[0] for r in lines], pa.int64()),
        "l_linenumber": pa.array([r[1] for r in lines], pa.int64()),
        "l_partkey": pa.array([r[2] for r in lines], pa.int64()),
        "l_extendedprice": pa.array([r[3] for r in lines],
                                    pa.float64())}))


# ------------------------------------------------------ price quantiles

def test_price_quantiles_hand_and_unknown_part(tmp_path):
    """Brand A prices [1, 2, 3, 4, 100]: disc p50 = 3.00 (the
    ceil(2.5)−1 pick) and p90 = 100.00 (ceil(4.5)−1 = index 4) — the
    outlier line IS the p90, exactly, no interpolation; a line whose
    partkey is not in part is invisible (inner-join semantics); a
    second one-line brand answers p50 == p90 == its price."""
    from jsonschema_ray.pipelines.relational import (
        price_quantiles_by_brand)
    _lineitem_brand(
        tmp_path, [(1, "A"), (2, "B")],
        [(10, 1, 1, 1.00), (10, 2, 1, 2.00), (11, 1, 1, 3.00),
         (11, 2, 1, 4.00), (12, 1, 1, 100.00),
         (13, 1, 2, 7.50), (14, 1, 999, 5.00)])
    out = price_quantiles_by_brand(str(tmp_path))
    assert out.to_dict("records") == [
        {"p_brand": "A", "n_lines": 5, "p50_cents": 300,
         "p90_cents": 10000},
        {"p_brand": "B", "n_lines": 1, "p50_cents": 750,
         "p90_cents": 750}]
    exp = _oracle(tmp_path, "price_quantiles_by_brand")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_price_quantiles_nulls_and_empty(tmp_path):
    """Null partkey/price rows invisible; nothing attachable → typed
    empty frame on both engines."""
    from jsonschema_ray.pipelines.relational import (
        price_quantiles_by_brand)
    _lineitem_brand(tmp_path, [(1, "A")],
                    [(10, 1, None, 2.0), (10, 2, 1, None)])
    out = price_quantiles_by_brand(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["p_brand", "n_lines", "p50_cents",
                                 "p90_cents"]
    assert len(_oracle(tmp_path, "price_quantiles_by_brand")) == 0


def _events_user_months(tmp_path, rows):
    """rows: (user_id, month_index) — one event on the first day of
    month_index months after 1970-01 (plus optional extra same-month
    events via repeated rows)."""
    from datetime import date
    ts = []
    for _, m in rows:
        d = date(1970 + m // 12, m % 12 + 1, 1)
        ts.append((d - date(1970, 1, 1)).days * DAY)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us"))}))


# ---------------------------------------------------- growth accounting

def test_growth_accounting_full_story(tmp_path):
    """u1 active months [0,1,3], u2 [0], u3 [1]: the four-month grid
    tells the whole framework in one corpus — m0 all-new; m1 one
    retained + one new with u2's churn falling out of the identity
    (active(m0) − retained(m1) = 1); m2 is a ZERO-FILL month whose
    row still appears and carries the total loss (churned 2); m3 is
    u1's resurrection (not new — the first-ever month is sticky).
    Every row satisfies active = new + retained + resurrected on
    both engines."""
    from jsonschema_ray.pipelines.relational import (
        growth_accounting_monthly_events)
    _events_user_months(tmp_path, [(1, 0), (1, 1), (1, 3),
                                   (2, 0), (3, 1)])
    out = growth_accounting_monthly_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"month": "1970-01", "n_active": 2, "n_new": 2,
         "n_retained": 0, "n_resurrected": 0, "n_churned": 0},
        {"month": "1970-02", "n_active": 2, "n_new": 1,
         "n_retained": 1, "n_resurrected": 0, "n_churned": 1},
        {"month": "1970-03", "n_active": 0, "n_new": 0,
         "n_retained": 0, "n_resurrected": 0, "n_churned": 2},
        {"month": "1970-04", "n_active": 1, "n_new": 0,
         "n_retained": 0, "n_resurrected": 1, "n_churned": 0}]
    exp = _oracle(tmp_path, "growth_accounting_monthly_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_growth_accounting_year_boundary_and_dedup(tmp_path):
    """Dec 1970 → Jan 1971 is CONSECUTIVE (the year·12+month index —
    a naive month()-only key would break retention every January);
    five events in one month count the user once (the distinct
    discipline)."""
    from jsonschema_ray.pipelines.relational import (
        growth_accounting_monthly_events)
    _events_user_months(tmp_path, [(1, 11)] * 5 + [(1, 12)])
    out = growth_accounting_monthly_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"month": "1970-12", "n_active": 1, "n_new": 1,
         "n_retained": 0, "n_resurrected": 0, "n_churned": 0},
        {"month": "1971-01", "n_active": 1, "n_new": 0,
         "n_retained": 1, "n_resurrected": 0, "n_churned": 0}]
    exp = _oracle(tmp_path, "growth_accounting_monthly_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_growth_accounting_nulls_and_empty(tmp_path):
    """Null user/ts rows invisible; an all-invalid corpus answers a
    typed empty frame on both engines."""
    from jsonschema_ray.pipelines.relational import (
        growth_accounting_monthly_events)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([None, 1], pa.int64()),
        "ts": pa.array([0, None], pa.timestamp("us"))}))
    out = growth_accounting_monthly_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["month", "n_active", "n_new",
                                 "n_retained", "n_resurrected",
                                 "n_churned"]
    assert len(_oracle(tmp_path,
                       "growth_accounting_monthly_events")) == 0


# ----------------------------------------------------------------- hill

def test_hill_hand_value_k2(tmp_path):
    """Spends [8,4,2,1] dollars with k=2 (direct call — the oracle
    pins the default k): x_ref = 200 cents, Σln = ln(800/200) +
    ln(400/200) = 3·ln2, α = 2/(3·ln2) ≈ 0.961797 at 6dp — the
    test's own independent arithmetic."""
    import math as m

    from jsonschema_ray.pipelines.relational import hill_tail_spend
    _orders_price_days(tmp_path, [(1, 8.0, 0), (2, 4.0, 0),
                                  (3, 2.0, 0), (4, 1.0, 0)])
    out = hill_tail_spend(str(tmp_path), k=2)
    assert out.loc[0, "n_cust"] == 4
    assert out.loc[0, "x_ref_cents"] == 200.0
    assert out.loc[0, "alpha"] == round(2.0 / (3.0 * m.log(2.0)), 6)


def test_hill_degenerate_arms_vs_oracle(tmp_path):
    """Fewer than k+1 customers → NULL alpha AND NaN x_ref (no tail
    to fit); an ALL-TIED top (60 equal spends) keeps x_ref but
    answers NULL alpha on BOTH engines — Σln = 0 is DuckDB's float
    x/0 NULL and Python's explicit guard, the pinned agreement."""
    from jsonschema_ray.pipelines.relational import hill_tail_spend
    _orders_price_days(tmp_path,
                       [(i, float(i), 0) for i in range(1, 11)])
    out = hill_tail_spend(str(tmp_path))
    assert out.loc[0, "n_cust"] == 10
    assert pd.isna(out.loc[0, "alpha"])
    assert pd.isna(out.loc[0, "x_ref_cents"])
    exp = _oracle(tmp_path, "hill_tail_spend")
    assert pd.isna(exp.loc[0, "alpha"])
    assert pd.isna(exp.loc[0, "x_ref_cents"])
    assert int(exp.loc[0, "n_cust"]) == 10

    _orders_price_days(tmp_path,
                       [(i, 5.0, 0) for i in range(1, 61)])
    out = hill_tail_spend(str(tmp_path))
    assert out.loc[0, "x_ref_cents"] == 500.0
    assert pd.isna(out.loc[0, "alpha"])
    exp = _oracle(tmp_path, "hill_tail_spend")
    assert exp.loc[0, "x_ref_cents"] == 500.0
    assert pd.isna(exp.loc[0, "alpha"])


def test_hill_exact_boundary_51(tmp_path):
    """Exactly k+1 = 51 distinct customers is enough to fit: alpha
    computes and matches the oracle."""
    from jsonschema_ray.pipelines.relational import hill_tail_spend
    _orders_price_days(tmp_path,
                       [(i, float(100 + i), 0) for i in range(1, 52)])
    out = hill_tail_spend(str(tmp_path))
    assert not pd.isna(out.loc[0, "alpha"])
    exp = _oracle(tmp_path, "hill_tail_spend")
    assert exp.astype(str).to_dict("records") \
        == out.astype(str).to_dict("records")


# ---------------------------------------------------------------- anova

def test_anova_hand_separation_and_eta(tmp_path):
    """Two perfectly separated groups a=[1,1], b=[3,3]: SSW = 0 →
    F is SQL-NULL (infinite separation has no finite F) while η² = 1.0
    exactly (ALL variance is between groups) — the two statistics
    must disagree about degeneracy in exactly this way on both
    engines. Then a=[1,2] vs b=[3,4]: SSB = 4, SSW = 1, SST = 5 →
    F = (4/1)/(1/2) = 8.0 exactly, η² = 4/5 = 0.8 exactly. (The
    first draft computed η² = 4/4.5 by hand and the two engines
    agreed against it — which is the point of writing oracles.)"""
    from jsonschema_ray.pipelines.relational import anova_value_by_type
    _events_tv(tmp_path, [(1, "a", 0, 1.0), (2, "a", 1, 1.0),
                          (3, "b", 2, 3.0), (4, "b", 3, 3.0)])
    out = anova_value_by_type(str(tmp_path))
    assert out.loc[0, "k_groups"] == 2 and out.loc[0, "n_rows"] == 4
    assert pd.isna(out.loc[0, "f_stat"])
    assert out.loc[0, "eta_sq"] == 1.0
    exp = _oracle(tmp_path, "anova_value_by_type")
    assert pd.isna(exp.loc[0, "f_stat"])
    assert exp.loc[0, "eta_sq"] == 1.0

    _events_tv(tmp_path, [(1, "a", 0, 1.0), (2, "a", 1, 2.0),
                          (3, "b", 2, 3.0), (4, "b", 3, 4.0)])
    out = anova_value_by_type(str(tmp_path))
    assert out.loc[0, "f_stat"] == 8.0
    assert out.loc[0, "eta_sq"] == 0.8
    exp = _oracle(tmp_path, "anova_value_by_type")
    assert exp.astype(str).to_dict("records") \
        == out.astype(str).to_dict("records")


def test_anova_degenerate_arms(tmp_path):
    """One group (k < 2) → NULL F but η² still NULL too (SST may be
    positive yet SSB is zero — η² = 0.0 actually: pinned); all values
    identical everywhere → NULL F AND NULL η² (SST = 0); empty
    cleaned corpus → the zeros row with both NULL."""
    from jsonschema_ray.pipelines.relational import anova_value_by_type
    _events_tv(tmp_path, [(1, "a", 0, 1.0), (2, "a", 1, 5.0)])
    out = anova_value_by_type(str(tmp_path))
    assert pd.isna(out.loc[0, "f_stat"])
    assert out.loc[0, "eta_sq"] == 0.0
    exp = _oracle(tmp_path, "anova_value_by_type")
    assert pd.isna(exp.loc[0, "f_stat"])
    assert exp.loc[0, "eta_sq"] == 0.0

    _events_tv(tmp_path, [(1, "a", 0, 2.0), (2, "b", 1, 2.0)])
    out = anova_value_by_type(str(tmp_path))
    assert pd.isna(out.loc[0, "f_stat"])
    assert pd.isna(out.loc[0, "eta_sq"])
    exp = _oracle(tmp_path, "anova_value_by_type")
    assert pd.isna(exp.loc[0, "f_stat"])
    assert pd.isna(exp.loc[0, "eta_sq"])

    _events_tv(tmp_path, [(1, None, 0, 1.0), (2, "a", 1, None)])
    out = anova_value_by_type(str(tmp_path))
    assert out.loc[0, "k_groups"] == 0 and out.loc[0, "n_rows"] == 0
    assert pd.isna(out.loc[0, "f_stat"])
    exp = _oracle(tmp_path, "anova_value_by_type")
    assert int(exp.loc[0, "k_groups"]) == 0
    assert pd.isna(exp.loc[0, "f_stat"])


def _documents_lengths(tmp_path, rows):
    """rows: (doc_id|None, n_chars|None)."""
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array(["x"] * len(rows), pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([r[1] for r in rows], pa.int64())}))


# ---------------------------------------------------------- length gini

def test_length_gini_hand_and_zero_rows(tmp_path):
    """Lengths [100, 300] → G = 0.25 exactly (the session-18 gini
    hand case transplanted to the length axis — same exact-int
    kernel, second consumer); adding a ZERO-length doc changes the
    answer ([0,100,300]: G = (2·(100·2+300·3) − 4·400)/(3·400) =
    (2200−1600)/1200 = 0.5) — empty docs are real rows that shift
    the rank weights, not droppable noise."""
    from jsonschema_ray.pipelines.relational import length_gini_documents
    _documents_lengths(tmp_path, [(1, 100), (2, 300)])
    out = length_gini_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_docs": 2, "total_chars": "400", "gini": 0.25}]
    exp = _oracle(tmp_path, "length_gini_documents")
    assert exp.astype(str).to_dict("records") \
        == out.astype(str).to_dict("records")

    _documents_lengths(tmp_path, [(1, 100), (2, 300), (3, 0)])
    out = length_gini_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_docs": 3, "total_chars": "400", "gini": 0.5}]
    exp = _oracle(tmp_path, "length_gini_documents")
    assert exp.astype(str).to_dict("records") \
        == out.astype(str).to_dict("records")


def test_length_gini_all_empty_docs_and_nulls(tmp_path):
    """A corpus of ONLY zero-length docs answers SQL-NULL gini with
    the count reported; null doc_id/n_chars rows invisible; no docs
    → typed empty frame."""
    from jsonschema_ray.pipelines.relational import length_gini_documents
    _documents_lengths(tmp_path, [(1, 0), (2, 0), (None, 50),
                                  (3, None)])
    out = length_gini_documents(str(tmp_path))
    assert out.loc[0, "n_docs"] == 2
    assert out.loc[0, "total_chars"] == "0"
    assert pd.isna(out.loc[0, "gini"])
    exp = _oracle(tmp_path, "length_gini_documents")
    assert int(exp.loc[0, "n_docs"]) == 2
    assert pd.isna(exp.loc[0, "gini"])

    _documents_lengths(tmp_path, [(None, 5), (1, None)])
    out = length_gini_documents(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_docs", "total_chars", "gini"]
    assert len(_oracle(tmp_path, "length_gini_documents")) == 0


def _documents_src_lang(tmp_path, rows):
    """rows: (source|None, lang|None)."""
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(range(1, len(rows) + 1), pa.int64()),
        "text": pa.array(["x"] * len(rows), pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[0] for r in rows], pa.string())}))


# --------------------------------------------------------- lang entropy

def test_lang_entropy_anchors_and_null_lang(tmp_path):
    """The exact anchors in one corpus: a monolingual feed answers
    h = 0.0, a perfect 50/50 bilingual feed answers h = 1.0 EXACTLY
    (p = 0.5 is a power of two); a feed whose langs are half NULL
    counts ALL docs in n_docs but only labeled ones in n_langs and
    the entropy (aggregate-skips-null), and an all-null-lang feed
    answers h = 0.0 with n_langs 0 — entropy of the empty multiset,
    coalesced identically on both engines."""
    from jsonschema_ray.pipelines.relational import lang_entropy_by_source
    _documents_src_lang(tmp_path, [
        ("mono", "en"), ("mono", "en"), ("mono", "en"),
        ("bi", "en"), ("bi", "de"),
        ("halfnull", "fr"), ("halfnull", None),
        ("allnull", None), ("allnull", None)])
    out = lang_entropy_by_source(str(tmp_path))
    assert out.to_dict("records") == [
        {"source": "allnull", "n_docs": 2, "n_langs": 0,
         "h_lang": 0.0},
        {"source": "bi", "n_docs": 2, "n_langs": 2, "h_lang": 1.0},
        {"source": "halfnull", "n_docs": 2, "n_langs": 1,
         "h_lang": 0.0},
        {"source": "mono", "n_docs": 3, "n_langs": 1,
         "h_lang": 0.0}]
    exp = _oracle(tmp_path, "lang_entropy_by_source")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_lang_entropy_null_source_and_empty(tmp_path):
    """Null-source docs are invisible entirely (not a group — unlike
    null langs); an all-null-source corpus answers a typed empty
    frame on both engines."""
    from jsonschema_ray.pipelines.relational import lang_entropy_by_source
    _documents_src_lang(tmp_path, [(None, "en"), (None, "de")])
    out = lang_entropy_by_source(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["source", "n_docs", "n_langs",
                                 "h_lang"]
    assert len(_oracle(tmp_path, "lang_entropy_by_source")) == 0


# ------------------------------------------------------- band occupancy

def test_band_occupancy_duplicates_make_fat_buckets(tmp_path):
    """Two IDENTICAL 4-token docs share every band bucket (identical
    shingle sets → identical signatures) while a distinct third doc
    sits alone: every band answers one size-2 bucket and one size-1
    bucket — the dup shows up as occupancy, which is exactly what
    the health check looks for."""
    from jsonschema_ray.pipelines.relational import (
        band_occupancy_documents)
    _documents(tmp_path, [(1, "alpha beta gamma delta"),
                          (2, "alpha beta gamma delta"),
                          (3, "zeta eta theta iota")])
    out = band_occupancy_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"band": b, "bucket_size": s, "n_buckets": 1}
        for b in range(4) for s in (1, 2)]
    exp = _oracle(tmp_path, "band_occupancy_documents")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")


def test_band_occupancy_short_null_and_empty(tmp_path):
    """A 2-token doc has no 3-shingle and is absent; a null-id row is
    invisible (the _band_rows drop, mirrored by the SQL filter); an
    unshingleable corpus answers a typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        band_occupancy_documents)
    _documents(tmp_path, [(1, "alpha beta gamma"),
                          (2, "too short"),
                          (None, "alpha beta gamma")])
    out = band_occupancy_documents(str(tmp_path))
    # only doc 1 shingles → every band one size-1 bucket
    assert out.to_dict("records") == [
        {"band": b, "bucket_size": 1, "n_buckets": 1}
        for b in range(4)]
    exp = _oracle(tmp_path, "band_occupancy_documents")
    assert exp.astype("int64").to_dict("records") \
        == out.to_dict("records")

    _documents(tmp_path, [(1, "x y"), (2, None)])
    out = band_occupancy_documents(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["band", "bucket_size", "n_buckets"]
    assert len(_oracle(tmp_path, "band_occupancy_documents")) == 0


# ------------------------------------------------------------ top paths

def test_top_paths_order_matters_and_null_bridge(tmp_path):
    """User1 walks A,B,C twice and user2 walks B,A,C once: A→B→C
    counts 2, the overlapping B→C→A counts 1, B→A→C counts 1 — the
    trigram separates journeys the transition matrix cannot (A→B→C
    and B→A→C share pair counts); a NULL type inside user2's walk is
    removed BEFORE pairing (B, NULL, A, C still yields B→A→C); ties
    rank lexicographically."""
    from jsonschema_ray.pipelines.relational import top_paths_events
    types = ["A", "B", "C", "A", "B", "C"]
    u2 = ["B", None, "A", "C"]
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, len(types) + len(u2) + 1),
                             pa.int64()),
        "user_id": pa.array([1] * len(types) + [2] * len(u2),
                            pa.int64()),
        "event_type": pa.array(types + u2, pa.string()),
        "ts": pa.array([i * MIN for i in range(len(types))]
                       + [i * MIN for i in range(len(u2))],
                       pa.timestamp("us"))}))
    out = top_paths_events(str(tmp_path))
    recs = out.to_dict("records")
    assert recs[0] == {"step1": "A", "step2": "B", "step3": "C",
                       "n": 2}
    assert {"step1": "B", "step2": "A", "step3": "C", "n": 1} in recs
    exp = _oracle(tmp_path, "top_paths_events")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == recs


def test_top_paths_short_users_and_empty(tmp_path):
    """Users with fewer than 3 surviving events contribute nothing;
    a corpus of only such users answers a typed empty frame."""
    from jsonschema_ray.pipelines.relational import top_paths_events
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["A", "B", "C", "D"], pa.string()),
        "ts": pa.array([0, MIN, 0, MIN], pa.timestamp("us"))}))
    out = top_paths_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["step1", "step2", "step3", "n"]
    assert len(_oracle(tmp_path, "top_paths_events")) == 0


def _customers_seg(tmp_path, rows):
    """rows: (c_custkey, c_mktsegment|None)."""
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_mktsegment": pa.array([r[1] for r in rows],
                                 pa.string())}))


# ------------------------------------------------------ spend quantiles

def test_spend_quantiles_hand_and_inner_join(tmp_path):
    """Segment A spends [1,2,3,4,100] dollars per customer → disc
    p50 = 3.00, p90 = 100.00 exactly (the whale IS the p90); orders
    of an unknown customer and of a null-segment customer are
    invisible (inner-join semantics); a one-customer segment answers
    p50 == p90."""
    from jsonschema_ray.pipelines.relational import (
        spend_quantiles_by_segment)
    _customers_seg(tmp_path, [(i, "A") for i in range(1, 6)]
                   + [(6, "B"), (7, None)])
    _orders_price_days(tmp_path, [
        (1, 1.0, 0), (2, 2.0, 0), (3, 3.0, 0), (4, 4.0, 0),
        (5, 100.0, 0), (6, 7.5, 0), (7, 50.0, 0), (99, 9.0, 0)])
    out = spend_quantiles_by_segment(str(tmp_path))
    assert out.to_dict("records") == [
        {"c_mktsegment": "A", "n_cust": 5, "p50_cents": 300,
         "p90_cents": 10000},
        {"c_mktsegment": "B", "n_cust": 1, "p50_cents": 750,
         "p90_cents": 750}]
    exp = _oracle(tmp_path, "spend_quantiles_by_segment")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_spend_quantiles_multi_order_sum_and_empty(tmp_path):
    """A customer's orders SUM before the quantile (two $2 orders is
    one $4 customer, not two $2 data points); nothing attachable →
    typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        spend_quantiles_by_segment)
    _customers_seg(tmp_path, [(1, "A"), (2, "A")])
    _orders_price_days(tmp_path, [(1, 2.0, 0), (1, 2.0, 1),
                                  (2, 3.0, 0)])
    out = spend_quantiles_by_segment(str(tmp_path))
    assert out.to_dict("records") == [
        {"c_mktsegment": "A", "n_cust": 2, "p50_cents": 300,
         "p90_cents": 400}]
    exp = _oracle(tmp_path, "spend_quantiles_by_segment")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")

    _customers_seg(tmp_path, [(1, None)])
    _orders_price_days(tmp_path, [(1, 5.0, 0)])
    out = spend_quantiles_by_segment(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["c_mktsegment", "n_cust",
                                 "p50_cents", "p90_cents"]
    assert len(_oracle(tmp_path, "spend_quantiles_by_segment")) == 0


# --------------------------------------------------------- active hours

def test_active_hours_service_vs_bot_and_tiebreak(tmp_path):
    """A 'human' type firing only at hours 9 and 17 answers 2 active
    / 22 quiet with peak 9 (2 events vs 1); a 'bot' type with one
    event in each of hours 0..3 answers 4 active hours and the
    COUNT-TIE resolves to the earliest hour (peak_hour 0) on both
    engines."""
    from jsonschema_ray.pipelines.relational import active_hours_by_type
    HOUR = 3_600_000_000
    rows = [("human", 9), ("human", 9), ("human", 17),
            ("bot", 0), ("bot", 1), ("bot", 2), ("bot", 3)]
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] * HOUR for r in rows],
                       pa.timestamp("us"))}))
    out = active_hours_by_type(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "bot", "n_active_hours": 4,
         "n_quiet_hours": 20, "peak_hour": 0, "peak_n": 1},
        {"event_type": "human", "n_active_hours": 2,
         "n_quiet_hours": 22, "peak_hour": 9, "peak_n": 2}]
    exp = _oracle(tmp_path, "active_hours_by_type")
    assert exp.astype(out.dtypes.to_dict()).to_dict("records") \
        == out.to_dict("records")


def test_active_hours_nulls_and_empty(tmp_path):
    """Null type/ts rows invisible; an all-invalid corpus answers a
    typed empty frame on both engines."""
    from jsonschema_ray.pipelines.relational import active_hours_by_type
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array([None, "a"], pa.string()),
        "ts": pa.array([0, None], pa.timestamp("us"))}))
    out = active_hours_by_type(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["event_type", "n_active_hours",
                                 "n_quiet_hours", "peak_hour",
                                 "peak_n"]
    assert len(_oracle(tmp_path, "active_hours_by_type")) == 0
