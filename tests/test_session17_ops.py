"""Session-17 operators: shipping-delay SLA table — crafted edge
branches the sf oracles can't reach (order-month attribution across a
month boundary, negative delays, even/odd median interpolation, null
dates, orphan orderkeys). The sf-scale value oracles run in
test_driver_contract and were hand-verified at sf0.001/0.01/0.1."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_ray.pipelines.relational import (
    retention_curve_events, ship_delay_by_month)

pytestmark = pytest.mark.usefixtures("ray_session")

DAY = 86_400_000_000  # one day in µs


def _write(tmp_path, name, tb):
    pq.write_table(tb, os.path.join(str(tmp_path), f"{name}.parquet"))


def _orders(tmp_path, rows):
    """rows: (o_orderkey, orderdate_day|None)."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            [None if r[1] is None else r[1] * DAY for r in rows],
            pa.timestamp("us")),
    }))


def _lineitem(tmp_path, rows):
    """rows: (l_orderkey|None, shipdate_day|None)."""
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_shipdate": pa.array(
            [None if r[1] is None else r[1] * DAY for r in rows],
            pa.timestamp("us")),
    }))


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


def _frames_equal(got, exp, sort_cols):
    got = got[list(exp.columns)].sort_values(sort_cols) \
        .reset_index(drop=True)
    exp = exp.sort_values(sort_cols).reset_index(drop=True)
    assert len(got) == len(exp), (len(got), len(exp))
    for c in exp.columns:
        gv, ev = got[c].to_numpy(), exp[c].to_numpy()
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            assert np.array_equal(
                np.nan_to_num(gv.astype(float), nan=-1.0),
                np.nan_to_num(ev.astype(float), nan=-1.0)), c
        else:
            assert np.array_equal(gv.astype(str), ev.astype(str)), c


def _ship(tmp_path):
    got = ship_delay_by_month(str(tmp_path))
    exp = _oracle(tmp_path, "ship_delay_by_month")
    _frames_equal(got, exp, ["month"])
    return got.set_index("month")


# ---------------------------------------------------------------------------
# ship_delay_by_month


def test_ship_delay_hand_means_and_medians(tmp_path):
    """Jan order ships +2/+4/+9 → mean 5.0, odd-count median 4.0.
    Feb's two orders contribute delays {1,2,4,9} → even-count median
    interpolates (2+4)/2 = 3.0 exactly (quantile_cont semantics)."""
    _orders(tmp_path, [(1, 10), (2, 40), (3, 45)])
    _lineitem(tmp_path, [
        (1, 12), (1, 14), (1, 19),
        (2, 41), (2, 42), (3, 49), (3, 54)])
    by = _ship(tmp_path)
    assert int(by.loc["1970-01", "n_items"]) == 3
    assert by.loc["1970-01", "mean_delay"] == 5.0
    assert by.loc["1970-01", "med_delay"] == 4.0
    assert int(by.loc["1970-02", "n_items"]) == 4
    assert by.loc["1970-02", "med_delay"] == 3.0


def test_ship_delay_order_month_attribution(tmp_path):
    """Month comes from the ORDER date: an item shipped in February
    for a January 31 order lands in 1970-01 — the SLA report charges
    latency to when the order was placed, not when it shipped."""
    _orders(tmp_path, [(1, 30)])  # 1970-01-31
    _lineitem(tmp_path, [(1, 35)])  # ships 1970-02-05
    by = _ship(tmp_path)
    assert list(by.index) == ["1970-01"]
    assert by.loc["1970-01", "med_delay"] == 5.0


def test_ship_delay_negative_delays_kept(tmp_path):
    """A ship date BEFORE the order date (a data error the report
    must surface) is kept: delays {-3, 3} → mean 0.0, median 0.0."""
    _orders(tmp_path, [(1, 10)])
    _lineitem(tmp_path, [(1, 7), (1, 13)])
    by = _ship(tmp_path)
    assert by.loc["1970-01", "mean_delay"] == 0.0
    assert by.loc["1970-01", "med_delay"] == 0.0
    assert int(by.loc["1970-01", "n_items"]) == 2


def test_ship_delay_null_and_orphan_rows_invisible(tmp_path):
    """A null ship date, a null order date, a null orderkey and an
    orphan orderkey (no matching order — the inner join) all vanish
    on both engines; an order with no line items produces no row."""
    _orders(tmp_path, [(1, 10), (2, None), (3, 70)])
    _lineitem(tmp_path, [
        (1, 12),          # the only surviving pair
        (1, None),        # null ship date
        (2, 50),          # its order has a null date
        (99, 55),         # orphan orderkey
        (None, 60)])      # null orderkey
    by = _ship(tmp_path)
    assert len(by) == 1
    assert int(by.loc["1970-01", "n_items"]) == 1
    assert by.loc["1970-01", "med_delay"] == 2.0


def test_ship_delay_empty_table_typed(tmp_path):
    """An all-filtered corpus answers the typed empty frame."""
    _orders(tmp_path, [(1, None)])
    _lineitem(tmp_path, [(1, 12)])
    got = ship_delay_by_month(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["month", "n_items", "mean_delay",
                                 "med_delay"]
    assert str(got["n_items"].dtype) == "int64"
    assert str(got["mean_delay"].dtype) == "float64"


# ---------------------------------------------------------------------------
# retention_curve_events


def _events_u(tmp_path, rows):
    """rows: (event_id, user_id|None, ts_us|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
    }))


def _curve(tmp_path):
    got = retention_curve_events(str(tmp_path))
    exp = _oracle(tmp_path, "retention_curve_events")
    _frames_equal(got, exp, ["day_offset"])
    return got.set_index("day_offset")


def test_retention_curve_offsets_are_per_user_and_gapped(tmp_path):
    """User 1 active on days {0, 1, 5}; user 2 starts day 3, active
    {3, 4}. Offsets are relative to each user's OWN first day: user 2
    contributes offsets {0, 1}, not {3, 4}; user 1's day-5 activity
    emits offset 5 with NO rows for the gap offsets 2-4 from them.
    share(0) is exactly 1.0 — every user has a first day."""
    _events_u(tmp_path, [
        (1, 1, 0), (2, 1, DAY), (3, 1, 5 * DAY),
        (4, 2, 3 * DAY), (5, 2, 4 * DAY)])
    by = _curve(tmp_path)
    assert list(by.index) == [0, 1, 5]
    assert int(by.loc[0, "n_users"]) == 2 and by.loc[0, "share"] == 1.0
    assert int(by.loc[1, "n_users"]) == 2
    assert int(by.loc[5, "n_users"]) == 1 and by.loc[5, "share"] == 0.5


def test_retention_curve_dedup_and_null_rows(tmp_path):
    """Three events on one user's second day count ONCE (the distinct
    (user, day) set); null user / null ts rows invisible."""
    _events_u(tmp_path, [
        (1, 1, 0),
        (2, 1, DAY), (3, 1, DAY + 1000), (4, 1, DAY + 2000),
        (5, None, DAY), (6, 1, None)])
    by = _curve(tmp_path)
    assert list(by.index) == [0, 1]
    assert int(by.loc[1, "n_users"]) == 1
    assert by.loc[1, "share"] == 1.0


def test_retention_curve_single_day_users_and_empty(tmp_path):
    """A corpus of one-day users answers ONE row (offset 0, share
    1.0); an all-null corpus answers the typed empty frame."""
    _events_u(tmp_path, [(1, 1, 0), (2, 2, 7 * DAY), (3, 3, 30 * DAY)])
    by = _curve(tmp_path)
    assert list(by.index) == [0]
    assert int(by.loc[0, "n_users"]) == 3
    _events_u(tmp_path, [(1, None, 0), (2, 1, None)])
    got = retention_curve_events(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["day_offset", "n_users", "share"]


# ---------------------------------------------------------------------------
# zipf_slope_documents


def _docs(tmp_path, texts):
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def _zipf(tmp_path):
    from jsonschema_ray.pipelines.relational import zipf_slope_documents
    got = zipf_slope_documents(str(tmp_path))
    exp = _oracle(tmp_path, "zipf_slope_documents")
    _frames_equal(got, exp, ["n_terms"])
    return got.iloc[0]


def test_zipf_two_point_exact_line(tmp_path):
    """Counts {4, 2} at ranks {1, 2}: x = {0, 1}, y = {2, 1} — a
    two-point OLS fits exactly, slope −1.0 and intercept 2.0, both
    representable doubles so the 6dp round is a no-op."""
    _docs(tmp_path, ["a a b", "a a b"])
    row = _zipf(tmp_path)
    assert int(row["n_terms"]) == 2
    assert row["slope"] == -1.0
    assert row["intercept"] == 2.0


def test_zipf_top_n_cut_and_tiebreak(tmp_path):
    """1200 singleton terms + one 5x head term: only the top 1000
    (n DESC, term ASC) survive the cut on BOTH engines — n_terms
    reports exactly 1000 and the tied singleton band at the cut is
    resolved by the term tiebreak identically."""
    terms = [f"w{i:05d}" for i in range(1200)]
    _docs(tmp_path, ["head head head head head", " ".join(terms)])
    row = _zipf(tmp_path)
    assert int(row["n_terms"]) == 1000


def test_zipf_single_term_and_empty(tmp_path):
    """One distinct term has zero x-variance → 0/0 → SQL-NULL slope
    AND intercept on both engines; an empty/null corpus answers the
    n_terms = 0 row."""
    _docs(tmp_path, ["solo solo solo"])
    row = _zipf(tmp_path)
    assert int(row["n_terms"]) == 1
    assert math.isnan(row["slope"]) and math.isnan(row["intercept"])
    _docs(tmp_path, ["", None])
    row = _zipf(tmp_path)
    assert int(row["n_terms"]) == 0
    assert math.isnan(row["slope"])


# ---------------------------------------------------------------------------
# new_vs_repeat_revenue


def _orders_cust(tmp_path, rows):
    """rows: (o_custkey|None, orderdate_day|None, totalprice|None)."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(list(range(len(rows))), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            [None if r[1] is None else r[1] * DAY for r in rows],
            pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
    }))


def _nvr(tmp_path):
    from jsonschema_ray.pipelines.relational import new_vs_repeat_revenue
    got = new_vs_repeat_revenue(str(tmp_path))
    exp = _oracle(tmp_path, "new_vs_repeat_revenue")
    _frames_equal(got, exp, ["month"])
    return got.set_index("month")


def test_nvr_hand_split_and_same_month_repeat(tmp_path):
    """Customer 1 orders on day 2 ($10) and AGAIN on day 20 ($20) —
    the second lands in the SAME January as the first yet counts as
    repeat; customer 2's only order ($5, February) is new. January:
    new 1000 cents / repeat 2000 cents → repeat_share 2000/3000."""
    _orders_cust(tmp_path, [
        (1, 2, 10.0), (1, 20, 20.0), (2, 40, 5.0)])
    by = _nvr(tmp_path)
    assert by.loc["1970-01", "new_cents"] == "1000"
    assert by.loc["1970-01", "repeat_cents"] == "2000"
    assert int(by.loc["1970-01", "new_orders"]) == 1
    assert int(by.loc["1970-01", "repeat_orders"]) == 1
    assert by.loc["1970-02", "repeat_cents"] == "0"
    assert by.loc["1970-02", "repeat_share"] == 0.0


def test_nvr_same_day_ties_are_all_new(tmp_path):
    """TWO orders by one customer on the same earliest day both count
    as new (is_new = date == min date — no arbitrary tiebreak); a
    later order is repeat."""
    _orders_cust(tmp_path, [
        (1, 5, 10.0), (1, 5, 20.0), (1, 40, 30.0)])
    by = _nvr(tmp_path)
    assert int(by.loc["1970-01", "new_orders"]) == 2
    assert by.loc["1970-01", "new_cents"] == "3000"
    assert int(by.loc["1970-02", "repeat_orders"]) == 1


def test_nvr_zero_revenue_month_null_share_and_nulls(tmp_path):
    """A month whose only orders are $0 answers SQL-NULL share (0/0)
    on both engines; null custkey / null date / null price rows are
    invisible."""
    _orders_cust(tmp_path, [
        (1, 2, 0.0),
        (None, 5, 10.0), (2, None, 10.0), (3, 8, None)])
    by = _nvr(tmp_path)
    assert len(by) == 1
    assert by.loc["1970-01", "new_cents"] == "0"
    assert math.isnan(by.loc["1970-01", "repeat_share"])
    _orders_cust(tmp_path, [(None, 5, 10.0)])
    from jsonschema_ray.pipelines.relational import new_vs_repeat_revenue
    got = new_vs_repeat_revenue(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == [
        "month", "new_orders", "repeat_orders", "new_cents",
        "repeat_cents", "repeat_share"]


# ---------------------------------------------------------------------------
# return_rate_by_month


def _lineitem_rf(tmp_path, rows):
    """rows: (shipdate_day|None, returnflag|None, price|None)."""
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array(list(range(len(rows))), pa.int64()),
        "l_shipdate": pa.array(
            [None if r[0] is None else r[0] * DAY for r in rows],
            pa.timestamp("us")),
        "l_returnflag": pa.array([r[1] for r in rows], pa.string()),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64()),
    }))


def _rrm(tmp_path):
    from jsonschema_ray.pipelines.relational import return_rate_by_month
    got = return_rate_by_month(str(tmp_path))
    exp = _oracle(tmp_path, "return_rate_by_month")
    _frames_equal(got, exp, ["month"])
    return got.set_index("month")


def test_return_rate_hand_values_and_null_flag(tmp_path):
    """January: 4 items, one 'R' ($20) → rate 0.25, ret_cents 2000,
    share 2000/8000 = 0.25. A NULL returnflag is NOT returned (the
    SQL CASE falls to ELSE 0)."""
    _lineitem_rf(tmp_path, [
        (2, "R", 20.0), (5, "N", 30.0), (9, "A", 25.0),
        (12, None, 5.0)])
    by = _rrm(tmp_path)
    assert int(by.loc["1970-01", "n_items"]) == 4
    assert int(by.loc["1970-01", "n_returned"]) == 1
    assert by.loc["1970-01", "return_rate"] == 0.25
    assert by.loc["1970-01", "ret_cents"] == "2000"
    assert by.loc["1970-01", "ret_share"] == 0.25


def test_return_rate_null_price_and_zero_r_month(tmp_path):
    """A NULL-price 'R' item counts in n_returned but adds nothing to
    either cents sum; a month with no 'R' at all answers ret_cents
    '0' and share 0.0 (the COALESCE), not NULL."""
    _lineitem_rf(tmp_path, [
        (2, "R", None), (5, "N", 40.0),
        (40, "N", 10.0), (45, "A", 10.0)])
    by = _rrm(tmp_path)
    assert int(by.loc["1970-01", "n_returned"]) == 1
    assert by.loc["1970-01", "ret_cents"] == "0"
    assert by.loc["1970-01", "ret_share"] == 0.0
    assert by.loc["1970-02", "ret_cents"] == "0"
    assert by.loc["1970-02", "ret_share"] == 0.0


def test_return_rate_all_null_price_month_null_share(tmp_path):
    """A month whose EVERY price is NULL answers 0/0 = SQL-NULL share
    while its counts stay exact; null shipdate rows invisible; empty
    corpus answers the typed empty frame."""
    _lineitem_rf(tmp_path, [
        (2, "R", None), (3, "N", None), (None, "R", 10.0)])
    by = _rrm(tmp_path)
    assert len(by) == 1
    assert int(by.loc["1970-01", "n_items"]) == 2
    assert math.isnan(by.loc["1970-01", "ret_share"])
    _lineitem_rf(tmp_path, [(None, "R", 10.0)])
    from jsonschema_ray.pipelines.relational import return_rate_by_month
    got = return_rate_by_month(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["month", "n_items", "n_returned",
                                 "return_rate", "ret_cents", "ret_share"]


# ---------------------------------------------------------------------------
# basket_size_histogram


def _lineitem_keys(tmp_path, keys):
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array(keys, pa.int64()),
    }))


def _basket(tmp_path):
    from jsonschema_ray.pipelines.relational import basket_size_histogram
    got = basket_size_histogram(str(tmp_path))
    exp = _oracle(tmp_path, "basket_size_histogram")
    _frames_equal(got, exp, ["basket_size"])
    return got.set_index("basket_size")


def test_basket_hand_histogram_and_share(tmp_path):
    """Orders with 1, 1, 2 and 4 items → k=1: 2 orders (share 0.5),
    k=2 and k=4: 1 each (0.25) — exact representable shares; gap
    sizes (k=3) produce NO row."""
    _lineitem_keys(tmp_path, [10, 20, 30, 30, 40, 40, 40, 40])
    by = _basket(tmp_path)
    assert list(by.index) == [1, 2, 4]
    assert int(by.loc[1, "n_orders"]) == 2 and by.loc[1, "share"] == 0.5
    assert by.loc[2, "share"] == 0.25
    assert by.loc[4, "share"] == 0.25


def test_basket_null_keys_and_empty(tmp_path):
    """Null orderkeys are invisible (they are not an order); an
    all-null corpus answers the typed empty frame."""
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, None, None, None], pa.int64())}))
    by = _basket(tmp_path)
    assert list(by.index) == [2]
    assert by.loc[2, "share"] == 1.0
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([None, None], pa.int64())}))
    from jsonschema_ray.pipelines.relational import basket_size_histogram
    got = basket_size_histogram(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["basket_size", "n_orders", "share"]


# ---------------------------------------------------------------------------
# price_qty_regr_by_brand


def _li_part(tmp_path, li_rows, part_rows):
    """li_rows: (partkey|None, qty|None, price|None);
    part_rows: (partkey, brand|None)."""
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_quantity": pa.array([r[1] for r in li_rows], pa.float64()),
        "l_extendedprice": pa.array([r[2] for r in li_rows],
                                    pa.float64()),
    }))
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([r[0] for r in part_rows], pa.int64()),
        "p_brand": pa.array([r[1] for r in part_rows], pa.string()),
    }))


def _regr(tmp_path):
    from jsonschema_ray.pipelines.relational import (
        price_qty_regr_by_brand)
    got = price_qty_regr_by_brand(str(tmp_path))
    exp = _oracle(tmp_path, "price_qty_regr_by_brand")
    _frames_equal(got, exp, ["brand"])
    return got.set_index("brand")


def test_regr_hand_line_and_null_pairs(tmp_path):
    """Brand A lies exactly on qty = 2 + 0.5*price (three points) →
    slope 0.5, intercept 2.0, pearson 1.0 — all representable, round
    a no-op. A null-qty and a null-price pair are SKIPPED (n counts
    surviving pairs, SQL regr_count)."""
    _li_part(tmp_path, [
        (1, 3.0, 2.0), (1, 4.0, 4.0), (2, 5.0, 6.0),
        (2, None, 8.0), (1, 7.0, None)],
        [(1, "A"), (2, "A")])
    by = _regr(tmp_path)
    assert int(by.loc["A", "n"]) == 3
    assert by.loc["A", "slope"] == 0.5
    assert by.loc["A", "intercept"] == 2.0
    assert by.loc["A", "pearson"] == 1.0


def test_regr_zero_variance_and_single_pair(tmp_path):
    """A brand whose every price is identical has zero x-variance →
    NULL slope/intercept/pearson like SQL; a single-pair brand too
    (0/0); counts stay exact."""
    _li_part(tmp_path, [
        (1, 3.0, 5.0), (1, 9.0, 5.0),
        (2, 4.0, 7.0)],
        [(1, "FLAT"), (2, "ONE")])
    by = _regr(tmp_path)
    assert int(by.loc["FLAT", "n"]) == 2
    assert math.isnan(by.loc["FLAT", "slope"])
    assert math.isnan(by.loc["ONE", "pearson"])
    assert int(by.loc["ONE", "n"]) == 1


def test_regr_null_brand_group_and_orphans(tmp_path):
    """A NULL p_brand is its own group (SQL GROUP BY NULL); an orphan
    l_partkey (no part row) vanishes at the inner join; an empty
    join answers the typed empty frame."""
    _li_part(tmp_path, [
        (1, 3.0, 2.0), (1, 5.0, 6.0), (99, 4.0, 4.0)],
        [(1, None)])
    got_df = _regr(tmp_path).reset_index()
    assert len(got_df) == 1
    assert got_df["n"].iloc[0] == 2
    _li_part(tmp_path, [(99, 3.0, 2.0)], [(1, "A")])
    from jsonschema_ray.pipelines.relational import (
        price_qty_regr_by_brand)
    got = price_qty_regr_by_brand(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["brand", "slope", "intercept",
                                 "pearson", "n"]


# ---------------------------------------------------------------------------
# wau_mau_engagement


def _wm(tmp_path):
    from jsonschema_ray.pipelines.relational import wau_mau_engagement
    got = wau_mau_engagement(str(tmp_path))
    exp = _oracle(tmp_path, "wau_mau_engagement")
    _frames_equal(got, exp, ["day"])
    return got.set_index("day")


def test_wau_mau_no_double_count_in_window(tmp_path):
    """User A is active on days 0 AND 3 — both inside day 3's
    trailing week — yet counts ONCE in day 3's WAU (the coverage
    merge; a naive per-activity sweep would answer 3). User B is
    active on day 3 only → day 3 WAU = 2."""
    _events_u(tmp_path, [
        (1, 1, 0), (2, 1, 3 * DAY), (3, 2, 3 * DAY)])
    by = _wm(tmp_path)
    assert list(by.index) == ["1970-01-01", "1970-01-04"]
    assert int(by.loc["1970-01-04", "wau"]) == 2
    assert int(by.loc["1970-01-04", "mau"]) == 2
    assert by.loc["1970-01-04", "wau_mau"] == 1.0


def test_wau_mau_window_expiry_boundaries(tmp_path):
    """A active day 0, B day 7, C day 28. Day 7's trailing week is
    [1, 7] — A has EXPIRED from WAU but still sits in MAU ([−20, 7])
    → wau 1 / mau 2 = 0.5. Day 28's month window is [1, 28] — A has
    expired from MAU too; B stays → wau 1 (C) / mau 2 (B, C) = 0.5.
    Unobserved days in between produce NO rows (three rows total)."""
    _events_u(tmp_path, [
        (1, 1, 0), (2, 2, 7 * DAY), (3, 3, 28 * DAY)])
    by = _wm(tmp_path)
    assert len(by) == 3
    assert int(by.loc["1970-01-08", "wau"]) == 1
    assert int(by.loc["1970-01-08", "mau"]) == 2
    assert by.loc["1970-01-08", "wau_mau"] == 0.5
    assert int(by.loc["1970-01-29", "wau"]) == 1
    assert int(by.loc["1970-01-29", "mau"]) == 2


def test_wau_mau_dedup_nulls_and_empty(tmp_path):
    """Three same-day events are one user-day; null user/ts rows are
    invisible; an all-null corpus answers the typed empty frame."""
    _events_u(tmp_path, [
        (1, 1, 0), (2, 1, 1000), (3, 1, 2000),
        (4, None, 0), (5, 1, None)])
    by = _wm(tmp_path)
    assert len(by) == 1
    assert int(by.loc["1970-01-01", "wau"]) == 1
    assert by.loc["1970-01-01", "wau_mau"] == 1.0
    _events_u(tmp_path, [(1, None, 0)])
    from jsonschema_ray.pipelines.relational import wau_mau_engagement
    got = wau_mau_engagement(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["day", "wau", "mau", "wau_mau"]


# ---------------------------------------------------------------------------
# first_touch_attribution


def _events_t(tmp_path, rows):
    """rows: (event_id|None, user_id|None, ts_us|None, type|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }))


def _fta(tmp_path):
    from jsonschema_ray.pipelines.relational import (
        first_touch_attribution)
    got = first_touch_attribution(str(tmp_path))
    exp = _oracle(tmp_path, "first_touch_attribution")
    _frames_equal(got, exp, ["first_touch"])
    return got.set_index("first_touch")


def test_fta_strictly_after_and_tiebreak(tmp_path):
    """User 1's first touch is 'view' (ts tie at 0 broken by
    event_id: view has the smaller id) and converts on a later
    purchase; user 2's FIRST event is already a purchase with no
    second one → NOT converted (strictly-after contract); user 3
    signup, never buys."""
    _events_t(tmp_path, [
        (1, 1, 0, "view"), (2, 1, 0, "click"),
        (3, 1, 1000, "purchase"),
        (4, 2, 0, "purchase"),
        (5, 3, 0, "signup")])
    by = _fta(tmp_path)
    assert list(by.index) == ["purchase", "signup", "view"]
    assert int(by.loc["view", "n_converted"]) == 1
    assert by.loc["view", "conversion"] == 1.0
    assert int(by.loc["purchase", "n_converted"]) == 0
    assert by.loc["purchase", "conversion"] == 0.0


def test_fta_double_purchase_and_null_type_group(tmp_path):
    """A first-touch purchase DOES convert on a SECOND purchase; a
    NULL first event_type is its own group and a later null-type
    event is never a purchase."""
    _events_t(tmp_path, [
        (1, 1, 0, "purchase"), (2, 1, 1000, "purchase"),
        (3, 2, 0, None), (4, 2, 1000, None)])
    by = _fta(tmp_path)
    assert int(by.loc["purchase", "n_converted"]) == 1
    nullrow = by[by.index.isnull()]
    assert int(nullrow["n_users"].iloc[0]) == 1
    assert int(nullrow["n_converted"].iloc[0]) == 0


def test_fta_null_keys_invisible_and_empty(tmp_path):
    """Rows with null user/ts/event_id are invisible (the tie-break
    must be total): user 4's ONLY valid row is the purchase at 1000,
    making it the first touch (the null-ts purchase at position 0
    vanishes). An all-null corpus answers the typed empty frame."""
    _events_t(tmp_path, [
        (1, 4, None, "view"), (2, 4, 1000, "purchase"),
        (None, 5, 0, "click"), (3, None, 0, "view")])
    by = _fta(tmp_path)
    assert list(by.index) == ["purchase"]
    assert int(by.loc["purchase", "n_converted"]) == 0
    _events_t(tmp_path, [(1, None, 0, "view")])
    from jsonschema_ray.pipelines.relational import (
        first_touch_attribution)
    got = first_touch_attribution(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["first_touch", "n_users",
                                 "n_converted", "conversion"]


# ---------------------------------------------------------------------------
# hapax_share_documents


def _hapax(tmp_path):
    from jsonschema_ray.pipelines.relational import hapax_share_documents
    got = hapax_share_documents(str(tmp_path))
    exp = _oracle(tmp_path, "hapax_share_documents")
    _frames_equal(got, exp, ["n_terms"])
    return got.iloc[0]


def test_hapax_hand_counts(tmp_path):
    """'a a b c' + 'a c': vocabulary {a: 3, b: 1, c: 2} → 3 terms,
    1 hapax, share 1/3 at 6dp, 6 total tokens. The sf corpora have a
    closed 31-word vocabulary with ZERO hapaxes, so this crafted pin
    carries the discriminating load for n_hapax > 0."""
    _docs(tmp_path, ["a a b c", "a c"])
    row = _hapax(tmp_path)
    assert int(row["n_terms"]) == 3
    assert int(row["n_hapax"]) == 1
    assert row["hapax_share"] == 0.333333
    assert row["total_tokens"] == "6"


def test_hapax_all_hapax_and_multispace(tmp_path):
    """Every term unique → share exactly 1.0; empty tokens from
    double spaces are NOT terms on either engine (the term <> ''
    filter vs the combiner's empty-token drop)."""
    _docs(tmp_path, ["x  y", "z"])
    row = _hapax(tmp_path)
    assert int(row["n_terms"]) == 3
    assert row["hapax_share"] == 1.0
    assert row["total_tokens"] == "3"


def test_hapax_empty_vocabulary(tmp_path):
    """Null/empty texts answer the n_terms = 0 row with SQL-NULL
    share and total_tokens '0' (the COALESCE on both engines)."""
    _docs(tmp_path, ["", None, "   "])
    row = _hapax(tmp_path)
    assert int(row["n_terms"]) == 0
    assert math.isnan(row["hapax_share"])
    assert row["total_tokens"] == "0"


# ---------------------------------------------------------------------------
# sessions_per_user_histogram


MIN30 = 1_800_000_000  # the session gap rule, µs


def _sess(tmp_path):
    from jsonschema_ray.pipelines.relational import (
        sessions_per_user_histogram)
    got = sessions_per_user_histogram(str(tmp_path))
    exp = _oracle(tmp_path, "sessions_per_user_histogram")
    _frames_equal(got, exp, ["n_sessions"])
    return got.set_index("n_sessions")


def test_sessions_hist_gap_boundary_exact(tmp_path):
    """A gap of EXACTLY 30 minutes stays in the same session
    (strictly-greater rule — the events_sessions contract); 30 min +
    1 µs opens a new one. User 1: gaps {30m, 30m+1µs} → 2 sessions;
    user 2: one event → 1 session."""
    _events_u(tmp_path, [
        (1, 1, 0), (2, 1, MIN30), (3, 1, 2 * MIN30 + 1),
        (4, 2, 0)])
    by = _sess(tmp_path)
    assert list(by.index) == [1, 2]
    assert int(by.loc[1, "n_users"]) == 1
    assert int(by.loc[2, "n_users"]) == 1
    assert by.loc[1, "share"] == 0.5


def test_sessions_hist_counts_and_gaps(tmp_path):
    """Three single-session users and one three-session user: the
    histogram answers {1: 3, 3: 1} with NO row for k = 2 (observed
    counts only); shares 0.75 / 0.25 exactly."""
    _events_u(tmp_path, [
        (1, 1, 0), (2, 2, 0), (3, 3, 0),
        (4, 4, 0), (5, 4, 10 * MIN30), (6, 4, 20 * MIN30)])
    by = _sess(tmp_path)
    assert list(by.index) == [1, 3]
    assert int(by.loc[1, "n_users"]) == 3
    assert by.loc[1, "share"] == 0.75
    assert by.loc[3, "share"] == 0.25


def test_sessions_hist_nulls_and_empty(tmp_path):
    """Null user/ts rows are invisible — a user whose only rows are
    null-ts does not exist; an all-null corpus answers the typed
    empty frame."""
    _events_u(tmp_path, [
        (1, 1, 0), (2, 1, None), (3, None, 0)])
    by = _sess(tmp_path)
    assert list(by.index) == [1]
    assert by.loc[1, "share"] == 1.0
    _events_u(tmp_path, [(1, 9, None)])
    from jsonschema_ray.pipelines.relational import (
        sessions_per_user_histogram)
    got = sessions_per_user_histogram(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["n_sessions", "n_users", "share"]


# ---------------------------------------------------------------------------
# norm_stats_by_label_embeddings


def _embeddings(tmp_path, rows):
    """rows: (vec_id, vec list|None, label|None)."""
    _write(tmp_path, "embeddings", pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    }))


def _norms(tmp_path):
    from jsonschema_ray.pipelines.relational import (
        norm_stats_by_label_embeddings)
    got = norm_stats_by_label_embeddings(str(tmp_path))
    exp = _oracle(tmp_path, "norm_stats_by_label_embeddings")
    _frames_equal(got, exp, ["label"])
    return got.set_index("label")


def test_norm_stats_hand_pythagoras(tmp_path):
    """Label 0 holds [3,4] (norm 5) and [6,8] (norm 10) → mean 7.5,
    min 5, max 10 — exact representable doubles; label 1's zero
    vector answers norm 0 everywhere (the dead-vector signal this
    query exists to surface)."""
    _embeddings(tmp_path, [
        (1, [3.0, 4.0], 0), (2, [6.0, 8.0], 0),
        (3, [0.0, 0.0], 1)])
    by = _norms(tmp_path)
    assert by.loc[0, "mean_norm"] == 7.5
    assert by.loc[0, "min_norm"] == 5.0
    assert by.loc[0, "max_norm"] == 10.0
    assert by.loc[1, "max_norm"] == 0.0
    assert int(by.loc[1, "n"]) == 1


def test_norm_stats_float32_cast_and_nulls(tmp_path):
    """The float32 storage casts to double BEFORE squaring on both
    engines (0.1f != 0.1 — squaring the float32 value is what both
    sides do, pinned by exact equality); null-embedding and
    null-label rows are invisible."""
    _embeddings(tmp_path, [
        (1, [0.1, 0.2, 0.3], 7),
        (2, None, 7), (3, [1.0, 1.0, 1.0], None)])
    by = _norms(tmp_path)
    assert list(by.index) == [7]
    assert int(by.loc[7, "n"]) == 1
    _embeddings(tmp_path, [(1, None, 7)])
    from jsonschema_ray.pipelines.relational import (
        norm_stats_by_label_embeddings)
    got = norm_stats_by_label_embeddings(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["label", "n", "mean_norm",
                                 "min_norm", "max_norm"]


# ---------------------------------------------------------------------------
# order_gap_histogram


def _gap(tmp_path):
    from jsonschema_ray.pipelines.relational import order_gap_histogram
    got = order_gap_histogram(str(tmp_path))
    exp = _oracle(tmp_path, "order_gap_histogram")
    _frames_equal(got, exp, ["gap_days"])
    return got.set_index("gap_days")


def test_order_gap_hand_histogram(tmp_path):
    """Customer 1 orders on days {0, 7, 14} → two 7-day gaps;
    customer 2 on {0, 30} → one 30-day gap. Histogram {7: 2, 30: 1},
    shares 2/3 and 1/3 at 6dp; a single-order customer (3)
    contributes NOTHING."""
    _orders_cust(tmp_path, [
        (1, 0, 1.0), (1, 7, 1.0), (1, 14, 1.0),
        (2, 0, 1.0), (2, 30, 1.0),
        (3, 5, 1.0)])
    by = _gap(tmp_path)
    assert list(by.index) == [7, 30]
    assert int(by.loc[7, "n_gaps"]) == 2
    assert by.loc[7, "share"] == 0.666667
    assert by.loc[30, "share"] == 0.333333


def test_order_gap_same_day_zero_and_nulls(tmp_path):
    """Two same-day orders gap exactly 0 (date subtraction ignores
    the tie order — deterministic on both engines); null custkey /
    null date rows invisible; all-gap-less corpus answers the typed
    empty frame."""
    _orders_cust(tmp_path, [
        (1, 5, 1.0), (1, 5, 2.0),
        (None, 0, 1.0), (2, None, 1.0)])
    by = _gap(tmp_path)
    assert list(by.index) == [0]
    assert int(by.loc[0, "n_gaps"]) == 1
    _orders_cust(tmp_path, [(1, 5, 1.0), (2, 9, 1.0)])
    from jsonschema_ray.pipelines.relational import order_gap_histogram
    got = order_gap_histogram(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["gap_days", "n_gaps", "share"]
