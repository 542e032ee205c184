"""Session-8 operators: the semi/anti-join pipelines (TPC-H Q4 shape,
stale-parts NOT EXISTS) and TPC-H Q10 — crafted edge branches; the sf
oracles run in test_driver_contract / the driver harness."""

import datetime as dt
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from jsonschema_ray.pipelines.relational import (q4_order_priority,
                                                 q10_returned_items,
                                                 q18_large_volume_orders,
                                                 stale_parts_anti)

TS = pa.timestamp("us")


def _write(tmp_path, name, tb):
    pq.write_table(tb, os.path.join(tmp_path, f"{name}.parquet"))


def test_q4_semi_counts_each_order_once(tmp_path):
    """An in-window order with several returned lineitems counts ONCE
    (EXISTS, not a join fan-out); in-window orders with only non-R
    lineitems and out-of-window R-orders are excluded; an in-window
    order with NO lineitems at all is excluded."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "o_orderdate": pa.array([dt.datetime(1996, 2, 1)] * 4
                                + [dt.datetime(1995, 2, 1)], type=TS),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "5-LOW",
                                     "5-LOW", "1-URGENT"])}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 3, 5], type=pa.int64()),
        "l_returnflag": pa.array(["R", "R", "R", "N", "R", "R"])}))
    out = q4_order_priority(str(tmp_path))
    # order 1 (3 R rows -> once), order 3 (R); order 2 non-R, order 4
    # no lineitems, order 5 out of window
    assert out.to_dict("records") == [
        {"o_orderpriority": "1-URGENT", "order_count": 1},
        {"o_orderpriority": "5-LOW", "order_count": 1}]


def test_q4_no_qualifying_orders_typed_empty(tmp_path):
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1], type=pa.int64()),
        "o_orderdate": pa.array([dt.datetime(1990, 1, 1)], type=TS),
        "o_orderpriority": pa.array(["1-URGENT"])}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([], type=pa.int64()),
        "l_returnflag": pa.array([], type=pa.string())}))
    out = q4_order_priority(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["o_orderpriority", "order_count"]
    assert str(out["order_count"].dtype) == "int64"


def test_stale_parts_anti_edges(tmp_path):
    """Kept: a part whose shipments are all pre-cutoff, and a part
    never shipped at all. Dropped: any part with one post-cutoff
    shipment (even among many pre-cutoff ones). Exactly-at-cutoff
    counts as recent (>=)."""
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([10, 20, 30, 40], type=pa.int64()),
        "p_brand": pa.array(["A", "B", "C", "D"])}))
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([10, 10, 20, 30], type=pa.int64()),
        "l_shipdate": pa.array([
            dt.datetime(2000, 5, 1),    # 10: old
            dt.datetime(2001, 3, 1),    # 10: recent -> dropped
            dt.datetime(2000, 12, 31),  # 20: old only -> kept
            dt.datetime(2001, 1, 1),    # 30: exactly at cutoff -> dropped
        ], type=TS)}))
    out = stale_parts_anti(str(tmp_path))
    assert out.to_dict("records") == [
        {"p_partkey": 20, "p_brand": "B"},
        {"p_partkey": 40, "p_brand": "D"}]


def test_q10_aggregates_before_attributes_and_left_join_nation(tmp_path):
    """Revenue sums across a customer's orders in the window; nation
    attaches LEFT (an unknown nationkey yields a null n_name, matching
    the oracle's LEFT JOIN); non-R rows and out-of-window orders are
    excluded; ties break by c_custkey ascending."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "o_custkey": pa.array([100, 100, 200, 100], type=pa.int64()),
        "o_orderdate": pa.array(
            [dt.datetime(1996, 8, 1)] * 3 + [dt.datetime(1997, 1, 1)],
            type=TS)}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 2, 3, 3, 4], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 100.0, 50.0, 999.0]),
        "l_discount": pa.array([0.0, 0.5, 0.25, 0.5, 0.0]),
        "l_returnflag": pa.array(["R", "R", "R", "N", "R"])}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([100, 200], type=pa.int64()),
        "c_name": pa.array(["alice", "bob"]),
        "c_acctbal": pa.array([10.0, 20.0]),
        "c_nationkey": pa.array([1, 99], type=pa.int64())}))
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([1], type=pa.int64()),
        "n_name": pa.array(["FRANCE"])}))
    out = q10_returned_items(str(tmp_path))
    # cust 100: 100 + 25 = 125 (order 4 out of window); cust 200: 75
    # (the N row excluded) — nationkey 99 has no nation row
    assert out["c_custkey"].tolist() == [100, 200]
    assert out["revenue"].tolist() == [125.0, 75.0]
    assert out["n_name"].tolist()[0] == "FRANCE"
    assert pd.isna(out["n_name"].iloc[1])


def test_q10_empty_order_window_typed_empty(tmp_path):
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1], type=pa.int64()),
        "o_custkey": pa.array([100], type=pa.int64()),
        "o_orderdate": pa.array([dt.datetime(1990, 1, 1)], type=TS)}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1], type=pa.int64()),
        "l_extendedprice": pa.array([100.0]),
        "l_discount": pa.array([0.0]),
        "l_returnflag": pa.array(["R"])}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([100], type=pa.int64()),
        "c_name": pa.array(["alice"]),
        "c_acctbal": pa.array([10.0]),
        "c_nationkey": pa.array([1], type=pa.int64())}))
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([1], type=pa.int64()),
        "n_name": pa.array(["FRANCE"])}))
    out = q10_returned_items(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["c_custkey", "c_name", "revenue",
                                 "c_acctbal", "n_name"]


def test_q18_threshold_boundary_and_sum_carry(tmp_path):
    """sum == threshold is EXCLUDED (strict >); the qualifier's sum
    rides into the output without recomputation; top-k orders by
    totalprice desc with date then orderkey tie-breaks."""
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], type=pa.int64()),
        "l_quantity": pa.array([100.0, 81.0, 180.0, 181.0])}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_custkey": pa.array([10, 10, 20], type=pa.int64()),
        "o_orderdate": pa.array([dt.datetime(1996, 1, 1)] * 3, type=TS),
        "o_totalprice": pa.array([500.0, 900.0, 500.0])}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([10, 20], type=pa.int64()),
        "c_name": pa.array(["alice", "bob"])}))
    out = q18_large_volume_orders(str(tmp_path))
    # order 2 sums to exactly 180 -> excluded; 1 and 3 qualify; the
    # totalprice tie between them breaks by orderdate then orderkey
    assert out["o_orderkey"].tolist() == [1, 3]
    assert out["sum_qty"].tolist() == [181.0, 181.0]
    assert out["c_name"].tolist() == ["alice", "bob"]


def test_q18_no_qualifiers_typed_empty(tmp_path):
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1], type=pa.int64()),
        "l_quantity": pa.array([5.0])}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1], type=pa.int64()),
        "o_custkey": pa.array([10], type=pa.int64()),
        "o_orderdate": pa.array([dt.datetime(1996, 1, 1)], type=TS),
        "o_totalprice": pa.array([500.0])}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([10], type=pa.int64()),
        "c_name": pa.array(["alice"])}))
    out = q18_large_volume_orders(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["c_name", "c_custkey", "o_orderkey",
                                 "o_orderdate", "o_totalprice",
                                 "sum_qty"]


def test_top_event_type_tie_break_null_type_and_null_user(tmp_path):
    """Count ties break to the lexicographically SMALLER type (SQL
    row_number ORDER BY count DESC, event_type ASC); a null TYPE is a
    real group but loses any tie (NULLS LAST); null USERS are excluded
    entirely."""
    from jsonschema_ray.pipelines.relational import top_event_type_by_user
    uids = [1, 1, 1, 1, 2, 2, 3, 3, None]
    types = ["view", "view", "click", "click",  # user 1: tie -> click
             None, None,                        # user 2: null type wins
             "view", None,                      # user 3: tie -> view
             "view"]                            # null user: excluded
    tb = pa.table({
        "user_id": pa.array(uids, type=pa.int64()),
        "event_type": pa.array(types, type=pa.string())})
    _write(tmp_path, "events", tb)
    out = top_event_type_by_user(str(tmp_path))
    assert out["user_id"].tolist() == [1, 2, 3]
    assert out["top_type"].tolist()[0] == "click"
    assert out["top_type"].isna().tolist() == [False, True, False]
    assert out["top_type"].tolist()[2] == "view"
    assert out["n"].tolist() == [2, 2, 1]


def test_top_event_type_empty_typed(tmp_path):
    from jsonschema_ray.pipelines.relational import top_event_type_by_user
    _write(tmp_path, "events", pa.table({
        "user_id": pa.array([], type=pa.int64()),
        "event_type": pa.array([], type=pa.string())}))
    out = top_event_type_by_user(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["user_id", "top_type", "n"]


def test_q7_pair_predicate_both_directions_and_year_boundary(tmp_path):
    """Only the (A,B)/(B,A) nation pairs survive (A→A and A→C die on
    the disjunctive cross predicate); the window is [1996-01-01,
    1998-01-01); the year is the SHIP year. Volumes land in the right
    direction bucket."""
    from jsonschema_ray.pipelines.relational import q7_volume_shipping
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([1, 2, 3], type=pa.int32()),
        "n_name": pa.array(["NATION_9", "NATION_11", "NATION_3"])}))
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([10, 20, 30], type=pa.int64()),
        "s_nationkey": pa.array([1, 2, 3], type=pa.int32())}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([100, 200, 300], type=pa.int64()),
        "c_nationkey": pa.array([1, 2, 3], type=pa.int32())}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "o_custkey": pa.array([200, 100, 100, 200, 300],
                              type=pa.int64())}))
    # li rows: (order, supp, ship, price) — A=1 (NATION_9), B=2
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "l_suppkey": pa.array([10, 20, 10, 10, 10], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 200.0, 400.0, 800.0,
                                     1600.0]),
        "l_discount": pa.array([0.0] * 5),
        "l_shipdate": pa.array([
            dt.datetime(1996, 6, 1),    # A supp -> B cust: counts 1996
            dt.datetime(1997, 12, 31),  # B supp -> A cust: counts 1997
            dt.datetime(1997, 6, 1),    # A supp -> A cust: pair fails
            dt.datetime(1998, 1, 1),    # A->B but ship >= 1998: out
            dt.datetime(1996, 6, 1),    # A supp -> C cust: pair fails
        ], type=TS)}))
    out = q7_volume_shipping(str(tmp_path))
    assert out.to_dict("records") == [
        {"supp_nation": "NATION_11", "cust_nation": "NATION_9",
         "l_year": 1997, "revenue": 200.0},
        {"supp_nation": "NATION_9", "cust_nation": "NATION_11",
         "l_year": 1996, "revenue": 100.0}]


def test_q7_missing_nation_typed_empty(tmp_path):
    from jsonschema_ray.pipelines.relational import q7_volume_shipping
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([1], type=pa.int32()),
        "n_name": pa.array(["NATION_9"])}))
    out = q7_volume_shipping(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["supp_nation", "cust_nation",
                                 "l_year", "revenue"]


def test_events_dow_pivot_null_type_group_and_null_ts_excluded(tmp_path):
    """Sunday maps to dow_0 (DuckDB dayofweek convention); a null
    event_type is a real group collecting its own counts; null
    timestamps vanish on both engines."""
    from jsonschema_ray.pipelines.relational import events_dow_pivot
    ts = [dt.datetime(2026, 8, 16),   # Sunday
          dt.datetime(2026, 8, 16),   # Sunday
          dt.datetime(2026, 8, 22),   # Saturday
          dt.datetime(2026, 8, 17),   # Monday (null type)
          None]                       # excluded
    _write(tmp_path, "events", pa.table({
        "event_type": pa.array(["view", "view", "view", None, "view"]),
        "ts": pa.array(ts, type=TS)}))
    out = events_dow_pivot(str(tmp_path))
    assert len(out) == 2
    view = out[out["event_type"] == "view"].iloc[0]
    assert view["dow_0"] == 2 and view["dow_6"] == 1
    assert int(view[[f"dow_{d}" for d in range(7)]].sum()) == 3
    nullrow = out[out["event_type"].isna()].iloc[0]
    assert nullrow["dow_1"] == 1
    assert int(nullrow[[f"dow_{d}" for d in range(7)]].sum()) == 1
    # null-type group sorts LAST (na_position), matching the oracle
    assert pd.isna(out["event_type"].iloc[-1])
