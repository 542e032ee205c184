"""Session-9 operators: TPC-H Q13 (left-outer double aggregation),
Q22 (global scalar threshold + anti join), Q15 (max scalar subquery
with ties), Q14 (conditional-aggregate ratio) — crafted edge branches;
the sf oracles run in test_driver_contract / the driver harness."""

import datetime as dt
import math
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from jsonschema_ray.pipelines.relational import (q13_customer_distribution,
                                                 q14_promo_revenue,
                                                 q15_top_supplier,
                                                 q22_idle_balance)

TS = pa.timestamp("us")


def _write(tmp_path, name, tb):
    pq.write_table(tb, os.path.join(tmp_path, f"{name}.parquet"))


def test_q13_zero_count_bucket_is_real(tmp_path):
    """Customers with NO urgent orders land in the c_count=0 bucket
    (LEFT JOIN with the predicate in the join condition — a WHERE
    would drop them); non-urgent orders never count; the distribution
    groups the per-customer counts."""
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], type=pa.int64())}))
    _write(tmp_path, "orders", pa.table({
        # cust 1: two urgent; cust 2: one urgent + one LOW (counts 1);
        # cust 3: only LOW (zero bucket); cust 4: no orders (zero)
        "o_custkey": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "1-URGENT",
                                     "5-LOW", "5-LOW"])}))
    out = q13_customer_distribution(str(tmp_path))
    assert out.to_dict("records") == [
        {"c_count": 0, "custdist": 2},
        {"c_count": 2, "custdist": 1},
        {"c_count": 1, "custdist": 1}]


def test_q13_empty_orders_all_zero(tmp_path):
    """A fully empty orders table: every customer is a zero-count row
    (the hinted aggregate side carries the schema Ray drops)."""
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([7, 8], type=pa.int64())}))
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([], type=pa.int64()),
        "o_orderpriority": pa.array([], type=pa.string())}))
    out = q13_customer_distribution(str(tmp_path))
    assert out.to_dict("records") == [{"c_count": 0, "custdist": 2}]


def test_q13_empty_customer_typed_empty(tmp_path):
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([], type=pa.int64())}))
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([1], type=pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT"])}))
    out = q13_customer_distribution(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["c_count", "custdist"]


def test_q22_threshold_strict_and_anti(tmp_path):
    """The global positive-balance average is a STRICT lower bound
    (a customer exactly at the mean is excluded); null balances join
    neither the average nor the filter; a recent order disqualifies;
    never-ordered rich customers survive the anti join."""
    cut = dt.datetime(2000, 9, 1)
    # positive balances: 100, 200, 300 -> avg 200
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "c_nationkey": pa.array([0, 0, 1, 1, 2], type=pa.int64()),
        "c_acctbal": pa.array([100.0, 200.0, 300.0, None, -50.0],
                              type=pa.float64())}))
    # cust 3 is rich but ordered recently -> excluded... give the
    # recent order to NOBODY first: all rich survive
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([3], type=pa.int64()),
        "o_orderdate": pa.array([dt.datetime(1999, 1, 1)], type=TS)}))
    out = q22_idle_balance(str(tmp_path), cutoff=cut)
    # only cust 3 (300 > 200); cust 2 == avg excluded (strict >)
    assert out.to_dict("records") == [
        {"c_nationkey": 1, "numcust": 1, "totacctbal": 300.0}]
    # now the same customer orders AFTER the cutoff -> anti drops them
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([3], type=pa.int64()),
        "o_orderdate": pa.array([dt.datetime(2001, 1, 1)], type=TS)}))
    out = q22_idle_balance(str(tmp_path), cutoff=cut)
    assert len(out) == 0


def test_q22_no_positive_balances_empty(tmp_path):
    """SQL's avg over zero rows is NULL and `x > NULL` admits nothing:
    the whole query answers empty, it does not divide by zero."""
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1], type=pa.int64()),
        "c_nationkey": pa.array([0], type=pa.int64()),
        "c_acctbal": pa.array([-5.0], type=pa.float64())}))
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([], type=pa.int64()),
        "o_orderdate": pa.array([], type=TS)}))
    out = q22_idle_balance(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["c_nationkey", "numcust", "totacctbal"]


def test_q15_tie_preserved_and_rounding_before_max(tmp_path):
    """TWO suppliers whose window revenues round to the same 2-dp
    maximum both return (SQL `= (SELECT max(...))` keeps ties); the
    comparison runs on the ROUNDED value on both levels, so a pair
    separated by less than half a cent is a tie, not a winner."""
    lo = dt.datetime(1996, 1, 1)
    _write(tmp_path, "lineitem", pa.table({
        "l_suppkey": pa.array([1, 2, 2, 3], type=pa.int64()),
        # supp 1: 100.004 -> 100.0; supp 2: 50.0 + 50.001 -> 100.0;
        # supp 3: 99.99 (loser)
        "l_extendedprice": pa.array([100.004, 50.0, 50.001, 99.99]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0]),
        "l_shipdate": pa.array([lo, lo, lo, lo], type=TS)}))
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"])}))
    out = q15_top_supplier(str(tmp_path))
    assert out.to_dict("records") == [
        {"s_suppkey": 1, "s_name": "S1", "total_revenue": 100.0},
        {"s_suppkey": 2, "s_name": "S2", "total_revenue": 100.0}]


def test_q15_empty_window_typed_empty(tmp_path):
    _write(tmp_path, "lineitem", pa.table({
        "l_suppkey": pa.array([1], type=pa.int64()),
        "l_extendedprice": pa.array([10.0]),
        "l_discount": pa.array([0.0]),
        "l_shipdate": pa.array([dt.datetime(1990, 1, 1)], type=TS)}))
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1], type=pa.int64()),
        "s_name": pa.array(["S1"])}))
    out = q15_top_supplier(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["s_suppkey", "s_name", "total_revenue"]


def test_q14_conditional_ratio_and_empty_window(tmp_path):
    """The promo share is branch-sum over total-sum from ONE pass;
    non-promo rows count only in the denominator; an empty window
    answers SQL's NULL ratio as a single NaN row."""
    lo = dt.datetime(1996, 6, 1)
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([1, 2, 2], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 100.0, 100.0]),
        "l_discount": pa.array([0.0, 0.5, 0.0]),
        "l_shipdate": pa.array([lo, lo,
                                dt.datetime(1990, 1, 1)], type=TS)}))
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1, 2], type=pa.int64()),
        "p_type": pa.array(["PROMO", "STANDARD"])}))
    out = q14_promo_revenue(str(tmp_path))
    # promo 100 / total 150 -> 66.6667
    assert out["promo_revenue"].tolist() == [66.6667]
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([], type=pa.int64()),
        "l_extendedprice": pa.array([], type=pa.float64()),
        "l_discount": pa.array([], type=pa.float64()),
        "l_shipdate": pa.array([], type=TS)}))
    out = q14_promo_revenue(str(tmp_path))
    assert len(out) == 1
    assert math.isnan(out["promo_revenue"].iloc[0])


def test_q17_correlated_threshold_per_part(tmp_path):
    """Each part's threshold is ITS OWN half-average quantity: a row
    exactly AT the threshold is excluded (strict <); the same quantity
    can qualify under one part and not another; wrong-brand rows never
    enter the sum or the averages."""
    from jsonschema_ray.pipelines.relational import (
        q17_small_quantity_revenue)
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1, 2, 3], type=pa.int64()),
        "p_brand": pa.array(["Brand#3", "Brand#3", "Brand#9"])}))
    # part 1: qties 10,30 -> avg 20, thr 10 -> the qty-10 row is AT the
    #   threshold (excluded), qty-30 above. Nothing qualifies.
    # part 2: qties 2,38 -> avg 20, thr 10 -> qty-2 row qualifies.
    # part 3 (wrong brand): tiny qty, never counted.
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
        "l_quantity": pa.array([10.0, 30.0, 2.0, 38.0, 1.0]),
        "l_extendedprice": pa.array([100.0, 100.0, 70.0, 100.0,
                                     999.0])}))
    out = q17_small_quantity_revenue(str(tmp_path))
    assert out["avg_yearly"].tolist() == [10.0]  # 70 / 7


def test_q17_no_qualifying_rows_null(tmp_path):
    """Zero qualifying rows: SQL's sum is NULL (NaN through pandas),
    NOT 0.0 — for a present brand with no small rows AND for an
    absent brand."""
    from jsonschema_ray.pipelines.relational import (
        q17_small_quantity_revenue)
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1], type=pa.int64()),
        "p_brand": pa.array(["Brand#3"])}))
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([1, 1], type=pa.int64()),
        "l_quantity": pa.array([20.0, 20.0]),
        "l_extendedprice": pa.array([10.0, 10.0])}))
    out = q17_small_quantity_revenue(str(tmp_path))
    assert len(out) == 1 and math.isnan(out["avg_yearly"].iloc[0])
    out = q17_small_quantity_revenue(str(tmp_path), brand="Brand#77")
    assert len(out) == 1 and math.isnan(out["avg_yearly"].iloc[0])


def test_q19_branch_predicates_do_not_cross(tmp_path):
    """A quantity valid for branch 3 does not rescue a Brand#1 row
    whose own branch rejects it; BETWEEN bounds are inclusive on both
    ends; zero matches answer SQL's NULL sum as NaN."""
    from jsonschema_ray.pipelines.relational import q19_discounted_revenue
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1, 2, 3], type=pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#3", "Brand#1"]),
        "p_size": pa.array([10, 30, 11], type=pa.int64())}))
    _write(tmp_path, "lineitem", pa.table({
        # row 1: Brand#1 size 10 qty 15 -> branch 1 inclusive hit (100)
        # row 2: Brand#1 size 10 qty 20 -> qty fits branch 3 only,
        #        brand doesn't: excluded
        # row 3: Brand#3 size 30 qty 35 -> branch 3 inclusive hit (50)
        # row 4: Brand#1 size 11 qty 15 -> size over branch-1 cap
        "l_partkey": pa.array([1, 1, 2, 3], type=pa.int64()),
        "l_quantity": pa.array([15.0, 20.0, 35.0, 15.0]),
        "l_extendedprice": pa.array([100.0, 999.0, 50.0, 999.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0])}))
    out = q19_discounted_revenue(str(tmp_path))
    assert out["revenue"].tolist() == [150.0]
    # zero matches -> NaN, not 0.0
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([1], type=pa.int64()),
        "l_quantity": pa.array([50.0]),
        "l_extendedprice": pa.array([10.0]),
        "l_discount": pa.array([0.0])}))
    out = q19_discounted_revenue(str(tmp_path))
    assert len(out) == 1 and math.isnan(out["revenue"].iloc[0])


def test_q8_share_zero_target_and_inclusive_bounds(tmp_path):
    """A year with NO target-nation volume reports share 0.0 (SQL's
    conditional sum, not a missing row); both window endpoints are
    inclusive; off-type parts and out-of-region customers never enter
    either sum."""
    from jsonschema_ray.pipelines.relational import q8_market_share
    _write(tmp_path, "region", pa.table({
        "r_regionkey": pa.array([0, 1], type=pa.int64()),
        "r_name": pa.array(["ASIA", "AFRICA"])}))
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([5, 6, 7], type=pa.int64()),
        "n_name": pa.array(["NATION_5", "NATION_6", "NATION_7"]),
        "n_regionkey": pa.array([0, 0, 1], type=pa.int64())}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 2], type=pa.int64()),
        "c_nationkey": pa.array([5, 7], type=pa.int64())}))  # 2 off-reg
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2], type=pa.int64()),
        "s_nationkey": pa.array([5, 6], type=pa.int64())}))
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1, 2], type=pa.int64()),
        "p_type": pa.array(["ECONOMY", "LARGE"])}))
    _write(tmp_path, "orders", pa.table({
        # both boundary dates inclusive; order 3 belongs to the
        # off-region customer
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_custkey": pa.array([1, 1, 2], type=pa.int64()),
        "o_orderdate": pa.array([dt.datetime(1995, 1, 1),
                                 dt.datetime(1996, 12, 31),
                                 dt.datetime(1995, 6, 1)], type=TS)}))
    _write(tmp_path, "lineitem", pa.table({
        # 1995: target supp 1 sells 100, other supp 2 sells 300 -> 0.25
        # 1996: only supp 2 (60) -> share 0.0
        # rows 4/5: off-type part / off-region order, excluded
        "l_orderkey": pa.array([1, 1, 2, 1, 3], type=pa.int64()),
        "l_partkey": pa.array([1, 1, 1, 2, 1], type=pa.int64()),
        "l_suppkey": pa.array([1, 2, 2, 1, 1], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 300.0, 60.0, 999.0, 999.0]),
        "l_discount": pa.array([0.0] * 5)}))
    out = q8_market_share(str(tmp_path))
    assert out.to_dict("records") == [
        {"o_year": 1995, "mkt_share": 0.25},
        {"o_year": 1996, "mkt_share": 0.0}]


def test_q8_unknown_nation_and_empty_region(tmp_path):
    """A target nation absent from the dimension scores 0.0 everywhere
    (SQL's CASE never fires); a region with no nations answers the
    typed empty frame."""
    from jsonschema_ray.pipelines.relational import q8_market_share
    _write(tmp_path, "region", pa.table({
        "r_regionkey": pa.array([0], type=pa.int64()),
        "r_name": pa.array(["ASIA"])}))
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([5], type=pa.int64()),
        "n_name": pa.array(["NATION_5"]),
        "n_regionkey": pa.array([0], type=pa.int64())}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1], type=pa.int64()),
        "c_nationkey": pa.array([5], type=pa.int64())}))
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1], type=pa.int64()),
        "s_nationkey": pa.array([5], type=pa.int64())}))
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1], type=pa.int64()),
        "p_type": pa.array(["ECONOMY"])}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1], type=pa.int64()),
        "o_custkey": pa.array([1], type=pa.int64()),
        "o_orderdate": pa.array([dt.datetime(1995, 2, 1)], type=TS)}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1], type=pa.int64()),
        "l_partkey": pa.array([1], type=pa.int64()),
        "l_suppkey": pa.array([1], type=pa.int64()),
        "l_extendedprice": pa.array([10.0]),
        "l_discount": pa.array([0.0])}))
    out = q8_market_share(str(tmp_path), nation="NATION_99")
    assert out.to_dict("records") == [{"o_year": 1995, "mkt_share": 0.0}]
    out = q8_market_share(str(tmp_path), region="EUROPE")
    assert len(out) == 0
    assert list(out.columns) == ["o_year", "mkt_share"]


def test_q16_distinct_per_group_and_blocklist(tmp_path):
    """A supplier shipping MANY lineitems of a brand/type counts ONCE;
    the same supplier counts separately under a second (brand, type);
    blocklisted (negative-balance) suppliers never count even when
    they ship qualifying parts; parts over the size cap are excluded."""
    from jsonschema_ray.pipelines.relational import q16_supplier_count
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
        "s_acctbal": pa.array([10.0, -1.0, 5.0])}))
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1, 2, 3], type=pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#2", "Brand#1"]),
        "p_type": pa.array(["SMALL", "SMALL", "SMALL"]),
        "p_size": pa.array([5, 10, 20], type=pa.int64())}))
    _write(tmp_path, "lineitem", pa.table({
        # supp 1 ships part 1 three times (counts once) + part 2 once;
        # supp 2 (blocklisted) ships part 1; supp 3 ships part 3
        # (size 20 > 15, excluded)
        "l_partkey": pa.array([1, 1, 1, 2, 1, 3], type=pa.int64()),
        "l_suppkey": pa.array([1, 1, 1, 1, 2, 3], type=pa.int64())}))
    out = q16_supplier_count(str(tmp_path))
    assert out.to_dict("records") == [
        {"p_brand": "Brand#1", "p_type": "SMALL", "supplier_cnt": 1},
        {"p_brand": "Brand#2", "p_type": "SMALL", "supplier_cnt": 1}]


def test_q16_all_blocklisted_typed_empty(tmp_path):
    from jsonschema_ray.pipelines.relational import q16_supplier_count
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1], type=pa.int64()),
        "s_acctbal": pa.array([-3.0])}))
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1], type=pa.int64()),
        "p_brand": pa.array(["Brand#1"]),
        "p_type": pa.array(["SMALL"]),
        "p_size": pa.array([5], type=pa.int64())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([1], type=pa.int64()),
        "l_suppkey": pa.array([1], type=pa.int64())}))
    out = q16_supplier_count(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["p_brand", "p_type", "supplier_cnt"]


def test_q21_quantifier_pair_and_per_lineitem_count(tmp_path):
    """The double quantifier: a returning supplier qualifies only on
    MULTI-supplier orders (EXISTS) where NO OTHER supplier returned
    (NOT EXISTS); the count is per qualifying LINEITEM — three returned
    items on one order contribute 3; non-finalized orders are out."""
    from jsonschema_ray.pipelines.relational import q21_lone_returner
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3", "S4"])}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([10, 20, 30, 40], type=pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "F", "O"])}))
    _write(tmp_path, "lineitem", pa.table({
        # order 10: supp 1 returns THREE items, supp 2 clean -> S1 +3
        # order 20: supp 1 and supp 2 BOTH return -> neither (NOT
        #           EXISTS fails)
        # order 30: supp 3 returns but is the ONLY supplier -> EXISTS
        #           fails
        # order 40: supp 4 returns beside a clean co-supplier but the
        #           order is open ('O') -> excluded
        "l_orderkey": pa.array([10, 10, 10, 10, 20, 20, 30, 40, 40],
                               type=pa.int64()),
        "l_suppkey": pa.array([1, 1, 1, 2, 1, 2, 3, 4, 1],
                              type=pa.int64()),
        "l_returnflag": pa.array(["R", "R", "R", "N", "R", "R", "R",
                                  "R", "N"])}))
    out = q21_lone_returner(str(tmp_path))
    assert out.to_dict("records") == [{"s_name": "S1", "numwait": 3}]


def test_q21_no_qualifiers_typed_empty(tmp_path):
    from jsonschema_ray.pipelines.relational import q21_lone_returner
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1], type=pa.int64()),
        "s_name": pa.array(["S1"])}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([10], type=pa.int64()),
        "o_orderstatus": pa.array(["F"])}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([10], type=pa.int64()),
        "l_suppkey": pa.array([1], type=pa.int64()),
        "l_returnflag": pa.array(["N"])}))
    out = q21_lone_returner(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["s_name", "numwait"]


def test_cheapest_supplier_argmin_tiebreak(tmp_path):
    """Per-part ARGMIN with SQL row_number tie-breaking: the pair min
    is the MINIMUM over that supplier's sales (not first/last); equal
    minima go to the lower supplier key; parts resolve independently."""
    from jsonschema_ray.pipelines.relational import (
        cheapest_supplier_per_part)
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"])}))
    _write(tmp_path, "lineitem", pa.table({
        # part 1: supp 2 sells at 9 then 5 (min 5), supp 1 at 6 ->
        #         supp 2 wins at 5.0
        # part 2: supp 1 and supp 3 both min at 4.0 -> tie, supp 1
        "l_partkey": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
        "l_suppkey": pa.array([2, 2, 1, 3, 1], type=pa.int64()),
        "l_extendedprice": pa.array([9.0, 5.0, 6.0, 4.0, 4.0])}))
    out = cheapest_supplier_per_part(str(tmp_path))
    assert out.to_dict("records") == [
        {"p_partkey": 1, "s_suppkey": 2, "s_name": "S2",
         "best_price": 5.0},
        {"p_partkey": 2, "s_suppkey": 1, "s_name": "S1",
         "best_price": 4.0}]


def test_cheapest_supplier_empty_typed(tmp_path):
    from jsonschema_ray.pipelines.relational import (
        cheapest_supplier_per_part)
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1], type=pa.int64()),
        "s_name": pa.array(["S1"])}))
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([], type=pa.int64()),
        "l_suppkey": pa.array([], type=pa.int64()),
        "l_extendedprice": pa.array([], type=pa.float64())}))
    out = cheapest_supplier_per_part(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["p_partkey", "s_suppkey", "s_name",
                                 "best_price"]


def test_q8_unknown_supplier_nation_excluded(tmp_path):
    """A supplier whose nationkey is ABSENT from the nation table
    contributes to NEITHER sum (SQL's inner join to nation n2 drops
    those rows) — review pin: the denominator must not keep them."""
    from jsonschema_ray.pipelines.relational import q8_market_share
    _write(tmp_path, "region", pa.table({
        "r_regionkey": pa.array([0], type=pa.int64()),
        "r_name": pa.array(["ASIA"])}))
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([5, 6], type=pa.int64()),
        "n_name": pa.array(["NATION_5", "NATION_6"]),
        "n_regionkey": pa.array([0, 0], type=pa.int64())}))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1], type=pa.int64()),
        "c_nationkey": pa.array([5], type=pa.int64())}))
    _write(tmp_path, "supplier", pa.table({
        # supp 2's nation 99 does not exist
        "s_suppkey": pa.array([1, 2], type=pa.int64()),
        "s_nationkey": pa.array([5, 99], type=pa.int64())}))
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1], type=pa.int64()),
        "p_type": pa.array(["ECONOMY"])}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1], type=pa.int64()),
        "o_custkey": pa.array([1], type=pa.int64()),
        "o_orderdate": pa.array([dt.datetime(1995, 2, 1)], type=TS)}))
    _write(tmp_path, "lineitem", pa.table({
        # target supp 1: 100; ghost-nation supp 2: 900 (dropped)
        "l_orderkey": pa.array([1, 1], type=pa.int64()),
        "l_partkey": pa.array([1, 1], type=pa.int64()),
        "l_suppkey": pa.array([1, 2], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 900.0]),
        "l_discount": pa.array([0.0, 0.0])}))
    out = q8_market_share(str(tmp_path))
    # share = 100/100, NOT 100/1000
    assert out.to_dict("records") == [{"o_year": 1995, "mkt_share": 1.0}]


def test_q16_null_suppkey_invisible(tmp_path):
    """A NULL l_suppkey row is invisible to SQL twice over (NOT IN
    with a non-empty list excludes it; count(DISTINCT) ignores NULL) —
    review pin: the anti join must not keep it as a counted group."""
    from jsonschema_ray.pipelines.relational import q16_supplier_count
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2], type=pa.int64()),
        "s_acctbal": pa.array([10.0, -1.0])}))
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1], type=pa.int64()),
        "p_brand": pa.array(["Brand#1"]),
        "p_type": pa.array(["SMALL"]),
        "p_size": pa.array([5], type=pa.int64())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([1, 1], type=pa.int64()),
        "l_suppkey": pa.array([1, None], type=pa.int64())}))
    out = q16_supplier_count(str(tmp_path))
    assert out.to_dict("records") == [
        {"p_brand": "Brand#1", "p_type": "SMALL", "supplier_cnt": 1}]


def test_events_cube_null_group_vs_rolled_level(tmp_path):
    """A REAL null event_type group stays distinct from the rolled-up
    level that also answers NULL — the grouping() markers carry the
    difference; null-ts rows are invisible; every level's counts are
    additive projections of the finest set."""
    import math as _m

    from jsonschema_ray.pipelines.relational import events_cube
    # Sunday 1995-01-01 (dow 0), Monday 1995-01-02 (dow 1)
    _write(tmp_path, "events", pa.table({
        "event_type": pa.array(["a", "a", None, None]),
        "ts": pa.array([dt.datetime(1995, 1, 1),
                        dt.datetime(1995, 1, 2),
                        dt.datetime(1995, 1, 1), None], type=TS)}))
    out = events_cube(str(tmp_path))
    assert len(out) == 8  # 3 fine + 2 types + 2 dows + 1 grand total
    fine = out[(out.g_type == 0) & (out.g_dow == 0)]
    assert len(fine) == 3  # (a,0) (a,1) (NULL,0) — null ts dropped
    null_grp = fine[fine["event_type"].isna()]
    assert null_grp["n"].tolist() == [1]
    by_type = out[(out.g_type == 0) & (out.g_dow == 1)]
    assert sorted(by_type["n"].tolist()) == [1, 2]
    assert by_type["dow"].isna().all()
    total = out[(out.g_type == 1) & (out.g_dow == 1)]
    assert total["n"].tolist() == [3]
    assert _m.isnan(total["dow"].iloc[0])


def test_string_agg_order_null_name_and_null_key(tmp_path):
    """The aggregate string is ordered BY NAME inside each group
    (order-sensitive — partials cannot combine); NULL names are
    skipped; a group with only NULL names answers NULL (not '');
    a NULL group KEY is a real SQL group."""
    from jsonschema_ray.pipelines.relational import nation_customer_names
    _write(tmp_path, "customer", pa.table({
        "c_nationkey": pa.array([1, 1, 1, 2, None], type=pa.int64()),
        "c_name": pa.array(["zeta", "alpha", None, None, "solo"])}))
    out = nation_customer_names(str(tmp_path))
    byk = {(-1 if pd.isna(r.c_nationkey) else int(r.c_nationkey)):
           r.names for r in out.itertuples()}
    assert byk[1] == "alpha,zeta"
    assert pd.isna(byk[2])
    assert byk[-1] == "solo"


def test_cheapest_supplier_null_suppkey_shadows_then_drops(tmp_path):
    """A NULL-suppkey group is a real SQL GROUP that competes in the
    per-part ranking (ORDER BY suppkey NULLS LAST): when it wins a
    part outright, the oracle's inner supplier join drops that part
    entirely — and the pipeline must neither crash on the null int64
    (the pandas-roundtrip coercion bug) nor let a pricier real
    supplier inherit the win (review pin)."""
    from jsonschema_ray.pipelines.relational import (
        cheapest_supplier_per_part)
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2], type=pa.int64()),
        "s_name": pa.array(["S1", "S2"])}))
    _write(tmp_path, "lineitem", pa.table({
        # part 1: NULL supp at 4.0 beats supp 1 at 10.0 -> part 1
        #         VANISHES (null winner dropped by the join)
        # part 2: supp 2 at 7.0 TIES the NULL supp at 7.0 -> supp 2
        #         wins (NULLS LAST), part survives
        "l_partkey": pa.array([1, 1, 2, 2], type=pa.int64()),
        "l_suppkey": pa.array([None, 1, 2, None], type=pa.int64()),
        "l_extendedprice": pa.array([4.0, 10.0, 7.0, 7.0])}))
    out = cheapest_supplier_per_part(str(tmp_path))
    assert out.to_dict("records") == [
        {"p_partkey": 2, "s_suppkey": 2, "s_name": "S2",
         "best_price": 7.0}]


def test_q21_null_suppkey_invisible_to_both_quantifiers(tmp_path):
    """A NULL-suppkey line is invisible to the WHOLE oracle (the l1
    join never matches it; l2/l3's <> evaluates NULL to UNKNOWN): it
    must neither satisfy EXISTS-another-supplier nor defeat
    NOT-EXISTS-another-returner (review pin)."""
    from jsonschema_ray.pipelines.relational import q21_lone_returner
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"])}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([10, 20], type=pa.int64()),
        "o_orderstatus": pa.array(["F", "F"])}))
    _write(tmp_path, "lineitem", pa.table({
        # order 10: supp 1 returns; the only OTHER line has NULL
        #           suppkey -> EXISTS fails, supp 1 does NOT qualify
        # order 20: supp 2 returns beside clean supp 3 AND a NULL
        #           'R' line -> the null R must not defeat NOT EXISTS
        "l_orderkey": pa.array([10, 10, 20, 20, 20], type=pa.int64()),
        "l_suppkey": pa.array([1, None, 2, 3, None], type=pa.int64()),
        "l_returnflag": pa.array(["R", "N", "R", "N", "R"])}))
    out = q21_lone_returner(str(tmp_path))
    assert out.to_dict("records") == [{"s_name": "S2", "numwait": 1}]


def test_q17_null_quantity_excluded_from_avg(tmp_path):
    """SQL's avg ignores NULL quantities: the per-part threshold
    divides by the VALID count, not count(*) (review pin — the
    deflated threshold wrongly excluded qualifying rows)."""
    from jsonschema_ray.pipelines.relational import (
        q17_small_quantity_revenue)
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1], type=pa.int64()),
        "p_brand": pa.array(["Brand#3"])}))
    # quantities [1, 5, NULL]: avg = 3 (not 2), thr = 1.5 -> the q=1
    # row qualifies; with count(*) the thr would be 1.0 and nothing
    # qualifies
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([1, 1, 1], type=pa.int64()),
        "l_quantity": pa.array([1.0, 5.0, None], type=pa.float64()),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0])}))
    out = q17_small_quantity_revenue(str(tmp_path))
    assert out["avg_yearly"].tolist() == [round(100.0 / 7.0, 2)]


def test_events_cube_empty_input_grand_total(tmp_path):
    """SQL CUBE always emits the empty grouping set: a zero-row (or
    all-null-ts) input answers the single grand-total row with n=0,
    not zero rows (review pin)."""
    from jsonschema_ray.pipelines.relational import events_cube
    _write(tmp_path, "events", pa.table({
        "event_type": pa.array(["a"]),
        "ts": pa.array([None], type=TS)}))
    out = events_cube(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (int(r.g_type), int(r.g_dow), int(r.n)) == (1, 1, 0)
    assert r.event_type is None and math.isnan(r.dow)


def test_grouped_agg_hash_equals_sort_aggregate(tmp_path):
    """Property net for the new hot helper: grouped_agg_hash must
    answer EXACTLY what grouped_agg answers (same keys, sums, count)
    on randomized multi-block tables with null group keys, null sum
    values, high-cardinality keys and repeated rows — the two physical
    plans (sort aggregate vs hash-partition + Arrow group_by) are
    interchangeable by contract."""
    import numpy as np
    import ray.data as rd

    from jsonschema_ray.pipelines.relational import (grouped_agg,
                                                     grouped_agg_hash)
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = int(rng.integers(50, 400))
        ks = rng.integers(0, max(2, n // 2), size=n).astype("int64")
        k2 = rng.integers(0, 5, size=n).astype("int64")
        vals = rng.normal(size=n) * rng.choice([0.01, 1, 1000])
        vals[rng.random(n) < 0.1] = np.nan  # null sum values
        k2_null = rng.random(n) < 0.1  # null GROUP KEYS are real groups
        tb = pa.table({
            "k": pa.array(ks),
            "k2": pa.array([None if m else int(x)
                            for m, x in zip(k2_null, k2)],
                           type=pa.int64()),
            "v": pa.array([None if np.isnan(x) else float(x)
                           for x in vals], type=pa.float64())})
        ds = rd.from_arrow(tb).repartition(int(rng.integers(1, 5)))
        a = grouped_agg(ds, ["k", "k2"], {"v": "sv"},
                        count_alias="n").to_pandas()
        b = grouped_agg_hash(ds, ["k", "k2"], {"v": "sv"},
                             count_alias="n").to_pandas()
        a = a.sort_values(["k", "k2"], na_position="last") \
            .reset_index(drop=True)
        b = b.sort_values(["k", "k2"], na_position="last") \
            .reset_index(drop=True)
        assert a["k"].tolist() == b["k"].tolist(), f"trial {trial}"
        ak2 = ["∅" if pd.isna(x) else int(x) for x in a["k2"]]
        bk2 = ["∅" if pd.isna(x) else int(x) for x in b["k2"]]
        assert ak2 == bk2
        assert a["n"].astype("int64").tolist() == \
            b["n"].astype("int64").tolist()
        av = a["sv"].to_numpy(dtype="float64")
        bv = b["sv"].to_numpy(dtype="float64")
        ok = np.isclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True)
        assert ok.all(), f"trial {trial}: {av[~ok]} vs {bv[~ok]}"


def test_q6_bounds_and_empty_null(tmp_path):
    """Q6's BETWEEN bounds are inclusive, quantity strictly below, the
    window half-open; zero matching rows answer SQL's NULL sum."""
    from jsonschema_ray.pipelines.relational import q6_forecast_revenue
    lo = dt.datetime(1996, 1, 1)
    _write(tmp_path, "lineitem", pa.table({
        "l_shipdate": pa.array([lo, lo, lo, lo,
                                dt.datetime(1997, 1, 1)], type=TS),
        "l_discount": pa.array([0.05, 0.07, 0.04, 0.05, 0.06]),
        "l_quantity": pa.array([10.0, 23.0, 10.0, 24.0, 10.0]),
        "l_extendedprice": pa.array([100.0, 200.0, 999.0, 999.0,
                                     999.0])}))
    out = q6_forecast_revenue(str(tmp_path))
    # rows 1+2 qualify: 100*0.05 + 200*0.07 = 19.0; row 3 discount
    # below band, row 4 quantity AT the cap, row 5 at the window end
    assert out["revenue"].tolist() == [19.0]
    _write(tmp_path, "lineitem", pa.table({
        "l_shipdate": pa.array([dt.datetime(1990, 1, 1)], type=TS),
        "l_discount": pa.array([0.06]),
        "l_quantity": pa.array([1.0]),
        "l_extendedprice": pa.array([1.0])}))
    out = q6_forecast_revenue(str(tmp_path))
    assert len(out) == 1 and math.isnan(out["revenue"].iloc[0])


def test_q12_priority_split_and_null_priority(tmp_path):
    """Conditional aggregation over the join: URGENT/HIGH orders count
    high, the rest low, and a NULL priority counts in NEITHER column
    (both SQL CASEs answer their ELSE on UNKNOWN)."""
    from jsonschema_ray.pipelines.relational import q12_shipmode_priority
    lo = dt.datetime(1996, 2, 1)
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_orderpriority": pa.array(["2-HIGH", "5-LOW", None])}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 2, 3, 1], type=pa.int64()),
        "l_linestatus": pa.array(["O", "O", "O", "F"]),
        "l_shipdate": pa.array([lo, lo, lo, lo], type=TS)}))
    out = q12_shipmode_priority(str(tmp_path))
    assert out.to_dict("records") == [
        {"l_linestatus": "F", "high_line_count": 1,
         "low_line_count": 0},
        {"l_linestatus": "O", "high_line_count": 1,
         "low_line_count": 1}]


def test_source_quota_rank_tiebreak_and_null_source(tmp_path):
    """Per-source quota keeps the LONGEST docs with id tie-breaking;
    a NULL source is its own capped group; NULL n_chars ranks last
    (SQL DESC NULLS LAST); the per-batch pre-prune cannot lose a
    global winner."""
    from jsonschema_ray.pipelines.relational import source_quota_documents
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(list(range(1, 9)), type=pa.int64()),
        "source": pa.array(["a", "a", "a", "a", None, None, None,
                            None]),
        # source a: lengths 10,30,30,20 -> keep 30(id2),30(id3),20(id4)
        # source NULL: 5,NULL,7,6 -> keep 7(id7),6(id8),5(id5)
        "n_chars": pa.array([10, 30, 30, 20, 5, None, 7, 6],
                            type=pa.int64())}))
    out = source_quota_documents(str(tmp_path), quota=3)
    assert sorted(out["doc_id"].tolist()) == [2, 3, 4, 5, 7, 8]


def test_hard_negative_excludes_same_label_and_self(tmp_path):
    """The label mask: same-label vectors (including the query itself
    and both-NULL label pairs — SQL IS NOT DISTINCT FROM) never
    surface; different-label vectors rank by exact cosine."""
    import numpy as np

    from jsonschema_ray.pipelines.relational import (
        ann_hard_negatives_embeddings)
    rng = np.random.default_rng(3)
    base = rng.normal(size=(8, 4))
    vecs = [list(map(float, v)) for v in base]
    # query = vec_id 0, label 'x'; ids 1,2 share 'x' (positives);
    # id 3 has NULL label (negative vs 'x'); ids 4-7 label 'y'
    _write(tmp_path, "embeddings", pa.table({
        "vec_id": pa.array(list(range(8)), type=pa.int64()),
        "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
        "label": pa.array(["x", "x", "x", None, "y", "y", "y", "y"])}))
    out = ann_hard_negatives_embeddings(str(tmp_path))
    got0 = out[out["query_id"] == 0]
    assert set(got0["vec_id"]) <= {3, 4, 5, 6, 7}
    assert 0 not in set(got0["vec_id"])
    # the NULL-label query (vec_id 3): both-NULL pairs are SAME ->
    # only labeled vectors can surface
    got3 = out[out["query_id"] == 3]
    assert 3 not in set(got3["vec_id"])
