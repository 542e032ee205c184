"""Session-12 operators: TPC-H Q9 shape (5-table profit rollup grouped
by nation NAME and order year) and Q20 shape (dominant-share supplier
via a per-part windowed threshold) — crafted edge branches; the sf
oracles run in test_driver_contract / the driver harness. The testdata
star carries no nulls in these columns, so every NULL branch here is
pin-covered ONLY by these crafted tables."""

import datetime as dt
import math
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_ray.pipelines.relational import (q9_product_profit,
                                                 q20_dominant_supplier)

pytestmark = pytest.mark.usefixtures("ray_session")

TS = pa.timestamp("us")


def _write(tmp_path, name, tb):
    pq.write_table(tb, os.path.join(str(tmp_path), f"{name}.parquet"))


def _q9_star(tmp_path, *, orders_dates, li_rows, nations,
             supp_rows=None):
    """li_rows: (orderkey, partkey, suppkey, qty, extprice, disc).
    orders_dates: {orderkey: datetime|None}.
    nations: [(nationkey, name)]. supp_rows: [(suppkey, nationkey)]."""
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        # part 2 never matches the name family
        "p_name": pa.array(["dark red metal", "ivory blue"]),
        "p_retailprice": pa.array([10.0, 99.0], pa.float64())}))
    supp_rows = supp_rows or [(1, 0), (2, 1)]
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([r[0] for r in supp_rows], pa.int64()),
        "s_nationkey": pa.array([r[1] for r in supp_rows],
                                pa.int64())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in li_rows], pa.int64()),
        "l_suppkey": pa.array([r[2] for r in li_rows], pa.int64()),
        "l_quantity": pa.array([r[3] for r in li_rows], pa.float64()),
        "l_extendedprice": pa.array([r[4] for r in li_rows],
                                    pa.float64()),
        "l_discount": pa.array([r[5] for r in li_rows], pa.float64())}))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(list(orders_dates), pa.int64()),
        "o_orderdate": pa.array(list(orders_dates.values()), TS)}))
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([n[0] for n in nations], pa.int64()),
        "n_name": pa.array([n[1] for n in nations])}))
    return str(tmp_path)


def test_q9_null_year_group_and_name_merge(tmp_path):
    """A NULL o_orderdate forms a real (nation, NULL-year) group and
    o_year gathers float64+NaN (the DuckDB pandas canon); TWO
    nationkeys sharing one name MERGE into a single output group (SQL
    groups by the NAME, not the key); the non-matching part family is
    invisible; amount follows the exact SQL expression tree."""
    sf = _q9_star(
        tmp_path,
        orders_dates={10: dt.datetime(1995, 3, 1),
                      11: dt.datetime(1995, 7, 9), 12: None},
        li_rows=[
            # suppkey 1 -> nationkey 0, suppkey 2 -> nationkey 1, and
            # nations 0 and 1 SHARE the name 'ALPHA': 1995 merges.
            # amount = ext*(1-disc) - 0.1*retail*qty, retail=10.0
            (10, 1, 1, 2.0, 100.0, 0.1),   # 90 - 2 = 88
            (11, 1, 2, 1.0, 50.0, 0.0),    # 50 - 1 = 49
            (12, 1, 1, 1.0, 10.0, 0.0),    # NULL year: 10 - 1 = 9
            (10, 2, 1, 5.0, 999.0, 0.0),   # part 2: name-pruned
        ],
        nations=[(0, "ALPHA"), (1, "ALPHA")])
    out = q9_product_profit(sf)
    assert out["o_year"].dtype == "float64"
    recs = out.to_dict("records")
    assert len(recs) == 2
    # ORDER BY nation, o_year DESC puts the real year first, NaN
    # placement aside we assert by value:
    real = [r for r in recs if not math.isnan(r["o_year"])][0]
    nullrow = [r for r in recs if math.isnan(r["o_year"])][0]
    assert real == {"nation": "ALPHA", "o_year": 1995.0,
                    "sum_profit": 137.0}
    assert nullrow["nation"] == "ALPHA"
    assert nullrow["sum_profit"] == 9.0


def test_q9_all_null_amount_group_is_null(tmp_path):
    """SQL's sum over an all-NULL amount group is NULL (round(NULL)=
    NULL): a group whose every amount is NULL (null discount) answers
    NaN, not 0.0 — the pandas min_count pin."""
    sf = _q9_star(
        tmp_path,
        orders_dates={10: dt.datetime(1995, 3, 1),
                      11: dt.datetime(1996, 3, 1)},
        li_rows=[
            (10, 1, 1, 1.0, 100.0, None),   # NULL amount only, 1995
            (11, 1, 1, 1.0, 100.0, 0.0),    # real amount 99.0, 1996
        ],
        nations=[(0, "A"), (1, "B")])
    out = q9_product_profit(sf)
    assert len(out) == 2
    by_year = {r["o_year"]: r["sum_profit"]
               for r in out.to_dict("records")}
    assert by_year[1996] == 99.0
    assert math.isnan(by_year[1995])


def test_q9_ghost_nation_supplier_invisible(tmp_path):
    """A supplier whose nationkey is absent from the nation dimension
    is dropped by the inner join — it contributes NO group at all."""
    sf = _q9_star(
        tmp_path,
        orders_dates={10: dt.datetime(1995, 3, 1)},
        li_rows=[(10, 1, 2, 1.0, 100.0, 0.0)],   # suppkey 2 -> nat 1
        nations=[(0, "A")],                      # nation 1 missing
        supp_rows=[(1, 0), (2, 1)])
    out = q9_product_profit(sf)
    assert len(out) == 0
    assert list(out.columns) == ["nation", "o_year", "sum_profit"]


def test_q9_no_matching_parts_typed_empty(tmp_path):
    sf = _q9_star(
        tmp_path,
        orders_dates={10: dt.datetime(1995, 3, 1)},
        li_rows=[(10, 2, 1, 1.0, 100.0, 0.0)],
        nations=[(0, "A")])
    out = q9_product_profit(sf, name_frag="zzz-no-such-family")
    assert len(out) == 0
    assert list(out.columns) == ["nation", "o_year", "sum_profit"]


def _q20_star(tmp_path, li_rows, *, sizes=None, supp=None):
    """li_rows: (partkey, suppkey|None, qty|None, shipdate)."""
    sizes = sizes or [(1, 50), (2, 50), (3, 10)]
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([s[0] for s in sizes], pa.int64()),
        "p_size": pa.array([s[1] for s in sizes], pa.int64())}))
    supp = supp or [(1, "Supp#1", 10.0), (2, "Supp#2", 20.0),
                    (3, "Supp#3", 30.0)]
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([s[0] for s in supp], pa.int64()),
        "s_name": pa.array([s[1] for s in supp]),
        "s_acctbal": pa.array([s[2] for s in supp], pa.float64())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li_rows], pa.int64()),
        "l_quantity": pa.array([r[2] for r in li_rows], pa.float64()),
        "l_shipdate": pa.array([r[3] for r in li_rows], TS)}))
    return str(tmp_path)


IN_W = dt.datetime(1995, 6, 1)
OUT_W = dt.datetime(1999, 1, 1)


def test_q20_strict_half_and_null_suppkey_absorbs(tmp_path):
    """Exactly half the part total does NOT qualify (strict >); a
    NULL-suppkey line's quantity still counts toward the part total
    (the SQL window sums it) yet the NULL group itself can never
    qualify; out-of-window and small-part lines are invisible."""
    sf = _q20_star(tmp_path, [
        # part 1: supp 1 has 10, supp 2 has 10 -> each exactly half,
        # NOBODY qualifies
        (1, 1, 10.0, IN_W), (1, 2, 10.0, IN_W),
        # part 2: supp 1 has 12, NULL-suppkey line has 8 -> total 20,
        # 12 > 10 qualifies; the NULL group (8) never appears
        (2, 1, 12.0, IN_W), (2, None, 8.0, IN_W),
        # out-of-window monster for supp 3 on part 1: invisible
        (1, 3, 1000.0, OUT_W),
        # small part 3 (size 10 < 40): invisible
        (3, 3, 1000.0, IN_W),
    ])
    out = q20_dominant_supplier(sf)
    assert out.to_dict("records") == [
        {"s_name": "Supp#1", "s_acctbal": 10.0}]


def test_q20_null_quantity_pair_never_qualifies(tmp_path):
    """A pair whose every quantity is NULL has q = NULL: the > compare
    is UNKNOWN on both engines and it cannot qualify even when it is
    the only supplier of the part; NULL quantities add nothing to the
    total either."""
    sf = _q20_star(tmp_path, [
        (1, 1, None, IN_W), (1, 1, None, IN_W),
        # part 2: supp 2 dominates a real total despite a null line
        (2, 2, 5.0, IN_W), (2, 2, None, IN_W), (2, 3, 1.0, IN_W),
    ])
    out = q20_dominant_supplier(sf)
    assert out.to_dict("records") == [
        {"s_name": "Supp#2", "s_acctbal": 20.0}]


def test_q20_dedup_across_parts(tmp_path):
    """A supplier dominant on TWO parts returns ONCE (IN semantics)."""
    sf = _q20_star(tmp_path, [
        (1, 1, 10.0, IN_W), (1, 2, 1.0, IN_W),
        (2, 1, 10.0, IN_W), (2, 3, 1.0, IN_W),
    ])
    out = q20_dominant_supplier(sf)
    assert out.to_dict("records") == [
        {"s_name": "Supp#1", "s_acctbal": 10.0}]


def test_q20_no_large_parts_typed_empty(tmp_path):
    sf = _q20_star(tmp_path, [(1, 1, 10.0, IN_W)],
                   sizes=[(1, 5), (2, 5), (3, 5)])
    out = q20_dominant_supplier(sf)
    assert len(out) == 0
    assert list(out.columns) == ["s_name", "s_acctbal"]
