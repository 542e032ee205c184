"""Session-18 operators — crafted edge branches the sf oracles can't
reach. The sf-scale value oracles run in test_driver_contract and were
hand-verified at sf0.001/0.01/0.1 against DuckDB."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_ray.pipelines.relational import gini_spend_customers

pytestmark = pytest.mark.usefixtures("ray_session")

DAY = 86_400_000_000  # one day in µs


def _write(tmp_path, name, tb):
    pq.write_table(tb, os.path.join(str(tmp_path), f"{name}.parquet"))


def _orders_price(tmp_path, rows):
    """rows: (o_custkey|None, o_totalprice|None)."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r[1] for r in rows], pa.float64()),
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


# ---------------------------------------------------------------- gini

def test_gini_hand_two_customers(tmp_path):
    """Spends 1.00 and 3.00 → x=[100,300]: S1 = 1·100 + 2·300 = 700,
    num = 2·700 − 3·400 = 200, den = 2·400 = 800 → G = 0.25 exactly
    (the mean-absolute-difference definition: Σ|xi−xj|/(2n²μ) =
    400/(2·4·200) = 0.25)."""
    _orders_price(tmp_path, [(1, 1.00), (2, 3.00)])
    out = gini_spend_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_cust": 2, "total_cents": "400", "gini": 0.25}]
    exp = _oracle(tmp_path, "gini_spend_customers")
    assert exp.to_dict("records") == out.to_dict("records")


def test_gini_equal_spend_zero_and_single_customer(tmp_path):
    """All-equal spends answer exactly 0.0 (no inequality), as does a
    single customer (n=1 → num = 2x − 2x = 0)."""
    _orders_price(tmp_path, [(1, 5.00), (2, 5.00), (3, 5.00)])
    out = gini_spend_customers(str(tmp_path))
    assert out.iloc[0]["gini"] == 0.0 and out.iloc[0]["n_cust"] == 3

    _orders_price(tmp_path, [(7, 123.45)])
    out = gini_spend_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_cust": 1, "total_cents": "12345", "gini": 0.0}]


def test_gini_perfect_concentration(tmp_path):
    """[0, 0, 0, X] → G = (n−1)/n = 0.75 exactly; the zero-spend
    customers still count (they are customers of the orders table with
    zero-priced orders, not absent rows)."""
    _orders_price(tmp_path, [(1, 0.0), (2, 0.0), (3, 0.0), (4, 10.0)])
    out = gini_spend_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_cust": 4, "total_cents": "1000", "gini": 0.75}]
    exp = _oracle(tmp_path, "gini_spend_customers")
    assert exp.to_dict("records") == out.to_dict("records")


def test_gini_aggregates_per_customer_first(tmp_path):
    """One customer with two 1.00 orders and one with a single 2.00
    order are EQUAL spenders (G=0) — the rank runs over per-customer
    totals, not order rows (order-row Gini would be 1/6 ≈ 0.1667)."""
    _orders_price(tmp_path, [(1, 1.00), (1, 1.00), (2, 2.00)])
    out = gini_spend_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_cust": 2, "total_cents": "400", "gini": 0.0}]


def test_gini_null_rows_invisible_and_empty(tmp_path):
    """Null custkey / null price rows are invisible; a corpus with only
    such rows answers the typed empty frame (matching the SQL HAVING
    count(*) > 0 empty result)."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([None, 5, None], pa.int64()),
        "o_totalprice": pa.array([10.0, None, None], pa.float64())}))
    out = gini_spend_customers(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_cust", "total_cents", "gini"]
    assert out["n_cust"].dtype == "int64"
    assert out["gini"].dtype == "float64"
    exp = _oracle(tmp_path, "gini_spend_customers")
    assert len(exp) == 0


def test_gini_zero_revenue_corpus_null(tmp_path):
    """Customers exist but every order is 0.00: the denominator n·Σx
    is 0 → gini is SQL-NULL (NaN on the pandas side), n_cust and
    total_cents still report."""
    _orders_price(tmp_path, [(1, 0.0), (2, 0.0)])
    out = gini_spend_customers(str(tmp_path))
    assert out.iloc[0]["n_cust"] == 2
    assert out.iloc[0]["total_cents"] == "0"
    assert math.isnan(out.iloc[0]["gini"])
    exp = _oracle(tmp_path, "gini_spend_customers")
    assert exp.iloc[0]["n_cust"] == 2 and math.isnan(exp.iloc[0]["gini"])


def test_gini_tie_rank_invariance(tmp_path):
    """Σi·x is invariant under permuting tied spends: two corpora with
    the tied customers written in opposite row orders answer the same
    gini (the (spend, custkey) tie order is deterministic but not
    load-bearing)."""
    _orders_price(tmp_path, [(1, 2.00), (2, 2.00), (3, 9.00)])
    a = gini_spend_customers(str(tmp_path))
    _orders_price(tmp_path, [(2, 2.00), (3, 9.00), (1, 2.00)])
    b = gini_spend_customers(str(tmp_path))
    assert a.to_dict("records") == b.to_dict("records")
