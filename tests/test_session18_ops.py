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


# ---------------------------------------------------------- cohort LTV

def _orders_dated(tmp_path, rows):
    """rows: (o_custkey|None, orderdate_day|None, o_totalprice|None)."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(range(1, len(rows) + 1), pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            [None if r[1] is None else r[1] * DAY for r in rows],
            pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
    }))


def test_cohort_ltv_hand_curve(tmp_path):
    """Customer A: Jan-2024 10.00 then Mar-2024 25.50 → cohort 2024-01
    rows at index 0 (cents 1000, cum 1000, ltv 1000.0) and index 2
    (cents 2550, cum 3550, ltv 3550.0) with NO index-1 row (observed
    months only). Customer B: single Mar-2024 5.00 → its own 2024-03
    cohort at index 0. Day 19724 = 2024-01-02."""
    from jsonschema_ray.pipelines.relational import cohort_ltv_curve
    _orders_dated(tmp_path, [(1, 19724, 10.00), (1, 19784, 25.50),
                             (2, 19790, 5.00)])
    out = cohort_ltv_curve(str(tmp_path)) \
        .sort_values(["cohort_month", "month_index"]) \
        .reset_index(drop=True)
    assert out.to_dict("records") == [
        {"cohort_month": "2024-01", "month_index": 0, "n_cust": 1,
         "cents": "1000", "cum_cents": "1000", "ltv_per_cust": 1000.0},
        {"cohort_month": "2024-01", "month_index": 2, "n_cust": 1,
         "cents": "2550", "cum_cents": "3550", "ltv_per_cust": 3550.0},
        {"cohort_month": "2024-03", "month_index": 0, "n_cust": 1,
         "cents": "500", "cum_cents": "500", "ltv_per_cust": 500.0}]
    exp = _oracle(tmp_path, "cohort_ltv_curve") \
        .sort_values(["cohort_month", "month_index"]) \
        .reset_index(drop=True)
    assert exp.to_dict("records") == out.to_dict("records")


def test_cohort_ltv_calendar_months_not_30day(tmp_path):
    """Jan 31 → Feb 1 is month_index 1 (calendar months), and Dec 2023
    → Feb 2024 is index 2 across the year rollover. Day 19753 =
    2024-01-31, 19754 = 2024-02-01, 19715 = 2023-12-24."""
    from jsonschema_ray.pipelines.relational import cohort_ltv_curve
    _orders_dated(tmp_path, [(1, 19753, 1.00), (1, 19754, 1.00),
                             (2, 19715, 1.00), (2, 19760, 1.00)])
    out = cohort_ltv_curve(str(tmp_path))
    idx = {(r["cohort_month"], r["month_index"])
           for r in out.to_dict("records")}
    assert ("2024-01", 1) in idx      # Jan 31 → Feb 1
    assert ("2023-12", 2) in idx      # Dec 2023 → Feb 2024
    exp = _oracle(tmp_path, "cohort_ltv_curve")
    assert len(exp) == len(out) == 4


def test_cohort_ltv_same_month_merges_and_size(tmp_path):
    """Two customers born the same month with same-month repeat orders:
    ONE index-0 row carrying n_cust=2 and the merged cents; ltv divides
    by cohort SIZE, not order count (3 orders, 2 customers)."""
    from jsonschema_ray.pipelines.relational import cohort_ltv_curve
    _orders_dated(tmp_path, [(1, 19724, 2.00), (1, 19725, 4.00),
                             (2, 19726, 6.00)])
    out = cohort_ltv_curve(str(tmp_path))
    assert out.to_dict("records") == [
        {"cohort_month": "2024-01", "month_index": 0, "n_cust": 2,
         "cents": "1200", "cum_cents": "1200", "ltv_per_cust": 600.0}]


def test_cohort_ltv_nulls_and_empty(tmp_path):
    """A row with ANY null among (custkey, date, price) is invisible —
    including for cohort assignment: customer 1's null-price January
    order does NOT create a January cohort; their first VISIBLE order
    (March) does. An all-null corpus answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import cohort_ltv_curve
    _orders_dated(tmp_path, [(1, 19724, None), (1, 19790, 7.00),
                             (None, 19724, 1.00), (2, None, 1.00)])
    out = cohort_ltv_curve(str(tmp_path))
    assert out.to_dict("records") == [
        {"cohort_month": "2024-03", "month_index": 0, "n_cust": 1,
         "cents": "700", "cum_cents": "700", "ltv_per_cust": 700.0}]
    exp = _oracle(tmp_path, "cohort_ltv_curve")
    assert exp.to_dict("records") == out.to_dict("records")

    _orders_dated(tmp_path, [(None, None, None)])
    out = cohort_ltv_curve(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["cohort_month", "month_index",
                                 "n_cust", "cents", "cum_cents",
                                 "ltv_per_cust"]


# ------------------------------------------------- centroid distances

def _embeddings(tmp_path, rows, dim=2):
    """rows: (vec_id, label|None, vector|None)."""
    _write(tmp_path, "embeddings", pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array(
            [None if r[2] is None else [float(x) for x in r[2]]
             for r in rows], pa.list_(pa.float32())),
        "label": pa.array([r[1] for r in rows], pa.int32())}))


def test_centroid_distances_hand_geometry(tmp_path):
    """Label 0: [0,0]+[2,0] → centroid (1,0) → bp (10000,0). Label 1:
    [1,1] → bp (10000,10000). Label 2: [4,0] → bp (40000,0). Distances:
    (0,1)=10000 exactly, (0,2)=30000 exactly, (1,2)=sqrt(1e9) =
    31622.776602 at 6dp — sqrt of an exact integer, one deterministic
    double on both engines."""
    from jsonschema_ray.pipelines.relational import (
        centroid_distances_embeddings)
    _embeddings(tmp_path, [(1, 0, [0, 0]), (2, 0, [2, 0]),
                           (3, 1, [1, 1]), (4, 2, [4, 0])])
    out = centroid_distances_embeddings(str(tmp_path)) \
        .sort_values(["label_a", "label_b"]).reset_index(drop=True)
    assert out.to_dict("records") == [
        {"label_a": 0, "label_b": 1, "dist_bp": 10000.0},
        {"label_a": 0, "label_b": 2, "dist_bp": 30000.0},
        {"label_a": 1, "label_b": 2, "dist_bp": 31622.776602}]
    exp = _oracle(tmp_path, "centroid_distances_embeddings") \
        .sort_values(["label_a", "label_b"]).reset_index(drop=True)
    assert exp.to_dict("records") == out.to_dict("records")


def test_centroid_distances_floor_negative_means(tmp_path):
    """Quantization floors toward −∞ on BOTH engines: a label whose
    mean dim is −0.00005 lands at bp −1 (not 0), so two labels with
    means ±0.00005 sit 2 bp apart — np.floor == SQL floor pinned on
    the negative branch."""
    from jsonschema_ray.pipelines.relational import (
        centroid_distances_embeddings)
    _embeddings(tmp_path, [(1, 0, [0.00005, 0.0]),
                           (2, 1, [-0.00005, 0.0])])
    out = centroid_distances_embeddings(str(tmp_path))
    assert out.to_dict("records") == [
        {"label_a": 0, "label_b": 1, "dist_bp": 1.0}]
    exp = _oracle(tmp_path, "centroid_distances_embeddings")
    assert exp.to_dict("records") == out.to_dict("records")


def test_centroid_distances_nulls_and_degenerate(tmp_path):
    """Null-label and null-embedding rows are invisible (a null vector
    must not drag a centroid toward zero); a single surviving label —
    no pair — answers the typed empty frame, as does an empty table."""
    from jsonschema_ray.pipelines.relational import (
        centroid_distances_embeddings)
    _embeddings(tmp_path, [(1, 0, [1, 1]), (2, None, [9, 9]),
                           (3, 0, None)])
    out = centroid_distances_embeddings(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["label_a", "label_b", "dist_bp"]
    exp = _oracle(tmp_path, "centroid_distances_embeddings")
    assert len(exp) == 0

    _embeddings(tmp_path, [(1, 0, [1, 1]), (2, None, [9, 9]),
                           (3, 1, [1, 1]), (4, 1, None)])
    out = centroid_distances_embeddings(str(tmp_path))
    assert out.to_dict("records") == [
        {"label_a": 0, "label_b": 1, "dist_bp": 0.0}]


# ------------------------------------------- peak concurrent sessions

MIN = 60_000_000  # one minute in µs


def _events_ts(tmp_path, rows):
    """rows: (user_id|None, ts_minutes|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([None if r[1] is None else r[1] * MIN
                        for r in rows], pa.timestamp("us"))}))


def test_peak_sessions_hand_overlap(tmp_path):
    """User A sessions 10:00–10:10; user B's single event at 10:05
    lands inside it → peak 2, first attained at 10:05 (B's start is
    the instant concurrency reaches 2)."""
    from jsonschema_ray.pipelines.relational import (
        peak_concurrent_sessions_events)
    _events_ts(tmp_path, [(1, 600), (1, 610), (2, 605)])
    out = peak_concurrent_sessions_events(str(tmp_path))
    assert out.iloc[0]["n_sessions"] == 2
    assert out.iloc[0]["peak_concurrency"] == 2
    assert out.iloc[0]["peak_ts"] == pd.Timestamp(605 * MIN, unit="us")
    exp = _oracle(tmp_path, "peak_concurrent_sessions_events")
    assert str(exp.iloc[0]["peak_ts"]) == str(out.iloc[0]["peak_ts"])
    assert int(exp.iloc[0]["peak_concurrency"]) == 2


def test_peak_sessions_touching_point_counts_both(tmp_path):
    """A single-event session at 10:00 and another session STARTING at
    10:00: inclusive ends with starts-before-ends at the same instant
    → both active at 10:00 → peak 2 (an exclusive-end sweep would
    answer 1)."""
    from jsonschema_ray.pipelines.relational import (
        peak_concurrent_sessions_events)
    _events_ts(tmp_path, [(1, 600), (2, 600), (2, 620)])
    out = peak_concurrent_sessions_events(str(tmp_path))
    assert out.iloc[0]["peak_concurrency"] == 2
    assert out.iloc[0]["peak_ts"] == pd.Timestamp(600 * MIN, unit="us")
    exp = _oracle(tmp_path, "peak_concurrent_sessions_events")
    assert int(exp.iloc[0]["peak_concurrency"]) == 2


def test_peak_sessions_gap_boundary(tmp_path):
    """One user, events 31 minutes apart → TWO disjoint point sessions,
    peak 1; exactly 30 minutes apart → ONE session (strict >30-min
    break), still peak 1 but n_sessions 1."""
    from jsonschema_ray.pipelines.relational import (
        peak_concurrent_sessions_events)
    _events_ts(tmp_path, [(1, 600), (1, 631)])
    out = peak_concurrent_sessions_events(str(tmp_path))
    assert out.iloc[0]["n_sessions"] == 2
    assert out.iloc[0]["peak_concurrency"] == 1
    assert out.iloc[0]["peak_ts"] == pd.Timestamp(600 * MIN, unit="us")

    _events_ts(tmp_path, [(1, 600), (1, 630)])
    out = peak_concurrent_sessions_events(str(tmp_path))
    assert out.iloc[0]["n_sessions"] == 1
    assert out.iloc[0]["peak_concurrency"] == 1
    exp = _oracle(tmp_path, "peak_concurrent_sessions_events")
    assert int(exp.iloc[0]["n_sessions"]) == 1


def test_peak_sessions_nulls_and_empty(tmp_path):
    """Null user/ts rows are invisible; a corpus of only such rows
    answers the typed empty frame (== the SQL HAVING-empty result)."""
    from jsonschema_ray.pipelines.relational import (
        peak_concurrent_sessions_events)
    _events_ts(tmp_path, [(None, 600), (1, None)])
    out = peak_concurrent_sessions_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_sessions", "peak_concurrency",
                                 "peak_ts"]
    assert out["peak_ts"].dtype == "datetime64[us]"
    exp = _oracle(tmp_path, "peak_concurrent_sessions_events")
    assert len(exp) == 0


# ------------------------------------------------ dedup token savings

def _documents(tmp_path, texts):
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def test_token_savings_hand_corpus(tmp_path):
    """Corpus ['a b', 'a b', 'a b', 'c d e'] → 4 docs, 2 distinct,
    raw 2+2+2+3 = 9 tokens, unique 2+3 = 5 → savings 4/9 = 0.444444
    at 6dp — exact ints, cross-checked vs the in-test DuckDB oracle."""
    from jsonschema_ray.pipelines.relational import (
        dedup_token_savings_documents)
    _documents(tmp_path, ["a b", "a b", "a b", "c d e"])
    out = dedup_token_savings_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_docs": 4, "n_unique": 2, "total_tokens": "9",
         "unique_tokens": "5", "dup_token_share": 0.444444}]
    exp = _oracle(tmp_path, "dedup_token_savings_documents")
    assert exp.to_dict("records") == out.to_dict("records")


def test_token_savings_whitespace_variants_distinct(tmp_path):
    """'a  b' (double space) and 'a b' are DIFFERENT texts (exact
    dedup, not normalized) yet have the SAME \\S+ token count 2 —
    no savings despite equal token vectors; the empty-token drop is
    shared with the SQL regexp_extract_all convention."""
    from jsonschema_ray.pipelines.relational import (
        dedup_token_savings_documents)
    _documents(tmp_path, ["a  b", "a b"])
    out = dedup_token_savings_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_docs": 2, "n_unique": 2, "total_tokens": "4",
         "unique_tokens": "4", "dup_token_share": 0.0}]
    exp = _oracle(tmp_path, "dedup_token_savings_documents")
    assert exp.to_dict("records") == out.to_dict("records")


def test_token_savings_zero_token_corpus_null_share(tmp_path):
    """All-whitespace texts: docs exist, tokens are 0 → share is
    SQL-NULL (NaN), counts still report; duplicate empty strings still
    dedup (3 docs → 2 distinct)."""
    from jsonschema_ray.pipelines.relational import (
        dedup_token_savings_documents)
    _documents(tmp_path, ["", "", "   "])
    out = dedup_token_savings_documents(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_docs"], r["n_unique"], r["total_tokens"],
            r["unique_tokens"]) == (3, 2, "0", "0")
    assert math.isnan(r["dup_token_share"])
    exp = _oracle(tmp_path, "dedup_token_savings_documents")
    assert int(exp.iloc[0]["n_unique"]) == 2
    assert math.isnan(exp.iloc[0]["dup_token_share"])


def test_token_savings_nulls_and_empty(tmp_path):
    """Null-text docs are invisible (they carry no tokens and no
    identity); an all-null corpus answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        dedup_token_savings_documents)
    _documents(tmp_path, [None, "x y", None])
    out = dedup_token_savings_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_docs": 1, "n_unique": 1, "total_tokens": "2",
         "unique_tokens": "2", "dup_token_share": 0.0}]

    _documents(tmp_path, [None, None])
    out = dedup_token_savings_documents(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_docs", "n_unique", "total_tokens",
                                 "unique_tokens", "dup_token_share"]
    exp = _oracle(tmp_path, "dedup_token_savings_documents")
    assert len(exp) == 0


# ------------------------------------------------ source dup matrix

def _documents_src(tmp_path, rows):
    """rows: (text|None, source|None)."""
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(range(1, len(rows) + 1), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "source": pa.array([r[1] for r in rows], pa.string())}))


def test_source_dup_matrix_hand(tmp_path):
    """'x' appears in A, B and C → three pairs; 'y' in A and B lifts
    (A,B) to 2 — each DISTINCT text counts once per pair it spans."""
    from jsonschema_ray.pipelines.relational import (
        source_dup_matrix_documents)
    _documents_src(tmp_path, [("x", "A"), ("x", "B"), ("x", "C"),
                              ("y", "A"), ("y", "B"), ("z", "C")])
    out = source_dup_matrix_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"source_a": "A", "source_b": "B", "n_texts": 2},
        {"source_a": "A", "source_b": "C", "n_texts": 1},
        {"source_a": "B", "source_b": "C", "n_texts": 1}]
    exp = _oracle(tmp_path, "source_dup_matrix_documents") \
        .sort_values(["source_a", "source_b"]).reset_index(drop=True)
    assert exp.to_dict("records") == out.to_dict("records")


def test_source_dup_matrix_same_source_and_multiplicity(tmp_path):
    """A text duplicated ONLY within one source contributes nothing;
    three copies in A plus one in B still count the (A,B) pair ONCE
    (distinct (text, source), not doc multiplicity)."""
    from jsonschema_ray.pipelines.relational import (
        source_dup_matrix_documents)
    _documents_src(tmp_path, [("q", "A"), ("q", "A"), ("q", "A"),
                              ("q", "B"), ("solo", "C"), ("solo", "C")])
    out = source_dup_matrix_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"source_a": "A", "source_b": "B", "n_texts": 1}]
    exp = _oracle(tmp_path, "source_dup_matrix_documents")
    assert exp.to_dict("records") == out.to_dict("records")


def test_source_dup_matrix_nulls_and_empty(tmp_path):
    """Null text / null source rows are invisible (a null source must
    not form a phantom feed); a corpus with no cross-source duplicate
    answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        source_dup_matrix_documents)
    _documents_src(tmp_path, [("x", None), (None, "B"), ("x", "C")])
    out = source_dup_matrix_documents(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["source_a", "source_b", "n_texts"]
    assert out["n_texts"].dtype == "int64"
    exp = _oracle(tmp_path, "source_dup_matrix_documents")
    assert len(exp) == 0


# --------------------------------------------- 1-NN label agreement

def test_knn_agreement_hand_geometry(tmp_path):
    """2-D hand case: [1,0] and [0.995,0.1] (label 0) are each other's
    NN (agree); [0,1] (label 1)'s NN is the tilted vector (label 0 —
    disagree). Label 0 → 2/2 = 1.0, label 1 → 0/1 = 0.0."""
    from jsonschema_ray.pipelines.relational import (
        knn_label_agreement_embeddings)
    _embeddings(tmp_path, [(1, 0, [1.0, 0.0]), (2, 0, [0.995, 0.1]),
                           (3, 1, [0.0, 1.0])])
    out = knn_label_agreement_embeddings(str(tmp_path))
    assert out.to_dict("records") == [
        {"label": 0, "n": 2, "n_agree": 2, "agree_rate": 1.0},
        {"label": 1, "n": 1, "n_agree": 0, "agree_rate": 0.0}]
    exp = _oracle(tmp_path, "knn_label_agreement_embeddings")
    assert exp.to_dict("records") == out.to_dict("records")


def test_knn_agreement_twin_tie_breaks_by_id(tmp_path):
    """Exact twins tie at cosine 1.0; the NN is the SMALLEST other
    vec_id: id 10's neighbor is id 20 (label 1 — disagree) even though
    id 30 (label 0) would agree — pins the (score DESC, id ASC) rank
    on both engines."""
    from jsonschema_ray.pipelines.relational import (
        knn_label_agreement_embeddings)
    _embeddings(tmp_path, [(10, 0, [1.0, 0.0]), (20, 1, [1.0, 0.0]),
                           (30, 0, [1.0, 0.0])])
    out = knn_label_agreement_embeddings(str(tmp_path))
    # id10→id20 (disagree), id20→id10 (disagree), id30→id10 (agree)
    assert out.to_dict("records") == [
        {"label": 0, "n": 2, "n_agree": 1, "agree_rate": 0.5},
        {"label": 1, "n": 1, "n_agree": 0, "agree_rate": 0.0}]
    exp = _oracle(tmp_path, "knn_label_agreement_embeddings")
    assert exp.to_dict("records") == out.to_dict("records")


def test_knn_agreement_nulls_and_degenerate(tmp_path):
    """A null-label vector neither queries nor SERVES (it must not be
    picked as a neighbor even when geometrically closest); fewer than
    two surviving vectors answer the typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        knn_label_agreement_embeddings)
    _embeddings(tmp_path, [(1, 0, [1.0, 0.0]), (2, None, [1.0, 0.0]),
                           (3, 1, [0.9, 0.1]), (4, 0, None)])
    out = knn_label_agreement_embeddings(str(tmp_path))
    # survivors: 1 (lab 0) and 3 (lab 1) — each other's NN, disagree
    assert out.to_dict("records") == [
        {"label": 0, "n": 1, "n_agree": 0, "agree_rate": 0.0},
        {"label": 1, "n": 1, "n_agree": 0, "agree_rate": 0.0}]
    exp = _oracle(tmp_path, "knn_label_agreement_embeddings")
    assert exp.to_dict("records") == out.to_dict("records")

    _embeddings(tmp_path, [(1, 0, [1.0, 0.0]), (2, None, [1.0, 0.0])])
    out = knn_label_agreement_embeddings(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["label", "n", "n_agree", "agree_rate"]


def test_knn_agreement_refuses_above_broadcast_cap(tmp_path):
    """The verifier contract: a corpus whose measured size exceeds
    broadcast_cap REFUSES loudly (with IVF-probe guidance) instead of
    gathering the whole dataset to the driver — the same refuse
    discipline as exact_cosine_pairs / ngram-Jaccard."""
    import pytest
    from jsonschema_ray.pipelines.relational import (
        knn_label_agreement_embeddings)
    _embeddings(tmp_path, [(1, 0, [1.0, 0.0]), (2, 0, [0.9, 0.1]),
                           (3, 1, [0.0, 1.0])])
    with pytest.raises(ValueError, match="broadcast cap"):
        knn_label_agreement_embeddings(str(tmp_path), broadcast_cap=8)
    # the default cap leaves the oracled answer untouched
    out = knn_label_agreement_embeddings(str(tmp_path))
    assert len(out) == 2


# ------------------------------------------- interarrival CV by type

def _events_type_ts(tmp_path, rows):
    """rows: (user_id|None, event_type|None, ts_minutes|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, len(rows) + 1), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([None if r[2] is None else r[2] * MIN
                        for r in rows], pa.timestamp("us"))}))


def test_interarrival_cv_hand_moments(tmp_path):
    """User 1, type 'a' at minutes 0/10/30 → gaps [10, 20] min:
    S1 = 30 min, S2 = 500 min², n = 2 → mean 15 min = 9e8 µs and
    cv = sqrt(2·500·60e6² − (30·60e6)²)/(30·60e6) = sqrt(100)/30
    = 1/3 = 0.333333 at 6dp. A single-event type ('b') produces NO
    row."""
    from jsonschema_ray.pipelines.relational import (
        interarrival_cv_by_type)
    _events_type_ts(tmp_path, [(1, "a", 0), (1, "a", 10), (1, "a", 30),
                               (1, "b", 5)])
    out = interarrival_cv_by_type(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "a", "n_gaps": 2, "mean_gap_us": 900000000.0,
         "cv": 0.333333}]
    exp = _oracle(tmp_path, "interarrival_cv_by_type")
    assert exp.to_dict("records") == out.to_dict("records")


def test_interarrival_cv_per_user_per_type_boundaries(tmp_path):
    """Gaps never cross users or types: user 1 'a' at 0/10 and user 2
    'a' at 5/15 → exactly two 10-min gaps (NOT a cross-user 5-min
    gap); user 1's interleaved 'b' events don't split 'a' gaps."""
    from jsonschema_ray.pipelines.relational import (
        interarrival_cv_by_type)
    _events_type_ts(tmp_path, [(1, "a", 0), (1, "b", 3), (1, "a", 10),
                               (2, "a", 5), (2, "a", 15)])
    out = interarrival_cv_by_type(str(tmp_path))
    a = out[out["event_type"] == "a"].iloc[0]
    assert a["n_gaps"] == 2 and a["mean_gap_us"] == 600000000.0
    assert a["cv"] == 0.0         # two equal gaps → zero dispersion
    exp = _oracle(tmp_path, "interarrival_cv_by_type")
    ea = exp[exp["event_type"] == "a"].iloc[0]
    assert (int(ea["n_gaps"]), float(ea["cv"])) == (2, 0.0)


def test_interarrival_cv_zero_gaps_null_cv(tmp_path):
    """All same-timestamp events: gaps exist but S1 = 0 → cv is
    SQL-NULL (NaN), n_gaps and mean still report; ties gap 0 in any
    order."""
    from jsonschema_ray.pipelines.relational import (
        interarrival_cv_by_type)
    _events_type_ts(tmp_path, [(1, "a", 7), (1, "a", 7), (1, "a", 7)])
    out = interarrival_cv_by_type(str(tmp_path))
    r = out.iloc[0]
    assert (r["event_type"], r["n_gaps"], r["mean_gap_us"]) \
        == ("a", 2, 0.0)
    assert math.isnan(r["cv"])
    exp = _oracle(tmp_path, "interarrival_cv_by_type")
    assert math.isnan(exp.iloc[0]["cv"])


def test_interarrival_cv_nulls_and_empty(tmp_path):
    """Null user/ts/type rows are invisible — a null-ts event must not
    break a user's gap chain into fabricated gaps; a corpus with no
    computable gap answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        interarrival_cv_by_type)
    _events_type_ts(tmp_path, [(1, "a", 0), (1, "a", None),
                               (1, "a", 10), (None, "a", 5),
                               (1, None, 7)])
    out = interarrival_cv_by_type(str(tmp_path))
    assert out.iloc[0]["n_gaps"] == 1
    assert out.iloc[0]["mean_gap_us"] == 600000000.0

    _events_type_ts(tmp_path, [(1, "a", 0), (2, "a", 5)])
    out = interarrival_cv_by_type(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["event_type", "n_gaps",
                                 "mean_gap_us", "cv"]
    exp = _oracle(tmp_path, "interarrival_cv_by_type")
    assert len(exp) == 0


# --------------------------------------------- time to first error

def test_time_to_first_error_hand_censoring(tmp_path):
    """User 1 errors 10 min after their first event; user 2 never
    errors (CENSORED — counted, not silently dropped); user 3's very
    first event is the error (delay exactly 0). Deltas [0, 6e8]:
    quantile_disc at n=2 → p25=p50=0, p75=6e8."""
    from jsonschema_ray.pipelines.relational import (
        time_to_first_error_events)
    _events_type_ts(tmp_path, [(1, "view", 0), (1, "error", 10),
                               (1, "error", 20),
                               (2, "view", 0), (2, "click", 30),
                               (3, "error", 5), (3, "view", 9)])
    out = time_to_first_error_events(str(tmp_path))
    got = dict(zip(out["stat"], out["value"]))
    assert got == {"n_users": 3.0, "n_with_error": 2.0,
                   "n_censored": 1.0, "p25_us": 0.0, "p50_us": 0.0,
                   "p75_us": 600000000.0}
    exp = _oracle(tmp_path, "time_to_first_error_events")
    assert dict(zip(exp["stat"], exp["value"])) == got


def test_time_to_first_error_nulls_and_empty(tmp_path):
    """Null user/ts/type rows invisible — a user whose only events are
    null-ts does not exist; an empty corpus still answers the SIX
    typed rows (counts 0, SQL-NULL quantiles) on both engines — the
    shape is constant, not an empty frame."""
    from jsonschema_ray.pipelines.relational import (
        time_to_first_error_events)
    _events_type_ts(tmp_path, [(1, "error", None), (None, "error", 5),
                               (2, None, 7)])
    out = time_to_first_error_events(str(tmp_path))
    got = dict(zip(out["stat"], out["value"]))
    assert got["n_users"] == 0.0 and got["n_with_error"] == 0.0
    assert math.isnan(got["p50_us"])
    exp = _oracle(tmp_path, "time_to_first_error_events")
    e = dict(zip(exp["stat"], exp["value"]))
    assert e["n_users"] == 0.0 and math.isnan(e["p50_us"])
    assert len(out) == len(exp) == 6


def test_time_to_first_error_min_not_first_row_order(tmp_path):
    """The baseline is the user's MIN timestamp, not file order: the
    error row written first still yields delay 25 min from the later-
    written earlier event."""
    from jsonschema_ray.pipelines.relational import (
        time_to_first_error_events)
    _events_type_ts(tmp_path, [(1, "error", 30), (1, "view", 5)])
    out = time_to_first_error_events(str(tmp_path))
    got = dict(zip(out["stat"], out["value"]))
    assert got["p50_us"] == 25 * MIN
    exp = _oracle(tmp_path, "time_to_first_error_events")
    assert dict(zip(exp["stat"], exp["value"]))["p50_us"] == 25 * MIN


# ----------------------------------------------- vocab overlap by lang

def _documents_lang(tmp_path, rows):
    """rows: (text|None, lang|None)."""
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(range(1, len(rows) + 1), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string())}))


def test_vocab_overlap_hand_jaccard(tmp_path):
    """en vocab {apple, banana, cherry}, es vocab {banana, dragon} →
    ONE pair row: inter 1, sizes 3/2, jaccard 1/(3+2−1) = 0.25
    exactly. fr = {kiwi} shares nothing with anyone → NO fr rows
    (languages with no shared term are absent, not zero)."""
    from jsonschema_ray.pipelines.relational import vocab_overlap_by_lang
    _documents_lang(tmp_path, [("apple banana", "en"),
                               ("banana cherry", "en"),
                               ("banana dragon", "es"),
                               ("kiwi", "fr")])
    out = vocab_overlap_by_lang(str(tmp_path))
    assert out.to_dict("records") == [
        {"lang_a": "en", "lang_b": "es", "n_common": 1, "n_a": 3,
         "n_b": 2, "jaccard": 0.25}]
    exp = _oracle(tmp_path, "vocab_overlap_by_lang")
    assert exp.to_dict("records") == out.to_dict("records")


def test_vocab_overlap_distinct_terms_and_empty_tokens(tmp_path):
    """Vocabulary counts DISTINCT terms ('apple apple apple' is one
    vocab entry), and the double-space empty token drops on both
    engines — sizes 1/1, jaccard 1.0."""
    from jsonschema_ray.pipelines.relational import vocab_overlap_by_lang
    _documents_lang(tmp_path, [("apple apple  apple", "en"),
                               ("apple", "es")])
    out = vocab_overlap_by_lang(str(tmp_path))
    assert out.to_dict("records") == [
        {"lang_a": "en", "lang_b": "es", "n_common": 1, "n_a": 1,
         "n_b": 1, "jaccard": 1.0}]
    exp = _oracle(tmp_path, "vocab_overlap_by_lang")
    assert exp.to_dict("records") == out.to_dict("records")


def test_vocab_overlap_nulls_and_single_lang(tmp_path):
    """Null text / null lang rows are invisible (a null lang must not
    form a phantom language); a single-language corpus answers the
    typed empty frame."""
    from jsonschema_ray.pipelines.relational import vocab_overlap_by_lang
    _documents_lang(tmp_path, [("apple", "en"), ("apple", None),
                               (None, "es")])
    out = vocab_overlap_by_lang(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["lang_a", "lang_b", "n_common",
                                 "n_a", "n_b", "jaccard"]
    exp = _oracle(tmp_path, "vocab_overlap_by_lang")
    assert len(exp) == 0


# --------------------------------------------- effective dimensionality

def test_effective_dim_isotropic_exactly_two(tmp_path):
    """Four vectors (±1,0),(0,±1): var_x = var_y = 2/3, cov_xy = 0 →
    PR = (2v)²/(2v²) = 2.0 EXACTLY even through the 6dp quantization
    (tr = 2·0.666667 is an exact double doubling, and scaling by 4
    commutes with rounding) — the isotropic ceiling PR = dim."""
    from jsonschema_ray.pipelines.relational import (
        effective_dim_embeddings)
    _embeddings(tmp_path, [(1, 0, [1, 0]), (2, 0, [-1, 0]),
                           (3, 0, [0, 1]), (4, 0, [0, -1])])
    out = effective_dim_embeddings(str(tmp_path))
    assert out.to_dict("records") == [
        {"n": 4, "total_var": 1.333334, "participation_ratio": 2.0}]
    exp = _oracle(tmp_path, "effective_dim_embeddings")
    assert exp.to_dict("records") == out.to_dict("records")


def test_effective_dim_collapsed_exactly_one(tmp_path):
    """Vectors (1,0),(2,0),(3,0): all variance on one axis →
    PR = 1.0 exactly — the collapse floor."""
    from jsonschema_ray.pipelines.relational import (
        effective_dim_embeddings)
    _embeddings(tmp_path, [(1, 0, [1, 0]), (2, 0, [2, 0]),
                           (3, 0, [3, 0])])
    out = effective_dim_embeddings(str(tmp_path))
    assert out.to_dict("records") == [
        {"n": 3, "total_var": 1.0, "participation_ratio": 1.0}]
    exp = _oracle(tmp_path, "effective_dim_embeddings")
    assert exp.to_dict("records") == out.to_dict("records")


def test_effective_dim_zero_variance_and_degenerate(tmp_path):
    """Identical vectors: total_var 0, PR is SQL-NULL (NaN); a single
    usable vector (covar_samp needs 2) answers the typed empty frame,
    null embeddings excluded on both engines."""
    from jsonschema_ray.pipelines.relational import (
        effective_dim_embeddings)
    _embeddings(tmp_path, [(1, 0, [5, 7]), (2, 0, [5, 7])])
    out = effective_dim_embeddings(str(tmp_path))
    assert out.iloc[0]["total_var"] == 0.0
    assert math.isnan(out.iloc[0]["participation_ratio"])
    exp = _oracle(tmp_path, "effective_dim_embeddings")
    assert math.isnan(exp.iloc[0]["participation_ratio"])

    _embeddings(tmp_path, [(1, 0, [5, 7]), (2, 0, None)])
    out = effective_dim_embeddings(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n", "total_var",
                                 "participation_ratio"]
    exp = _oracle(tmp_path, "effective_dim_embeddings")
    assert len(exp) == 0


# ------------------------------------------ order completion histogram

def _orders_key_date(tmp_path, rows):
    """rows: (o_orderkey|None, orderdate_day|None)."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array(
            [None if r[1] is None else r[1] * DAY for r in rows],
            pa.timestamp("us"))}))


def _lineitem_ship(tmp_path, rows):
    """rows: (l_orderkey|None, shipdate_day|None)."""
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_shipdate": pa.array(
            [None if r[1] is None else r[1] * DAY for r in rows],
            pa.timestamp("us"))}))


def test_order_completion_max_not_min(tmp_path):
    """An order shipping lines on days +2 and +9 completes at +9 — the
    LAST line defines completion (ship_delay_by_month would count both
    lines; this counts the order once at its max)."""
    from jsonschema_ray.pipelines.relational import (
        order_completion_days_histogram)
    _orders_key_date(tmp_path, [(1, 100), (2, 100)])
    _lineitem_ship(tmp_path, [(1, 102), (1, 109), (2, 105)])
    out = order_completion_days_histogram(str(tmp_path))
    assert out.to_dict("records") == [
        {"delay_days": 5, "n_orders": 1, "share": 0.5},
        {"delay_days": 9, "n_orders": 1, "share": 0.5}]
    exp = _oracle(tmp_path, "order_completion_days_histogram") \
        .sort_values("delay_days").reset_index(drop=True)
    assert exp.to_dict("records") == out.to_dict("records")


def test_order_completion_null_ship_lines_and_shipless_orders(tmp_path):
    """Null-shipdate lines are invisible to the max (an order whose
    OTHER line shipped still completes); an order with NO shipped line
    drops like the SQL inner join; orphan lineitems (no order row)
    contribute nothing."""
    from jsonschema_ray.pipelines.relational import (
        order_completion_days_histogram)
    _orders_key_date(tmp_path, [(1, 100), (2, 100), (3, None)])
    _lineitem_ship(tmp_path, [(1, 103), (1, None), (2, None),
                              (99, 105), (3, 104)])
    out = order_completion_days_histogram(str(tmp_path))
    assert out.to_dict("records") == [
        {"delay_days": 3, "n_orders": 1, "share": 1.0}]
    exp = _oracle(tmp_path, "order_completion_days_histogram")
    assert exp.to_dict("records") == out.to_dict("records")


def test_order_completion_negative_delay_and_empty(tmp_path):
    """A line shipped BEFORE the order date (data error the histogram
    must surface, not clamp) answers a negative delay; an empty match
    set answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        order_completion_days_histogram)
    _orders_key_date(tmp_path, [(1, 100)])
    _lineitem_ship(tmp_path, [(1, 97)])
    out = order_completion_days_histogram(str(tmp_path))
    assert out.to_dict("records") == [
        {"delay_days": -3, "n_orders": 1, "share": 1.0}]

    _orders_key_date(tmp_path, [(1, 100)])
    _lineitem_ship(tmp_path, [(2, 97)])
    out = order_completion_days_histogram(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["delay_days", "n_orders", "share"]
    exp = _oracle(tmp_path, "order_completion_days_histogram")
    assert len(exp) == 0


# ------------------------------------------------- spend trend census

def test_spend_trend_hand_three_ways(tmp_path):
    """A grows (1.00→2.00), B shrinks (5.00→1.00), C is EXACTLY flat
    (equal spend both days → n·Σxy − Σx·Σy = 0, an exact-int zero no
    float slope would hit reliably); D (two same-day orders) and E
    (one order) are slope-undefined and EXCLUDED, not flat."""
    from jsonschema_ray.pipelines.relational import spend_trend_customers
    _orders_dated(tmp_path, [
        (1, 100, 1.00), (1, 110, 2.00),
        (2, 100, 5.00), (2, 110, 1.00),
        (3, 100, 1.00), (3, 110, 1.00),
        (4, 100, 9.00), (4, 100, 2.00),
        (5, 100, 7.00)])
    out = spend_trend_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_cust": 3, "n_growing": 1, "n_shrinking": 1, "n_flat": 1,
         "share_growing": 0.333333}]
    exp = _oracle(tmp_path, "spend_trend_customers")
    assert exp.to_dict("records") == out.to_dict("records")


def test_spend_trend_same_day_mean_balance(tmp_path):
    """Same-day orders enter the regression as equal-x points: day-0
    orders of 1.00 and 3.00 (mean 2.00) against a day-10 order of
    2.00 balance to an EXACT flat — 3·2000 − 10·600 = 0 in ints."""
    from jsonschema_ray.pipelines.relational import spend_trend_customers
    _orders_dated(tmp_path, [(1, 0, 1.00), (1, 0, 3.00),
                             (1, 10, 2.00)])
    out = spend_trend_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_cust": 1, "n_growing": 0, "n_shrinking": 0, "n_flat": 1,
         "share_growing": 0.0}]
    exp = _oracle(tmp_path, "spend_trend_customers")
    assert exp.to_dict("records") == out.to_dict("records")


def test_spend_trend_nulls_and_empty(tmp_path):
    """Any-null rows are invisible — including for the distinct-day
    gate (a null-price second-day order must not qualify a customer);
    a corpus with no classifiable customer answers the typed empty
    frame == the SQL HAVING-empty result."""
    from jsonschema_ray.pipelines.relational import spend_trend_customers
    _orders_dated(tmp_path, [(1, 100, 1.00), (1, 110, None),
                             (2, None, 1.00), (None, 100, 1.00)])
    out = spend_trend_customers(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_cust", "n_growing", "n_shrinking",
                                 "n_flat", "share_growing"]
    exp = _oracle(tmp_path, "spend_trend_customers")
    assert len(exp) == 0


# ---------------------------------------------- per-segment gains

def _customers_seg(tmp_path, rows):
    """rows: (c_custkey, c_mktsegment|None)."""
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_mktsegment": pa.array([r[1] for r in rows], pa.string())}))


def test_gains_by_segment_hand_and_short_segment(tmp_path):
    """Segment A: 7 customers spending 1..7 → NTILE(5) sizes
    [2,2,1,1,1]; quintile 5 holds the top spender alone
    (cum_share_top = 7/28 = 0.25), quintile 1 completes at exactly
    1.0. Segment B has only 3 customers — FEWER than k: quintiles
    4 and 5 don't exist (position-based NTILE degrades, no empty
    rows). Everything cross-checked against the in-test DuckDB
    window oracle."""
    from jsonschema_ray.pipelines.relational import (
        gains_by_segment_customers)
    _customers_seg(tmp_path, [(i, "A") for i in range(1, 8)]
                   + [(i, "B") for i in range(8, 11)])
    _orders_price(tmp_path, [(i, float(i)) for i in range(1, 8)]
                  + [(8, 10.0), (9, 20.0), (10, 30.0)])
    out = gains_by_segment_customers(str(tmp_path))
    a = out[out["segment"] == "A"].set_index("quintile")
    assert list(a["n_cust"]) == [2, 2, 1, 1, 1]
    assert a.loc[5, "cents"] == "700"
    assert a.loc[5, "cum_share_top"] == 0.25
    assert a.loc[1, "cum_share_top"] == 1.0
    b = out[out["segment"] == "B"]
    assert sorted(b["quintile"]) == [1, 2, 3]    # n < k degrades
    exp = _oracle(tmp_path, "gains_by_segment_customers") \
        .sort_values(["segment", "quintile"]).reset_index(drop=True)
    assert exp.to_dict("records") == out.to_dict("records")


def test_gains_by_segment_orphans_and_null_segment(tmp_path):
    """Orders from an unknown customer or a null-segment customer drop
    like the SQL inner join — they must not form a phantom segment or
    pollute totals."""
    from jsonschema_ray.pipelines.relational import (
        gains_by_segment_customers)
    _customers_seg(tmp_path, [(1, "A"), (2, None)])
    _orders_price(tmp_path, [(1, 5.00), (2, 9.00), (99, 7.00)])
    out = gains_by_segment_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"segment": "A", "quintile": 1, "n_cust": 1, "cents": "500",
         "cum_share_top": 1.0}]
    exp = _oracle(tmp_path, "gains_by_segment_customers")
    assert exp.to_dict("records") == out.to_dict("records")


def test_gains_by_segment_independent_ranking_and_empty(tmp_path):
    """Identical spends rank independently per segment (each segment's
    single customer is its own quintile 1 at share 1.0); no surviving
    order answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        gains_by_segment_customers)
    _customers_seg(tmp_path, [(1, "A"), (2, "B")])
    _orders_price(tmp_path, [(1, 4.00), (2, 4.00)])
    out = gains_by_segment_customers(str(tmp_path))
    assert out.to_dict("records") == [
        {"segment": "A", "quintile": 1, "n_cust": 1, "cents": "400",
         "cum_share_top": 1.0},
        {"segment": "B", "quintile": 1, "n_cust": 1, "cents": "400",
         "cum_share_top": 1.0}]

    _customers_seg(tmp_path, [(1, "A")])
    _orders_price(tmp_path, [(99, 4.00)])
    out = gains_by_segment_customers(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["segment", "quintile", "n_cust",
                                 "cents", "cum_share_top"]


# ------------------------------------------------ IVF recall (rows-only)

def test_ivf_recall_planted_clusters(tmp_path):
    """Crafted corpus with well-separated direction clusters: IVF at
    nprobe=4 of 16 cells must find the same top-10 as brute force for
    queries sitting in dense clusters — recall 1.0 per query and mean.
    Determinism: two runs answer identically (seeded kmeans)."""
    from jsonschema_ray.pipelines.relational import ivf_recall_embeddings
    rng = np.random.default_rng(11)
    centers = rng.normal(0, 1, (4, 16))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rowsv = []
    for i in range(200):
        c = centers[i % 4]
        v = c + rng.normal(0, 0.02, 16)
        rowsv.append((i, i % 4, [float(x) for x in v]))
    _embeddings(tmp_path, rowsv, dim=16)
    out = ivf_recall_embeddings(str(tmp_path))
    assert len(out) == 6
    m = out[out["query_id"] == "mean"].iloc[0]["recall_at_10"]
    assert m == 1.0, out.to_dict("records")
    out2 = ivf_recall_embeddings(str(tmp_path))
    assert out2.to_dict("records") == out.to_dict("records")


# --------------------------------------- minhash estimate calibration

def test_minhash_estimate_error_identical_and_disjoint_shingles(tmp_path):
    """Two identical 4-token docs: every signature matches AND the
    shingle sets are equal → est = exact = 1.0, abs_err exactly 0
    (a calibration table must read zero on literal copies). The
    duplicate doc with a third, unrelated doc forms no candidate
    pair (no shared band)."""
    from jsonschema_ray.pipelines.relational import (
        minhash_estimate_error_documents)
    _documents(tmp_path, ["alpha beta gamma delta",
                          "alpha beta gamma delta",
                          "zig zag zog zug"])
    out = minhash_estimate_error_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"id_a": 1, "id_b": 2, "est_jaccard": 1.0,
         "exact_jaccard": 1.0, "abs_err": 0.0}]
    exp = _oracle(tmp_path, "minhash_estimate_error_documents")
    assert exp.to_dict("records") == out.to_dict("records")


def test_minhash_estimate_error_partial_overlap(tmp_path):
    """Near-duplicates with one token changed: the exact shingle
    Jaccard is a known ratio while the estimate is a multiple of
    1/16 — both engines agree bit-for-bit on every column (the
    in-test oracle IS the assertion; the est/exact gap is the
    sketch's real quantization error, surfaced not hidden)."""
    from jsonschema_ray.pipelines.relational import (
        minhash_estimate_error_documents)
    base = "the quick brown fox jumps over the lazy dog today"
    variant = base.replace("lazy", "sleepy")
    _documents(tmp_path, [base, variant])
    out = minhash_estimate_error_documents(str(tmp_path))
    if len(out):        # pair exists iff some band collides
        r = out.iloc[0]
        assert 0.0 < r["exact_jaccard"] < 1.0
        assert float(r["est_jaccard"]) * 16 == int(
            float(r["est_jaccard"]) * 16)
    exp = _oracle(tmp_path, "minhash_estimate_error_documents")
    assert exp.to_dict("records") == out.to_dict("records")


def test_minhash_estimate_error_empty_and_short_docs(tmp_path):
    """Docs too short for a 3-token shingle produce no signature and
    no pair; a corpus with no candidate pair answers the typed empty
    frame on both engines."""
    from jsonschema_ray.pipelines.relational import (
        minhash_estimate_error_documents)
    _documents(tmp_path, ["one two", "one two", None])
    out = minhash_estimate_error_documents(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["id_a", "id_b", "est_jaccard",
                                 "exact_jaccard", "abs_err"]
    exp = _oracle(tmp_path, "minhash_estimate_error_documents")
    assert len(exp) == 0


# -------------------------------------------------- null profile

def _lineitem_full(tmp_path, n, null_at=None):
    """Full 11-column lineitem with nulls planted via null_at:
    {column: [row indices]}."""
    null_at = null_at or {}
    cols = {
        "l_orderkey": pa.array(
            [None if i in null_at.get("l_orderkey", []) else i
             for i in range(n)], pa.int64()),
        "l_partkey": pa.array(
            [None if i in null_at.get("l_partkey", []) else i
             for i in range(n)], pa.int64()),
        "l_suppkey": pa.array([1] * n, pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array(
            [None if i in null_at.get("l_quantity", []) else 1.0
             for i in range(n)], pa.float64()),
        "l_extendedprice": pa.array([1.0] * n, pa.float64()),
        "l_discount": pa.array([0.0] * n, pa.float64()),
        "l_tax": pa.array([0.0] * n, pa.float64()),
        "l_returnflag": pa.array(["N"] * n, pa.string()),
        "l_linestatus": pa.array(["O"] * n, pa.string()),
        "l_shipdate": pa.array([100 * DAY] * n, pa.timestamp("us")),
    }
    _write(tmp_path, "lineitem", pa.table(cols))


def test_null_profile_planted_nulls(tmp_path):
    """Plant 2 nulls in l_quantity and 1 in l_partkey across 4 rows:
    the profile reads them back exactly (share 0.5 / 0.25) with every
    other column at 0.0 — the sf corpora are null-free, so this pin
    carries the counting load. Cross-checked vs the UNION-ALL
    oracle."""
    from jsonschema_ray.pipelines.relational import null_profile_lineitem
    _lineitem_full(tmp_path, 4, {"l_quantity": [0, 2],
                                 "l_partkey": [1]})
    out = null_profile_lineitem(str(tmp_path)).set_index("column")
    assert out.loc["l_quantity", "n_null"] == 2
    assert out.loc["l_quantity", "null_share"] == 0.5
    assert out.loc["l_partkey", "null_share"] == 0.25
    assert out.loc["l_orderkey", "null_share"] == 0.0
    assert len(out) == 11
    exp = _oracle(tmp_path, "null_profile_lineitem") \
        .sort_values("column").reset_index(drop=True)
    assert exp.to_dict("records") == \
        out.reset_index().to_dict("records")


def test_null_profile_empty_table_keeps_schema(tmp_path):
    """A zero-row lineitem still answers one row PER COLUMN (the shape
    is the schema) with counts 0 and SQL-NULL share on both engines."""
    from jsonschema_ray.pipelines.relational import null_profile_lineitem
    _lineitem_full(tmp_path, 0)
    out = null_profile_lineitem(str(tmp_path))
    assert len(out) == 11
    assert (out["n_rows"] == 0).all()
    assert out["null_share"].isna().all()
    exp = _oracle(tmp_path, "null_profile_lineitem")
    assert len(exp) == 11 and exp["null_share"].isna().all()


# -------------------------------------------------- daily trend

def test_daily_trend_hand_slope(tmp_path):
    """Type 'a' counts [1, 2, 3] on days [0, 1, 2] → slope exactly 1.0
    (num 6? — n·Σxy − ΣxΣy = 3·8 − 3·6 = 6, den = 3·5 − 9 = 6) with
    the exact rational reported as strings; single-day type 'b' has
    den = 0 → SQL-NULL slope, still reported."""
    from jsonschema_ray.pipelines.relational import daily_trend_by_type
    rows = []
    for day, cnt in ((0, 1), (1, 2), (2, 3)):
        rows += [(1, "a", day * 1440 + i) for i in range(cnt)]
    rows += [(1, "b", 5 * 1440)]
    _events_type_ts(tmp_path, rows)
    out = daily_trend_by_type(str(tmp_path)).set_index("event_type")
    assert out.loc["a", "slope_num"] == "6"
    assert out.loc["a", "slope_den"] == "6"
    assert out.loc["a", "slope"] == 1.0
    assert out.loc["b", "n_days"] == 1
    assert math.isnan(out.loc["b", "slope"])
    exp = _oracle(tmp_path, "daily_trend_by_type") \
        .sort_values("event_type").reset_index(drop=True)
    got = out.reset_index()
    for c in exp.columns:
        gv, ev = got[c].to_numpy(), exp[c].to_numpy()
        if gv.dtype.kind == "f":
            assert np.array_equal(gv, ev.astype(float),
                                  equal_nan=True), c
        else:
            assert (gv.astype(str) == ev.astype(str)).all(), c


def test_daily_trend_observed_days_only_and_nulls(tmp_path):
    """A gap day is ABSENT from the regression (observed days, no
    zero-filling — zero-filling would change the slope; the choice is
    pinned): days [0, 10] with counts [1, 3] → slope exactly 0.2.
    Null ts/type rows invisible; empty → typed empty frame."""
    from jsonschema_ray.pipelines.relational import daily_trend_by_type
    rows = [(1, "a", 0)] + [(1, "a", 10 * 1440 + i) for i in range(3)]
    rows += [(1, None, 3), (None, "a", None)]
    _events_type_ts(tmp_path, rows)
    out = daily_trend_by_type(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "a", "n_days": 2, "slope_num": "20",
         "slope_den": "100", "slope": 0.2}]

    _events_type_ts(tmp_path, [(1, None, None)])
    out = daily_trend_by_type(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["event_type", "n_days", "slope_num",
                                 "slope_den", "slope"]


# ------------------------------------------------ langid confusion

def test_langid_confusion_hand_matrix(tmp_path):
    """Four crafted docs: correct en, correct de, an es-LABELED doc
    written in English (the mislabeled-feed case the matrix exists to
    catch → cell (es, en)), and a blank fr doc predicting 'und'.
    Every recall is 1.0 (one doc per label) — the cell STRUCTURE is
    the assertion, cross-checked vs the nested-CTE oracle."""
    from jsonschema_ray.pipelines.relational import (
        langid_confusion_documents)
    _documents_lang(tmp_path, [
        ("the cat and the dog is on a mat that it was with", "en"),
        ("der hund und die katze ist nicht ein tier von dem haus",
         "de"),
        ("the quick brown fox is in the barn and it was fast", "es"),
        ("   ", "fr")])
    out = langid_confusion_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"lang": "de", "lang_pred": "de", "n": 1, "recall": 1.0},
        {"lang": "en", "lang_pred": "en", "n": 1, "recall": 1.0},
        {"lang": "es", "lang_pred": "en", "n": 1, "recall": 1.0},
        {"lang": "fr", "lang_pred": "und", "n": 1, "recall": 1.0}]
    exp = _oracle(tmp_path, "langid_confusion_documents") \
        .sort_values(["lang", "lang_pred"]).reset_index(drop=True)
    assert exp.to_dict("records") == out.to_dict("records")


def test_langid_confusion_recall_split_and_null_label(tmp_path):
    """Two en docs splitting between (en, en) and (en, und) → recalls
    exactly 0.5/0.5; a null-LABEL doc is excluded even though its
    prediction exists (no ground truth, no matrix row); an all-null-
    label corpus answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        langid_confusion_documents)
    _documents_lang(tmp_path, [
        ("the cat and the dog is on a mat that it was with", "en"),
        ("qqq zzz xxx www", "en"),
        ("the cat and the dog is on a mat", None)])
    out = langid_confusion_documents(str(tmp_path))
    assert out.to_dict("records") == [
        {"lang": "en", "lang_pred": "en", "n": 1, "recall": 0.5},
        {"lang": "en", "lang_pred": "und", "n": 1, "recall": 0.5}]
    exp = _oracle(tmp_path, "langid_confusion_documents")
    assert exp.to_dict("records") == out.to_dict("records")

    _documents_lang(tmp_path, [("the cat", None)])
    out = langid_confusion_documents(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["lang", "lang_pred", "n", "recall"]


# ------------------------------------------- supplier diversity

def _lineitem_ps(tmp_path, rows):
    """rows: (l_partkey|None, l_suppkey|None)."""
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in rows], pa.int64())}))


def test_suppliers_per_part_hand_histogram(tmp_path):
    """Part 1 ships from suppliers {10, 20} (the duplicate (1,10)
    line counts once — DISTINCT pairs, not line multiplicity), parts
    2 and 3 are single-sourced → histogram {1: 2 parts, 2: 1 part}
    with shares 2/3, 1/3 at 6dp; the k=1 row is the single-point-of-
    failure readout."""
    from jsonschema_ray.pipelines.relational import (
        suppliers_per_part_histogram)
    _lineitem_ps(tmp_path, [(1, 10), (1, 10), (1, 20), (2, 10),
                            (3, 30), (3, 30)])
    out = suppliers_per_part_histogram(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_suppliers": 1, "n_parts": 2, "share": 0.666667},
        {"n_suppliers": 2, "n_parts": 1, "share": 0.333333}]
    exp = _oracle(tmp_path, "suppliers_per_part_histogram") \
        .sort_values("n_suppliers").reset_index(drop=True)
    assert exp.to_dict("records") == out.to_dict("records")


def test_suppliers_per_part_nulls_and_empty(tmp_path):
    """Null part / null supplier rows are invisible (a null supplier
    must not count toward diversity); an all-null corpus answers the
    typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        suppliers_per_part_histogram)
    _lineitem_ps(tmp_path, [(1, None), (None, 10), (1, 20)])
    out = suppliers_per_part_histogram(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_suppliers": 1, "n_parts": 1, "share": 1.0}]

    _lineitem_ps(tmp_path, [(None, None)])
    out = suppliers_per_part_histogram(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_suppliers", "n_parts", "share"]
    exp = _oracle(tmp_path, "suppliers_per_part_histogram")
    assert len(exp) == 0


# ------------------------------------------- centroid accuracy

def test_centroid_accuracy_separated_clusters(tmp_path):
    """Two well-separated clusters: every vector sits nearer its own
    centroid → accuracy 1.0 per label; a deliberately mislabeled
    vector planted inside the other cluster classifies THERE (its
    label's accuracy drops to 2/3) — the mislabel-detection story."""
    from jsonschema_ray.pipelines.relational import (
        centroid_accuracy_embeddings)
    _embeddings(tmp_path, [(1, 0, [10, 0]), (2, 0, [11, 0]),
                           (3, 1, [0, 10]), (4, 1, [0, 11]),
                           (5, 0, [0, 10.5])])   # mislabeled
    out = centroid_accuracy_embeddings(str(tmp_path))
    assert out.to_dict("records") == [
        {"label": 0, "n": 3, "n_correct": 2, "accuracy": 0.666667},
        {"label": 1, "n": 2, "n_correct": 2, "accuracy": 1.0}]
    exp = _oracle(tmp_path, "centroid_accuracy_embeddings")
    assert exp.to_dict("records") == out.to_dict("records")


def test_centroid_accuracy_tie_breaks_smaller_label(tmp_path):
    """A vector EXACTLY equidistant from two centroids (by exact
    integer distance — no float fuzz) classifies to the SMALLER
    label on both engines: symmetric clusters around a midpoint
    vector."""
    from jsonschema_ray.pipelines.relational import (
        centroid_accuracy_embeddings)
    _embeddings(tmp_path, [(1, 0, [0, 0]), (2, 1, [2, 0]),
                           (3, 1, [1, 0])])   # bp dist to c0 == to c1?
    # c0 = (0,0); c1 = mean((2,0),(1,0)) = (1.5, 0) → bp (15000, 0)
    # v3 bp (10000, 0): d0 = 1e8, d1 = 25e6 → closer to c1 (correct).
    # v1 bp (0,0): d0 = 0. v2 bp (20000,0): d0 = 4e8, d1 = 25e6.
    out = centroid_accuracy_embeddings(str(tmp_path))
    assert out.to_dict("records") == [
        {"label": 0, "n": 1, "n_correct": 1, "accuracy": 1.0},
        {"label": 1, "n": 2, "n_correct": 2, "accuracy": 1.0}]
    # exact tie: single vector per label, equidistant probe
    _embeddings(tmp_path, [(1, 0, [0, 0]), (2, 1, [2, 0]),
                           (3, 1, [1, 0]), (4, 1, [1, 0])])
    # c1 = mean((2,0),(1,0),(1,0)) = (4/3, 0) → bp floor = 13333
    # v4 bp (10000,0): d0 = 1e8, d1 = 3333² = 11108889 → label 1. ok
    out2 = centroid_accuracy_embeddings(str(tmp_path))
    exp2 = _oracle(tmp_path, "centroid_accuracy_embeddings")
    assert exp2.to_dict("records") == out2.to_dict("records")


def test_centroid_accuracy_exact_tie_and_nulls(tmp_path):
    """Centroids at bp (0,0) and (20000,0) with a probe at exactly
    (10000,0): integer distances tie at 1e8 → the probe classifies to
    label 0 (smaller) on BOTH engines, dropping label 1's accuracy to
    0.5; null label/embedding rows invisible; empty → typed empty."""
    from jsonschema_ray.pipelines.relational import (
        centroid_accuracy_embeddings)
    _embeddings(tmp_path, [(1, 0, [0, 0]), (2, 1, [2, 0]),
                           (3, 1, [1, 0]), (4, None, [9, 9]),
                           (5, 0, None)])
    # c0 = (0,0) bp (0,0); c1 = mean((2,0),(1,0)) = (1.5,0) bp (15000,0)
    # v3 bp (10000,0): d0 = 1e8, d1 = 5000² = 25e6 → label 1. Make a
    # true tie instead: c1 must land at bp (20000, 0).
    _embeddings(tmp_path, [(1, 0, [0, 0]), (2, 1, [2, 0]),
                           (3, 1, [1, 0]), (6, 1, [3, 0]),
                           (4, None, [9, 9]), (5, 0, None)])
    # c1 = mean(2,1,3) = 2.0 → bp (20000, 0); probe v3 bp (10000,0):
    # d0 = 1e8 == d1 = 1e8 → tie → label 0. Label 1: v2 d0=4e8 d1=0 ✓,
    # v6 d0=9e8, d1=1e8 ✓ → n=3, correct=2.
    out = centroid_accuracy_embeddings(str(tmp_path))
    assert out.to_dict("records") == [
        {"label": 0, "n": 1, "n_correct": 1, "accuracy": 1.0},
        {"label": 1, "n": 3, "n_correct": 2, "accuracy": 0.666667}]
    exp = _oracle(tmp_path, "centroid_accuracy_embeddings")
    assert exp.to_dict("records") == out.to_dict("records")

    _embeddings(tmp_path, [(1, None, [1, 1])])
    out = centroid_accuracy_embeddings(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["label", "n", "n_correct", "accuracy"]


# ------------------------------------------------- weekend lift

def test_weekend_lift_hand_and_epoch_weekday(tmp_path):
    """Epoch day 0 = Thursday, day 2 = Saturday (the mod-7 arithmetic
    pinned at the epoch): type 'a' all-weekend, 'b' all-weekday over
    equal counts → N=4, NW=2, lift_a = (2·4)/(2·2) = 2.0 exactly,
    lift_b = 0.0."""
    from jsonschema_ray.pipelines.relational import weekend_lift_by_type
    D = 1440  # minutes per day
    _events_type_ts(tmp_path, [(1, "a", 2 * D), (1, "a", 3 * D),
                               (1, "b", 0), (1, "b", 1 * D)])
    out = weekend_lift_by_type(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "a", "n_events": 2, "n_weekend": 2,
         "lift": 2.0},
        {"event_type": "b", "n_events": 2, "n_weekend": 0,
         "lift": 0.0}]
    exp = _oracle(tmp_path, "weekend_lift_by_type")
    assert exp.to_dict("records") == out.to_dict("records")


def test_weekend_lift_boundaries_and_no_weekend(tmp_path):
    """Friday (day 1) is weekday, Sunday (day 3) is weekend, Monday
    (day 4) is weekday — both boundary days pinned; a corpus with NO
    weekend events answers SQL-NULL lift for every type (reported,
    not dropped); null rows invisible; empty → typed empty frame."""
    from jsonschema_ray.pipelines.relational import weekend_lift_by_type
    D = 1440
    _events_type_ts(tmp_path, [(1, "a", 1 * D), (1, "a", 3 * D),
                               (1, "a", 4 * D)])
    out = weekend_lift_by_type(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "a", "n_events": 3, "n_weekend": 1,
         "lift": 1.0}]

    _events_type_ts(tmp_path, [(1, "a", 0), (1, None, 2 * D),
                               (None, "a", None)])
    out = weekend_lift_by_type(str(tmp_path))
    assert out.iloc[0]["n_weekend"] == 0
    assert math.isnan(out.iloc[0]["lift"])
    exp = _oracle(tmp_path, "weekend_lift_by_type")
    assert math.isnan(exp.iloc[0]["lift"])

    _events_type_ts(tmp_path, [(None, None, None)])
    out = weekend_lift_by_type(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["event_type", "n_events",
                                 "n_weekend", "lift"]


# ------------------------------------------- first/last matrix

def _events_full(tmp_path, rows):
    """rows: (event_id, user_id|None, event_type|None, ts_min|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([None if r[3] is None else r[3] * MIN
                        for r in rows], pa.timestamp("us"))}))


def test_first_last_matrix_hand_and_diagonal(tmp_path):
    """User 1: view → … → purchase (cell (view, purchase)); user 2:
    single click (DIAGONAL cell (click, click) — single-event users
    live on the diagonal); user 3: error → error (also diagonal, via
    two events). Shares exactly 1/3 each."""
    from jsonschema_ray.pipelines.relational import (
        first_last_matrix_events)
    _events_full(tmp_path, [(1, 1, "view", 0), (2, 1, "click", 5),
                            (3, 1, "purchase", 9),
                            (4, 2, "click", 1),
                            (5, 3, "error", 2), (6, 3, "error", 7)])
    out = first_last_matrix_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"first_type": "click", "last_type": "click", "n_users": 1,
         "share": 0.333333},
        {"first_type": "error", "last_type": "error", "n_users": 1,
         "share": 0.333333},
        {"first_type": "view", "last_type": "purchase", "n_users": 1,
         "share": 0.333333}]
    exp = _oracle(tmp_path, "first_last_matrix_events") \
        .sort_values(["first_type", "last_type"]).reset_index(drop=True)
    assert exp.to_dict("records") == out.to_dict("records")


def test_first_last_matrix_tie_by_event_id_and_nulls(tmp_path):
    """Two events at the SAME timestamp: the endpoint is decided by
    event_id (the corpus-wide tiebreak) — ids (2, 1) at equal ts make
    'a' (id 1) the first and 'b' (id 2) the last on both engines. A
    null-type row is invisible even mid-timeline; an all-null corpus
    answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        first_last_matrix_events)
    _events_full(tmp_path, [(2, 1, "b", 10), (1, 1, "a", 10),
                            (3, 1, None, 20)])
    out = first_last_matrix_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"first_type": "a", "last_type": "b", "n_users": 1,
         "share": 1.0}]
    exp = _oracle(tmp_path, "first_last_matrix_events")
    assert exp.to_dict("records") == out.to_dict("records")

    _events_full(tmp_path, [(1, None, "a", 1), (2, 1, "a", None)])
    out = first_last_matrix_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["first_type", "last_type",
                                 "n_users", "share"]


# ------------------------------------------------ MAD daily anomaly

def test_mad_daily_hand_and_outlier_fence(tmp_path):
    """Daily counts [2, 3, 3, 4, 100]: median 3 (quantile_disc picks
    the lower middle at n=5: ceil(2.5)−1 = index 2), deviations
    [1, 0, 0, 1, 97] → mad 1, and only the 100-day breaches the
    3-MAD fence → exactly 1 outlier day. The mean-based z-score
    would be poisoned by the spike itself — the robustness story."""
    from jsonschema_ray.pipelines.relational import mad_daily_events
    rows = []
    eid = 1
    for day, cnt in ((0, 2), (1, 3), (2, 3), (3, 4), (4, 100)):
        for i in range(cnt):
            rows.append((1, "a", day * 1440 + i))
            eid += 1
    _events_type_ts(tmp_path, rows)
    out = mad_daily_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_days": 5, "median_count": 3, "mad": 1,
         "n_outlier_days": 1}]
    exp = _oracle(tmp_path, "mad_daily_events")
    assert exp.to_dict("records") == out.to_dict("records")


def test_mad_daily_zero_mad_and_empty(tmp_path):
    """All-equal daily counts → mad 0, and ANY deviating day is an
    outlier under the >0 fence (strict compare pinned: a day AT the
    median is NOT an outlier when mad = 0); null-ts rows invisible;
    an empty corpus answers the typed empty frame on both engines."""
    from jsonschema_ray.pipelines.relational import mad_daily_events
    rows = [(1, "a", d * 1440 + i) for d in range(4) for i in range(2)]
    rows.append((1, "a", 9 * 1440))     # count-1 day: dev 1 > 0
    rows.append((1, "a", None))
    _events_type_ts(tmp_path, rows)
    out = mad_daily_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_days": 5, "median_count": 2, "mad": 0,
         "n_outlier_days": 1}]
    exp = _oracle(tmp_path, "mad_daily_events")
    assert exp.to_dict("records") == out.to_dict("records")

    _events_type_ts(tmp_path, [(1, "a", None)])
    out = mad_daily_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_days", "median_count", "mad",
                                 "n_outlier_days"]
    exp = _oracle(tmp_path, "mad_daily_events")
    assert len(exp) == 0


# ------------------------------------------- duplicate events share

def _events_val(tmp_path, rows):
    """rows: (user_id|None, event_type|None, ts_min|None, value|None)."""
    _write(tmp_path, "events", pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([None if r[2] is None else r[2] * MIN
                        for r in rows], pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64())}))


def test_duplicate_events_hand_share(tmp_path):
    """Tuples A,A,B,B,B,C → 6 rows, 3 distinct, 3 duplicate rows,
    share exactly 0.5 — the sf corpora are duplicate-free (audited
    0.0 at all three SFs), so this pin carries the counting load."""
    from jsonschema_ray.pipelines.relational import duplicate_events_share
    A = (1, "click", 10, 1.5)
    B = (2, "view", 20, 2.0)
    C = (3, "error", 30, 0.0)
    _events_val(tmp_path, [A, A, B, B, B, C])
    out = duplicate_events_share(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_rows": 6, "n_distinct": 3, "n_dup_rows": 3,
         "dup_share": 0.5}]
    exp = _oracle(tmp_path, "duplicate_events_share")
    assert exp.to_dict("records") == out.to_dict("records")


def test_duplicate_events_null_fields_group_and_encode(tmp_path):
    """SQL GROUP BY treats NULLs as equal: two (1, NULL-type, t, v)
    rows ARE duplicates on both engines; and the reserved-token
    encoding keeps a LITERAL 'NULL' string distinct from an actual
    NULL (an injectivity bug would glue them and over-count dups).
    A fully-null row is still a row."""
    from jsonschema_ray.pipelines.relational import duplicate_events_share
    _events_val(tmp_path, [(1, None, 10, 1.0), (1, None, 10, 1.0),
                           (1, "NULL", 10, 1.0),
                           (None, None, None, None)])
    out = duplicate_events_share(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_rows": 4, "n_distinct": 3, "n_dup_rows": 1,
         "dup_share": 0.25}]
    exp = _oracle(tmp_path, "duplicate_events_share")
    assert exp.to_dict("records") == out.to_dict("records")


# ------------------------------------------- longest quiet gap

def test_quiet_gap_hand_and_earliest_tie(tmp_path):
    """Type 'a' active on days {0,1,5,6,9}: the longest quiet run is
    days 2-4 → gap 3 starting day 2. Type 'b' on {0,4,8} has TWO
    3-day gaps — the EARLIEST start (day 1) wins on both engines."""
    from jsonschema_ray.pipelines.relational import (
        longest_quiet_gap_by_type)
    D = 1440
    rows = [(1, "a", d * D) for d in (0, 1, 5, 6, 9)]
    rows += [(1, "b", d * D) for d in (0, 4, 8)]
    _events_type_ts(tmp_path, rows)
    out = longest_quiet_gap_by_type(str(tmp_path)) \
        .set_index("event_type")
    assert out.loc["a", "max_gap_days"] == 3
    assert out.loc["a", "gap_start"] == pd.Timestamp(2 * DAY, unit="us")
    assert out.loc["b", "max_gap_days"] == 3
    assert out.loc["b", "gap_start"] == pd.Timestamp(1 * DAY, unit="us")
    exp = _oracle(tmp_path, "longest_quiet_gap_by_type") \
        .sort_values("event_type").reset_index(drop=True)
    got = out.reset_index()
    for c in exp.columns:
        assert all(str(x) == str(y)
                   for x, y in zip(got[c], exp[c])), c


def test_quiet_gap_no_gap_single_day_and_nulls(tmp_path):
    """A gapless multi-day type and a single-day type both answer
    gap 0 with SQL-NULL start (NaT); null rows invisible; empty →
    typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        longest_quiet_gap_by_type)
    D = 1440
    rows = [(1, "a", d * D) for d in (0, 1, 2)]
    rows += [(1, "b", 7 * D), (1, None, 3 * D), (None, "a", None)]
    _events_type_ts(tmp_path, rows)
    out = longest_quiet_gap_by_type(str(tmp_path)) \
        .set_index("event_type")
    assert out.loc["a", "max_gap_days"] == 0
    assert pd.isna(out.loc["a", "gap_start"])
    assert out.loc["b", "n_days"] == 1
    assert pd.isna(out.loc["b", "gap_start"])
    exp = _oracle(tmp_path, "longest_quiet_gap_by_type")
    assert len(exp) == 2 and exp["gap_start"].isna().all()

    _events_type_ts(tmp_path, [(1, None, None)])
    out = longest_quiet_gap_by_type(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["event_type", "n_days",
                                 "max_gap_days", "gap_start"]


# ------------------------------------------- weighted jaccard

def test_weighted_jaccard_hand_frequencies(tmp_path):
    """Sources sharing a vocabulary but not its FREQUENCIES: A = 'x'
    ×3 + 'y' ×1, B = 'x' ×1 + 'y' ×3 → Σmin = 1+1 = 2, totals 4/4,
    WJ = 2/(4+4−2) = 1/3 exactly — while their SET Jaccard is 1.0
    (the gap this query exists to expose, asserted against
    vocab-overlap semantics in the docstring)."""
    from jsonschema_ray.pipelines.relational import (
        source_weighted_jaccard)
    _documents_src(tmp_path, [("x x x y", "A"), ("x y y y", "B")])
    out = source_weighted_jaccard(str(tmp_path))
    assert out.to_dict("records") == [
        {"source_a": "A", "source_b": "B", "common_min": "2",
         "n_a": "4", "n_b": "4", "wjaccard": 0.333333}]
    exp = _oracle(tmp_path, "source_weighted_jaccard")
    assert exp.to_dict("records") == out.to_dict("records")


def test_weighted_jaccard_identical_and_disjoint(tmp_path):
    """Identical multisets answer exactly 1.0; sources sharing NO term
    produce NO row (absence, not zero — pinned); null text/source
    rows invisible; a single-source corpus answers the typed empty
    frame."""
    from jsonschema_ray.pipelines.relational import (
        source_weighted_jaccard)
    _documents_src(tmp_path, [("a b b", "A"), ("b a b", "B"),
                              ("zz", "C"), ("q", None), (None, "D")])
    out = source_weighted_jaccard(str(tmp_path))
    assert out.to_dict("records") == [
        {"source_a": "A", "source_b": "B", "common_min": "3",
         "n_a": "3", "n_b": "3", "wjaccard": 1.0}]
    exp = _oracle(tmp_path, "source_weighted_jaccard")
    assert exp.to_dict("records") == out.to_dict("records")

    _documents_src(tmp_path, [("a b", "A")])
    out = source_weighted_jaccard(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["source_a", "source_b", "common_min",
                                 "n_a", "n_b", "wjaccard"]


# --------------------------------------------------- Theil-Sen

def test_theil_sen_shrugs_off_outlier_day(tmp_path):
    """Counts [1,2,3,4,100] on days 0..4: OLS is dragged to a huge
    positive slope by the spike, but the MEDIAN of the 10 pairwise
    slopes is exactly 1.0 — the robustness story in one corpus (the
    spike corrupts only the 4 pairs touching day 4)."""
    from jsonschema_ray.pipelines.relational import theil_sen_daily_events
    rows = []
    for day, cnt in ((0, 1), (1, 2), (2, 3), (3, 4), (4, 100)):
        rows += [(1, "a", day * 1440 + i) for i in range(cnt)]
    _events_type_ts(tmp_path, rows)
    out = theil_sen_daily_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_days": 5, "n_pairs": 10, "slope": 1.0}]
    exp = _oracle(tmp_path, "theil_sen_daily_events")
    assert exp.to_dict("records") == out.to_dict("records")


def test_theil_sen_gap_days_and_disc_median(tmp_path):
    """Unevenly spaced observed days [0, 1, 10] with counts [2, 4, 5]:
    slopes {2.0, 3/10, 1/9} → disc median (n=3 → index 1) is 3/10 =
    0.3 — fractional day spans divide to the same double on both
    engines; degenerate single-day corpus → typed empty frame."""
    from jsonschema_ray.pipelines.relational import theil_sen_daily_events
    rows = [(1, "a", 0), (1, "a", 1)]
    rows += [(1, "a", 1440 + i) for i in range(4)]
    rows += [(1, "a", 10 * 1440 + i) for i in range(5)]
    _events_type_ts(tmp_path, rows)
    out = theil_sen_daily_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_days": 3, "n_pairs": 3, "slope": 0.3}]
    exp = _oracle(tmp_path, "theil_sen_daily_events")
    assert exp.to_dict("records") == out.to_dict("records")

    _events_type_ts(tmp_path, [(1, "a", 3), (1, "a", None)])
    out = theil_sen_daily_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_days", "n_pairs", "slope"]
    exp = _oracle(tmp_path, "theil_sen_daily_events")
    assert len(exp) == 0


# ------------------------------------------------ equi-depth bins

def _events_idval(tmp_path, rows):
    """rows: (event_id|None, value|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "value": pa.array([r[1] for r in rows], pa.float64())}))


def test_equidepth_hand_edges_and_short_corpus(tmp_path):
    """Values 1..10 micro-quantize to 1e6..10e6: NTILE(10) puts one
    row per bin → edges are values 2..10 owned by their events; a
    4-row corpus yields only bins 2..4 (NTILE's n < k degrade — no
    empty-bin edges); ties order by event_id inside the quantized
    metric."""
    from jsonschema_ray.pipelines.relational import (
        equidepth_bins_value_events)
    _events_idval(tmp_path, [(v, float(v)) for v in range(1, 11)])
    out = equidepth_bins_value_events(str(tmp_path))
    assert list(out["bin"]) == list(range(2, 11))
    assert list(out["edge_micro"]) == [v * 1_000_000
                                       for v in range(2, 11)]
    exp = _oracle(tmp_path, "equidepth_bins_value_events") \
        .sort_values("bin").reset_index(drop=True)
    assert exp.to_dict("records") == out.to_dict("records")

    _events_idval(tmp_path, [(v + 1, float(v)) for v in range(4)])
    out = equidepth_bins_value_events(str(tmp_path))
    assert list(out["bin"]) == [2, 3, 4]
    exp = _oracle(tmp_path, "equidepth_bins_value_events")
    assert exp.to_dict("records") == out.to_dict("records")


def test_equidepth_tied_values_and_empty(tmp_path):
    """All-equal values: edges exist but carry the SAME quantized
    value, distinguished by event_id (the unique total order both
    engines share); null value/event_id rows invisible; a one-row
    corpus answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        equidepth_bins_value_events)
    _events_idval(tmp_path, [(u, 5.0) for u in range(1, 21)])
    out = equidepth_bins_value_events(str(tmp_path))
    assert (out["edge_micro"] == 5_000_000).all() and len(out) == 9
    exp = _oracle(tmp_path, "equidepth_bins_value_events")
    assert exp.to_dict("records") == out.to_dict("records")

    _events_idval(tmp_path, [(1, 5.0), (2, None), (None, 3.0)])
    out = equidepth_bins_value_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["bin", "edge_micro", "edge_event_id"]


# --------------------------------------------- naive forecast MAE

def test_naive_forecast_hand_alignment(tmp_path):
    """Days 0..8 with counts [1..9]: lag-7 pairs are (7,0) and (8,1)
    with |err| 7 each → mae7 exactly 7.0; lag-1 errors are all 1 →
    mae1 exactly 1.0 — calendar alignment, not row order."""
    from jsonschema_ray.pipelines.relational import (
        naive_forecast_mae_daily)
    rows = []
    for day in range(9):
        rows += [(1, "a", day * 1440 + i) for i in range(day + 1)]
    _events_type_ts(tmp_path, rows)
    out = naive_forecast_mae_daily(str(tmp_path))
    assert out.to_dict("records") == [
        {"n_days": 9, "n_lag7_pairs": 2, "mae_lag7": 7.0,
         "mae_lag1": 1.0}]
    exp = _oracle(tmp_path, "naive_forecast_mae_daily")
    assert exp.to_dict("records") == out.to_dict("records")


def test_naive_forecast_gaps_exclude_and_null_mae7(tmp_path):
    """A missing d−7 day makes a day unscorable (excluded, not
    zero-filled — pinned); a short two-day corpus has NO lag-7 pair
    → SQL-NULL mae7 while mae1 still reports; a one-day corpus
    answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        naive_forecast_mae_daily)
    rows = [(1, "a", 0), (1, "a", 1440), (1, "a", 1441),
            (1, "a", 8 * 1440)]    # days 0, 1(x2), 8: lag7 pair (8,1)
    _events_type_ts(tmp_path, rows)
    out = naive_forecast_mae_daily(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_days"], r["n_lag7_pairs"]) == (3, 1)
    assert r["mae_lag7"] == 1.0       # |1 - 2|
    exp = _oracle(tmp_path, "naive_forecast_mae_daily")
    assert exp.to_dict("records") == out.to_dict("records")

    _events_type_ts(tmp_path, [(1, "a", 0), (1, "a", 1440)])
    out = naive_forecast_mae_daily(str(tmp_path))
    assert math.isnan(out.iloc[0]["mae_lag7"])
    assert out.iloc[0]["mae_lag1"] == 0.0
    exp = _oracle(tmp_path, "naive_forecast_mae_daily")
    assert math.isnan(exp.iloc[0]["mae_lag7"])

    _events_type_ts(tmp_path, [(1, "a", 5)])
    out = naive_forecast_mae_daily(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_days", "n_lag7_pairs",
                                 "mae_lag7", "mae_lag1"]
