"""Session-15 operators: CUSUM change-point statistic and 7-day rolling
median over the shared dense daily grid — crafted edge branches the sf
oracles can't reach (constant series, max-deviation ties, calendar
gaps, null rows, window ramps). The sf-scale value oracles run in
test_driver_contract and were hand-verified at sf0.001/0.01/0.1."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_ray.pipelines.relational import (
    bigram_logprob_documents, cusum_daily_events,
    mode_quantity_by_flag, rolling_median_daily_events,
    spend_deciles_customers)

pytestmark = pytest.mark.usefixtures("ray_session")

DAY = 86_400_000_000  # one day in µs


def _write(tmp_path, name, tb):
    pq.write_table(tb, os.path.join(str(tmp_path), f"{name}.parquet"))


def _events(tmp_path, rows):
    """rows: (event_id, user_id|None, ts_us|None, event_type|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }))


def _oracle(tmp_path, name):
    import duckdb

    import __ray_entry__ as E
    con = duckdb.connect()
    for t in ("events", "documents", "lineitem", "orders",
              "customer", "supplier", "nation", "region", "part"):
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


# ---------------------------------------------------------------------------
# cusum_daily_events


def test_cusum_constant_series_is_zero_earliest_day(tmp_path):
    """A perfectly uniform series has EVERY deviation 0 — the max tie
    covers the whole grid and both engines resolve it to the FIRST
    day (np.argmax first-hit == SQL min(d))."""
    _events(tmp_path, [
        (i + 1, 1, i * DAY, "click") for i in range(4)])
    got = cusum_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "cusum_daily_events")
    _frames_equal(got, exp, ["event_type"])
    assert got["cusum"].tolist() == [0.0]
    assert got["change_day"].tolist() == ["1970-01-01"]


def test_cusum_step_change_locates_boundary(tmp_path):
    """Counts [0,0,10,10]: |nn·s − k·tot| = [20,40,20,0] → max 40 on
    the LAST pre-change day, cusum 40/4 = 10.0 — the change-point
    lands on the boundary, not the spike itself."""
    rows = []
    eid = 1
    for d in (2, 3):
        for _ in range(10):
            rows.append((eid, 1, d * DAY, "click"))
            eid += 1
    # pin the grid's left edge with a DIFFERENT type on day 0
    rows.append((eid, 2, 0, "view"))
    _events(tmp_path, rows)
    got = cusum_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "cusum_daily_events")
    _frames_equal(got, exp, ["event_type"])
    d = dict(zip(got["event_type"],
                 zip(got["cusum"], got["change_day"])))
    assert d["click"] == (10.0, "1970-01-02")


def test_cusum_calendar_gap_zero_fills(tmp_path):
    """Events on day0 (3×) and day3 (1×) only: the two gap days MUST
    enter as zeros — [3,0,0,1] → deviations [8,4,0,0]/4 → cusum 2.0
    at day0. Dropping the gap would answer a different statistic."""
    _events(tmp_path, [
        (1, 1, 0, "click"), (2, 1, 1000, "click"), (3, 1, 2000, "click"),
        (4, 1, 3 * DAY, "click")])
    got = cusum_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "cusum_daily_events")
    _frames_equal(got, exp, ["event_type"])
    assert got["cusum"].tolist() == [2.0]
    assert got["change_day"].tolist() == ["1970-01-01"]


def test_cusum_tie_resolves_earliest_and_nulls_invisible(tmp_path):
    """Symmetric series [5,0,0,5] ties the max deviation (10) at day0
    and day2 — both engines answer the EARLIEST. Null-ts and
    null-type rows leave before the grid on both engines."""
    rows = [(i + 1, 1, i % 5 * 1000, "click") for i in range(5)]
    rows += [(i + 6, 1, 3 * DAY + i * 1000, "click") for i in range(5)]
    rows.append((11, 1, None, "click"))       # null ts: invisible
    rows.append((12, 1, 2 * DAY, None))       # null type: invisible
    _events(tmp_path, rows)
    got = cusum_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "cusum_daily_events")
    _frames_equal(got, exp, ["event_type"])
    assert got["cusum"].tolist() == [2.5]
    assert got["change_day"].tolist() == ["1970-01-01"]


def test_cusum_global_grid_spans_all_types(tmp_path):
    """The grid is GLOBAL (corpus min..max day), not per-type: a type
    first seen on the last day still accumulates deviation over the
    early zero days ([0,0,0,1] → max 3/4 at day2)."""
    _events(tmp_path, [
        (1, 1, 0, "view"), (2, 1, 1 * DAY, "view"),
        (3, 2, 3 * DAY, "click")])
    got = cusum_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "cusum_daily_events")
    _frames_equal(got, exp, ["event_type"])
    d = dict(zip(got["event_type"],
                 zip(got["cusum"], got["change_day"])))
    assert d["click"] == (0.75, "1970-01-03")
    assert d["view"] == (1.0, "1970-01-02")


# ---------------------------------------------------------------------------
# rolling_median_daily_events


def test_rolling_median_ramp_and_interpolation(tmp_path):
    """Counts [1,2,10,0]: med7 = [1, 1.5, 2, 1.5] — the shrinking
    leading frame (min_periods=1 == ROWS 6 PRECEDING ramp) and the
    exact (a+b)/2 even-count interpolation, on both engines."""
    rows = []
    eid = 1
    for d, c in [(0, 1), (1, 2), (2, 10)]:
        for _ in range(c):
            rows.append((eid, 1, d * DAY + eid, "click"))
            eid += 1
    # day-3 zero comes from the GLOBAL grid: a different type anchors
    # the calendar's right edge (zero-count days only exist inside the
    # observed min..max range)
    rows.append((eid, 2, 3 * DAY, "view"))
    _events(tmp_path, rows)
    got = rolling_median_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "rolling_median_daily_events")
    _frames_equal(got, exp, ["event_type", "day"])
    ck = got[got["event_type"] == "click"]
    assert ck["med7"].tolist() == [1.0, 1.5, 2.0, 1.5]
    assert ck["n"].tolist() == [1, 2, 10, 0]


def test_rolling_median_window_slides_out_and_gap_zero_fills(tmp_path):
    """8-day series with events only on day0 (7×) and day7 (1×): day7's
    window covers days1..7 = six gap ZEROS + 1 → median 0.0; day0's
    spike has fully slid out. A robust line the mean can't draw."""
    rows = [(i + 1, 1, i * 1000, "click") for i in range(7)]
    rows.append((8, 1, 7 * DAY, "click"))
    _events(tmp_path, rows)
    got = rolling_median_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "rolling_median_daily_events")
    _frames_equal(got, exp, ["event_type", "day"])
    assert got["n"].tolist() == [7, 0, 0, 0, 0, 0, 0, 1]
    # day0: [7] → 7; day1: [7,0] → 3.5; day7: [0×6,1] → 0
    assert got["med7"].tolist() == [7.0, 3.5, 0.0, 0.0, 0.0, 0.0,
                                    0.0, 0.0]


def test_rolling_median_types_share_grid(tmp_path):
    """Two types share the global calendar: each gets the full dense
    grid and its own independent rolling window."""
    _events(tmp_path, [
        (1, 1, 0, "view"), (2, 1, 0, "view"),
        (3, 2, 2 * DAY, "click")])
    got = rolling_median_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "rolling_median_daily_events")
    _frames_equal(got, exp, ["event_type", "day"])
    assert len(got) == 6  # 2 types × 3 days
    v = got[got["event_type"] == "view"]["med7"].tolist()
    c = got[got["event_type"] == "click"]["med7"].tolist()
    assert v == [2.0, 1.0, 0.0]
    assert c == [0.0, 0.0, 0.0]


# ---------------------------------------------------------------------------
# bigram_logprob_documents


def _docs(tmp_path, rows):
    """rows: (doc_id|None, text|None)."""
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_bigram_logprob_single_pair_corpus_scores_zero(tmp_path):
    """A one-pair corpus is perfectly predictable under add-one
    smoothing: p(b|a) = (1+1)/(1+1) = 1 → ln 1 = 0 → bp EXACTLY 0;
    single-token, empty and null texts have no bigrams and DROP OUT
    on both engines."""
    _docs(tmp_path, [(1, "a b"), (2, "solo"), (3, ""), (4, None)])
    got = bigram_logprob_documents(str(tmp_path)).to_pandas()
    exp = _oracle(tmp_path, "bigram_logprob_documents")
    _frames_equal(got.sort_values("doc_id"), exp, ["doc_id"])
    assert got["doc_id"].tolist() == [1]
    assert got["n_bigrams"].tolist() == [1]
    assert got["logprob_bp"].tolist() == [0]


def test_bigram_logprob_doubled_space_breaks_adjacency(tmp_path):
    """'a  b' splits to [a, '', b]: the empty token is filtered AFTER
    pairing (lead()-then-filter), so (a,'') and ('',b) both die and
    the doc has NO (a,b) bigram — it must not bridge. The doc drops
    out entirely; the sibling 'a b' doc still scores."""
    _docs(tmp_path, [(1, "a  b"), (2, "a b")])
    got = bigram_logprob_documents(str(tmp_path)).to_pandas()
    exp = _oracle(tmp_path, "bigram_logprob_documents")
    _frames_equal(got.sort_values("doc_id"), exp, ["doc_id"])
    assert got["doc_id"].tolist() == [2]


def test_bigram_logprob_repeats_and_hand_value(tmp_path):
    """'x y x y' → pairs (x,y)×2, (y,x)×1; with this single doc the
    model is c(x,y)=2, c(y,x)=1, cx(x)=2, cx(y)=1, V=2 (successors
    {x,y}): score = floor(1e4·(2·ln(3/4) + 1·ln(2/3))/3) — computed
    on BOTH engines from the same tf-grouped form (tf·ln p per
    distinct doc-pair, never repeated addition)."""
    _docs(tmp_path, [(7, "x y x y")])
    got = bigram_logprob_documents(str(tmp_path)).to_pandas()
    exp = _oracle(tmp_path, "bigram_logprob_documents")
    _frames_equal(got.sort_values("doc_id"), exp, ["doc_id"])
    hand = math.floor(
        10000 * (2 * math.log((2 + 1) / (2 + 2))
                 + 1 * math.log((1 + 1) / (1 + 2))) / 3)
    assert got["n_bigrams"].tolist() == [3]
    assert got["logprob_bp"].tolist() == [hand]


def test_bigram_logprob_duplicate_doc_ids_merge(tmp_path):
    """Two ROWS sharing doc_id: pairing stays per-row (the SQL
    partitions by row, so no bigram forms across the rows' texts),
    then the per-doc aggregate merges their bigrams — n_bigrams = 2
    for the pair of one-pair rows."""
    _docs(tmp_path, [(1, "a b"), (1, "c d"), (2, "a b")])
    got = bigram_logprob_documents(str(tmp_path)).to_pandas()
    exp = _oracle(tmp_path, "bigram_logprob_documents")
    _frames_equal(got.sort_values("doc_id"), exp, ["doc_id"])
    d = dict(zip(got["doc_id"], got["n_bigrams"]))
    assert d == {1: 2, 2: 1}


# ---------------------------------------------------------------------------
# mode_quantity_by_flag


def _lineitem(tmp_path, rows):
    """rows: (orderkey, linenumber, flag|None, qty|None)."""
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_linenumber": pa.array([r[1] for r in rows], pa.int32()),
        "l_returnflag": pa.array([r[2] for r in rows], pa.string()),
        "l_quantity": pa.array([r[3] for r in rows], pa.float64()),
    }))


def test_mode_tie_resolves_to_smallest_value(tmp_path):
    """Two quantities tied at the max count: both engines answer the
    SMALLEST (argmax over (n desc, q asc) == SQL min(q) over the
    join-on-max rows)."""
    _lineitem(tmp_path, [
        (1, 1, "A", 5.0), (1, 2, "A", 5.0),
        (2, 1, "A", 3.0), (2, 2, "A", 3.0),
        (3, 1, "A", 9.0)])
    got = mode_quantity_by_flag(str(tmp_path))
    exp = _oracle(tmp_path, "mode_quantity_by_flag")
    _frames_equal(got, exp, ["flag"])
    assert got["mode_q"].tolist() == [3.0]
    assert got["n"].tolist() == [2]


def test_mode_null_flag_group_survives_and_null_qty_invisible(tmp_path):
    """A NULL returnflag is its own GROUP BY group and must survive the
    argmax join (the SQL uses IS NOT DISTINCT FROM — a plain equi-join
    would silently drop it); null quantities are excluded from the
    counts on both engines."""
    _lineitem(tmp_path, [
        (1, 1, None, 7.0), (1, 2, None, 7.0), (1, 3, None, 2.0),
        (2, 1, "N", 4.0), (2, 2, "N", None)])
    got = mode_quantity_by_flag(str(tmp_path))
    exp = _oracle(tmp_path, "mode_quantity_by_flag")
    _frames_equal(got, exp, ["flag"])
    assert len(got) == 2
    byflag = {("null" if pd.isna(f) else f): (q, n)
              for f, q, n in zip(got["flag"], got["mode_q"], got["n"])}
    assert byflag["null"] == (7.0, 2)
    assert byflag["N"] == (4.0, 1)


def test_mode_all_null_quantities_yield_empty(tmp_path):
    """Every quantity NULL → no countable rows → zero output rows on
    both engines (the flag group itself vanishes with its rows)."""
    _lineitem(tmp_path, [(1, 1, "A", None), (1, 2, "B", None)])
    got = mode_quantity_by_flag(str(tmp_path))
    exp = _oracle(tmp_path, "mode_quantity_by_flag")
    assert len(got) == 0 and len(exp) == 0


# ---------------------------------------------------------------------------
# spend_deciles_customers


def _orders(tmp_path, rows):
    """rows: (orderkey, custkey|None, totalprice|None)."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
    }))


def test_deciles_uneven_split_rule(tmp_path):
    """12 customers into 10 buckets: SQL NTILE gives the FIRST n%k
    buckets the extra row — deciles 1 and 2 take 2 customers, 3..10
    take 1; boundaries follow the (spend, custkey) total order."""
    _orders(tmp_path, [(i, i, float(i)) for i in range(1, 13)])
    got = spend_deciles_customers(str(tmp_path))
    exp = _oracle(tmp_path, "spend_deciles_customers")
    _frames_equal(got, exp, ["decile"])
    assert got["n_cust"].tolist() == [2, 2] + [1] * 8
    assert got["lo_cents"].tolist()[0] == 100
    assert got["hi_cents"].tolist()[0] == 200


def test_deciles_tie_breaks_by_custkey(tmp_path):
    """Every customer ties on spend: the (spend, custkey) total order
    decides which side of each decile boundary a customer falls —
    the smaller custkey lands in the EARLIER decile on both engines."""
    _orders(tmp_path, [(i, i, 7.0) for i in range(1, 13)])
    got = spend_deciles_customers(str(tmp_path))
    exp = _oracle(tmp_path, "spend_deciles_customers")
    _frames_equal(got, exp, ["decile"])
    assert got["n_cust"].tolist() == [2, 2] + [1] * 8
    assert set(got["lo_cents"]) == {700}


def test_deciles_cents_exact_and_nulls_excluded(tmp_path):
    """0.29 · 100 = 28.999999999999996: BOTH engines round the same
    double to the SAME 29 cents (the float-cents trap that would
    otherwise reorder customers across a boundary). Null custkeys and
    null prices are invisible; a customer with ONLY null-price orders
    is ABSENT, and multiple orders per customer sum exactly."""
    _orders(tmp_path, [
        (1, 1, 0.29), (2, 1, 0.29),       # customer 1: 58 cents
        (3, 2, 0.10), (4, 2, None),        # null price invisible
        (5, 3, None),                      # only-null customer: absent
        (6, None, 9.99)])                  # null custkey invisible
    got = spend_deciles_customers(str(tmp_path))
    exp = _oracle(tmp_path, "spend_deciles_customers")
    _frames_equal(got, exp, ["decile"])
    assert len(got) == 2   # n=2 < k: deciles 1..2 only, one each
    assert got["lo_cents"].tolist() == [10, 58]
    assert got["n_cust"].tolist() == [1, 1]
