"""Session-14 operators: sequential pattern mining, cumulative-distinct
adoption curve, bag-of-words (token-set) dedup, daily-volume Gini —
crafted edge branches the sf oracles can't reach (the testdata carries
no nulls / no ties in these columns). The sf-scale value oracles run in
test_driver_contract and were hand-verified at sf0.001/0.01/0.1."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_ray.pipelines.relational import (
    basket_brand_pairs, benford_totalprice, cumulative_parts_shipped,
    customers_not_in_error_users, gini_daily_events,
    longest_streak_events, nation_share_of_region,
    rolling_distinct_users_events, sequence_match_users,
    timed_conversions_events, tokenset_dedup_documents,
    transition_timing_events)

pytestmark = pytest.mark.usefixtures("ray_session")


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
# sequence_match_users


def test_seq_match_null_rows_bridge_the_pattern(tmp_path):
    """A NULL-type (or null-user/ts) row between view and click leaves
    the timeline BEFORE joining on BOTH engines, so view, NULL, click,
    purchase still matches — the lag-over-filtered-view convention."""
    _events(tmp_path, [
        (1, 10, 1_000_000, "view"),
        (2, 10, 2_000_000, None),
        (3, 10, 3_000_000, "click"),
        (4, None, 3_500_000, "purchase"),   # null user: other timeline
        (5, 10, 4_000_000, "purchase"),
        (6, 11, 1_000_000, "view"),
        (7, 11, 2_000_000, "error"),        # breaks adjacency
        (8, 11, 3_000_000, "click"),
        (9, 11, 4_000_000, "purchase"),
        (10, 12, None, "view"),             # null ts: invisible
        (11, 12, 1_000_000, "click"),
        (12, 12, 2_000_000, "purchase"),
    ])
    got = sequence_match_users(str(tmp_path)).to_pandas()
    exp = _oracle(tmp_path, "sequence_match_users")
    _frames_equal(got, exp, ["user_id"])
    assert set(got["user_id"]) == {10}
    assert got["n_matches"].tolist() == [1]


def test_seq_match_tie_order_and_nonoverlap_count(tmp_path):
    """Same-ts ties order by event_id on both engines (the tie decides
    whether the trigram is adjacent), and two back-to-back occurrences
    count 2 (leftmost non-overlapping on both RE2 engines)."""
    _events(tmp_path, [
        # user 20: tie at ts=5 — event_id order makes view>click adjacent
        (1, 20, 5, "view"), (2, 20, 5, "click"), (3, 20, 6, "purchase"),
        # user 21: tie ordered the other way breaks it (click's
        # event_id sorts BEFORE view's inside the ts=5 tie)
        (4, 21, 5, "click"), (5, 21, 5, "view"), (6, 21, 6, "purchase"),
        # user 22: two full occurrences
        (7, 22, 1, "view"), (8, 22, 2, "click"), (9, 22, 3, "purchase"),
        (10, 22, 4, "view"), (11, 22, 5, "click"),
        (12, 22, 6, "purchase"),
    ])
    got = sequence_match_users(str(tmp_path)).to_pandas()
    exp = _oracle(tmp_path, "sequence_match_users")
    _frames_equal(got, exp, ["user_id"])
    d = dict(zip(got["user_id"], got["n_matches"]))
    assert d == {20: 1, 22: 2}


def test_seq_match_substring_type_prefix_parity(tmp_path):
    """'preview>click>purchase' CONTAINS 'view>click>purchase' as a
    substring — both engines match it (unanchored RE2 substring
    semantics); pinned so the shared convention is explicit."""
    _events(tmp_path, [
        (1, 30, 1, "preview"), (2, 30, 2, "click"), (3, 30, 3, "purchase"),
    ])
    got = sequence_match_users(str(tmp_path)).to_pandas()
    exp = _oracle(tmp_path, "sequence_match_users")
    _frames_equal(got, exp, ["user_id"])
    assert set(got["user_id"]) == {30}


def test_seq_match_empty_corpus_typed(tmp_path):
    """Empty corpus answers a Dataset whose schema is the typed
    (user_id, n_matches) contract (union-typed-empty-block pin)."""
    _events(tmp_path, [])
    out = sequence_match_users(str(tmp_path))
    s = out.schema()
    assert s.names == ["user_id", "n_matches"]
    assert [str(t) for t in s.types] == ["int64", "int64"]
    assert sum(b.num_rows
               for b in out.iter_batches(batch_format="pyarrow")) == 0


# ---------------------------------------------------------------------------
# cumulative_parts_shipped


def _lineitem(tmp_path, rows):
    """rows: (partkey|None, shipdate_us|None)."""
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_shipdate": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }))


DAY = 86_400_000_000


def test_cumulative_parts_first_day_and_nulls(tmp_path):
    """A part shipping on three days counts ONCE at its min day; null
    partkey/shipdate rows are invisible; the cumulation is exact."""
    _lineitem(tmp_path, [
        (1, 2 * DAY), (1, 0), (1, 5 * DAY),     # part 1 first ships day 0
        (2, 2 * DAY), (3, 2 * DAY),             # two new parts on day 2
        (None, 0), (4, None),                    # invisible
        (5, 9 * DAY),
    ])
    got = cumulative_parts_shipped(str(tmp_path))
    exp = _oracle(tmp_path, "cumulative_parts_shipped")
    _frames_equal(got, exp, ["day"])
    assert got["new_parts"].tolist() == [1, 2, 1]
    assert got["cum_parts"].tolist() == [1, 3, 4]


def test_cumulative_parts_empty_typed(tmp_path):
    _lineitem(tmp_path, [])
    got = cumulative_parts_shipped(str(tmp_path))
    assert list(got.columns) == ["day", "new_parts", "cum_parts"]
    assert len(got) == 0
    assert str(got["new_parts"].dtype) == "int64"
    assert str(got["cum_parts"].dtype) == "int64"


# ---------------------------------------------------------------------------
# tokenset_dedup_documents


def _docs(tmp_path, rows):
    """rows: (doc_id|None, text|None)."""
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_tokenset_dedup_set_semantics_vs_duckdb(tmp_path):
    """Order/multiplicity-insensitive key: 'a b b' == 'b a'; consecutive
    spaces inject an EMPTY token into the set ('a  b' != 'a b'); ''
    and ' ' both reduce to the {''} set and collide; null text rows
    are excluded; UTF-8 tokens sort identically (byte order ==
    codepoint order == DuckDB binary collation)."""
    _docs(tmp_path, [
        (1, "a b b"), (2, "b a"), (3, "a c"),       # 1+2 cluster; 3 alone
        (4, "a  b"), (5, "b  a"),                    # {'', a, b} cluster
        (6, ""), (7, " "),                           # {''} cluster
        (8, None),                                   # invisible
        (9, "日本 z"), (10, "z 日本 日本"),            # UTF-8 cluster
    ])
    got = tokenset_dedup_documents(str(tmp_path))
    exp = _oracle(tmp_path, "tokenset_dedup_documents")
    _frames_equal(got, exp, ["keep_id"])
    assert set(map(tuple, got.to_numpy())) == {(1, 2), (4, 2), (6, 2),
                                               (9, 2)}


def test_tokenset_dedup_null_and_duplicate_ids(tmp_path):
    """SQL GROUP BY semantics on the id side: min(doc_id) skips NULLs
    but count(*) includes them; an all-NULL-id cluster answers a
    NULL keep_id (float64 NaN, the DuckDB .df() convention);
    duplicate doc_ids are two rows, not one."""
    _docs(tmp_path, [
        (7, "x y"), (None, "y x"),          # keep_id 7, n 2
        (None, "q"), (None, "q"),           # keep_id NULL, n 2
        (3, "z w"), (3, "w z"),             # duplicate id: n 2
    ])
    got = tokenset_dedup_documents(str(tmp_path))
    exp = _oracle(tmp_path, "tokenset_dedup_documents")
    _frames_equal(got, exp, ["n_docs", "keep_id"])
    assert str(got["keep_id"].dtype) == "float64"
    assert got["keep_id"].isna().sum() == 1


def test_tokenset_dedup_empty_typed(tmp_path):
    _docs(tmp_path, [])
    got = tokenset_dedup_documents(str(tmp_path))
    assert list(got.columns) == ["keep_id", "n_docs"]
    assert len(got) == 0
    assert str(got["keep_id"].dtype) == "int64"


# ---------------------------------------------------------------------------
# longest_streak_events


def test_longest_streak_ties_nulls_and_tie_order(tmp_path):
    """Equal-length runs resolve to the EARLIEST run (SQL tiebreak =
    per-user run ordinal); a null-type row does NOT break a run
    (A, NULL, A is one run of 2 — lag over the filtered view); a
    run boundary inside a same-ts tie is ordered by event_id."""
    _events(tmp_path, [
        # user 1: AA then BB — tie, A (earlier) wins
        (1, 1, 10, "b_type"), (2, 1, 20, "b_type"),
        (3, 1, 30, "a_type"), (4, 1, 40, "a_type"),
        # user 2: A NULL A → streak 2 of 'x'
        (5, 2, 10, "x"), (6, 2, 20, None), (7, 2, 30, "x"),
        # user 3: tie at ts=10: id 8 (p) then id 9 (q) then q@20 →
        # q-run length 2 wins
        (9, 3, 10, "q"), (8, 3, 10, "p"), (10, 3, 20, "q"),
        # user 4: single event
        (11, 4, 10, "solo"),
    ])
    got = longest_streak_events(str(tmp_path)).to_pandas()
    exp = _oracle(tmp_path, "longest_streak_events")
    _frames_equal(got, exp, ["user_id"])
    d = {r.user_id: (r.streak, r.event_type)
         for r in got.itertuples(index=False)}
    assert d == {1: (2, "b_type"), 2: (2, "x"), 3: (2, "q"),
                 4: (1, "solo")}


def test_longest_streak_empty_typed(tmp_path):
    _events(tmp_path, [])
    out = longest_streak_events(str(tmp_path))
    s = out.schema()
    assert s.names == ["user_id", "streak", "event_type", "start_ts"]
    assert [str(t) for t in s.types] == \
        ["int64", "int64", "string", "timestamp[us]"]
    assert sum(b.num_rows
               for b in out.iter_batches(batch_format="pyarrow")) == 0


# ---------------------------------------------------------------------------
# customers_not_in_error_users


def _customers(tmp_path, rows):
    """rows: (custkey|None, name)."""
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_name": pa.array([r[1] for r in rows], pa.string())}))


def test_not_in_null_probe_empties_everything(tmp_path):
    """ONE NULL user_id among the 'error' events makes the whole
    NOT IN result EMPTY — x NOT IN S is never TRUE when S holds a
    NULL (the three-valued trap a plain anti-join misses)."""
    _customers(tmp_path, [(1, "a"), (2, "b"), (99, "c")])
    _events(tmp_path, [(1, 1, 0, "error"), (2, None, 0, "error")])
    got = customers_not_in_error_users(str(tmp_path))
    exp = _oracle(tmp_path, "customers_not_in_error_users")
    assert len(got) == 0 and len(exp) == 0
    assert list(got.columns) == ["c_custkey", "c_name"]


def test_not_in_empty_probe_keeps_null_keys(tmp_path):
    """An EMPTY probe set answers EVERY customer — including the
    null-key row (vacuous truth); with a non-empty probe the
    null-key row is EXCLUDED (NULL NOT IN S is NULL)."""
    _customers(tmp_path, [(1, "a"), (None, "nullkey"), (5, "e")])
    _events(tmp_path, [(1, 1, 0, "view")])      # no 'error' rows
    got = customers_not_in_error_users(str(tmp_path))
    exp = _oracle(tmp_path, "customers_not_in_error_users")
    _frames_equal(got, exp, ["c_name"])
    assert len(got) == 3

    _events(tmp_path, [(1, 1, 0, "error")])     # probe {1}, no nulls
    got = customers_not_in_error_users(str(tmp_path))
    exp = _oracle(tmp_path, "customers_not_in_error_users")
    _frames_equal(got, exp, ["c_name"])
    assert set(got["c_name"]) == {"e"}


# ---------------------------------------------------------------------------
# nation_share_of_region


def test_nation_share_orphans_nulls_single_nation(tmp_path):
    """An orphan suppkey (no supplier row) drops like the SQL inner
    join; a null amount (null discount) leaves the sum like SQL sum;
    a single-nation region answers share EXACTLY 1.0."""
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([10, 20, 30], pa.int64())}))
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([10, 20, 30], pa.int64()),
        "n_name": pa.array(["NAT_A", "NAT_B", "NAT_C"], pa.string()),
        "n_regionkey": pa.array([100, 100, 200], pa.int64())}))
    _write(tmp_path, "region", pa.table({
        "r_regionkey": pa.array([100, 200], pa.int64()),
        "r_name": pa.array(["R1", "R2"], pa.string())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_suppkey": pa.array([1, 2, 3, 99, 1], pa.int64()),
        "l_extendedprice": pa.array([100.0, 300.0, 50.0, 777.0, 100.0],
                                    pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.5, 0.0, None],
                               pa.float64())}))
    got = nation_share_of_region(str(tmp_path))
    exp = _oracle(tmp_path, "nation_share_of_region")
    _frames_equal(got, exp, ["region", "nation"])
    d = {r.nation: (r.revenue, r.share)
         for r in got.itertuples(index=False)}
    # A: 100 (its null-discount row drops from the sum), B: 300 —
    # region R1 splits 0.25/0.75; C alone in R2 answers EXACTLY 1.0
    assert d == {"NAT_A": (100.0, 0.25), "NAT_B": (300.0, 0.75),
                 "NAT_C": (25.0, 1.0)}


def test_nation_share_empty_lineitem_typed(tmp_path):
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([], pa.int64()),
        "s_nationkey": pa.array([], pa.int64())}))
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([], pa.int64()),
        "n_name": pa.array([], pa.string()),
        "n_regionkey": pa.array([], pa.int64())}))
    _write(tmp_path, "region", pa.table({
        "r_regionkey": pa.array([], pa.int64()),
        "r_name": pa.array([], pa.string())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_suppkey": pa.array([], pa.int64()),
        "l_extendedprice": pa.array([], pa.float64()),
        "l_discount": pa.array([], pa.float64())}))
    got = nation_share_of_region(str(tmp_path))
    assert list(got.columns) == ["region", "nation", "revenue",
                                 "share"]
    assert len(got) == 0


# ---------------------------------------------------------------------------
# timed_conversions_events (window 24h)


H = 3_600_000_000


def test_timed_conversions_window_edges_and_tie_order(tmp_path):
    """The window is INCLUSIVE at exactly 24h; a view one µs older
    misses; a same-ts view counts only with a SMALLER event_id (the
    (ts,event_id) tuple compare); views after the purchase never
    count; each purchase with ≥1 in-window view counts once."""
    _events(tmp_path, [
        # user 1: view exactly 24h before → converts
        (1, 1, 0, "view"), (2, 1, 24 * H, "purchase"),
        # user 2: view 24h+1µs before → misses
        (3, 2, 0, "view"), (4, 2, 24 * H + 1, "purchase"),
        # user 3: same-ts tie — view id 5 < purchase id 6 → converts
        (5, 3, 10, "view"), (6, 3, 10, "purchase"),
        # user 4: same-ts tie the other way → misses
        (8, 4, 10, "view"), (7, 4, 10, "purchase"),
        # user 5: view only AFTER the purchase → misses
        (9, 5, 20, "purchase"), (10, 5, 30, "view"),
        # user 6: two purchases off one view, second out of window
        (11, 6, 0, "view"), (12, 6, 1 * H, "purchase"),
        (13, 6, 30 * H, "purchase"),
    ])
    got = timed_conversions_events(str(tmp_path)).to_pandas()
    exp = _oracle(tmp_path, "timed_conversions_events")
    _frames_equal(got, exp, ["user_id"])
    d = dict(zip(got["user_id"], got["n_conversions"]))
    assert d == {1: 1, 3: 1, 6: 1}


def test_timed_conversions_empty_typed(tmp_path):
    _events(tmp_path, [])
    out = timed_conversions_events(str(tmp_path))
    s = out.schema()
    assert s.names == ["user_id", "n_conversions"]
    assert [str(t) for t in s.types] == ["int64", "int64"]
    assert sum(b.num_rows
               for b in out.iter_batches(batch_format="pyarrow")) == 0


# ---------------------------------------------------------------------------
# basket_brand_pairs


def test_basket_pairs_dedup_orphans_nulls(tmp_path):
    """Two lineitems of the SAME brand in one order contribute no
    (x,x) pair and no double count; orphan partkeys and null
    orderkeys drop like the SQL inner join / WHERE; pairs are
    unordered (brand_a < brand_b)."""
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["B1", "B2", "B3"], pa.string())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([10, 10, 10, 10, 20, 20, None, 30],
                               pa.int64()),
        "l_partkey": pa.array([1, 1, 2, 99, 2, 3, 1, 3], pa.int64())}))
    got = basket_brand_pairs(str(tmp_path))
    exp = _oracle(tmp_path, "basket_brand_pairs")
    _frames_equal(got, exp, ["brand_a", "brand_b"])
    assert set(map(tuple, got.to_numpy())) == {("B1", "B2", 1),
                                               ("B2", "B3", 1)}


def test_basket_pairs_empty_typed(tmp_path):
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([], pa.int64()),
        "p_brand": pa.array([], pa.string())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([], pa.int64()),
        "l_partkey": pa.array([], pa.int64())}))
    got = basket_brand_pairs(str(tmp_path))
    assert list(got.columns) == ["brand_a", "brand_b", "n_orders"]
    assert len(got) == 0


# ---------------------------------------------------------------------------
# skyline_orders / price_gaps_orders


def _orders_sky(tmp_path, rows):
    """rows: (orderkey, date_us|None, price|None)."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderdate": pa.array([r[1] for r in rows],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64())}))


def test_skyline_strict_dominance_and_ties(tmp_path):
    """Strict dominance only: an EQUAL price on a later date does NOT
    dominate; same-date rows never dominate each other; null
    date/price and NaN rows are invisible; the latest date always
    survives."""
    from jsonschema_ray.pipelines.relational import skyline_orders
    _orders_sky(tmp_path, [
        (1, 0, 5.0), (2, 0, 3.0),          # day 0: 5 survives, 3 dies
        (3, DAY, 4.0), (4, DAY, 4.0),      # day 1: equal-price twins
        (5, 2 * DAY, 4.0),                 # day 2: 4 — does NOT kill day-1 4s
        (6, None, 99.0), (7, 3 * DAY, None),
        (8, 3 * DAY, float("nan")),
        (9, 3 * DAY, 1.0),                 # latest date, low price: survives
    ])
    got = skyline_orders(str(tmp_path)).to_pandas()
    exp = _oracle(tmp_path, "skyline_orders")
    _frames_equal(got, exp, ["o_orderkey"])
    assert set(got["o_orderkey"]) == {1, 3, 4, 5, 9}


def test_skyline_empty_typed(tmp_path):
    from jsonschema_ray.pipelines.relational import skyline_orders
    _orders_sky(tmp_path, [])
    out = skyline_orders(str(tmp_path))
    s = out.schema()
    assert s.names == ["o_orderkey", "o_orderdate", "o_totalprice"]
    assert sum(b.num_rows
               for b in out.iter_batches(batch_format="pyarrow")) == 0


def test_price_gaps_ties_duplicates_and_small(tmp_path):
    """Duplicate prices collapse before neighboring; equal gaps order
    by lo ascending at the k cut; fewer than k gaps answers them
    all; a single distinct value answers empty."""
    from jsonschema_ray.pipelines.relational import price_gaps_orders
    _orders_sky(tmp_path, [(i, 0, float(v)) for i, v in
                           enumerate([10, 10, 20, 30, 40, 40, 50])])
    got = price_gaps_orders(str(tmp_path), k=3)
    exp = _oracle(tmp_path, "price_gaps_orders").head(3) \
        .reset_index(drop=True)
    _frames_equal(got, exp, ["lo"])
    # all gaps equal 10 → the 3 smallest lo win: (10,20),(20,30),(30,40)
    assert got["lo"].tolist() == [10.0, 20.0, 30.0]
    assert got["gap"].tolist() == [10.0, 10.0, 10.0]

    _orders_sky(tmp_path, [(1, 0, 7.0), (2, 0, 7.0)])
    got = price_gaps_orders(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["lo", "hi", "gap"]


# ---------------------------------------------------------------------------
# locf_resample_events / value_bands_events


def _events_v(tmp_path, rows):
    """rows: (event_id, event_type|None, ts_us|None, value|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    }))


def test_locf_ceiling_admissibility_and_null_carry(tmp_path):
    """An event at H:30 is INVISIBLE at grid point H:00 (the
    floor-bucketing leak), visible from H+1; an event exactly at H:00
    is visible at H; a NULL value CARRIES (ffill would wrongly skip
    it); ties at the same ts resolve to the larger event_id; hours
    before a type's first event answer NULL on the SHARED global
    grid."""
    from jsonschema_ray.pipelines.relational import locf_resample_events
    _events_v(tmp_path, [
        # type a: event at 0:30 (invisible at 0:00), NULL value at
        # 2:00 exactly (visible at 2:00, carries NULL onward)
        (1, "a", 30 * 60 * 1_000_000, 7.0),
        (2, "a", 2 * H, None),
        # type b: stretches the global grid 0:00..3:00; tie at 1:00
        (3, "b", 0, 1.0),
        (4, "b", 1 * H, 2.0), (5, "b", 1 * H, 3.0),
        (6, "b", 3 * H, 4.0),
        (7, None, 0, 9.0), (8, "c", None, 9.0),   # invisible rows
    ])
    got = locf_resample_events(str(tmp_path))
    exp = _oracle(tmp_path, "locf_resample_events")
    _frames_equal(got, exp, ["event_type", "hour"])
    a = got[got["event_type"] == "a"]["value"].tolist()
    b = got[got["event_type"] == "b"]["value"].tolist()
    assert np.isnan(a[0]) and a[1] == 7.0 and np.isnan(a[2]) \
        and np.isnan(a[3])
    assert b == [1.0, 3.0, 3.0, 4.0]   # tie at 1:00 → id 5 wins


def test_locf_empty_typed(tmp_path):
    from jsonschema_ray.pipelines.relational import locf_resample_events
    _events_v(tmp_path, [])
    got = locf_resample_events(str(tmp_path))
    assert list(got.columns) == ["event_type", "hour", "value"]
    assert len(got) == 0


def test_value_bands_boundaries_and_zero_band(tmp_path):
    """[lo, hi) inclusivity at every boundary; out-of-range, negative,
    NaN and NULL values match no band; a zero-match band still
    answers n = 0 (the LEFT JOIN count shape)."""
    from jsonschema_ray.pipelines.relational import value_bands_events
    _events_v(tmp_path, [
        (1, "t", 0, 0.0),       # low  (inclusive lo)
        (2, "t", 0, 9.999999),  # low
        (3, "t", 0, 10.0),      # mid  (boundary goes up)
        (4, "t", 0, 999.9999),  # high
        (5, "t", 0, 1000.0),    # out (exclusive hi)
        (6, "t", 0, -0.5),      # out
        (7, "t", 0, float("nan")),
        (8, "t", 0, None),
    ])
    got = value_bands_events(str(tmp_path))
    exp = _oracle(tmp_path, "value_bands_events")
    _frames_equal(got, exp, ["band"])
    d = dict(zip(got["band"], got["n"]))
    assert d == {"low": 2, "mid": 1, "high": 1}

    _events_v(tmp_path, [(1, "t", 0, None)])
    got = value_bands_events(str(tmp_path))
    assert dict(zip(got["band"], got["n"])) == \
        {"low": 0, "mid": 0, "high": 0}


# ---------------------------------------------------------------------------
# contingency_lift_events / trending_terms_documents


def test_contingency_lift_independence_and_nulls(tmp_path):
    """A perfectly independent 2×2 layout answers lift EXACTLY 1.0 in
    every cell; a concentrated cell answers the hand value; null
    type/ts rows are invisible."""
    from jsonschema_ray.pipelines.relational import contingency_lift_events
    rows = []
    eid = 0
    # independent: a/b × hour0/hour1 all equal
    for et in ("a", "b"):
        for h in (0, 1):
            for _ in range(5):
                rows.append((eid, 1, h * H, et)); eid += 1
    rows.append((eid, 1, None, "a")); eid += 1
    rows.append((eid, 1, 0, None))
    _events(tmp_path, rows)
    got = contingency_lift_events(str(tmp_path))
    exp = _oracle(tmp_path, "contingency_lift_events")
    _frames_equal(got, exp, ["event_type", "hr"])
    assert got["lift"].tolist() == [1.0, 1.0, 1.0, 1.0]
    assert got["n"].tolist() == [5, 5, 5, 5]

    # concentrated: all of type c in hour 0 → lift = N/(n_c·n_h0)·n
    _events(tmp_path, [(1, 1, 0, "c"), (2, 1, 0, "c"),
                       (3, 1, H, "d")])
    got = contingency_lift_events(str(tmp_path))
    exp = _oracle(tmp_path, "contingency_lift_events")
    _frames_equal(got, exp, ["event_type", "hr"])
    d = {(r.event_type, r.hr): r.lift
         for r in got.itertuples(index=False)}
    assert d == {("c", 0): 1.5, ("d", 1): 3.0}


def test_trending_terms_parity_split_and_smoothing(tmp_path):
    """doc_id %% 2 is TRUNC-mod: a negative id answers -1 and counts
    in NEITHER half (but its tokens still hold a vocabulary row
    subject to min support); add-one smoothing keeps a
    one-sided term finite; ties at the cut order by term."""
    from jsonschema_ray.pipelines.relational import trending_terms_documents
    docs = []
    # term 'up' only in half 1; 'down' only in half 0; 'flat' in both
    docs += [(2 * i + 1, "up flat") for i in range(12)]
    docs += [(2 * i, "down flat") for i in range(12)]
    docs += [(-3, "down down down")]       # negative id: neither half
    docs += [(None, "up up up")]           # null id invisible
    _docs(tmp_path, docs)
    got = trending_terms_documents(str(tmp_path), min_n=10, k=10)
    import duckdb

    import __ray_entry__ as E
    con = duckdb.connect()
    p = os.path.join(str(tmp_path), "documents.parquet")
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{p}')")
    sql = E.oracle_sql()["trending_terms_documents"] \
        .replace(">= 20", ">= 10").replace("LIMIT 25", "LIMIT 10")
    exp = con.execute(sql).df()
    _frames_equal(got, exp, ["w"])
    d = {r.w: (r.n0, r.n1, r.lift) for r in got.itertuples(index=False)}
    # 'down' appears 12x in half 0 plus 3x in the -3 doc → n0=12,
    # counted rows for neither half don't enter n0/n1
    assert d["down"][0] == 12 and d["down"][1] == 0
    assert d["up"] == (0, 12, d["up"][2])
    assert d["up"][2] > 1.0 > d["down"][2]


def test_trending_terms_empty_and_one_half(tmp_path):
    from jsonschema_ray.pipelines.relational import trending_terms_documents
    _docs(tmp_path, [])
    got = trending_terms_documents(str(tmp_path))
    assert list(got.columns) == ["w", "n0", "n1", "lift"]
    assert len(got) == 0
    # every doc in one half: t1 = 0, smoothing keeps lift finite
    _docs(tmp_path, [(0, "x x x x x x x x x x x x x x x x x x x x")])
    got = trending_terms_documents(str(tmp_path))
    assert got["w"].tolist() == ["x"] and np.isfinite(
        got["lift"]).all()


# ---------------------------------------------------------------------------
# drawdown_daily_events / weighted_median_price


def test_drawdown_monotone_gap_and_tie(tmp_path):
    """A non-decreasing series answers drawdown 0 with the FIRST day
    as trough (every day ties at 0 → SQL min(d)); a calendar gap IS a
    drawdown (zero-fill); equal max drawdowns resolve to the earliest
    day."""
    from jsonschema_ray.pipelines.relational import drawdown_daily_events
    rows = []
    eid = 0
    # 'up': 1,2,3 events on days 0,1,2 — monotone
    for d, k in [(0, 1), (1, 2), (2, 3)]:
        for _ in range(k):
            rows.append((eid, 1, d * DAY, "up")); eid += 1
    # 'gap': 2 events day 0, nothing day 1, 2 events day 2 → dd=2 at day 1
    rows += [(eid, 1, 0, "gap"), (eid + 1, 1, 1, "gap"),
             (eid + 2, 1, 2 * DAY, "gap"), (eid + 3, 1, 2 * DAY, "gap")]
    eid += 4
    # 'tie': 2,0,2,0 → dd=2 on days 1 AND 3 → earliest (day 1)
    rows += [(eid, 1, 0, "tie"), (eid + 1, 1, 1, "tie"),
             (eid + 2, 1, 2 * DAY, "tie"), (eid + 3, 1, 2 * DAY, "tie")]
    _events(tmp_path, rows)
    got = drawdown_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "drawdown_daily_events")
    _frames_equal(got, exp, ["event_type"])
    d = {r.event_type: (r.max_drawdown, r.trough_day)
         for r in got.itertuples(index=False)}
    assert d["up"] == (0, "1970-01-01")
    assert d["gap"] == (2, "1970-01-02")
    assert d["tie"] == (2, "1970-01-02")


def test_weighted_median_crossing_and_exclusions(tmp_path):
    """The crossing is INCLUSIVE at exactly half the total weight;
    duplicate prices merge weights; zero/negative/null weights and
    null prices are excluded on both engines."""
    from jsonschema_ray.pipelines.relational import weighted_median_price
    _write(tmp_path, "lineitem", pa.table({
        "l_extendedprice": pa.array([1.0, 2.0, 2.0, 9.0, None, 5.0],
                                    pa.float64()),
        "l_quantity": pa.array([2.0, 1.0, 1.0, 2.0, 5.0, 0.0],
                               pa.float64())}))
    # weights: v=1→2, v=2→2, v=9→2 (null price and zero weight out)
    # total 6, target 3: cum(1)=2 < 3, cum(2)=4 >= 3 → wmedian 2
    got = weighted_median_price(str(tmp_path))
    exp = _oracle(tmp_path, "weighted_median_price")
    _frames_equal(got, exp, ["wmedian"])
    assert got["wmedian"].tolist() == [2.0]
    assert got["total_qty"].tolist() == [6]

    # exact-half crossing: weights 1,1 → target 1 hits the FIRST value
    _write(tmp_path, "lineitem", pa.table({
        "l_extendedprice": pa.array([10.0, 20.0], pa.float64()),
        "l_quantity": pa.array([1.0, 1.0], pa.float64())}))
    got = weighted_median_price(str(tmp_path))
    exp = _oracle(tmp_path, "weighted_median_price")
    _frames_equal(got, exp, ["wmedian"])
    assert got["wmedian"].tolist() == [10.0]


def test_weighted_median_empty_typed(tmp_path):
    from jsonschema_ray.pipelines.relational import weighted_median_price
    _write(tmp_path, "lineitem", pa.table({
        "l_extendedprice": pa.array([], pa.float64()),
        "l_quantity": pa.array([], pa.float64())}))
    got = weighted_median_price(str(tmp_path))
    assert list(got.columns) == ["wmedian", "total_qty"]
    assert len(got) == 0


# ---------------------------------------------------------------------------
# gini_daily_events


def test_gini_uniform_and_single_day(tmp_path):
    """A perfectly even series answers EXACTLY 0.0 (the two fp
    divisions round the same true quotient (n+1)/n identically), and
    a one-day grid answers 0.0 with n_days 1."""
    _events(tmp_path, [
        (1, 1, 0 * DAY, "even"), (2, 1, 1 * DAY, "even"),
        (3, 1, 2 * DAY, "even"), (4, 1, 3 * DAY, "even"),
    ])
    got = gini_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "gini_daily_events")
    _frames_equal(got, exp, ["event_type"])
    assert got["gini"].tolist() == [0.0]
    assert got["n_days"].tolist() == [4]

    _events(tmp_path, [(1, 1, 5, "solo"), (2, 1, 6, "solo")])
    got = gini_daily_events(str(tmp_path))
    assert got["n_days"].tolist() == [1]
    assert got["gini"].tolist() == [0.0]


def test_gini_concentration_and_zero_fill(tmp_path):
    """All volume on ONE day of an n-day grid answers the hand value
    (n-1)/n; a type absent on grid days is zero-filled (dropping the
    calendar gap would change the statistic) — exact vs DuckDB."""
    rows = [(i, 1, 4 * DAY + i, "burst") for i in range(10)]
    rows.append((100, 1, 0, "anchor"))          # stretches grid to 5 days
    rows.append((101, 1, 4 * DAY, "anchor"))
    _events(tmp_path, rows)
    got = gini_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "gini_daily_events")
    _frames_equal(got, exp, ["event_type"])
    d = dict(zip(got["event_type"], got["gini"]))
    # burst: 10 events on day 5 of a 5-day grid → G = (5-1)/5 = 0.8
    assert d["burst"] == 0.8
    # anchor: [1,0,0,0,1] sorted [0,0,0,1,1] → 2(4+5)/(5·2)−6/5 = 0.6
    assert d["anchor"] == 0.6


# ---------------------------------------------------------------------------
# rolling_distinct_users_events (default: event_type='error', window=3)


def test_rolling_distinct_overlap_never_double_counts(tmp_path):
    """A user active on CONSECUTIVE days has overlapping coverage
    intervals — they must merge or the sweep counts the user twice;
    pinned exactly 1 across the whole grid, equal to DuckDB."""
    _events(tmp_path, [
        (1, 1, 0 * DAY, "error"), (2, 1, 1 * DAY, "error"),
        (3, 1, 2 * DAY, "error"), (4, 1, 4 * DAY, "error"),
    ])
    got = rolling_distinct_users_events(str(tmp_path))
    exp = _oracle(tmp_path, "rolling_distinct_users_events")
    _frames_equal(got, exp, ["day"])
    assert got["n_users"].tolist() == [1, 1, 1, 1, 1]


def test_rolling_distinct_gap_and_marker_on_start_day(tmp_path):
    """A gap > window produces real zero days mid-grid; the grid hi
    bound survives even when the max active day carries a +1 run
    start (the netting trap: a delta-0 marker summed with a +1 at the
    same day would vanish — markers ride their own column)."""
    _events(tmp_path, [
        (1, 1, 0 * DAY, "error"),
        # user 2's run STARTS on the global max active day
        (2, 2, 7 * DAY, "error"),
        (3, 3, 0 * DAY, "view"),       # other type invisible
        (4, None, 3 * DAY, "error"),   # null user invisible
        (5, 4, None, "error"),         # null ts invisible
    ])
    got = rolling_distinct_users_events(str(tmp_path))
    exp = _oracle(tmp_path, "rolling_distinct_users_events")
    _frames_equal(got, exp, ["day"])
    # grid 1970-01-01..01-08: user1 covers d0-2, user2 covers d7
    assert got["n_users"].tolist() == [1, 1, 1, 0, 0, 0, 0, 1]


def test_rolling_distinct_no_matching_type_empty(tmp_path):
    _events(tmp_path, [(1, 1, 0, "view"), (2, 1, DAY, "click")])
    got = rolling_distinct_users_events(str(tmp_path))
    assert list(got.columns) == ["day", "n_users"]
    assert len(got) == 0


def test_rolling_distinct_custom_window_merges_touching(tmp_path):
    """Active days 0 and 3 at window 3 TOUCH (coverage [0,2] and
    [3,5]) — merging them into [0,5] is identical to keeping them
    split (the -1/+1 cancel); the grid clips at the max ACTIVE day
    (day 3, like the SQL generate_series hi bound), so the answer is
    a dense 1s run of 4."""
    _events(tmp_path, [(1, 9, 0, "error"), (2, 9, 3 * DAY, "error")])
    got = rolling_distinct_users_events(str(tmp_path))
    exp = _oracle(tmp_path, "rolling_distinct_users_events")
    _frames_equal(got, exp, ["day"])
    assert got["n_users"].tolist() == [1, 1, 1, 1]


# ---------------------------------------------------------------------------
# benford_totalprice


def _orders(tmp_path, prices):
    _write(tmp_path, "orders", pa.table({
        "o_totalprice": pa.array(prices, pa.float64())}))


def test_benford_domain_and_knife_edges(tmp_path):
    """v < 1, NULL, NaN and ±inf are excluded on BOTH engines (NaN > 0
    is TRUE in DuckDB and would poison its BIGINT cast; negative
    exponents diverge one ulp between np.power and DuckDB pow);
    nextafter knife edges around powers of ten agree bit-for-bit."""
    below = float(np.nextafter(1000.0, 0))
    above = float(np.nextafter(1000.0, np.inf))
    _orders(tmp_path, [0.5, 0.999999, None, float("nan"), float("inf"),
                       float("-inf"), 1.0, 9.999999, below, above,
                       123456.78, 2.0])
    got = benford_totalprice(str(tmp_path))
    exp = _oracle(tmp_path, "benford_totalprice")
    _frames_equal(got, exp, ["digit"])
    d = dict(zip(got["digit"], got["n"]))
    # nextafter(1000, 0): log10 rounds to EXACTLY 3.0 so v/1000 < 1 —
    # digit 0 is reachable and BOTH engines agree on it; its
    # benford_share is NULL (1/0 diverges np-inf vs DuckDB-NaN)
    assert d == {0: 1, 1: 3, 2: 1, 9: 1}        # 6 rows qualify
    assert math.isnan(
        got[got["digit"] == 0]["benford_share"].iloc[0])


def test_benford_shares_exact_and_empty(tmp_path):
    _orders(tmp_path, [1.0, 1.0, 2.0, 9.0])
    got = benford_totalprice(str(tmp_path))
    exp = _oracle(tmp_path, "benford_totalprice")
    _frames_equal(got, exp, ["digit"])
    assert got[got["digit"] == 1]["obs_share"].iloc[0] == 0.5
    assert got[got["digit"] == 1]["benford_share"].iloc[0] == \
        round(math.log10(2), 6)

    _orders(tmp_path, [0.5, None])
    got = benford_totalprice(str(tmp_path))
    assert list(got.columns) == ["digit", "n", "obs_share",
                                 "benford_share"]
    assert len(got) == 0


# ---------------------------------------------------------------------------
# transition_timing_events


def test_transition_timing_bridging_ties_and_half_us_round(tmp_path):
    """Null-type rows bridge the pairing; a same-ts tie gives a zero
    gap; two (a→b) pairs with gaps 0 and 1 µs average to 5e-7 s,
    which DuckDB rounds AWAY to 1e-06 while Python's round would
    answer 0.0 — the duckdb_round branch, exact vs the oracle."""
    _events(tmp_path, [
        (1, 1, 100, "a"), (2, 1, 200, None), (3, 1, 100 + 0, "b"),
        # ^ null bridges: pair (a,b) ordered by (ts,event_id):
        #   a@100(id1), b@100(id3) — tie, gap 0
        (4, 2, 500, "a"), (5, 2, 501, "b"),   # gap 1 µs
        (6, 3, 0, "solo"),                    # single event: no pair
    ])
    got = transition_timing_events(str(tmp_path))
    exp = _oracle(tmp_path, "transition_timing_events")
    _frames_equal(got, exp, ["prev_type", "cur_type"])
    row = got[(got["prev_type"] == "a") & (got["cur_type"] == "b")]
    assert row["n"].tolist() == [2]
    assert row["avg_gap_s"].tolist() == [1e-06]


def test_transition_timing_empty_typed(tmp_path):
    _events(tmp_path, [])
    got = transition_timing_events(str(tmp_path))
    assert list(got.columns) == ["prev_type", "cur_type", "n",
                                 "avg_gap_s"]
    assert len(got) == 0


def test_gini_null_rows_invisible_and_empty(tmp_path):
    _events(tmp_path, [
        (1, 1, 0, "t"), (2, 1, None, "t"), (3, 1, DAY, None),
    ])
    got = gini_daily_events(str(tmp_path))
    assert got["event_type"].tolist() == ["t"]
    assert got["n_days"].tolist() == [1]

    _events(tmp_path, [])
    got = gini_daily_events(str(tmp_path))
    assert list(got.columns) == ["event_type", "n_days", "gini"]
    assert len(got) == 0
