"""Session-11 operators: grouped robust/shape statistics
(median/MAD/skewness/kurtosis from ONE histogram pass) and per-user
behavioral entropy — crafted edge branches (the sf oracles run in
test_driver_contract / the driver harness). The testdata events table
carries NO nulls at any SF, so every null/NaN branch here is
pin-covered ONLY by these crafted tables."""

import math
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_ray.pipelines import relational as R

pytestmark = pytest.mark.usefixtures("ray_session")


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    os.makedirs(str(tmp_path), exist_ok=True)
    tb = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    pq.write_table(tb, os.path.join(str(tmp_path), "events.parquet"))
    return str(tmp_path)


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute("create view events as select * from "
                f"read_parquet('{sf_dir}/events.parquet')")
    return con.execute(sql).df()


ROBUST_SQL = """
SELECT event_type, CAST(count(value) AS BIGINT) AS n,
       round(median(value), 6) AS med, round(mad(value), 6) AS mad,
       round(skewness(value), 6) AS skew,
       round(kurtosis(value), 6) AS kurt
FROM events GROUP BY event_type ORDER BY event_type
"""

ENTROPY_SQL = """
SELECT user_id, round(entropy(event_type), 6) AS h,
       CAST(count(event_type) AS BIGINT) AS n
FROM events GROUP BY user_id ORDER BY user_id
"""

T0 = 1_600_000_000_000_000  # µs epoch base for crafted timestamps


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), na_position="last") \
        .reset_index(drop=True)


def test_robust_stats_edge_branches(tmp_path):
    """NULL type = real group; all-NULL-value group answers n=0 +
    all-NULL stats; n<3 / n<4 / zero-variance answer NULL skew/kurt
    exactly as DuckDB's 0/0; NULL values invisible to med/mad."""
    rows = [
        # group 'a': n=5, real shape stats + an invisible NULL value
        (1, T0, 1, "a", 1.0), (2, T0, 1, "a", 2.0), (3, T0, 1, "a", 2.0),
        (4, T0, 1, "a", 7.0), (5, T0, 1, "a", 40.0),
        (6, T0, 1, "a", None),
        # group 'b': n=2 (med/mad interpolate, skew/kurt NULL)
        (7, T0, 1, "b", 1.0), (8, T0, 1, "b", 4.0),
        # group 'c': n=3 (skew real, kurt NULL)
        (9, T0, 1, "c", 1.0), (10, T0, 1, "c", 2.0), (11, T0, 1, "c", 9.0),
        # group 'd': zero variance at n=4 (skew AND kurt NULL)
        (12, T0, 1, "d", 5.0), (13, T0, 1, "d", 5.0),
        (14, T0, 1, "d", 5.0), (15, T0, 1, "d", 5.0),
        # group 'e': all values NULL -> n=0, all stats NULL
        (16, T0, 1, "e", None), (17, T0, 1, "e", None),
        # NULL type: a real group
        (18, T0, 1, None, 10.0), (19, T0, 1, None, 20.0),
    ]
    d = _write_events(tmp_path, rows)
    got = _canon(R.robust_stats_events(d))
    exp = _canon(_duck(d, ROBUST_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # spot-check the branch outcomes directly
    by = {r.event_type if isinstance(r.event_type, str) else None: r
          for r in R.robust_stats_events(d).itertuples()}
    assert by["b"].n == 2 and math.isnan(by["b"].skew)
    assert by["c"].n == 3 and not math.isnan(by["c"].skew) \
        and math.isnan(by["c"].kurt)
    assert by["d"].n == 4 and math.isnan(by["d"].skew) \
        and math.isnan(by["d"].kurt) and by["d"].mad == 0.0
    assert by["e"].n == 0 and math.isnan(by["e"].med)
    assert by[None].med == 15.0


def test_robust_stats_nan_excluded(tmp_path):
    """A NaN value is excluded from the histogram (psi/drift
    convention) — the stats equal the NaN-free table's, where DuckDB
    would instead rank NaN above everything."""
    base = [(i, T0, 1, "a", v) for i, v in
            enumerate([1.0, 2.0, 3.0, 4.0, 100.0])]
    d1 = _write_events(tmp_path / "clean", base)
    d2 = _write_events(tmp_path / "nan",
                       base + [(99, T0, 1, "a", float("nan"))])
    pd.testing.assert_frame_equal(R.robust_stats_events(d2),
                                  R.robust_stats_events(d1))


def test_robust_stats_mad_fold_collision(tmp_path):
    """Two distinct values equidistant from the median must MERGE in
    the fold (|v-med| many-to-one) — counts add before the MAD
    quantile. med=5, |3-5|=|7-5|=2."""
    rows = [(i, T0, 1, "a", v) for i, v in
            enumerate([3.0, 3.0, 5.0, 7.0, 7.0])]
    d = _write_events(tmp_path, rows)
    got = _canon(R.robust_stats_events(d))
    exp = _canon(_duck(d, ROBUST_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert got.loc[0, "mad"] == 2.0


def test_user_entropy_edge_branches(tmp_path):
    """NULL user = real group; NULL event_type invisible to entropy;
    an only-NULL-type user answers h=0.0 n=0 (DuckDB entropy of an
    empty multiset); uniform 2-type user answers exactly 1 bit."""
    rows = [
        (1, T0, 1, "a", 0.0), (2, T0, 1, "b", 0.0),          # h=1.0
        (3, T0, 2, "a", 0.0), (4, T0, 2, "a", 0.0),          # h=0.0 n=2
        (5, T0, 3, None, 0.0), (6, T0, 3, None, 0.0),        # h=0.0 n=0
        (7, T0, 3, "a", 0.0), (8, T0, 3, "a", 0.0),
        (9, T0, 3, "a", 0.0), (10, T0, 3, "b", 0.0),         # mixed w/ nulls
        (11, T0, None, "a", 0.0), (12, T0, None, "b", 0.0),  # NULL user
        (13, T0, 4, None, 0.0),                              # only-null user
    ]
    d = _write_events(tmp_path, rows)
    got = _canon(R.user_entropy_events(d))
    exp = _canon(_duck(d, ENTROPY_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = R.user_entropy_events(d)
    by = {(None if pd.isna(t.user_id) else int(t.user_id)): t
          for t in r.itertuples()}
    assert by[1].h == 1.0 and by[1].n == 2
    assert by[2].h == 0.0 and by[2].n == 2
    assert by[4].h == 0.0 and by[4].n == 0
    assert by[None].h == 1.0 and by[None].n == 2
    # user 3: p=(3/4, 1/4) over non-null types
    assert by[3].n == 4 and abs(
        by[3].h - (-(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25)))
    ) < 1e-6
    # null user present -> DuckDB pandas dtype rule: float64 key
    assert r["user_id"].dtype == np.float64


def test_user_entropy_int64_ids_exact(tmp_path):
    """No null users -> int64 key column, ids past 2^53 survive the
    pyarrow partition path exactly."""
    big = (1 << 53) + 1
    rows = [(1, T0, big, "a", 0.0), (2, T0, big, "b", 0.0),
            (3, T0, big + 1, "a", 0.0)]
    d = _write_events(tmp_path, rows)
    r = R.user_entropy_events(d)
    assert r["user_id"].dtype == np.int64
    assert set(r["user_id"]) == {big, big + 1}
    assert r.loc[r["user_id"] == big, "h"].iloc[0] == 1.0


def _duck_docs(sf_dir, sql):
    con = duckdb.connect()
    con.execute("create view documents as select * from "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con.execute(sql).df()


def _write_docs(tmp_path, rows):
    """rows: list of (doc_id, text)."""
    os.makedirs(str(tmp_path), exist_ok=True)
    tb = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[1] or "") for r in rows],
                            pa.int64()),
    })
    pq.write_table(tb, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


TRANS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL)
SELECT prev_type, event_type AS next_type,
       CAST(count(*) AS BIGINT) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type ORDER BY prev_type, next_type
"""


def test_transitions_edge_branches(tmp_path):
    """NULL-type events vanish BEFORE pairing (A,NULL,B yields A→B);
    null user/ts rows invisible; equal-ts ordering decided by event_id;
    single-event users contribute nothing."""
    rows = [
        # user 1: a, (null), b  -> a->b
        (1, T0 + 1, 1, "a", 0.0), (2, T0 + 2, 1, None, 0.0),
        (3, T0 + 3, 1, "b", 0.0),
        # user 2: equal ts — event_id breaks the tie: b->a
        (4, T0, 2, "b", 0.0), (5, T0, 2, "a", 0.0),
        # user 3: single event, no transition
        (6, T0, 3, "a", 0.0),
        # invisible rows
        (7, T0, None, "a", 0.0), (8, None, 1, "a", 0.0),
    ]
    d = _write_events(tmp_path, rows)
    got = _canon(R.transitions_event_types(d))
    exp = _canon(_duck(d, TRANS_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    t = R.transitions_event_types(d)
    assert t.values.tolist() == [["a", "b", 1], ["b", "a", 1]]


def test_transitions_empty(tmp_path):
    d = _write_events(tmp_path, [(1, T0, None, "a", 0.0)])
    t = R.transitions_event_types(d)
    assert len(t) == 0
    assert list(t.columns) == ["prev_type", "next_type", "n"]


JACC_SQL = """
WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL),
tot AS (SELECT event_type, count(*) AS n FROM ut GROUP BY event_type),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS nb
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY type_a, type_b)
SELECT type_a, type_b, CAST(nb AS BIGINT) AS n_both,
       round(CAST(nb AS DOUBLE) / (x.n + y.n - nb), 6) AS jaccard
FROM inter JOIN tot x ON x.event_type = type_a
           JOIN tot y ON y.event_type = type_b
ORDER BY type_a, type_b
"""


def test_jaccard_edge_branches(tmp_path):
    """Known hand-computed case: repeated events dedup (distinct
    user-type), empty-intersection pairs absent, nulls invisible,
    totals ride the SAME partition pass (marker rows) yet J is exact."""
    rows = [
        (1, T0, 1, "a", 0.0), (2, T0, 1, "a", 0.0),  # dup collapses
        (3, T0, 1, "b", 0.0),
        (4, T0, 2, "a", 0.0),
        (5, T0, 3, "b", 0.0),
        (6, T0, 4, "c", 0.0),                        # c shares no user
        (7, T0, None, "a", 0.0), (8, T0, 5, None, 0.0),  # invisible
    ]
    d = _write_events(tmp_path, rows)
    got = _canon(R.jaccard_event_types(d))
    exp = _canon(_duck(d, JACC_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    j = R.jaccard_event_types(d)
    # only (a,b): inter=1, |a|=2, |b|=2 -> 1/3; c pairs absent
    assert j.values.tolist() == [["a", "b", 1, round(1 / 3, 6)]]


def test_jaccard_empty(tmp_path):
    d = _write_events(tmp_path, [(1, T0, 1, None, 0.0)])
    j = R.jaccard_event_types(d)
    assert len(j) == 0
    assert list(j.columns) == ["type_a", "type_b", "n_both", "jaccard"]


PREFIX_SQL = """
WITH g AS (
  SELECT substr(text, 1, 40) AS p, count(*) AS n
  FROM documents WHERE text IS NOT NULL
  GROUP BY p HAVING count(*) > 1)
SELECT d.doc_id, CAST(g.n AS BIGINT) AS n
FROM documents d JOIN g ON substr(d.text, 1, 40) = g.p
ORDER BY d.doc_id
"""


def test_prefix_dup_edge_branches(tmp_path):
    """Shared 40-code-point openings group; a doc shorter than the
    prefix keys on its FULL text (SQL substr semantics); null text
    invisible; unique openings absent; non-ASCII counts CODE POINTS
    (é, 𝕊 surrogate-pair range) exactly like DuckDB substr."""
    boiler = "w" * 40
    rows = [
        (1, boiler + " tail one"), (2, boiler + " tail two"),
        (3, "short"), (4, "short"),          # short docs: full-text key
        (5, "shorter but different"),
        (6, None),                            # invisible
        (7, "é𝕊" * 20 + " suffix a"),         # 40 code points prefix
        (8, "é𝕊" * 20 + " suffix b"),
        (9, "unique opening " + "x" * 40),
    ]
    d = _write_docs(tmp_path, rows)
    got = _canon(R.prefix_dup_documents(d))
    exp = _canon(_duck_docs(d, PREFIX_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = R.prefix_dup_documents(d)
    assert r.values.tolist() == [[1, 2], [2, 2], [3, 2], [4, 2],
                                 [7, 2], [8, 2]]


def test_prefix_dup_no_collisions(tmp_path):
    d = _write_docs(tmp_path, [(1, "abc"), (2, "def")])
    r = R.prefix_dup_documents(d)
    assert len(r) == 0 and list(r.columns) == ["doc_id", "n"]


def test_asof_join_forward_property():
    """Randomized cross-check of asof_join(direction='forward')
    against brute force: FIRST right t at-or-after (inclusive) /
    strictly-after (exclusive) within key — duplicate times, unmatched
    groups, null left keys and times."""
    import ray.data as rd

    from jsonschema_ray.joins import asof_join
    rng = np.random.default_rng(31)
    for trial, inclusive in [(0, True), (1, False), (2, True)]:
        nl, nr = 120, 150
        lk = rng.integers(0, 12, nl).astype("float64")
        ltv = rng.integers(0, 50, nl).astype("float64")
        lk[rng.integers(0, nl, 5)] = np.nan   # null keys
        ltv[rng.integers(0, nl, 5)] = np.nan  # null times
        lt = pa.table({
            "lid": pa.array(range(nl), type=pa.int64()),
            "k": pa.array(pd.array(lk).astype("Int64")),
            "t": pa.array(pd.array(ltv).astype("Int64")),
        })
        rt = pa.table({
            "k": pa.array(rng.integers(0, 15, nr), type=pa.int64()),
            "t": pa.array(rng.integers(0, 50, nr), type=pa.int64()),
        })
        ldf, rdf = lt.to_pandas(), rt.to_pandas()
        got = asof_join(rd.from_arrow(lt), rd.from_arrow(rt), by="k",
                        on="t", value_cols=["t"], inclusive=inclusive,
                        direction="forward") \
            .to_pandas().sort_values("lid").reset_index(drop=True)
        exp = []
        for _, row in ldf.iterrows():
            if pd.isna(row["k"]) or pd.isna(row["t"]):
                exp.append(None)
                continue
            c = rdf[(rdf["k"] == row["k"])
                    & ((rdf["t"] >= row["t"]) if inclusive
                       else (rdf["t"] > row["t"]))]
            exp.append(c["t"].min() if len(c) else None)
        exp = pd.Series(exp, dtype="float64")
        assert got["t_r"].astype("float64").equals(exp), \
            f"forward trial {trial}"


def test_asof_join_bad_direction():
    import ray.data as rd

    from jsonschema_ray.joins import asof_join
    t = pa.table({"k": pa.array([1], pa.int64()),
                  "t": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="direction"):
        asof_join(rd.from_arrow(t), rd.from_arrow(t), by="k", on="t",
                  value_cols=["t"], direction="sideways")


TOP_SQL = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL),
cnt AS (
  SELECT lang, token, count(*) AS n FROM tok
  WHERE token <> '' GROUP BY lang, token),
r AS (
  SELECT lang, token, n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n DESC, token) AS rk
  FROM cnt)
SELECT lang, token, CAST(n AS BIGINT) AS n, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= 10 ORDER BY lang, rk
"""


def _write_docs_lang(tmp_path, rows):
    """rows: (doc_id, lang, text)."""
    os.makedirs(str(tmp_path), exist_ok=True)
    tb = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array(["s"] * len(rows), pa.string()),
        "n_chars": pa.array([len(r[2] or "") for r in rows],
                            pa.int64()),
    })
    pq.write_table(tb, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_top_terms_edge_branches(tmp_path):
    """Double spaces yield empty tokens that are DROPPED (term_frequency
    contract); count ties break by token asc; NULL lang is a real
    group; null text invisible; k cuts."""
    rows = [
        (1, "en", "b b a  a c"),      # a:2 b:2 c:1; '' dropped
        (2, "en", "c"),
        (3, None, "z z y"),
        (4, "de", None),              # invisible
    ]
    d = _write_docs_lang(tmp_path, rows)
    got = _canon(R.top_terms_by_lang(d))
    exp = _canon(_duck_docs(d, TOP_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = R.top_terms_by_lang(d, k=2)
    en = r[r["lang"] == "en"]
    # ties at n=2: 'a' before 'b'; c cut by k=2
    assert en[["token", "n", "rk"]].values.tolist() == \
        [["a", 2, 1], ["b", 2, 2]]
    nul = r[r["lang"].isna()]
    assert nul[["token", "n", "rk"]].values.tolist() == \
        [["z", 2, 1], ["y", 1, 2]]


MA_SQL = """
WITH e AS (
  SELECT event_type, CAST(ts AS DATE) AS d FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL),
c AS (SELECT event_type, d, count(*) AS n FROM e GROUP BY 1, 2),
b AS (SELECT min(d) AS mn, max(d) AS mx FROM e),
grid AS (
  SELECT t.event_type, CAST(g.d AS DATE) AS d
  FROM (SELECT DISTINCT event_type FROM e) t,
       (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS d
        FROM b) g),
f AS (
  SELECT grid.event_type, grid.d, coalesce(c.n, 0) AS n
  FROM grid LEFT JOIN c
    ON c.event_type = grid.event_type AND c.d = grid.d)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(n AS BIGINT) AS n,
       round(avg(n) OVER (PARTITION BY event_type ORDER BY d
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
             6) AS ma7
FROM f ORDER BY event_type, day
"""


def test_daily_ma_gap_fill(tmp_path):
    """A 3-day gap zero-fills INTO the window; a type absent on early
    days still answers the full grid; null ts/type rows excluded."""
    day = 86_400_000_000
    rows = [
        (1, T0, 1, "a", 0.0), (2, T0, 1, "a", 0.0),       # day0: a=2
        (3, T0 + 4 * day, 1, "a", 0.0),                   # day4: a=1
        (4, T0 + 4 * day, 1, "b", 0.0),                   # b only day4
        (5, None, 1, "a", 0.0), (6, T0, 1, None, 0.0),    # invisible
    ]
    d = _write_events(tmp_path, rows)
    got = _canon(R.daily_counts_ma_events(d))
    exp = _canon(_duck(d, MA_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = R.daily_counts_ma_events(d)
    a = r[r["event_type"] == "a"]
    assert a["n"].tolist() == [2, 0, 0, 0, 1]
    assert a["ma7"].tolist() == [2.0, 1.0, round(2 / 3, 6), 0.5, 0.6]
    b = r[r["event_type"] == "b"]
    assert len(b) == 5 and b["n"].tolist() == [0, 0, 0, 0, 1]


def test_daily_ma_empty(tmp_path):
    d = _write_events(tmp_path, [(1, None, 1, "a", 0.0)])
    r = R.daily_counts_ma_events(d)
    assert len(r) == 0
    assert list(r.columns) == ["event_type", "day", "n", "ma7"]


def test_robust_stats_large_mean_low_variance(tmp_path):
    """Cancellation pin — A DOCUMENTED DIVERGENCE: at mean ~1e8 with
    unit-scale variance, skewness/kurtosis are shift-invariant, so the
    truth equals the small-value answer (skew 0.943266, kurt
    -0.055813, which DuckDB itself returns for the UNSHIFTED values).
    DuckDB's streaming raw-moment aggregate collapses on the shifted
    values (returns 0.0 / -6.25 — measured, DuckDB v1.0.0); the
    centered histogram form stays exact. med/mad (order statistics)
    still match DuckDB bit for bit."""
    offs = (0.0, 1.0, 2.0, 4.0, 7.0, 11.0)
    d_small = _write_events(tmp_path / "small",
                            [(i, T0, 1, "a", v)
                             for i, v in enumerate(offs)])
    truth = _duck(d_small, ROBUST_SQL)
    d_big = _write_events(tmp_path / "big",
                          [(i, T0, 1, "a", 1.0e8 + v)
                           for i, v in enumerate(offs)])
    got = R.robust_stats_events(d_big)
    assert got.loc[0, "skew"] == truth.loc[0, "skew"] == 0.943266
    assert got.loc[0, "kurt"] == truth.loc[0, "kurt"] == -0.055813
    # DuckDB on the shifted values cancels catastrophically
    drift = _duck(d_big, ROBUST_SQL)
    assert abs(drift.loc[0, "kurt"] - truth.loc[0, "kurt"]) > 1.0
    # order statistics are immune on both sides
    assert got.loc[0, "med"] == drift.loc[0, "med"]
    assert got.loc[0, "mad"] == drift.loc[0, "mad"]


def test_transitions_all_single_event_users(tmp_path):
    """Every partition emits an EMPTY partial (all users single-event)
    — the pinned Arrow schema keeps blocks unifiable and the result is
    a typed empty frame, not a schema-divergence crash."""
    rows = [(i, T0 + i, i, "a", 0.0) for i in range(40)]
    d = _write_events(tmp_path, rows)
    t = R.transitions_event_types(d)
    assert len(t) == 0
    assert list(t.columns) == ["prev_type", "next_type", "n"]


GAP_SQL = """
WITH e AS (
  SELECT user_id, event_id, ts FROM events WHERE ts IS NOT NULL),
d AS (
  SELECT user_id,
         date_diff('microsecond',
                   lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id), ts) AS g
  FROM e)
SELECT u.user_id, s.med_gap_us, coalesce(s.n_gaps, 0) AS n_gaps
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN (SELECT user_id, median(g) AS med_gap_us,
                  CAST(count(g) AS BIGINT) AS n_gaps
           FROM d GROUP BY user_id) s
  ON u.user_id IS NOT DISTINCT FROM s.user_id
ORDER BY u.user_id
"""


def test_median_gap_edge_branches(tmp_path):
    """Null-ts events leave the timeline but the user still answers;
    single-event and only-null-ts users answer (NULL, 0); the NULL
    user is one lag partition; an even gap count interpolates (x.5)."""
    s = 1_000_000  # µs per second
    rows = [
        # user 1: ts 0, 1s, 3s, 10s -> gaps 1e6, 2e6, 7e6 -> med 2e6
        (1, T0, 1, "a", 0.0), (2, T0 + s, 1, "a", 0.0),
        (3, T0 + 3 * s, 1, "a", 0.0), (4, T0 + 10 * s, 1, "a", 0.0),
        # user 2: gaps 1e6, 3e6 -> even count, med 2e6 interpolated
        (5, T0, 2, "a", 0.0), (6, T0 + s, 2, "a", 0.0),
        (7, T0 + 4 * s, 2, "a", 0.0),
        # user 3: single event
        (8, T0, 3, "a", 0.0),
        # user 4: only null-ts rows
        (9, None, 4, "a", 0.0),
        # user 5: null-ts row inside a real timeline — invisible
        (10, T0, 5, "a", 0.0), (11, None, 5, "a", 0.0),
        (12, T0 + 5 * s, 5, "a", 0.0),
        # NULL user: two events, one gap
        (13, T0, None, "a", 0.0), (14, T0 + 2 * s, None, "a", 0.0),
    ]
    d = _write_events(tmp_path, rows)
    got = _canon(R.median_gap_by_user(d))
    exp = _canon(_duck(d, GAP_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = R.median_gap_by_user(d)
    by = {(None if pd.isna(t.user_id) else int(t.user_id)): t
          for t in r.itertuples()}
    assert by[1].med_gap_us == 2e6 and by[1].n_gaps == 3
    assert by[2].med_gap_us == 2e6 and by[2].n_gaps == 2
    assert math.isnan(by[3].med_gap_us) and by[3].n_gaps == 0
    assert math.isnan(by[4].med_gap_us) and by[4].n_gaps == 0
    assert by[5].med_gap_us == 5e6 and by[5].n_gaps == 1
    assert by[None].med_gap_us == 2e6 and by[None].n_gaps == 1


DUP_SQL = """
SELECT source, CAST(count(text) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT text) AS BIGINT) AS n_distinct,
       CASE WHEN count(text) > 0
            THEN round(1.0 - count(DISTINCT text)
                       / CAST(count(text) AS DOUBLE), 6) END
       AS dup_rate
FROM documents GROUP BY source ORDER BY source
"""


def _write_docs_src(tmp_path, rows):
    """rows: (doc_id, source, text)."""
    os.makedirs(str(tmp_path), exist_ok=True)
    tb = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([len(r[2] or "") for r in rows],
                            pa.int64()),
    })
    pq.write_table(tb, os.path.join(str(tmp_path), "documents.parquet"))
    return str(tmp_path)


def test_dedup_rate_edge_branches(tmp_path):
    """Dup texts raise the rate; null texts invisible to both counts;
    an all-null-text source answers (0, 0, NULL) — its GROUP BY row
    still exists; NULL source is a real group."""
    rows = [
        (1, "a", "x"), (2, "a", "x"), (3, "a", "y"),   # rate 1/3
        (4, "b", None),                                 # (0, 0, NULL)
        (5, None, "z"), (6, None, "z"),                 # NULL source
        (7, "c", "u"), (8, "c", None),                  # null invisible
    ]
    d = _write_docs_src(tmp_path, rows)
    got = _canon(R.dedup_rate_by_source(d))
    exp = _canon(_duck_docs(d, DUP_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = R.dedup_rate_by_source(d)
    by = {(None if pd.isna(t.source) else t.source): t
          for t in r.itertuples()}
    assert by["a"].n_docs == 3 and by["a"].n_distinct == 2 \
        and by["a"].dup_rate == round(1 / 3, 6)
    assert by["b"].n_docs == 0 and by["b"].n_distinct == 0 \
        and math.isnan(by["b"].dup_rate)
    assert by[None].n_docs == 2 and by[None].n_distinct == 1 \
        and by[None].dup_rate == 0.5
    assert by["c"].n_docs == 1 and by["c"].dup_rate == 0.0


PARETO_SQL = """
WITH s AS (
  SELECT source, sum(n_chars) AS chars FROM documents GROUP BY source)
SELECT source, CAST(chars AS BIGINT) AS chars,
       round(sum(chars) OVER (ORDER BY chars DESC, source
                              ROWS UNBOUNDED PRECEDING)
             / CAST((SELECT sum(chars) FROM s) AS DOUBLE), 6)
       AS cum_share
FROM s ORDER BY chars DESC, source
"""


def test_pareto_edge_branches(tmp_path):
    """Ordering: chars desc then source asc; an all-null-chars source
    sorts LAST and leaves the running share at 1.0; NULL source a real
    group; shares cumulate exactly."""
    os.makedirs(str(tmp_path), exist_ok=True)
    tb = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array(["t"] * 6, pa.string()),
        "lang": pa.array(["en"] * 6, pa.string()),
        "source": pa.array(["a", "b", "b", None, "z", "a"],
                           pa.string()),
        "n_chars": pa.array([60, 15, 15, 10, None, None], pa.int64()),
    })
    pq.write_table(tb, os.path.join(str(tmp_path), "documents.parquet"))
    d = str(tmp_path)
    got = _canon(R.pareto_sources(d))
    exp = _canon(_duck_docs(d, PARETO_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = R.pareto_sources(d)
    # a=60 (null ignored inside group), b=30, NULL=10, z all-null LAST
    assert r["source"].tolist()[:3] == ["a", "b", None]
    assert r["source"].tolist()[3] == "z"
    assert r["cum_share"].tolist() == [0.6, 0.9, 1.0, 1.0]
    assert math.isnan(r["chars"].tolist()[3])


LATEST_SQL = """
SELECT user_id, event_id, ts, event_type, value FROM (
  SELECT *, row_number() OVER (
      PARTITION BY user_id
      ORDER BY ts DESC NULLS LAST, event_id DESC) AS rn
  FROM events) WHERE rn = 1 ORDER BY user_id
"""


def test_latest_event_edge_branches(tmp_path):
    """Null-ts rows lose to any timed row but win (highest event_id)
    for an all-null-ts user; equal timestamps break by event_id DESC;
    NULL user is a real partition; the whole row rides with the
    winner."""
    rows = [
        (1, T0, 1, "a", 1.0), (2, T0 + 5, 1, "b", 2.0),
        (3, None, 1, "c", 3.0),                       # null ts loses
        (4, T0, 2, "x", 1.0), (5, T0, 2, "y", 2.0),   # tie: id 5 wins
        (6, None, 3, "p", 7.0), (7, None, 3, "q", 8.0),  # all-null: 7
        (8, T0, None, "n", 9.0), (9, T0 + 1, None, "m", 10.0),
    ]
    d = _write_events(tmp_path, rows)
    got = _canon(R.latest_event_per_user(d))
    exp = _canon(_duck(d, LATEST_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = R.latest_event_per_user(d)
    by = {(None if pd.isna(t.user_id) else int(t.user_id)): t
          for t in r.itertuples()}
    assert by[1].event_id == 2 and by[1].event_type == "b"
    assert by[2].event_id == 5 and by[2].value == 2.0
    assert by[3].event_id == 7 and pd.isna(by[3].ts)
    assert by[None].event_id == 9 and by[None].event_type == "m"


TTR_SQL = """
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       CAST(count(DISTINCT t) AS BIGINT) AS n_uniq,
       round(count(DISTINCT t) / CAST(count(*) AS DOUBLE), 6) AS ttr
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
      FROM documents WHERE text IS NOT NULL)
WHERE t <> '' GROUP BY doc_id ORDER BY doc_id
"""


def test_ttr_edge_branches(tmp_path):
    """Repeated tokens lower TTR exactly; empty tokens (double spaces)
    are dropped; null-text / all-space / empty docs are ABSENT; a doc
    with one token answers 1.0."""
    rows = [
        (1, "a a a b"),        # 4 tok, 2 uniq, 0.5
        (2, "x  y"),           # '' dropped: 2 tok 2 uniq
        (3, None),             # absent
        (4, "  "),             # all-space: absent
        (5, ""),               # empty: absent
        (6, "solo"),           # 1.0
    ]
    d = _write_docs(tmp_path, rows)
    got = _canon(R.ttr_documents(d))
    exp = _canon(_duck_docs(d, TTR_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = R.ttr_documents(d)
    assert r["doc_id"].tolist() == [1, 2, 6]
    assert r["ttr"].tolist() == [0.5, 1.0, 1.0]
    assert r["n_tok"].tolist() == [4, 2, 1]


def test_ttr_duplicate_and_null_doc_ids(tmp_path):
    """SQL GROUP BY semantics under id collisions (the session-10
    blocked_fuzzy lesson): rows sharing a doc_id MERGE their token
    multisets, and ALL null-id rows form ONE group — per-record rows
    would be wrong on both."""
    rows = [(7, "a b"), (7, "b c"),          # one group: 4 tok, 3 uniq
            (None, "x y"), (None, "y z"),    # one NULL group: 4 tok, 3
            (1, "solo")]
    d = _write_docs(tmp_path, rows)
    got = _canon(R.ttr_documents(d))
    exp = _canon(_duck_docs(d, TTR_SQL))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    r = R.ttr_documents(d)
    by = {(None if pd.isna(t.doc_id) else int(t.doc_id)): t
          for t in r.itertuples()}
    assert by[7].n_tok == 4 and by[7].n_uniq == 3 \
        and by[7].ttr == 0.75
    assert by[None].n_tok == 4 and by[None].n_uniq == 3
    assert by[1].ttr == 1.0


LEAK_SQL = """
WITH d AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 100 < 10 THEN 'val'
              WHEN doc_id % 100 < 20 THEN 'test'
              ELSE 'train' END AS split
  FROM documents WHERE text IS NOT NULL)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN EXISTS (
           SELECT 1 FROM d t WHERE t.split = 'train'
             AND t.text = dd.text
             AND t.doc_id IS DISTINCT FROM dd.doc_id)
           THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked
FROM d dd GROUP BY split ORDER BY split
"""


def test_split_leakage_edge_branches(tmp_path):
    """Identity is IS DISTINCT FROM: two NULL-id train twins are the
    SAME identity (not leaked), a NULL-id train doc leaks a real-id
    val twin, same-id train twins don't leak each other, intra-train
    duplication counts on the train row, null text invisible.
    Buckets: id%100 <10 val, <20 test, else train."""
    rows = [
        (5, "leak-a"), (125, "leak-a"),      # val 5 leaked by train 125
        (15, "leak-b"), (120, "leak-b"),     # test 15 leaked by train 120
        (30, "dup-t"), (130, "dup-t"),       # intra-train: both leaked
        (231, "unique one"),                 # train, clean
        (7, "clean val"),                    # val, clean
        (None, "null-twin"), (None, "null-twin"),  # same identity: 0
        (None, "null-leaks"), (8, "null-leaks"),   # null train leaks val 8
        (50, None),                          # null text invisible
    ]
    d = _write_docs(tmp_path, rows)
    got = R.split_leakage_documents(d)
    exp = _duck_docs(d, LEAK_SQL)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    by = {t.split: t for t in got.itertuples()}
    assert by["val"].n_docs == 3 and by["val"].n_leaked == 2
    assert by["test"].n_docs == 1 and by["test"].n_leaked == 1
    # train: 125,120,30,130,231,None,None,None -> 8 docs;
    # leaked: 30 & 130 (each other); null twins NOT; others no twin
    assert by["train"].n_docs == 8 and by["train"].n_leaked == 2


def test_split_leakage_empty(tmp_path):
    d = _write_docs(tmp_path, [(1, None)])
    r = R.split_leakage_documents(d)
    assert len(r) == 0
    assert list(r.columns) == ["split", "n_docs", "n_leaked"]


FUZZY_COMP_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
  FROM customer a JOIN customer b
    ON a.c_nationkey = b.c_nationkey
   AND a.c_mktsegment = b.c_mktsegment
   AND a.c_custkey < b.c_custkey
  WHERE levenshtein(a.c_name, b.c_name) <= 2),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT u, u AS v FROM (SELECT DISTINCT u FROM edges) t
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
SELECT u AS c_custkey, min(v) AS entity_id
FROM reach GROUP BY u ORDER BY c_custkey
"""


def test_fuzzy_components_edge_branches(tmp_path):
    """Transitive chain A~B~C clusters even when A-C exceeds the
    distance cap; identical names in DIFFERENT blocks stay separate
    entities; customers with no fuzzy twin are absent."""
    rows = [
        # chain inside block (1, 'SEG'): abcdef ~ abcdeX ~ abcdXY
        (10, "abcdef", 1, "SEG"), (11, "abcdeX", 1, "SEG"),
        (12, "abXdeX", 1, "SEG"),
        # identical name, different nation -> no pair across blocks
        (20, "abcdef", 2, "SEG"),
        # singleton
        (30, "zzzzzzzz", 1, "SEG"),
    ]
    os.makedirs(str(tmp_path), exist_ok=True)
    tb = pa.table({
        "c_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "c_name": pa.array([r[1] for r in rows], pa.string()),
        "c_nationkey": pa.array([r[2] for r in rows], pa.int64()),
        "c_mktsegment": pa.array([r[3] for r in rows], pa.string()),
    })
    pq.write_table(tb, os.path.join(str(tmp_path), "customer.parquet"))
    d = str(tmp_path)
    got = R.fuzzy_components_customers(d)
    con = duckdb.connect()
    con.execute("create view customer as select * from "
                f"read_parquet('{d}/customer.parquet')")
    exp = con.execute(FUZZY_COMP_SQL).df()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # 10~11 (dist 1), 11~12 (dist 2), 10~12 dist 3 > cap: still one
    # entity by transitivity; 20 and 30 absent
    assert got.values.tolist() == [[10, 10], [11, 10], [12, 10]]
