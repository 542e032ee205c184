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
