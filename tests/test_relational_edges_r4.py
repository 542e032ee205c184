"""Round-4 review pins for pipelines/relational.py: non-divisible
hopping windows, null ts/value handling, SQL-truncation modulo on
negative ids, all-null percent-rank, and settings-keyed index caches."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _write_events(tmp_path, ts_us, values, users=None):
    n = len(ts_us)
    ts = pa.array(
        [None if t is None else t for t in ts_us],
        type=pa.timestamp("us"))
    pq.write_table(pa.table({
        "event_id": pa.array(range(n), type=pa.int64()),
        "ts": ts,
        "user_id": pa.array(users or [1] * n, type=pa.int64()),
        "event_type": pa.array(["x"] * n),
        "value": pa.array(values, type=pa.float64()),
        "props": pa.array(["{}"] * n)}),
        os.path.join(tmp_path, "events.parquet"))
    return str(tmp_path)


def test_hopping_window_non_divisible_slide(tmp_path):
    """window=3600s, slide=1500s: an event belongs to ceil(3600/1500)=3
    windows; the old floor(nwin)=2 silently dropped the oldest one."""
    from jsonschema_ray.pipelines.relational import hopping_window_events
    sf = _write_events(tmp_path, [3_000_000_000], [2.0])
    out = hopping_window_events(sf, window_us=3_600_000_000,
                                slide_us=1_500_000_000)
    starts = sorted(int(t.value) // 1000 for t in out["window_start"])
    assert starts == [0, 1_500_000_000, 3_000_000_000]
    assert (out["n_events"] == 1).all()
    assert (out["sum_value"] == 2.0).all()


def test_hopping_window_null_ts_and_value(tmp_path):
    """A null ts belongs to no window (and must not float-promote the
    window key); a null value is excluded from the sum (SQL SUM) while
    its row still counts (SQL COUNT(*))."""
    from jsonschema_ray.pipelines.relational import hopping_window_events
    sf = _write_events(tmp_path, [1_000_000, None, 2_000_000],
                       [1.0, 9.0, None])
    out = hopping_window_events(sf)
    # both valid-ts events land in the windows starting at -1800s and 0s
    assert (out["n_events"] == 2).all()
    assert (out["sum_value"] == 1.0).all()  # null value excluded
    assert len(out) == 2


def test_events_sessions_null_ts(tmp_path):
    """A NaT ts cannot fabricate a session break via the -2^63 int
    wrap; the NaT row is dropped from sessionization."""
    from jsonschema_ray.pipelines.relational import events_sessions
    sf = _write_events(tmp_path, [1_000_000, 2_000_000, None],
                       [1.0, 1.0, 1.0])
    out = events_sessions(sf).to_pandas()
    assert out.values.tolist() == [[1, 1, 2]]  # one session, two events


def test_sql_mod_negative_ids_match_duckdb():
    """assign_split / stratified_sample use SQL-truncation modulo:
    -5 % 100 must be -5 (DuckDB), not numpy's 95 — otherwise a corpus
    with negative ids splits differently from the oracle."""
    import duckdb
    import ray.data as rd

    from jsonschema_ray.pipelines.relational import _sql_mod, assign_split
    ids = np.array([-205, -5, 0, 5, 205], dtype=np.int64)
    exp = duckdb.connect().execute(
        "SELECT i % 100 FROM (SELECT unnest(?::BIGINT[]) AS i)",
        [ids.tolist()]).fetchnumpy()
    assert (_sql_mod(ids, 100) == list(exp.values())[0]).all()
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids)}))
    got = assign_split(ds, "doc_id").to_pandas() \
        .set_index("doc_id")["split"].to_dict()
    # SQL: -5 % 100 = -5 < 10 → val; -205 % 100 = -5 → val; 5 → val;
    # 0 → val; 205 % 100 = 5 → val ... compute from the SQL rule directly
    for i in ids:
        b = i % 100 if i >= 0 else -((-i) % 100)
        want = "val" if b < 10 else ("test" if b < 20 else "train")
        assert got[int(i)] == want, (i, b, got[int(i)])


def test_percent_rank_all_null(tmp_path):
    """An all-null value column returns the empty ranked set instead of
    the spurious 'input Dataset is not deterministic' ValueError."""
    import ray.data as rd

    from jsonschema_ray.pipelines.relational import percent_rank_by_value
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([1, 2], type=pa.int64()),
        "value": pa.array([None, None], type=pa.float64())}))
    out = percent_rank_by_value(ds, "value",
                                keep_cols=["event_id"]).to_pandas()
    # the pin is "no spurious ValueError, zero ranked rows" — Ray's
    # to_pandas may drop the schema entirely on an all-empty dataset
    assert len(out) == 0


def test_content_cache_settings_in_key(tmp_path):
    """_content_cached_dir: same content + different settings → a
    DIFFERENT cache dir (the r4 review found the IVF copy reusing a
    stale index across settings changes); torn builds (no _DONE)
    rebuild."""
    from jsonschema_ray.pipelines.relational import _content_cached_dir
    src = tmp_path / "x.parquet"
    pq.write_table(pa.table({"a": [1]}), str(src))
    calls = []
    d1 = _content_cached_dir(str(src), "s1", str(tmp_path / "cache"),
                             lambda d: (os.makedirs(d, exist_ok=True),
                                        calls.append(d)))
    d2 = _content_cached_dir(str(src), "s2", str(tmp_path / "cache"),
                             lambda d: (os.makedirs(d, exist_ok=True),
                                        calls.append(d)))
    assert d1 != d2 and len(calls) == 2
    # second call with same settings reuses (no rebuild)
    _content_cached_dir(str(src), "s1", str(tmp_path / "cache"),
                        lambda d: calls.append(d))
    assert len(calls) == 2
    # torn build (no _DONE) rebuilds
    os.remove(os.path.join(d1, "_DONE"))
    _content_cached_dir(str(src), "s1", str(tmp_path / "cache"),
                        lambda d: (os.makedirs(d, exist_ok=True),
                                   calls.append(d)))
    assert len(calls) == 3


def test_rolling_mean_frame_semantics(ray_session, tmp_path):
    """ROWS-frame rolling mean: frames never cross users, null values
    are excluded from sum AND count (an all-null frame emits a null
    mean), null ts sorts last, and the per-row floor-bp equals DuckDB's
    window accumulation bit for bit on crafted edges."""
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.relational import rolling_mean_events

    t = pa.table({
        "event_id": pa.array(range(10), type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 1, 2, 2, 2, 3, 3],
                            type=pa.int64()),
        "ts": pa.array([1, 2, 3, 4, None, 1, 2, 3, 5, 4],
                       type=pa.timestamp("us")),
        "value": pa.array([10.0, None, 30.0, 0.125, 50.0,
                           None, None, None, 7.5, 2.5]),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "events.parquet")
    got = rolling_mean_events(str(sf))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    want = con.execute("""
        SELECT event_id,
               CAST(count(value) OVER w AS BIGINT) AS n,
               CAST(floor(10000 * (sum(value) OVER w)
                          / (count(value) OVER w)) AS BIGINT) AS mean_bp
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        ORDER BY event_id""").df()
    cols = ["event_id", "n", "mean_bp"]
    pd.testing.assert_frame_equal(
        got[cols].reset_index(drop=True),
        want[cols].reset_index(drop=True), check_dtype=False)
    # the all-null user-2 frames carry n=0 and a NULL mean
    assert (got.loc[got.event_id.isin([5, 6, 7]), "n"] == 0).all()
    assert got.loc[got.event_id.isin([5, 6, 7]), "mean_bp"].isna().all()
    # user 1's 5th event (null ts, sorted last) still sees its 3
    # predecessors; user boundaries never leak into user 2
    assert got.loc[got.event_id == 4, "n"].item() == 3
