"""Session-7 operators: count-min sketch + sketch-verified heavy
hitters, the RANGE-frame burst window, and the TPC-H Q3/Q5 join
pipelines' edge branches (the sf oracles run in test_driver_contract)."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_ray.sketches import CountMinSketch


def canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(tuple(
            (f"{v:.10g}" if not math.isnan(v) else "nan")
            if isinstance(v, float) else str(v) for v in tup))
    return sorted(rows)


# ---------------------------------------------------------------------------
# CountMinSketch (pure numpy, no Ray)


def test_cms_never_underestimates_and_small_domain_exact():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, size=5000)
    s = CountMinSketch().add_column(vals)
    uniq, true = np.unique(vals, return_counts=True)
    est = s.estimate(uniq).astype(np.int64)
    # one-sided error: estimates can only over-count
    assert (est >= true).all()
    # 50 keys across 4x8192 cells: collisions are possible but the MIN
    # over 4 independent rows is exact with overwhelming probability
    assert (est == true).all()


def test_cms_duplicates_within_one_batch_counted():
    # fancy-index += would collapse repeats; bincount must not
    s = CountMinSketch(width=64, depth=2)
    s.add_column(np.array([9, 9, 9, 9], dtype=np.int64))
    assert int(s.estimate(np.array([9], dtype=np.int64))[0]) == 4


def test_cms_merge_is_linear_and_bytes_roundtrip():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 1000, size=2000)
    b = rng.integers(0, 1000, size=3000)
    sa = CountMinSketch().add_column(a)
    sb = CountMinSketch().add_column(b)
    sab = CountMinSketch().add_column(np.concatenate([a, b]))
    merged = sa.merge(sb)
    assert (merged.counts == sab.counts).all()
    rt = CountMinSketch.from_bytes(merged.to_bytes())
    assert (rt.counts == merged.counts).all()
    assert (rt.estimate(a[:10]) == merged.estimate(a[:10])).all()


def test_cms_arrow_column_and_strings():
    col = pa.array(["x", "y", "x", None, "x"])
    s = CountMinSketch().add_column(col)
    assert int(s.estimate(pa.array(["x"]))[0]) == 3
    # the null counted as the sentinel key, not as "y"
    assert int(s.estimate(pa.array(["y"]))[0]) == 1


def test_cms_shape_validation():
    with pytest.raises(ValueError):
        CountMinSketch(width=0)
    with pytest.raises(ValueError):
        CountMinSketch(width=8, depth=2,
                       counts=np.zeros((2, 9), dtype=np.uint64))
    with pytest.raises(ValueError):
        CountMinSketch(width=8, depth=2).merge(
            CountMinSketch(width=16, depth=2))


# ---------------------------------------------------------------------------
# _range_frame_counts (band-shift vs loop vs brute force)


def _brute_range_counts(ts, starts, horizon):
    n = len(ts)
    ends = np.append(starts[1:], n)
    out = np.empty(n, dtype=np.int64)
    for s, e in zip(starts, ends):
        for i in range(s, e):
            out[i] = int(((ts[s:e] >= ts[i] - horizon)
                          & (ts[s:e] <= ts[i])).sum())
    return out


def test_range_frame_counts_band_equals_loop_equals_brute():
    from jsonschema_ray.pipelines.relational import _range_frame_counts
    rng = np.random.default_rng(3)
    sizes = [1, 5, 40, 2, 17]
    starts = np.cumsum([0] + sizes[:-1]).astype(np.int64)
    ts = np.concatenate([
        np.sort(rng.integers(0, 500, size=k)) for k in sizes
    ]).astype(np.int64)
    h = 60
    band = _range_frame_counts(ts, starts, h)
    loop = _range_frame_counts(ts, starts, h, force_loop=True)
    brute = _brute_range_counts(ts, starts, h)
    assert (band == brute).all()
    assert (loop == brute).all()


def test_range_frame_counts_overflow_falls_back():
    from jsonschema_ray.pipelines.relational import _range_frame_counts
    # span ~2^61 across 2 segments: banding would overflow int64 — the
    # auto path must take the loop and still be exact
    big = 1 << 61
    seg1 = np.array([0, 3, 10], dtype=np.int64)
    seg2 = np.array([big, big + 5, big + 200, big + 250],
                    dtype=np.int64)
    ts = np.concatenate([seg1, seg2])
    starts = np.array([0, 3], dtype=np.int64)
    out = _range_frame_counts(ts, starts, 100)
    assert (out == _brute_range_counts(ts, starts, 100)).all()


def test_range_frame_counts_empty():
    from jsonschema_ray.pipelines.relational import _range_frame_counts
    out = _range_frame_counts(np.zeros(0, dtype=np.int64),
                              np.zeros(0, dtype=np.int64), 10)
    assert out.shape == (0,)


# ---------------------------------------------------------------------------
# burst_rate_events (crafted edges; the sf oracle runs in
# test_driver_contract)


def test_burst_rate_crafted_boundaries(tmp_path):
    """Window-boundary inclusivity (exactly 60 min apart counts; 60 min
    + 1 us does not), equal-ts peers all count (RANGE CURRENT ROW), and
    null users / null ts are excluded — canon-equal to DuckDB's RANGE
    window on the same table."""
    import duckdb

    import __ray_entry__ as E
    from jsonschema_ray.pipelines.relational import burst_rate_events

    H = 3_600_000_000  # 60 min in us
    t0 = 1_700_000_000_000_000
    rows = [
        # u1: two events exactly 60 min apart -> both inside the frame
        (1, t0), (1, t0 + H),
        # u2: 60 min + 1 us apart -> never together
        (2, t0), (2, t0 + H + 1),
        # u3: three events at the SAME ts -> peers, burst 3
        (3, t0), (3, t0), (3, t0),
        # u4: a dense run then a far-away straggler
        (4, t0), (4, t0 + 1), (4, t0 + 2), (4, t0 + 10 * H),
        # null user / null ts: excluded on both engines
        (None, t0), (5, None),
    ]
    tb = pa.table({
        "event_id": pa.array(range(len(rows)), type=pa.int64()),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([1.0] * len(rows), type=pa.float64()),
        "props": pa.array(["{}"] * len(rows))})
    pq.write_table(tb, os.path.join(tmp_path, "events.parquet"))
    got = burst_rate_events(str(tmp_path))
    assert got["user_id"].tolist() == [1, 2, 3, 4]
    assert got["max_burst"].tolist() == [2, 1, 3, 3]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    exp = con.execute(E.oracle_sql()["burst_rate_events"]).df()
    assert canon(got) == canon(exp)


def test_burst_rate_empty_events(tmp_path):
    from jsonschema_ray.pipelines.relational import burst_rate_events
    pq.write_table(pa.table({
        "event_id": pa.array([], type=pa.int64()),
        "ts": pa.array([], type=pa.timestamp("us")),
        "user_id": pa.array([], type=pa.int64()),
        "event_type": pa.array([], type=pa.string()),
        "value": pa.array([], type=pa.float64()),
        "props": pa.array([], type=pa.string())}),
        os.path.join(tmp_path, "events.parquet"))
    out = burst_rate_events(str(tmp_path))
    assert list(out.columns) == ["user_id", "max_burst"]
    assert len(out) == 0


# ---------------------------------------------------------------------------
# heavy_hitters_cms_events (crafted; the sf oracle runs in
# test_driver_contract)


def test_heavy_hitters_crafted_threshold_boundary(tmp_path):
    """A user exactly AT the threshold survives (HAVING >=), one below
    does not, the null-user group is excluded, and the result is
    canon-equal to the exact SQL — the CMS prefilter must introduce no
    false negatives by construction."""
    import duckdb

    import __ray_entry__ as E
    from jsonschema_ray.pipelines.relational import \
        heavy_hitters_cms_events

    uids = ([7] * 95          # above threshold 80
            + [8] * 80        # exactly at it
            + [9] * 79        # one below
            + list(range(100, 150))  # light tail
            + [None] * 90)    # null group: excluded even though heavy
    tb = pa.table({
        "event_id": pa.array(range(len(uids)), type=pa.int64()),
        "ts": pa.array([1_700_000_000_000_000] * len(uids),
                       type=pa.timestamp("us")),
        "user_id": pa.array(uids, type=pa.int64()),
        "event_type": pa.array(["view"] * len(uids)),
        "value": pa.array([1.0] * len(uids), type=pa.float64()),
        "props": pa.array(["{}"] * len(uids))})
    pq.write_table(tb, os.path.join(tmp_path, "events.parquet"))
    got = heavy_hitters_cms_events(str(tmp_path))
    assert got["user_id"].tolist() == [7, 8]
    assert got["n"].tolist() == [95, 80]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    exp = con.execute(E.oracle_sql()["heavy_hitters_cms_events"]).df()
    assert canon(got) == canon(exp)


def test_heavy_hitters_saturated_screen_degrades_exactly(tmp_path):
    """gather_cap_bytes=0 forces the saturated-screen fallback (the
    sketch can't prune, e.g. a tiny threshold over a huge stream): the
    exact distributed count over ALL users must answer identically to
    the candidate-pruned plan — degrade, never die, never a
    corpus-sized driver gather."""
    from jsonschema_ray.pipelines.relational import \
        heavy_hitters_cms_events

    uids = [7] * 95 + [8] * 80 + [9] * 79 + list(range(100, 150))
    tb = pa.table({
        "event_id": pa.array(range(len(uids)), type=pa.int64()),
        "ts": pa.array([1_700_000_000_000_000] * len(uids),
                       type=pa.timestamp("us")),
        "user_id": pa.array(uids, type=pa.int64()),
        "event_type": pa.array(["view"] * len(uids)),
        "value": pa.array([1.0] * len(uids), type=pa.float64()),
        "props": pa.array(["{}"] * len(uids))})
    pq.write_table(tb, os.path.join(tmp_path, "events.parquet"))
    pruned = heavy_hitters_cms_events(str(tmp_path))
    exact = heavy_hitters_cms_events(str(tmp_path), gather_cap_bytes=0)
    pd.testing.assert_frame_equal(pruned, exact)
    assert exact["user_id"].tolist() == [7, 8]


def test_heavy_hitters_empty_and_no_candidates(tmp_path):
    from jsonschema_ray.pipelines.relational import \
        heavy_hitters_cms_events
    # all-light stream: candidates set is empty after the CMS screen
    tb = pa.table({
        "event_id": pa.array(range(10), type=pa.int64()),
        "ts": pa.array([1_700_000_000_000_000] * 10,
                       type=pa.timestamp("us")),
        "user_id": pa.array(list(range(10)), type=pa.int64()),
        "event_type": pa.array(["view"] * 10),
        "value": pa.array([1.0] * 10, type=pa.float64()),
        "props": pa.array(["{}"] * 10)})
    pq.write_table(tb, os.path.join(tmp_path, "events.parquet"))
    out = heavy_hitters_cms_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["user_id", "n"]


# ---------------------------------------------------------------------------
# Q3/Q5 empty-input degradation (the sf oracles run in
# test_driver_contract)


def _empty_tpch_dir(tmp_path):
    pq.write_table(pa.table({
        "c_custkey": pa.array([], type=pa.int64()),
        "c_name": pa.array([], type=pa.string()),
        "c_nationkey": pa.array([], type=pa.int32()),
        "c_acctbal": pa.array([], type=pa.float64()),
        "c_mktsegment": pa.array([], type=pa.string())}),
        os.path.join(tmp_path, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([], type=pa.int64()),
        "o_custkey": pa.array([], type=pa.int64()),
        "o_orderstatus": pa.array([], type=pa.string()),
        "o_totalprice": pa.array([], type=pa.float64()),
        "o_orderdate": pa.array([], type=pa.timestamp("us")),
        "o_orderpriority": pa.array([], type=pa.string())}),
        os.path.join(tmp_path, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([], type=pa.int64()),
        "l_suppkey": pa.array([], type=pa.int64()),
        "l_extendedprice": pa.array([], type=pa.float64()),
        "l_discount": pa.array([], type=pa.float64()),
        "l_shipdate": pa.array([], type=pa.timestamp("us"))}),
        os.path.join(tmp_path, "lineitem.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([], type=pa.int64()),
        "s_name": pa.array([], type=pa.string()),
        "s_nationkey": pa.array([], type=pa.int32()),
        "s_acctbal": pa.array([], type=pa.float64())}),
        os.path.join(tmp_path, "supplier.parquet"))
    # nation/region stay non-empty: dimension tables exist even when
    # the fact tables are empty
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], type=pa.int32()),
        "n_name": pa.array(["CHINA", "FRANCE"]),
        "n_regionkey": pa.array([0, 1], type=pa.int32())}),
        os.path.join(tmp_path, "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], type=pa.int32()),
        "r_name": pa.array(["ASIA", "EUROPE"])}),
        os.path.join(tmp_path, "region.parquet"))
    return str(tmp_path)


def test_q3_empty_tables_degrade(tmp_path):
    from jsonschema_ray.pipelines.relational import q3_shipping_priority
    out = q3_shipping_priority(_empty_tpch_dir(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["l_orderkey", "revenue", "o_orderdate",
                                 "o_orderpriority"]


def test_q5_empty_tables_degrade(tmp_path):
    from jsonschema_ray.pipelines.relational import \
        q5_local_supplier_volume
    out = q5_local_supplier_volume(_empty_tpch_dir(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["n_name", "revenue"]
