"""Session-20 operators — crafted edge branches the sf oracles can't
reach. The sf-scale value oracles run in test_driver_contract and were
hand-verified at sf0.001/0.01/0.1 against DuckDB."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _write(tmp_path, name, tb):
    pq.write_table(tb, os.path.join(str(tmp_path), f"{name}.parquet"))


def _embeddings_ragged(tmp_path, rows):
    """rows: (vec_id|None, vector|None) — list<float32>, any length."""
    _write(tmp_path, "embeddings", pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array(
            [None if r[1] is None else [float(x) for x in r[1]]
             for r in rows], pa.list_(pa.float32())),
        "label": pa.array([0] * len(rows), pa.int32())}))


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


def _ref_bucket(vec, tables=2, planes=8):
    """Independent pure-Python reference of the bucket convention."""
    from jsonschema_ray.dedup.md5lsh import md5_low64
    q = [int(np.floor(np.float64(np.float32(x)) * 1000000.0))
         for x in vec]
    out = []
    for t in range(tables):
        b = 0
        for k in range(planes):
            dot = sum((md5_low64(f"hp_{t}_{k}_{j}") % 2001 - 1000) * qj
                      for j, qj in enumerate(q))
            if dot > 0:
                b |= 1 << k
        out.append((t, b))
    return out


# ----------------------------------- hyperplane LSH buckets (md5)

def test_lsh_buckets_hand_and_reference(tmp_path):
    """Two identical vectors share every bucket (n_vecs 2 in both
    tables); a third different vector lands where the independent
    pure-Python reference says it must."""
    from jsonschema_ray.pipelines.relational import (
        embedding_lsh_buckets_md5)
    va, vb = [0.5, -0.25], [-1.0, 2.0]
    _embeddings_ragged(tmp_path, [(1, va), (2, va), (3, vb)])
    out = embedding_lsh_buckets_md5(str(tmp_path))
    exp_rows = {}
    for t, b in _ref_bucket(va):
        exp_rows[(t, b)] = exp_rows.get((t, b), 0) + 2
    for t, b in _ref_bucket(vb):
        exp_rows[(t, b)] = exp_rows.get((t, b), 0) + 1
    exp = sorted((t, b, n) for (t, b), n in exp_rows.items())
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == exp
    ora = _oracle(tmp_path, "embedding_lsh_buckets_md5")
    assert [tuple(r) for r in ora.itertuples(index=False)] == exp


def test_lsh_buckets_zero_vector_tie_and_nulls(tmp_path):
    """A zero vector's every dot is 0 — NOT > 0 — so it answers bucket
    0 in both tables (the tie convention); null id / null vector /
    EMPTY vector rows are invisible."""
    from jsonschema_ray.pipelines.relational import (
        embedding_lsh_buckets_md5)
    _embeddings_ragged(tmp_path, [(1, [0.0, 0.0]), (None, [1.0, 1.0]),
                                  (3, None), (4, [])])
    out = embedding_lsh_buckets_md5(str(tmp_path))
    assert out.to_dict("records") == [
        {"tbl": 0, "bucket": 0, "n_vecs": 1},
        {"tbl": 1, "bucket": 0, "n_vecs": 1}]
    ora = _oracle(tmp_path, "embedding_lsh_buckets_md5")
    assert ora.astype("int64").to_dict("records") == \
        out.to_dict("records")


def test_lsh_buckets_ragged_lengths_and_empty(tmp_path):
    """A shorter vector sums its OWN components only (the SQL join-on-j
    convention — the Ray kernel's per-length matmul groups must agree);
    an all-invalid corpus answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        embedding_lsh_buckets_md5)
    _embeddings_ragged(tmp_path, [(1, [0.5, -0.25]),
                                  (2, [0.5, -0.25, 0.125])])
    out = embedding_lsh_buckets_md5(str(tmp_path))
    exp_rows = {}
    for t, b in _ref_bucket([0.5, -0.25]):
        exp_rows[(t, b)] = exp_rows.get((t, b), 0) + 1
    for t, b in _ref_bucket([0.5, -0.25, 0.125]):
        exp_rows[(t, b)] = exp_rows.get((t, b), 0) + 1
    exp = sorted((t, b, n) for (t, b), n in exp_rows.items())
    assert [tuple(r) for r in out.itertuples(index=False)] == exp
    ora = _oracle(tmp_path, "embedding_lsh_buckets_md5")
    assert [tuple(r) for r in ora.itertuples(index=False)] == exp

    _embeddings_ragged(tmp_path, [(None, [1.0]), (2, None)])
    out = embedding_lsh_buckets_md5(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["tbl", "bucket", "n_vecs"]
    assert out["n_vecs"].dtype == "int64"


# ----------------------------------- hyperplane LSH pairs (md5)

def test_lsh_pairs_hand_twins_and_loner(tmp_path):
    """Identical vectors share every bucket -> exactly one pair; a
    far-away loner pairs with nobody unless a bucket collides — checked
    against the independent reference bucket computation AND the SQL
    self-join."""
    from jsonschema_ray.pipelines.relational import (
        embedding_lsh_pairs_md5)
    va, vb = [0.5, -0.25], [-1.0, 2.0]
    _embeddings_ragged(tmp_path, [(1, va), (2, va), (3, vb)])
    out = embedding_lsh_pairs_md5(str(tmp_path)).to_pandas() \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    ba, bb = dict(_ref_bucket(va)), dict(_ref_bucket(vb))
    exp = {(1, 2)}
    if any(ba[t] == bb[t] for t in ba):
        exp |= {(1, 3), (2, 3)}
    assert set(map(tuple, out.to_numpy())) == exp
    ora = _oracle(tmp_path, "embedding_lsh_pairs_md5")
    assert set(map(tuple, ora.astype("int64").to_numpy())) == exp


def test_lsh_pairs_duplicate_id_never_self_pairs(tmp_path):
    """The SAME vec_id appearing twice shares its own buckets but must
    NOT answer a (x, x) pair — the a < b strictness survives id
    duplication on both engines."""
    from jsonschema_ray.pipelines.relational import (
        embedding_lsh_pairs_md5)
    _embeddings_ragged(tmp_path, [(7, [0.5, -0.25]), (7, [0.5, -0.25]),
                                  (9, [0.5, -0.25])])
    out = embedding_lsh_pairs_md5(str(tmp_path)).to_pandas()
    assert set(map(tuple, out.to_numpy())) == {(7, 9)}
    ora = _oracle(tmp_path, "embedding_lsh_pairs_md5")
    assert set(map(tuple, ora.astype("int64").to_numpy())) == {(7, 9)}


def test_lsh_pairs_nulls_and_empty_schema(tmp_path):
    """Null-id / null-vector / empty-vector rows are invisible; a
    corpus with no shareable bucket answers the EMPTY pair frame with
    the pinned (id_a, id_b) int64 schema."""
    from jsonschema_ray.pipelines.relational import (
        embedding_lsh_pairs_md5)
    _embeddings_ragged(tmp_path, [(1, [0.5, -0.25]), (None, [0.5, -0.25]),
                                  (3, None), (4, [])])
    ds = embedding_lsh_pairs_md5(str(tmp_path))
    assert ds.count() == 0
    # schema survives the all-empty pipeline (the union-typed-empty
    # pin; to_pandas() of ANY empty Dataset is column-less, a
    # Ray-global behavior — assert on schema()/iter_batches instead)
    assert ds.schema().names == ["id_a", "id_b"]
    for bt in ds.iter_batches(batch_format="pyarrow"):
        assert bt.schema.names == ["id_a", "id_b"]
    ora = _oracle(tmp_path, "embedding_lsh_pairs_md5")
    assert len(ora) == 0


# ------------------------------ hyperplane LSH pair cosine (md5)

def test_lsh_cosine_twins_exact_one(tmp_path):
    """Identical vectors share every bucket and answer cos_q 1.0
    EXACTLY (parallel integer vectors: dot == nrm == sqrt product —
    no float fuzz survives the integer pipeline)."""
    from jsonschema_ray.pipelines.relational import (
        embedding_lsh_pair_cosine_md5)
    _embeddings_ragged(tmp_path, [(1, [0.5, -0.25]), (2, [0.5, -0.25])])
    out = embedding_lsh_pair_cosine_md5(str(tmp_path))
    assert out.to_dict("records") == [
        {"id_a": 1, "id_b": 2, "cos_q": 1.0}]
    ora = _oracle(tmp_path, "embedding_lsh_pair_cosine_md5")
    assert ora.astype({"id_a": "int64", "id_b": "int64"}) \
        .to_dict("records") == out.to_dict("records")


def test_lsh_cosine_zero_norm_is_null(tmp_path):
    """Two ZERO vectors both land in bucket 0 of every table (the tie
    convention) and pair — but a zero-norm side has no direction, so
    cos_q answers SQL-NULL on both engines."""
    import math

    from jsonschema_ray.pipelines.relational import (
        embedding_lsh_pair_cosine_md5)
    _embeddings_ragged(tmp_path, [(1, [0.0, 0.0]), (2, [0.0, 0.0])])
    out = embedding_lsh_pair_cosine_md5(str(tmp_path))
    assert len(out) == 1
    assert (int(out["id_a"][0]), int(out["id_b"][0])) == (1, 2)
    assert math.isnan(out["cos_q"][0])
    ora = _oracle(tmp_path, "embedding_lsh_pair_cosine_md5")
    assert len(ora) == 1 and pd.isna(ora["cos_q"][0])


def test_lsh_duplicate_ids_merge_additively(tmp_path):
    """THE merge convention pin: a vec_id appearing twice with
    DIFFERENT vectors merges by integer vector ADDITION before
    bucketing (the SQL GROUP-BY-vid convention) — the occupancy
    counts the vid ONCE per table, in the bucket of the SUMMED
    vector, on BOTH engines."""
    from jsonschema_ray.pipelines.relational import (
        embedding_lsh_buckets_md5)
    _embeddings_ragged(tmp_path, [(7, [1.0, 0.0]), (7, [0.0, 1.0])])
    out = embedding_lsh_buckets_md5(str(tmp_path))
    # merged q = q([1,0]) + q([0,1]) = q([1.0, 1.0]) exactly
    exp = sorted((t, b, 1) for t, b in _ref_bucket([1.0, 1.0]))
    assert [tuple(r) for r in out.itertuples(index=False)] == exp
    ora = _oracle(tmp_path, "embedding_lsh_buckets_md5")
    assert [tuple(r) for r in ora.astype("int64")
            .itertuples(index=False)] == exp


def test_lsh_cosine_ragged_overlap_prefix(tmp_path):
    """A ragged pair dots the OVERLAPPING prefix only while each norm
    uses the vector's own full components — pinned by exact value
    against an independently computed expectation AND the SQL
    join-on-j oracle."""
    import math

    from jsonschema_ray.pipelines.relational import (
        embedding_lsh_pair_cosine_md5)
    from jsonschema_ray.util import duckdb_round
    va, vb = [0.5, -0.25], [0.5, -0.25, 0.125]
    _embeddings_ragged(tmp_path, [(1, va), (2, vb)])
    ba, bb = dict(_ref_bucket(va)), dict(_ref_bucket(vb))
    out = embedding_lsh_pair_cosine_md5(str(tmp_path))
    ora = _oracle(tmp_path, "embedding_lsh_pair_cosine_md5")
    if any(ba[t] == bb[t] for t in ba):
        qa = [500000, -250000]
        qb = [500000, -250000, 125000]
        dot = sum(x * y for x, y in zip(qa, qb))
        exp = duckdb_round(dot / (math.sqrt(sum(x * x for x in qa)) *
                                  math.sqrt(sum(x * x for x in qb))), 6)
        assert out.to_dict("records") == [
            {"id_a": 1, "id_b": 2, "cos_q": exp}]
        assert ora.astype({"id_a": "int64", "id_b": "int64"}) \
            .to_dict("records") == out.to_dict("records")
    else:
        assert len(out) == 0 and len(ora) == 0


# ------------------------------------ day-over-day PSI drift

def _events_ts_value(tmp_path, rows):
    """rows: (ts_us|None, value|None) — event_id/user_id/type filled."""
    n = len(rows)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["e"] * n, pa.string()),
        "ts": pa.array([r[0] for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([r[1] for r in rows], pa.float64())}))


def test_psi_daily_hand_terms(tmp_path):
    """Two days with known bins: day1 [0,0,30] -> {0:2, 1:1} of 3;
    day2 [0,30,30,60] -> {0:1, 1:2, 2:1} of 4. Three bins answer the
    exact psi_exact arithmetic — incl. bin 2's ABSENT-baseline clamp
    (p_prev = eps, the large-but-finite smoothing)."""
    import math

    from jsonschema_ray.pipelines.relational import (
        psi_daily_drift_events)
    D1 = 1_704_067_200_000_000          # 2024-01-01 00:00:00 UTC in µs
    D2 = D1 + 86_400_000_000
    _events_ts_value(tmp_path, [(D1, 0.0), (D1, 0.0), (D1, 30.0),
                                (D2, 0.0), (D2, 30.0), (D2, 30.0),
                                (D2, 60.0)])
    out = psi_daily_drift_events(str(tmp_path))

    def term(np_, tp, nc, tc):
        rp, rc = max(np_ / tp, 1e-6), max(nc / tc, 1e-6)
        return float(np.round((rp - rc) * math.log(rp / rc), 6))

    assert out.to_dict("records") == [
        {"day": "2024-01-02", "bin": 0, "n_prev": 2, "n_cur": 1,
         "psi_term": term(2, 3, 1, 4)},
        {"day": "2024-01-02", "bin": 1, "n_prev": 1, "n_cur": 2,
         "psi_term": term(1, 3, 2, 4)},
        {"day": "2024-01-02", "bin": 2, "n_prev": 0, "n_cur": 1,
         "psi_term": term(0, 3, 1, 4)}]
    exp = _oracle(tmp_path, "psi_daily_drift_events")
    assert exp.astype({"bin": "int64", "n_prev": "int64",
                       "n_cur": "int64"}).to_dict("records") == \
        out.to_dict("records")


def test_psi_daily_gap_pairs_observed_days(tmp_path):
    """A calendar GAP pairs across it: days 01 and 05 with nothing
    between form ONE pair (lag over OBSERVED days) — and null-ts /
    null / NaN / inf values are invisible."""
    from jsonschema_ray.pipelines.relational import (
        psi_daily_drift_events)
    D1 = 1_704_067_200_000_000
    D5 = D1 + 4 * 86_400_000_000
    _events_ts_value(tmp_path, [(D1, 10.0), (D5, 10.0),
                                (None, 10.0), (D5, None),
                                (D5, float("nan")),
                                (D5, float("inf"))])
    out = psi_daily_drift_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"day": "2024-01-05", "bin": 0, "n_prev": 1, "n_cur": 1,
         "psi_term": 0.0}]
    exp = _oracle(tmp_path, "psi_daily_drift_events")
    assert exp.astype({"bin": "int64", "n_prev": "int64",
                       "n_cur": "int64"}).to_dict("records") == \
        out.to_dict("records")


def test_psi_daily_single_day_empty(tmp_path):
    """Fewer than two observed days -> the typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        psi_daily_drift_events)
    D1 = 1_704_067_200_000_000
    _events_ts_value(tmp_path, [(D1, 10.0), (D1, 40.0)])
    out = psi_daily_drift_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["day", "bin", "n_prev", "n_cur",
                                 "psi_term"]
    exp = _oracle(tmp_path, "psi_daily_drift_events")
    assert len(exp) == 0


# ------------------------------- cross-table violation profile

def _four_tables(tmp_path, li_qty=(5, 20), ord_price=(100.0,),
                 doc_nchars=(100,), ev=(("error", 10.0),)):
    """Minimal four-table warehouse; rule sets per relational.py."""
    n = len(li_qty)
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array(range(1, n + 1), pa.int64()),
        "l_linenumber": pa.array([1] * n, pa.int32()),
        "l_quantity": pa.array([float(q) for q in li_qty], pa.float64()),
        "l_returnflag": pa.array(["A"] * n, pa.string())}))
    m = len(ord_price)
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(range(1, m + 1), pa.int64()),
        "o_totalprice": pa.array(list(ord_price), pa.float64()),
        "o_orderstatus": pa.array(["O"] * m, pa.string()),
        "o_orderpriority": pa.array(["1-URGENT"] * m, pa.string())}))
    k = len(doc_nchars)
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(range(1, k + 1), pa.int64()),
        "n_chars": pa.array([int(c) for c in doc_nchars], pa.int64()),
        "lang": pa.array(["en"] * k, pa.string()),
        "text": pa.array(["x" * int(c) for c in doc_nchars],
                         pa.string())}))
    e = len(ev)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, e + 1), pa.int64()),
        "event_type": pa.array([t for t, _ in ev], pa.string()),
        "value": pa.array([v for _, v in ev], pa.float64())}))


def test_violation_profile_counts_and_clean_tables(tmp_path):
    """One lineitem maximum violation (qty 40) and one conditional
    events violation (error with value 60) — tables whose rules all
    pass contribute NO rows (orders/documents clean here); counts are
    exact and the composed SQL oracle agrees."""
    from jsonschema_ray.pipelines.relational import (
        violation_profile_tables)
    _four_tables(tmp_path, li_qty=(5, 40, 40),
                 ev=(("error", 60.0), ("click", 999.0)))
    out = violation_profile_tables(str(tmp_path))
    assert out.to_dict("records") == [
        {"tbl": "events", "keyword": "maximum",
         "keyword_location": "/then/properties/value/maximum",
         "n_violations": 1},
        {"tbl": "lineitem", "keyword": "maximum",
         "keyword_location": "/properties/l_quantity/maximum",
         "n_violations": 2}]
    exp = _oracle(tmp_path, "violation_profile_tables")
    assert exp.astype({"n_violations": "int64"}) \
        .to_dict("records") == out.to_dict("records")


def test_violation_profile_all_clean_and_missing_table(tmp_path):
    """An all-clean warehouse answers the typed empty frame (both
    engines); a MISSING table file is skipped on the Ray side (profile
    over what exists)."""
    import os as _os

    from jsonschema_ray.pipelines.relational import (
        violation_profile_tables)
    _four_tables(tmp_path)
    out = violation_profile_tables(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["tbl", "keyword", "keyword_location",
                                 "n_violations"]
    exp = _oracle(tmp_path, "violation_profile_tables")
    assert len(exp) == 0

    _four_tables(tmp_path, li_qty=(40,))
    _os.remove(_os.path.join(str(tmp_path), "orders.parquet"))
    _os.remove(_os.path.join(str(tmp_path), "documents.parquet"))
    out = violation_profile_tables(str(tmp_path))
    assert out.to_dict("records") == [
        {"tbl": "lineitem", "keyword": "maximum",
         "keyword_location": "/properties/l_quantity/maximum",
         "n_violations": 1}]


# --------------------------------- out-of-order arrival accounting

def _events_arrival(tmp_path, rows):
    """rows: (event_id|None, user_id|None, ts_us|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["e"] * len(rows), pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([0.0] * len(rows), pa.float64())}))


def test_late_events_hand_timeline(tmp_path):
    """User 1 arrives (eid order) at ts 10, 30, 20, 30: the 20 is LATE
    (below the running max 30), the second 30 is NOT (equal, strict <),
    the first arrival never is. User 2's interleaved slow clock (5, 4)
    contributes its own late row — lateness is per-user."""
    from jsonschema_ray.pipelines.relational import late_events_by_day
    D = 1_704_067_200_000_000
    _events_arrival(tmp_path, [
        (1, 1, D + 10), (2, 1, D + 30), (3, 1, D + 20), (4, 1, D + 30),
        (5, 2, D + 5), (6, 2, D + 4)])
    out = late_events_by_day(str(tmp_path))
    assert out.to_dict("records") == [
        {"day": "2024-01-01", "n": 6, "n_late": 2,
         "late_share": 0.333333}]
    exp = _oracle(tmp_path, "late_events_by_day")
    assert exp.astype({"n": "int64", "n_late": "int64"}) \
        .to_dict("records") == out.to_dict("records")


def test_late_events_null_user_partition_and_invisible(tmp_path):
    """NULL user_id is ONE real partition (its own timeline can be
    late); null-ts / null-event_id rows have no arrival position and
    are invisible; an all-invalid corpus answers the typed empty
    frame."""
    from jsonschema_ray.pipelines.relational import late_events_by_day
    D = 1_704_067_200_000_000
    _events_arrival(tmp_path, [
        (1, None, D + 20), (2, None, D + 10),      # null-user late
        (3, 7, None), (None, 7, D + 5)])           # invisible rows
    out = late_events_by_day(str(tmp_path))
    assert out.to_dict("records") == [
        {"day": "2024-01-01", "n": 2, "n_late": 1, "late_share": 0.5}]
    exp = _oracle(tmp_path, "late_events_by_day")
    assert exp.astype({"n": "int64", "n_late": "int64"}) \
        .to_dict("records") == out.to_dict("records")

    _events_arrival(tmp_path, [(1, 1, None), (None, 2, D)])
    out = late_events_by_day(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["day", "n", "n_late", "late_share"]


def test_late_events_day_attribution_crosses_midnight(tmp_path):
    """Lateness is judged on the USER timeline but attributed to the
    late event's OWN event-time day: a day-2 arrival whose clock reads
    day 1 lands in day 1's row (the day the data claims, where the
    downstream window would mis-place it)."""
    from jsonschema_ray.pipelines.relational import late_events_by_day
    D = 1_704_067_200_000_000
    DAY = 86_400_000_000
    _events_arrival(tmp_path, [
        (1, 1, D + DAY + 10),          # day 2 arrival first
        (2, 1, D + 100)])              # then a day-1-clocked LATE one
    out = late_events_by_day(str(tmp_path))
    assert out.to_dict("records") == [
        {"day": "2024-01-01", "n": 1, "n_late": 1, "late_share": 1.0},
        {"day": "2024-01-02", "n": 1, "n_late": 0, "late_share": 0.0}]
    exp = _oracle(tmp_path, "late_events_by_day")
    assert exp.astype({"n": "int64", "n_late": "int64"}) \
        .to_dict("records") == out.to_dict("records")


# ----------------------------------- daily exact value quantiles

def test_value_quantiles_hand_and_negative_keys(tmp_path):
    """Disc quantiles are ORDER STATISTICS: [1.5, 2.5, 3.5] answers
    p50 = 2.5 (sorted[ceil(0.5*3)-1]) and p90 = 3.5 exactly; a
    NEGATIVE-value day pins the sign-flip arm of the IEEE sort-key
    encoding (-1.5 < 0.25 must survive the int64 detour bit-exactly)."""
    from jsonschema_ray.pipelines.relational import (
        value_quantiles_by_day)
    D = 1_704_067_200_000_000
    DAY = 86_400_000_000
    _events_arrival_v(tmp_path, [
        (1, D, 1.5), (2, D, 2.5), (3, D, 3.5),
        (4, D + DAY, -1.5), (5, D + DAY, 0.25)])
    out = value_quantiles_by_day(str(tmp_path))
    assert out.to_dict("records") == [
        {"day": "2024-01-01", "n": 3, "p50": 2.5, "p90": 3.5},
        {"day": "2024-01-02", "n": 2, "p50": -1.5, "p90": 0.25}]
    exp = _oracle(tmp_path, "value_quantiles_by_day")
    assert exp.astype({"n": "int64"}).to_dict("records") == \
        out.to_dict("records")


def _events_arrival_v(tmp_path, rows):
    """rows: (event_id, ts_us|None, value|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(["e"] * len(rows), pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64())}))


def test_value_quantiles_invisible_and_degenerate(tmp_path):
    """NaN / inf / null values and null-ts rows are invisible; a
    one-event day answers p50 == p90 == the value; all-invalid ->
    typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        value_quantiles_by_day)
    D = 1_704_067_200_000_000
    _events_arrival_v(tmp_path, [
        (1, D, 7.25), (2, D, float("nan")), (3, D, float("inf")),
        (4, D, None), (5, None, 1.0)])
    out = value_quantiles_by_day(str(tmp_path))
    assert out.to_dict("records") == [
        {"day": "2024-01-01", "n": 1, "p50": 7.25, "p90": 7.25}]
    exp = _oracle(tmp_path, "value_quantiles_by_day")
    assert exp.astype({"n": "int64"}).to_dict("records") == \
        out.to_dict("records")

    _events_arrival_v(tmp_path, [(1, None, 1.0), (2, D, None)])
    out = value_quantiles_by_day(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["day", "n", "p50", "p90"]


# --------------------------------- sessionization threshold sweep

def test_session_sensitivity_hand_curve(tmp_path):
    """User A's gaps are 10 and 40 minutes, user B has one event: the
    sweep answers 4/3/3/2/2 total sessions across {5,15,30,60,120} —
    the curve's knee sits where gaps stop splitting."""
    from jsonschema_ray.pipelines.relational import (
        session_sensitivity_events)
    D = 1_704_067_200_000_000
    MIN = 60_000_000
    _events_arrival(tmp_path, [
        (1, 1, D), (2, 1, D + 10 * MIN), (3, 1, D + 50 * MIN),
        (4, 2, D)])
    out = session_sensitivity_events(str(tmp_path))
    assert out.to_dict("records") == [
        {"threshold_min": 5, "n_users": 2, "n_sessions": 4},
        {"threshold_min": 15, "n_users": 2, "n_sessions": 3},
        {"threshold_min": 30, "n_users": 2, "n_sessions": 3},
        {"threshold_min": 60, "n_users": 2, "n_sessions": 2},
        {"threshold_min": 120, "n_users": 2, "n_sessions": 2}]
    exp = _oracle(tmp_path, "session_sensitivity_events")
    assert exp.astype("int64").to_dict("records") == \
        out.to_dict("records")


def test_session_sensitivity_boundary_and_nulls(tmp_path):
    """A gap of EXACTLY the threshold does NOT break (strict >, the
    events_sessions convention) — 30:00 on the 30-min row; null-ts and
    null-user rows are dropped before anything counts; all-invalid ->
    typed empty frame."""
    from jsonschema_ray.pipelines.relational import (
        session_sensitivity_events)
    D = 1_704_067_200_000_000
    MIN = 60_000_000
    _events_arrival(tmp_path, [
        (1, 1, D), (2, 1, D + 30 * MIN),
        (3, None, D), (4, 2, None)])
    out = session_sensitivity_events(str(tmp_path))
    recs = {r["threshold_min"]: r for r in out.to_dict("records")}
    assert recs[30] == {"threshold_min": 30, "n_users": 1,
                        "n_sessions": 1}      # 30:00 does not split
    assert recs[15] == {"threshold_min": 15, "n_users": 1,
                        "n_sessions": 2}      # but 15 does
    exp = _oracle(tmp_path, "session_sensitivity_events")
    assert exp.astype("int64").to_dict("records") == \
        out.to_dict("records")

    _events_arrival(tmp_path, [(1, None, D), (2, 1, None)])
    out = session_sensitivity_events(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["threshold_min", "n_users",
                                 "n_sessions"]


# ----------------------- referential / uniqueness warehouse profiles

def test_referential_profile_orphans_and_null_fk(tmp_path):
    """A child key with no parent counts as an orphan; a NULL FK does
    NOT (the SQL anti-join convention); clean edges answer zero. Only
    the customer->nation edge's tables exist here — absent tables
    skip their edges."""
    from jsonschema_ray.pipelines.relational import (
        referential_profile_tables)
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_nationkey": pa.array([10, 99, None, 10], pa.int64())}))
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([10, 20], pa.int64()),
        "n_regionkey": pa.array([1, 1], pa.int64())}))
    _write(tmp_path, "region", pa.table({
        "r_regionkey": pa.array([1], pa.int64())}))
    out = referential_profile_tables(str(tmp_path))
    assert out.to_dict("records") == [
        {"child_table": "customer", "fk": "c_nationkey",
         "parent_table": "nation", "n_child_rows": 4, "n_orphans": 1},
        {"child_table": "nation", "fk": "n_regionkey",
         "parent_table": "region", "n_child_rows": 2, "n_orphans": 0}]


def test_uniqueness_profile_dup_and_null_keys(tmp_path):
    """A duplicated key counts ALL its rows in n_rows_in_dup_keys;
    two all-NULL keys are duplicates of each other (one real key
    group, SQL GROUP BY semantics)."""
    from jsonschema_ray.pipelines.relational import (
        uniqueness_profile_tables)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([1, 1, 1, 2, None, None], pa.int64()),
        "user_id": pa.array([1] * 6, pa.int64()),
        "event_type": pa.array(["e"] * 6, pa.string()),
        "ts": pa.array([None] * 6, pa.timestamp("us")),
        "value": pa.array([0.0] * 6, pa.float64())}))
    out = uniqueness_profile_tables(str(tmp_path))
    assert out.to_dict("records") == [
        {"tbl": "events", "key": "event_id", "n_rows": 6,
         "n_distinct_keys": 3, "n_rows_in_dup_keys": 5}]
    # (the composed SQL oracle references all 8 tables and is
    # value-verified at 3 SFs in the driver gate; these pins carry the
    # crafted dup/null-key branches on the Ray side)


# ----------------------------------- day-over-day type-mix drift

def _events_ts_type(tmp_path, rows):
    """rows: (ts_us|None, event_type|None)."""
    n = len(rows)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
        "value": pa.array([0.0] * n, pa.float64())}))


def test_type_mix_drift_hand_and_vanishing_type(tmp_path):
    """Day1 {a:2, b:2}, day2 {a:3, c:1}: type b VANISHES (term = its
    full prior share 0.5, p_cur exactly 0.0 — no eps, TV needs none),
    type c appears (0.25), a shifts 0.5 -> 0.75 (0.25); null-ts and
    null-type rows invisible."""
    from jsonschema_ray.pipelines.relational import type_mix_drift_daily
    D = 1_704_067_200_000_000
    DAY = 86_400_000_000
    _events_ts_type(tmp_path, [
        (D, "a"), (D, "a"), (D, "b"), (D, "b"),
        (D + DAY, "a"), (D + DAY, "a"), (D + DAY, "a"), (D + DAY, "c"),
        (None, "a"), (D, None)])
    out = type_mix_drift_daily(str(tmp_path))
    assert out.to_dict("records") == [
        {"day": "2024-01-02", "event_type": "a", "n_prev": 2,
         "n_cur": 3, "tv_term": 0.25},
        {"day": "2024-01-02", "event_type": "b", "n_prev": 2,
         "n_cur": 0, "tv_term": 0.5},
        {"day": "2024-01-02", "event_type": "c", "n_prev": 0,
         "n_cur": 1, "tv_term": 0.25}]
    exp = _oracle(tmp_path, "type_mix_drift_daily")
    assert exp.astype({"n_prev": "int64", "n_cur": "int64"}) \
        .to_dict("records") == out.to_dict("records")


def test_type_mix_drift_gap_and_single_day(tmp_path):
    """A calendar gap pairs across it (lag over OBSERVED days); one
    observed day answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import type_mix_drift_daily
    D = 1_704_067_200_000_000
    DAY = 86_400_000_000
    _events_ts_type(tmp_path, [(D, "a"), (D + 3 * DAY, "a")])
    out = type_mix_drift_daily(str(tmp_path))
    assert out.to_dict("records") == [
        {"day": "2024-01-04", "event_type": "a", "n_prev": 1,
         "n_cur": 1, "tv_term": 0.0}]
    exp = _oracle(tmp_path, "type_mix_drift_daily")
    assert exp.astype({"n_prev": "int64", "n_cur": "int64"}) \
        .to_dict("records") == out.to_dict("records")

    _events_ts_type(tmp_path, [(D, "a"), (D, "b")])
    out = type_mix_drift_daily(str(tmp_path))
    assert len(out) == 0
    assert list(out.columns) == ["day", "event_type", "n_prev",
                                 "n_cur", "tv_term"]


# ------------------------------- completeness warehouse profile

def test_completeness_profile_counts_empty_list_not_null(tmp_path):
    """Null counting is validity-bitmap exact: embeddings with one
    null vector, one EMPTY vector (NOT null — pinned) and a null
    label; an empty region table answers n_rows 0 / null_rate 0.0;
    missing tables are skipped."""
    from jsonschema_ray.pipelines.relational import (
        completeness_profile_tables)
    _write(tmp_path, "embeddings", pa.table({
        "vec_id": pa.array([1, 2, None], pa.int64()),
        "embedding": pa.array([None, [], [1.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, None, 1], pa.int32())}))
    _write(tmp_path, "region", pa.table({
        "r_regionkey": pa.array([], pa.int64()),
        "r_name": pa.array([], pa.string())}))
    out = completeness_profile_tables(str(tmp_path))
    recs = {(r["tbl"], r["col"]): r for r in out.to_dict("records")}
    assert recs[("embeddings", "embedding")] == {
        "tbl": "embeddings", "col": "embedding", "n_rows": 3,
        "n_nulls": 1, "null_rate": 0.333333}
    assert recs[("embeddings", "vec_id")]["n_nulls"] == 1
    assert recs[("embeddings", "label")]["n_nulls"] == 1
    assert recs[("region", "r_name")] == {
        "tbl": "region", "col": "r_name", "n_rows": 0,
        "n_nulls": 0, "null_rate": 0.0}
    assert set(r["tbl"] for r in out.to_dict("records")) == \
        {"embeddings", "region"}
