"""Randomized two-engine property net for the session-20 disciplines:
seeded random corpora (duplicate/null vec_ids, ragged vectors, zero
vectors, out-of-order timelines with ties, NaN/inf values, day gaps)
run through BOTH the Ray pipeline and its DuckDB oracle and must agree
on every value — the adversarial companions to the hand pins, aimed at
the branches the sf corpora can't reach (the sf events arrive in
order; the sf embeddings have unique ids and fixed width)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

DAY = 86_400_000_000
MIN = 60_000_000


def _write(tmp_path, name, tb):
    pq.write_table(tb, os.path.join(str(tmp_path), f"{name}.parquet"))


def _oracle(tmp_path, name):
    import duckdb

    import __ray_entry__ as E
    con = duckdb.connect()
    for t in ("events", "embeddings"):
        p = os.path.join(str(tmp_path), f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS "
                        f"SELECT * FROM read_parquet('{p}')")
    return con.execute(E.oracle_sql()[name]).df()


def _match(got, exp, sort_cols):
    got = got.sort_values(sort_cols).reset_index(drop=True)
    exp = exp.sort_values(sort_cols).reset_index(drop=True)
    assert sorted(got.columns) == sorted(exp.columns)
    assert len(got) == len(exp), (len(got), len(exp))
    for c in exp.columns:
        gv, ev = got[c].to_numpy(), exp[c].to_numpy()
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            assert np.array_equal(np.asarray(gv, dtype=float),
                                  np.asarray(ev, dtype=float),
                                  equal_nan=True), c
        else:
            assert (gv.astype(str) == ev.astype(str)).all(), c


def _rand_embeddings(rng, n):
    """Duplicate ids (~15%), null ids/vectors (~10%), ragged lengths
    2-5, zero vectors (~5%), coarse component grid hitting the
    quantization exactly."""
    ids, vecs = [], []
    for i in range(n):
        if rng.random() < 0.1:
            ids.append(None)
        elif rng.random() < 0.15:
            ids.append(int(rng.integers(1, max(n // 3, 2))))
        else:
            ids.append(1000 + i)
        if rng.random() < 0.07:
            vecs.append(None)
        elif rng.random() < 0.05:
            vecs.append([0.0] * int(rng.integers(2, 5)))
        else:
            d = int(rng.integers(2, 6))
            vecs.append([float(rng.integers(-8, 9)) * 0.25
                         for _ in range(d)])
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * n, pa.int32())})


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_lsh_family_random(tmp_path, seed):
    import __ray_entry__ as E
    rng = np.random.default_rng(seed)
    _write(tmp_path, "embeddings", _rand_embeddings(rng, 60))
    q = E.queries()
    out = q["embedding_lsh_buckets_md5"](str(tmp_path))
    exp = _oracle(tmp_path, "embedding_lsh_buckets_md5")
    _match(out, exp.astype("int64"), ["tbl", "bucket"])
    out = q["embedding_lsh_pairs_md5"](str(tmp_path)).to_pandas()
    exp = _oracle(tmp_path, "embedding_lsh_pairs_md5")
    if len(out) or len(exp):
        _match(out, exp.astype("int64"), ["id_a", "id_b"])
    out = q["embedding_lsh_pair_cosine_md5"](str(tmp_path))
    exp = _oracle(tmp_path, "embedding_lsh_pair_cosine_md5")
    if len(out) or len(exp):
        _match(out, exp.astype({"id_a": "int64", "id_b": "int64"}),
               ["id_a", "id_b"])


def _rand_events(rng, n):
    """Out-of-order timelines (ts drawn independently of event_id),
    timestamp ties on a coarse grid, ~10% nulls per column, values on
    the 25-bin edges incl. negatives, NaN and inf."""
    def val():
        r = rng.random()
        if r < 0.08:
            return None
        if r < 0.12:
            return float("nan")
        if r < 0.15:
            return float("inf") if rng.random() < 0.5 else \
                float("-inf")
        return float(rng.integers(-4, 9)) * 12.5
    return pa.table({
        "event_id": pa.array(
            [None if rng.random() < 0.05 else i
             for i in range(1, n + 1)], pa.int64()),
        "user_id": pa.array(
            [None if rng.random() < 0.1
             else int(rng.integers(1, max(n // 5, 2)))
             for _ in range(n)], pa.int64()),
        "event_type": pa.array(
            [None if rng.random() < 0.08
             else "xyz"[rng.integers(0, 3)] for _ in range(n)],
            pa.string()),
        "ts": pa.array(
            [None if rng.random() < 0.1
             else int(rng.integers(0, 5)) * DAY
             + int(rng.integers(0, 50)) * 37 * MIN // 10
             for _ in range(n)], pa.timestamp("us")),
        "value": pa.array([val() for _ in range(n)], pa.float64())})


@pytest.mark.parametrize("seed", [11, 22, 33, 44, 55])
def test_event_timeline_family_random(tmp_path, seed):
    import __ray_entry__ as E
    rng = np.random.default_rng(seed)
    _write(tmp_path, "events", _rand_events(rng, 160))
    q = E.queries()
    for name, sort_cols, casts in (
            ("psi_daily_drift_events", ["day", "bin"],
             {"bin": "int64", "n_prev": "int64", "n_cur": "int64"}),
            ("late_events_by_day", ["day"],
             {"n": "int64", "n_late": "int64"}),
            ("value_quantiles_by_day", ["day"], {"n": "int64"}),
            ("session_sensitivity_events", ["threshold_min"],
             {"threshold_min": "int64", "n_users": "int64",
              "n_sessions": "int64"}),
            ("type_mix_drift_daily", ["day", "event_type"],
             {"n_prev": "int64", "n_cur": "int64"})):
        out = q[name](str(tmp_path))
        exp = _oracle(tmp_path, name)
        if len(exp):
            exp = exp.astype(casts)
        if len(out) == 0 and len(exp) == 0:
            continue
        _match(out, exp, sort_cols)
