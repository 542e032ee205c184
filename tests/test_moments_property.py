"""Randomized two-engine property net for the moment-machinery family
(session-6 operators): the distributed covariance pass vs DuckDB
covar_samp on random embedding tables with nulls and varying block
counts, and the grouped bivariate correlation vs DuckDB corr() on
random events tables with null values / null timestamps / null group
keys, duplicate groups, single-pair groups, and zero-variance groups.
NaN inputs stay OUT of the oracle trials (DuckDB raises there; the
engine's finite-pairs exclusion is pinned separately in
test_driver_contract) — these trials pin the NULL semantics and the
float agreement at the contract's 6 dp rounding."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(tuple(
            (f"{v:.10g}" if not math.isnan(v) else "nan")
            if isinstance(v, float) else str(v) for v in tup))
    return sorted(rows)


def test_covariance_matches_duckdb_randomized(tmp_path):
    import duckdb
    import ray.data as rd

    from jsonschema_ray.ann import covariance

    rng = np.random.default_rng(23)
    for trial in range(5):
        n = int(rng.integers(3, 80))
        d = int(rng.integers(2, 6))
        scale = float(10.0 ** float(rng.integers(-2, 4)))
        X = rng.normal(0, 1, (n, d)) * scale + rng.normal(0, scale)
        rows = [list(r) for r in X]
        # sprinkle null rows (excluded on both sides: SQL covar_samp
        # skips null pairs; a null LIST row contributes nothing)
        for i in rng.choice(n, size=max(1, n // 10), replace=False):
            rows[int(i)] = None
        keep = np.array([r is not None for r in rows])
        tb = pa.table({"vec_id": pa.array(range(n), type=pa.int64()),
                       "embedding": pa.array(
                           rows, type=pa.list_(pa.float64()))})
        parts = int(rng.integers(1, 5))
        cov, mean, cnt = covariance(
            rd.from_arrow(tb).repartition(parts))
        assert cnt == int(keep.sum())
        con = duckdb.connect()
        con.register("emb", tb.to_pandas())
        iu = np.triu_indices(d)
        got = pd.DataFrame({
            "i": iu[0] + 1, "j": iu[1] + 1,
            "cov": np.round(cov[iu], 6)})
        exp = con.execute("""
            WITH x AS (SELECT vec_id, unnest(embedding) AS v,
                              generate_subscripts(embedding, 1) AS i
                       FROM emb WHERE embedding IS NOT NULL)
            SELECT a.i AS i, b.i AS j, round(covar_samp(a.v, b.v), 6)
                   AS cov
            FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
            GROUP BY a.i, b.i ORDER BY i, j""").df()
        assert _canon(got) == _canon(exp), \
            f"trial {trial}: n={n} d={d} scale={scale} parts={parts}"


def test_grouped_corr_matches_duckdb_randomized(tmp_path):
    import os

    import duckdb

    import __ray_entry__ as E
    from jsonschema_ray.pipelines.relational import value_hour_corr_by_type

    rng = np.random.default_rng(31)
    sql = E.oracle_sql()["value_hour_corr_by_type"]
    for trial in range(5):
        n = int(rng.integers(2, 120))
        groups = [None, "a", "b", "c", "dd"]
        gt = [groups[int(g)] for g in rng.integers(0, len(groups), n)]
        vals = rng.normal(0, 100, n)
        # one group forced constant (zero variance → NULL corr)
        vals = np.where(np.array(gt) == "b", 7.25, vals)
        value = [None if rng.random() < 0.15 else float(v) for v in vals]
        ts = [None if rng.random() < 0.1 else
              1_700_000_000_000_000 + int(t)
              for t in rng.integers(0, 10**11, n)]
        tb = pa.table({
            "event_id": pa.array(range(n), type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "user_id": pa.array([0] * n, type=pa.int64()),
            "event_type": pa.array(gt, type=pa.string()),
            "value": pa.array(value, type=pa.float64()),
            "props": pa.array(["{}"] * n)})
        import pyarrow.parquet as pq
        path = tmp_path / f"t{trial}"
        os.makedirs(path, exist_ok=True)
        pq.write_table(tb, os.path.join(path, "events.parquet"))
        got = value_hour_corr_by_type(str(path))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{path}/events.parquet'")
        exp = con.execute(sql).df()
        assert len(got) == len(exp), f"trial {trial}"
        # canonize with None group as a marker string
        for df in (got, exp):
            df["event_type"] = df["event_type"].where(
                df["event_type"].notna(), "<null-group>")
        assert _canon(got) == _canon(exp), f"trial {trial}: n={n}"
