"""Randomized two-engine property net for the general equi-join: every
join type × both physical plans (Acero broadcast and the partitioned
shuffle, forced via broadcast_cap=0) against DuckDB on tables with
duplicate keys, null keys (never match — SQL semantics), skewed keys,
and occasionally empty sides."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _rand_table(rng, n, key_null_p, prefix):
    keys = rng.integers(0, max(2, n // 2), size=n).astype("float64")
    null_mask = rng.random(n) < key_null_p
    keys[null_mask] = np.nan
    return pd.DataFrame({
        "k": pd.array([None if np.isnan(x) else int(x) for x in keys],
                      dtype="Int64"),
        f"{prefix}v": rng.integers(-100, 100, size=n),
    })


@pytest.mark.parametrize("how,duck", [
    ("inner", "SELECT l.k, l.lv, r.rv FROM l JOIN r ON l.k = r.k"),
    ("left_outer",
     "SELECT l.k, l.lv, r.rv FROM l LEFT JOIN r ON l.k = r.k"),
    ("right_outer",
     "SELECT COALESCE(l.k, r.k) AS k, l.lv, r.rv "
     "FROM l RIGHT JOIN r ON l.k = r.k"),
    ("full_outer",
     "SELECT COALESCE(l.k, r.k) AS k, l.lv, r.rv "
     "FROM l FULL OUTER JOIN r ON l.k = r.k"),
    ("semi", "SELECT l.k, l.lv FROM l SEMI JOIN r ON l.k = r.k"),
    ("anti", "SELECT l.k, l.lv FROM l ANTI JOIN r ON l.k = r.k"),
])
def test_equi_join_matches_duckdb(how, duck):
    import duckdb
    import ray.data as rd

    from jsonschema_ray.joins import equi_join

    rng = np.random.default_rng(hash(how) % (2 ** 31))
    shuffle_supported = how in ("inner", "left_outer", "right_outer",
                                "full_outer", "semi", "anti")
    for trial in range(6):
        nl = int(rng.integers(0, 40))
        nr = int(rng.integers(0, 40))
        l = _rand_table(rng, nl, 0.15, "l")
        r = _rand_table(rng, nr, 0.15, "r")
        con = duckdb.connect()
        con.register("l", l)
        con.register("r", r)
        want = con.execute(duck).df()
        con.close()

        lt = pa.Table.from_pandas(l, preserve_index=False)
        rt = pa.Table.from_pandas(r, preserve_index=False)
        plans = [("broadcast", dict())] if not shuffle_supported else [
            ("broadcast", dict()),
            # broadcast_cap=0 forces the partitioned shuffle plan; the
            # schema hints cover randomly-empty sides (Ray's join dies
            # on zero-row inputs without them)
            ("shuffle", dict(
                broadcast_cap=0,
                left_schema=pa.schema([("k", pa.int64()),
                                       ("lv", pa.int64())]),
                right_schema=pa.schema([("k", pa.int64()),
                                        ("rv", pa.int64())]))),
        ]
        for plan, kw in plans:
            got = equi_join(rd.from_arrow(lt), rd.from_arrow(rt),
                            on="k", how=how, **kw).to_pandas()
            if len(want) == 0:
                assert len(got) == 0, (plan, trial, got)
                continue
            cols = sorted(want.columns)
            assert sorted(got.columns) == cols, (plan, trial,
                                                 sorted(got.columns))
            a = got[cols].astype("float64").sort_values(cols) \
                .reset_index(drop=True)
            b = want[cols].astype("float64").sort_values(cols) \
                .reset_index(drop=True)
            pd.testing.assert_frame_equal(a, b, check_dtype=False), \
                (plan, trial)
