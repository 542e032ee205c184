"""Session-10 operators: blocked fuzzy matching (vectorized
Levenshtein record linkage), grouped winsorization, training-mix
upsampling — crafted edge branches; the sf oracles run in
test_driver_contract / the driver harness."""

import itertools
import math
import os
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_ray.text.fuzzy import blocked_fuzzy_pairs, levenshtein_many

pytestmark = pytest.mark.usefixtures("ray_session")


def _write(tmp_path, name, tb):
    pq.write_table(tb, os.path.join(tmp_path, f"{name}.parquet"))


def _lev_ref(a: str, b: str) -> int:
    """Pure-Python Wagner-Fischer over code points (the textbook
    definition the vectorized DP must reproduce)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def test_levenshtein_many_matches_reference():
    """Randomized pairs over varied lengths (incl. empty strings and
    non-ASCII code points — distances count CODE POINTS, the pinned
    divergence from DuckDB v1.0's byte counting on non-ASCII)."""
    rng = random.Random(17)
    alpha = "abcdeé𝕊"
    pairs = [("", ""), ("", "xyz"), ("xyz", ""), ("é", "e"),
             ("𝕊x", "Sx"), ("héllo", "hello")]
    for _ in range(400):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 14)))
        pairs.append((a, b))
    got = levenshtein_many([p[0] for p in pairs], [p[1] for p in pairs])
    exp = [_lev_ref(a, b) for a, b in pairs]
    assert got.tolist() == exp
    # the documented code-point pins
    assert _lev_ref("é", "e") == 1 and _lev_ref("𝕊x", "Sx") == 1


def _brute_pairs(rows, block_cols_idx, max_dist):
    """(block..., id, text) tuples → SQL self-join reference."""
    out = set()
    for ra, rb in itertools.combinations(rows, 2):
        ba, ia, ta = ra[:block_cols_idx], ra[block_cols_idx], \
            ra[block_cols_idx + 1]
        bb, ib, tb = rb[:block_cols_idx], rb[block_cols_idx], \
            rb[block_cols_idx + 1]
        if any(x is None for x in ba + bb) or None in (ia, ib, ta, tb):
            continue
        if ba != bb or ia == ib:
            continue
        lo, hi = (ia, ta), (ib, tb)
        if ib < ia:
            lo, hi = hi, lo
        d = _lev_ref(lo[1], hi[1])
        if d <= max_dist:
            out.add((lo[0], hi[0], d))
    return out


def test_blocked_fuzzy_pairs_matches_brute_force(ray_session):
    """Randomized blocks vs the pure-Python self-join: null block
    keys / null ids / null texts are invisible (SQL join semantics),
    id_a < id_b, cross-block pairs never form."""
    import ray.data
    rng = random.Random(23)
    rows = []
    for i in range(120):
        blk = rng.choice(["b1", "b2", "b3", None])
        txt = rng.choice(
            ["kitten", "sitten", "sittin", "sitting", "mitten",
             "kittens", None])
        rid = None if rng.random() < 0.05 else i
        rows.append((blk, rid, txt))
    tb = pa.table({
        "blk": pa.array([r[0] for r in rows]),
        "rid": pa.array([r[1] for r in rows], type=pa.int64()),
        "txt": pa.array([r[2] for r in rows])})
    ds = ray.data.from_arrow(tb)
    out = blocked_fuzzy_pairs(ds, ["blk"], "txt", "rid",
                              max_dist=2).to_pandas()
    got = set(zip(out["id_a"].astype("int64"),
                  out["id_b"].astype("int64"),
                  out["dist"].astype("int64")))
    assert got == _brute_pairs(rows, 1, 2)


def test_blocked_fuzzy_pairs_chunked_plan_identical(ray_session):
    """A pair_chunk smaller than one row's pair fan-out forces the
    row-chunked triu path through many slabs — identical output."""
    import ray.data
    rows = [("b", i, t) for i, t in enumerate(
        ["kitten", "sitten", "mitten", "bitten", "kitty", "kittenz"])]
    tb = pa.table({"blk": pa.array([r[0] for r in rows]),
                   "rid": pa.array([r[1] for r in rows],
                                   type=pa.int64()),
                   "txt": pa.array([r[2] for r in rows])})
    big = blocked_fuzzy_pairs(ray.data.from_arrow(tb), ["blk"], "txt",
                              "rid", max_dist=3).to_pandas()
    tiny = blocked_fuzzy_pairs(ray.data.from_arrow(tb), ["blk"], "txt",
                               "rid", max_dist=3,
                               pair_chunk=1).to_pandas()
    key = ["id_a", "id_b", "dist"]
    assert sorted(map(tuple, big[key].to_numpy().tolist())) == \
        sorted(map(tuple, tiny[key].to_numpy().tolist()))


def test_blocked_fuzzy_pairs_block_cap_raises(ray_session):
    """The blocking contract: a block above max_block_rows raises
    loudly instead of going silently quadratic."""
    import ray.data
    tb = pa.table({"blk": pa.array(["b"] * 10),
                   "rid": pa.array(list(range(10)), type=pa.int64()),
                   "txt": pa.array(["t%d" % i for i in range(10)])})
    ds = blocked_fuzzy_pairs(ray.data.from_arrow(tb), ["blk"], "txt",
                             "rid", max_block_rows=5)
    with pytest.raises(Exception, match="max_block_rows"):
        ds.to_pandas()


def test_winsorize_null_type_group_null_value_and_nan(tmp_path):
    """A NULL event_type is a REAL group with its own bounds; a NULL
    value stays NULL; an all-NULL-value group emits only NULLs; a NaN
    value passes through unclipped AND is excluded from the bounds
    (the repo's psi/drift convention — the documented divergence from
    DuckDB's NaN-above-everything total order)."""
    from jsonschema_ray.pipelines.relational import (
        winsorize_events_by_type)
    # type a finite values: 1..20 plus 25 (n=21) -> quantile_disc
    # p05 = value at ceil(0.05*21)=2 -> 2; p95 = ceil(0.95*21)=20 -> 20
    vals = list(range(1, 21))
    n = len(vals)
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array(list(range(1, n + 8)), type=pa.int64()),
        "event_type": pa.array(["a"] * n + ["a"]
                               + [None, None, None] + ["c", "c"]
                               + ["a"]),
        "value": pa.array(vals + [float("nan")]
                          + [10.0, 100.0, None] + [None, None]
                          + [25.0], type=pa.float64())}))
    out = winsorize_events_by_type(str(tmp_path))
    w = dict(zip(out["event_id"], out["value_w"]))
    assert w[1] == 2.0                           # 1 clipped up to p05
    assert w[3] == 3.0 and w[19] == 19.0         # interior untouched
    assert w[n] == 20.0                          # 20 == p95, untouched
    assert math.isnan(w[n + 1])                  # NaN passes through
    assert w[n + 2] == 10.0 and w[n + 3] == 100.0  # null-type bounds
    assert math.isnan(w[n + 4])                  # NULL value -> NULL
    assert math.isnan(w[n + 5]) and math.isnan(w[n + 6])  # all-null grp
    # NaN excluded from bounds: 25 clips to p95=20 — had NaN counted
    # (DuckDB total order ranks it top), p95 over n=22 would be 25
    # itself and the row would pass unclipped
    assert w[n + 7] == 20.0


def test_upsample_weights_null_source_and_zero_weight(tmp_path):
    """weights[source] copies with a 1-based copy index; NULL source
    takes the default; weight 0 drops the row (SQL
    generate_series(1,0) is empty)."""
    from jsonschema_ray.pipelines.relational import upsample_documents
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "source": pa.array(["a", "b", None, "z"])}))
    out = upsample_documents(str(tmp_path),
                             weights={"a": 3, "b": 0}, default=1)
    recs = list(zip(out["doc_id"], out["copy"]))
    assert recs == [(1, 1), (1, 2), (1, 3), (3, 1), (4, 1)]
    assert out["copy"].dtype == np.dtype("int64")


def test_blocked_fuzzy_pairs_duplicate_ids_never_self_pair(ray_session):
    """SQL id_a < id_b: two rows sharing an id (near-identical texts
    under a duplicated key) must NOT emit an (id, id) pair, while
    distinct-id pairs still form."""
    import ray.data
    tb = pa.table({"blk": pa.array(["b", "b", "b"]),
                   "rid": pa.array([7, 7, 9], type=pa.int64()),
                   "txt": pa.array(["kitten", "sitten", "mitten"])})
    out = blocked_fuzzy_pairs(ray.data.from_arrow(tb), ["blk"], "txt",
                              "rid", max_dist=2).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (7, 7) not in pairs
    assert (7, 9) in pairs  # both id-7 rows still pair with id 9
    assert len(out) == 2    # kitten-mitten and sitten-mitten


def test_hard_negative_nan_query_label_is_null(tmp_path):
    """A float-NaN query label (the pandas missing flavor) must behave
    exactly like None: both-NULL pairs are SAME (excluded), so the
    query vector itself never surfaces."""
    import numpy as np

    from jsonschema_ray.ann import hard_negative_topk
    import ray.data
    rng = np.random.default_rng(5)
    base = rng.normal(size=(6, 4))
    tb = pa.table({
        "vec_id": pa.array(list(range(6)), type=pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in base],
                              type=pa.list_(pa.float64())),
        "label": pa.array([None, None, "y", "y", "y", "y"])})
    ds = ray.data.from_arrow(tb)
    # query = vec 0 with label NaN (not None): must exclude vecs 0,1
    out = hard_negative_topk(ds, [list(map(float, base[0]))],
                             [float("nan")], query_ids=[0], k=6)
    assert set(out["vec_id"]) == {2, 3, 4, 5}


def test_source_quota_int64_payload_past_2_53(tmp_path):
    """Null-bearing int64 ranking with doc ids past 2^53: the nullable
    Int64 partition path must keep ids exact (a float64 roundtrip
    rounds 2^53+1 to 2^53)."""
    from jsonschema_ray.pipelines.relational import source_quota_documents
    big = 2 ** 53
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([big + 1, big + 3, big + 5], type=pa.int64()),
        "source": pa.array(["a", "a", "a"]),
        "n_chars": pa.array([10, None, 30], type=pa.int64())}))
    out = source_quota_documents(str(tmp_path), quota=2)
    assert out["doc_id"].tolist() == [big + 1, big + 5]


def test_upsample_empty_input(tmp_path):
    """Zero-row documents table answers the typed empty frame."""
    from jsonschema_ray.pipelines.relational import upsample_documents
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([], type=pa.int64()),
        "source": pa.array([], type=pa.string())}))
    out = upsample_documents(str(tmp_path))
    assert len(out) == 0 and list(out.columns) == ["doc_id", "source",
                                                   "copy"]


def test_regr_zero_variance_single_pair_and_nan(tmp_path):
    """Grouped OLS: a known exact fit; zero-variance-hour and
    single-pair groups answer NULL like DuckDB regr_slope (0/0);
    null value/ts pairs are invisible; a NaN value is excluded from
    the moments (psi/drift convention — DuckDB raises instead)."""
    from jsonschema_ray.pipelines.relational import (
        regr_value_hour_by_type)
    import datetime as dt

    def t(h):
        return dt.datetime(2024, 1, 1, h, 0, 0)
    rows = [
        # group a: (1,2),(2,4),(3,6) -> slope 2, intercept 0; one NaN
        # value and one null ts must not disturb the fit
        ("a", t(1), 2.0), ("a", t(2), 4.0), ("a", t(3), 6.0),
        ("a", t(4), float("nan")), ("a", None, 9.0),
        # group b: constant hour -> var(x)=0 -> NULL
        ("b", t(5), 1.0), ("b", t(5), 2.0),
        # group c: single pair -> NULL
        ("c", t(6), 3.0),
    ]
    _write(tmp_path, "events", pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], type=pa.float64())}))
    out = regr_value_hour_by_type(str(tmp_path))
    g = out.set_index("event_type")
    assert g.loc["a", "slope"] == 2.0 and g.loc["a", "intercept"] == 0.0
    assert g.loc["a", "n"] == 3  # NaN and null-ts rows excluded
    assert math.isnan(g.loc["b", "slope"])
    assert math.isnan(g.loc["c", "slope"])
    assert math.isnan(g.loc["b", "intercept"])


def test_weighted_sample_exclusions_and_exact_keys(tmp_path):
    """A-Res selection equals the same formula computed locally;
    negative/NULL doc_id and non-positive/NULL n_chars rows are
    invisible; heavier docs need smaller u to lose."""
    from jsonschema_ray.pipelines.relational import (
        weighted_sample_documents)
    ids = list(range(1, 31))
    chars = [(i * 37) % 500 + 1 for i in ids]
    all_ids = ids + [-5, None, 40, 41]
    all_chars = chars + [100, 100, None, 0]
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array(all_ids, type=pa.int64()),
        "source": pa.array(["s"] * len(all_ids)),
        "n_chars": pa.array(all_chars, type=pa.int64())}))
    out = weighted_sample_documents(str(tmp_path), k=10)
    key = {i: ((i % 1000003) * 2654435761 % 4294967296 + 1)
           / 4294967297.0 for i in ids}
    exp = sorted(ids, key=lambda i: (-(key[i] ** (1.0 / chars[i - 1])),
                                     i))[:10]
    assert out["doc_id"].tolist() == exp
    assert set(out["doc_id"]) & {-5, 40, 41} == set()


def test_candles_ties_nulls_and_null_type_group(tmp_path):
    """OHLC: ties on ts break by event_id for BOTH open and close;
    null ts / null value rows are invisible; a NULL event_type is a
    real group whose open/close attach through the NaN-matching merge."""
    from jsonschema_ray.pipelines.relational import candles_events
    import datetime as dt
    T = dt.datetime
    rows = [
        # type a, one day: tie at 09:00 -> open = id 1's value; tie at
        # 17:00 -> close = id 5's value (DESC id picks the LARGEST id)
        ("a", T(2024, 1, 1, 9), 1, 10.0),
        ("a", T(2024, 1, 1, 9), 2, 20.0),
        ("a", T(2024, 1, 1, 12), 3, 99.0),
        ("a", T(2024, 1, 1, 17), 4, 5.0),
        ("a", T(2024, 1, 1, 17), 5, 7.0),
        # invisible rows
        ("a", None, 6, 1000.0),
        ("a", T(2024, 1, 1, 3), 7, None),
        # NULL type group, second day boundary
        (None, T(2024, 1, 2, 8), 8, 3.0),
        (None, T(2024, 1, 2, 9), 9, 4.0),
    ]
    _write(tmp_path, "events", pa.table({
        "event_type": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
        "event_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "value": pa.array([r[3] for r in rows], type=pa.float64())}))
    out = candles_events(str(tmp_path))
    a = out[out["event_type"] == "a"].iloc[0]
    assert (a["open"], a["close"], a["high"], a["low"], a["n"]) == \
        (10.0, 7.0, 99.0, 5.0, 5)
    nul = out[out["event_type"].isna()].iloc[0]
    assert (nul["day"], nul["open"], nul["close"], nul["n"]) == \
        ("2024-01-02", 3.0, 4.0, 2)


def test_novelty_shared_unique_short_null(tmp_path):
    """Novelty: a doc duplicated verbatim scores 0 (every gram
    shared), a unique doc scores 1, overlap in between; < 8-token and
    null-text docs answer NULL; a NULL-id doc CONTRIBUTES to gram
    doc-counts (SQL keeps it in the grams CTE) but never receives a
    score."""
    from jsonschema_ray.pipelines.relational import novelty_documents
    w = lambda k: " ".join(f"{k}{i}" for i in range(9))  # 9 tokens
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, None], type=pa.int64()),
        "text": pa.array([
            w("a"),            # doc 1: duplicated by doc 2 -> 0.0
            w("a"),            # doc 2 -> 0.0
            w("b"),            # doc 3: duplicated ONLY by null-id doc
            "one two three",   # doc 4: <8 tokens -> NULL
            None,              # doc 5: null text -> NULL
            w("b")])}))        # null id: shares doc 3's grams
    out = novelty_documents(str(tmp_path))
    v = dict(zip(out["doc_id"], out["novelty"]))
    assert v[1] == 0.0 and v[2] == 0.0
    # doc 3's grams appear in 2 "documents" (doc 3 + the null-id row)
    assert v[3] == 0.0
    assert math.isnan(v[4]) and math.isnan(v[5])
    assert len(out) == 6 and out["doc_id"].isna().sum() == 1


def test_cooccur_null_user_null_type_and_dedup(tmp_path):
    """Co-occurrence counts DISTINCT users per unordered pair:
    repeated (user, type) events count once; null users and null
    types are invisible; a user with one type contributes nothing."""
    from jsonschema_ray.pipelines.relational import cooccur_event_types
    rows = [
        (1, "a"), (1, "a"), (1, "b"),       # repeat (1,a) counts once
        (2, "a"), (2, "b"), (2, "c"),       # 3 pairs
        (3, "a"),                           # single type: no pair
        (None, "a"), (None, "b"),           # null user invisible
        (4, None), (4, "a"),                # null type invisible
    ]
    _write(tmp_path, "events", pa.table({
        "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "event_type": pa.array([r[1] for r in rows])}))
    out = cooccur_event_types(str(tmp_path))
    got = {(r.type_a, r.type_b): r.n_users
           for r in out.itertuples(index=False)}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_levenshtein_banded_equals_full():
    """The cap path: exact where dist <= cap, cap+1 above — pinned to
    the full DP on randomized mixed-length pairs for caps 0..4."""
    rng = random.Random(41)
    alpha = "abcde"
    pairs = []
    for _ in range(600):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 16)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 16)))
        pairs.append((a, b))
    A = [p[0] for p in pairs]
    B = [p[1] for p in pairs]
    full = levenshtein_many(A, B)
    for cap in (0, 1, 2, 3, 4):
        banded = levenshtein_many(A, B, cap=cap)
        exp = np.minimum(full, cap + 1)
        assert banded.tolist() == exp.tolist(), cap
