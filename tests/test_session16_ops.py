"""Session-16 operators: HHI source concentration, Fano factor of the
daily grid, and the exact-dup cluster-size histogram — crafted edge
branches the sf oracles can't reach (single-source langs, exact 1/k
splits, calendar gaps, null rows, content-pure clustering). The
sf-scale value oracles run in test_driver_contract and were
hand-verified at sf0.001/0.01/0.1."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_ray.pipelines.relational import (
    dup_cluster_sizes_documents, fano_daily_events, hhi_sources_by_lang)

pytestmark = pytest.mark.usefixtures("ray_session")

DAY = 86_400_000_000  # one day in µs


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


def _documents(tmp_path, rows):
    """rows: (doc_id, text|None, lang|None, source|None)."""
    _write(tmp_path, "documents", pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "source": pa.array([r[3] for r in rows], pa.string()),
    }))


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
# hhi_sources_by_lang


def test_hhi_single_source_is_one_and_even_split_is_one_over_k(tmp_path):
    """A lang fed by ONE source answers exactly 1.0; four equal
    sources answer exactly 0.25 — both representable doubles, so the
    6dp round is a no-op and the match is bit-exact."""
    rows = [(1, "a", "en", "s0"), (2, "b", "en", "s0"),
            (3, "c", "en", "s0")]
    rows += [(10 + i, f"t{i}", "de", f"src{i % 4}") for i in range(8)]
    _documents(tmp_path, rows)
    got = hhi_sources_by_lang(str(tmp_path))
    exp = _oracle(tmp_path, "hhi_sources_by_lang")
    _frames_equal(got, exp, ["lang"])
    by = got.set_index("lang")
    assert by.loc["en", "hhi"] == 1.0
    assert by.loc["de", "hhi"] == 0.25
    assert int(by.loc["de", "n_sources"]) == 4


def test_hhi_uneven_split_hand_value(tmp_path):
    """(3,1) split: hhi = (9+1)/16 = 0.625 exactly."""
    _documents(tmp_path, [
        (1, "a", "en", "big"), (2, "b", "en", "big"),
        (3, "c", "en", "big"), (4, "d", "en", "small")])
    got = hhi_sources_by_lang(str(tmp_path))
    exp = _oracle(tmp_path, "hhi_sources_by_lang")
    _frames_equal(got, exp, ["lang"])
    assert got["hhi"].iloc[0] == 0.625
    assert int(got["n_docs"].iloc[0]) == 4


def test_hhi_null_source_excluded_null_lang_own_group(tmp_path):
    """A null source is no source (excluded on both engines — it must
    not form a phantom category that dilutes the index); a null LANG
    is its own GROUP BY group and sorts last."""
    _documents(tmp_path, [
        (1, "a", "en", "s0"), (2, "b", "en", None),
        (3, "c", None, "s1"), (4, "d", None, "s1"),
        (5, "e", None, "s2")])
    got = hhi_sources_by_lang(str(tmp_path))
    exp = _oracle(tmp_path, "hhi_sources_by_lang")
    _frames_equal(got, exp, ["n_docs"])
    assert len(got) == 2
    en = got[got["lang"] == "en"]
    assert int(en["n_docs"].iloc[0]) == 1  # the null-source row is gone
    nul = got[got["lang"].isna()]
    assert int(nul["n_docs"].iloc[0]) == 3
    # (2,1) split: (4+1)/9
    assert nul["hhi"].iloc[0] == float(np.round(5.0 / 9.0, 6))


def test_hhi_all_null_sources_empty(tmp_path):
    _documents(tmp_path, [(1, "a", "en", None), (2, "b", "de", None)])
    got = hhi_sources_by_lang(str(tmp_path))
    exp = _oracle(tmp_path, "hhi_sources_by_lang")
    assert len(got) == 0 and len(exp) == 0
    assert list(got.columns) == ["lang", "n_docs", "n_sources", "hhi"]


# ---------------------------------------------------------------------------
# fano_daily_events


def test_fano_constant_series_is_zero(tmp_path):
    """One event per day for four days: variance 0 → fano exactly 0.0."""
    _events(tmp_path, [(i + 1, 1, i * DAY, "click") for i in range(4)])
    got = fano_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "fano_daily_events")
    _frames_equal(got, exp, ["event_type"])
    assert got["fano"].iloc[0] == 0.0
    assert int(got["n_days"].iloc[0]) == 4


def test_fano_gap_zero_fill_hand_value(tmp_path):
    """4 events on day0, 1 on day4 → grid [4,0,0,0,1]: m=5, Σx=5,
    Σx²=17, fano = (5·17−25)/(5·5) = 60/25 = 2.4 exactly. The three
    GAP days are load-bearing: without zero-fill the series would be
    [4,1] and fano (2·17−25)/(2·5) = 0.9."""
    _events(tmp_path, [(i, 1, 0 * DAY, "burst") for i in range(1, 5)]
            + [(5, 1, 4 * DAY, "burst")])
    got = fano_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "fano_daily_events")
    _frames_equal(got, exp, ["event_type"])
    assert got["fano"].iloc[0] == 2.4
    assert int(got["n_days"].iloc[0]) == 5


def test_fano_single_day_grid_is_zero(tmp_path):
    """m=1 makes the numerator m·Σx²−(Σx)² identically zero for any
    count — the degenerate grid answers 0.0, not a division error."""
    _events(tmp_path, [(1, 1, 0, "click"), (2, 2, 1000, "click")])
    got = fano_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "fano_daily_events")
    _frames_equal(got, exp, ["event_type"])
    assert got["fano"].iloc[0] == 0.0


def test_fano_global_grid_and_null_rows(tmp_path):
    """Types share the GLOBAL calendar: 'rare' fires once on day2 but
    its series spans all 3 grid days [0,0,1] → fano = (3·1−1)/(3·1)
    = 2/3 (rounded 6dp). Null ts and null type rows are invisible."""
    _events(tmp_path, [
        (1, 1, 0 * DAY, "steady"), (2, 1, 1 * DAY, "steady"),
        (3, 1, 2 * DAY, "steady"), (4, 1, 2 * DAY, "rare"),
        (5, 1, None, "steady"), (6, 1, 1 * DAY, None)])
    got = fano_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "fano_daily_events")
    _frames_equal(got, exp, ["event_type"])
    by = got.set_index("event_type")
    assert by.loc["steady", "fano"] == 0.0
    assert by.loc["rare", "fano"] == float(np.round(2.0 / 3.0, 6))
    assert int(by.loc["rare", "n_days"]) == 3


def test_fano_empty_events_empty_frame(tmp_path):
    _events(tmp_path, [(1, 1, None, None)])
    got = fano_daily_events(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["event_type", "n_days", "fano"]


# ---------------------------------------------------------------------------
# dup_cluster_sizes_documents


def test_dup_cluster_histogram_hand_case(tmp_path):
    """3×'aaa', 2×'bb', 1×'c' → sizes {3:1, 2:1, 1:1}."""
    _documents(tmp_path, [
        (1, "aaa", "en", "s"), (2, "aaa", "en", "s"),
        (3, "aaa", "en", "s"), (4, "bb", "en", "s"),
        (5, "bb", "en", "s"), (6, "c", "en", "s")])
    got = dup_cluster_sizes_documents(str(tmp_path))
    exp = _oracle(tmp_path, "dup_cluster_sizes_documents")
    _frames_equal(got, exp, ["size"])
    assert got.set_index("size")["n_clusters"].to_dict() == {
        1: 1, 2: 1, 3: 1}


def test_dup_clustering_is_content_pure(tmp_path):
    """The SAME text under different doc_id / lang / source is ONE
    cluster — dedup keys on content alone (the exact-dedup contract);
    unicode round-trips through the UTF-8 md5 on both engines."""
    _documents(tmp_path, [
        (1, "héllo wörld", "en", "s0"), (2, "héllo wörld", "de", "s1"),
        (3, "héllo wörld", None, None), (4, "other", "en", "s0")])
    got = dup_cluster_sizes_documents(str(tmp_path))
    exp = _oracle(tmp_path, "dup_cluster_sizes_documents")
    _frames_equal(got, exp, ["size"])
    assert got.set_index("size")["n_clusters"].to_dict() == {1: 1, 3: 1}


def test_dup_null_text_excluded_empty_string_is_a_doc(tmp_path):
    """Null text is no document (excluded); the EMPTY string is a real
    (degenerate) document and clusters normally."""
    _documents(tmp_path, [
        (1, None, "en", "s"), (2, "", "en", "s"), (3, "", "en", "s")])
    got = dup_cluster_sizes_documents(str(tmp_path))
    exp = _oracle(tmp_path, "dup_cluster_sizes_documents")
    _frames_equal(got, exp, ["size"])
    assert got.set_index("size")["n_clusters"].to_dict() == {2: 1}


def test_dup_all_null_text_empty(tmp_path):
    _documents(tmp_path, [(1, None, "en", "s")])
    got = dup_cluster_sizes_documents(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["size", "n_clusters"]


# ---------------------------------------------------------------------------
# spearman_quantity_discount


def _lineitem_qd(tmp_path, rows):
    """rows: (l_quantity|None, l_discount|None)."""
    _write(tmp_path, "lineitem", pa.table({
        "l_quantity": pa.array([r[0] for r in rows], pa.float64()),
        "l_discount": pa.array([r[1] for r in rows], pa.float64()),
    }))


def test_spearman_perfect_monotone_is_exactly_one(tmp_path):
    """Strictly increasing y over distinct x: ranks coincide, so
    num == dx == dy and rho is EXACTLY 1.0; the reverse is -1.0."""
    from jsonschema_ray.pipelines.relational import (
        spearman_quantity_discount)
    _lineitem_qd(tmp_path, [(1.0, 0.01), (2.0, 0.02), (5.0, 0.07),
                            (9.0, 0.10)])
    got = spearman_quantity_discount(str(tmp_path))
    exp = _oracle(tmp_path, "spearman_quantity_discount")
    _frames_equal(got, exp, ["n_rows"])
    assert got["rho"].iloc[0] == 1.0
    _lineitem_qd(tmp_path, [(1.0, 0.10), (2.0, 0.07), (5.0, 0.02),
                            (9.0, 0.01)])
    assert spearman_quantity_discount(str(tmp_path))["rho"].iloc[0] == -1.0


def test_spearman_tie_averaged_ranks_hand_value(tmp_path):
    """x=[1,1,2], y=[3,4,5]: the two tied x take avg rank 1.5 (doubled
    rank 3), so num=dx=18, dy=24 → rho = 18/(√18·√24) = 0.866025.
    This pins the FRACTIONAL tie rule — integer min- or max-rank would
    answer a different value."""
    from jsonschema_ray.pipelines.relational import (
        spearman_quantity_discount)
    _lineitem_qd(tmp_path, [(1.0, 3.0), (1.0, 4.0), (2.0, 5.0)])
    got = spearman_quantity_discount(str(tmp_path))
    exp = _oracle(tmp_path, "spearman_quantity_discount")
    _frames_equal(got, exp, ["n_rows"])
    assert got["rho"].iloc[0] == 0.866025
    assert int(got["n_q"].iloc[0]) == 2 and int(got["n_d"].iloc[0]) == 3


def test_spearman_zero_variance_is_null(tmp_path):
    """A constant x side has dx == 0 → rho SQL-NULL, rows still
    counted (the aggregate row survives)."""
    from jsonschema_ray.pipelines.relational import (
        spearman_quantity_discount)
    _lineitem_qd(tmp_path, [(7.0, 0.01), (7.0, 0.05), (7.0, 0.09)])
    got = spearman_quantity_discount(str(tmp_path))
    exp = _oracle(tmp_path, "spearman_quantity_discount")
    _frames_equal(got, exp, ["n_rows"])
    assert int(got["n_rows"].iloc[0]) == 3
    assert math.isnan(got["rho"].iloc[0])


def test_spearman_null_and_nonfinite_excluded(tmp_path):
    """Null, NaN and inf on either side drop the ROW on both engines
    (isfinite in SQL, pc.is_finite here) — they are not rankable."""
    from jsonschema_ray.pipelines.relational import (
        spearman_quantity_discount)
    _lineitem_qd(tmp_path, [
        (1.0, 0.01), (2.0, 0.02), (5.0, 0.07), (9.0, 0.10),
        (None, 0.3), (3.0, None), (float("nan"), 0.5),
        (4.0, float("inf"))])
    got = spearman_quantity_discount(str(tmp_path))
    exp = _oracle(tmp_path, "spearman_quantity_discount")
    _frames_equal(got, exp, ["n_rows"])
    assert int(got["n_rows"].iloc[0]) == 4
    assert got["rho"].iloc[0] == 1.0


def test_spearman_empty_answers_zero_row(tmp_path):
    from jsonschema_ray.pipelines.relational import (
        spearman_quantity_discount)
    _lineitem_qd(tmp_path, [(None, None)])
    got = spearman_quantity_discount(str(tmp_path))
    exp = _oracle(tmp_path, "spearman_quantity_discount")
    _frames_equal(got, exp, ["n_rows"])
    assert int(got["n_rows"].iloc[0]) == 0
    assert math.isnan(got["rho"].iloc[0])


def test_hugeint_varchar_double_route_is_correctly_rounded():
    """The parity mechanism behind spearman's oracle: DuckDB's direct
    HUGEINT->DOUBLE cast DOUBLE-ROUNDS (upper*2^64 + lower — measured
    ~1.7% off-by-ulp at 70 bits), while HUGEINT->VARCHAR->DOUBLE is a
    correctly-rounded strtod that equals Python's float(int) exactly.
    Guards the oracle against a DuckDB behavior change."""
    import random

    import duckdb
    con = duckdb.connect()
    rng = random.Random(13)
    direct_bad = 0
    for bits in (60, 70, 90, 110, 126):
        for _ in range(400):
            v = rng.getrandbits(bits) | 1
            via_str = con.execute(
                f"SELECT CAST(CAST(CAST('{v}' AS HUGEINT) AS VARCHAR)"
                f" AS DOUBLE)").fetchone()[0]
            assert via_str == float(v), v
            direct = con.execute(
                f"SELECT CAST(CAST('{v}' AS HUGEINT) AS DOUBLE)"
            ).fetchone()[0]
            direct_bad += direct != float(v)
    # the direct cast IS lossy somewhere in this range — if this ever
    # reads 0, DuckDB fixed it and the VARCHAR detour can be dropped
    assert direct_bad > 0


# ---------------------------------------------------------------------------
# kendall_tau_daily_events


def test_kendall_identical_and_reversed_series(tmp_path):
    """Two types with the SAME strictly-varying daily profile answer
    tau exactly 1.0; a third moving exactly opposite answers -1.0
    against both."""
    from jsonschema_ray.pipelines.relational import (
        kendall_tau_daily_events)
    rows, eid = [], 0
    up = [1, 2, 4]          # strictly increasing counts per day
    for day, k in enumerate(up):
        for t in ("a", "b"):
            for _ in range(k):
                eid += 1
                rows.append((eid, 1, day * DAY, t))
    for day, k in enumerate(reversed(up)):  # "c" mirrors
        for _ in range(k):
            eid += 1
            rows.append((eid, 1, day * DAY, "c"))
    _events(tmp_path, rows)
    got = kendall_tau_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "kendall_tau_daily_events")
    _frames_equal(got, exp, ["t1", "t2"])
    by = got.set_index(["t1", "t2"])
    assert by.loc[("a", "b"), "tau"] == 1.0
    assert by.loc[("a", "c"), "tau"] == -1.0
    assert by.loc[("b", "c"), "tau"] == -1.0


def test_kendall_tau_b_tie_hand_value(tmp_path):
    """x=[1,1,2] vs y=[1,2,3]: S=2, n0=3, tx=1, ty=0 → tau-b =
    2/(√2·√3) = 0.816497 — pins the TIE-ADJUSTED denominator (plain
    tau-a would answer 2/3)."""
    from jsonschema_ray.pipelines.relational import (
        kendall_tau_daily_events)
    rows, eid = [], 0
    for day, k in enumerate([1, 1, 2]):
        for _ in range(k):
            eid += 1
            rows.append((eid, 1, day * DAY, "x"))
    for day, k in enumerate([1, 2, 3]):
        for _ in range(k):
            eid += 1
            rows.append((eid, 1, day * DAY, "y"))
    _events(tmp_path, rows)
    got = kendall_tau_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "kendall_tau_daily_events")
    _frames_equal(got, exp, ["t1", "t2"])
    r = got.iloc[0]
    assert (r["t1"], r["t2"]) == ("x", "y")
    assert int(r["n_pairs"]) == 3 and int(r["s"]) == 2
    assert r["tau"] == 0.816497


def test_kendall_constant_side_is_null_and_gap_is_signal(tmp_path):
    """A constant series ties every day pair (n0 == tx) → SQL-NULL.
    The GAP day is load-bearing: 'spiky' fires days 0 and 2 only, so
    its zero-filled series [1,0,1] ties days 0/2 — without the grid
    the pairing would collapse to two days and change every count."""
    from jsonschema_ray.pipelines.relational import (
        kendall_tau_daily_events)
    rows, eid = [], 0
    for day in range(3):                      # constant: 1/day
        eid += 1
        rows.append((eid, 1, day * DAY, "flat"))
    for day in (0, 2):                        # gap on day 1
        eid += 1
        rows.append((eid, 1, day * DAY, "spiky"))
    _events(tmp_path, rows)
    got = kendall_tau_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "kendall_tau_daily_events")
    _frames_equal(got, exp, ["t1", "t2"])
    r = got.iloc[0]
    assert (r["t1"], r["t2"]) == ("flat", "spiky")
    assert math.isnan(r["tau"])               # flat side: n0 == tx
    assert int(r["n_pairs"]) == 3             # the gap day IS a day


def test_kendall_degenerate_grids_answer_empty(tmp_path):
    """A single observed type has no pair; a single-day grid has no
    day pair — both answer NO rows like the SQL's empty self-join."""
    from jsonschema_ray.pipelines.relational import (
        kendall_tau_daily_events)
    _events(tmp_path, [(1, 1, 0, "solo"), (2, 1, DAY, "solo")])
    got = kendall_tau_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "kendall_tau_daily_events")
    assert len(got) == 0 and len(exp) == 0
    _events(tmp_path, [(1, 1, 0, "a"), (2, 1, 1000, "b")])
    got = kendall_tau_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "kendall_tau_daily_events")
    assert len(got) == 0 and len(exp) == 0
    assert list(got.columns) == ["t1", "t2", "n_pairs", "s", "tau"]


def test_kendall_chunked_strip_equals_naive(tmp_path):
    """The 256-row strip chunking crosses a boundary on a 300-day
    grid: S from the pipeline must equal the naive all-pairs double
    loop (and the oracle)."""
    from jsonschema_ray.pipelines.relational import (
        kendall_tau_daily_events)
    rng = np.random.default_rng(5)
    ka = rng.integers(1, 4, 300)
    kb = rng.integers(1, 4, 300)
    rows, eid = [], 0
    for day in range(300):
        for _ in range(int(ka[day])):
            eid += 1
            rows.append((eid, 1, day * DAY, "a"))
        for _ in range(int(kb[day])):
            eid += 1
            rows.append((eid, 1, day * DAY, "b"))
    _events(tmp_path, rows)
    got = kendall_tau_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "kendall_tau_daily_events")
    _frames_equal(got, exp, ["t1", "t2"])
    s_naive = sum(
        int(np.sign(ka[i] - ka[j]) * np.sign(kb[i] - kb[j]))
        for i in range(300) for j in range(i + 1, 300))
    assert int(got["s"].iloc[0]) == s_naive


# ---------------------------------------------------------------------------
# auc_value_error_events


def _events_v(tmp_path, rows):
    """rows: (event_id, event_type|None, value|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    }))


def _auc(tmp_path):
    from jsonschema_ray.pipelines.relational import auc_value_error_events
    got = auc_value_error_events(str(tmp_path))
    exp = _oracle(tmp_path, "auc_value_error_events")
    _frames_equal(got, exp, ["n_pos"])
    return got.iloc[0]


def test_auc_perfect_separation_and_reversal(tmp_path):
    """Every error scores above every non-error → AUC exactly 1.0;
    flipping the classes answers exactly 0.0."""
    _events_v(tmp_path, [(1, "error", 3.0), (2, "click", 1.0),
                         (3, "view", 2.0)])
    r = _auc(tmp_path)
    assert r["auc"] == 1.0 and r["u2"] == "4"
    _events_v(tmp_path, [(1, "error", 0.5), (2, "click", 1.0),
                         (3, "view", 2.0)])
    assert _auc(tmp_path)["auc"] == 0.0


def test_auc_ties_take_half_credit_hand_value(tmp_path):
    """pos=[2,3], neg=[1,2]: one win-win, one tie, two wins → U=3.5,
    AUC = 3.5/4 = 0.875, 2U = 7 exactly — pins the Mann-Whitney
    0.5-per-tie rule (rank-without-tie-averaging would answer 1.0 or
    0.75 depending on order)."""
    _events_v(tmp_path, [(1, "error", 2.0), (2, "error", 3.0),
                         (3, "click", 1.0), (4, "view", 2.0)])
    r = _auc(tmp_path)
    assert r["u2"] == "7" and r["auc"] == 0.875
    assert int(r["n_pos"]) == 2 and int(r["n_neg"]) == 2


def test_auc_all_tied_is_half_and_cent_quantization(tmp_path):
    """Scores tie at CENT granularity (the query's stated contract):
    0.199 and 0.204 both quantize to 20 cents on both engines, so a
    pos/neg pair there is a TIE and the degenerate corpus answers
    exactly 0.5."""
    _events_v(tmp_path, [(1, "error", 0.199), (2, "click", 0.204)])
    r = _auc(tmp_path)
    assert r["u2"] == "1" and r["auc"] == 0.5


def test_auc_null_type_is_negative_and_dirty_values_drop(tmp_path):
    """A NULL event_type is 'not error' → NEGATIVE class (IS NOT
    DISTINCT FROM — pinned; a bare = would make the row vanish from
    the SQL count). Null / NaN / inf values are unrankable and drop
    the ROW on both engines."""
    _events_v(tmp_path, [
        (1, "error", 5.0), (2, None, 1.0), (3, "click", 2.0),
        (4, "error", None), (5, "view", float("nan")),
        (6, None, float("inf"))])
    r = _auc(tmp_path)
    assert int(r["n_pos"]) == 1 and int(r["n_neg"]) == 2
    assert r["auc"] == 1.0


def test_auc_single_class_is_null_with_counts(tmp_path):
    """No positives (or no negatives) → AUC undefined → SQL-NULL, but
    the class counts still report."""
    _events_v(tmp_path, [(1, "click", 1.0), (2, "view", 2.0)])
    r = _auc(tmp_path)
    assert int(r["n_pos"]) == 0 and int(r["n_neg"]) == 2
    assert r["u2"] == "0" and math.isnan(r["auc"])


def test_auc_empty_answers_zero_row(tmp_path):
    _events_v(tmp_path, [(1, "error", None)])
    r = _auc(tmp_path)
    assert int(r["n_pos"]) == 0 and int(r["n_neg"]) == 0
    assert r["u2"] == "0" and math.isnan(r["auc"])


def test_auc_randomized_matches_oracle(tmp_path):
    """5k rows, 2-decimal scores over a narrow range (dense cent ties
    across many distinct values), all five types plus nulls — the
    block-summary prefix combine must equal the SQL window cumsum
    exactly, u2 pinned as a decimal string."""
    rng = np.random.default_rng(16)
    types = ["error", "click", "view", "signup", None]
    rows = []
    for i in range(5000):
        t = types[int(rng.integers(0, 5))]
        v = float(np.round(rng.uniform(0, 20), 2))
        rows.append((i, t, v))
    _events_v(tmp_path, rows)
    r = _auc(tmp_path)
    assert int(r["n_pos"]) > 0 and int(r["n_neg"]) > 0
    assert not math.isnan(r["auc"])  # oracle equality via _auc


# ---------------------------------------------------------------------------
# rrf_fusion_embeddings


def _embeddings(tmp_path, rows):
    """rows: (vec_id, [floats], label)."""
    _write(tmp_path, "embeddings", pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    }))


def test_rrf_two_list_fusion_hand_geometry(tmp_path):
    """Queries are vec 1=[1,0] and 2=[0,1]. Hand ranks —
    q1: v1,v3 (cos 1.0, id tiebreak), v5 (.8), v4 (.6), v2 (0);
    q2: v2, v4 (.8), v5 (.6), then the 0.0 tie v1, v3 by id.
    rrf: v1=1/61+1/64, v2=1/61+1/65, v3=1/62+1/65, v4=1/62+1/64,
    v5=2/63 — fused order v1, v2, v4, v5, v3: the v4 > v5 compare is
    the AM-HM inequality (1/62+1/64 > 2/63 by ~8e-6), a genuinely
    close double compare both engines must get identically."""
    from jsonschema_ray.pipelines.relational import rrf_fusion_embeddings
    _embeddings(tmp_path, [
        (1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0), (3, [1.0, 0.0], 0),
        (4, [0.6, 0.8], 0), (5, [0.8, 0.6], 0)])
    got = rrf_fusion_embeddings(str(tmp_path))
    exp = _oracle(tmp_path, "rrf_fusion_embeddings")
    _frames_equal(got, exp, ["rank"])
    assert got["vec_id"].tolist() == [1, 2, 4, 5, 3]
    assert got["n_lists"].tolist() == [2, 2, 2, 2, 2]
    assert got["best_rank"].tolist() == [1, 1, 2, 3, 2]
    assert got["rrf"].iloc[0] == float(np.round(1 / 61 + 1 / 64, 6))


def test_rrf_cutoff_and_single_list_terms(tmp_path):
    """k_each=2 (unit-level param): q1's top-2 is {v1, v3}, q2's is
    {v2, v4} — every fused vector carries ONE term, v5 appears in
    neither list and is ABSENT; equal single terms order by vec_id."""
    from jsonschema_ray.pipelines.relational import rrf_fusion_embeddings
    _embeddings(tmp_path, [
        (1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0), (3, [1.0, 0.0], 0),
        (4, [0.6, 0.8], 0), (5, [0.8, 0.6], 0)])
    got = rrf_fusion_embeddings(str(tmp_path), k_each=2)
    assert got["vec_id"].tolist() == [1, 2, 3, 4]  # 1/61,1/61,1/62,1/62
    assert got["n_lists"].tolist() == [1, 1, 1, 1]
    assert 5 not in set(got["vec_id"])


def test_rrf_single_vector_corpus_one_list(tmp_path):
    """One corpus vector: LIMIT 2 finds one query, fusion degrades to
    a single self-hit list on both engines."""
    from jsonschema_ray.pipelines.relational import rrf_fusion_embeddings
    _embeddings(tmp_path, [(7, [1.0, 0.0], 0)])
    got = rrf_fusion_embeddings(str(tmp_path))
    exp = _oracle(tmp_path, "rrf_fusion_embeddings")
    _frames_equal(got, exp, ["rank"])
    assert got["vec_id"].tolist() == [7]
    assert got["rrf"].iloc[0] == float(np.round(1 / 61, 6))


def test_rrf_empty_corpus(tmp_path):
    from jsonschema_ray.pipelines.relational import rrf_fusion_embeddings
    _embeddings(tmp_path, [])
    got = rrf_fusion_embeddings(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["vec_id", "rrf", "n_lists",
                                 "best_rank", "rank"]


# ---------------------------------------------------------------------------
# calibration_value_error_events


def _events_ev(tmp_path, rows):
    """rows: (event_id|None, event_type|None, value|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    }))


def test_calibration_uneven_split_hand_buckets(tmp_path):
    """12 rows into 10 buckets: the FIRST n%k=2 buckets take 2 rows
    (SQL NTILE's rule). Scores .01..=.12 with the two errors at the
    top → only deciles 9 and 10 (positions 10, 11) have positive
    rate, both exactly 1.0; decile 1 means (1+2)/2 = 1.5 cents."""
    from jsonschema_ray.pipelines.relational import (
        calibration_value_error_events)
    rows = [(i, "click", i / 100.0) for i in range(1, 11)]
    rows += [(11, "error", 0.11), (12, "error", 0.12)]
    _events_ev(tmp_path, rows)
    got = calibration_value_error_events(str(tmp_path))
    exp = _oracle(tmp_path, "calibration_value_error_events")
    _frames_equal(got, exp, ["decile"])
    assert got["n"].tolist() == [2, 2, 1, 1, 1, 1, 1, 1, 1, 1]
    assert got["pos_rate"].tolist() == [0.0] * 8 + [1.0, 1.0]
    assert got["mean_cents"].iloc[0] == 1.5


def test_calibration_boundary_tie_and_n_below_k(tmp_path):
    """Two rows share (cents, event_id) but differ in class: the pos
    tiebreak puts the NEGATIVE first on both engines, so with n=2<k
    the NTILE degeneracy answers buckets 1..2 one row each — decile 1
    rate 0.0, decile 2 rate 1.0, deterministically (without the pos
    key the boundary assignment would be engine-dependent)."""
    from jsonschema_ray.pipelines.relational import (
        calibration_value_error_events)
    _events_ev(tmp_path, [(5, "error", 0.50), (5, "click", 0.50)])
    got = calibration_value_error_events(str(tmp_path))
    exp = _oracle(tmp_path, "calibration_value_error_events")
    _frames_equal(got, exp, ["decile"])
    assert got["decile"].tolist() == [1, 2]
    assert got["pos_rate"].tolist() == [0.0, 1.0]
    assert got["mean_cents"].tolist() == [50.0, 50.0]


def test_calibration_null_rows_and_empty(tmp_path):
    """Null event_id rows are EXCLUDED (no total order without the
    key); null event_type is a NEGATIVE; null/NaN values drop."""
    from jsonschema_ray.pipelines.relational import (
        calibration_value_error_events)
    _events_ev(tmp_path, [
        (1, "error", 0.10), (None, "error", 0.99),
        (2, None, 0.20), (3, "click", None),
        (4, "view", float("nan"))])
    got = calibration_value_error_events(str(tmp_path))
    exp = _oracle(tmp_path, "calibration_value_error_events")
    _frames_equal(got, exp, ["decile"])
    assert int(got["n"].sum()) == 2      # rows 1 and 2 only
    assert int(got["n_pos"].sum()) == 1  # the null-type row is negative
    _events_ev(tmp_path, [(None, "error", 0.5)])
    got = calibration_value_error_events(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["decile", "n", "n_pos", "pos_rate",
                                 "mean_cents"]


def test_calibration_randomized_matches_oracle(tmp_path):
    """3k rows over a narrow score range (dense cent ties straddling
    bucket boundaries) — the block-offset NTILE and per-decile
    big-int cents sums must equal the SQL window exactly."""
    from jsonschema_ray.pipelines.relational import (
        calibration_value_error_events)
    rng = np.random.default_rng(61)
    types = ["error", "click", "view", None]
    rows = [(i, types[int(rng.integers(0, 4))],
             float(np.round(rng.uniform(0, 5), 2)))
            for i in range(3000)]
    _events_ev(tmp_path, rows)
    got = calibration_value_error_events(str(tmp_path))
    exp = _oracle(tmp_path, "calibration_value_error_events")
    _frames_equal(got, exp, ["decile"])
    assert int(got["n"].sum()) == 3000


# ---------------------------------------------------------------------------
# bounce_rate_events


def _events_u(tmp_path, rows):
    """rows: (event_id, user_id|None, ts_us|None)."""
    _write(tmp_path, "events", pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array(["e"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
    }))


def _bounce(tmp_path):
    from jsonschema_ray.pipelines.relational import bounce_rate_events
    got = bounce_rate_events(str(tmp_path))
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    exp = _oracle(tmp_path, "bounce_rate_events")
    _frames_equal(got, exp, ["user_id"])
    return got.sort_values("user_id").reset_index(drop=True)


MIN30 = 1_800_000_000  # 30 minutes in µs


def test_bounce_sessions_sizes_hand_case(tmp_path):
    """User 1's stream splits into sessions of sizes [1, 3, 1] →
    3 sessions, 2 bounces, rate 2/3 (6dp). User 2 has one lone event:
    rate exactly 1.0."""
    t0 = 0
    rows = [
        (1, 1, t0),                              # session A (size 1)
        (2, 1, t0 + MIN30 + MIN30),              # session B starts
        (3, 1, t0 + MIN30 + MIN30 + 1000),
        (4, 1, t0 + MIN30 + MIN30 + 2000),
        (5, 1, t0 + 10 * MIN30),                 # session C (size 1)
        (6, 2, t0),
    ]
    _events_u(tmp_path, rows)
    got = _bounce(tmp_path)
    assert got["n_sessions"].tolist() == [3, 1]
    assert got["n_bounce"].tolist() == [2, 1]
    assert got["bounce_rate"].iloc[0] == float(np.round(2 / 3, 6))
    assert got["bounce_rate"].iloc[1] == 1.0


def test_bounce_exact_30min_gap_continues_session(tmp_path):
    """The gap rule is STRICTLY greater: exactly 1800s continues the
    session (one 2-event session, zero bounces); 1800s + 1µs breaks
    it (two 1-event sessions, two bounces)."""
    _events_u(tmp_path, [(1, 1, 0), (2, 1, MIN30)])
    got = _bounce(tmp_path)
    assert got["n_sessions"].iloc[0] == 1 and got["n_bounce"].iloc[0] == 0
    _events_u(tmp_path, [(1, 1, 0), (2, 1, MIN30 + 1)])
    got = _bounce(tmp_path)
    assert got["n_sessions"].iloc[0] == 2 and got["n_bounce"].iloc[0] == 2


def test_bounce_null_user_and_null_ts_excluded(tmp_path):
    """A session needs an owner and an order: null user_id and null
    ts rows are invisible on both engines (and NaT.astype(int64)
    would wrap to -2^63, fabricating a break — the events_sessions
    pin, re-asserted here)."""
    rows = [(1, 1, 0), (2, 1, 1000),
            (3, None, 0), (4, 1, None)]
    _events_u(tmp_path, rows)
    got = _bounce(tmp_path)
    assert got["user_id"].tolist() == [1]
    assert got["n_sessions"].iloc[0] == 1
    assert got["n_bounce"].iloc[0] == 0


# ---------------------------------------------------------------------------
# rfm_segments_customers


def _orders(tmp_path, rows):
    """rows: (o_custkey|None, o_orderdate_us|None, o_totalprice|None)."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(list(range(1, len(rows) + 1)),
                               pa.int64()),
        "o_custkey": pa.array([r[0] for r in rows], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(rows), pa.string()),
        "o_totalprice": pa.array([r[2] for r in rows], pa.float64()),
        "o_orderdate": pa.array([r[1] for r in rows],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1"] * len(rows), pa.string()),
    }))


def test_rfm_hand_segmentation(tmp_path):
    """Five customers, k=5 → every quintile holds exactly one customer
    on each axis. Customer 5 is most recent (r=1), most frequent
    (fq=5) and biggest spender (mq=5); customer 1 the opposite
    (r=5, fq=1, mq=1): frequencies 1..5 via repeated orders, spend
    and recency move together."""
    from jsonschema_ray.pipelines.relational import rfm_segments_customers
    rows = []
    for c in range(1, 6):
        for j in range(c):  # c orders → frequency c
            rows.append((c, (c * 10 + j) * DAY, float(c) * 10.0))
    _orders(tmp_path, rows)
    got = rfm_segments_customers(str(tmp_path))
    exp = _oracle(tmp_path, "rfm_segments_customers")
    _frames_equal(got, exp, ["r", "fq", "mq"])
    assert len(got) == 5 and got["n_customers"].tolist() == [1] * 5
    # most recent customer (c=5, latest last-order day) sits in r=1
    top = got[(got["fq"] == 5) & (got["mq"] == 5)]
    assert top["r"].iloc[0] == 1


def test_rfm_uneven_split_and_ties(tmp_path):
    """Seven customers into 5 quintiles: the first 7%5=2 buckets take
    2 customers (NTILE's rule). All metrics EQUAL → every total order
    falls back to custkey, so assignments are fully deterministic:
    cells are (q,q,q) for q=1..5 with counts [2,2,1,1,1]."""
    from jsonschema_ray.pipelines.relational import rfm_segments_customers
    rows = [(c, 10 * DAY, 25.0) for c in range(1, 8)]
    _orders(tmp_path, rows)
    got = rfm_segments_customers(str(tmp_path))
    exp = _oracle(tmp_path, "rfm_segments_customers")
    _frames_equal(got, exp, ["r", "fq", "mq"])
    assert got["r"].tolist() == [1, 2, 3, 4, 5]
    assert (got["r"] == got["fq"]).all() and (got["r"] == got["mq"]).all()
    assert got["n_customers"].tolist() == [2, 2, 1, 1, 1]


def test_rfm_null_fields_drop_rows(tmp_path):
    """A row missing custkey, orderdate or totalprice is excluded from
    ALL three metrics — customer 2's null-price order doesn't count
    toward frequency either (one row-level filter, pinned)."""
    from jsonschema_ray.pipelines.relational import rfm_segments_customers
    _orders(tmp_path, [
        (1, 1 * DAY, 10.0), (2, 2 * DAY, 20.0), (2, 3 * DAY, None),
        (None, 4 * DAY, 30.0), (1, None, 40.0)])
    got = rfm_segments_customers(str(tmp_path))
    exp = _oracle(tmp_path, "rfm_segments_customers")
    _frames_equal(got, exp, ["r", "fq", "mq"])
    # both customers have exactly one counted order → same fq bucket set
    assert int(got["n_customers"].sum()) == 2
    _orders(tmp_path, [(None, 1 * DAY, 10.0)])
    got = rfm_segments_customers(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["r", "fq", "mq", "n_customers"]


# ---------------------------------------------------------------------------
# session_duration_median_events


def _sdm(tmp_path):
    from jsonschema_ray.pipelines.relational import (
        session_duration_median_events)
    got = session_duration_median_events(str(tmp_path))
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    exp = _oracle(tmp_path, "session_duration_median_events")
    _frames_equal(got, exp, ["user_id"])
    return got.sort_values("user_id").reset_index(drop=True)


def test_session_median_interpolation_and_zero(tmp_path):
    """User 1 has two sessions of durations 10s and 20s → the even
    count interpolates (a+b)/2 = 15s exactly; user 2's lone event is
    a zero-duration session (median exactly 0.0)."""
    S = 1_000_000
    rows = [
        (1, 1, 0), (2, 1, 10 * S),                      # session 10s
        (3, 1, 10 * S + 2 * MIN30),                     # break
        (4, 1, 10 * S + 2 * MIN30 + 20 * S),            # session 20s
        (5, 2, 0),
    ]
    _events_u(tmp_path, rows)
    got = _sdm(tmp_path)
    assert got["med_duration_us"].tolist() == [15.0 * S, 0.0]
    assert got["n_sessions"].tolist() == [2, 1]


def test_session_median_exact_gap_lengthens_session(tmp_path):
    """An exactly-1800s gap CONTINUES the session, so the duration
    spans it (one 1800s session); one extra µs breaks it into two
    zero-duration sessions — the strict-> boundary read through the
    DURATION lens."""
    _events_u(tmp_path, [(1, 1, 0), (2, 1, MIN30)])
    got = _sdm(tmp_path)
    assert got["n_sessions"].iloc[0] == 1
    assert got["med_duration_us"].iloc[0] == float(MIN30)
    _events_u(tmp_path, [(1, 1, 0), (2, 1, MIN30 + 1)])
    got = _sdm(tmp_path)
    assert got["n_sessions"].iloc[0] == 2
    assert got["med_duration_us"].iloc[0] == 0.0


def test_session_median_odd_count_and_null_rows(tmp_path):
    """Three sessions [0s, 4s, 100s] → the odd-count median is the
    middle order statistic 4s (no interpolation); null user/ts rows
    invisible."""
    S = 1_000_000
    rows = [
        (1, 1, 0),                                      # 0s
        (2, 1, 2 * MIN30), (3, 1, 2 * MIN30 + 4 * S),   # 4s
        (4, 1, 6 * MIN30), (5, 1, 6 * MIN30 + 100 * S),  # 100s
        (6, None, 0), (7, 1, None),
    ]
    _events_u(tmp_path, rows)
    got = _sdm(tmp_path)
    assert got["user_id"].tolist() == [1]
    assert got["n_sessions"].iloc[0] == 3
    assert got["med_duration_us"].iloc[0] == 4.0 * S


# ---------------------------------------------------------------------------
# readability_documents


def _read_docs(tmp_path):
    from jsonschema_ray.pipelines.relational import readability_documents
    got = readability_documents(str(tmp_path))
    exp = _oracle(tmp_path, "readability_documents")
    _frames_equal(got, exp, ["doc_id"])
    return got.set_index("doc_id")


def test_readability_hand_counts_and_score(tmp_path):
    """'The cat sat. It ran!' → 5 words, 2 sentences, 5 vowel runs
    (e, a, a, i, a) → flesch = 206.835 − 1.015·2.5 − 84.6·1.0 =
    119.7975 → 1197975 bp exactly."""
    _documents(tmp_path, [(1, "The cat sat. It ran!", "en", "s")])
    by = _read_docs(tmp_path)
    assert int(by.loc[1, "words"]) == 5
    assert int(by.loc[1, "sentences"]) == 2
    assert int(by.loc[1, "syllables"]) == 5
    assert int(by.loc[1, "flesch_bp"]) == int(
        np.floor(10000 * (206.835 - 1.015 * 2.5 - 84.6 * 1.0)))


def test_readability_unpunctuated_doc_is_one_sentence(tmp_path):
    """No [.!?] anywhere → sentence count floors at 1 (an
    unpunctuated doc is one long sentence, not a division by zero);
    a doubled space does NOT create a word (words are non-space
    runs); 'aa' is ONE maximal vowel run while 'bb' has none."""
    _documents(tmp_path, [(1, "aa  bb", "en", "s")])
    by = _read_docs(tmp_path)
    assert int(by.loc[1, "words"]) == 2
    assert int(by.loc[1, "sentences"]) == 1
    assert int(by.loc[1, "syllables"]) == 1


def test_readability_no_vowels_and_negative_floor(tmp_path):
    """A vowel-free doc scores the pure sentence-length terms exactly
    (206.835 − 1.015·2 − 0); a one-word doc with FIVE vowel runs
    ('ababababa') scores 206.835 − 1.015 − 84.6·5 = −217.165 —
    negative, so the basis-point floor must round toward -inf on
    both engines (trunc would differ by one)."""
    _documents(tmp_path, [
        (1, "zzz qqq.", "en", "s"),
        (2, "ababababa", "en", "s")])
    by = _read_docs(tmp_path)
    assert int(by.loc[1, "syllables"]) == 0
    assert int(by.loc[1, "flesch_bp"]) == int(
        np.floor(10000 * (206.835 - 1.015 * 2.0 - 0.0)))
    assert int(by.loc[2, "syllables"]) == 5
    assert int(by.loc[2, "flesch_bp"]) == int(
        np.floor(10000 * (206.835 - 1.015 * 1.0 - 84.6 * 5.0)))
    assert int(by.loc[2, "flesch_bp"]) < 0


def test_readability_empty_and_null_docs_excluded(tmp_path):
    """Null text, the empty string and an all-space doc have no words
    and are EXCLUDED (w >= 1 on both engines)."""
    _documents(tmp_path, [
        (1, None, "en", "s"), (2, "", "en", "s"), (3, "   ", "en", "s"),
        (4, "ok.", "en", "s")])
    by = _read_docs(tmp_path)
    assert list(by.index) == [4]


# ---------------------------------------------------------------------------
# nonascii_ratio_by_lang


def _nonascii(tmp_path):
    from jsonschema_ray.pipelines.relational import nonascii_ratio_by_lang
    got = nonascii_ratio_by_lang(str(tmp_path))
    exp = _oracle(tmp_path, "nonascii_ratio_by_lang")
    _frames_equal(got, exp, ["n_docs"])
    return got


def test_nonascii_codepoint_counting_hand_values(tmp_path):
    """'héllo' is 5 CODEPOINTS, 1 non-ASCII → exactly 0.2; '中文'
    is 2/2 → exactly 1.0; pure ASCII → 0.0. Counting is per
    codepoint, not per byte ('é' is 2 UTF-8 bytes but ONE char —
    a byte-based count would answer 2/6)."""
    _documents(tmp_path, [
        (1, "héllo", "en", "s"), (2, "中文", "zh", "s"),
        (3, "plain", "de", "s")])
    got = _nonascii(tmp_path).set_index("lang")
    assert int(got.loc["en", "chars"]) == 5
    assert int(got.loc["en", "nonascii"]) == 1
    assert got.loc["en", "nonascii_ratio"] == 0.2
    assert got.loc["zh", "nonascii_ratio"] == 1.0
    assert got.loc["de", "nonascii_ratio"] == 0.0


def test_nonascii_empty_texts_null_ratio_and_null_rows(tmp_path):
    """A lang whose only texts are EMPTY answers SQL-NULL ratio (0/0)
    with n_docs intact; null text rows are invisible; a null lang is
    its own group."""
    _documents(tmp_path, [
        (1, "", "fr", "s"), (2, "", "fr", "s"),
        (3, None, "fr", "s"), (4, "añejo", None, "s")])
    got = _nonascii(tmp_path)
    fr = got[got["lang"] == "fr"]
    assert int(fr["n_docs"].iloc[0]) == 2
    assert math.isnan(fr["nonascii_ratio"].iloc[0])
    nul = got[got["lang"].isna()]
    assert nul["nonascii_ratio"].iloc[0] == 0.2


# ---------------------------------------------------------------------------
# normalized_dup_documents


def _norm_dup(tmp_path):
    from jsonschema_ray.pipelines.relational import normalized_dup_documents
    got = normalized_dup_documents(str(tmp_path))
    exp = _oracle(tmp_path, "normalized_dup_documents")
    _frames_equal(got, exp, ["size"])
    return got.set_index("size")["n_clusters"].to_dict()


def test_normalized_dup_casing_and_whitespace_merge(tmp_path):
    """'Hello  World', ' hello world' and 'HELLO WORLD ' all
    normalize to 'hello world' → ONE cluster of 3; raw exact dedup
    (dup_cluster_sizes) sees three singletons — the canonicalization
    gap this query exists to expose."""
    from jsonschema_ray.pipelines.relational import (
        dup_cluster_sizes_documents)
    _documents(tmp_path, [
        (1, "Hello  World", "en", "s"), (2, " hello world", "en", "s"),
        (3, "HELLO WORLD ", "en", "s"), (4, "other", "en", "s")])
    assert _norm_dup(tmp_path) == {1: 1, 3: 1}
    raw = dup_cluster_sizes_documents(str(tmp_path))
    assert raw.set_index("size")["n_clusters"].to_dict() == {1: 4}


def test_normalized_dup_accents_survive_and_empty_string_doc(tmp_path):
    """Normalization lowercases but does NOT strip accents ('Éclair'
    == 'éclair' but != 'eclair'); an all-space doc normalizes to the
    EMPTY string and still clusters (degenerate doc, not null)."""
    _documents(tmp_path, [
        (1, "Éclair", "fr", "s"), (2, "éclair", "fr", "s"),
        (3, "eclair", "fr", "s"), (4, "   ", "fr", "s"),
        (5, "", "fr", "s"), (6, None, "fr", "s")])
    # clusters: {éclair: 2} {eclair: 1} {"": 2}; null invisible
    assert _norm_dup(tmp_path) == {1: 1, 2: 2}


def test_normalized_dup_internal_tabs_not_collapsed(tmp_path):
    """The collapse rule is SPACES ONLY (' +') — a tab is content, so
    'a\\tb' and 'a b' stay distinct clusters (pinning the exact regex
    both engines run)."""
    _documents(tmp_path, [(1, "a\tb", "en", "s"), (2, "a b", "en", "s")])
    assert _norm_dup(tmp_path) == {1: 2}


# ---------------------------------------------------------------------------
# gains_spend_customers


def _gains(tmp_path):
    from jsonschema_ray.pipelines.relational import gains_spend_customers
    got = gains_spend_customers(str(tmp_path))
    exp = _oracle(tmp_path, "gains_spend_customers")
    _frames_equal(got, exp, ["decile"])
    return got.set_index("decile")


def test_gains_concentration_hand_values(tmp_path):
    """Ten customers spending 1..9 dollars and one whale at $910:
    total 4600+91000 = wait — spends are 100..900 and 91000 cents,
    total 95500. Decile 10 (the whale) alone captures 91000/95500;
    decile 1 completes the curve at exactly 1.0."""
    rows = [(c, float(c)) for c in range(1, 10)]   # $1..$9
    rows.append((10, 910.0))                       # the whale
    _orders(tmp_path, [(c, DAY, v) for c, v in rows])
    by = _gains(tmp_path)
    assert len(by) == 10 and (by["n_cust"] == 1).all()
    total = sum(int(x) for x in by["cents"])
    assert total == 100 * (1 + 2 + 3 + 4 + 5 + 6 + 7 + 8 + 9) + 91000
    assert by.loc[10, "cents"] == "91000"
    assert by.loc[10, "cum_share_top"] == float(
        np.round(91000 / total, 6))
    assert by.loc[1, "cum_share_top"] == 1.0


def test_gains_monotone_and_uneven_split(tmp_path):
    """12 customers into 10 deciles (first two take 2): cum_share_top
    is monotone non-increasing in decile read top-down — i.e.
    non-decreasing as decile falls — and decile 1 is exactly 1.0."""
    _orders(tmp_path, [(c, DAY, float(c)) for c in range(1, 13)])
    by = _gains(tmp_path)
    assert by["n_cust"].tolist() == [2, 2, 1, 1, 1, 1, 1, 1, 1, 1]
    shares = by["cum_share_top"].tolist()
    assert shares[0] == 1.0
    assert all(shares[i] >= shares[i + 1] for i in range(9))


def test_gains_null_rows_and_empty(tmp_path):
    """Null custkey / null price rows are invisible (the spend_deciles
    filter); an all-null corpus answers no rows."""
    _orders(tmp_path, [(1, DAY, 5.0), (None, DAY, 7.0),
                       (2, DAY, None), (2, DAY, 3.0)])
    by = _gains(tmp_path)
    assert int(by["n_cust"].sum()) == 2
    assert sum(int(x) for x in by["cents"]) == 800
    _orders(tmp_path, [(None, DAY, 5.0)])
    from jsonschema_ray.pipelines.relational import gains_spend_customers
    got = gains_spend_customers(str(tmp_path))
    assert len(got) == 0
    assert list(got.columns) == ["decile", "n_cust", "cents",
                                 "cum_share_top"]


# ---------------------------------------------------------------------------
# stickiness_daily_events


def _stick(tmp_path):
    from jsonschema_ray.pipelines.relational import stickiness_daily_events
    got = stickiness_daily_events(str(tmp_path))
    exp = _oracle(tmp_path, "stickiness_daily_events")
    _frames_equal(got, exp, ["day"])
    return got.set_index("day")


def test_stickiness_hand_case_and_dedup(tmp_path):
    """Day 0: users {1,2}. Day 1: users {1,3} → user 1 returns →
    stickiness 1/2. User 1 fires THREE events on day 1 but counts as
    ONE active and ONE returning (the distinct set); the first corpus
    day is never returning."""
    rows = [
        (1, 1, 0), (2, 2, 0),
        (3, 1, DAY), (4, 1, DAY + 1000), (5, 1, DAY + 2000),
        (6, 3, DAY)]
    _events_u(tmp_path, rows)
    by = _stick(tmp_path)
    assert by.iloc[0]["active"] == 2 and by.iloc[0]["returning"] == 0
    assert by.iloc[1]["active"] == 2 and by.iloc[1]["returning"] == 1
    assert by.iloc[1]["stickiness"] == 0.5


def test_stickiness_gap_breaks_return(tmp_path):
    """User active on day 0 and day 2 (gap on day 1) is NOT returning
    on day 2 — only strictly consecutive days count; and day 1 has no
    row at all (no active users — observed days only, no grid)."""
    _events_u(tmp_path, [(1, 1, 0), (2, 1, 2 * DAY)])
    by = _stick(tmp_path)
    assert len(by) == 2
    assert by.iloc[1]["returning"] == 0
    assert by.iloc[1]["stickiness"] == 0.0


def test_stickiness_full_return_and_null_rows(tmp_path):
    """Every day-1 user was active on day 0 → stickiness exactly 1.0;
    null user/ts rows invisible."""
    _events_u(tmp_path, [
        (1, 1, 0), (2, 2, 0),
        (3, 1, DAY), (4, 2, DAY),
        (5, None, DAY), (6, 1, None)])
    by = _stick(tmp_path)
    assert by.iloc[1]["active"] == 2
    assert by.iloc[1]["stickiness"] == 1.0
