"""Session-13 operators: TPC-H Q11 shape (grouped sums filtered by a
scalar fraction of their own grand total) — crafted edge branches; the
sf oracles run in test_driver_contract / the driver harness. The
testdata star carries no nulls in these columns, so every NULL branch
here is pin-covered ONLY by these crafted tables."""

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jsonschema_ray.pipelines.relational import (duckdb_round,
                                                 q11_important_parts)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_duckdb_round_property():
    """duckdb_round == DuckDB round(DOUBLE, nd) exactly — uniform
    randoms, every k/1000 half-cent knife edge, the observed q11 sums,
    the fp-multiply tie cases (2.675*100 == 267.5 exactly), signed
    zeros, and the floor(v+0.5) double-rounding trap value."""
    import duckdb
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    vals = list(rng.uniform(-1e6, 1e6, 20000))
    vals += [k / 1000 for k in range(-5000, 5000)]
    vals += [49099.94499999999971, 30629.08499999999913,
             74251.48500000000058, 1.005, 2.675, -2.675,
             0.49999999999999994 * 100, -0.0, 0.0]
    df = pd.DataFrame({"v": np.array(vals, np.float64)})
    con = duckdb.connect()
    for nd in (2, 4):
        mine = duckdb_round(df["v"].to_numpy(), nd)
        theirs = con.execute(
            f"SELECT round(v::DOUBLE, {nd}) FROM df").df() \
            .iloc[:, 0].to_numpy()
        assert (mine == theirs).all()


def _write(tmp_path, name, tb):
    pq.write_table(tb, os.path.join(str(tmp_path), f"{name}.parquet"))


def _q11_star(tmp_path, li_rows, *, nations=None, supp=None):
    """li_rows: (partkey|None, suppkey|None, extprice, disc|None).
    nations: [(nationkey, name)]. supp: [(suppkey, nationkey)]."""
    nations = nations or [(0, "ALPHA"), (1, "BETA")]
    supp = supp or [(1, 0), (2, 0), (9, 1)]
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([n[0] for n in nations], pa.int64()),
        "n_name": pa.array([n[1] for n in nations])}))
    _write(tmp_path, "supplier", pa.table({
        "s_suppkey": pa.array([s[0] for s in supp], pa.int64()),
        "s_nationkey": pa.array([s[1] for s in supp], pa.int64())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([r[0] for r in li_rows], pa.int64()),
        "l_suppkey": pa.array([r[1] for r in li_rows], pa.int64()),
        "l_extendedprice": pa.array([r[2] for r in li_rows],
                                    pa.float64()),
        "l_discount": pa.array([r[3] for r in li_rows],
                               pa.float64())}))
    return str(tmp_path)


def test_q11_null_partkey_qualifies_strict_threshold(tmp_path):
    """A NULL l_partkey forms a real group that can QUALIFY (SQL
    GROUP BY keeps the NULL group; the key gathers float64+NaN, the
    DuckDB pandas canon); a part landing EXACTLY on fraction*total is
    excluded (strict >)."""
    sf = _q11_star(tmp_path, [
        (1, 1, 25.0, 0.0),      # exactly 0.25 * 100 -> excluded
        (2, 1, 15.0, 0.0),      # below threshold
        (None, 2, 60.0, 0.0),   # NULL part dominates -> qualifies
    ])
    out = q11_important_parts(sf, nation="ALPHA", fraction=0.25)
    assert len(out) == 1
    assert out["l_partkey"].dtype == "float64"
    assert math.isnan(out["l_partkey"].iloc[0])
    assert out["value"].iloc[0] == 60.0


def test_q11_all_null_amount_group_excluded(tmp_path):
    """A group whose every amount is NULL (null discount) has
    v = NULL: HAVING NULL > x is UNKNOWN in SQL and NaN > x is False
    in pandas — excluded on both engines; the grand total likewise
    skips the NULL amounts (so the threshold derives from real rows
    only)."""
    sf = _q11_star(tmp_path, [
        (1, 1, 100.0, None),    # v = NULL -> can never qualify
        (2, 1, 10.0, 0.0),      # total = 10, thr = 2.5 -> qualifies
    ])
    out = q11_important_parts(sf, nation="ALPHA", fraction=0.25)
    assert out.to_dict("records") == [{"l_partkey": 2, "value": 10.0}]
    assert out["l_partkey"].dtype == "int64"


def test_q11_null_suppkey_other_nation_invisible_tie_order(tmp_path):
    """A NULL l_suppkey row never matches the supplier semi join
    (exactly like the SQL inner IN); another nation's supplier is
    invisible even with a monster amount; equal-value parts tie-break
    by l_partkey ascending under the value-DESC sort."""
    sf = _q11_star(tmp_path, [
        (1, 1, 10.0, 0.0),
        (2, 1, 10.0, 0.0),
        (1, None, 100.0, 0.0),   # NULL suppkey: excluded everywhere
        (3, 9, 100.0, 0.0),      # BETA supplier: not ALPHA's stream
    ])
    out = q11_important_parts(sf, nation="ALPHA", fraction=0.25)
    assert out.to_dict("records") == [
        {"l_partkey": 1, "value": 10.0},
        {"l_partkey": 2, "value": 10.0}]


def _md5lsh_docs(tmp_path):
    """Crafted documents: exact-dup pair, duplicate doc_id rows, TWO
    null-id rows (one SQL group), null text, blank text, sub-shingle
    doc."""
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 3, None, None, 7, 8, 9],
                           pa.int64()),
        "text": ["the cat sat on the mat", "the cat sat on the mat",
                 "alpha beta gamma delta", "gamma  delta eps zeta",
                 "null id doc one two", "null id more tokens here",
                 None, "   ", "ab"]}),
        os.path.join(str(tmp_path), "documents.parquet"))
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    import ray.data
    return ray.data.read_parquet(
        os.path.join(str(tmp_path), "documents.parquet")), con


def _assert_frames_equal(got, exp, sort_cols):
    import numpy as np
    got = got[list(exp.columns)].sort_values(sort_cols) \
        .reset_index(drop=True)
    exp = exp.sort_values(sort_cols).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in exp.columns:
        gv, ev = got[c].to_numpy(), exp[c].to_numpy()
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            assert np.array_equal(np.nan_to_num(gv.astype(float),
                                                nan=-1.0),
                                  np.nan_to_num(ev.astype(float),
                                                nan=-1.0)), c
        else:
            assert np.array_equal(gv, ev), c


def test_md5_low64_matches_md5_number():
    """md5_low64 == DuckDB ((md5_number % 2^64)+2^64) % 2^64 — the
    whole family's parity root (md5_number is the little-endian
    signed INT128 of the digest)."""
    import duckdb

    from jsonschema_ray.dedup.md5lsh import md5_low64
    con = duckdb.connect()
    K = "18446744073709551616"
    for s in ["hello", "", "a b", "日本語", "the cat sat"]:
        d = con.execute(
            f"SELECT ((md5_number(?) % {K}) + {K}) % {K}",
            [s]).fetchone()[0]
        assert int(d) == md5_low64(s), s


def test_md5lsh_crafted_engine_parity(tmp_path):
    """All three md5lsh ops value-equal DuckDB on the crafted table:
    duplicate doc_id rows merge shingle sets / token multisets, ALL
    null-id rows form ONE merged group (present in signatures and
    simhash, absent from pairs — NULL < x is UNKNOWN), null/blank
    texts invisible, a sub-shingle doc absent from minhash but present
    in simhash (unigram), the exact-dup pair (1,2) survives banding."""
    from jsonschema_ray.dedup.md5lsh import (minhash_band_pairs_md5,
                                             minhash_signatures_md5,
                                             simhash_md5, sql_band_pairs,
                                             sql_signatures, sql_simhash)
    ds, con = _md5lsh_docs(tmp_path)
    _assert_frames_equal(minhash_signatures_md5(ds).to_pandas(),
                         con.execute(sql_signatures()).df(),
                         ["doc_id", "k"])
    pairs = minhash_band_pairs_md5(ds).to_pandas()
    _assert_frames_equal(pairs, con.execute(sql_band_pairs()).df(),
                         ["id_a", "id_b"])
    assert {(1, 2)} <= set(map(tuple, pairs.to_numpy()))
    sim = simhash_md5(ds).to_pandas()
    _assert_frames_equal(sim, con.execute(sql_simhash()).df(),
                         ["doc_id"])
    # unigram simhash sees doc 9 ('ab'); shingled minhash does not
    assert 9 in set(sim["doc_id"].dropna().astype(int))


def test_simhash_pairs_crafted_engine_parity(tmp_path):
    """simhash_band_pairs_md5 equals its SQL oracle on the crafted
    table; the identical-text pair (1,2) is Hamming 0 and survives;
    the merged NULL-id group never pairs."""
    import numpy as np

    from jsonschema_ray.checks.neardup import hamming64
    from jsonschema_ray.dedup.md5lsh import (simhash_band_pairs_md5,
                                             sql_simhash_pairs)
    ds, con = _md5lsh_docs(tmp_path)
    got = simhash_band_pairs_md5(ds).to_pandas()
    _assert_frames_equal(got, con.execute(sql_simhash_pairs()).df(),
                         ["id_a", "id_b"])
    assert (1, 2) in set(map(tuple, got.to_numpy()))
    # the shared popcount (hamming64 vs 0): edge words
    vals = np.array([0, 1, 3, 0xFFFF, 2**63, 2**64 - 1,
                     0x5555555555555555], dtype=np.uint64)
    zeros = np.zeros_like(vals)
    assert hamming64(vals, zeros).tolist() == [0, 1, 2, 16, 1, 64, 32]
    # threshold >= N_BANDS breaks the pigeonhole: guarded, not silent
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_band_pairs_md5(ds, threshold=4)


def test_md5lsh_pair_ops_empty_corpus_typed(tmp_path):
    """An EMPTY documents table answers a Dataset whose SCHEMA is the
    typed (id_a, id_b) pair contract from both pair ops (the all-empty
    map_groups pipeline drops schema — pinned via the
    union-typed-empty-block trick); iter_batches yields typed Arrow.
    (to_pandas() of ANY empty Dataset is column-less — Ray-global.)"""
    import ray.data

    from jsonschema_ray.dedup.md5lsh import (minhash_band_pairs_md5,
                                             simhash_band_pairs_md5)
    pq.write_table(pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())}),
                   os.path.join(str(tmp_path), "documents.parquet"))
    ds = ray.data.read_parquet(
        os.path.join(str(tmp_path), "documents.parquet"))
    for op in (minhash_band_pairs_md5, simhash_band_pairs_md5):
        out = op(ds)
        s = out.schema()
        assert s.names == ["id_a", "id_b"]
        assert [str(t) for t in s.types] == ["int64", "int64"]
        bts = list(out.iter_batches(batch_format="pyarrow"))
        assert sum(b.num_rows for b in bts) == 0


def test_quantize_crafted_engine_parity(tmp_path):
    """scalar_quantize_summary value-equals its SQL oracle on the
    adversarial table: duplicate vec_ids merge (SQL GROUP BY), a NULL
    id is a real group, a NULL list row and an all-excluded row are
    ABSENT, a NULL element and a NaN element are excluded from stats
    AND sums, a degenerate dimension codes 0, ragged lengths
    contribute only the dims they have."""
    import duckdb
    import ray.data

    from jsonschema_ray.ann.quantize import (scalar_quantize_summary,
                                             sql_scalar_quantize)
    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 2, None, 5, 6, 7, 8, 9],
                           pa.int64()),
        "embedding": pa.array([
            [1.0, 5.0, 7.0], [2.0, 5.0, -1.0], [3.0, 5.0, 0.5],
            [0.0, 5.0, 1.0], None, [None, 5.0, float("nan")],
            [4.0], [float("inf"), 5.0], [float("-inf")]],
            type=pa.list_(pa.float32()))}),
        os.path.join(str(tmp_path), "embeddings.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{tmp_path}/embeddings.parquet')")
    ds = ray.data.read_parquet(
        os.path.join(str(tmp_path), "embeddings.parquet"))
    got = scalar_quantize_summary(ds).to_pandas()
    exp = con.execute(sql_scalar_quantize()).df()
    _assert_frames_equal(got, exp, ["vec_id"])
    rec = {(-1 if pd.isna(r.vec_id) else int(r.vec_id)):
           (r.code_sum, r.n_dims) for r in got.itertuples()}
    assert 5 not in rec                   # NULL list absent
    assert rec[6] == (0, 1)               # degenerate dim codes 0
    assert rec[7] == (255, 1)             # ragged max-of-dim0
    assert rec[2][1] == 6                 # dup ids merged
    assert rec[8][1] == 1                 # inf element excluded
    assert 9 not in rec                   # all-inf vector absent


def test_interleave_crafted_engine_parity(tmp_path):
    """interleave_by_source_documents equals its SQL oracle on skewed
    sources (10:3:1), a NULL-source lane, a NULL doc_id (sorted LAST
    within its source), and duplicate doc_ids (output multiset
    identical however the twins split the two ranks); every source's
    slots are strictly increasing within [0, total)."""
    import duckdb

    import __ray_entry__ as E
    ids = list(range(10)) + [20, 20, None] + [30]
    src = ["big"] * 10 + ["mid"] * 3 + [None]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["x"] * len(ids)),
        "lang": pa.array(["en"] * len(ids)),
        "source": pa.array(src),
        "n_chars": pa.array([1] * len(ids), pa.int64())}),
        os.path.join(str(tmp_path), "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    from jsonschema_ray.pipelines.relational import \
        interleave_by_source_documents
    got = interleave_by_source_documents(str(tmp_path)).to_pandas()
    exp = con.execute(
        E.oracle_sql()["interleave_by_source_documents"]).df()
    _assert_frames_equal(got, exp, ["source", "slot", "doc_id"])
    total = len(ids)
    for _, g in got.groupby("source", dropna=False):
        s = g["slot"].to_numpy()
        s.sort()
        assert (np.diff(s) > 0).all() or len(s) == 1
        assert s.min() >= 0 and s.max() < total


def test_interleave_slot_lift_parity():
    """The object-dtype (Python-int) slot expression the schedule
    switches to past ~2^31 rows equals exact bigint math AND equals
    the int64 branch wherever int64 doesn't wrap — so the branch
    boundary is unobservable in outputs."""
    rn = np.arange(1, 2001, dtype=np.int64)
    cnt = np.full(2000, 2000, dtype=np.int64)
    for total in (2000, 3_100_000_000, 2**62):
        lifted = ((2 * rn.astype(object) - 1) * total
                  // (2 * cnt.astype(object))).astype(np.int64)
        exact = np.array([((2 * int(r) - 1) * total) // (2 * 2000)
                          for r in rn], dtype=np.int64)
        assert np.array_equal(lifted, exact)
        if 2 * total * total < 2**63:
            i64 = ((2 * rn - 1) * total) // (2 * cnt)
            assert np.array_equal(i64, exact)


def test_md5lsh_randomized_engine_net(tmp_path):
    """Randomized two-engine net: 120 docs of random small-alphabet
    token strings (seeded — lengths 0..12 so sub-shingle docs,
    boundary double-spaces, duplicate ids and NULLs all occur by
    construction), every md5lsh op value-equal to DuckDB. Catches
    arithmetic-contract drift the crafted pins can't enumerate."""
    from jsonschema_ray.dedup.md5lsh import (minhash_band_pairs_md5,
                                             minhash_signatures_md5,
                                             simhash_band_pairs_md5,
                                             simhash_md5, sql_band_pairs,
                                             sql_signatures, sql_simhash,
                                             sql_simhash_pairs)
    rng = np.random.default_rng(20260819)
    vocab = ["aa", "bb", "cc", "dd", "ee", "zz", "日本", ""]
    ids, texts = [], []
    for i in range(120):
        ids.append(None if rng.random() < 0.05
                   else int(rng.integers(0, 60)))
        if rng.random() < 0.05:
            texts.append(None)
        else:
            n = int(rng.integers(0, 13))
            texts.append(" ".join(
                vocab[int(k)] for k in rng.integers(0, len(vocab), n)))
    import duckdb

    import ray.data
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts)}),
                   os.path.join(str(tmp_path), "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    ds = ray.data.read_parquet(
        os.path.join(str(tmp_path), "documents.parquet"))
    for op, sql, sort in [
            (minhash_signatures_md5, sql_signatures(), ["doc_id", "k"]),
            (minhash_band_pairs_md5, sql_band_pairs(),
             ["id_a", "id_b"]),
            (simhash_md5, sql_simhash(), ["doc_id"]),
            (simhash_band_pairs_md5, sql_simhash_pairs(),
             ["id_a", "id_b"])]:
        _assert_frames_equal(op(ds).to_pandas(), con.execute(sql).df(),
                             sort)


def test_snapshot_diff_crafted_semantics(tmp_path):
    """joins.snapshot_diff three-valued semantics: NULL→value and
    value→NULL are CHANGED (IS DISTINCT FROM), NULL→NULL is unchanged
    (absent), equal values absent, one-side keys are added/removed
    even when their value is NULL (presence = marker, not value
    nullness), NULL keys never join (one added + one removed),
    duplicate keys cross-match like SQL."""
    import ray.data as rd

    from jsonschema_ray.joins import snapshot_diff
    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    old = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, None, 8, 8], pa.int64()),
        "v": ["same", None, "was", None, "gone", "nullkey-old",
              "dupA", "dupB"]}))
    new = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 6, None, 8], pa.int64()),
        "v": ["same", None, "now", None, "nullkey-new", "dupA"]}))
    out = snapshot_diff(old, new, on="k", value_cols=["v"],
                        left_schema=schema, right_schema=schema) \
        .to_pandas()
    recs = sorted(
        ((-1 if pd.isna(r.k) else int(r.k)), r.change)
        for r in out.itertuples())
    # k=1 equal → absent; k=2 NULL==NULL → absent; k=3 changed;
    # k=4 removed (present with NULL value); k=5 removed; k=6 added
    # (NULL value); NULL keys: one removed + one added; k=8 dup rows:
    # old dupA matches, old dupB differs → one changed row
    assert recs == [(-1, "added"), (-1, "removed"), (3, "changed"),
                    (4, "removed"), (5, "removed"), (6, "added"),
                    (8, "changed")]


def test_autocorr_crafted_semantics(tmp_path):
    """autocorr_daily_events vs its SQL oracle on a crafted calendar:
    an alternating 5/1 series answers r = -1-ish (negative
    autocorrelation), a CONSTANT series answers SQL-NULL (zero
    variance), a type with a mid-calendar gap pairs against the
    zero-filled day (dense-grid semantics — dropping the gap would
    change r), a type observed on ONE day still answers over the
    GLOBAL grid (zeros elsewhere), null ts/type rows invisible."""
    import datetime as dt

    import duckdb

    import __ray_entry__ as E
    rows = []
    eid = 0

    def add(t, day, k):
        nonlocal eid
        for _ in range(k):
            rows.append((eid, dt.datetime(2024, 1, day, 12), t))
            eid += 1

    for d, k in [(1, 5), (2, 1), (3, 5), (4, 1), (5, 5)]:
        add("alt", d, k)          # alternating 5,1,5,1,5
    for d in range(1, 6):
        add("flat", d, 2)         # constant 2/day -> NULL
    add("gappy", 1, 3)
    add("gappy", 5, 3)            # days 2-4 are ZEROS on the grid
    add("oneday", 3, 7)           # zeros on 4 of 5 grid days
    rows.append((eid, None, "alt"))          # null ts invisible
    rows.append((eid + 1, dt.datetime(2024, 1, 2, 1), None))  # null type
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows))}),
        os.path.join(str(tmp_path), "events.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    from jsonschema_ray.pipelines.relational import autocorr_daily_events
    got = autocorr_daily_events(str(tmp_path)) \
        .sort_values("event_type").reset_index(drop=True)
    exp = con.execute(E.oracle_sql()["autocorr_daily_events"]).df() \
        .sort_values("event_type").reset_index(drop=True)
    _assert_frames_equal(got, exp, ["event_type"])
    rec = dict(zip(got["event_type"], got["r"]))
    assert rec["alt"] == -1.0
    assert math.isnan(rec["flat"])
    assert not math.isnan(rec["gappy"])
    assert (got["n_pairs"] == 4).all()


def test_scd2_crafted_semantics(tmp_path):
    """scd2_intervals_events vs its SQL oracle on a crafted timeline:
    runs compress (A A A B → 2 intervals), a NULL-type event BRIDGES
    a run (A, NULL, A stays one run — lag over the filtered view),
    the last run is open (valid_to NULL), a same-ts tie with a type
    change yields a zero-length interval ordered by event_id, null
    user/ts rows invisible."""
    import datetime as dt

    import duckdb

    import __ray_entry__ as E
    T = lambda m: dt.datetime(2024, 3, 1, 10, m)
    rows = [  # (event_id, user, ts, type)
        (1, 1, T(0), "A"), (2, 1, T(1), "A"), (3, 1, T(2), "A"),
        (4, 1, T(3), None),            # bridges the A-run
        (5, 1, T(4), "A"), (6, 1, T(5), "B"),
        (7, 2, T(0), "X"),             # single-event user: open
        (8, 3, T(1), "P"), (9, 3, T(1), "Q"),  # same-ts tie: zero-len
        (10, None, T(2), "A"), (11, 4, None, "A")]  # invisible
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows))}),
        os.path.join(str(tmp_path), "events.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    from jsonschema_ray.pipelines.relational import scd2_intervals_events
    sc = ["user_id", "valid_from", "event_type"]
    got = scd2_intervals_events(str(tmp_path)).to_pandas() \
        .sort_values(sc).reset_index(drop=True)
    exp = con.execute(E.oracle_sql()["scd2_intervals_events"]).df() \
        [got.columns.tolist()].sort_values(sc).reset_index(drop=True)
    assert len(got) == len(exp) == 5
    for c in got.columns:
        g, e = got[c], exp[c]
        if c.startswith("valid"):
            g = g.astype("datetime64[us]").fillna(pd.Timestamp(0))
            e = e.astype("datetime64[us]").fillna(pd.Timestamp(0))
        assert (g == e).all(), c
    u1 = got[got["user_id"] == 1]
    assert list(u1["event_type"]) == ["A", "B"]       # bridged run
    assert pd.isna(got[got["user_id"] == 2]["valid_to"]).all()
    u3 = got[got["user_id"] == 3]
    assert (u3["valid_from"] == T(1)).all()           # zero-length
    assert list(u3["event_type"]) == ["P", "Q"]


def test_pmi_crafted_exact_value(tmp_path):
    """pmi_bigrams on a hand-computable corpus: one doc repeating
    'x y' 6 times (plus filler) — c_xy=6 ... engine-equal to the SQL
    oracle AND to the hand formula; pairs under min_n absent; the
    empty corpus answers the typed empty frame."""
    import duckdb

    import ray.data

    import __ray_entry__ as E
    from jsonschema_ray.text.transform import pmi_bigrams
    text = " ".join(["x y"] * 6) + " " + " ".join(["f"] * 8)
    pq.write_table(pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([text]), "lang": pa.array(["en"]),
        "source": pa.array(["s"]),
        "n_chars": pa.array([len(text)], pa.int64())}),
        os.path.join(str(tmp_path), "documents.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    got = pmi_bigrams(ray.data.read_parquet(
        os.path.join(str(tmp_path), "documents.parquet")))
    exp = con.execute(E.oracle_sql()["pmi_bigrams_documents"]).df()
    assert len(got) == len(exp)
    assert (got["pmi"].to_numpy() == exp["pmi"].to_numpy()).all()
    assert list(got["w1"]) == list(exp["w1"])
    # hand check: tokens = 6x + 6y + 8f = 20; bigrams: xy 6, yx 5,
    # yf 1, ff 7 -> n>=5 keeps xy, yx, ff; N_bi = 19
    rec = {(r.w1, r.w2): (r.n, r.pmi) for r in got.itertuples()}
    assert set(rec) == {("x", "y"), ("y", "x"), ("f", "f")}
    import math as m
    want = round(m.log2((6 / 19) / ((6 / 20) * (6 / 20))), 6)
    assert rec[("x", "y")][1] == want
    # duplicate/NULL doc_ids must NOT cross-pair: pairing is a
    # physical-ROW property (the oracle pins it with an
    # arbitrary-but-distinct row_number rid — the ttr/md5lsh class)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 1, None, None], pa.int64()),
        "text": pa.array(["a b a b a b a b a b",
                          "c d c d c d c d c d",
                          "e f e f e f e f e f",
                          "g h g h g h g h g h"]),
        "lang": pa.array(["en"] * 4), "source": pa.array(["s"] * 4),
        "n_chars": pa.array([19] * 4, pa.int64())}),
        os.path.join(str(tmp_path), "documents.parquet"))
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM "
                 f"read_parquet('{tmp_path}/documents.parquet')")
    got2 = pmi_bigrams(ray.data.read_parquet(
        os.path.join(str(tmp_path), "documents.parquet")))
    exp2 = con2.execute(E.oracle_sql()["pmi_bigrams_documents"]).df()
    assert (got2["pmi"].to_numpy() == exp2["pmi"].to_numpy()).all()
    pairs = set(zip(got2["w1"], got2["w2"]))
    # no cross-row fabrications like (b, c) or (f, g)
    assert ("b", "c") not in pairs and ("f", "g") not in pairs

    # empty corpus -> typed empty frame
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64())}),
        os.path.join(str(tmp_path), "documents.parquet"))
    out = pmi_bigrams(ray.data.read_parquet(
        os.path.join(str(tmp_path), "documents.parquet")))
    assert len(out) == 0
    assert list(out.columns) == ["w1", "w2", "n", "pmi"]


def test_q11_missing_nation_and_no_suppliers_typed_empty(tmp_path):
    sf = _q11_star(tmp_path, [(1, 1, 10.0, 0.0)],
                   nations=[(0, "ALPHA"), (3, "EMPTYLAND")])
    for nat in ("GAMMA", "EMPTYLAND"):
        out = q11_important_parts(sf, nation=nat)
        assert len(out) == 0
        assert list(out.columns) == ["l_partkey", "value"]
        assert out["l_partkey"].dtype == "int64"
        assert out["value"].dtype == "float64"
