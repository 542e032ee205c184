"""Edge-condition hardening from the round-3 dedup/ann/checks review:
null keys, duplicated ids, empty inputs, string id schemas, tie
determinism, and destructive-path guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table):
    import ray.data as rd
    return rd.from_arrow(table)


# ---------------------------------------------------------------------------
# neardup: null phash / null id rows must not become mutual duplicates


def test_phash_neardup_null_rows_excluded(ray_session):
    from jsonschema_ray.checks.neardup import phash_near_duplicates
    n = 40
    rng = np.random.default_rng(3)
    ph = rng.integers(0, 2**63, size=n, dtype=np.int64)
    ph_list = ph.tolist()
    # 6 null phashes + 1 null id: none of these may pair with anything
    validity = [i % 7 != 3 for i in range(n)]
    phash = pa.array([p if v else None
                      for p, v in zip(ph_list, validity)], type=pa.int64())
    ids = pa.array([None if i == 5 else i for i in range(n)],
                   type=pa.int64())
    # plant one true near-dup pair among fully-valid rows (11%7, 22%7 != 3)
    ph_list[11] = ph_list[22] = 12345
    phash = pa.array([p if v else None
                      for p, v in zip(ph_list, validity)], type=pa.int64())
    t = pa.table({"image_id": ids, "phash": phash})
    out = phash_near_duplicates(_ds(t), max_distance=2).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (11, 22) in pairs
    null_ids = {i for i in range(n) if i % 7 == 3} | {5}
    for a, b in pairs:
        assert a not in null_ids and b not in null_ids


# ---------------------------------------------------------------------------
# exact_dedup: duplicated ids — no data loss, full-row dups deduped


def _dedup_frame(out):
    return out.to_pandas().sort_values(["doc_id", "text"]) \
        .reset_index(drop=True)


def test_exact_dedup_loser_id_naming_other_text(ray_session):
    from jsonschema_ray.dedup import exact_dedup
    # id 1 loses for text 'a' (winner id 0) but ALSO names text 'b':
    # that row must survive
    t = pa.table({"doc_id": pa.array([1, 0, 1], type=pa.int64()),
                  "text": ["a", "a", "b"]})
    out = _dedup_frame(exact_dedup(_ds(t)))
    assert list(zip(out["doc_id"], out["text"])) == [(0, "a"), (1, "b")]


def test_exact_dedup_identical_full_rows(ray_session):
    from jsonschema_ray.dedup import exact_dedup
    t = pa.table({"doc_id": pa.array([1, 1, 2, 1, 1], type=pa.int64()),
                  "text": ["a", "a", "c", "a", "b"]})
    out = _dedup_frame(exact_dedup(_ds(t)))
    # one 'a' (id 1), the 'b' (id 1), the 'c' (id 2)
    assert list(zip(out["doc_id"], out["text"])) == \
        [(1, "a"), (1, "b"), (2, "c")]


def test_exact_dedup_dup_ids_fallback_matches(ray_session):
    from jsonschema_ray.dedup import exact_dedup
    rng = np.random.default_rng(7)
    ids = rng.integers(0, 20, size=120).astype(np.int64)
    texts = [f"t{v}" for v in rng.integers(0, 25, size=120)]
    t = pa.table({"doc_id": pa.array(ids), "text": texts})
    a = _dedup_frame(exact_dedup(_ds(t)))
    b = _dedup_frame(exact_dedup(_ds(t), broadcast_ids_cap=0))
    # both paths: one row per distinct text, min id
    exp = pd.DataFrame({"doc_id": ids, "text": texts}) \
        .groupby("text", as_index=False)["doc_id"].min() \
        .sort_values(["doc_id", "text"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["doc_id", "text"]], exp[["doc_id", "text"]], check_dtype=False)
    pd.testing.assert_frame_equal(
        b[["doc_id", "text"]], exp[["doc_id", "text"]], check_dtype=False)


def test_exact_dedup_string_ids_with_dups(ray_session):
    from jsonschema_ray.dedup import exact_dedup
    t = pa.table({"doc_id": ["x", "w", "x", "x"],
                  "text": ["a", "a", "b", "b"]})
    out = exact_dedup(_ds(t), id_col="doc_id").to_pandas() \
        .sort_values(["doc_id", "text"]).reset_index(drop=True)
    assert list(zip(out["doc_id"], out["text"])) == [("w", "a"), ("x", "b")]


# ---------------------------------------------------------------------------
# ngram jaccard: empty-vs-empty convention matches jaccard_shingles


def test_ngram_jaccard_empty_docs_pair_at_one(ray_session):
    from jsonschema_ray.dedup import jaccard_shingles, ngram_jaccard_pairs
    assert jaccard_shingles("", "", k=5) == 1.0
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "text": ["", "", "some real document text here"]})
    out = ngram_jaccard_pairs(_ds(t), threshold=0.5).to_pandas()
    pairs = {(a, b): j for a, b, j in
             zip(out["id_a"], out["id_b"], out["jaccard"])}
    assert pairs == {(0, 1): 1.0}


# ---------------------------------------------------------------------------
# ANN: string ids / empty corpora / deterministic ties / build guard


def test_ivf_topk_string_ids_sparse_probes(ray_session):
    from jsonschema_ray.ann import ivf_topk
    rng = np.random.default_rng(5)
    n, dim = 300, 16
    V = rng.standard_normal((n, dim))
    ids = [f"v{i:04d}" for i in range(n)]
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(V.astype(np.float32)))})
    # small batches force batches whose cells no query probes → empty
    # blocks must carry the STRING id schema, not int64
    out = ivf_topk(_ds(t), [V[0]], query_ids=["q0"], k=5, ncells=32,
                   nprobe=2, batch_size=16)
    assert len(out) == 5
    assert out["vec_id"].iloc[0] == "v0000"
    assert out["query_id"].iloc[0] == "q0"


def test_brute_force_topk_empty_corpus(ray_session):
    from jsonschema_ray.ann import brute_force_topk
    t = pa.table({"vec_id": pa.array([], type=pa.int64()),
                  "embedding": pa.array([], type=pa.list_(pa.float32()))})
    out = brute_force_topk(_ds(t), [np.ones(8)], k=3)
    assert len(out) == 0
    assert set(out.columns) == {"query_id", "vec_id", "score", "rank"}


def test_ivf_tie_break_batch_invariant(ray_session):
    from jsonschema_ray.ann import ivf_topk
    rng = np.random.default_rng(11)
    dim = 8
    base = rng.standard_normal((40, dim))
    V = np.concatenate([base, base])              # every vector duplicated
    ids = np.arange(len(V), dtype=np.int64)
    rng.shuffle(ids)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(V.astype(np.float64)))})
    q = [base[0]]
    kw = dict(ncells=4, nprobe=4, k=6, train_sample=80)
    a = ivf_topk(_ds(t), q, **kw, batch_size=7)
    b = ivf_topk(_ds(t), q, **kw, batch_size=64)
    pd.testing.assert_frame_equal(a.round(9), b.round(9))


def test_ivf_build_refuses_foreign_dir(ray_session, tmp_path):
    from jsonschema_ray.ann import IvfIndex
    rng = np.random.default_rng(2)
    t = pa.table({"vec_id": pa.array(np.arange(50, dtype=np.int64)),
                  "embedding": pa.array(
                      list(rng.standard_normal((50, 8)).astype(np.float32)))})
    target = tmp_path / "precious_data"
    target.mkdir()
    (target / "important.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing to delete"):
        IvfIndex.build(_ds(t), str(target), ncells=4)
    assert (target / "important.txt").read_text() == "do not delete"
    # a genuine stale index IS wiped and rebuilt
    idx_dir = tmp_path / "idx"
    idx = IvfIndex.build(_ds(t), str(idx_dir), ncells=4)
    stale = set((idx_dir).iterdir())
    idx2 = IvfIndex.build(_ds(t), str(idx_dir), ncells=4)
    out = idx2.topk([rng.standard_normal(8)], k=3, nprobe=4)
    assert len(out) == 3
    assert stale  # the first build really wrote files


# ---------------------------------------------------------------------------
# referential: empty reference universe


def test_referential_empty_reference(ray_session):
    from jsonschema_ray.checks.referential import broadcast_semi_join
    facts = pa.table({"fk": pa.array([1, 2, None], type=pa.int64())})
    empty_ref = pa.table({"pk": pa.array([], type=pa.int64())})
    orphans = broadcast_semi_join(_ds(facts), "fk", _ds(empty_ref),
                                  ref_key="pk", anti=True).to_pandas()
    assert sorted(orphans["fk"]) == [1, 2]       # null keys never report
    matches = broadcast_semi_join(_ds(facts), "fk", _ds(empty_ref),
                                  ref_key="pk").to_pandas()
    assert len(matches) == 0


# ---------------------------------------------------------------------------
# embedding near-dup: width derived from the data


def test_embedding_neardup_any_width(ray_session):
    from jsonschema_ray.dedup import embedding_near_duplicates
    rng = np.random.default_rng(5)
    n, dim = 200, 24                              # NOT the old default 64
    V = rng.standard_normal((n, dim)).astype(np.float32)
    for i in range(5):
        V[i + 100] = V[i] + rng.standard_normal(dim).astype(np.float32) * .01
    t = pa.table({"vec_id": pa.array(np.arange(n, dtype=np.int64)),
                  "embedding": pa.array(list(V))})
    pairs = embedding_near_duplicates(_ds(t), threshold=0.98).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert {(i, i + 100) for i in range(5)} <= found


# ---------------------------------------------------------------------------
# second review wave: joins / stats / text / drift / uniqueness / multimodal


def test_range_agg_join_null_sum_values(ray_session):
    from jsonschema_ray.joins import range_agg_join
    left = pa.table({"k": ["a"], "t": pa.array([2.5], type=pa.float64())})
    right = pa.table({"k": ["a", "a", "a"],
                      "t": pa.array([1.0, 2.0, 3.0], type=pa.float64()),
                      "v": pa.array([1.0, None, 4.0], type=pa.float64())})
    out = range_agg_join(_ds(left), _ds(right), by="k", on="t",
                         lower=-100, upper=0, sum_cols=["v"]).to_pandas()
    # bound lands exactly on the null-valued t=2 row: sum must be 1.0
    # (nulls count as 0 in SUM), not a NaN-wiped 0.0
    assert out["n_in_range"].iloc[0] == 2
    assert out["sum_v"].iloc[0] == 1.0


def test_asof_join_mixed_on_types(ray_session):
    from jsonschema_ray.joins import asof_join
    left = pa.table({"k": ["a", "a"],
                     "t": pa.array([10, 20], type=pa.int64())})
    right = pa.table({"k": ["a", "a"],
                      "ts": pa.array([9.5, 19.5], type=pa.float64()),
                      "val": pa.array([1, 2], type=pa.int64())})
    out = asof_join(_ds(left), _ds(right), by="k", on="t", right_on="ts",
                    value_cols=["val"]).to_pandas().sort_values("t")
    assert out["val"].tolist() == [1, 2]


def test_asof_join_pandas_block_inputs(ray_session):
    import ray.data as rd

    from jsonschema_ray.joins import asof_join
    left = rd.from_pandas(pd.DataFrame(
        {"k": ["a", "a"], "t": np.array([5, 15], dtype=np.int64)}))
    right = rd.from_pandas(pd.DataFrame(
        {"k": ["a"], "t": np.array([4], dtype=np.int64),
         "val": np.array([7.0])}))
    out = asof_join(left, right, by="k", on="t",
                    value_cols=["val"]).to_pandas().sort_values("t")
    assert out["val"].tolist() == [7.0, 7.0]


def test_column_stats_date32_and_nan_mean(ray_session):
    import datetime

    from jsonschema_ray.stages import column_stats
    t = pa.table({
        "d": pa.array([datetime.date(2020, 1, 1), datetime.date(2021, 1, 1),
                       None], type=pa.date32()),
        "x": pa.array([1.0, np.nan, 3.0], type=pa.float64()),
        "i": pa.array([2**53 + 1, 2**53 + 3, None], type=pa.int64()),
    })
    out = column_stats(_ds(t)).to_pandas().set_index("column")
    assert out.loc["d", "null_count"] == 1          # date32 no longer crashes
    assert out.loc["d", "min_int"] == (datetime.date(2020, 1, 1)
                                       - datetime.date(1970, 1, 1)).days
    # mean over the two FINITE values, not the three non-null ones
    assert out.loc["x", "mean_num"] == 2.0
    # int64 min/max exact beyond 2^53 (float64 path rounds both to 2^53)
    assert out.loc["i", "min_int"] == 2**53 + 1
    assert out.loc["i", "max_int"] == 2**53 + 3


def test_quality_features_null_text():
    from jsonschema_ray.text.analysis import TextFeaturesStage
    b = pa.table({"text": pa.array(["hello world", None, ""])})
    out = TextFeaturesStage(langid=False, simhash=False)(b)
    nch = out.column("n_chars").to_pylist()
    assert nch == [11, None, 0]                      # never INT64_MIN garbage
    assert out.column("alpha_ratio").to_pylist()[1] is None


def test_chi2_large_marginals_no_overflow():
    from jsonschema_ray.checks.drift import chi2_contingency
    from unittest import mock
    obs = pd.DataFrame({0: [4_000_000_000, 3_000_000_000],
                        1: [3_000_000_000, 4_000_000_000]})
    with mock.patch("jsonschema_ray.checks.drift._grouped_counts_pivot",
                    return_value=obs):
        chi2, dof = chi2_contingency(None, "c", lambda b: None)
    assert dof == 1 and chi2 > 0                     # not negative garbage


def test_duplicate_keys_null_keys_reported(ray_session):
    from jsonschema_ray.checks.uniqueness import duplicate_keys
    t = pa.table({"k": pa.array([None, None, 1, 1, 2], type=pa.int64())})
    out = duplicate_keys(_ds(t), "k").to_pandas()
    counts = {(None if pd.isna(k) else int(k)): int(c)
              for k, c in zip(out["k"], out["dup_count"])}
    assert counts == {None: 2, 1: 2}


def test_sample_video_frames_schema_stable(ray_session):
    from jsonschema_ray.stages.multimodal import sample_video_frames
    t = pa.table({"video_id": pa.array(["v1", "v2"], type=pa.large_string()),
                  "bytes": pa.array([b"abc", b"def"], type=pa.large_binary())})
    out = sample_video_frames(_ds(t), max_frames=2, batch_size=1)
    assert len(out.to_pandas()) == 4
    assert str(out.schema().base_schema.field("video_id").type) == \
        "large_string"


# ---------------------------------------------------------------------------
# third review wave: hashing / codecs / checkpoint / quantiles / pct-rank


def test_hash64_int_column_batch_invariant():
    from jsonschema_ray.sketches.hashing import hash64_array
    with_null = pa.array([1, 2, None, 2**53 + 7], type=pa.int64())
    without = pa.array([1, 2, 2**53 + 7], type=pa.int64())
    hw = hash64_array(with_null)
    ho = hash64_array(without)
    # same VALUE hashes identically whether or not its batch has a null
    assert hw[0] == ho[0] and hw[1] == ho[1] and hw[3] == ho[2]
    # distinct large ints don't collide through a float detour
    big = pa.array([2**53 + 1, 2**53 + 2, None], type=pa.int64())
    hb = hash64_array(big)
    assert hb[0] != hb[1]
    # the null sentinel must NOT collide with the quiet-NaN bit pattern
    # as an int64 value (a plausible value in float-reinterpreted data) —
    # its unavoidable pigeonhole preimage is pseudorandom instead
    hq = hash64_array(pa.array([0x7FF8000000000000, None],
                               type=pa.int64()))
    assert hq[0] != hq[1]
    assert hw[2] == hb[2] == hq[1]          # sentinel stable across batches


def test_codec_malformed_dims_raise_decode_error():
    from jsonschema_ray.codecs.images import ImageDecodeError, decode_image
    import struct
    # BMP with negative width
    header = struct.pack("<2sIHHI", b"BM", 54 + 16, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, -3, 5, 1, 24, 0, 16,
                       2835, 2835, 0, 0)
    with pytest.raises(ImageDecodeError):
        decode_image(header + info + b"\x00" * 16)
    # PPM with negative height and non-numeric field
    with pytest.raises(ImageDecodeError):
        decode_image(b"P6\n3 -5\n255\n" + b"\x00" * 64)
    with pytest.raises(ImageDecodeError):
        decode_image(b"P6\nx3 5\n255\n" + b"\x00" * 64)
    # absurd dimensions rejected before allocation
    with pytest.raises(ImageDecodeError):
        decode_image(b"P6\n100000 100000\n255\nxx")


def test_average_hash_tiny_image():
    from jsonschema_ray.codecs.images import average_hash
    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")          # no divide-by-zero
        h = average_hash(px)
    assert h != 0
    # upscaling is hash-preserving for the same content at >= grid size
    big = np.repeat(np.repeat(px, 2, 0), 2, 1)
    assert average_hash(big) == h


def test_checkpoint_stale_staging_dir_not_double_counted(tmp_path):
    from jsonschema_ray.state import CheckpointStore, FragmentRecord
    store = CheckpointStore(str(tmp_path))
    tag = "wave-1-x-0"
    p = store.violations_tmp_path(tag)
    # orphan from a killed run: a parquet file already staged
    pq_path = p + "/old.parquet"
    pa.parquet.write_table(pa.table({"keyword": ["type"]}), pq_path)
    # a restart with the SAME tag re-stages: the orphan must be wiped
    p2 = store.violations_tmp_path(tag)
    assert not os.path.exists(pq_path)
    pa.parquet.write_table(pa.table({"keyword": ["enum"]}), p2 + "/new.parquet")
    store.append_records([FragmentRecord("f.parquet", "h1", 10, 1, False,
                                         0.1, b"", tag)])
    store.commit_violations(tag)
    files = store.violation_files("h1")
    assert len(files) == 1 and files[0].endswith("new.parquet")
    # hash filtering: another hash's waves are excluded
    assert store.violation_files("other") == []


def test_percent_rank_null_values(ray_session):
    from jsonschema_ray.pipelines.relational import percent_rank_by_value
    t = pa.table({"event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "value": pa.array([10.0, None, 5.0, 10.0])})
    out = percent_rank_by_value(_ds(t), "value",
                                keep_cols=["event_id"]).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    # null-value row carries no rank (dropped), others rank over n=3
    assert out["event_id"].tolist() == [1, 3, 4]
    assert out["pct_rank"].tolist() == [0.5, 0.0, 0.5]


import os  # noqa: E402  (used by the checkpoint test)


# ---------------------------------------------------------------------------
# fourth review wave: the session's own rewrites


def test_exact_dedup_null_ids_not_lost(ray_session):
    from jsonschema_ray.dedup import exact_dedup
    t = pa.table({"doc_id": pa.array([None, 1, 2, None, None],
                                     type=pa.int64()),
                  "text": ["A", "B", "B", "C", "C"]})
    out = exact_dedup(_ds(t)).to_pandas().sort_values(
        "text").reset_index(drop=True)
    # A and C exist only under null ids: exactly one copy each survives;
    # B keeps its min id
    assert out["text"].tolist() == ["A", "B", "C"]
    assert out["doc_id"].tolist()[1] == 1
    assert pd.isna(out["doc_id"].iloc[0]) and pd.isna(out["doc_id"].iloc[2])
    # null-id copies of a text that ALSO has a real id all lose
    t2 = pa.table({"doc_id": pa.array([None, 7, None], type=pa.int64()),
                   "text": ["B", "B", "B"]})
    out2 = exact_dedup(_ds(t2)).to_pandas()
    assert out2["doc_id"].tolist() == [7]
    # fallback path agrees on row counts
    out3 = exact_dedup(_ds(t), broadcast_ids_cap=0).to_pandas()
    assert sorted(out3["text"]) == ["A", "B", "C"]


def test_pack_sequences_rejects_float_tokens(ray_session):
    from jsonschema_ray.text import pack_sequences
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "n_tokens": pa.array([0.5, 1.5], type=pa.float64())})
    with pytest.raises(TypeError, match="integer"):
        pack_sequences(_ds(t))


def test_local_topk_nan_scores():
    from jsonschema_ray.ann.search import _local_topk
    ids = np.array([10, 20, 30], dtype=np.int64)
    row = np.array([np.nan, 0.5, 0.2])
    got_ids, got_s = _local_topk(row, ids, 2)
    assert got_ids.tolist() == [20, 30]      # NaN discarded, rest kept
    assert got_s.tolist() == [0.5, 0.2]


def test_violation_files_legacy_records_strict(tmp_path):
    import pyarrow.parquet as pq

    from jsonschema_ray.state import CheckpointStore
    store = CheckpointStore(str(tmp_path))
    # legacy record file WITHOUT the wave_tag column
    legacy = pa.table({"fragment_id": ["f"], "ruleset_hash": ["h1"],
                       "n_rows": pa.array([1], type=pa.int64()),
                       "n_violations": pa.array([1], type=pa.int64()),
                       "passed": [False], "wall_s": [0.1],
                       "sketch_state": pa.array([b""],
                                                type=pa.large_binary())})
    pq.write_table(legacy, str(tmp_path / "records" / "wave-x.parquet"))
    d = tmp_path / "violations" / "oldwave"
    d.mkdir(parents=True)
    pq.write_table(pa.table({"keyword": ["type"]}),
                   str(d / "p.parquet"))
    # unfiltered: committed dir visible; hash-filtered: unattributable →
    # excluded (never mix another hash's waves into a report)
    assert len(store.violation_files()) == 1
    assert store.violation_files("h1") == []


# ---------------------------------------------------------------------------
# incremental ingestion dedup


def test_incremental_dedup_exact_and_bloom(ray_session):
    from jsonschema_ray.pipelines.relational import incremental_dedup
    seen = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                     "text": ["alpha", "beta"]})
    new = pa.table({"doc_id": pa.array([10, 11, 12, 13], type=pa.int64()),
                    "text": ["alpha", "gamma", "beta", "delta"]})
    out = incremental_dedup(_ds(new), _ds(seen)).to_pandas()
    assert sorted(out["doc_id"]) == [11, 13]
    # Bloom variant: never keeps a true duplicate (false DROPS only)
    outb = incremental_dedup(_ds(new), _ds(seen),
                             bloom_fp=0.01).to_pandas()
    kept = set(outb["doc_id"])
    assert kept <= {11, 13}


def test_incremental_dedup_distributed_fallback(ray_session):
    from jsonschema_ray.pipelines.relational import incremental_dedup
    seen = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                     "text": ["alpha", "beta"]})
    new = pa.table({"doc_id": pa.array([10, 11, 12, 13], type=pa.int64()),
                    "text": ["alpha", "gamma", "beta", "delta"]})
    out = incremental_dedup(_ds(new), _ds(seen),
                            broadcast_cap=0).to_pandas()
    assert sorted(out["doc_id"]) == [11, 13]
    assert list(out.columns) == ["doc_id", "text"]


# ---------------------------------------------------------------------------
# wave 6: fresh-operator edges (empty shards, null ts/text, k-less groups)


def test_pack_sequences_empty_input(ray_session):
    import ray.data as rd

    from jsonschema_ray.text import pack_sequences
    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "n_tokens": pa.array([], type=pa.int64())})
    out = pack_sequences(rd.from_arrow(t))
    assert [f.name for f in out.schema().base_schema] == \
        ["doc_id", "n_tokens", "pack_id"]
    assert out.count() == 0


def test_incremental_dedup_null_text_and_all_dup(ray_session):
    from jsonschema_ray.pipelines.relational import incremental_dedup
    seen = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                     "text": ["aa", None]})
    new = pa.table({"doc_id": pa.array([10, 11, 12], type=pa.int64()),
                    "text": [None, "cc", "aa"]})
    # SQL '=' never matches NULL: the null-text new row is always kept
    out = incremental_dedup(_ds(new), _ds(seen)).to_pandas()
    assert sorted(out["doc_id"]) == [10, 11]
    # all-duplicate shard via the distributed fallback keeps its schema
    new2 = pa.table({"doc_id": pa.array([20], type=pa.int64()),
                     "text": ["aa"]})
    ds2 = incremental_dedup(_ds(new2), _ds(seen), broadcast_cap=0)
    assert [f.name for f in ds2.schema().base_schema] == ["doc_id", "text"]
    assert ds2.count() == 0


def test_dedup_events_window_null_ts(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.relational import dedup_events_window
    df = pd.DataFrame({
        "event_id": [1, 4, 5, 6, 7],
        "user_id": [2, 2, 2, 2, 3],
        "event_type": ["c"] * 5,
        "ts": pd.to_datetime(["2024-01-01 01:00", "2024-01-01 05:00",
                              None, None, "2024-01-01 01:00"]),
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = dedup_events_window(str(tmp_path))
    # null-ts rows carry no LAG diff: all kept (matches the SQL oracle)
    assert got["event_id"].tolist() == [1, 4, 5, 6, 7]


def test_props_field_kless_group(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from jsonschema_ray.pipelines.relational import props_field_by_type
    df = pd.DataFrame({"event_id": [1, 2],
                       "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
                       "user_id": [1, 2], "event_type": ["z", "y"],
                       "value": [1.0, 2.0],
                       "props": ['{"x": 9}', '{"k": 5}']})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = props_field_by_type(str(tmp_path)).set_index("event_type")
    assert out.loc["y", "sum_k"] == 5 and out.loc["y", "n_with_k"] == 1
    assert pd.isna(out.loc["z", "sum_k"]) and out.loc["z", "n_with_k"] == 0
