"""Round-4 review pins for the flagship stats/state path: exact int64
min/max across every merge hop, n_num surviving re-merges, and staging
garbage collection."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

BIG_MAX = (1 << 63) - 2          # int64 values far past 2^53
BIG_MIN = -(1 << 63) + 1


def test_column_stats_exact_int64_minmax_with_strings():
    """min_int/max_int must survive the merge exactly even when the
    partial frame mixes integer and string columns (null-bearing int64
    → float64 in pandas was silently rounding them)."""
    import ray
    import ray.data as rd

    from jsonschema_ray.stages import column_stats
    from jsonschema_ray.stages.stats import stats_frame
    t = pa.table({
        "big": pa.array([BIG_MIN, BIG_MAX, 5], type=pa.int64()),
        "s": pa.array(["a", "b", "c"])})
    ds = column_stats(rd.from_arrow(t))
    # consume via stats_frame (nullable Int64): a plain to_pandas of the
    # MIXED stats rows would re-floatify min_int at the last hop
    out = stats_frame(pa.concat_tables(
        ray.get(ds.to_arrow_refs()), promote_options="permissive"))
    row = out[out["column"] == "big"].iloc[0]
    assert int(row["min_int"]) == BIG_MIN
    assert int(row["max_int"]) == BIG_MAX


def test_flagship_report_exact_phash_minmax(tmp_path):
    """The one-pass flagship stats carry phash (full-range signed 64-bit)
    min/max exactly — compared against a direct scan of the corpus."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from jsonschema_ray.pipelines import flagship_report
    from jsonschema_ray.sources import write_images_corpus
    d = str(tmp_path / "imgs")
    write_images_corpus(d, 300, num_files=2, seed=7)
    files = sorted(os.path.join(d, f) for f in os.listdir(d)
                   if f.endswith(".parquet"))
    ph = pa.concat_tables([pq.read_table(f, columns=["phash"])
                           for f in files])["phash"] \
        .to_numpy(zero_copy_only=False)
    rep = flagship_report(rd.read_parquet(files), check_phash=False)
    row = rep["stats"][rep["stats"]["column"] == "phash"].iloc[0]
    assert int(row["min_int"]) == int(ph.min())
    assert int(row["max_int"]) == int(ph.max())


def test_merge_preserves_n_num_across_remerge():
    """Re-merging MERGED rows (the persisted per-fragment sketch_state
    path) keeps the NaN/inf-excluding n_num, so the global mean matches
    the one-shot mean."""
    import ray.data as rd

    from jsonschema_ray.stages.stats import (ColumnStatsStage,
                                             merge_stat_partials,
                                             stats_frame)
    stage = ColumnStatsStage()
    p1 = stage(pa.table({"x": pa.array([1.0, float("nan"), 3.0])}))
    p2 = stage(pa.table({"x": pa.array([5.0, float("inf")])}))
    m1 = merge_stat_partials(stats_frame(p1))
    m2 = merge_stat_partials(stats_frame(p2))
    assert int(m1["n_num"].iloc[0]) == 2  # NaN excluded
    remerged = merge_stat_partials(pd.concat([m1, m2],
                                             ignore_index=True))
    # finite values: 1, 3, 5 → mean 3.0 (NOT (1+3+5)/5 = 1.8)
    assert remerged["mean_num"].iloc[0] == pytest.approx(3.0)
    assert int(remerged["n_num"].iloc[0]) == 3


def test_checkpoint_gc_staging(tmp_path):
    """Orphaned .tmp staging dirs (killed before the records append) are
    reclaimed at run start; referenced .tmp dirs (killed between append
    and commit) survive for recovery."""
    from jsonschema_ray.state import CheckpointStore, FragmentRecord
    store = CheckpointStore(str(tmp_path / "ckpt"))
    orphan = store.violations_tmp_path("wave-dead-1")
    os.makedirs(orphan, exist_ok=True)
    open(os.path.join(orphan, "part.parquet"), "wb").write(b"x")
    recovered = store.violations_tmp_path("wave-live-2")
    os.makedirs(recovered, exist_ok=True)
    store.append_records([FragmentRecord(
        fragment_id="f1", ruleset_hash="h", n_rows=1, n_violations=0,
        passed=True, wall_s=0.0, wave_tag="wave-live-2")])
    n = store.gc_staging()
    assert n == 1
    assert not os.path.exists(orphan)
    assert os.path.exists(recovered)


def test_pipeline_stats_exact_after_resume(tmp_path):
    """End-to-end: the checkpointed pipeline's GLOBAL stats carry exact
    phash min/max through sketch_state persistence + the driver
    re-merge."""
    import pyarrow.parquet as pq
    import ray.data  # noqa: F401

    from jsonschema_ray.pipelines import validate_images_pipeline
    from jsonschema_ray.sources import write_images_corpus
    d = str(tmp_path / "imgs")
    write_images_corpus(d, 200, num_files=2, seed=11)
    files = sorted(os.path.join(d, f) for f in os.listdir(d)
                   if f.endswith(".parquet"))
    ph = pa.concat_tables([pq.read_table(f, columns=["phash"])
                           for f in files])["phash"] \
        .to_numpy(zero_copy_only=False)
    rep = validate_images_pipeline(d, str(tmp_path / "ckpt"))
    row = rep["stats"][rep["stats"]["column"] == "phash"].iloc[0]
    assert int(row["min_int"]) == int(ph.min())
    assert int(row["max_int"]) == int(ph.max())
    # resume (all fragments completed): stats still exact
    rep2 = validate_images_pipeline(d, str(tmp_path / "ckpt"))
    row2 = rep2["stats"][rep2["stats"]["column"] == "phash"].iloc[0]
    assert int(row2["min_int"]) == int(ph.min())
    assert int(row2["max_int"]) == int(ph.max())
