"""CheckpointStore edge cases: atomicity leftovers, mixed rule-set hashes,
record accumulation across waves (state/checkpoint.py)."""

import os

import pyarrow.parquet as pq

from jsonschema_ray.state import CheckpointStore, FragmentRecord


def _rec(frag, h="hash-a", nv=0):
    return FragmentRecord(fragment_id=frag, ruleset_hash=h, n_rows=10,
                         n_violations=nv, passed=nv == 0, wall_s=0.1,
                         sketch_state=b"\x01\x02")


def test_records_accumulate_and_filter_by_hash(tmp_path):
    store = CheckpointStore(str(tmp_path))
    store.append_records([_rec("f1"), _rec("f2")])
    store.append_records([_rec("f3"), _rec("f1", h="hash-b")])
    assert store.completed("hash-a") == {"f1", "f2", "f3"}
    assert store.completed("hash-b") == {"f1"}
    assert store.completed("hash-zzz") == set()
    t = store.load_records()
    assert t.num_rows == 4
    assert t["sketch_state"].to_pylist()[0] == b"\x01\x02"


def test_stale_tmp_record_files_are_ignored(tmp_path):
    store = CheckpointStore(str(tmp_path))
    store.append_records([_rec("f1")])
    # simulate a kill mid-append: a half-written temp file lingers
    stale = os.path.join(store.records_dir, "wave-dead.parquet.tmp")
    open(stale, "wb").write(b"garbage not parquet")
    assert store.completed("hash-a") == {"f1"}  # tmp suffix filtered


def test_violation_staging_commit_protocol(tmp_path):
    import pyarrow as pa
    store = CheckpointStore(str(tmp_path))
    tmp_dir = store.violations_tmp_path("wave-1")
    pq.write_table(pa.table({"keyword": ["maximum"]}),
                   os.path.join(tmp_dir, "part-0.parquet"))
    # uncommitted: readers see nothing
    assert store.violation_files() == []
    store.commit_violations("wave-1")
    files = store.violation_files()
    assert len(files) == 1
    assert pq.read_table(files[0])["keyword"].to_pylist() == ["maximum"]
    # a second staged-but-never-committed wave stays invisible
    store.violations_tmp_path("wave-2")
    assert len(store.violation_files()) == 1


def test_empty_store(tmp_path):
    store = CheckpointStore(str(tmp_path))
    assert store.load_records().num_rows == 0
    assert store.completed("x") == set()
    assert store.violation_files() == []


def test_staged_wave_recovered_when_records_reference_it(tmp_path):
    """Kill window between append_records and commit_violations: the
    staged .tmp dir must be READ (its fragments are committed, the resume
    skips them — losing the violations would under-count), while an
    unreferenced .tmp dir stays invisible (its fragments get re-validated
    under a new wave tag — reading it would double-count)."""
    import pyarrow as pa
    store = CheckpointStore(str(tmp_path))
    # wave-a: violations staged AND records committed, rename never ran
    tmp_a = store.violations_tmp_path("wave-a")
    pq.write_table(pa.table({"keyword": ["minimum"]}),
                   os.path.join(tmp_a, "part-0.parquet"))
    store.append_records([FragmentRecord(
        fragment_id="fa", ruleset_hash="h", n_rows=5, n_violations=1,
        passed=False, wall_s=0.1, sketch_state=b"", wave_tag="wave-a")])
    # wave-b: staged only (killed before records) — must stay invisible
    tmp_b = store.violations_tmp_path("wave-b")
    pq.write_table(pa.table({"keyword": ["maximum"]}),
                   os.path.join(tmp_b, "part-0.parquet"))
    files = store.violation_files()
    kws = [pq.read_table(f)["keyword"].to_pylist() for f in files]
    assert kws == [["minimum"]]
    # the fragment reads as completed, so nothing re-validates it
    assert store.completed("h") == {"fa"}
