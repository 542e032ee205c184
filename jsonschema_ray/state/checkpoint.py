"""Per-partition checkpoint / lineage records (north rule: "every partition
writes a checkpoint record with lineage (input fragment, rule-set hash,
sketch state) so a killed run resumes without re-validating completed
partitions").

The reference's only persistence is parse-memoization caches
(internal/schemacache/schemacache.go:16-73); run-level lineage is new here.

Layout under ``checkpoint_dir``:
  records/wave-**.parquet   — one row per completed fragment (appended
                              ATOMICALLY: temp file + rename, so a kill
                              mid-write never yields a half-record)
  violations/               — violation rows parquet, per wave

Commit protocol (records are the SOLE commit point; FIXTURES F4 /
SURVEY §7.7): a wave's violations are STAGED to ``<wave>.tmp`` first, the
fragment records (tagged with the wave) are appended atomically, and only
then is the staging dir renamed to ``<wave>``.  Kill windows:
  - before append_records: staged violations + no records → the resume
    re-validates those fragments under a NEW wave tag; the orphaned
    ``.tmp`` dir is never read (no record references it) — no duplicates.
  - between append_records and the rename: records exist, violations
    still staged → :meth:`violation_files` recovers the ``.tmp`` dir
    because a committed record references its wave tag — no loss.

A fragment is "completed" only for the same ruleset_hash — editing the rule
set invalidates prior work by construction.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import asdict, dataclass
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq


@dataclass
class FragmentRecord:
    fragment_id: str         # input file basename — stable identity
    ruleset_hash: str
    n_rows: int
    n_violations: int
    passed: bool
    wall_s: float
    # serialized per-fragment sketch state: parquet-encoded stats partials
    # (stages/stats.py merge rows) — merged across fragments on resume
    sketch_state: Optional[bytes] = None
    # violations staging dir this fragment's violations were written to;
    # lets violation_files() recover waves killed between record append
    # and violation commit
    wave_tag: str = ""


_SCHEMA = pa.schema([
    ("fragment_id", pa.string()),
    ("ruleset_hash", pa.string()),
    ("n_rows", pa.int64()),
    ("n_violations", pa.int64()),
    ("passed", pa.bool_()),
    ("wall_s", pa.float64()),
    ("sketch_state", pa.large_binary()),
    ("wave_tag", pa.string()),
])


def _fsync_dir(path: str) -> None:
    """fsync a DIRECTORY so a completed rename survives power loss — the
    file-level fsync alone does not order the two renames of the commit
    protocol on crash-consistency filesystems."""
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return
    try:
        os.fsync(fd)
    except OSError:
        pass
    finally:
        os.close(fd)


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        self.records_dir = os.path.join(root, "records")
        self.violations_dir = os.path.join(root, "violations")
        os.makedirs(self.records_dir, exist_ok=True)
        os.makedirs(self.violations_dir, exist_ok=True)

    # -- reading -------------------------------------------------------
    def load_records(self) -> pa.Table:
        files = [os.path.join(self.records_dir, f)
                 for f in sorted(os.listdir(self.records_dir))
                 if f.endswith(".parquet")]
        if not files:
            return _SCHEMA.empty_table()
        # promote: records written before the wave_tag column existed
        return pa.concat_tables([pq.read_table(f) for f in files],
                                promote_options="default")

    def completed(self, ruleset_hash: str) -> set:
        t = self.load_records()
        if t.num_rows == 0:
            return set()
        import pyarrow.compute as pc
        sel = t.filter(pc.equal(t["ruleset_hash"], ruleset_hash))
        return set(sel["fragment_id"].to_pylist())

    # -- writing -------------------------------------------------------
    def append_records(self, records: list[FragmentRecord]) -> str:
        """Atomic append: write temp, fsync, rename (SURVEY §7 hard part
        (f): 'write checkpoint record last, atomically')."""
        rows = {name: [] for name in _SCHEMA.names}
        for r in records:
            d = asdict(r)
            for name in _SCHEMA.names:
                rows[name].append(d[name])
        t = pa.table(rows, schema=_SCHEMA)
        final = os.path.join(self.records_dir,
                             f"wave-{uuid.uuid4().hex[:12]}.parquet")
        tmp = final + ".tmp"
        pq.write_table(t, tmp)
        with open(tmp, "rb") as f:
            os.fsync(f.fileno())
        os.rename(tmp, final)
        # the record rename must be DURABLE before the caller commits the
        # wave's violations dir — otherwise power loss could persist the
        # violations rename while losing the record, and the resume would
        # re-validate fragments whose old violations are still committed
        _fsync_dir(self.records_dir)
        return final

    def violations_tmp_path(self, wave_tag: str) -> str:
        """Staging dir for a wave's violation parquet. Committed via
        :meth:`commit_violations` (rename) AFTER the wave's records are
        appended — the records are the sole commit point (see module
        docstring for the two kill windows)."""
        p = os.path.join(self.violations_dir, wave_tag + ".tmp")
        if os.path.isdir(p) and os.listdir(p):
            # a leftover staging dir with the same tag is uncommitted
            # garbage from a killed run — mixing its files in would
            # double-count every violation of the wave
            import shutil
            shutil.rmtree(p)
        os.makedirs(p, exist_ok=True)
        return p

    def sync_staged(self, wave_tag: str) -> None:
        """fsync every staged violation file of a wave. MUST run before
        the wave's records append: the records are the commit point, so
        the data they implicitly commit has to be durable first —
        otherwise power loss can leave a committed wave pointing at
        truncated parquet."""
        p = os.path.join(self.violations_dir, wave_tag + ".tmp")
        if not os.path.isdir(p):
            return
        for f in os.listdir(p):
            try:
                fd = os.open(os.path.join(p, f), os.O_RDONLY)
            except OSError:
                continue
            try:
                os.fsync(fd)
            except OSError:
                pass
            finally:
                os.close(fd)
        _fsync_dir(p)

    def commit_violations(self, wave_tag: str) -> str:
        tmp = os.path.join(self.violations_dir, wave_tag + ".tmp")
        final = os.path.join(self.violations_dir, wave_tag)
        os.rename(tmp, final)
        _fsync_dir(self.violations_dir)
        return final

    def gc_staging(self) -> int:
        """Delete ORPHANED violation staging dirs: a ``<tag>.tmp`` whose
        tag no committed record references was written by a run killed
        before its records append. Tags are run-unique, so nothing ever
        reads or reclaims such a dir — without GC a flaky cluster
        accumulates a dead wave's full violation set per kill. Call at
        run START (single-writer assumption, same as the commit
        protocol) — never concurrently with an active wave."""
        import shutil
        rec = self.load_records()
        recorded = set()
        if rec.num_rows and "wave_tag" in rec.schema.names:
            recorded = set(rec["wave_tag"].to_pylist()) - {"", None}
        n = 0
        for d in os.listdir(self.violations_dir):
            full = os.path.join(self.violations_dir, d)
            if d.endswith(".tmp") and os.path.isdir(full) \
                    and d[:-4] not in recorded:
                shutil.rmtree(full, ignore_errors=True)
                n += 1
        return n

    def violation_files(self, ruleset_hash: str = None) -> list[str]:
        """Violation parquet files of every COMMITTED wave.  A ``.tmp``
        staging dir is included only when a committed fragment record
        references its wave tag (kill between append_records and
        commit_violations); unreferenced staging dirs are in-flight or
        orphaned and are ignored. With ``ruleset_hash``, only waves whose
        records carry that hash are returned (a checkpoint dir reused
        across rule-set edits holds waves of several hashes)."""
        import pyarrow.compute as pc
        rec = self.load_records()
        recorded = set()
        allowed = None
        if rec.num_rows and "wave_tag" in rec.schema.names:
            recorded = set(rec["wave_tag"].to_pylist()) - {"", None}
            if ruleset_hash is not None:
                sel = rec.filter(pc.equal(rec["ruleset_hash"],
                                          ruleset_hash))
                allowed = set(sel["wave_tag"].to_pylist()) - {"", None}
        elif ruleset_hash is not None:
            # records predate wave tags: no dir can be attributed to the
            # requested hash — return nothing rather than every hash's
            # waves (the cross-hash mix this filter exists to prevent)
            allowed = set()
        out = []
        for d in sorted(os.listdir(self.violations_dir)):
            full = os.path.join(self.violations_dir, d)
            if not os.path.isdir(full):
                continue
            tag = d[:-4] if d.endswith(".tmp") else d
            if d.endswith(".tmp") and tag not in recorded:
                continue
            if allowed is not None and tag not in allowed:
                continue
            out += [os.path.join(full, f) for f in sorted(os.listdir(full))
                    if f.endswith(".parquet")]
        return out
