"""The flagship pipeline (north rule, end to end): validate an image+caption
table — declarative rule set + decode-structural checks + per-column sketch
stats in ONE streaming pass over the bytes, plus the three table-level
checks (uniqueness shuffle, phash near-dup shuffle, referential broadcast)
over narrow projections, with per-fragment checkpoint/lineage resume.

Execution shape (SURVEY §3.4):
  driver: compile rule set once → hash → plan waves of pending fragments
  stage A (per wave, ONE pass over bytes): map_batches → rule violations +
          decode violations + fragment-keyed stats partials, emitted as a
          discriminated-union table from the same scan
  shuffle: uniqueness groupby(image_id-counts), phash band groupby —
          both on projected columns; image bytes never shuffle
  broadcast: ref_ids key set via ray.put
  driver: merge sketches (incl. resumed fragments' persisted state),
          drift vs baseline, assemble report; checkpoint records are the
          per-wave commit point (violations written first)
"""

from __future__ import annotations

import glob
import io
import os
import time
import uuid
from typing import Optional

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..checks import (drift_report, duplicate_keys, phash_near_duplicates,
                      referential_violations)
from ..rules.model import RuleSet, parse_ruleset
from ..rules.vector import BatchValidator
from ..stages.decode import DecodeCheckStage
from ..stages.stats import ColumnStatsStage, merge_stat_groups
from ..state import CheckpointStore, FragmentRecord

# The canonical rule set for the BASELINE input_hint schema (FIXTURES F3) —
# drafted the way a jsonschema user would write it (keywords per
# pkg/draft202012/keywords.go:423-481).
IMAGE_RULESET = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "required": ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
    "properties": {
        "image_id": {"type": "string", "pattern": "^img-[0-9]{12}$"},
        "bytes": {"type": "binary"},
        "w": {"type": "integer", "minimum": 16, "maximum": 512},
        "h": {"type": "integer", "minimum": 16, "maximum": 512},
        "fmt": {"enum": ["png", "bmp", "ppm"]},
        "caption": {"type": "string", "maxLength": 256,
                    "pattern": "^[\\x20-\\x7e]*$"},
        "phash": {"type": "integer"},
    },
}


class ImageValidateStage:
    """One pass over a batch: rule-set violations + decode-structural
    violations, each stamped with the source fragment when the batch
    carries a ``path`` column (read_parquet include_paths=True)."""

    def __init__(self, ruleset, decode: bool = True,
                 check_phash: bool = False, path_col: Optional[str] = None):
        rs = ruleset if isinstance(ruleset, RuleSet) else \
            parse_ruleset(ruleset)
        self.path_col = path_col
        keys = ["image_id"] + ([path_col] if path_col else [])
        self.bv = BatchValidator(rs, key_columns=keys)
        self.decoder = DecodeCheckStage(
            phash_col="phash" if check_phash else None,
            extra_cols=(path_col,) if path_col else ()) if decode else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        # an extra path column is inert for the rule set (unknown-keyword
        # tolerance analog: columns are ignored unless the rule set closes
        # the schema)
        viol = self.bv.violations(batch)
        if self.decoder is not None:
            dv = self.decoder(batch)
            viol = pa.concat_tables([viol, dv.select(viol.column_names)])
        return viol


class _FragmentStatsStage:
    """Stats partials per (fragment, column) — narrow columns only."""

    def __init__(self, columns: list[str], path_col: str = "path"):
        self.inner = ColumnStatsStage(columns=columns)
        self.columns = columns
        self.path_col = path_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch.column(self.path_col)
        uniq = pc.unique(paths).to_pylist()
        outs = []
        for p in uniq:
            sub = batch.filter(pc.equal(paths, p))
            t = self.inner(sub.select(self.columns))
            outs.append(t.append_column(
                "fragment_id",
                pa.array([os.path.basename(p)] * t.num_rows)))
        return pa.concat_tables(outs)


def _stats_state_to_bytes(df: pd.DataFrame) -> bytes:
    buf = io.BytesIO()
    df.to_parquet(buf)  # pyarrow engine; nullable ints stay int64
    return buf.getvalue()


def _stats_state_from_bytes(b: bytes) -> pd.DataFrame:
    # through Arrow + stats_frame: a plain read_parquet would surface
    # the null-bearing min_int/max_int int64 columns as float64,
    # rounding exact min/max past 2^53 at every resume re-merge
    import pyarrow.parquet as _pq

    from ..stages.stats import stats_frame
    return stats_frame(_pq.read_table(io.BytesIO(b)))


def _collect_arrow(ds) -> pa.Table:
    """Materialize a SMALL Dataset to one Arrow table (permissive
    promotion over per-block string/large_string drift) — to_pandas
    would convert null-bearing int64 columns to float64, which corrupts
    the exact min_int/max_int stats this module carries."""
    import ray
    tabs = ray.get(ds.to_arrow_refs())
    nonempty = [t for t in tabs if t.num_rows]
    if nonempty:
        return pa.concat_tables(nonempty, promote_options="permissive")
    if tabs:
        return tabs[0]
    raise ValueError("empty dataset: nothing to collect")


def _image_validate_batch(batch, *, doc_json, decode, check_phash,
                          path_col):
    import json

    from ..util import worker_cached
    stage = worker_cached(
        ("imgvalidate", doc_json, decode, check_phash, path_col),
        lambda: ImageValidateStage(json.loads(doc_json), decode=decode,
                                   check_phash=check_phash,
                                   path_col=path_col))
    return stage(batch)


def _image_stage_fn(rs, decode, check_phash, path_col=None):
    import functools

    from ..rules.model import canonical_json
    return functools.partial(_image_validate_batch,
                             doc_json=canonical_json(rs.doc), decode=decode,
                             check_phash=check_phash, path_col=path_col)


def adaptive_batch_size(ds=None, files=None, target_bytes: int = 64 << 20,
                        lo: int = 64, hi: int = 8192,
                        default: int = 4096,
                        min_tasks_per_cpu: int = 4) -> int:
    """Row-count batch size for a WIDE-payload stage, bounded two ways:

    - from the actual bytes/row, so a batch stays ≈ ``target_bytes``
      regardless of image size (ray_guide 'Memory-aware': 4096 rows of
      150 KB images would be a 600 MB batch);
    - from the corpus size vs cluster CPUs, so the stage still fans out to
      ≥ ``min_tasks_per_cpu`` tasks per core (ds.stats() showed a 100k-row
      corpus collapsing to 12 tasks on 32 CPUs at the byte-derived cap —
      batch size must shrink on small inputs, not just on wide rows)."""
    try:
        if not files and ds is not None:
            # metadata-only for read datasets; deriving size from a lazy
            # computed pipeline would EXECUTE it just to pick a batch size
            files = ds.input_files()
        if not files:
            return default
        md = pq.read_metadata(files[0])
        nbytes = sum(md.row_group(i).total_byte_size
                     for i in range(md.num_row_groups))
        per_row = max(1, nbytes // max(1, md.num_rows))
        total_rows = md.num_rows * len(files)  # same-sized fragments
        try:
            import ray
            cpus = int(ray.cluster_resources().get("CPU", 0)) or \
                (os.cpu_count() or 8)
        except Exception:
            cpus = os.cpu_count() or 8
        parallel_cap = max(lo, total_rows // (min_tasks_per_cpu * cpus))
        return int(min(hi, parallel_cap,
                       max(lo, target_bytes // per_row)))
    except Exception:
        return default


def validate_images(ds, ruleset=None, decode: bool = True,
                    check_phash: bool = False, batch_size: int = None):
    """One-shot (no checkpoint): Dataset → Dataset of violation rows.
    ``batch_size`` defaults to a payload-aware value (adaptive_batch_size)."""
    rs = parse_ruleset(ruleset or IMAGE_RULESET)
    if batch_size is None:
        batch_size = adaptive_batch_size(ds=ds)
    return ds.map_batches(
        _image_stage_fn(rs, decode, check_phash),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)


def _union_pad(t: pa.Table, schema: pa.Schema) -> pa.Table:
    cols = []
    for f in schema:
        if f.name in t.column_names:
            cols.append(t.column(f.name).cast(f.type))
        else:
            cols.append(pa.nulls(t.num_rows, type=f.type))
    return pa.Table.from_arrays(cols, schema=schema)


def _wave_partials_batch(t: pa.Table) -> pa.Table:
    """Union batch → stats partials (record_type "s", passed through) PLUS
    per-(fragment, keyword) violation COUNT rows (record_type "c",
    ``n`` column) in ONE pass. The driver pulls one execution's worth of
    O(batches × (stat columns + keywords)) rows at ANY violation rate —
    never the violation rows themselves (VERDICT-r2 item 6) — and the
    wave costs no extra Ray execution over the r1 shape."""
    schema = pa.schema(list(t.schema) + [pa.field("n", pa.int64())])
    s = _union_pad(t.filter(pc.equal(t["record_type"], "s")), schema)
    v = t.filter(pc.equal(t["record_type"], "v"))
    if v.num_rows == 0:
        return s
    df = v.select(["path", "keyword"]).to_pandas()
    df["fragment_id"] = df["path"].map(os.path.basename)
    g = df.groupby(["fragment_id", "keyword"]).size().reset_index(name="n")
    c = _union_pad(pa.table({
        "record_type": pa.array(["c"] * len(g), type=pa.string()),
        "fragment_id": pa.array(g["fragment_id"], type=pa.string()),
        "keyword": pa.array(g["keyword"], type=pa.string()),
        "n": pa.array(g["n"], type=pa.int64())}), schema)
    return pa.concat_tables([s, c])


def _flagship_pass_batch(batch, *, doc_json, decode, check_phash,
                         stats_columns, path_col=None):
    """ONE pass over the bytes: rule+decode violations AND per-batch stats
    partials, emitted as a discriminated-union table (record_type 'v'/'s').
    This is the north star's stage-A shape — violations and sketch state
    from the same scan, no second read of the wide column. With
    ``path_col`` set (checkpointed pipeline), violations carry the source
    path and stats partials are keyed by fragment_id."""
    import json

    from ..stages.stats import ColumnStatsStage
    from ..util import worker_cached

    def build():
        validator = ImageValidateStage(json.loads(doc_json), decode=decode,
                                       check_phash=check_phash,
                                       path_col=path_col)
        if path_col:
            stats = _FragmentStatsStage(list(stats_columns),
                                        path_col=path_col)
        else:
            stats = ColumnStatsStage(columns=list(stats_columns))
        return validator, stats

    validator, stats = worker_cached(
        ("flagpass", doc_json, decode, check_phash, stats_columns,
         path_col), build)
    viol = validator(batch)
    if path_col:
        sp = stats(batch.select(list(stats_columns) + [path_col]))
    else:
        sp = stats(batch.select(list(stats_columns)))
    fields = [pa.field("record_type", pa.string())]
    for f in viol.schema:
        fields.append(f)
    for f in sp.schema:
        fields.append(f)
    schema = pa.schema(fields)
    viol = viol.append_column("record_type",
                              pa.array(["v"] * viol.num_rows))
    sp = sp.append_column("record_type", pa.array(["s"] * sp.num_rows))
    return pa.concat_tables([_union_pad(viol, schema),
                             _union_pad(sp, schema)])


def flagship_report(ds, ruleset=None, decode: bool = True,
                    check_phash: bool = True,
                    stats_columns: tuple = ("w", "h", "caption", "phash"),
                    batch_size: int = None) -> dict:
    """Single-pass violations + merged column stats over an image Dataset
    (no checkpointing — the bench/one-shot face of the flagship)."""
    import functools

    from ..rules.model import canonical_json
    rs = parse_ruleset(ruleset or IMAGE_RULESET)
    if batch_size is None:
        batch_size = adaptive_batch_size(ds=ds)
    union = _collect_arrow(ds.map_batches(
        functools.partial(_flagship_pass_batch,
                          doc_json=canonical_json(rs.doc), decode=decode,
                          check_phash=check_phash,
                          stats_columns=tuple(stats_columns)),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size))  # small: violations + partials
    from ..stages.stats import _PARTIAL_SCHEMA, stats_frame
    viol = union.filter(pc.equal(union["record_type"], "v")).to_pandas() \
        .drop(columns=["record_type", *_PARTIAL_SCHEMA.names],
              errors="ignore")
    # stats_frame (nullable Int64): exact min_int/max_int survive the
    # mixed-column frame (full-range phash values live past 2^53)
    partials = stats_frame(
        union.filter(pc.equal(union["record_type"], "s")))
    stats = merge_stat_groups(partials)
    return {"violations": viol.reset_index(drop=True),
            "stats": stats.drop(columns=["hll", "tdigest"]),
            "n_violations": len(viol)}


def validate_images_pipeline(
        input_dir: str,
        checkpoint_dir: str,
        ruleset=None,
        ref_ids=None,
        baseline_stats: Optional[pd.DataFrame] = None,
        wave_size: int = 64,
        decode: bool = True,
        check_phash: bool = False,
        stats_columns: tuple = ("w", "h", "caption", "phash"),
        batch_size: int = None,
        neardup_max_distance: int = 4) -> dict:
    """Checkpointed flagship run. Returns the global report dict.

    Resume semantics: per-fragment rule+decode validation and stats are
    skipped for fragments whose checkpoint record (same ruleset_hash)
    exists — their violation output and sketch state persist from the prior
    run. The cross-fragment checks (uniqueness, near-dup, referential) run
    over the full input each time: they are global properties computed on
    narrow projections (keys + phash only), so re-running them is cheap
    relative to decode and keeps them exact under resume.

    ``batch_size=None`` sizes each wave's decode batches from the wave's
    own file metadata (adaptive_batch_size) — a fixed row count would
    blow worker heaps on wide images, exactly what that helper exists
    to prevent.

    Verdict semantics: ``table_pass``/``n_violations`` cover per-row
    rule+decode violations plus the two EXACT cross-fragment checks
    (duplicate ids, referential orphans). phash near-dup pairs are
    reported in ``neardup_pairs`` but are deliberately ADVISORY — a
    perceptual-similarity candidate list with threshold-tunable
    semantics, not a row-level defect — so they never flip the verdict.
    """
    import ray.data as rd

    rs = parse_ruleset(ruleset or IMAGE_RULESET)
    store = CheckpointStore(checkpoint_dir)
    store.gc_staging()  # reclaim staging dirs of runs killed pre-commit
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet fragments under {input_dir}")
    by_fragment = {os.path.basename(f): f for f in files}
    done = store.completed(rs.ruleset_hash)
    pending = [f for f in files if os.path.basename(f) not in done]

    new_records: list[FragmentRecord] = []
    run_id = uuid.uuid4().hex[:8]
    for wi in range(0, len(pending), wave_size):
        wave = pending[wi:wi + wave_size]
        # run-unique tag: a same-second restart after a kill must not
        # reuse an orphaned staging dir's tag (double-committed files)
        tag = f"wave-{int(time.time())}-{run_id}-{wi}"
        t0 = time.perf_counter()
        import functools

        from ..rules.model import canonical_json
        wave_bs = batch_size or adaptive_batch_size(files=wave)
        ds = rd.read_parquet(wave, include_paths=True)
        # ONE pass over the bytes per wave: violations + fragment-keyed
        # stats partials from the same scan
        union = ds.map_batches(
            functools.partial(_flagship_pass_batch,
                              doc_json=canonical_json(rs.doc),
                              decode=decode, check_phash=check_phash,
                              stats_columns=tuple(stats_columns),
                              path_col="path"),
            batch_format="pyarrow", zero_copy_batch=True,
            batch_size=wave_bs).materialize()  # small: viols + partials
        viol_cols = ["image_id", "path", "keyword", "keyword_location",
                     "instance_location", "offending_value", "message"]
        viol = union.map_batches(
            lambda t: t.filter(pc.equal(t["record_type"], "v"))
            .select(viol_cols),
            batch_format="pyarrow", zero_copy_batch=True)
        # deterministic output order for exact-match comparison
        # (FIXTURES F4; SURVEY §7 hard part (d)) — violations are ~0.1% of
        # rows, the sort is over a small dataset
        viol = viol.sort(["image_id", "keyword", "instance_location"])
        # violations STAGED only; committed (renamed) after the wave's
        # records append below — records are the sole commit point, so a
        # kill in either window never double-counts or loses violations
        # (state/checkpoint.py module docstring)
        viol.write_parquet(store.violations_tmp_path(tag))
        # ONE extra execution pulls stats partials + per-(fragment,
        # keyword) count rows together — O(batches × (columns+keywords))
        # driver rows even when 100% of the input violates; the violation
        # rows themselves never land on the driver (VERDICT-r2 item 6)
        from ..stages.stats import stats_frame
        parts = stats_frame(_collect_arrow(union.map_batches(
            _wave_partials_batch, batch_format="pyarrow",
            zero_copy_batch=True)))  # Int64-exact min_int/max_int
        cnt = parts[parts["record_type"] == "c"]
        if len(cnt):
            nviol_by_frag = cnt.groupby("fragment_id")["n"].sum()
        else:
            nviol_by_frag = pd.Series(dtype="int64")
        sp = parts[parts["record_type"] == "s"]
        wall = time.perf_counter() - t0
        for f in wave:
            frag = os.path.basename(f)
            nrows = pq.read_metadata(f).num_rows
            nv = int(nviol_by_frag.get(frag, 0))
            frag_stats = sp[sp["fragment_id"] == frag]
            merged = merge_stat_groups(frag_stats) \
                if len(frag_stats) else pd.DataFrame()
            new_records.append(FragmentRecord(
                fragment_id=frag, ruleset_hash=rs.ruleset_hash,
                n_rows=int(nrows), n_violations=nv, passed=nv == 0,
                wall_s=wall / max(1, len(wave)),
                sketch_state=_stats_state_to_bytes(
                    merged.drop(columns=["fragment_id"], errors="ignore")),
                wave_tag=tag))
        store.sync_staged(tag)  # staged data durable BEFORE the commit
        store.append_records(new_records[-len(wave):])
        store.commit_violations(tag)

    # ---- global view: resumed + new fragments -------------------------
    # per-keyword counts from the COMMITTED violation state (this hash's
    # waves only) so the report agrees with the records sum after any
    # resume — a this-run-only accumulator would undercount
    per_keyword: dict[str, int] = {}
    vfiles = store.violation_files(rs.ruleset_hash)
    if vfiles:
        kdf = rd.read_parquet(vfiles, columns=["keyword"]) \
            .groupby("keyword").count().to_pandas()
        ccol = [c for c in kdf.columns if c != "keyword"][0]
        per_keyword = {k: int(c) for k, c in zip(kdf["keyword"],
                                                 kdf[ccol])}
    records = store.load_records().to_pandas()
    records = records[records["ruleset_hash"] == rs.ruleset_hash]
    records = records.drop_duplicates("fragment_id", keep="last")
    # global stats = merge of every fragment's persisted sketch state
    frames = [_stats_state_from_bytes(b) for b in records["sketch_state"]
              if b is not None and len(b)]
    global_stats = None
    if frames:
        frames = [f for f in frames if len(f)]
        allp = pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame()
        global_stats = merge_stat_groups(allp) if len(allp) else None

    # cross-fragment checks over the FULL input: project AT THE READ so
    # only (image_id, phash) row-groups leave storage — the bytes column
    # must never be scanned a second time at 100 TB
    full = rd.read_parquet(files, columns=["image_id", "phash"])
    n_rows = full.count()   # parquet metadata only — no data scan
    dup_ids = duplicate_keys(full, "image_id").to_pandas()
    pairs = phash_near_duplicates(
        full, max_distance=neardup_max_distance,
        rows_hint=n_rows).to_pandas()
    orphans = None
    if ref_ids is not None:
        orphans = referential_violations(full, "image_id",
                                         ref_ids).to_pandas()
    drift = None
    if baseline_stats is not None and global_stats is not None:
        drift = drift_report(baseline_stats, global_stats)

    n_rows = int(records["n_rows"].sum())
    n_violations = int(records["n_violations"].sum()) \
        + len(dup_ids) + (len(orphans) if orphans is not None else 0)
    return {
        "ruleset_hash": rs.ruleset_hash,
        "fragments_total": len(files),
        "fragments_skipped": len(done & set(by_fragment)),
        "fragments_validated": len(pending),
        "n_rows": n_rows,
        "n_violations": n_violations,
        "per_keyword": per_keyword,
        "table_pass": n_violations == 0,
        "verdicts": records[["fragment_id", "n_rows", "n_violations",
                             "passed"]].reset_index(drop=True),
        "stats": global_stats.drop(columns=["hll", "tdigest"])
        if global_stats is not None else None,
        "stats_full": global_stats,
        "duplicate_ids": dup_ids,
        "neardup_pairs": pairs,
        "orphans": orphans,
        "drift": drift,
    }
