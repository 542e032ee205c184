#!/usr/bin/env python
"""`ray job submit` entrypoint for the checkpointed flagship pipeline
(north rule: "runs via ray job submit on fixed-size multi-node
clusters").  Submit against a running cluster:

    ray job submit --working-dir . -- \
        python job_validate.py --input /data/images \
            --checkpoint-dir /ckpt/run1 [--ruleset rules.json] \
            [--ref-ids /data/ref_ids.parquet] [--no-decode] \
            [--check-phash] [--wave-size 64]

The job connects to the submitting cluster (``ray.init(address="auto")``
inside the job context), streams every parquet fragment under --input
through rule + decode validation, cross-fragment uniqueness /
referential / phash-near-dup checks and sketch stats, checkpointing
per-fragment lineage (fragment, ruleset hash, sketch state) so a killed
job resubmitted with the SAME --checkpoint-dir resumes where it died.
Prints the global report as one JSON line (the job driver log is the
report channel; violation rows persist under the checkpoint dir).

This is a CLI entry point and therefore OWNS its Ray session (the
library itself never calls ray.init — driver contract)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--input", required=True,
                    help="directory of parquet fragments (the Lance-style"
                         " image+caption table: image_id, bytes, w, h,"
                         " fmt, caption, phash)")
    ap.add_argument("--checkpoint-dir", required=True,
                    help="lineage + resume state; reuse to resume a"
                         " killed run")
    ap.add_argument("--ruleset", default=None,
                    help="JSON rule-set file (default: built-in image"
                         " ruleset)")
    ap.add_argument("--ref-ids", default=None,
                    help="parquet of reference image_ids for the"
                         " referential check")
    ap.add_argument("--wave-size", type=int, default=64,
                    help="fragments per checkpoint wave")
    ap.add_argument("--no-decode", action="store_true",
                    help="skip the decode-structural stage")
    ap.add_argument("--check-phash", action="store_true",
                    help="recompute + verify the stored phash per row")
    ap.add_argument("--baseline-stats", default=None,
                    help="parquet of a previous run's full stats table"
                         " (written by --save-stats) — enables the"
                         " KS/PSI drift report against it")
    ap.add_argument("--save-stats", default=None,
                    help="write this run's full stats table (incl."
                         " binary sketch state) as parquet, usable as"
                         " the next run's --baseline-stats")
    args = ap.parse_args(argv)

    import ray
    if not ray.is_initialized():
        import os
        addr = os.environ.get("RAY_ADDRESS")
        if addr:
            # inside `ray job submit` (or with RAY_ADDRESS set) this
            # attaches to the submitting cluster
            ray.init(address=addr, ignore_reinit_error=True)
        else:
            try:           # a running local cluster, if there is one
                ray.init(address="auto", ignore_reinit_error=True)
            except ConnectionError:
                ray.init(ignore_reinit_error=True)  # standalone session

    ruleset = None
    if args.ruleset:
        with open(args.ruleset) as f:
            ruleset = json.load(f)
    ref_ids = None
    if args.ref_ids:
        import pyarrow.parquet as pq
        ref_ids = pq.read_table(args.ref_ids).column(0)

    baseline = None
    if args.baseline_stats:
        import pandas as pd
        baseline = pd.read_parquet(args.baseline_stats)

    from jsonschema_ray.pipelines.validate_images import \
        validate_images_pipeline
    report = validate_images_pipeline(
        args.input, args.checkpoint_dir, ruleset=ruleset, ref_ids=ref_ids,
        baseline_stats=baseline, wave_size=args.wave_size,
        decode=not args.no_decode, check_phash=args.check_phash)

    if args.save_stats and report.get("stats_full") is not None:
        report["stats_full"].to_parquet(args.save_stats, index=False)

    def jsonable(v):
        import math

        import numpy as np
        import pandas as pd
        if isinstance(v, pd.DataFrame):
            drop = [c for c in v.columns
                    if v[c].map(lambda x: isinstance(x, bytes)).any()]
            v = v.drop(columns=drop).to_dict("records")
        if isinstance(v, dict):
            return {k: jsonable(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return [jsonable(x) for x in v]
        # the report line must be RFC-8259 JSON: bare NaN/inf tokens
        # (string-column percentile stats) and pandas NA (nullable-Int64
        # min/max) both serialize as null, not as "NaN"/"<NA>" strings
        if v is None or (isinstance(v, float) and not math.isfinite(v)):
            return None
        try:
            import pandas as pd
            if v is pd.NA or (not isinstance(v, (str, bytes))
                              and pd.isna(v)):
                return None
        except (TypeError, ValueError):
            pass
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            f = float(v)
            return f if math.isfinite(f) else None
        if isinstance(v, (np.bool_,)):
            return bool(v)
        return v

    # stats_full carries binary sketch state (persisted in the
    # checkpoint records and exportable via --save-stats) — the job log
    # gets the readable summary
    print(json.dumps({k: jsonable(v) for k, v in report.items()
                      if k != "stats_full"}, allow_nan=False, default=str))
    ray.shutdown()
    return 0 if report.get("table_pass", False) else 1


if __name__ == "__main__":
    sys.exit(main())
