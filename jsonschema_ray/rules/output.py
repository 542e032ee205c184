"""Draft 2020-12 output formats over violation tables.

The reference's error model IS the spec's "basic" output unit: each
ValidationError marshals as {"error", "keywordLocation",
"instanceLocation"} (pkg/errors/errors.go:15-22, citing the output-format
section of the spec), and ValidationErrors joins them. Here the same two
formats are produced from the engine's violation TABLE:

- ``flag_output``: {"valid": bool} per row (spec "flag" format)
- ``basic_output``: {"valid", "errors": [...]} per row, errors carrying
  the spec field names

Both operate on a batch's violations at once (group by row key), so a
pipeline can emit spec-shaped JSON per instance with one map_batches.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np
import pyarrow as pa


def flag_output(valid: bool) -> dict:
    return {"valid": bool(valid)}


def _error_obj(keyword_location: str, instance_location: str,
               message: str) -> dict:
    return {"keywordLocation": keyword_location or "#",
            "instanceLocation": instance_location,
            "error": message}


def basic_output(violations: list[dict]) -> dict:
    """One instance's violations (dicts with keyword_location /
    instance_location / message keys, i.e. the engine's violation-table
    rows) → the spec "basic" output unit."""
    if not violations:
        return {"valid": True}
    return {"valid": False,
            "errors": [_error_obj(v.get("keyword_location", ""),
                                  v.get("instance_location", ""),
                                  v.get("message", "")) for v in violations]}


def basic_output_column(table: pa.Table, violations: pa.Table,
                        key_columns: list[str],
                        out_col: str = "validation_output") -> pa.Table:
    """Append a spec-"basic" JSON string column to ``table``: one output
    document per row, assembled from the ``violations`` table (the
    BatchValidator.violations shape, keyed by ``key_columns``).

    Vector shape: one hash join of row keys against violation keys (no
    per-row scan of the violation table)."""
    import pandas as pd
    n = table.num_rows
    docs: list[Optional[str]] = [json.dumps({"valid": True})] * n
    if violations.num_rows:
        vdf = violations.to_pandas()
        tdf = table.select(key_columns).to_pandas()
        tdf["_row"] = np.arange(n)
        joined = vdf.merge(tdf, on=key_columns, how="inner")
        for row, grp in joined.groupby("_row"):
            docs[int(row)] = json.dumps(basic_output(
                grp[["keyword_location", "instance_location",
                     "message"]].to_dict("records")),
                sort_keys=True)
    return table.append_column(out_col, pa.array(docs, type=pa.string()))
