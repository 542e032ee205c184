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


def _loc_trie_insert(root: dict, segs: list[str], err: dict):
    node = root
    for s in segs:
        node = node.setdefault("children", {}).setdefault(s, {})
    node.setdefault("errors", []).append(err)


def _trie_unit(node: dict, loc: str) -> dict:
    """Trie node → spec output unit, applying the detailed-format
    condensation rules (single-child branch units collapse into the
    child; leaves keep their own error)."""
    children = node.get("children", {})
    own = node.get("errors", [])
    child_units = [_trie_unit(c, f"{loc}/{s}")
                   for s, c in sorted(children.items())]
    if own and not child_units and len(own) == 1:
        u = dict(own[0])
        u["valid"] = False
        return u
    units = [dict(e, valid=False) for e in own] + child_units
    if len(units) == 1 and not own:
        return units[0]  # condensation: single-child branch collapses
    insts = {u.get("instanceLocation", "") for u in units}
    return {"valid": False, "keywordLocation": loc or "",
            "instanceLocation": insts.pop() if len(insts) == 1 else "",
            "errors": units}


def detailed_output(violations: list[dict]) -> dict:
    """Spec "detailed" format (2020-12 §12.4.3): errors arranged by their
    keyword-location hierarchy with trivial branches condensed. Surplus
    over the reference, which emits only "basic"
    (pkg/errors/errors.go:15-22)."""
    if not violations:
        return {"valid": True}
    root: dict = {}
    for v in violations:
        kl = v.get("keyword_location", "") or ""
        segs = [s for s in kl.split("/") if s]
        _loc_trie_insert(root, segs,
                         _error_obj(kl, v.get("instance_location", ""),
                                    v.get("message", "")))
    return _trie_unit(root, "")


def verbose_output(rs, violations: list[dict]) -> dict:
    """Spec "verbose" format: the FULL schema hierarchy for one instance,
    every keyword emitting a unit with its own validity (valid units
    included, unlike basic/detailed). Validity of a node = no violation
    whose keywordLocation sits at or under it."""
    from .model import SchemaNode
    bad_prefixes = sorted({v.get("keyword_location", "") or ""
                           for v in violations})
    by_loc: dict[str, list[dict]] = {}
    for v in violations:
        by_loc.setdefault(v.get("keyword_location", "") or "",
                          []).append(v)

    def invalid_under(loc: str) -> bool:
        return any(p == loc or p.startswith(loc + "/")
                   for p in bad_prefixes)

    def inst_of(loc: str) -> str:
        vs = by_loc.get(loc)
        return vs[0].get("instance_location", "") if vs else ""

    def node_unit(node: SchemaNode) -> dict:
        loc = node.location
        unit: dict = {"valid": not invalid_under(loc),
                      "keywordLocation": loc or "",
                      "instanceLocation": inst_of(loc)}
        kids = []
        for part in node.parts:
            if part.keyword in ("$ref", "$dynamicRef"):
                # violations reached THROUGH a ref carry the TARGET's
                # location (this engine's violation model has no dynamic
                # evaluation path), so a ref leaf reports the target
                # SUBTREE's validity — shared targets referenced from
                # several places therefore all show the failure. Invalid
                # units always carry their errors (§12.4).
                tgt = rs.ref_target(node, part.keyword)
                kl = f"{loc}/{part.keyword}"
                tloc = tgt.location if tgt is not None else None
                sub_errs = [] if tloc is None else \
                    [e for p, vs in by_loc.items()
                     if p == tloc or p.startswith(tloc + "/")
                     for e in vs]
                ku = {"valid": not sub_errs, "keywordLocation": kl,
                      "instanceLocation":
                          sub_errs[0].get("instance_location", "")
                          if sub_errs else ""}
                if sub_errs:
                    ku["errors"] = [
                        _error_obj(e.get("keyword_location", ""),
                                   e.get("instance_location", ""),
                                   e.get("message", "")) | {"valid": False}
                        for e in sub_errs]
                kids.append(ku)
                continue
            if part.keyword.startswith("$") and part.keyword != "$defs":
                continue
            kl = f"{loc}/{part.keyword}"
            subs = []
            if isinstance(part.value, SchemaNode):
                subs = [part.value]
            elif isinstance(part.value, list):
                subs = [x for x in part.value
                        if isinstance(x, SchemaNode)]
            elif isinstance(part.value, dict):
                subs = [x for x in part.value.values()
                        if isinstance(x, SchemaNode)]
            if subs:
                ku = {"valid": not invalid_under(kl),
                      "keywordLocation": kl,
                      "instanceLocation": inst_of(kl),
                      "errors" if invalid_under(kl) else "annotations":
                          [node_unit(s) for s in subs]}
                kids.append(ku)
            else:
                errs = by_loc.get(kl, [])
                ku = {"valid": not errs, "keywordLocation": kl,
                      "instanceLocation": inst_of(kl)}
                if errs:
                    ku["errors"] = [
                        _error_obj(kl, e.get("instance_location", ""),
                                   e.get("message", "")) | {"valid": False}
                        for e in errs]
                kids.append(ku)
        if kids:
            unit["errors" if not unit["valid"] else "annotations"] = kids
        return unit

    return node_unit(rs.root)
