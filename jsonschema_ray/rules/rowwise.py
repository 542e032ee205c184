"""Pure-Python per-row evaluator: the SEMANTIC ORACLE for the vectorized
batch engine (vector.py), mirroring the reference's recursive tree walk
(pkg/types/schema/schema.go:796-819 ValidateSubSchema; keyword validators
internal/validator/validator.go). Used in tests to cross-check the
vectorized engine on random rows, and for rare non-columnar instances.

Instance model: a row is a dict of column→value. A Python ``None`` (Arrow
null) is treated as an ABSENT member — leaf assertions skip it, ``required``
fails on it. This is the tabular analog of JSON "property not present"
(deviation from JSON null documented in SURVEY §1.4).

Semantics reproduced exactly (cited):
- type: integer accepts integral floats (validator.go:797-809)
- numeric comparisons coerce numeric strings (instanceFloat,
  validator.go:1275-1295)
- string lengths are code points (utf8.RuneCountInString, validator.go:977)
- contains with minContains:0 in the same node is always true
  (validator.go:386-402)
- anyOf evaluates ALL subschemas (validator.go:89-121); oneOf requires
  exactly one (validator.go:124-154)
- if/then/else gating via condition note (validator.go:178-233)
- unevaluatedProperties/Items consume evaluation notes propagated from
  passing in-place applicators (validator.go:647-750)
- depth cap against cyclic schemas (schema.go:1087-1104)
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Any, Optional

from . import messages as M
from .model import MAX_DEPTH, RuleSet, SchemaNode


@dataclass(frozen=True)
class Violation:
    keyword: str
    keyword_location: str
    instance_location: str
    message: str
    offending: str

    def as_tuple(self):
        return (self.instance_location, self.keyword, self.keyword_location,
                self.message, self.offending)


def json_kind(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    import datetime as _dt
    if isinstance(v, (_dt.datetime, _dt.date)):
        return "datetime"  # timestamp/date columns (vector.arrow_kind)
    if isinstance(v, int):
        return "integer"
    if isinstance(v, float):
        return "number"
    if isinstance(v, str):
        return "string"
    import decimal
    if isinstance(v, decimal.Decimal):
        return "number"  # decimal128 columns (vector arrow_kind parity)
    if isinstance(v, (bytes, bytearray)):
        return "binary"
    if isinstance(v, (list, tuple)):
        return "array"
    if isinstance(v, dict):
        return "object"
    try:  # numpy scalars
        import numpy as np
        if isinstance(v, np.bool_):
            return "boolean"
        if isinstance(v, np.integer):
            return "integer"
        if isinstance(v, np.floating):
            return "number"
        if isinstance(v, np.ndarray):
            return "array"
        if isinstance(v, np.str_):
            return "string"
    except ImportError:  # pragma: no cover
        pass
    return "other"


def kind_matches(kind: str, name: str, v: Any) -> bool:
    """type-name match (ValidateType dual dispatch analog,
    validator.go:753-868)."""
    if name == kind:
        return True
    if name == "number" and kind == "integer":
        return True
    if name == "string" and kind == "datetime":
        return True  # a JSON date-time instance is a string
    if name == "integer" and kind == "number":
        # integral floats are integers (validator.go:797-809)
        try:
            return float(v) == int(v) and math.isfinite(float(v))
        except (OverflowError, ValueError):
            return False
    return False


def instance_float(v: Any) -> Optional[float]:
    """float64 coercion incl. numeric strings (validator.go:1275-1295);
    booleans excluded."""
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    import datetime as _dt
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:  # naive timestamps are UTC (arrow convention)
            v = v.replace(tzinfo=_dt.timezone.utc)
        return v.timestamp() * 1e6  # epoch micros, like View.numeric
    if isinstance(v, _dt.date):
        d = _dt.datetime.combine(v, _dt.time(), tzinfo=_dt.timezone.utc)
        return d.timestamp() * 1e6
    if isinstance(v, str):
        # mirror the vector engine's pd.to_numeric gate: underscore
        # separators and textual NaN are NOT numeric strings
        if "_" in v:
            return None
        try:
            f = float(v)
        except ValueError:
            return None
        import math
        return None if math.isnan(f) else f
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    try:
        import numpy as np
        if isinstance(v, (np.integer, np.floating)):
            return float(v)
    except ImportError:  # pragma: no cover
        pass
    return None


def deep_equal(a: Any, b: Any) -> bool:
    """JSON-style deep equality (DeepEqual analog, validator.go:871-898) —
    1 == 1.0 but true != 1."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(deep_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(deep_equal(v, b[k])
                                            for k, v in a.items())
    return a == b


def _present_members(v: dict) -> dict:
    """null members are absent (tabular deviation; see module docstring)."""
    return {k: x for k, x in v.items() if x is not None}


def map_cell_to_object(v: Any) -> Any:
    """``pa.map_`` cells surface from ``to_pylist`` as ``[(key, value),
    ...]`` TUPLE pairs; JSON-wise they are objects. Plain list columns
    yield lists (never tuples), so tuple pairs unambiguously identify map
    cells. An EMPTY map is indistinguishable from an empty array in this
    schema-LESS view — use :func:`rows_from_table` (schema-driven) when
    the Arrow table is available; it converts empty maps to ``{}``."""
    if isinstance(v, list) and v and all(
            isinstance(e, tuple) and len(e) == 2 and isinstance(e[0], str)
            for e in v):
        return dict(v)
    return v


def _value_from_typed(v: Any, typ) -> Any:
    """to_pylist value + its Arrow type → JSON-like instance value: map
    cells become dicts (EMPTY maps included — the type disambiguates
    what ``to_pylist`` alone cannot), recursively through lists/structs."""
    import pyarrow as _pa
    if v is None:
        return None
    if _pa.types.is_map(typ):
        return {k: _value_from_typed(x, typ.item_type) for k, x in v}
    if _pa.types.is_list(typ) or _pa.types.is_large_list(typ):
        return [_value_from_typed(x, typ.value_type) for x in v]
    if _pa.types.is_struct(typ):
        return {f.name: _value_from_typed(v.get(f.name), f.type)
                for f in typ}
    return v


def rows_from_table(tab) -> list:
    """Arrow table → JSON-like instance dicts with SCHEMA-DRIVEN map
    conversion (resolves the empty-map/empty-array to_pylist ambiguity;
    see map_cell_to_object)."""
    types = [tab.schema.field(c).type for c in tab.column_names]
    cols = [tab.column(c).to_pylist() for c in tab.column_names]
    return [{name: _value_from_typed(col[i], typ)
             for name, col, typ in zip(tab.column_names, cols, types)}
            for i in range(tab.num_rows)]


class RowEvaluator:
    """Validate one instance against a compiled RuleSet.

    ``validate(instance)`` returns a list of Violations (empty = valid), the
    analog of Schema.Validate (schema.go:711-713) with
    ValidateOpts{ValidateFormat: true} by default (schema.go:717-748).
    """

    def __init__(self, rs: RuleSet, validate_format: bool = True,
                 max_depth: int = None):
        self.rs = rs
        self.validate_format = validate_format
        self._max_depth = max_depth
        self._regex_cache: dict[str, re.Pattern] = {}
        from ..formats import registry as format_registry
        self.formats = format_registry

    def _re(self, pattern: str) -> re.Pattern:
        # pre-compiled cache — fixes the reference's per-call compilation
        # TODO (validator.go:542, 1008)
        p = self._regex_cache.get(pattern)
        if p is None:
            # RE2-ish compile: ASCII perl classes, Unicode (?i) folding
            from .model import compile_re2ish
            p = self._regex_cache[pattern] = compile_re2ish(pattern)
        return p

    def validate(self, instance: Any) -> list[Violation]:
        # per-run dynamic-anchor scope (VersionData analog,
        # pkg/draft202012/validate.go:122-158)
        self._dyn: dict = {}
        ok, errs, _ann = self._eval(self.rs.root, instance, "", "", 0)
        return errs

    # ------------------------------------------------------------------
    def _eval(self, node: SchemaNode, inst: Any, kw_loc: str, inst_loc: str,
              depth: int) -> tuple[bool, list[Violation], dict]:
        """Returns (ok, violations, annotations). annotations:
        {'keys': set of evaluated member names, 'items': set of evaluated
        element indices} — the Notes analog (pkg/notes/notes.go:38-103)."""
        if depth > (self._max_depth or MAX_DEPTH):
            raise RecursionError(f"schema depth cap exceeded at {kw_loc}")
        # entering a schema resource records its $dynamicAnchors first-wins
        # (record/clear anchor parts analog, builder.go:180-211)
        dyn = getattr(self, "_dyn", None)
        inserted = []
        if dyn is not None and node.resource_anchors:
            for k, v in node.resource_anchors.items():
                if k not in dyn:
                    dyn[k] = v
                    inserted.append(k)
        try:
            return self._eval_inner(node, inst, kw_loc, inst_loc, depth)
        finally:
            for k in inserted:
                dyn.pop(k, None)

    def _eval_inner(self, node: SchemaNode, inst: Any, kw_loc: str,
                    inst_loc: str, depth: int):
        inst = map_cell_to_object(inst)  # pa.map_ cells ARE objects
        ann: dict = {"keys": set(), "items": set()}
        if node.bool_value is not None:
            if node.bool_value:
                return True, [], ann
            v = Violation("$bool", kw_loc, inst_loc, M.message("$bool", None),
                          M.fmt_value(inst))
            return False, [v], ann

        kind = json_kind(inst)
        errs: list[Violation] = []
        notes: dict = {}  # node-local cross-keyword notes
        ok = True

        # whole-row instances render as the constant "object" — the batch
        # engine never serializes full rows into violation output (a row may
        # carry megabytes of image bytes)
        inst_repr = "object" if kind == "object" and inst_loc == "" \
            else M.fmt_value(inst)

        def fail(keyword: str, msg: str, at: str = None, off: Any = "~inst~"):
            nonlocal ok
            ok = False
            errs.append(Violation(
                keyword, f"{kw_loc}/{keyword}" if at is None else at,
                inst_loc, msg,
                inst_repr if off == "~inst~" else off))

        for part in node.parts:
            kw, arg = part.keyword, part.value
            kloc = f"{kw_loc}/{kw}"
            if kw == "type":
                if not any(kind_matches(kind, n, inst) for n in arg):
                    fail(kw, M.message(kw, arg))
            elif kw == "enum":
                if not any(deep_equal(inst, e) for e in arg):
                    fail(kw, M.message(kw, arg))
            elif kw == "const":
                if not deep_equal(inst, arg):
                    fail(kw, M.message(kw, arg))
            elif kw == "multipleOf":
                f = instance_float(inst)
                if f is not None:
                    quo = f / arg
                    # validator.go:901-913: fails on inf/NaN quotient or
                    # fractional quotient
                    if not math.isfinite(quo) or quo != math.trunc(quo):
                        fail(kw, M.message(kw, arg))
            elif kw == "maximum":
                f = instance_float(inst)
                if f is not None and f > arg:
                    fail(kw, M.message(kw, arg))
            elif kw == "exclusiveMaximum":
                f = instance_float(inst)
                if f is not None and f >= arg:
                    fail(kw, M.message(kw, arg))
            elif kw == "minimum":
                f = instance_float(inst)
                if f is not None and f < arg:
                    fail(kw, M.message(kw, arg))
            elif kw == "exclusiveMinimum":
                f = instance_float(inst)
                if f is not None and f <= arg:
                    fail(kw, M.message(kw, arg))
            elif kw == "maxLength":
                if kind == "string" and len(inst) > arg:
                    fail(kw, M.message(kw, arg))
            elif kw == "minLength":
                if kind == "string" and len(inst) < arg:
                    fail(kw, M.message(kw, arg))
            elif kw == "pattern":
                if kind == "string" and not self._re(arg).search(inst):
                    fail(kw, M.message(kw, arg))
            elif kw == "maxItems":
                if kind == "array" and len(inst) > arg:
                    fail(kw, M.message(kw, arg))
            elif kw == "minItems":
                if kind == "array" and len(inst) < arg:
                    fail(kw, M.message(kw, arg))
            elif kw == "uniqueItems":
                if kind == "array" and arg:
                    # hash-set fast path / O(n²) DeepEqual slow path
                    # (validator.go:1067-1111)
                    seen = []
                    dup = False
                    for e in inst:
                        if any(deep_equal(e, s) for s in seen):
                            dup = True
                            break
                        seen.append(e)
                    if dup:
                        fail(kw, M.message(kw, arg))
            elif kw == "maxProperties":
                if kind == "object":
                    c = len(_present_members(inst))
                    if c > arg:
                        fail(kw, M.message(kw, arg), off=str(c))
            elif kw == "minProperties":
                if kind == "object":
                    c = len(_present_members(inst))
                    if c < arg:
                        fail(kw, M.message(kw, arg), off=str(c))
            elif kw == "required":
                if kind == "object":
                    pres = _present_members(inst)
                    for name in arg:
                        if name not in pres:
                            fail(kw, M.required_message(name), off="null")
            elif kw == "dependentRequired":
                if kind == "object":
                    pres = _present_members(inst)
                    for key, names in arg.items():
                        if key in pres:
                            for n in names:
                                if n not in pres:
                                    fail(kw,
                                         M.dependent_required_message(key, n),
                                         off="null")
            elif kw == "format":
                if (self.validate_format and kind == "string"):
                    fn = self.formats.get(arg)
                    # unknown formats pass (validator.go:1247-1265)
                    if fn is not None and not fn(inst):
                        fail(kw, M.message(kw, arg))
            elif kw in ("allOf", "anyOf", "oneOf"):
                subs = []
                for i, s in enumerate(arg):
                    subs.append(self._eval(s, inst, f"{kloc}/{i}", inst_loc,
                                           depth + 1))
                npass = sum(1 for s_ok, _, _ in subs if s_ok)
                if kw == "allOf":
                    if npass < len(arg):
                        ok = False
                        for s_ok, s_errs, _ in subs:
                            errs.extend(s_errs)
                    else:
                        for _, _, a in subs:
                            ann["keys"] |= a["keys"]
                            ann["items"] |= a["items"]
                elif kw == "anyOf":
                    if npass == 0:
                        fail(kw, M.message(kw, arg))
                    else:
                        for s_ok, _, a in subs:
                            if s_ok:
                                ann["keys"] |= a["keys"]
                                ann["items"] |= a["items"]
                else:  # oneOf
                    if npass == 0:
                        fail("oneOf", M.MESSAGES["oneOf:none"](arg), at=kloc)
                    elif npass > 1:
                        fail("oneOf", M.MESSAGES["oneOf:multi"](arg), at=kloc)
                    else:
                        for s_ok, _, a in subs:
                            if s_ok:
                                ann["keys"] |= a["keys"]
                                ann["items"] |= a["items"]
            elif kw == "not":
                s_ok, _, _ = self._eval(arg, inst, kloc, inst_loc, depth + 1)
                if s_ok:
                    fail(kw, M.message(kw, arg))
            elif kw == "if":
                s_ok, _, a = self._eval(arg, inst, kloc, inst_loc, depth + 1)
                notes["if"] = s_ok  # bool note (validator.go:178-233)
                if s_ok:
                    ann["keys"] |= a["keys"]
                    ann["items"] |= a["items"]
            elif kw in ("then", "else"):
                cond = notes.get("if")
                if cond is not None and (cond if kw == "then" else not cond):
                    s_ok, s_errs, a = self._eval(arg, inst, kloc, inst_loc,
                                                 depth + 1)
                    if not s_ok:
                        ok = False
                        errs.extend(s_errs)
                    else:
                        ann["keys"] |= a["keys"]
                        ann["items"] |= a["items"]
            elif kw == "dependentSchemas" or (kw == "dependencies"
                                              and isinstance(arg, dict)):
                if kind == "object":
                    pres = _present_members(inst)
                    for key, sub in arg.items():
                        if key not in pres:
                            continue
                        if isinstance(sub, list):  # dependencies string form
                            for n in sub:
                                if n not in pres:
                                    fail("dependencies",
                                         M.dependent_required_message(key, n),
                                         off="null")
                            continue
                        s_ok, s_errs, a = self._eval(
                            sub, inst, f"{kloc}/{_esc(key)}", inst_loc,
                            depth + 1)
                        if not s_ok:
                            ok = False
                            errs.extend(s_errs)
                        else:
                            ann["keys"] |= a["keys"]
                            ann["items"] |= a["items"]
            elif kw == "properties":
                if kind == "object":
                    pres = _present_members(inst)
                    for name, sub in arg.items():
                        if name not in pres:
                            continue
                        notes.setdefault("claimed_keys", set()).add(name)
                        ann["keys"].add(name)
                        s_ok, s_errs, _ = self._eval(
                            sub, pres[name], f"{kloc}/{_esc(name)}",
                            f"{inst_loc}/{_esc(name)}", depth + 1)
                        if not s_ok:
                            ok = False
                            errs.extend(s_errs)
            elif kw == "patternProperties":
                if kind == "object":
                    pres = _present_members(inst)
                    for pat, sub in arg.items():
                        rex = self._re(pat)
                        for name, v in pres.items():
                            if rex.search(name):
                                notes.setdefault("claimed_keys",
                                                 set()).add(name)
                                ann["keys"].add(name)
                                s_ok, s_errs, _ = self._eval(
                                    sub, v, f"{kloc}/{_esc(pat)}",
                                    f"{inst_loc}/{_esc(name)}", depth + 1)
                                if not s_ok:
                                    ok = False
                                    errs.extend(s_errs)
            elif kw == "additionalProperties":
                if kind == "object":
                    pres = _present_members(inst)
                    claimed = notes.get("claimed_keys", set())
                    for name, v in pres.items():
                        if name in claimed:
                            continue
                        ann["keys"].add(name)
                        s_ok, s_errs, _ = self._eval(
                            arg, v, kloc, f"{inst_loc}/{_esc(name)}",
                            depth + 1)
                        if not s_ok:
                            ok = False
                            # message rewrite (validator.go:589-629)
                            errs.append(Violation(
                                "additionalProperties", kloc,
                                f"{inst_loc}/{_esc(name)}",
                                M.unknown_property_message(name),
                                M.fmt_value(v)))
            elif kw == "propertyNames":
                if kind == "object":
                    for name in _present_members(inst):
                        s_ok, _, _ = self._eval(arg, name, kloc, inst_loc,
                                                depth + 1)
                        if not s_ok:
                            fail("propertyNames",
                                 M.property_names_message(name), at=kloc,
                                 off=name)
            elif kw == "prefixItems":
                if kind == "array":
                    for i, sub in enumerate(arg):
                        if i >= len(inst):
                            break
                        notes["prefix_len"] = i + 1
                        ann["items"].add(i)
                        s_ok, s_errs, _ = self._eval(
                            sub, inst[i], f"{kloc}/{i}", f"{inst_loc}/{i}",
                            depth + 1)
                        if not s_ok:
                            ok = False
                            errs.extend(s_errs)
            elif kw == "items":
                if kind == "array":
                    start = notes.get("prefix_len", 0)
                    for i in range(start, len(inst)):
                        ann["items"].add(i)
                        s_ok, s_errs, _ = self._eval(
                            arg, inst[i], kloc, f"{inst_loc}/{i}", depth + 1)
                        if not s_ok:
                            ok = False
                            errs.extend(s_errs)
            elif kw == "contains":
                if kind == "array":
                    matched = [i for i, e in enumerate(inst)
                               if self._eval(arg, e, kloc, f"{inst_loc}/{i}",
                                             depth + 1)[0]]
                    notes["contains_count"] = len(matched)
                    ann["items"] |= set(matched)
                    min_c = node.get("minContains")
                    # minContains:0 makes contains always-true
                    # (validator.go:386-402)
                    if not matched and min_c != 0:
                        fail(kw, M.message(kw, arg))
            elif kw == "maxContains":
                c = notes.get("contains_count")
                if kind == "array" and c is not None and c > arg:
                    fail(kw, M.message(kw, arg), off=str(c))
            elif kw == "minContains":
                c = notes.get("contains_count")
                if kind == "array" and c is not None and c < arg:
                    fail(kw, M.message(kw, arg), off=str(c))
            elif kw in ("$ref", "$dynamicRef"):
                tgt = self.rs.ref_target(node, kw)
                if kw == "$dynamicRef" and isinstance(arg, str) \
                        and "#" in arg:
                    frag = arg.split("#", 1)[1]
                    # any anchor-fragment form, bookending-gated (see
                    # vector.py — the two engines must share the rule)
                    if frag and not frag.startswith("/") \
                            and tgt is not None \
                            and tgt.get("$dynamicAnchor") == frag:
                        dyn = getattr(self, "_dyn", None) or {}
                        tgt = dyn.get(frag, tgt)
                if tgt is not None:
                    s_ok, s_errs, a = self._eval(tgt, inst, tgt.location,
                                                 inst_loc, depth + 1)
                    if not s_ok:
                        ok = False
                        errs.extend(s_errs)
                    else:
                        ann["keys"] |= a["keys"]
                        ann["items"] |= a["items"]
            elif kw == "unevaluatedItems":
                if kind == "array":
                    seen = ann["items"]
                    for i in range(len(inst)):
                        if i in seen:
                            continue
                        ann["items"].add(i)
                        s_ok, _, _ = self._eval(arg, inst[i], kloc,
                                                f"{inst_loc}/{i}", depth + 1)
                        if not s_ok:
                            ok = False
                            errs.append(Violation(
                                "unevaluatedItems", kloc,
                                f"{inst_loc}/{i}",
                                M.message("unevaluatedItems", arg),
                                M.fmt_value(inst[i])))
            elif kw == "unevaluatedProperties":
                if kind == "object":
                    pres = _present_members(inst)
                    seen = ann["keys"]
                    for name, v in pres.items():
                        if name in seen:
                            continue
                        ann["keys"].add(name)
                        s_ok, _, _ = self._eval(
                            arg, v, kloc, f"{inst_loc}/{_esc(name)}",
                            depth + 1)
                        if not s_ok:
                            ok = False
                            errs.append(Violation(
                                "unevaluatedProperties", kloc,
                                f"{inst_loc}/{_esc(name)}",
                                M.unevaluated_property_message(name),
                                M.fmt_value(v)))
            else:
                from .extensions import lookup_keyword
                custom = lookup_keyword(kw)
                if custom is not None and inst is not None \
                        and kind != "object":
                    if not custom[0](inst, arg):
                        fail(kw, M.message(kw, arg))
                # else: annotations / unknown keywords — always valid
                # (schema.go:521-531)

        return ok, errs, ann


def _esc(token: str) -> str:
    return token.replace("~", "~0").replace("/", "~1")
