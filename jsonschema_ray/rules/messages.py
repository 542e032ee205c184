"""Deterministic violation message templates, shared by the row-wise oracle
evaluator and the vectorized batch engine — and hand-copyable into DuckDB
oracle SQL (the driver compares exact strings).

The reference's error model is ValidationError{Message, KeywordLocation,
InstanceLocation} (pkg/errors/errors.go:15-22); messages there are free-form
`fmt.Errorf` strings. We fix one constant template per (keyword, argument) so
a violation row is reproducible from SQL."""

from __future__ import annotations

import json
from typing import Any


def fmt_arg(arg: Any) -> str:
    return json.dumps(arg, sort_keys=True, ensure_ascii=False)


def fmt_value(v: Any) -> str:
    """Offending-value rendering. Chosen to match DuckDB's CAST(x AS VARCHAR)
    for the column types used in oracle queries (int → '46', double →
    '46.0', string → itself)."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return str(v)  # 46.0 -> '46.0', matches DuckDB double cast
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, (bytes, bytearray)):
        return f"bytes[{len(v)}]"
    if isinstance(v, (list, tuple)):
        return json.dumps(_jsonable(list(v)), ensure_ascii=False,
                          default=str)
    if isinstance(v, dict):
        return json.dumps(_jsonable(v), sort_keys=True, ensure_ascii=False,
                          default=str)
    return str(v)


def _jsonable(v: Any) -> Any:
    """Recursively turn ``pa.map_`` pair-lists (``[(str, val), ...]``)
    into dicts so nested map values render as JSON objects, not arrays
    of pairs (matches the row-wise engine's converted instances)."""
    if isinstance(v, (list, tuple)):
        if v and all(isinstance(e, tuple) and len(e) == 2
                     and isinstance(e[0], str) for e in v):
            return {k: _jsonable(x) for k, x in v}
        return [_jsonable(x) for x in v]
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    return v


MESSAGES = {
    "type": lambda a: f"type: expected {'/'.join(a)}",
    "enum": lambda a: "enum: value not in enumeration",
    "const": lambda a: "const: value mismatch",
    "multipleOf": lambda a: f"multipleOf: not a multiple of {fmt_arg(a)}",
    "maximum": lambda a: f"maximum: value > {fmt_arg(a)}",
    "exclusiveMaximum": lambda a: f"exclusiveMaximum: value >= {fmt_arg(a)}",
    "minimum": lambda a: f"minimum: value < {fmt_arg(a)}",
    "exclusiveMinimum": lambda a: f"exclusiveMinimum: value <= {fmt_arg(a)}",
    "maxLength": lambda a: f"maxLength: length > {a}",
    "minLength": lambda a: f"minLength: length < {a}",
    "pattern": lambda a: f"pattern: does not match {fmt_arg(a)}",
    "maxItems": lambda a: f"maxItems: more than {a} items",
    "minItems": lambda a: f"minItems: fewer than {a} items",
    "uniqueItems": lambda a: "uniqueItems: duplicate items",
    "maxProperties": lambda a: f"maxProperties: more than {a} properties",
    "minProperties": lambda a: f"minProperties: fewer than {a} properties",
    "format": lambda a: f"format: invalid {a}",
    "anyOf": lambda a: "anyOf: no subschema matched",
    "oneOf:none": lambda a: "oneOf: no subschema matched",
    "oneOf:multi": lambda a: "oneOf: multiple subschemas matched",
    "not": lambda a: "not: subschema matched",
    "contains": lambda a: "contains: no matching items",
    "maxContains": lambda a: f"maxContains: more than {a} matching items",
    "minContains": lambda a: f"minContains: fewer than {a} matching items",
    "$bool": lambda a: "false schema: never valid",
}


def message(keyword: str, arg: Any) -> str:
    f = MESSAGES.get(keyword)
    return f(arg) if f else f"{keyword}: violated"


def required_message(name: str) -> str:
    return f"required: missing {name}"


def dependent_required_message(key: str, name: str) -> str:
    return f"dependentRequired: {key} requires {name}"


def unknown_property_message(name: str) -> str:
    # reference rewrites additionalProperties failures to `unknown property %q`
    # (internal/validator/validator.go:589-629)
    return f'unknown property "{name}"'


def unevaluated_property_message(name: str) -> str:
    return f'unevaluated property "{name}"'


def property_names_message(name: str) -> str:
    return f'propertyNames: invalid name "{name}"'
