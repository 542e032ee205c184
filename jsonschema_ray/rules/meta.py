"""Meta-validation: validate a RULE DOCUMENT with the engine itself.

The reference embeds the nine draft-2020-12 meta-schema JSONs and validates
schemas against them (internal/metaschema/metaschema.go:25-53,
pkg/draft202012/meta.go:15-23). Here the meta-rule-set is written in the
engine's own rule language and evaluated by the row-wise evaluator (rule
documents are nested JSON values, exactly what RowEvaluator walks), so
"validate the rule set before running it" needs no second machinery.

``check_ruleset(doc)`` returns meta-violations (empty = structurally
valid); ``parse_ruleset`` remains the authoritative type-checker (it
rejects everything the meta rule set does and more), so this is the
user-facing diagnostic surface: violations carry JSON-pointer locations
into the rule document.
"""

from __future__ import annotations

from typing import Any

from .model import parse_ruleset
from .rowwise import RowEvaluator, Violation

_NONNEG_INT = {"type": "integer", "minimum": 0}
_TEMPORAL_STR = {"type": "string",
                 "pattern": r"^(\d{4}-\d{2}-\d{2}|\d{8})"}
# a subschema position is "boolean or schema object": the root meta node's
# own `anyOf [boolean, object]` handles the kind, so a bare recursive $ref
# suffices — and (unlike an anyOf wrapper, which suppresses child errors)
# keeps nested violations precisely located
_SCHEMA_REF = {"$ref": "#"}
# patternProperties (match-all) rather than additionalProperties: the
# latter rewrites child failures to 'unknown property' (validator.go:
# 589-629), which would hide nested meta-violations
_SCHEMA_MAP = {"type": "object", "patternProperties": {"": {"$ref": "#"}}}
_SCHEMA_ARRAY = {"type": "array", "items": {"$ref": "#"}, "minItems": 1}

# The meta rule set — mirrors the draft-2020-12 vocabulary argument types
# (pkg/types/arg_type/arg_type.go:6-19) for every keyword the engine
# evaluates. Unknown keywords are tolerated (schema.go:521-531), so the
# meta rule set leaves the object OPEN.
META_RULESET_DOC: dict[str, Any] = {
    "anyOf": [{"type": "boolean"}, {"type": "object"}],
    "properties": {
        "type": {"anyOf": [
            {"enum": ["null", "boolean", "object", "array", "string",
                      "number", "integer", "binary"]},
            {"type": "array",
             "items": {"enum": ["null", "boolean", "object", "array",
                                "string", "number", "integer", "binary"]},
             "minItems": 1}]},
        "enum": {"type": "array"},  # parse accepts empty enums
        "multipleOf": {"type": "number", "exclusiveMinimum": 0},
        # number OR an RFC3339-shaped string: the engine composes
        # temporal bounds as date / date-time strings (model._to_float) —
        # meta must not flag what parse_ruleset accepts, but still
        # catches plainly non-numeric strings
        "maximum": {"anyOf": [{"type": "number"}, _TEMPORAL_STR]},
        "minimum": {"anyOf": [{"type": "number"}, _TEMPORAL_STR]},
        "exclusiveMaximum": {"anyOf": [{"type": "number"}, _TEMPORAL_STR]},
        "exclusiveMinimum": {"anyOf": [{"type": "number"}, _TEMPORAL_STR]},
        "maxLength": _NONNEG_INT,
        "minLength": _NONNEG_INT,
        "pattern": {"type": "string", "format": "regex"},
        "maxItems": _NONNEG_INT,
        "minItems": _NONNEG_INT,
        "uniqueItems": {"type": "boolean"},
        "maxContains": _NONNEG_INT,
        "minContains": _NONNEG_INT,
        "maxProperties": _NONNEG_INT,
        "minProperties": _NONNEG_INT,
        "required": {"type": "array", "items": {"type": "string"},
                     "uniqueItems": True},
        "dependentRequired": {
            "type": "object",
            "additionalProperties": {"type": "array",
                                     "items": {"type": "string"}}},
        "format": {"type": "string"},
        "allOf": _SCHEMA_ARRAY,
        "anyOf": _SCHEMA_ARRAY,
        "oneOf": _SCHEMA_ARRAY,
        "not": _SCHEMA_REF,
        "if": _SCHEMA_REF,
        "then": _SCHEMA_REF,
        "else": _SCHEMA_REF,
        "items": _SCHEMA_REF,
        "contains": _SCHEMA_REF,
        "prefixItems": _SCHEMA_ARRAY,
        "additionalProperties": _SCHEMA_REF,
        "propertyNames": _SCHEMA_REF,
        "unevaluatedItems": _SCHEMA_REF,
        "unevaluatedProperties": _SCHEMA_REF,
        "properties": _SCHEMA_MAP,
        "patternProperties": _SCHEMA_MAP,
        "dependentSchemas": _SCHEMA_MAP,
        "$defs": _SCHEMA_MAP,
        "$ref": {"type": "string"},
        "$anchor": {"type": "string",
                    "pattern": "^[A-Za-z_][-A-Za-z0-9._]*$"},
        "$schema": {"type": "string", "format": "uri"},
        "$id": {"type": "string"},
        "$comment": {"type": "string"},
        "title": {"type": "string"},
        "description": {"type": "string"},
        "deprecated": {"type": "boolean"},
        "readOnly": {"type": "boolean"},
        "writeOnly": {"type": "boolean"},
        "examples": {"type": "array"},
    },
}

_meta_rs = None


def meta_ruleset():
    """Compiled-once meta rule set (metaschema cache analog,
    internal/metaschema/metaschema.go:19)."""
    global _meta_rs
    if _meta_rs is None:
        _meta_rs = parse_ruleset(META_RULESET_DOC)
    return _meta_rs


def check_ruleset(doc: Any) -> list[Violation]:
    """Meta-validate a rule document (empty list = structurally valid).
    Each document nesting level costs ~2-3 evaluation-depth units
    (properties → $ref → anyOf) and several Python frames, so the
    diagnostic API runs with a raised depth cap AND a temporarily raised
    interpreter recursion limit — deep-but-valid documents must get
    violations (or a clean bill), not a RecursionError. Documents nested
    beyond ~3000 levels still hit the engine's own cap."""
    import sys
    old = sys.getrecursionlimit()
    try:
        sys.setrecursionlimit(max(old, 200_000))
        return RowEvaluator(meta_ruleset(), max_depth=10000).validate(doc)
    finally:
        sys.setrecursionlimit(old)
