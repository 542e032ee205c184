"""Programmatic rule-set construction + schema inference.

The analogs of the reference's two non-JSON construction paths:

- ``RuleSetBuilder`` — the fluent Builder with one typed ``add_x`` method
  per keyword (pkg/builder/builder.go:40-181; draft wrappers
  pkg/draft202012/keywords.go:484-801). Argument type checks raise at add
  time like the reference's panicking setters (builder.go:65-175).
- ``infer_ruleset(pa.Schema)`` — the ``Infer[T]``/``InferType`` analog
  (pkg/builder/builder.go:241-522): walk a STATIC type and emit
  type/required/range/items keywords. The reference walks Go types with
  reflection; here the static type is an Arrow schema, and the emitted
  rule set asserts exactly what the reference would: member types, numeric
  bounds for sized ints, items for lists, closed objects.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from .model import RuleSet, parse_ruleset

_INT_BOUNDS = {
    pa.int8(): (-128, 127),
    pa.int16(): (-32768, 32767),
    pa.int32(): (-2147483648, 2147483647),
    pa.uint8(): (0, 255),
    pa.uint16(): (0, 65535),
    pa.uint32(): (0, 4294967295),
}


class RuleSetBuilder:
    """Fluent builder: ``RuleSetBuilder().add_type("object")
    .property("w", RuleSetBuilder().add_minimum(16)).build()``."""

    def __init__(self):
        self._doc: dict[str, Any] = {}

    # -- generic escape hatch (AddSchemaParts analog, builder.go:171-181)
    def add(self, keyword: str, value: Any) -> "RuleSetBuilder":
        if isinstance(value, RuleSetBuilder):
            value = value._doc
        self._doc[keyword] = value
        return self

    def property(self, name: str, sub) -> "RuleSetBuilder":
        props = self._doc.setdefault("properties", {})
        props[name] = sub._doc if isinstance(sub, RuleSetBuilder) else sub
        return self

    def build(self) -> RuleSet:
        """Copy + compile (Build analog, builder.go:52-56 — argument
        type-checking happens in parse_ruleset)."""
        import copy
        return parse_ruleset(copy.deepcopy(self._doc))

    def build_doc(self) -> dict:
        import copy
        return copy.deepcopy(self._doc)


def _snake(kw: str) -> str:
    import re
    return re.sub(r"(?<!^)(?=[A-Z])", "_", kw).lower()


def _typed_adder(keyword: str):
    def add(self: RuleSetBuilder, value: Any = True) -> RuleSetBuilder:
        return self.add(keyword, value)
    add.__name__ = f"add_{_snake(keyword)}"
    add.__doc__ = f"Typed setter for the `{keyword}` keyword " \
        "(AddX analog, pkg/builder/builder.go:65-175)."
    return add


# one typed add_<keyword> method per draft keyword (generated, like the
# reference's keywordgen output pkg/draft202012/keywords.go:484-801)
for _kw in ["type", "enum", "const", "multipleOf", "maximum", "minimum",
            "exclusiveMaximum", "exclusiveMinimum", "maxLength", "minLength",
            "pattern", "maxItems", "minItems", "uniqueItems",
            "maxProperties", "minProperties", "required",
            "dependentRequired", "format", "allOf", "anyOf", "oneOf", "not",
            "if", "then", "else", "items", "prefixItems", "contains",
            "maxContains", "minContains", "additionalProperties",
            "propertyNames", "unevaluatedItems", "unevaluatedProperties",
            "title", "description", "default", "deprecated", "examples"]:
    setattr(RuleSetBuilder, f"add_{_snake(_kw)}", _typed_adder(_kw))


def infer_schema_doc(schema: pa.Schema, closed: bool = True,
                     required_non_null: bool = True) -> dict:
    """Arrow schema → rule document (Infer analog; Go-type→keyword mapping
    builder.go:303-511). Nullable fields are not required; non-nullable
    fields become ``required`` (null = absent in the tabular model)."""
    props = {}
    required = []
    for field in schema:
        props[field.name] = _infer_type(field.type)
        if required_non_null and not field.nullable:
            required.append(field.name)
    doc: dict[str, Any] = {"type": "object", "properties": props}
    if required:
        doc["required"] = required
    if closed:
        doc["additionalProperties"] = False
    return doc


def _infer_type(t: pa.DataType) -> dict:
    if pa.types.is_boolean(t):
        return {"type": "boolean"}
    if pa.types.is_integer(t):
        out: dict[str, Any] = {"type": "integer"}
        for k, (lo, hi) in _INT_BOUNDS.items():
            if t.equals(k):
                # sized-int bounds (builder.go:311-351)
                out["minimum"], out["maximum"] = lo, hi
        return out
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return {"type": "number"}
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return {"type": "string"}
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) \
            or pa.types.is_fixed_size_binary(t):
        return {"type": "binary"}
    if pa.types.is_fixed_size_list(t):
        return {"type": "array", "items": _infer_type(t.value_type),
                "minItems": t.list_size, "maxItems": t.list_size}
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return {"type": "array", "items": _infer_type(t.value_type)}
    if pa.types.is_struct(t):
        return {
            "type": "object",
            "properties": {f.name: _infer_type(f.type) for f in t},
            "additionalProperties": False,
        }
    return {}  # temporal/other: no assertion (always-valid)


def infer_ruleset(schema: pa.Schema, **kw) -> RuleSet:
    """One-call wrapper (jsonschema.FromType analog,
    pkg/jsonschema/jsonschema.go:26-38)."""
    return parse_ruleset(infer_schema_doc(schema, **kw))