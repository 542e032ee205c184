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
        self._doc[keyword] = _unwrap_builders(value)
        return self

    def property(self, name: str, sub) -> "RuleSetBuilder":
        props = self._doc.setdefault("properties", {})
        props[name] = _unwrap_builders(sub)
        return self

    def build(self) -> RuleSet:
        """Copy + compile (Build analog, builder.go:52-56 — argument
        type-checking happens in parse_ruleset)."""
        import copy
        return parse_ruleset(copy.deepcopy(self._doc))

    def build_doc(self) -> dict:
        import copy
        return copy.deepcopy(self._doc)


def _unwrap_builders(v: Any) -> Any:
    """Builders nest naturally inside schema-array/schema-map keywords
    (allOf/anyOf/prefixItems/$defs/properties…) — unwrap them at ANY
    depth so fluent composition always yields a parseable document."""
    if isinstance(v, RuleSetBuilder):
        return _unwrap_builders(v._doc)
    if isinstance(v, list):
        return [_unwrap_builders(x) for x in v]
    if isinstance(v, dict):
        return {k: _unwrap_builders(x) for k, x in v.items()}
    return v


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

# ---------------------------------------------------------------------------
# Python-type inference — the host-language FromType[T]/Infer analog
# (pkg/builder/builder.go:241-522; json field tags builder.go:526-560;
# jsonschema field tags builder.go:591-625). The reference walks Go types
# with reflection; this walks Python typing constructs: dataclasses,
# TypedDicts, Optional/Union, list/tuple/dict, Literal, Enum, numpy
# sized ints (the Go int8..uint32 bound analog).


def _add_null_type(doc: dict) -> dict:
    """Pointer analog (builder.go addParts addNull): widen an existing
    ``type`` to also permit null; schemas without a type assertion
    already accept null."""
    t = doc.get("type")
    if t is not None:
        ts = [t] if isinstance(t, str) else list(t)
        if "null" in ts:
            return doc
        out = dict(doc)
        out["type"] = ["null"] + ts
        return out
    # enum/const assert values directly — null must join the value set
    # (an Optional[Literal]/Optional[Enum] field permits None)
    if "enum" in doc:
        if None in doc["enum"]:
            return doc
        out = dict(doc)
        out["enum"] = list(doc["enum"]) + [None]
        return out
    if "const" in doc:
        out = dict(doc)
        out["enum"] = [out.pop("const"), None]
        return out
    return doc


def _field_json(f) -> tuple[str, bool, bool]:
    """dataclass-field ``metadata={"json": ...}`` → (name, omit, optional),
    mirroring the Go ``json:`` tag rules (builder.go:526-560):
    ``"-"`` omits the field; ``"name,omitempty"`` renames and makes it
    optional; an empty name keeps the field name."""
    tag = f.metadata.get("json") if f.metadata else None
    if tag is None:
        return f.name, False, False
    if tag == "-":
        return "", True, False
    name, _, opts = tag.partition(",")
    optional = any(o in ("omitempty", "omitzero")
                   for o in opts.split(",") if o)
    return (name or f.name), False, optional


def _apply_field_tag(doc: dict, tag: str) -> dict:
    """dataclass-field ``metadata={"jsonschema": ...}`` →
    ``enum=a,enum=b`` adds an enum, free text becomes the description
    (builder.go:591-625 addFieldTag)."""
    from .model import RuleSetError
    if not tag:
        raise RuleSetError("empty jsonschema tag")
    enums: list = []
    doc = dict(doc)
    while tag:
        keyword, eq, tail = tag.partition("=")
        if not eq or any(c in keyword for c in " \t"):
            doc["description"] = tag
            break
        val, _, tag = tail.partition(",")
        if keyword == "enum":
            if not val:
                raise RuleSetError("missing enum value in jsonschema tag")
            enums.append(val)
        else:
            raise RuleSetError(
                f"unrecognized jsonschema tag {keyword!r}")
    if enums:
        # tag values arrive as strings; coerce to the field's inferred
        # type or the enum is unsatisfiable (number vs "1" never equal)
        t = doc.get("type")
        base = t if isinstance(t, str) else (t[-1] if t else None)

        def co(v):
            try:
                if base == "integer":
                    return int(v)
                if base == "number":
                    return float(v)
                if base == "boolean":
                    if v not in ("true", "false"):
                        raise RuleSetError(
                            f"jsonschema tag enum value {v!r} is not a "
                            "boolean (true/false)")
                    return v == "true"
            except ValueError:
                raise RuleSetError(
                    f"jsonschema tag enum value {v!r} does not parse "
                    f"as {base}")
            return v

        doc["enum"] = [co(v) for v in enums]
    return doc


def _infer_py(typ, seen: frozenset, types: dict, ignore: bool):
    """Recursive type walk → schema doc, or None for a skipped
    (unsupported + ignore_invalid) type."""
    import collections.abc
    import dataclasses
    import datetime
    import decimal
    import enum as enum_mod
    import fractions
    import typing

    import numpy as np

    from .model import RuleSetError

    try:
        if typ in types:
            import copy
            return copy.deepcopy(types[typ])
    except TypeError:
        pass  # unhashable typing construct
    origin = typing.get_origin(typ)
    args = typing.get_args(typ)

    if typ is type(None):
        return {"type": "null"}
    if typ is typing.Any or typ is object:
        return {}  # interface{} analog: no assertion

    # Optional / Union → null-widening (pointer analog) or anyOf
    import types as types_mod
    if origin in (typing.Union, types_mod.UnionType):
        non_null = [a for a in args if a is not type(None)]
        nullable = len(non_null) < len(args)
        if len(non_null) == 1:
            inner = _infer_py(non_null[0], seen, types, ignore)
            if inner is None:
                # the non-null arm is UNCHECKED (ignore_invalid): the
                # permissive answer is no assertion at all — a null-only
                # schema would reject every actual value of the type
                return None
            return _add_null_type(inner) if nullable else inner
        subs = [s for s in (_infer_py(a, seen, types, ignore)
                            for a in non_null) if s is not None]
        if not subs:
            return None  # every member skipped: skip the whole union
        return {"anyOf": subs + [{"type": "null"}]} if nullable \
            else {"anyOf": subs}

    if origin is typing.Literal:
        return {"enum": list(args)}

    if origin in (list, set, frozenset, collections.abc.Sequence):
        out: dict[str, Any] = {"type": "array"}
        if args:
            item = _infer_py(args[0], seen, types, ignore)
            if item is not None:
                out["items"] = item
        return out
    if origin is tuple:
        if len(args) == 2 and args[1] is Ellipsis:
            out = {"type": "array"}
            item = _infer_py(args[0], seen, types, ignore)
            if item is not None:
                out["items"] = item
            return out
        # fixed-length tuple: the Go fixed-array analog
        # (builder.go:386-392 AddMinItems/AddMaxItems)
        pre = [s for s in (_infer_py(a, seen, types, ignore)
                           for a in args) if s is not None]
        return {"type": "array", "prefixItems": pre,
                "minItems": len(args), "maxItems": len(args)}
    if origin is dict or typ is dict:
        if args:
            key_t, val_t = args
            if key_t is not str:
                if ignore:
                    return None
                raise RuleSetError(
                    f"unsupported map key type {key_t!r}")
            out = {"type": "object"}
            vs = _infer_py(val_t, seen, types, ignore)
            if vs is not None and vs != {}:
                out["additionalProperties"] = vs
            return out
        return {"type": "object"}

    if not isinstance(typ, type):
        if ignore:
            return None
        raise RuleSetError(f"unsupported jsonschema type {typ!r}")

    if issubclass(typ, bool):
        return {"type": "boolean"}
    if issubclass(typ, enum_mod.Enum):
        return {"enum": [m.value for m in typ]}
    if issubclass(typ, (np.integer,)):
        info = np.iinfo(typ)  # sized-int bounds (builder.go:311-351)
        return {"type": "integer", "minimum": int(info.min),
                "maximum": int(info.max)}
    if issubclass(typ, (int, np.integer)):
        return {"type": "integer"}
    if issubclass(typ, (float, np.floating)):
        return {"type": "number"}
    if issubclass(typ, str):
        return {"type": "string"}
    if issubclass(typ, (bytes, bytearray)):
        return {"type": "binary"}
    if typ in (datetime.datetime, datetime.date, decimal.Decimal,
               fractions.Fraction):
        # time.Time / big.Rat / big.Float analog: string (builder.go:394)
        return {"type": "string"}

    import typing as _t
    is_td = _t.is_typeddict(typ) if hasattr(_t, "is_typeddict") else False
    if dataclasses.is_dataclass(typ) or is_td:
        if typ in seen:
            raise RuleSetError(f"type cycle at {typ.__name__}")
        seen = seen | {typ}
        # localns lets self-referential forward refs ("Node") resolve even
        # for function-local classes (get_type_hints only sees the module)
        hints = typing.get_type_hints(typ, localns={typ.__name__: typ})
        props: dict[str, Any] = {}
        required: list[str] = []
        if is_td:
            req_keys = getattr(typ, "__required_keys__", frozenset())
            for name, ft in hints.items():
                sub = _infer_py(ft, seen, types, ignore)
                if sub is None:
                    continue
                props[name] = sub
                if name in req_keys:
                    required.append(name)
        else:
            for f in dataclasses.fields(typ):
                name, omit, optional = _field_json(f)
                if omit:
                    continue
                sub = _infer_py(hints[f.name], seen, types, ignore)
                if sub is None:
                    continue
                tag = f.metadata.get("jsonschema") if f.metadata else None
                if tag is not None:
                    sub = _apply_field_tag(sub, tag)
                props[name] = sub
                has_default = (f.default is not dataclasses.MISSING
                               or f.default_factory
                               is not dataclasses.MISSING)
                if not optional and not has_default:
                    required.append(name)
        doc: dict[str, Any] = {"type": "object"}
        if props:
            doc["properties"] = props
        if required:
            doc["required"] = required
        doc["additionalProperties"] = False  # closed (builder.go:497-499)
        return doc

    if ignore:
        return None
    raise RuleSetError(f"unsupported jsonschema type {typ!r}")


def infer_from_type(typ, *, types: dict = None,
                    ignore_invalid: bool = False) -> dict:
    """Python type → rule document (Infer/InferType analog,
    builder.go:241-522). ``types`` maps a type to a schema-doc override
    (InferOpts.Types); ``ignore_invalid`` skips unsupported types
    (InferOpts.IgnoreInvalidTypes) instead of raising."""
    doc = _infer_py(typ, frozenset(), types or {}, ignore_invalid)
    return {} if doc is None else doc


def infer_ruleset_from_type(typ, **kw) -> RuleSet:
    """One-call wrapper: Python type → compiled RuleSet
    (jsonschema.FromType analog, pkg/jsonschema/jsonschema.go:26-38)."""
    return parse_ruleset(infer_from_type(typ, **kw))
