"""RuleSet IR: parse a JSON Schema-style rule document into a typed, sorted
part tree, resolve ``$defs``/``$ref``/``$anchor`` links, and hash it for
lineage.

This is the analog of the reference's parse+resolve front-end
(pkg/types/schema/schema.go:398-698 `UnmarshalJSON`/`buildTopFromJSON`/
`addKeywordFromJSON`; pkg/draft202012/builder.go:125-405 `resolveSchema`),
re-expressed as plain driver-side Python: the compiled tree is built ONCE on
the driver, broadcast to workers inside actor constructors, and evaluated
vectorized over Arrow batches (see vector.py).

Design notes vs the reference:
- Keyword argument type checking mirrors the closed ArgType enum
  (pkg/types/arg_type/arg_type.go:6-19): ints accept integral floats
  (ToInt, internal/validator/validator.go:27-40), floats accept ints.
- Unknown keywords are kept but always valid (schema.go:521-531).
- Boolean schemas ``true``/``false`` are first-class (schema.go:1175-1196).
- ``$ref`` resolution links nodes at compile time (the analog of the
  generated ``$$resolvedRef`` part, builder.go:286-405); evaluation guards
  recursion with a depth cap like the reference's 1000-deep cap
  (schema.go:1087-1104).
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field
from typing import Any, Optional

from .ordering import sort_parts

# ---------------------------------------------------------------------------
# IR dataclasses


@dataclass
class SchemaNode:
    """One schema object (or boolean schema). ``parts`` is the sorted keyword
    list — the analog of Schema.Parts (schema.go:32-35)."""

    parts: list["Part"] = field(default_factory=list)
    bool_value: Optional[bool] = None  # true/false schema (schema.go:1175-1196)
    location: str = ""  # keyword-location JSON pointer of this node
    # compile-time resolved $ref/$dynamicRef target — stored ON the node (not
    # in a side table keyed by id()) so the compiled tree survives pickling
    # into Ray actor constructors; the analog of the generated $$resolvedRef
    # part (builder.go:286-405)
    resolved_ref: Optional["SchemaNode"] = None
    # separately-resolved $dynamicRef target for the (legal) case of a
    # node carrying BOTH $ref and $dynamicRef — one slot would silently
    # drop one of the two links
    resolved_dyn: Optional["SchemaNode"] = None
    # $dynamicAnchor table of the schema RESOURCE this node roots (set on
    # document roots and loader placeholders). Evaluation threads these
    # top-down first-wins, so $dynamicRef resolves to the OUTERMOST
    # in-scope anchor (the reference's per-run VersionData map,
    # pkg/draft202012/validate.go:84-182); the statically-resolved target
    # is the fallback ($$detachedDynamicRef analog).
    resource_anchors: Optional[dict] = None

    def get(self, keyword: str) -> Any:
        for p in self.parts:
            if p.keyword == keyword:
                return p.value
        return None

    def has(self, keyword: str) -> bool:
        return any(p.keyword == keyword for p in self.parts)


@dataclass
class Part:
    """keyword + typed argument — the analog of Part{Keyword, PartValue}
    (schema.go:886-890)."""

    keyword: str
    value: Any  # scalar | list | SchemaNode | list[SchemaNode] | dict[str, SchemaNode]


class RuleSetError(ValueError):
    """Schema compilation error (bad keyword argument, unresolvable $ref)."""


# ---------------------------------------------------------------------------
# Argument typing (mirror of addKeywordFromJSON, schema.go:514-698)

_SCHEMA_ARGS = {
    "not", "if", "then", "else", "items", "contains", "additionalProperties",
    "propertyNames", "unevaluatedItems", "unevaluatedProperties",
    "contentSchema",
}
_SCHEMAS_ARGS = {"allOf", "anyOf", "oneOf", "prefixItems"}
_MAPSCHEMA_ARGS = {"properties", "patternProperties", "dependentSchemas",
                   "$defs", "definitions"}
_INT_ARGS = {"maxLength", "minLength", "maxItems", "minItems",
             "maxProperties", "minProperties", "maxContains", "minContains"}
_FLOAT_ARGS = {"multipleOf", "maximum", "minimum",
               "exclusiveMaximum", "exclusiveMinimum"}
_STRING_ARGS = {"$schema", "$id", "$anchor", "$dynamicAnchor", "$comment",
                "title", "description", "format", "pattern",
                "contentEncoding", "contentMediaType", "$ref", "$dynamicRef"}
_BOOL_ARGS = {"uniqueItems", "deprecated", "readOnly", "writeOnly"}
_STRINGS_ARGS = {"required"}
_ANY_ARGS = {"enum", "const", "default", "examples", "$vocabulary"}

_TYPE_NAMES = {"null", "boolean", "object", "array", "string", "number",
               "integer", "binary"}  # "binary" is an engine extension for
# Arrow binary columns (image bytes); the other seven mirror
# internal/validator/validator.go:753-812.


def _to_int(keyword: str, v: Any) -> int:
    # ints accept integral floats (ToInt, validator.go:27-40)
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise RuleSetError(f"{keyword}: expected integer, got {v!r}")
    if isinstance(v, float):
        if v != int(v):
            raise RuleSetError(f"{keyword}: expected integer, got {v!r}")
        v = int(v)
    if keyword in _INT_ARGS and v < 0:
        # negative bounds are schema errors (validator.go:979, 994)
        raise RuleSetError(f"{keyword}: negative argument {v}")
    return v


def _to_float(keyword: str, v: Any) -> float:
    if isinstance(v, str) and keyword != "multipleOf":
        # temporal bounds: minimum/maximum/exclusive* accept an RFC3339
        # date or date-time string, canonicalized to epoch MICROSECONDS —
        # the core-keyword composition a jsonschema user writes against a
        # timestamp column ({"format": "date-time", "maximum": "1998-.."});
        # timestamp/date columns evaluate numerically in the same unit
        # (View.numeric / rowwise.instance_float)
        return _temporal_to_micros(keyword, v)
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        raise RuleSetError(f"{keyword}: expected number, got {v!r}")
    f = float(v)
    if keyword == "multipleOf" and f <= 0:
        raise RuleSetError("multipleOf: argument must be > 0")
    return f


def _temporal_to_micros(keyword: str, v: str) -> float:
    from datetime import date, datetime, timezone
    try:
        d = datetime.fromisoformat(v) if ("T" in v or ":" in v) \
            else datetime.combine(date.fromisoformat(v), datetime.min.time())
    except ValueError:
        raise RuleSetError(
            f"{keyword}: expected number or RFC3339 date/date-time, "
            f"got {v!r}")
    if d.tzinfo is None:
        d = d.replace(tzinfo=timezone.utc)
    return d.timestamp() * 1e6


# ---------------------------------------------------------------------------
# Parsing


# RE2's \\s is [\\t\\n\\f\\r ] — NO vertical tab, unlike Python's
_CLASS_TOP = {"d": "[0-9]", "D": "[^0-9]",
              "w": "[0-9A-Za-z_]", "W": "[^0-9A-Za-z_]",
              "s": "[ \\t\\n\\f\\r]",
              "S": "[^ \\t\\n\\f\\r]"}
_CLASS_IN = {"d": "0-9", "w": "0-9A-Za-z_", "s": " \\t\\n\\f\\r"}


def compile_re2ish(pattern: str) -> re.Pattern:
    """Python-re compile approximating RE2/Go semantics (the reference
    engine and the vectorized paths): perl classes \\d/\\w/\\s are
    TRANSLATED to their ASCII character classes (RE2 default) while the
    pattern itself compiles WITHOUT re.ASCII, so ``(?i)`` keeps RE2's
    Unicode case folding. Patterns the translator cannot rewrite
    (negated shorthand inside a class) fall back to a plain re.ASCII
    compile — narrower classes, ASCII-only folding."""
    try:
        out = []
        i, n = 0, len(pattern)
        in_class = False
        class_start = -1  # index just past '[' (and optional '^')
        while i < n:
            c = pattern[i]
            if c == "\\" and i + 1 < n:
                nxt = pattern[i + 1]
                if nxt in "dDwWsS":
                    if in_class:
                        if nxt.isupper():
                            raise ValueError("negated class in class")
                        out.append(_CLASS_IN[nxt])
                    else:
                        out.append(_CLASS_TOP[nxt])
                else:
                    out.append(pattern[i:i + 2])
                i += 2
                continue
            if c == "[" and not in_class:
                in_class = True
                class_start = i + 1
                if i + 1 < n and pattern[i + 1] == "^":
                    class_start = i + 2
            elif c == "]" and in_class and i != class_start:
                # ']' as the FIRST class member ('[]]', '[^]]') is a
                # literal in both RE2 and Python — only later ones close
                in_class = False
            out.append(c)
            i += 1
        return re.compile("".join(out))
    except (ValueError, re.error):
        return re.compile(pattern, re.ASCII)


def _check_regex(kw: str, pattern: str) -> None:
    """Schema-time regex validation: the pattern must compile under BOTH
    regex dialects the engine runs — RE2 (the vectorized paths and the
    reference's Go regexp, validator.go:1002-1020; Go rejects an
    RE2-invalid pattern at schema build) AND Python re (the row-wise
    oracle mirror). RE2-only constructs Python lacks (\\p{L},
    mid-pattern inline flags) are therefore rejected here too — a
    documented narrowing of the accepted pattern language."""
    try:
        compile_re2ish(pattern)
    except re.error as e:
        raise RuleSetError(
            f"{kw}: regex {pattern!r} not compilable by the row-wise "
            f"mirror (Python re): {e}")
    import pyarrow as pa
    import pyarrow.compute as pc
    try:
        pc.match_substring_regex(pa.array([""]), pattern)
    except pa.ArrowInvalid as e:
        raise RuleSetError(
            f"{kw}: regex {pattern!r} is not valid RE2 (the reference "
            f"engine is Go/RE2): {e}")


def parse_node(doc: Any, location: str = "") -> SchemaNode:
    """JSON value → SchemaNode tree (buildFromJSON analog, schema.go:469-511)."""
    if isinstance(doc, bool):
        return SchemaNode(bool_value=doc, location=location)
    if not isinstance(doc, dict):
        raise RuleSetError(f"schema at {location or '/'} must be object or bool")
    parts: list[tuple[str, Any]] = []
    for kw, raw in doc.items():
        loc = f"{location}/{_escape(kw)}"
        if kw in _SCHEMA_ARGS:
            val: Any = parse_node(raw, loc)
        elif kw in _SCHEMAS_ARGS:
            if not isinstance(raw, list):
                raise RuleSetError(f"{kw}: expected array of schemas")
            val = [parse_node(s, f"{loc}/{i}") for i, s in enumerate(raw)]
        elif kw in _MAPSCHEMA_ARGS:
            if not isinstance(raw, dict):
                raise RuleSetError(f"{kw}: expected object of schemas")
            if kw == "patternProperties":
                for k in raw:
                    _check_regex("patternProperties", k)
            val = {k: parse_node(s, f"{loc}/{_escape(k)}")
                   for k, s in raw.items()}
        elif kw == "dependencies":
            # draft-7 compat: name → string-array | schema
            # (PartMapArrayOrSchema, schema.go:983-990)
            if not isinstance(raw, dict):
                raise RuleSetError("dependencies: expected object")
            val = {}
            for k, s in raw.items():
                if isinstance(s, list):
                    if not all(isinstance(x, str) for x in s):
                        raise RuleSetError("dependencies: array must be strings")
                    val[k] = list(s)
                else:
                    val[k] = parse_node(s, f"{loc}/{_escape(k)}")
        elif kw == "dependentRequired":
            if not (isinstance(raw, dict)
                    and all(isinstance(v, list)
                            and all(isinstance(x, str) for x in v)
                            for v in raw.values())):
                raise RuleSetError("dependentRequired: expected map of string arrays")
            val = {k: list(v) for k, v in raw.items()}
        elif kw in _INT_ARGS:
            val = _to_int(kw, raw)
        elif kw in _FLOAT_ARGS:
            val = _to_float(kw, raw)
        elif kw in _STRING_ARGS:
            if not isinstance(raw, str):
                raise RuleSetError(f"{kw}: expected string")
            if kw == "pattern":
                _check_regex("pattern", raw)
            val = raw
        elif kw in _BOOL_ARGS:
            if not isinstance(raw, bool):
                raise RuleSetError(f"{kw}: expected boolean")
            val = raw
        elif kw in _STRINGS_ARGS:
            if not (isinstance(raw, list)
                    and all(isinstance(x, str) for x in raw)):
                raise RuleSetError(f"{kw}: expected array of strings")
            val = list(raw)
        elif kw == "type":
            # StringOrStrings (validator.go:753-768)
            names = [raw] if isinstance(raw, str) else raw
            if not (isinstance(names, list)
                    and all(isinstance(x, str) for x in names)):
                raise RuleSetError("type: expected string or array of strings")
            bad = set(names) - _TYPE_NAMES
            if bad:
                raise RuleSetError(f"type: unknown type name(s) {sorted(bad)}")
            val = list(names)
        elif kw in _ANY_ARGS:
            if kw == "enum" and not isinstance(raw, list):
                raise RuleSetError("enum: expected array")
            val = raw
        else:
            # unknown keyword: kept, always valid (schema.go:521-531)
            val = raw
        parts.append((kw, val))
    node = SchemaNode(location=location)
    node.parts = [Part(k, v) for k, v in sort_parts(parts)]
    return node


def _escape(token: str) -> str:
    """RFC6901 JSON-pointer token escape (schema.go:1120-1144 analog)."""
    return token.replace("~", "~0").replace("/", "~1")


# ---------------------------------------------------------------------------
# $ref resolution (static linking; builder.go:286-405 analog)


@dataclass
class RuleSet:
    root: SchemaNode
    doc: Any  # original JSON document (canonical source of truth)

    _hash: Optional[str] = None

    @property
    def ruleset_hash(self) -> str:
        """sha256 of the canonical marshalled document — the lineage id used
        in checkpoint records (SURVEY §3.4; MarshalJSON analog
        schema.go:211-367)."""
        if self._hash is None:
            self._hash = hashlib.sha256(
                canonical_json(self.doc).encode()).hexdigest()[:16]
        return self._hash

    def to_json(self) -> str:
        """Canonical re-marshal of the PARSED tree (normalized argument
        forms, sorted keys, bool schemas as true/false)."""
        return canonical_json(marshal_node(self.root))

    def ref_target(self, node: SchemaNode,
                   keyword: str = "$ref") -> Optional[SchemaNode]:
        if keyword == "$dynamicRef" and node.resolved_dyn is not None:
            return node.resolved_dyn
        return node.resolved_ref


def canonical_json(doc: Any) -> str:
    return json.dumps(doc, sort_keys=True, separators=(",", ":"),
                      ensure_ascii=False)


def marshal_node(node: "SchemaNode") -> Any:
    """Parsed tree → canonical JSON value (MarshalJSON analog,
    schema.go:211-367): bool schemas emit ``true``/``false``, keyword maps
    emit sorted keys, coerced arguments (ToInt'd floats) emit their
    normalized form. ``parse → marshal → parse`` is idempotent."""
    if node.bool_value is not None:
        return node.bool_value
    out: dict[str, Any] = {}
    for p in node.parts:
        v = p.value
        if isinstance(v, SchemaNode):
            out[p.keyword] = marshal_node(v)
        elif isinstance(v, list) and v and isinstance(v[0], SchemaNode):
            out[p.keyword] = [marshal_node(x) for x in v]
        elif isinstance(v, dict):
            out[p.keyword] = {k: (marshal_node(x)
                                  if isinstance(x, SchemaNode) else x)
                              for k, x in sorted(v.items())}
        else:
            out[p.keyword] = v
    return out


def _iter_subnodes(node: SchemaNode):
    for p in node.parts:
        if isinstance(p.value, SchemaNode):
            yield p.value
        elif isinstance(p.value, list):
            for v in p.value:
                if isinstance(v, SchemaNode):
                    yield v
        elif isinstance(p.value, dict):
            for v in p.value.values():
                if isinstance(v, SchemaNode):
                    yield v


def parse_ruleset(doc: Any, loader=None,
                  _loader_cache: Optional[dict] = None) -> RuleSet:
    """Parse + resolve: the analog of jsonschema.New
    (pkg/jsonschema/jsonschema.go:17-24).

    ``loader(uri) -> document`` resolves NON-document-local ``$ref``s
    (SetLoader analog, schema.go:1015-1052) — driver-side only, never on
    workers; loaded documents are parse-memoized per URI (schemacache
    analog, internal/schemacache/schemacache.go:16-73)."""
    if isinstance(doc, (str, bytes)):
        doc = json.loads(doc)
    root = parse_node(doc)
    rs = RuleSet(root=root, doc=doc)
    if _loader_cache is None:
        _loader_cache = {}
    # pass 1: collect anchors + pointer index (resolveIDs analog,
    # builder.go:227-283), RESOURCE-SCOPED: a non-root node bearing $id
    # roots an embedded schema resource (2020-12 §8.2), and its anchors
    # belong to THAT resource — lumping the whole document into one
    # namespace made $dynamicRef resolve to the first anchor in document
    # order instead of the per-resource dynamic-scope rules.
    anchors: dict[str, SchemaNode] = {}      # document-global fallback
    by_pointer: dict[str, SchemaNode] = {}
    res_static: dict[str, dict] = {}         # resource loc → $anchor map
    res_dynamic: dict[str, dict] = {}        # resource loc → $dynamicAnchor
    node_res: dict[str, str] = {}            # node loc → owning resource loc
    id_map: dict[str, SchemaNode] = {}       # $id URI → embedded resource

    def walk(n: SchemaNode, res: str):
        by_pointer[n.location] = n
        nid = n.get("$id")
        if nid is not None:
            id_map.setdefault(nid, n)
        if n is not root and nid is not None:
            res = n.location
        node_res[n.location] = res
        d = n.get("$dynamicAnchor")
        # $dynamicAnchor ALSO creates a plain anchor (2020-12 §8.2.2) —
        # a node may carry both keywords and both names must resolve
        for a in {n.get("$anchor"), d} - {None}:
            anchors[a] = n
            res_static.setdefault(res, {}).setdefault(a, n)
        if d:
            res_dynamic.setdefault(res, {}).setdefault(d, n)
        for c in _iter_subnodes(n):
            walk(c, res)

    walk(root, root.location)
    # each resource root carries its OWN $dynamicAnchor table; evaluation
    # pushes it on entry (first-wins), so the outermost in-scope anchor
    # wins exactly per the dynamic-scope rules
    for res, dmap in res_dynamic.items():
        by_pointer[res].resource_anchors = dmap
    # pass 2: link refs (resolveRefs analog, builder.go:286-405). Only
    # document-local refs are supported; remote refs need a driver-side
    # loader (SetLoader analog, schema.go:1015-1052) — not needed for
    # table rule sets.
    def resolve_one(ref: str, n: SchemaNode) -> SchemaNode:
        # fragment-only refs resolve against the ENCLOSING resource's
        # base URI (2020-12 §8.2.3): '#' inside an embedded $id resource
        # is THAT resource's root, and '#/...' pointers are
        # resource-relative (document-root fallback kept for legacy
        # rulesets that wrote absolute pointers inside resources)
        res_loc = node_res.get(n.location, root.location)
        res_root = by_pointer.get(res_loc, root)
        if ref == "#":
            return res_root
        if ref.startswith("#/"):
            # STRICT resource-relative (no silent document-root rebind —
            # a typo'd pointer must error, not bind to the wrong schema)
            if res_root is not root:
                return _deref_pointer(res_loc + ref[1:], by_pointer)
            return _deref_pointer(ref[1:], by_pointer)
        if ref.startswith("#"):
            name = ref[1:]
            # anchors resolve within the referencing node's OWN resource
            # first; the document-global table remains as a lenient
            # cross-resource fallback (legacy rulesets)
            tgt = res_static.get(res_loc, {}).get(name)
            if tgt is None and res_root is root:
                # flat legacy documents: anchors anywhere resolve from
                # the ROOT resource only (inside an embedded resource a
                # missing anchor is an authoring error, not a fallback)
                tgt = anchors.get(name)
            if tgt is None:
                raise RuleSetError(f"$ref: unknown anchor {ref!r}")
            return tgt
        # document-local embedded resource by its $id URI ("tree",
        # "tree#frag") — 2020-12 §8.2.3 base-URI resolution restricted
        # to same-document resources; anything else needs the loader
        base, _, frag = ref.partition("#")
        if base in id_map:
            tgt_root = id_map[base]
            if not frag:
                return tgt_root
            if frag.startswith("/"):
                return _deref_pointer(tgt_root.location + frag,
                                      by_pointer)
            tgt = res_static.get(tgt_root.location, {}).get(frag)
            if tgt is None:
                raise RuleSetError(
                    f"$ref: unknown anchor {frag!r} in resource {base!r}")
            return tgt
        if loader is not None:
            if ref not in _loader_cache:
                # placeholder first: remote-ref cycles resolve to the
                # same node instead of recursing forever
                placeholder = SchemaNode(location=f"<{ref}>")
                _loader_cache[ref] = placeholder
                loaded = parse_ruleset(loader(ref), loader=loader,
                                       _loader_cache=_loader_cache).root
                placeholder.parts = loaded.parts
                placeholder.bool_value = loaded.bool_value
                placeholder.resolved_ref = loaded.resolved_ref
                placeholder.resolved_dyn = loaded.resolved_dyn
                placeholder.resource_anchors = loaded.resource_anchors
            return _loader_cache[ref]
        raise RuleSetError(
            f"$ref: non-local ref {ref!r} needs a loader "
            "(parse_ruleset(doc, loader=fn))")

    def link(n: SchemaNode):
        ref = n.get("$ref")
        dyn = n.get("$dynamicRef")
        if ref is not None:
            n.resolved_ref = resolve_one(ref, n)
        if dyn is not None:
            tgt = resolve_one(dyn, n)
            n.resolved_dyn = tgt
            if ref is None:
                n.resolved_ref = tgt  # legacy single-slot consumers
        for c in _iter_subnodes(n):
            link(c)

    link(root)
    return rs


def _deref_pointer(ptr: str, by_pointer: dict[str, SchemaNode]) -> SchemaNode:
    """Dereference a JSON-pointer fragment against parsed node locations
    (jsonpointer.DerefSchema analog, pkg/jsonpointer/jsonpointer.go:22-147)."""
    if ptr in by_pointer:
        return by_pointer[ptr]
    raise RuleSetError(f"$ref: cannot resolve pointer {ptr!r}")


# Evaluation recursion cap — reference caps child states at depth 1000
# (schema.go:1087-1104); our instances are flat-to-shallow Arrow rows, so a
# smaller cap catches schema cycles sooner.
MAX_DEPTH = 64
