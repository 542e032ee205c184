"""Vectorized batch evaluator: a compiled RuleSet evaluated over a whole
``pyarrow.Table`` batch at once.

This is the Ray-Data-native re-expression of the reference's recursive
per-instance walk (pkg/types/schema/schema.go:796-819): each leaf keyword
becomes ONE pyarrow.compute / numpy kernel producing a per-row pass mask,
and applicator keywords (allOf/anyOf/oneOf/not/if-then-else/…) become
boolean algebra over those masks (SURVEY §2.3). Cross-keyword "notes"
(contains counts, if-condition, evaluated members for unevaluated*) are
per-row numpy arrays instead of the reference's per-instance Notes map
(pkg/notes/notes.go:38-103).

Instance model = one table row; a null cell is an ABSENT member (tabular
analog of "property not present"): leaf assertions are vacuously true on
absent members, ``required`` fails on them.

Violations exactly mirror the row-wise oracle evaluator (rowwise.py) —
property-based tests cross-check the two.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import messages as M
from .model import MAX_DEPTH, RuleSet, SchemaNode
from .rowwise import RowEvaluator, deep_equal

# ---------------------------------------------------------------------------
# views


def arrow_kind(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "integer"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "number"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        # a JSON date-time instance is a string; numerically it is epoch
        # MICROSECONDS for the temporal-bound composition (model._to_float)
        return "datetime"
    if pa.types.is_boolean(t):
        return "boolean"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t) \
            or pa.types.is_fixed_size_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return "array"
    if pa.types.is_struct(t) or pa.types.is_map(t):
        return "object"
    if pa.types.is_null(t):
        return "null"
    return "other"


def _combine(col) -> pa.Array:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_dictionary(col.type):
        col = col.dictionary_decode()
    return col


def _valid_np(arr: pa.Array) -> np.ndarray:
    if arr.null_count == 0:
        return np.ones(len(arr), dtype=bool)
    return pc.is_valid(arr).to_numpy(zero_copy_only=False)


@dataclass
class View:
    """A vector of instance values — one slot per row of the current
    context (batch rows at the root/column level; flattened list elements
    inside array applicators)."""

    n: int
    kind: str                      # uniform arrow kind of the slots
    arr: Optional[pa.Array]        # None for the root object view
    table: Optional[pa.Table]      # set for the root view
    present: np.ndarray            # slot has a value (non-null member)
    rows: Optional[np.ndarray]     # slot -> batch row index (None=identity)
    loc_prefix: str                # instance-location prefix
    elem_pos: Optional[np.ndarray] = None  # per-slot element index (lists)
    # list-element views: a null slot is the JSON value `null` (fails
    # type/enum/const like the row-wise oracle and the reference,
    # validator.go:842-871), NOT an absent member
    null_as_value: bool = False
    # map-entry views: per-slot member NAME (instance locations), object
    # dtype numpy array
    elem_key: Optional[np.ndarray] = None
    # struct members REACHED THROUGH a list element: the field path that
    # follows the element index in the instance location ("/arr/3/p", not
    # "/arr/p/3")
    field_suffix: Optional[str] = None
    # nested containers (list-of-list elements, maps under elements): the
    # per-slot location prefix ALREADY including the outer indices —
    # materialized only on these rare paths; flat columns keep the
    # constant loc_prefix
    loc_prefix_arr: Optional[np.ndarray] = None
    _numeric: Any = field(default=None, repr=False)
    _np_cache: Any = field(default=None, repr=False)

    def batch_rows(self, slots: np.ndarray) -> np.ndarray:
        return slots if self.rows is None else self.rows[slots]

    def _pre(self, slots: np.ndarray):
        if self.loc_prefix_arr is not None:
            return self.loc_prefix_arr[slots]
        return None

    def locs(self, slots: np.ndarray) -> list[str]:
        pres = self._pre(slots)

        def pre(i):
            return pres[i] if pres is not None else self.loc_prefix

        if self.elem_key is not None:
            if self.elem_pos is not None:  # map inside a list element
                return [f"{pre(i)}/{self.elem_pos[s]}/"
                        f"{_esc(self.elem_key[s])}"
                        for i, s in enumerate(slots)]
            return [f"{pre(i)}/{_esc(self.elem_key[s])}"
                    for i, s in enumerate(slots)]
        if self.elem_pos is None:
            if pres is not None:
                return list(pres)
            return [self.loc_prefix] * len(slots)
        sfx = f"/{self.field_suffix}" if self.field_suffix else ""
        return [f"{pre(i)}/{self.elem_pos[s]}{sfx}"
                for i, s in enumerate(slots)]

    def numeric(self) -> tuple[np.ndarray, np.ndarray]:
        """(float64 values, applicable mask) — instanceFloat semantics
        (validator.go:1275-1295): numerics always, numeric strings coerced,
        booleans and everything else not applicable."""
        if self._numeric is None:
            if self.kind in ("integer", "number"):
                vals = self.arr.to_numpy(zero_copy_only=False).astype(
                    np.float64, copy=False)
                app = self.present.copy()
                vals = np.where(self.present, vals, 0.0)
            elif self.kind == "datetime":
                vals = pc.cast(pc.cast(self.arr, pa.timestamp("us")),
                               pa.int64()).to_numpy(
                    zero_copy_only=False).astype(np.float64)
                app = self.present.copy()
                vals = np.where(self.present, vals, 0.0)
            elif self.kind == "string":
                import pandas as pd
                s = pd.to_numeric(self.arr.to_pandas(), errors="coerce")
                vals = s.to_numpy(dtype=np.float64, na_value=np.nan)
                app = self.present & ~np.isnan(vals)
                vals = np.where(app, vals, 0.0)
            else:
                vals = np.zeros(self.n)
                app = np.zeros(self.n, dtype=bool)
            self._numeric = (vals, app)
        return self._numeric

    def strings_np(self):
        if self._np_cache is None:
            self._np_cache = self.arr.to_numpy(zero_copy_only=False)
        return self._np_cache


def root_view(table: pa.Table) -> View:
    n = table.num_rows
    return View(n=n, kind="object", arr=None, table=table,
                present=np.ones(n, dtype=bool), rows=None, loc_prefix="")


def column_view(table: pa.Table, name: str) -> View:
    arr = _combine(table.column(name))
    return View(n=len(arr), kind=arrow_kind(arr.type), arr=arr, table=None,
                present=_valid_np(arr), rows=None,
                loc_prefix=f"/{_esc(name)}")


def _esc(token: str) -> str:
    return token.replace("~", "~0").replace("/", "~1")


# ---------------------------------------------------------------------------
# violation blocks


@dataclass
class VBlock:
    rows: np.ndarray            # batch row indices
    keyword: str
    keyword_location: str
    instance_locations: list[str]
    message: str
    offending: list[str]
    # slot indices in the CURRENT node's view domain.  _emit stores the
    # emitting view's slots; array applicators remap to the parent (array
    # view) domain when lifting element-view blocks into their sink, so a
    # gate (if/then, dependentSchemas) always indexes masks of its own
    # slot domain — batch-row indices would be wrong (and out of bounds)
    # inside flattened list contexts.
    slots: Optional[np.ndarray] = None


def _gate_blocks(blocks: list[VBlock], keep: np.ndarray) -> list[VBlock]:
    out = []
    for b in blocks:
        sel = keep[b.slots if b.slots is not None else b.rows]
        if sel.all():
            out.append(b)
            continue
        if not sel.any():
            continue
        idx = np.nonzero(sel)[0]
        out.append(VBlock(b.rows[idx], b.keyword, b.keyword_location,
                          [b.instance_locations[i] for i in idx], b.message,
                          [b.offending[i] for i in idx],
                          slots=None if b.slots is None else b.slots[idx]))
    return out


def _remap_slots(blocks: list[VBlock], mapping: np.ndarray) -> list[VBlock]:
    """Lift blocks from a child slot domain into the parent's: block slot i
    becomes mapping[i] (mapping: child slot -> parent slot)."""
    for b in blocks:
        if b.slots is not None:
            b.slots = mapping[b.slots]
    return blocks


# annotations: evaluated members / items, per-row (Notes analog)
@dataclass
class Ann:
    keys: dict[str, np.ndarray] = field(default_factory=dict)  # name->rowmask
    items: Optional[np.ndarray] = None  # flat-slot mask (array contexts)
    # flat slot -> view slot, carried WITH the items mask so row-level
    # gates apply to element bitmaps (every node evaluating the same view
    # flattens to the identical domain, so mappings are interchangeable)
    items_rows: Optional[np.ndarray] = None
    # map-typed object contexts: per-ENTRY evaluated mask over the view's
    # flattened (key, value) entries + flat entry -> view slot mapping —
    # the open-object analog of `keys` (names are unbounded per row)
    map_entries: Optional[np.ndarray] = None
    map_rows: Optional[np.ndarray] = None

    def merge(self, other: "Ann", gate: Optional[np.ndarray]):
        for k, m in other.keys.items():
            g = m if gate is None else (m & gate)
            if k in self.keys:
                self.keys[k] = self.keys[k] | g
            else:
                self.keys[k] = g
        if other.items is not None:
            g = other.items
            if gate is not None and other.items_rows is not None:
                # a combinator's notes only count where the branch passed
                # FOR THAT ROW (allOf: where all passed — validator.go:62-86)
                g = g & gate[other.items_rows]
            self.items = g if self.items is None else (self.items | g)
            if self.items_rows is None:
                self.items_rows = other.items_rows
        if other.map_entries is not None:
            g = other.map_entries
            if gate is not None and other.map_rows is not None:
                g = g & gate[other.map_rows]
            self.map_entries = g if self.map_entries is None \
                else (self.map_entries | g)
            if self.map_rows is None:
                self.map_rows = other.map_rows


# ---------------------------------------------------------------------------
# the evaluator


class BatchValidator:
    """Compiled-ruleset evaluator over Arrow batches.

    Construct ONCE (driver or actor ``__init__``) — regexes and enum value
    sets are compiled here, fixing the reference's per-call regex
    compilation (validator.go:542, 1008). Then call per batch:

    - ``mask(table)``        -> np.bool_ per-row validity
    - ``violations(table)``  -> pyarrow.Table of violation rows
      ``(*key_columns, keyword, keyword_location, instance_location,
      offending_value, message)``
    """

    VIOLATION_FIELDS = ["keyword", "keyword_location", "instance_location",
                        "offending_value", "message"]

    def __init__(self, rs: RuleSet, key_columns: Optional[list[str]] = None,
                 validate_format: bool = True):
        self.rs = rs
        self.key_columns = key_columns or []
        self.validate_format = validate_format
        self.row_eval = RowEvaluator(rs, validate_format=validate_format)
        self._regex: dict[str, re.Pattern] = {}
        from ..formats import VECTOR_REGEX, registry as format_registry
        self.formats = format_registry
        self.format_regex = VECTOR_REGEX

    # -- public API ---------------------------------------------------

    def evaluate(self, table: pa.Table) -> tuple[np.ndarray, pa.Table]:
        sink: list[VBlock] = []
        self._dyn = {}  # per-run dynamic-anchor scope (validate.go:122-158)
        mask, _ = self._eval(self.rs.root, root_view(table), "", 0, sink)
        return mask, self._blocks_to_table(table, sink)

    def mask(self, table: pa.Table) -> np.ndarray:
        sink: list[VBlock] = []
        self._dyn = {}
        m, _ = self._eval(self.rs.root, root_view(table), "", 0, sink)
        return m

    def violations(self, table: pa.Table) -> pa.Table:
        return self.evaluate(table)[1]

    def _blocks_to_table(self, table: pa.Table,
                         blocks: list[VBlock]) -> pa.Table:
        cols: dict[str, Any] = {}
        if blocks:
            rows = np.concatenate([b.rows for b in blocks])
        else:
            rows = np.array([], dtype=np.int64)
        for k in self.key_columns:
            src = _combine(table.column(k))
            cols[k] = src.take(pa.array(rows, type=pa.int64()))
        kw, kl, il, off, msg = [], [], [], [], []
        for b in blocks:
            m = len(b.rows)
            kw += [b.keyword] * m
            kl += [b.keyword_location] * m
            il += b.instance_locations
            off += b.offending
            msg += [b.message] * m
        cols["keyword"] = pa.array(kw, type=pa.string())
        cols["keyword_location"] = pa.array(kl, type=pa.string())
        cols["instance_location"] = pa.array(il, type=pa.string())
        cols["offending_value"] = pa.array(off, type=pa.string())
        cols["message"] = pa.array(msg, type=pa.string())
        return pa.table(cols)

    # -- helpers ------------------------------------------------------

    def _re(self, pattern: str) -> re.Pattern:
        # RE2-ish Python compile: ASCII perl classes, Unicode (?i) folding
        p = self._regex.get(pattern)
        if p is None:
            from .model import compile_re2ish
            p = self._regex[pattern] = compile_re2ish(pattern)
        return p

    def _offending(self, view: View, slots: np.ndarray) -> list[str]:
        if view.arr is None:
            return ["object"] * len(slots)
        vals = view.arr.take(pa.array(slots, type=pa.int64())).to_pylist()
        typ = view.arr.type
        if pa.types.is_nested(typ):
            # type-driven conversion so map cells — at ANY nesting depth,
            # EMPTY ones included — render as JSON objects, matching the
            # row-wise engine's converted instances
            from .rowwise import _value_from_typed
            vals = [_value_from_typed(v, typ) for v in vals]
        return [M.fmt_value(v) for v in vals]

    def _emit(self, sink: list[VBlock], view: View, fail: np.ndarray,
              keyword: str, kw_loc: str, message: str,
              offending: Optional[list[str]] = None,
              inst_locs: Optional[list[str]] = None):
        slots = np.nonzero(fail)[0]
        if len(slots) == 0:
            return
        sink.append(VBlock(
            rows=view.batch_rows(slots), keyword=keyword,
            keyword_location=kw_loc,
            instance_locations=inst_locs if inst_locs is not None
            else view.locs(slots),
            message=message,
            offending=offending if offending is not None
            else self._offending(view, slots),
            slots=slots))

    def _members(self, view: View) -> dict[str, Callable[[], View]]:
        """Lazy member accessors for object views (root table columns or
        struct fields)."""
        out: dict[str, Callable[[], View]] = {}
        if view.table is not None:
            for name in view.table.column_names:
                out[name] = (lambda nm=name: column_view(view.table, nm))
        elif view.arr is not None and pa.types.is_struct(view.arr.type):
            for f in view.arr.type:
                def mk(nm=f.name):
                    child = pc.struct_field(view.arr, nm)
                    child = _combine(child)
                    pres = _valid_np(child) & view.present
                    if view.elem_pos is not None:
                        # struct element of a list: the field name goes
                        # AFTER the element index ("/arr/3/p")
                        sfx = (f"{view.field_suffix}/{_esc(nm)}"
                               if view.field_suffix else _esc(nm))
                        return View(n=view.n, kind=arrow_kind(child.type),
                                    arr=child, table=None, present=pres,
                                    rows=view.rows,
                                    loc_prefix=view.loc_prefix,
                                    loc_prefix_arr=view.loc_prefix_arr,
                                    elem_pos=view.elem_pos,
                                    field_suffix=sfx)
                    return View(n=view.n, kind=arrow_kind(child.type),
                                arr=child, table=None, present=pres,
                                rows=view.rows,
                                loc_prefix=f"{view.loc_prefix}/{_esc(nm)}",
                                loc_prefix_arr=view.loc_prefix_arr,
                                elem_pos=view.elem_pos)
                out[f.name] = mk
        return out

    def _member_present(self, view: View, name: str,
                        notes: Optional[dict] = None) -> np.ndarray:
        """Presence mask for member `name` (absent column -> all-absent)."""
        notes = notes if notes is not None else {}
        if view.table is not None:
            if name not in view.table.column_names:
                return np.zeros(view.n, dtype=bool)
            return column_view(view.table, name).present
        if view.arr is not None and pa.types.is_struct(view.arr.type):
            if view.arr.type.get_field_index(name) < 0:
                return np.zeros(view.n, dtype=bool)
            child = _combine(pc.struct_field(view.arr, name))
            return _valid_np(child) & view.present
        if self._is_map(view):
            # a map ENTRY is present even with a null value (explicit
            # member, unlike a struct's null field)
            keys, _, offsets, _ = self._map_entries(view, notes)
            hit = (keys == name).astype(np.int64)
            return _segment_sum(hit, offsets) > 0
        return np.zeros(view.n, dtype=bool)

    def _is_map(self, view: View) -> bool:
        return view.arr is not None and pa.types.is_map(view.arr.type)

    def _map_entries(self, view: View, notes: dict) -> tuple:
        """Flatten a map-typed object view into its (key, value) entries —
        the fully-dynamic instance path (validator.go:539-629). Entries
        with a NULL value are dropped: a null member is an ABSENT member
        (the module's tabular convention, same as struct fields and the
        row-wise oracle's _present_members). Returns (keys: np object
        array, entry_view, offsets, flat_parent); cached in `notes` so
        every keyword in the node shares one flatten."""
        cached = notes.get("_map_flat")
        if cached is not None:
            return cached
        arr = view.arr
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        start, end = offs[:-1].copy(), offs[1:].copy()
        absent = ~view.present
        end[absent] = start[absent]
        lengths = end - start
        flat_idx = _ranges_concat(start, lengths)
        raw_parent = np.repeat(np.arange(view.n), lengths)
        take0 = pa.array(flat_idx, type=pa.int64())
        vals_all = _combine(arr.items).take(take0)
        keep = _valid_np(vals_all)
        kept = np.nonzero(keep)[0]
        vals = vals_all.take(pa.array(kept, type=pa.int64()))
        keys = _combine(arr.keys).take(
            pa.array(flat_idx[kept], type=pa.int64()))
        keys_np = keys.to_numpy(zero_copy_only=False)
        flat_parent = raw_parent[kept]
        kept_lengths = np.bincount(flat_parent, minlength=view.n) \
            .astype(np.int64)
        offsets = np.zeros(view.n + 1, dtype=np.int64)
        np.cumsum(kept_lengths, out=offsets[1:])
        if view.elem_pos is None and view.loc_prefix_arr is None:
            ev = View(n=len(kept), kind=arrow_kind(vals.type),
                      arr=vals, table=None,
                      present=np.ones(len(kept), dtype=bool),
                      rows=view.batch_rows(flat_parent),
                      loc_prefix=view.loc_prefix, elem_key=keys_np)
        else:  # map nested under list elements: parent locs as prefixes
            parent_locs = np.array(view.locs(np.arange(view.n)),
                                   dtype=object)
            ev = View(n=len(kept), kind=arrow_kind(vals.type),
                      arr=vals, table=None,
                      present=np.ones(len(kept), dtype=bool),
                      rows=view.batch_rows(flat_parent),
                      loc_prefix="",
                      loc_prefix_arr=parent_locs[flat_parent],
                      elem_key=keys_np)
        out = (keys_np, ev, offsets, flat_parent)
        notes["_map_flat"] = out
        return out

    def _elements_view(self, view: View) -> Optional[tuple]:
        """Flatten a list-typed view: returns (elem_view, offsets,
        flat_rows) or None if not a list. offsets has n+1 entries into the
        flat domain; flat_rows maps flat slot -> parent slot."""
        if view.kind != "array" or view.arr is None:
            return None
        arr = view.arr
        if pa.types.is_fixed_size_list(arr.type):
            # null rows contribute ZERO elements (same compaction as the
            # variable-length branch) — the raw child buffer has k
            # phantom slots per null row that would leak violations
            k = arr.type.list_size
            start = np.arange(view.n, dtype=np.int64) * k
            lengths = np.full(view.n, k, dtype=np.int64)
            lengths[~view.present] = 0
            offsets = np.zeros(view.n + 1, dtype=np.int64)
            np.cumsum(lengths, out=offsets[1:])
            flat_idx = _ranges_concat(start, lengths)
            values = _combine(arr.values).take(
                pa.array(flat_idx, type=pa.int64()))
        else:
            # null slots have offset[i]==offset[i+1] after this fill
            la = arr
            offs = la.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            start = offs[:-1].copy()
            end = offs[1:].copy()
            absent = ~view.present
            end[absent] = start[absent]
            # rebuild compacted flat domain
            lengths = end - start
            offsets = np.zeros(view.n + 1, dtype=np.int64)
            np.cumsum(lengths, out=offsets[1:])
            flat_idx = _ranges_concat(start, lengths)
            values = _combine(la.values).take(
                pa.array(flat_idx, type=pa.int64()))
        lengths = offsets[1:] - offsets[:-1]
        flat_parent = np.repeat(np.arange(view.n), lengths)
        elem_pos = np.arange(offsets[-1]) - offsets[flat_parent]
        parent_rows = view.batch_rows(flat_parent)
        # element locations: parent loc prefix is constant for column views;
        # for nested lists compose via parent's elem positions (rare).
        if view.elem_pos is None and view.loc_prefix_arr is None:
            ev = View(n=int(offsets[-1]), kind=arrow_kind(values.type),
                      arr=values, table=None, present=_valid_np(values),
                      rows=parent_rows, loc_prefix=view.loc_prefix,
                      elem_pos=elem_pos, null_as_value=True)
        else:  # nested list-of-list: parent locations (incl. outer
            # indices) become per-slot prefixes for the inner elements
            parent_locs = np.array(view.locs(np.arange(view.n)),
                                   dtype=object)
            ev = View(n=int(offsets[-1]), kind=arrow_kind(values.type),
                      arr=values, table=None, present=_valid_np(values),
                      rows=parent_rows, loc_prefix="",
                      loc_prefix_arr=parent_locs[flat_parent],
                      elem_pos=elem_pos, null_as_value=True)
        return ev, offsets, flat_parent

    # -- main recursion ----------------------------------------------

    def _eval(self, node: SchemaNode, view: View, kw_loc: str, depth: int,
              sink: list[VBlock]) -> tuple[np.ndarray, Ann]:
        if depth > MAX_DEPTH:
            raise RecursionError(f"schema depth cap exceeded at {kw_loc}")
        # entering a schema resource records its $dynamicAnchors
        # first-wins (builder.go:180-211 record/clear parts analog)
        dyn = getattr(self, "_dyn", None)
        if dyn is not None and node.resource_anchors:
            inserted = []
            for k, v in node.resource_anchors.items():
                if k not in dyn:
                    dyn[k] = v
                    inserted.append(k)
            try:
                return self._eval_body(node, view, kw_loc, depth, sink)
            finally:
                for k in inserted:
                    dyn.pop(k, None)
        return self._eval_body(node, view, kw_loc, depth, sink)

    def _eval_body(self, node: SchemaNode, view: View, kw_loc: str,
                   depth: int, sink: list[VBlock]) -> tuple[np.ndarray, Ann]:
        n = view.n
        ann = Ann()
        ones = np.ones(n, dtype=bool)
        if node.bool_value is not None:
            if node.bool_value:
                return ones, ann
            # the false schema rejects EVERY instance, including a null
            # list element (which IS a value, not an absent member)
            fail = ones.copy() if view.null_as_value else view.present.copy()
            self._emit(sink, view, fail, "$bool", kw_loc,
                       M.message("$bool", None))
            return ~fail, ann

        mask = ones.copy()
        notes: dict[str, Any] = {}
        pres = view.present

        for part in node.parts:
            kw, arg = part.keyword, part.value
            kloc = f"{kw_loc}/{kw}"
            m = self._eval_keyword(node, kw, arg, view, kloc, depth, sink,
                                   notes, ann)
            if m is not None:
                # vacuous pass on ABSENT members for everything but
                # required; null list elements are JSON null values, so no
                # vacuity — each keyword handles kind-null itself (numeric/
                # string/array keywords pass it, type/enum/const fail it)
                if not view.null_as_value and \
                        kw not in ("required", "dependentRequired"):
                    m = m | ~pres
                mask &= m
        return mask, ann

    def _eval_keyword(self, node, kw, arg, view: View, kloc, depth, sink,
                      notes, ann) -> Optional[np.ndarray]:
        """Returns the pass mask for one keyword, emitting violations into
        sink. None means annotation-only/always-valid keyword."""
        n, kind, pres = view.n, view.kind, view.present
        # `inst` = slots holding an instance the universal keywords (type/
        # enum/const/combinators) apply to: null list elements count, an
        # absent object member does not
        inst = np.ones(n, dtype=bool) if view.null_as_value else pres

        # ---------------- leaf assertions ----------------
        if kw == "type":
            ok = self._type_mask(view, arg)
            self._emit(sink, view, inst & ~ok, kw, kloc, M.message(kw, arg))
            return ok
        if kw == "enum":
            ok = self._enum_mask(view, arg)
            self._emit(sink, view, inst & ~ok, kw, kloc, M.message(kw, arg))
            return ok
        if kw == "const":
            ok = self._enum_mask(view, [arg])
            self._emit(sink, view, inst & ~ok, kw, kloc, M.message(kw, arg))
            return ok
        if kw in ("maximum", "minimum", "exclusiveMaximum",
                  "exclusiveMinimum", "multipleOf"):
            vals, app = view.numeric()
            if kw == "maximum":
                bad = vals > arg
            elif kw == "minimum":
                bad = vals < arg
            elif kw == "exclusiveMaximum":
                bad = vals >= arg
            elif kw == "exclusiveMinimum":
                bad = vals <= arg
            else:  # multipleOf (validator.go:901-913)
                with np.errstate(invalid="ignore", divide="ignore"):
                    quo = vals / arg
                bad = ~np.isfinite(quo) | (quo != np.trunc(quo))
            bad &= app
            self._emit(sink, view, bad, kw, kloc, M.message(kw, arg))
            return ~bad
        if kw in ("maxLength", "minLength"):
            if kind != "string":
                return None
            ln = pc.utf8_length(view.arr).to_numpy(zero_copy_only=False)
            ln = np.where(pres, ln, 0)
            bad = (ln > arg) if kw == "maxLength" else (ln < arg)
            bad &= pres
            self._emit(sink, view, bad, kw, kloc, M.message(kw, arg))
            return ~bad
        if kw == "pattern":
            if kind != "string":
                return None
            # RE2 semantics match Go's regexp (validator.go:1002-1020);
            # match_substring_regex is unanchored like MatchString
            ok = pc.match_substring_regex(view.arr, arg).to_numpy(
                zero_copy_only=False).astype(bool)
            ok = np.where(pres, ok, True)
            self._emit(sink, view, pres & ~ok, kw, kloc, M.message(kw, arg))
            return ok
        if kw in ("maxItems", "minItems"):
            if kind != "array":
                return None
            ln = pc.list_value_length(view.arr).to_numpy(zero_copy_only=False)
            ln = np.where(pres, ln, 0)
            bad = (ln > arg) if kw == "maxItems" else (ln < arg)
            bad &= pres
            self._emit(sink, view, bad, kw, kloc, M.message(kw, arg))
            return ~bad
        if kw == "uniqueItems":
            if kind != "array" or not arg:
                return None
            ok = self._unique_items_mask(view)
            self._emit(sink, view, pres & ~ok, kw, kloc, M.message(kw, arg))
            return ok
        if kw in ("maxProperties", "minProperties"):
            if kind != "object":
                return None
            cnt = self._prop_counts(view, notes)
            bad = (cnt > arg) if kw == "maxProperties" else (cnt < arg)
            bad &= pres
            self._emit(sink, view, bad, kw, kloc, M.message(kw, arg),
                       offending=[str(c) for c in cnt[np.nonzero(bad)[0]]])
            return ~bad
        if kw == "required":
            if kind != "object":
                return None
            ok = np.ones(n, dtype=bool)
            for name in arg:
                p = self._member_present(view, name, notes)
                miss = pres & ~p
                ok &= ~miss
                self._emit(sink, view, miss, kw, kloc,
                           M.required_message(name),
                           offending=["null"] * int(miss.sum()))
            return ok
        if kw == "dependentRequired":
            if kind != "object":
                return None
            ok = np.ones(n, dtype=bool)
            for key, names in arg.items():
                kp = self._member_present(view, key, notes)
                for nm in names:
                    miss = pres & kp & ~self._member_present(view, nm, notes)
                    ok &= ~miss
                    self._emit(sink, view, miss, kw, kloc,
                               M.dependent_required_message(key, nm),
                               offending=["null"] * int(miss.sum()))
            return ok
        if kw == "format":
            if not self.validate_format or kind != "string":
                return None
            ok = self._format_mask(view, arg)
            if ok is None:
                return None  # unknown format: always valid
            self._emit(sink, view, pres & ~ok, kw, kloc, M.message(kw, arg))
            return ok

        # ---------------- combinators ----------------
        if kw in ("allOf", "anyOf", "oneOf"):
            subs = []
            for i, s in enumerate(arg):
                tmp: list[VBlock] = []
                sm, sa = self._eval(s, view, f"{kloc}/{i}", depth + 1, tmp)
                subs.append((sm, sa, tmp))
            if kw == "allOf":
                ok = np.ones(n, dtype=bool)
                for sm, _, _ in subs:
                    ok &= sm
                for sm, sa, tmp in subs:
                    sink.extend(tmp)  # all child errors surface
                    ann.merge(sa, gate=self._row_gate(view, ok))
                return ok
            stack = np.stack([sm for sm, _, _ in subs])
            npass = stack.sum(axis=0)
            if kw == "anyOf":
                ok = npass > 0
                # child violations suppressed; combinator's own violation
                # where all subs fail (deterministic tabular variant of
                # validator.go:89-121)
                self._emit(sink, view, inst & ~ok, kw, kloc,
                           M.message(kw, arg))
            else:
                ok = npass == 1
                none = inst & (npass == 0)
                multi = inst & (npass > 1)
                self._emit(sink, view, none, "oneOf", kloc,
                           M.MESSAGES["oneOf:none"](arg))
                self._emit(sink, view, multi, "oneOf", kloc,
                           M.MESSAGES["oneOf:multi"](arg))
            for sm, sa, _ in subs:
                ann.merge(sa, gate=self._row_gate(view, sm & ok))
            return ok
        if kw == "not":
            tmp: list[VBlock] = []
            sm, _ = self._eval(arg, view, kloc, depth + 1, tmp)
            bad = inst & sm
            self._emit(sink, view, bad, kw, kloc, M.message(kw, arg))
            return ~bad
        if kw == "if":
            tmp = []
            sm, sa = self._eval(arg, view, kloc, depth + 1, tmp)
            notes["if"] = sm
            ann.merge(sa, gate=self._row_gate(view, sm))
            return None
        if kw in ("then", "else"):
            cond = notes.get("if")
            if cond is None:
                return None
            gate = cond if kw == "then" else ~cond
            tmp = []
            sm, sa = self._eval(arg, view, kloc, depth + 1, tmp)
            gate_rows = self._row_gate(view, gate)
            sink.extend(_gate_blocks(tmp, gate_rows))
            ann.merge(sa, gate=self._row_gate(view, gate & sm))
            return sm | ~gate
        if kw == "dependentSchemas" or (kw == "dependencies"
                                        and isinstance(arg, dict)):
            if kind != "object":
                return None
            ok = np.ones(n, dtype=bool)
            for key, sub in arg.items():
                kp = self._member_present(view, key, notes)
                if isinstance(sub, list):  # dependencies string-array form
                    for nm in sub:
                        miss = pres & kp & \
                            ~self._member_present(view, nm, notes)
                        ok &= ~miss
                        self._emit(sink, view, miss, "dependencies", kloc,
                                   M.dependent_required_message(key, nm),
                                   offending=["null"] * int(miss.sum()))
                    continue
                tmp = []
                sm, sa = self._eval(sub, view, f"{kloc}/{_esc(key)}",
                                    depth + 1, tmp)
                gate_rows = self._row_gate(view, kp)
                sink.extend(_gate_blocks(tmp, gate_rows))
                ann.merge(sa, gate=self._row_gate(view, kp & sm))
                ok &= sm | ~kp
            return ok

        # ---------------- object applicators ----------------
        if kw in ("properties", "patternProperties", "additionalProperties",
                  "propertyNames", "unevaluatedProperties") \
                and self._is_map(view):
            return self._eval_map_object_kw(kw, arg, view, kloc, depth,
                                            sink, notes, ann)
        if kw == "properties":
            if kind != "object":
                return None
            members = self._members(view)
            ok = np.ones(n, dtype=bool)
            claimed = notes.setdefault("claimed_keys", set())
            for name, sub in arg.items():
                claimed.add(name)
                if name not in members:
                    continue
                child = members[name]()
                ann.keys[name] = child.present.copy() \
                    if name not in ann.keys else (ann.keys[name]
                                                  | child.present)
                sm, _ = self._eval(sub, child, f"{kloc}/{_esc(name)}",
                                   depth + 1, sink)
                ok &= sm
            return ok
        if kw == "patternProperties":
            if kind != "object":
                return None
            members = self._members(view)
            ok = np.ones(n, dtype=bool)
            claimed = notes.setdefault("claimed_keys", set())
            for pat, sub in arg.items():
                rex = self._re(pat)
                for name in members:
                    if not rex.search(name):
                        continue
                    claimed.add(name)
                    child = members[name]()
                    ann.keys[name] = child.present.copy() \
                        if name not in ann.keys else (ann.keys[name]
                                                      | child.present)
                    sm, _ = self._eval(sub, child, f"{kloc}/{_esc(pat)}",
                                       depth + 1, sink)
                    ok &= sm
            return ok
        if kw == "additionalProperties":
            if kind != "object":
                return None
            members = self._members(view)
            claimed = notes.get("claimed_keys", set())
            ok = np.ones(n, dtype=bool)
            for name in members:
                if name in claimed:
                    continue
                child = members[name]()
                ann.keys[name] = child.present.copy() \
                    if name not in ann.keys else (ann.keys[name]
                                                  | child.present)
                tmp: list[VBlock] = []
                sm, _ = self._eval(arg, child, kloc, depth + 1, tmp)
                bad = child.present & ~sm
                # message rewrite (validator.go:589-629)
                self._emit(sink, child, bad, "additionalProperties", kloc,
                           M.unknown_property_message(name))
                ok &= ~bad
            return ok
        if kw == "propertyNames":
            if kind != "object":
                return None
            members = self._members(view)
            ok = np.ones(n, dtype=bool)
            for name in members:
                name_ok, _, _ = self.row_eval._eval(arg, name, kloc, "", 0)
                if not name_ok:
                    p = self._member_present(view, name)
                    self._emit(sink, view, p, "propertyNames", kloc,
                               M.property_names_message(name),
                               offending=[name] * int(p.sum()))
                    ok &= ~p
            return ok

        # ---------------- array applicators ----------------
        if kw in ("prefixItems", "items", "contains", "unevaluatedItems"):
            if kind != "array":
                return None
            flat = notes.get("_flat")
            if flat is None:
                flat = notes["_flat"] = self._elements_view(view)
            if flat is None:
                return None
            ev, offsets, flat_parent = flat
            if kw == "prefixItems":
                ok = np.ones(n, dtype=bool)
                kcount = len(arg)
                notes["prefix_len"] = kcount
                covered = ev.elem_pos < kcount
                self._ann_items(ann, covered, flat_parent)
                for i, sub in enumerate(arg):
                    sel = ev.elem_pos == i
                    if not sel.any():
                        break
                    sel_idx = np.nonzero(sel)[0]
                    sub_view = _subset_view(ev, sel_idx)
                    tmp = []
                    sm, _ = self._eval(sub, sub_view, f"{kloc}/{i}",
                                       depth + 1, tmp)
                    parent_slots = flat_parent[sel_idx]
                    sink.extend(_remap_slots(tmp, parent_slots))
                    bad_parents = parent_slots[~sm]
                    okk = np.ones(n, dtype=bool)
                    okk[bad_parents] = False
                    ok &= okk
                return ok
            if kw == "items":
                start = notes.get("prefix_len", 0)
                sel = ev.elem_pos >= start
                self._ann_items(ann, sel, flat_parent)
                idx = np.nonzero(sel)[0]
                sub_view = _subset_view(ev, idx)
                tmp = []
                sm, _ = self._eval(arg, sub_view, kloc, depth + 1, tmp)
                sink.extend(_remap_slots(tmp, flat_parent[idx]))
                ok = np.ones(n, dtype=bool)
                bad_parents = flat_parent[idx[~sm]]
                ok[bad_parents] = False
                return ok
            if kw == "contains":
                tmp = []
                sm, _ = self._eval(arg, ev, kloc, depth + 1, tmp)
                # sm is null-accurate (a null element passes subschemas it
                # vacuously satisfies and counts as a match, like rowwise)
                counts = _segment_sum(sm, offsets)
                notes["contains_count"] = counts
                self._ann_items(ann, sm, flat_parent)
                min_c = node.get("minContains")
                if min_c == 0:  # always-true bypass (validator.go:386-402)
                    return np.ones(n, dtype=bool)
                bad = pres & (counts == 0)
                self._emit(sink, view, bad, kw, kloc, M.message(kw, arg))
                return ~bad
            if kw == "unevaluatedItems":
                seen = ann.items if ann.items is not None \
                    else np.zeros(ev.n, dtype=bool)
                sel = ~seen
                self._ann_items(ann, sel, flat_parent)
                idx = np.nonzero(sel)[0]
                if len(idx) == 0:
                    return None
                sub_view = _subset_view(ev, idx)
                tmp = []
                sm, _ = self._eval(arg, sub_view, kloc, depth + 1, tmp)
                bad_slots = idx[~sm]
                ok = np.ones(n, dtype=bool)
                ok[flat_parent[bad_slots]] = False
                bad_view_slots = np.ones(len(bad_slots), dtype=bool)
                tmp2: list[VBlock] = []
                self._emit(tmp2, _subset_view(ev, bad_slots),
                           bad_view_slots, "unevaluatedItems", kloc,
                           M.message("unevaluatedItems", arg))
                sink.extend(_remap_slots(tmp2, flat_parent[bad_slots]))
                return ok
        if kw in ("maxContains", "minContains"):
            counts = notes.get("contains_count")
            if counts is None or kind != "array":
                return None
            bad = (counts > arg) if kw == "maxContains" else (counts < arg)
            bad &= pres
            self._emit(sink, view, bad, kw, kloc, M.message(kw, arg),
                       offending=[str(c) for c in counts[np.nonzero(bad)[0]]])
            return ~bad
        if kw == "unevaluatedProperties":
            if kind != "object":
                return None
            members = self._members(view)
            ok = np.ones(n, dtype=bool)
            for name in members:
                child = members[name]()
                seen = ann.keys.get(name)
                unseen = child.present if seen is None \
                    else (child.present & ~seen)
                if not unseen.any():
                    continue
                tmp = []
                sm, _ = self._eval(arg, child, kloc, depth + 1, tmp)
                bad = unseen & ~sm
                self._emit(sink, child, bad, "unevaluatedProperties", kloc,
                           M.unevaluated_property_message(name))
                ok &= ~bad
                ann.keys[name] = child.present.copy() if seen is None \
                    else (seen | child.present)
            return ok
        if kw in ("$ref", "$dynamicRef"):
            tgt = self.rs.ref_target(node, kw)
            if kw == "$dynamicRef" and isinstance(arg, str) and "#" in arg:
                frag = arg.split("#", 1)[1]
                # dynamic-scope lookup applies to ANY anchor-fragment form
                # ("#x" or "res#x"), and ONLY when the statically-resolved
                # target itself declares $dynamicAnchor == frag — the
                # bookending rule (2020-12 §8.2.3.2); otherwise behave as
                # plain $ref
                if frag and not frag.startswith("/") and tgt is not None \
                        and tgt.get("$dynamicAnchor") == frag:
                    tgt = (getattr(self, "_dyn", None) or {}).get(frag,
                                                                  tgt)
            if tgt is None:
                return None
            tmp = []
            sm, sa = self._eval(tgt, view, tgt.location, depth + 1, tmp)
            sink.extend(tmp)
            ann.merge(sa, gate=self._row_gate(view, sm))
            return sm
        # registered custom keywords (RegisterVocabulary analog,
        # schema.go:1293-1330)
        from .extensions import lookup_keyword
        custom = lookup_keyword(kw)
        if custom is not None and view.arr is not None \
                and kind != "object":  # rowwise skips objects too
            row_fn, vector_fn = custom
            if vector_fn is not None:
                ok = np.asarray(vector_fn(view.arr, arg), dtype=bool)
            elif pa.types.is_nested(view.arr.type):
                # pc.unique has no nested kernels: plain per-row loop over
                # converted instances (matches the rowwise call contract)
                from .rowwise import _value_from_typed
                t = view.arr.type
                ok = np.array(
                    [True if v is None
                     else bool(row_fn(_value_from_typed(v, t), arg))
                     for v in view.arr.to_pylist()], dtype=bool)
            else:  # unique-value memoized python fallback
                uniq = pc.unique(view.arr)
                uok = pa.array([bool(row_fn(u, arg)) if u is not None
                                else True for u in uniq.to_pylist()],
                               type=pa.bool_())
                idx = pc.index_in(view.arr, value_set=uniq)
                ok = pc.take(uok, idx).to_numpy(
                    zero_copy_only=False).astype(bool)
            ok = np.where(pres, ok, True)
            self._emit(sink, view, pres & ~ok, kw, kloc,
                       M.message(kw, arg))
            return ok
        # annotations / unknown keywords: always valid (schema.go:521-531)
        return None

    # -- map-typed (open-object) applicators ---------------------------

    def _eval_map_object_kw(self, kw, arg, view: View, kloc, depth, sink,
                            notes, ann) -> Optional[np.ndarray]:
        """properties / patternProperties / additionalProperties /
        propertyNames / unevaluatedProperties over a ``pa.map_`` column —
        the fully-dynamic instance path (validator.go:539-629, 713-750):
        member names are per-row data, so claims are tracked as a flat
        ENTRY mask instead of a name set."""
        n = view.n
        keys, ev, offsets, flat_parent = self._map_entries(view, notes)
        ok = np.ones(n, dtype=bool)
        claimed = notes.setdefault(
            "map_claimed", np.zeros(ev.n, dtype=bool))

        def eval_entries(sub, sel: np.ndarray, sub_kloc: str,
                         message: Optional[Callable] = None,
                         keyword: Optional[str] = None) -> None:
            idx = np.nonzero(sel)[0]
            if len(idx) == 0:
                return
            sub_view = _subset_view(ev, idx)
            tmp: list[VBlock] = []
            sm, _ = self._eval(sub, sub_view, sub_kloc, depth + 1, tmp)
            if message is None:
                sink.extend(_remap_slots(tmp, flat_parent[idx]))
            else:  # rewritten per-entry message (additional/unevaluated)
                bad_idx = np.nonzero(~sm)[0]
                bad_keys = keys[idx[bad_idx]]
                for name in np.unique(bad_keys) if len(bad_keys) else []:
                    grp = bad_idx[bad_keys == name]
                    tmp2: list[VBlock] = []
                    self._emit(tmp2, _subset_view(sub_view, grp),
                               np.ones(len(grp), dtype=bool), keyword,
                               sub_kloc, message(str(name)))
                    sink.extend(_remap_slots(tmp2, flat_parent[idx[grp]]))
            ok[flat_parent[idx[~sm]]] = False

        if kw == "properties":
            for name, sub in arg.items():
                sel = keys == name
                claimed |= sel
                self._ann_map(ann, sel, flat_parent)
                eval_entries(sub, sel, f"{kloc}/{_esc(name)}")
            return ok
        if kw == "patternProperties":
            for pat, sub in arg.items():
                # parse_node already rejects RE2-invalid patterns
                # (model._check_regex), so the RE2 kernel cannot raise
                m = pc.match_substring_regex(
                    pa.array(keys, type=pa.string()), pat).to_numpy(
                    zero_copy_only=False).astype(bool)
                claimed |= m
                self._ann_map(ann, m, flat_parent)
                eval_entries(sub, m, f"{kloc}/{_esc(pat)}")
            return ok
        if kw == "additionalProperties":
            sel = ~claimed
            self._ann_map(ann, sel, flat_parent)
            eval_entries(arg, sel, kloc,
                         message=M.unknown_property_message,
                         keyword="additionalProperties")
            return ok
        if kw == "propertyNames":
            uniq, inv = np.unique(keys, return_inverse=True) if ev.n \
                else (np.array([], dtype=object), np.array([], dtype=int))
            bad_names = np.array(
                [not self.row_eval._eval(arg, str(u), kloc, "", 0)[0]
                 for u in uniq], dtype=bool)
            for name in uniq[bad_names] if ev.n else []:
                bidx = np.nonzero(keys == name)[0]
                parent_fail = np.zeros(n, dtype=bool)
                parent_fail[flat_parent[bidx]] = True
                # like the struct path: reported at the OBJECT location
                self._emit(sink, view, parent_fail, "propertyNames",
                           kloc, M.property_names_message(str(name)),
                           offending=[str(name)] * int(parent_fail.sum()))
                ok &= ~parent_fail
            return ok
        if kw == "unevaluatedProperties":
            seen = ann.map_entries if ann.map_entries is not None \
                else np.zeros(ev.n, dtype=bool)
            sel = ~seen
            self._ann_map(ann, sel, flat_parent)
            eval_entries(arg, sel, kloc,
                         message=M.unevaluated_property_message,
                         keyword="unevaluatedProperties")
            return ok
        return None

    def _ann_map(self, ann: Ann, flat_mask: np.ndarray,
                 flat_parent: Optional[np.ndarray] = None):
        ann.map_entries = flat_mask.copy() if ann.map_entries is None \
            else (ann.map_entries | flat_mask)
        if ann.map_rows is None and flat_parent is not None:
            ann.map_rows = flat_parent

    # -- keyword helpers ----------------------------------------------

    def _row_gate(self, view: View, slot_mask: np.ndarray) -> np.ndarray:
        """Convert a slot-level mask to a gate usable on the same view's
        slots (identity — views share the slot domain within one node)."""
        return slot_mask

    def _ann_items(self, ann: Ann, flat_mask: np.ndarray,
                   flat_parent: Optional[np.ndarray] = None):
        ann.items = flat_mask.copy() if ann.items is None \
            else (ann.items | flat_mask)
        if ann.items_rows is None and flat_parent is not None:
            ann.items_rows = flat_parent

    def _type_mask(self, view: View, names: list[str]) -> np.ndarray:
        kind, pres, n = view.kind, view.present, view.n
        ok = np.zeros(n, dtype=bool)
        for name in names:
            if name == kind or (name == "number" and kind == "integer") \
                    or (name == "string" and kind == "datetime"):
                ok |= pres
            elif name == "integer" and kind == "number":
                vals, app = view.numeric()
                ok |= app & np.isfinite(vals) & (vals == np.trunc(vals))
            elif name == "null":
                # a null LIST ELEMENT is the JSON value null and matches;
                # an absent member is vacuous via the |~pres below; a true
                # all-null column has kind 'null' (matched above)
                if view.null_as_value:
                    ok |= ~pres
        if view.null_as_value:
            # null elements match only type 'null'; everything else fails
            return ok
        return ok | ~pres

    def _enum_mask(self, view: View, values: list[Any]) -> np.ndarray:
        n, pres = view.n, view.present
        if view.arr is None:  # root object view: deep-equal impossible
            return np.zeros(n, dtype=bool)
        kind = view.kind
        # null list elements are the JSON value null: they match only if
        # null is among the enum values (absent members stay vacuous)
        null_ok = (~pres & any(v is None for v in values)) \
            if view.null_as_value else ~pres
        simple = [v for v in values if not isinstance(v, (list, dict))]
        if kind in ("integer", "number"):
            cand = [float(v) for v in simple
                    if isinstance(v, (int, float))
                    and not isinstance(v, bool)]
            if not cand:
                return null_ok
            vals, app = view.numeric()
            ok = np.isin(vals, np.array(cand)) & app
            return ok | null_ok
        if kind in ("string", "boolean"):
            cand = [v for v in simple
                    if (isinstance(v, str) if kind == "string"
                        else isinstance(v, bool))]
            if not cand:
                return null_ok
            ok = pc.is_in(view.arr,
                          value_set=pa.array(cand, type=view.arr.type)
                          ).to_numpy(zero_copy_only=False).astype(bool)
            return (ok & pres) | null_ok
        # complex values (arrays/objects): per-row deep equality on the
        # rare path
        pyvals = view.arr.to_pylist()
        ok = np.fromiter(
            (any(deep_equal(x, v) for v in values) if x is not None else False
             for x in pyvals), count=n, dtype=bool)
        return ok | null_ok

    def _unique_items_mask(self, view: View) -> np.ndarray:
        """Per-row within-array uniqueness (validator.go:1067-1111):
        lexsort flat values by (row, value); duplicates are adjacent."""
        flat = self._elements_view(view)
        if flat is None:
            return np.ones(view.n, dtype=bool)
        ev, offsets, flat_parent = flat
        if ev.n == 0:
            return np.ones(view.n, dtype=bool)
        vals = ev.arr.to_numpy(zero_copy_only=False)
        valid = _valid_np(ev.arr)
        try:
            # nulls sort as their own group (validity is a sort channel):
            # a genuine float NaN element must NOT pair with a null — two
            # JSON nulls are EQUAL (rowwise deep_equal) while NaN != NaN
            order = np.lexsort((vals, ~valid, flat_parent))
        except TypeError:
            # nested/unhashable elements (list<struct>, list<list>):
            # pairwise deep_equal per row, the rowwise oracle's semantics
            from .rowwise import _value_from_typed, deep_equal
            t = ev.arr.type
            conv = [_value_from_typed(v, t) for v in ev.arr.to_pylist()]
            ok = np.ones(view.n, dtype=bool)
            for r in range(view.n):
                items = conv[offsets[r]:offsets[r + 1]]
                done = False
                for i in range(len(items)):
                    for j in range(i + 1, len(items)):
                        if deep_equal(items[i], items[j]):
                            ok[r] = False
                            done = True
                            break
                    if done:
                        break
            return ok
        sv, sp, sval = vals[order], flat_parent[order], valid[order]
        dup = np.zeros(ev.n, dtype=bool)
        if ev.n > 1:
            eq = (sv[1:] == sv[:-1]) & sval[1:] & sval[:-1]
            eq |= ~sval[1:] & ~sval[:-1]  # null == null
            dup[1:] = (sp[1:] == sp[:-1]) & eq
        bad_rows = np.unique(sp[dup])
        ok = np.ones(view.n, dtype=bool)
        ok[bad_rows] = False
        return ok

    def _prop_counts(self, view: View,
                     notes: Optional[dict] = None) -> np.ndarray:
        notes = notes if notes is not None else {}
        if view.table is not None:
            cnt = np.zeros(view.n, dtype=np.int64)
            for name in view.table.column_names:
                cnt += column_view(view.table, name).present
            return cnt
        if view.arr is not None and pa.types.is_struct(view.arr.type):
            cnt = np.zeros(view.n, dtype=np.int64)
            for f in view.arr.type:
                child = _combine(pc.struct_field(view.arr, f.name))
                cnt += _valid_np(child)
            return cnt
        if view.arr is not None and pa.types.is_map(view.arr.type):
            # count non-null-valued entries (null member = absent)
            _, _, offsets, _ = self._map_entries(view, notes)
            return (offsets[1:] - offsets[:-1]).astype(np.int64)
        return np.zeros(view.n, dtype=np.int64)

    def _format_mask(self, view: View, name: str) -> Optional[np.ndarray]:
        rex = self.format_regex.get(name)
        if rex is not None:
            ok = pc.match_substring_regex(view.arr, rex).to_numpy(
                zero_copy_only=False).astype(bool)
            return np.where(view.present, ok, True)
        fn = self.formats.get(name)
        if fn is None:
            return None
        # unique-value trick: python fn over distinct values only
        uniq = pc.unique(view.arr)
        uok = pa.array([bool(fn(u)) if u is not None else True
                        for u in uniq.to_pylist()], type=pa.bool_())
        idx = pc.index_in(view.arr, value_set=uniq)
        ok = pc.take(uok, idx).to_numpy(zero_copy_only=False)
        ok = np.where(view.present, ok.astype(bool), True)
        return ok


# ---------------------------------------------------------------------------
# numpy helpers


def _ranges_concat(starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Concatenate [s, s+len) index ranges — vectorized."""
    total = int(lengths.sum())
    if total == 0:
        return np.array([], dtype=np.int64)
    rows = np.nonzero(lengths > 0)[0]
    reps = lengths[rows]
    base = np.repeat(starts[rows], reps)
    firsts = np.concatenate(([0], np.cumsum(reps)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(firsts, reps)
    return base + pos


def _segment_sum(flat_bool: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    cum = np.zeros(len(flat_bool) + 1, dtype=np.int64)
    np.cumsum(flat_bool, out=cum[1:])
    return cum[offsets[1:]] - cum[offsets[:-1]]


def _subset_view(ev: View, idx: np.ndarray) -> View:
    return View(n=len(idx), kind=ev.kind,
                arr=ev.arr.take(pa.array(idx, type=pa.int64())),
                table=None, present=ev.present[idx],
                rows=ev.batch_rows(idx), loc_prefix=ev.loc_prefix,
                elem_pos=ev.elem_pos[idx] if ev.elem_pos is not None
                else None, null_as_value=ev.null_as_value,
                elem_key=ev.elem_key[idx] if ev.elem_key is not None
                else None, field_suffix=ev.field_suffix,
                loc_prefix_arr=ev.loc_prefix_arr[idx]
                if ev.loc_prefix_arr is not None else None)
