"""Engine-core edge cases from the round-3 rules review: RE2 policy,
fixed-size-list nulls, nested uniqueItems, decimal columns, dual refs,
resource-scoped dynamic anchors, custom-keyword nested columns."""

import decimal

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jsonschema_ray.rules.model import RuleSetError, parse_ruleset
from jsonschema_ray.rules.rowwise import RowEvaluator, rows_from_table
from jsonschema_ray.rules.vector import BatchValidator


def _both(doc, table):
    """(vector mask, rowwise mask) for one-rule tables."""
    rs = parse_ruleset(doc)
    bv = BatchValidator(rs)
    vmask = bv.mask(table)
    rv = RowEvaluator(rs)
    rmask = np.array([not rv.validate(r) for r in rows_from_table(table)])
    return vmask, rmask


def test_re2_invalid_pattern_rejected_at_parse():
    with pytest.raises(RuleSetError, match="RE2"):
        parse_ruleset({"properties": {"v": {"pattern": "(?=a)a"}}})
    with pytest.raises(RuleSetError, match="RE2"):
        parse_ruleset({"properties": {"v": {
            "patternProperties": {"a(?<=a)": {}}}}})


def test_pattern_ascii_classes_agree():
    # \d is ASCII in RE2 (vector + reference Go); rowwise now uses
    # re.ASCII so Arabic-Indic digits fail BOTH engines
    t = pa.table({"v": ["123", "١٢٣", "x"]})
    doc = {"properties": {"v": {"pattern": "^\\d+$"}}}
    vm, rm = _both(doc, t)
    assert vm.tolist() == rm.tolist() == [True, False, False]


def test_fixed_size_list_null_row_no_phantom_elements():
    arr = pa.array([[1, 2], None, [3, 4]],
                   type=pa.list_(pa.int64(), 2))
    t = pa.table({"v": arr})
    doc = {"properties": {"v": {"items": {"type": "integer"}}}}
    rs = parse_ruleset(doc)
    bv = BatchValidator(rs)
    assert bv.mask(t).tolist() == [True, True, True]
    viol = bv.violations(t)
    assert viol.num_rows == 0                      # no rows for the null


def test_unique_items_list_of_struct():
    arr = pa.array([[{"a": 1}, {"a": 1}], [{"a": 1}, {"a": 2}]],
                   type=pa.list_(pa.struct([("a", pa.int64())])))
    t = pa.table({"v": arr})
    doc = {"properties": {"v": {"uniqueItems": True}}}
    vm, rm = _both(doc, t)
    assert vm.tolist() == rm.tolist() == [False, True]


def test_unique_items_list_of_list():
    arr = pa.array([[[1], [1]], [[1], [2]]],
                   type=pa.list_(pa.list_(pa.int64())))
    t = pa.table({"v": arr})
    doc = {"properties": {"v": {"uniqueItems": True}}}
    vm, rm = _both(doc, t)
    assert vm.tolist() == rm.tolist() == [False, True]


def test_decimal_column_number_semantics():
    arr = pa.array([decimal.Decimal("1.5"), decimal.Decimal("99.5")],
                   type=pa.decimal128(5, 1))
    t = pa.table({"v": arr})
    vm, rm = _both({"properties": {"v": {"type": "number"}}}, t)
    assert vm.tolist() == rm.tolist() == [True, True]
    vm, rm = _both({"properties": {"v": {"maximum": 10}}}, t)
    assert vm.tolist() == rm.tolist() == [True, False]


def test_numeric_string_coercion_agrees():
    t = pa.table({"v": ["nan", "1_000", "12"]})
    vm, rm = _both({"properties": {"v": {"maximum": 500}}}, t)
    # 'nan' and '1_000' are NOT numeric strings in either engine now
    assert vm.tolist() == rm.tolist() == [True, True, True]
    vm, rm = _both({"properties": {"v": {"maximum": 5}}}, t)
    assert vm.tolist() == rm.tolist() == [True, True, False]


def test_ref_and_dynamic_ref_both_enforced():
    doc = {"$defs": {"a": {"type": "integer"},
                     "b": {"maximum": 5}},
           "properties": {"v": {"$ref": "#/$defs/a",
                                "$dynamicRef": "#/$defs/b"}}}
    t = pa.table({"v": pa.array([3, 99], type=pa.int64())})
    vm, rm = _both(doc, t)
    assert vm.tolist() == rm.tolist() == [True, False]


def test_dynamic_anchor_resource_scoped():
    # resA's anchor T must NOT shadow resB's own T: inside resB the
    # dynamic scope contains only resB's anchor (string), so "hello" valid
    doc = {"$defs": {
        "A": {"$id": "resA", "$dynamicAnchor": "T", "type": "integer"},
        "B": {"$id": "resB",
              "$defs": {"anchor": {"$dynamicAnchor": "T",
                                   "type": "string"}},
              "$dynamicRef": "#T"}},
        "properties": {"v": {"$ref": "#/$defs/B"}}}
    t = pa.table({"v": ["hello"]})
    vm, rm = _both(doc, t)
    assert vm.tolist() == rm.tolist() == [True]


def test_custom_keyword_on_list_column():
    from jsonschema_ray.rules.extensions import register_keyword
    register_keyword("x-nonempty-r3", lambda v, a: bool(v))
    t = pa.table({"v": pa.array([[1, 2], [], None],
                                type=pa.list_(pa.int64()))})
    doc = {"properties": {"v": {"x-nonempty-r3": True}}}
    vm, rm = _both(doc, t)
    assert vm.tolist() == rm.tolist() == [True, False, True]


def test_strict_tree_dynamic_ref_spec_example():
    """The 2020-12 spec's canonical $dynamicRef example: strict-tree
    extends tree by $ref'ing it while its OWN $dynamicAnchor 'node'
    overrides the extension point, so unevaluatedProperties: false
    applies at every depth — a 'daat' typo node must fail, and the same
    document WITHOUT the strict wrapper must pass."""
    tree = {"$id": "tree",
            "$dynamicAnchor": "node",
            "type": "object",
            "properties": {
                "data": {"type": "integer"},
                "children": {"type": "array",
                             "items": {"$dynamicRef": "#node"}}}}
    strict = {"$id": "strict-tree",
              "$dynamicAnchor": "node",
              "$ref": "tree",
              "unevaluatedProperties": False}
    # single-document composition (no loader): embed both resources
    doc = {"$defs": {"tree": tree, "strict": strict},
           "properties": {"t": {"$ref": "#/$defs/strict"}}}

    child_t = pa.struct([("data", pa.int64()), ("daat", pa.int64())])
    t_type = pa.struct([("data", pa.int64()),
                        ("children", pa.list_(child_t))])
    rows = [
        {"data": 1, "children": [{"data": 2, "daat": None}]},   # ok
        {"data": 1, "children": [{"data": None, "daat": 2}]},   # typo node
    ]
    table = pa.table({"t": pa.array(rows, type=t_type)})
    vm, rm = _both(doc, table)
    assert vm.tolist() == rm.tolist() == [True, False]

    # plain tree (no strict wrapper): the typo node is tolerated
    doc2 = {"$defs": {"tree": tree},
            "properties": {"t": {"$ref": "#/$defs/tree"}}}
    vm2, rm2 = _both(doc2, table)
    assert vm2.tolist() == rm2.tolist() == [True, True]


def test_embedded_resource_id_fragments():
    doc = {"$defs": {
        "res": {"$id": "res1",
                "$defs": {"pos": {"$anchor": "pos", "minimum": 0}},
                "properties": {"data": {"type": "integer"}}}},
        "properties": {
            "v": {"$ref": "res1#pos"},          # anchor inside resource
            "w": {"$ref": "res1#/properties/data"}}}  # pointer inside
    t = pa.table({"v": pa.array([1, -1], type=pa.int64()),
                  "w": pa.array([1, 1], type=pa.int64())})
    vm, rm = _both(doc, t)
    assert vm.tolist() == rm.tolist() == [True, False]
    with pytest.raises(RuleSetError, match="unknown anchor"):
        parse_ruleset({"$defs": {"r": {"$id": "r2"}},
                       "properties": {"v": {"$ref": "r2#nope"}}})


def test_fragment_refs_resource_relative():
    # '#' inside an embedded resource is THAT resource's root
    doc = {"$defs": {"inner": {"$id": "inner", "type": "integer",
                               "$defs": {"leaf": {"$ref": "#"}}}},
           "properties": {"v": {"$ref": "inner#/$defs/leaf"}}}
    t = pa.table({"v": ["not-an-int", None]})
    vm, rm = _both(doc, t)
    assert vm.tolist() == rm.tolist() == [False, True]
    # resource-relative pointer target that only exists inside the resource
    doc2 = {"$defs": {"inner": {
        "$id": "in2", "$defs": {"only": {"minimum": 5}},
        "properties": {"x": {"$ref": "#/$defs/only"}}}},
        "properties": {"v": {"$ref": "in2"}}}
    t2 = pa.table({"v": pa.array([{"x": 9}, {"x": 1}],
                                 type=pa.struct([("x", pa.int64())]))})
    vm2, rm2 = _both(doc2, t2)
    assert vm2.tolist() == rm2.tolist() == [True, False]


def test_dynamic_ref_bookending_plain_anchor():
    # static target is a PLAIN $anchor: $dynamicRef behaves as $ref, the
    # outer same-named $dynamicAnchor must NOT hijack it (§8.2.3.2)
    doc = {"$dynamicAnchor": "items_anchor", "type": "object",
           "$defs": {"inner": {
               "$id": "inner",
               "$defs": {"a": {"$anchor": "items_anchor",
                               "type": "integer"}},
               "properties": {"x": {"$dynamicRef": "#items_anchor"}}}},
           "properties": {"v": {"$ref": "inner"}}}
    t = pa.table({"v": pa.array([{"x": 5}, {"x": None}],
                                type=pa.struct([("x", pa.int64())]))})
    vm, rm = _both(doc, t)
    assert vm.tolist() == rm.tolist() == [True, True]


def test_anchor_and_dynamic_anchor_same_node():
    doc = {"$defs": {"n": {"$anchor": "stat", "$dynamicAnchor": "dyn",
                           "type": "integer"}},
           "properties": {"v": {"$ref": "#dyn"},
                          "w": {"$ref": "#stat"}}}
    t = pa.table({"v": pa.array([1, None], type=pa.int64()),
                  "w": ["x", None]})
    vm, rm = _both(doc, t)
    assert vm.tolist() == rm.tolist() == [False, True]


def test_pattern_unicode_case_fold_parity():
    # RE2 (?i) folds Unicode; the Python mirror must agree while keeping
    # \d ASCII — the two halves of the RE2-ish compile
    t = pa.table({"v": ["É", "e", "١٢٣", "123"]})
    vm, rm = _both({"properties": {"v": {"pattern": "(?i)^é$"}}}, t)
    assert vm.tolist() == rm.tolist() == [True, False, False, False]
    vm, rm = _both({"properties": {"v": {"pattern": "^\\d+$"}}}, t)
    assert vm.tolist() == rm.tolist() == [False, False, False, True]


# ---------------------------------------------------------------------------
# wave 8: rules periphery (builder / extensions / meta / output)


def test_x_before_duration_column_not_applicable():
    import ray  # noqa: F401
    t = pa.table({"t": pa.array([1, 2], type=pa.duration("s"))})
    doc = {"properties": {"t": {"x-before": "1998-09-03"}}}
    rs = parse_ruleset(doc)
    from jsonschema_ray.rules.vector import BatchValidator
    assert BatchValidator(rs).mask(t).tolist() == [True, True]  # no crash


def test_infer_optional_literal_and_enum():
    import enum
    import typing

    from jsonschema_ray.rules.builder import infer_from_type
    from jsonschema_ray.rules.rowwise import RowEvaluator

    doc = infer_from_type(typing.List[typing.Optional[
        typing.Literal["a", "b"]]])
    re_ = RowEvaluator(parse_ruleset(doc))
    assert not re_.validate([None, "a"])       # null element permitted
    assert re_.validate(["z"])                 # still enum-checked

    class C(enum.Enum):
        X = "x"
    d2 = infer_from_type(typing.Optional[C])
    assert not RowEvaluator(parse_ruleset(d2)).validate(None)


def test_infer_ignore_invalid_optional():
    import typing

    from jsonschema_ray.rules.builder import infer_from_type

    class Weird:
        pass
    d = infer_from_type(typing.Optional[Weird], ignore_invalid=True)
    # permissive: NO assertion (a null-only schema would reject values)
    assert d in (None, {})


def test_builder_nested_builders_unwrap():
    from jsonschema_ray.rules.builder import RuleSetBuilder
    rs = RuleSetBuilder().add_all_of(
        [RuleSetBuilder().add_minimum(1)]).build()
    from jsonschema_ray.rules.rowwise import RowEvaluator
    assert RowEvaluator(rs).validate(0)
    assert not RowEvaluator(rs).validate(2)
    rs2 = RuleSetBuilder().add(
        "properties", {"a": RuleSetBuilder().add_maximum(3)}).build()
    assert RowEvaluator(rs2).validate({"a": 9})


def test_field_tag_enum_coerced_to_field_type():
    import dataclasses

    from jsonschema_ray.rules.builder import infer_from_type
    from jsonschema_ray.rules.rowwise import RowEvaluator

    @dataclasses.dataclass
    class D:
        c: float = dataclasses.field(
            default=1.0, metadata={"jsonschema": "enum=1,enum=2"})
    doc = infer_from_type(D)
    re_ = RowEvaluator(parse_ruleset(doc))
    assert not re_.validate({"c": 1.0})
    assert re_.validate({"c": 3.0})


def test_check_ruleset_parse_superset_invariant():
    from jsonschema_ray.rules.meta import check_ruleset
    # everything parse_ruleset accepts must be meta-clean
    for doc in [{"properties": {"d": {"maximum": "1998-12-31"}}},
                {"enum": []},
                {"$defs": {"n": {"$anchor": "_x", "type": "integer"}},
                 "$ref": "#_x"}]:
        parse_ruleset(doc)
        assert check_ruleset(doc) == [], doc
    # deep-but-valid documents diagnose instead of RecursionError
    deep: dict = {"type": "integer"}
    for _ in range(60):
        deep = {"type": "object", "properties": {"a": deep}}
    assert check_ruleset(deep) == []


def test_verbose_output_ref_reached_violations():
    from jsonschema_ray.rules.output import verbose_output
    from jsonschema_ray.rules.rowwise import RowEvaluator
    rs = parse_ruleset({"$defs": {"s": {"type": "integer"}},
                        "$ref": "#/$defs/s"})
    viols = [{"keyword_location": v.keyword_location,
              "instance_location": v.instance_location,
              "message": v.message}
             for v in RowEvaluator(rs).validate("x")]
    out = verbose_output(rs, viols)
    assert out["valid"] is False and out["errors"]  # §12.4: carry errors


def test_apply_defaults_empty_batch_typed():
    from jsonschema_ray.rules.extensions import apply_defaults
    empty = pa.table({"a": pa.array([], type=pa.int64())})
    out = apply_defaults(empty, {"properties": {"b": {"default": 7}}})
    assert str(out.schema.field("b").type) == "int64"  # not null


# ---------------------------------------------------------------------------
# wave 9: re-review of waves 7-8's own fixes


def test_re2ish_class_edge_forms():
    # ']' as first class member is literal in both dialects
    t = pa.table({"v": ["a", "5", "]"]})
    vm, rm = _both({"properties": {"v": {"pattern": "^[^]\\d]$"}}}, t)
    assert vm.tolist() == rm.tolist() == [True, False, False]
    # RE2's \s has no vertical tab
    t2 = pa.table({"v": ["\x0b", " "]})
    vm, rm = _both({"properties": {"v": {"pattern": "^\\s$"}}}, t2)
    assert vm.tolist() == rm.tolist() == [False, True]
    # literal backslash-then-d stays literal
    t3 = pa.table({"v": ["\\d", "7"]})
    vm, rm = _both({"properties": {"v": {"pattern": "^\\\\d$"}}}, t3)
    assert vm.tolist() == rm.tolist() == [True, False]


def test_strict_resource_relative_pointer_errors():
    # a pointer typo inside an embedded resource must ERROR, not bind
    # to a same-named document-root schema
    with pytest.raises(RuleSetError, match="cannot resolve"):
        parse_ruleset({"$defs": {
            "res": {"$id": "r1",
                    "properties": {"q": {"$ref": "#/$defs/t"}}},
            "t": {"type": "integer"}},
            "properties": {"v": {"$ref": "r1"}}})
    # ...and a missing anchor inside a resource errors too
    with pytest.raises(RuleSetError, match="unknown anchor"):
        parse_ruleset({"$defs": {
            "res": {"$id": "r2",
                    "properties": {"q": {"$ref": "#nope"}}},
            "other": {"$anchor": "nope"}},
            "properties": {"v": {"$ref": "r2"}}})


def test_check_ruleset_300_levels():
    from jsonschema_ray.rules.meta import check_ruleset
    deep: dict = {"type": "integer"}
    for _ in range(300):
        deep = {"type": "object", "properties": {"a": deep}}
    assert check_ruleset(deep) == []
    assert check_ruleset({"maximum": "19980903"}) == []  # compact ISO


def test_builder_property_unwraps_and_copies():
    from jsonschema_ray.rules.builder import RuleSetBuilder
    from jsonschema_ray.rules.rowwise import RowEvaluator
    sub = RuleSetBuilder().add_minimum(1)
    parent = RuleSetBuilder().property("w", sub)
    sub.add("minimum", 99)           # late mutation must NOT leak
    rs = parent.build()
    assert not RowEvaluator(rs).validate({"w": 2})
    rs2 = RuleSetBuilder().property(
        "x", {"anyOf": [RuleSetBuilder().add_type("string")]}).build()
    assert RowEvaluator(rs2).validate({"x": 1})


def test_verbose_ref_leaf_per_target_errors():
    from jsonschema_ray.rules.output import verbose_output
    from jsonschema_ray.rules.rowwise import RowEvaluator
    rs = parse_ruleset({"properties": {"a": {"$ref": "#/$defs/s"},
                                       "b": {"$ref": "#/$defs/s"}},
                        "$defs": {"s": {"type": "string"}}})
    viols = [{"keyword_location": v.keyword_location,
              "instance_location": v.instance_location,
              "message": v.message}
             for v in RowEvaluator(rs).validate({"a": 1, "b": "ok"})]
    out = verbose_output(rs, viols)

    def find(unit, kl):
        if unit.get("keywordLocation") == kl:
            return unit
        for u in unit.get("errors", []) + unit.get("annotations", []):
            r = find(u, kl)
            if r:
                return r
    ref_a = find(out, "/properties/a/$ref")
    assert ref_a and not ref_a["valid"] and ref_a["errors"]  # §12.4


def test_parquet_roundtrip_nested_validation(ray_session, tmp_path):
    """Nested columns written by write_parquet and read back through Ray
    must validate identically to the in-memory table (the real ingestion
    path: parquet encodes maps/lists/structs differently than the
    in-memory builder)."""
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "tags": pa.array([["a", "b"], [], None],
                         type=pa.list_(pa.string())),
        "meta": pa.array([{"k": 1}, {}, None],
                         type=pa.map_(pa.string(), pa.int64())),
        "spec": pa.array([{"p": 1, "q": "x"}, {"p": None, "q": "y"}, None],
                         type=pa.struct([("p", pa.int64()),
                                         ("q", pa.string())])),
        # no null FSL rows: parquet cannot write them ("non-zero length
        # null components"); null-FSL engine behavior is pinned elsewhere
        "fs": pa.array([[1, 2], [3, 4], [5, 20]],
                       type=pa.list_(pa.int64(), 2)),
    })
    doc = {"properties": {
        "tags": {"items": {"minLength": 1}, "maxItems": 3},
        "meta": {"maxProperties": 2,
                 "patternProperties": {"^k$": {"minimum": 0}}},
        "spec": {"required": ["p"], "properties": {"p": {"minimum": 0}}},
        "fs": {"items": {"maximum": 10}},
    }}
    from jsonschema_ray.stages.validate import validate_dataset
    mem = validate_dataset(rd.from_arrow(t), doc,
                           key_columns=["doc_id"]).to_pandas()
    # parquet has no fixed_size_list physical type: pq.write_table stores
    # it as plain list — the engine must validate both shapes identically
    import pyarrow.parquet as pq
    (tmp_path / "pq").mkdir()
    pq.write_table(t, str(tmp_path / "pq" / "part.parquet"))
    disk = validate_dataset(rd.read_parquet(str(tmp_path / "pq")), doc,
                            key_columns=["doc_id"]).to_pandas()
    cols = ["doc_id", "keyword", "instance_location", "message"]
    a = mem[cols].sort_values(cols).reset_index(drop=True)
    b = disk[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # spec.p null -> required violation present both ways
    assert (a["keyword"] == "required").sum() == 1
