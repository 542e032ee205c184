"""Conformance corpus runner — the JSON-Schema-Test-Suite shape (SURVEY §5)
ported to tables: every case runs through BOTH the vectorized batch engine
and the row-wise oracle, and the two must agree with each other AND the
expected verdicts."""

import json
import os

import pyarrow as pa
import pytest

from jsonschema_ray import BatchValidator, RowEvaluator, parse_ruleset
from jsonschema_ray.rules.model import marshal_node, parse_ruleset as _parse

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "conformance.json")
CASES = json.load(open(FIXTURE))["cases"]


def _table(cols: dict) -> pa.Table:
    arrays = {}
    for name, vals in cols.items():
        # precise typing: int columns with nulls need explicit int64
        if all(v is None or isinstance(v, bool) for v in vals) \
                and any(isinstance(v, bool) for v in vals):
            arrays[name] = pa.array(vals, type=pa.bool_())
        elif all(v is None or (isinstance(v, int) and not isinstance(v, bool))
                 for v in vals):
            arrays[name] = pa.array(vals, type=pa.int64())
        else:
            arrays[name] = pa.array(vals)
    return pa.table(arrays)


@pytest.mark.parametrize("case", CASES, ids=[c["name"] for c in CASES])
def test_conformance_case(case):
    rs = parse_ruleset(case["ruleset"])
    t = _table(case["table"])
    vec = BatchValidator(rs).mask(t).tolist()
    assert vec == case["valid"], f"vector engine: {vec}"
    re_ = RowEvaluator(rs)
    row = [len(re_.validate(r)) == 0 for r in t.to_pylist()]
    assert row == case["valid"], f"row evaluator: {row}"
    # marshal → parse → evaluate is stable (MarshalJSON analog roundtrip)
    rs2 = _parse(marshal_node(rs.root))
    assert BatchValidator(rs2).mask(t).tolist() == case["valid"]


def test_marshal_roundtrip_hash():
    doc = {"properties": {"v": {"minimum": 1, "maxLength": 3.0}},
           "required": ["v"], "unknown-kw": {"x": 1}}
    rs = parse_ruleset(doc)
    m = marshal_node(rs.root)
    assert m["properties"]["v"]["maxLength"] == 3  # ToInt normalization
    rs2 = parse_ruleset(m)
    assert parse_ruleset(marshal_node(rs2.root)).to_json() == rs2.to_json()


SUITE_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                             "suite_port.json")
SUITE_CASES = json.load(open(SUITE_FIXTURE))["cases"]


@pytest.mark.parametrize("case", SUITE_CASES,
                         ids=[c["name"] for c in SUITE_CASES])
def test_suite_port_case(case):
    """Table-ified draft2020-12 suite-style cases through BOTH engines
    (see the fixture's description for provenance + skip list)."""
    rs = parse_ruleset(case["ruleset"])
    t = _table(case["table"])
    vec = BatchValidator(rs).mask(t).tolist()
    assert vec == case["valid"], f"vector engine: {vec}"
    re_ = RowEvaluator(rs)
    row = [len(re_.validate(r)) == 0 for r in t.to_pylist()]
    assert row == case["valid"], f"row evaluator: {row}"


# ---------------------------------------------------------------------------
# map-typed (open-object) columns: the fully-dynamic instance path
# (validator.go:539-629, 713-750) — member names are per-row DATA


def _map_table(rows, value_type=pa.int64()):
    return pa.table({"v": pa.array(
        rows, type=pa.map_(pa.string(), value_type))})


MAP_CASES = [
    ("map properties by key",
     {"properties": {"v": {"properties": {"p": {"minimum": 0}}}}},
     [[("p", 1)], [("p", -1)], [("q", -5)], None],
     [True, False, True, True]),
    ("map required key",
     {"properties": {"v": {"required": ["p"]}}},
     [[("p", 1)], [("q", 2)], [("p", None)]],
     [True, False, False]),  # null-valued entry = absent member
    ("map patternProperties",
     {"properties": {"v": {"patternProperties": {"^x": {"maximum": 0}}}}},
     [[("xa", -1), ("y", 9)], [("xa", 1)], [("y", 1)]],
     [True, False, True]),
    ("map additionalProperties false",
     {"properties": {"v": {"properties": {"p": True},
                           "additionalProperties": False}}},
     [[("p", 1)], [("p", 1), ("q", 2)], []],
     [True, False, True]),
    ("map additionalProperties schema",
     {"properties": {"v": {"properties": {"p": True},
                           "additionalProperties": {"minimum": 10}}}},
     [[("p", 1), ("q", 11)], [("p", 1), ("q", 2)]],
     [True, False]),
    ("map patternProperties claims before additionalProperties",
     {"properties": {"v": {"patternProperties": {"^x": True},
                           "additionalProperties": False}}},
     [[("xa", 1)], [("ya", 1)]],
     [True, False]),
    ("map propertyNames",
     {"properties": {"v": {"propertyNames": {"maxLength": 1}}}},
     [[("p", 1)], [("pq", 1)]],
     [True, False]),
    ("map unevaluatedProperties false",
     {"properties": {"v": {"properties": {"p": True},
                           "unevaluatedProperties": False}}},
     [[("p", 1)], [("p", 1), ("q", 2)]],
     [True, False]),
    ("map unevaluatedProperties sees allOf claims",
     {"properties": {"v": {"allOf": [{"properties": {"p": True}},
                                     {"patternProperties": {"^q": True}}],
                           "unevaluatedProperties": False}}},
     [[("p", 1), ("qq", 2)], [("p", 1), ("zz", 2)]],
     [True, False]),
    ("map minProperties counts non-null entries",
     {"properties": {"v": {"minProperties": 2}}},
     [[("p", 1), ("q", 2)], [("p", 1), ("q", None)]],
     [True, False]),
    ("map maxProperties",
     {"properties": {"v": {"maxProperties": 1}}},
     [[("p", 1)], [("p", 1), ("q", 2)]],
     [True, False]),
    ("map dependentRequired",
     {"properties": {"v": {"dependentRequired": {"p": ["q"]}}}},
     [[("p", 1), ("q", 2)], [("p", 1)], [("q", 2)]],
     [True, False, True]),
    ("map dependentSchemas",
     {"properties": {"v": {"dependentSchemas":
                           {"p": {"properties": {"q": {"minimum": 5}}}}}}},
     [[("p", 1), ("q", 9)], [("p", 1), ("q", 2)], [("q", 2)]],
     [True, False, True]),
    ("map value schemas see JSON values",
     {"properties": {"v": {"additionalProperties": {"type": "integer"}}}},
     [[("p", 3)], []],
     [True, True]),
    ("map type object",
     {"properties": {"v": {"type": "object"}}},
     [[("p", 1)]],
     [True]),
]


@pytest.mark.parametrize("case", MAP_CASES, ids=[c[0] for c in MAP_CASES])
def test_map_column_case(case):
    name, ruleset, rows, valid = case
    rs = parse_ruleset(ruleset)
    t = _map_table(rows)
    vec = BatchValidator(rs).mask(t).tolist()
    assert vec == valid, f"vector engine: {vec}"
    re_ = RowEvaluator(rs)
    row = [len(re_.validate(r)) == 0 for r in t.to_pylist()]
    assert row == valid, f"row evaluator: {row}"


def test_map_violation_locations():
    rs = parse_ruleset({"properties": {"v": {
        "properties": {"p": {"minimum": 0}},
        "additionalProperties": False}}})
    t = _map_table([[("p", -1), ("zz", 2)]])
    viol = BatchValidator(rs).violations(t).to_pylist()
    locs = sorted((r["keyword"], r["instance_location"]) for r in viol)
    assert locs == [("additionalProperties", "/v/zz"),
                    ("minimum", "/v/p")]


STRUCT_LIST_T = pa.list_(pa.struct([("p", pa.int64()), ("q", pa.string())]))
MAP_LIST_T = pa.list_(pa.map_(pa.string(), pa.int64()))

NESTED_CASES = [
    ("items over struct elements: properties + required",
     {"properties": {"v": {"items": {"properties": {"p": {"minimum": 0}},
                                     "required": ["p"]}}}},
     STRUCT_LIST_T,
     [[{"p": 1, "q": "a"}, {"p": -1, "q": "b"}],
      [{"p": 2, "q": None}], [{"p": None, "q": "x"}], []],
     [False, True, False, True]),
    ("if/then on struct elements gates per element",
     {"properties": {"v": {"items": {
         "if": {"properties": {"q": {"const": "err"}}},
         "then": {"properties": {"p": {"maximum": 0}}}}}}},
     STRUCT_LIST_T,
     [[{"p": 5, "q": "err"}], [{"p": 5, "q": "ok"}],
      [{"p": -1, "q": "err"}]],
     [False, True, True]),
    ("null struct element fails type object",
     {"properties": {"v": {"items": {"type": "object"}}}},
     STRUCT_LIST_T,
     [[{"p": 1, "q": "a"}, None], [{"p": 1, "q": "a"}]],
     [False, True]),
    ("unevaluatedProperties on struct elements",
     {"properties": {"v": {"items": {"properties": {"p": True},
                                     "unevaluatedProperties": False}}}},
     STRUCT_LIST_T,
     [[{"p": 1, "q": None}], [{"p": 1, "q": "x"}]],
     [True, False]),
    ("items over MAP elements: required + additionalProperties",
     {"properties": {"v": {"items": {
         "required": ["k"], "additionalProperties": {"minimum": 0}}}}},
     MAP_LIST_T,
     [[[("k", 1)], [("k", 2), ("z", -1)]], [[("x", 1)]]],
     [False, False]),
]


@pytest.mark.parametrize("case", NESTED_CASES,
                         ids=[c[0] for c in NESTED_CASES])
def test_nested_container_case(case):
    """Containers inside containers: struct/map elements under `items`
    carry full object-applicator semantics in both engines."""
    name, ruleset, typ, rows, valid = case
    rs = parse_ruleset(ruleset)
    t = pa.table({"v": pa.array(rows, type=typ)})
    vec = BatchValidator(rs).mask(t).tolist()
    assert vec == valid, f"vector engine: {vec}"
    re_ = RowEvaluator(rs)
    row = [len(re_.validate(r)) == 0 for r in t.to_pylist()]
    assert row == valid, f"row evaluator: {row}"


NESTED_LOC_CASES = [
    ("list-of-list element locations",
     {"properties": {"v": {"items": {"items": {"minimum": 0}}}}},
     pa.list_(pa.list_(pa.int64())),
     [[[1, -2], [3]], [[-4]]]),
    ("struct field under list-of-list",
     {"properties": {"v": {"items": {"items": {
         "properties": {"p": {"minimum": 0}}}}}}},
     pa.list_(pa.list_(pa.struct([("p", pa.int64())]))),
     [[[{"p": 1}, {"p": -1}]], [[{"p": -7}], []]]),
    ("map entry under list elements",
     {"properties": {"v": {"items": {
         "additionalProperties": {"minimum": 0}}}}},
     pa.list_(pa.map_(pa.string(), pa.int64())),
     [[[("a", 1)], [("b", -2)]]]),
    ("three-level list element locations",
     {"properties": {"v": {"items": {"items": {"items":
                                               {"maximum": 5}}}}}},
     pa.list_(pa.list_(pa.list_(pa.int64()))),
     [[[[1, 9]], [[2]]]]),
]


@pytest.mark.parametrize("case", NESTED_LOC_CASES,
                         ids=[c[0] for c in NESTED_LOC_CASES])
def test_nested_instance_locations(case):
    """Violation instance locations must compose outer→inner indices
    exactly like the row-wise oracle, through any nesting of lists,
    structs and maps."""
    name, ruleset, typ, rows = case
    rs = parse_ruleset(ruleset)
    t = pa.table({"v": pa.array(rows, type=typ)})
    m, viol = BatchValidator(rs).evaluate(t)
    re_ = RowEvaluator(rs)
    exp_mask, exp = [], []
    for r in t.to_pylist():
        errs = re_.validate(r)
        exp_mask.append(len(errs) == 0)
        exp += [(v.instance_location, v.keyword) for v in errs]
    assert m.tolist() == exp_mask
    got = sorted(zip(viol["instance_location"].to_pylist(),
                     viol["keyword"].to_pylist()))
    assert got == sorted(exp)


NESTED_FULL_CASES = [
    ("required on struct elements",
     {"properties": {"v": {"items": {"required": ["p"]}}}},
     pa.list_(pa.struct([("p", pa.int64()), ("q", pa.string())])),
     [[{"p": None, "q": "a"}, {"p": 1, "q": None}]]),
    ("additionalProperties rewrite on struct elements",
     {"properties": {"v": {"items": {"properties": {"p": True},
                                     "additionalProperties": False}}}},
     pa.list_(pa.struct([("p", pa.int64()), ("q", pa.string())])),
     [[{"p": 1, "q": "x"}]]),
    ("unevaluatedItems inside nested list",
     {"properties": {"v": {"items": {"prefixItems": [True],
                                     "unevaluatedItems": False}}}},
     pa.list_(pa.list_(pa.int64())),
     [[[1, 2], [3]]]),
    ("propertyNames on struct elements",
     {"properties": {"v": {"items": {"propertyNames":
                                     {"maxLength": 0}}}}},
     pa.list_(pa.struct([("p", pa.int64()), ("q", pa.string())])),
     [[{"p": 1, "q": None}]]),
    ("contains inside nested list",
     {"properties": {"v": {"items": {"contains": {"minimum": 5}}}}},
     pa.list_(pa.list_(pa.int64())),
     [[[1, 2], [6]]]),
]


@pytest.mark.parametrize("case", NESTED_FULL_CASES,
                         ids=[c[0] for c in NESTED_FULL_CASES])
def test_nested_full_violation_tuples(case):
    """FULL violation tuples (locations, messages, offending values)
    must match the oracle through nested containers."""
    name, ruleset, typ, rows = case
    rs = parse_ruleset(ruleset)
    t = pa.table({"v": pa.array(rows, type=typ)})
    m, viol = BatchValidator(rs).evaluate(t)
    re_ = RowEvaluator(rs)
    exp_mask, exp = [], []
    for r in t.to_pylist():
        errs = re_.validate(r)
        exp_mask.append(len(errs) == 0)
        exp += [x.as_tuple() for x in errs]
    assert m.tolist() == exp_mask
    got = sorted(zip(viol["instance_location"].to_pylist(),
                     viol["keyword"].to_pylist(),
                     viol["keyword_location"].to_pylist(),
                     viol["message"].to_pylist(),
                     viol["offending_value"].to_pylist()))
    assert got == sorted(exp)


def test_unique_items_nan_vs_null_channel():
    """Float NaN elements are NOT conflated with null elements
    (ADVICE-r2): NaN != NaN (IEEE / deep_equal) while null == null
    (JSON null) — both engines must agree on every combination."""
    import numpy as np  # noqa: F401

    from jsonschema_ray.rules.rowwise import RowEvaluator
    rs = parse_ruleset({"properties": {"xs": {"uniqueItems": True}}})
    nan = float("nan")
    rows = [[nan, nan], [None, nan], [nan, None, nan],
            [None, nan, None], [None, None], [1.0, 1.0], [1.0, 2.0],
            [None, 1.0], [nan], []]
    t = pa.table({"xs": pa.array(rows, type=pa.list_(pa.float64()))})
    vec = BatchValidator(rs).mask(t).tolist()
    row = [len(RowEvaluator(rs).validate(r)) == 0 for r in t.to_pylist()]
    expected = [True, True, True, False, False, False, True, True,
                True, True]
    assert vec == expected
    assert row == expected


def test_empty_map_renders_as_object(ray_session):
    """Empty pa.map_ cells are JSON objects: both engines must agree on
    semantics AND offending-value rendering ('{}', not '[]'), and
    schema-driven row conversion must distinguish them from empty lists."""
    import pyarrow as pa

    from jsonschema_ray.rules.model import parse_ruleset
    from jsonschema_ray.rules.rowwise import RowEvaluator, rows_from_table
    from jsonschema_ray.rules.vector import BatchValidator
    t = pa.table({"mp": pa.array([[("k1", 1)], [], None],
                                 type=pa.map_(pa.string(), pa.int64()))})
    rows = rows_from_table(t)
    assert rows[0]["mp"] == {"k1": 1}
    assert rows[1]["mp"] == {}          # NOT [] — the type disambiguates
    assert rows[2]["mp"] is None

    rs = parse_ruleset({"additionalProperties": False})
    _, viol = BatchValidator(rs).evaluate(t)
    got = viol["offending_value"].to_pylist()
    re_ = RowEvaluator(rs)
    exp = [v.offending for r in rows for v in re_.validate(r)]
    assert got == exp == ['{"k1": 1}', "{}"]

    # empty map passes type: object and fails minProperties: 1 — and an
    # empty LIST cell still fails type: object
    rs2 = parse_ruleset({"properties": {"mp": {"type": "object",
                                               "minProperties": 1}}})
    _, viol2 = BatchValidator(rs2).evaluate(t)
    kws = sorted(viol2["keyword"].to_pylist())
    assert kws == ["minProperties"]


def test_nested_empty_map_rendering(ray_session):
    """List-of-map cells render map elements as objects at any depth —
    including empty maps ('[{}]', not '[[]]')."""
    import pyarrow as pa

    from jsonschema_ray.rules.model import parse_ruleset
    from jsonschema_ray.rules.rowwise import RowEvaluator, rows_from_table
    from jsonschema_ray.rules.vector import BatchValidator
    t = pa.table({"lm": pa.array([[[]], [[("a", 1)], []]],
                                 type=pa.list_(pa.map_(pa.string(),
                                                       pa.int64())))})
    rs = parse_ruleset({"additionalProperties": False})
    _, viol = BatchValidator(rs).evaluate(t)
    got = viol["offending_value"].to_pylist()
    re_ = RowEvaluator(rs)
    exp = [v.offending for r in rows_from_table(t)
           for v in re_.validate(r)]
    assert got == exp == ['[{}]', '[{"a": 1}, {}]']


@pytest.mark.parametrize("doc,exp", [
    ({"properties": {"mv": {"additionalProperties":
                            {"type": "array", "minItems": 1}}}},
     [("/mv/b", "additionalProperties", "[]")]),
    ({"properties": {"mv": {"patternProperties": {"^a": {"maxItems": 1}}}}},
     [("/mv/a", "maxItems", "[1, 2]")]),
])
def test_map_with_list_values(ray_session, doc, exp):
    """Map columns whose VALUES are lists: entry-value subschemas apply
    per entry; null entry values are absent members."""
    import pyarrow as pa

    from jsonschema_ray.rules.model import parse_ruleset
    from jsonschema_ray.rules.rowwise import RowEvaluator, rows_from_table
    from jsonschema_ray.rules.vector import BatchValidator
    t = pa.table({"mv": pa.array(
        [[("a", [1, 2]), ("b", [])], [("c", None)], []],
        type=pa.map_(pa.string(), pa.list_(pa.int64())))})
    rs = parse_ruleset(doc)
    _, viol = BatchValidator(rs).evaluate(t)
    got = sorted(zip(viol["instance_location"].to_pylist(),
                     viol["keyword"].to_pylist(),
                     viol["offending_value"].to_pylist()))
    re_ = RowEvaluator(rs)
    exp_row = sorted((v.instance_location, v.keyword, v.offending)
                     for r in rows_from_table(t) for v in re_.validate(r))
    assert got == exp_row == exp


def test_struct_containing_map_field(ray_session):
    """A map nested as a struct FIELD: properties→properties chains into
    the map's object semantics (empty map counts 0 properties)."""
    import pyarrow as pa

    from jsonschema_ray.rules.model import parse_ruleset
    from jsonschema_ray.rules.rowwise import RowEvaluator, rows_from_table
    from jsonschema_ray.rules.vector import BatchValidator
    t = pa.table({"sm": pa.array(
        [{"inner": [("k", 5)]}, {"inner": []}, {"inner": None}, None],
        type=pa.struct([("inner", pa.map_(pa.string(), pa.int64()))]))})
    rs = parse_ruleset({"properties": {"sm": {"properties": {
        "inner": {"minProperties": 1}}}}})
    _, viol = BatchValidator(rs).evaluate(t)
    got = sorted(zip(viol["instance_location"].to_pylist(),
                     viol["keyword"].to_pylist(),
                     viol["offending_value"].to_pylist()))
    re_ = RowEvaluator(rs)
    exp = sorted((v.instance_location, v.keyword, v.offending)
                 for r in rows_from_table(t) for v in re_.validate(r))
    assert got == exp == [("/sm/inner", "minProperties", "0")]
