"""Property-based equivalence: for RANDOM rule documents over RANDOM tables,
the vectorized batch engine and the row-wise oracle must produce identical
per-row verdicts and identical violation multisets. This is the deep
correctness net over the whole keyword surface (SURVEY §5's randomized
oracle check, generalized)."""

import hypothesis.strategies as st
import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings

from jsonschema_ray import BatchValidator, RowEvaluator, parse_ruleset

COLS = ["a", "b", "s", "t", "arr", "m", "mp", "dt", "ml", "fs", "dc"]

# -- rule-document grammar ---------------------------------------------------

num_leaf = st.fixed_dictionaries({}, optional={
    "minimum": st.integers(-5, 5),
    "maximum": st.integers(-5, 5),
    "exclusiveMinimum": st.integers(-5, 5),
    "exclusiveMaximum": st.integers(-5, 5),
    "multipleOf": st.sampled_from([1, 2, 3, 0.5]),
    "type": st.sampled_from(["integer", "number",
                             ["integer", "string"]]),
    "enum": st.lists(st.integers(-3, 3), min_size=1, max_size=4),
    "const": st.integers(-3, 3),
})

str_leaf = st.fixed_dictionaries({}, optional={
    "minLength": st.integers(0, 4),
    "maxLength": st.integers(0, 6),
    "pattern": st.sampled_from(["^a", "b$", "[xy]", "^$", "a.c"]),
    "type": st.sampled_from(["string", ["string", "null"]]),
    "enum": st.lists(st.sampled_from(["", "a", "ab", "xy", "héé"]),
                     min_size=1, max_size=3),
    "format": st.sampled_from(["date", "uuid", "ipv4", "regex",
                               "no-such-format"]),
})

arr_leaf = st.fixed_dictionaries({}, optional={
    "minItems": st.integers(0, 3),
    "maxItems": st.integers(0, 4),
    "uniqueItems": st.booleans(),
    "items": num_leaf,
    "contains": st.fixed_dictionaries({"minimum": st.integers(-2, 2)}),
    "minContains": st.integers(0, 3),
    "maxContains": st.integers(0, 3),
})


struct_leaf = st.fixed_dictionaries({}, optional={
    "type": st.just("object"),
    "properties": st.fixed_dictionaries({}, optional={
        "p": st.fixed_dictionaries({}, optional={
            "minimum": st.integers(-4, 4),
            "type": st.just("integer")}),
        "q": st.fixed_dictionaries({}, optional={
            "minLength": st.integers(0, 3),
            "pattern": st.sampled_from(["^a", "[xy]"])}),
    }),
    "required": st.lists(st.sampled_from(["p", "q"]), max_size=2,
                         unique=True),
    "minProperties": st.integers(0, 3),
    "dependentRequired": st.fixed_dictionaries({}, optional={
        "p": st.just(["q"])}),
})


# map-typed (open-object) column: dynamic member names per row
map_leaf = st.fixed_dictionaries({}, optional={
    "type": st.just("object"),
    "properties": st.fixed_dictionaries({}, optional={
        "k1": num_leaf, "k2": num_leaf}),
    "patternProperties": st.fixed_dictionaries({}, optional={
        "^k": num_leaf, "x$": num_leaf}),
    "additionalProperties": st.one_of(st.booleans(), num_leaf),
    "unevaluatedProperties": st.booleans(),
    "propertyNames": st.fixed_dictionaries({}, optional={
        "maxLength": st.integers(1, 3), "pattern": st.just("^[kx]")}),
    "required": st.lists(st.sampled_from(["k1", "k2", "zz"]), max_size=2,
                         unique=True),
    "minProperties": st.integers(0, 3),
    "maxProperties": st.integers(0, 4),
    "dependentRequired": st.fixed_dictionaries({}, optional={
        "k1": st.just(["k2"])}),
})


# timestamp column: type/string matching + RFC3339 temporal bounds
# (epoch-micros canonicalization, kind 'datetime' in both engines)
dt_leaf = st.fixed_dictionaries({}, optional={
    "type": st.sampled_from(["string", ["string", "null"], "integer"]),
    "minimum": st.sampled_from(["2024-01-05", "2024-01-10T12:00:00Z"]),
    "maximum": st.sampled_from(["2024-01-20", "2024-01-15T06:30:00Z"]),
    "exclusiveMinimum": st.just("2024-01-08"),
    "exclusiveMaximum": st.just("2024-01-18T00:00:00Z"),
    "format": st.sampled_from(["date-time", "date"]),
})


# list-of-struct column: object applicators inside the element domain
struct_list_leaf = st.fixed_dictionaries({}, optional={
    "minItems": st.integers(0, 2),
    "items": st.fixed_dictionaries({}, optional={
        "type": st.just("object"),
        "properties": st.fixed_dictionaries({}, optional={
            "p": st.fixed_dictionaries({}, optional={
                "minimum": st.integers(-3, 3),
                "type": st.just("integer")})}),
        "required": st.lists(st.sampled_from(["p", "q"]), max_size=2,
                             unique=True),
        "if": st.fixed_dictionaries({"properties": st.fixed_dictionaries(
            {"q": st.fixed_dictionaries({"const": st.just("x")})})}),
        "then": st.fixed_dictionaries({"properties": st.fixed_dictionaries(
            {"p": st.fixed_dictionaries({"maximum": st.integers(-2, 2)})})}),
        "unevaluatedProperties": st.booleans(),
    }),
    "contains": st.fixed_dictionaries({"required": st.just(["p"])}),
})


def props_for(leaves):
    return st.fixed_dictionaries({}, optional={
        "a": leaves[0], "b": leaves[0], "s": leaves[1], "t": leaves[1],
        "arr": leaves[2], "m": struct_leaf, "mp": map_leaf, "dt": dt_leaf,
        "ml": struct_list_leaf, "fs": leaves[2], "dc": leaves[0],
    })


# element-level conditional: exercises if/then gating INSIDE the flattened
# element domain (ADVICE r1: gate masks must be slot-indexed, not row-indexed)
elem_conditional = st.fixed_dictionaries({}, optional={
    "if": num_leaf,
    "then": num_leaf,
    "else": num_leaf,
    "not": num_leaf,
    "anyOf": st.lists(num_leaf, min_size=1, max_size=2),
})

arr_combinator = st.fixed_dictionaries({}, optional={
    "allOf": st.lists(arr_leaf, min_size=1, max_size=2),
    "anyOf": st.lists(arr_leaf, min_size=1, max_size=2),
    "items": st.one_of(num_leaf, elem_conditional),
    "prefixItems": st.lists(st.one_of(num_leaf, elem_conditional),
                            min_size=1, max_size=2),
    "contains": st.fixed_dictionaries({"minimum": st.integers(-2, 2)}),
    "unevaluatedItems": st.sampled_from([True, False]),
})

base_node = st.fixed_dictionaries({}, optional={
    "properties": props_for((num_leaf, str_leaf, arr_combinator)),
    "required": st.lists(st.sampled_from(COLS), max_size=3, unique=True),
    "dependentRequired": st.fixed_dictionaries({}, optional={
        "a": st.lists(st.sampled_from(COLS), min_size=1, max_size=2,
                      unique=True)}),
    "minProperties": st.integers(0, 5),
    "maxProperties": st.integers(0, 6),
})

ruleset_doc = st.fixed_dictionaries({}, optional={
    "properties": props_for((num_leaf, str_leaf, arr_combinator)),
    "required": st.lists(st.sampled_from(COLS), max_size=2, unique=True),
    "allOf": st.lists(base_node, min_size=1, max_size=2),
    "anyOf": st.lists(base_node, min_size=1, max_size=2),
    "oneOf": st.lists(base_node, min_size=1, max_size=2),
    "not": base_node,
    "if": base_node,
    "then": base_node,
    "else": base_node,
    "additionalProperties": st.sampled_from([True, False]),
    "unevaluatedProperties": st.sampled_from([True, False]),
})

# -- table generator ---------------------------------------------------------

opt_int = st.one_of(st.none(), st.integers(-6, 6))
opt_float = st.one_of(st.none(), st.integers(-6, 6).map(float),
                      st.sampled_from([0.5, 2.5, -1.5]))
opt_str = st.one_of(st.none(),
                    st.sampled_from(["", "a", "ab", "abc", "xy", "héé",
                                     "3", "2.5", "bob", "2024-02-29",
                                     "2023-02-29", "1.2.3.4", "(", "a|b",
                                     "123e4567-e89b-12d3-a456-4266141740zz"]))
# null ELEMENTS included: a null list element is the JSON value null
# (fails type/enum/const), unlike a null list cell (absent member)
opt_arr = st.one_of(st.none(),
                    st.lists(st.one_of(st.none(), st.integers(-3, 3)),
                             max_size=4))
opt_struct = st.one_of(st.none(), st.fixed_dictionaries({
    "p": st.one_of(st.none(), st.integers(-5, 5)),
    "q": st.one_of(st.none(), st.sampled_from(["", "a", "ab", "xy"])),
}))
# EMPTY maps included: rows_from_table converts them schema-driven, so
# the old empty-map/empty-array to_pylist ambiguity no longer constrains
# the grammar
opt_map = st.one_of(st.none(), st.dictionaries(
    st.sampled_from(["k1", "k2", "kx", "zz"]),
    st.one_of(st.none(), st.integers(-5, 5)), min_size=0, max_size=3
).map(lambda d: list(d.items())))
import datetime as _dt

opt_ts = st.one_of(st.none(), st.integers(0, 30).map(
    lambda d: _dt.datetime(2024, 1, 1) + _dt.timedelta(days=d, hours=d)))
# list-of-map: map elements under items exercise the flattened-entry
# machinery inside array contexts (probed manually first, then netted)
opt_map_list = st.one_of(st.none(), st.lists(st.one_of(
    st.none(), st.dictionaries(
        st.sampled_from(["a", "b", "zz"]),
        st.one_of(st.none(), st.integers(-4, 4)), max_size=2
    ).map(lambda d: list(d.items()))), max_size=3))
# fixed-size lists: exactly-k element cells (or null cells/elements) —
# exercises the FSL null-row compaction in _elements_view
opt_fsl = st.one_of(st.none(), st.lists(
    st.one_of(st.none(), st.integers(-3, 3)), min_size=2, max_size=2))
import decimal as _dec
opt_dec = st.one_of(st.none(), st.integers(-600, 600).map(
    lambda c: _dec.Decimal(c).scaleb(-2)))
opt_struct_list = st.one_of(st.none(), st.lists(st.one_of(
    st.none(), st.fixed_dictionaries({
        "p": st.one_of(st.none(), st.integers(-4, 4)),
        "q": st.one_of(st.none(), st.sampled_from(["x", "y", ""]))})),
    max_size=3))

table_rows = st.integers(1, 8).flatmap(lambda n: st.fixed_dictionaries({
    "a": st.lists(opt_int, min_size=n, max_size=n),
    "b": st.lists(opt_float, min_size=n, max_size=n),
    "s": st.lists(opt_str, min_size=n, max_size=n),
    "t": st.lists(opt_str, min_size=n, max_size=n),
    "arr": st.lists(opt_arr, min_size=n, max_size=n),
    "m": st.lists(opt_struct, min_size=n, max_size=n),
    "mp": st.lists(opt_map, min_size=n, max_size=n),
    "dt": st.lists(opt_ts, min_size=n, max_size=n),
    "ml": st.lists(opt_struct_list, min_size=n, max_size=n),
    "lm": st.lists(opt_map_list, min_size=n, max_size=n),
    "fs": st.lists(opt_fsl, min_size=n, max_size=n),
    "dc": st.lists(opt_dec, min_size=n, max_size=n),
}))


def build_table(cols: dict) -> pa.Table:
    return pa.table({
        "a": pa.array(cols["a"], type=pa.int64()),
        "b": pa.array(cols["b"], type=pa.float64()),
        "s": pa.array(cols["s"], type=pa.string()),
        "t": pa.array(cols["t"], type=pa.string()),
        "arr": pa.array(cols["arr"], type=pa.list_(pa.int64())),
        "m": pa.array(cols["m"], type=pa.struct([("p", pa.int64()),
                                                  ("q", pa.string())])),
        "mp": pa.array(cols["mp"],
                       type=pa.map_(pa.string(), pa.int64())),
        "dt": pa.array(cols["dt"], type=pa.timestamp("us")),
        "ml": pa.array(cols["ml"], type=pa.list_(pa.struct(
            [("p", pa.int64()), ("q", pa.string())]))),
        "lm": pa.array(cols["lm"],
                       type=pa.list_(pa.map_(pa.string(), pa.int64()))),
        "fs": pa.array(cols["fs"], type=pa.list_(pa.int64(), 2)),
        "dc": pa.array(cols["dc"], type=pa.decimal128(7, 2)),
    })


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.filter_too_much])
@given(doc=ruleset_doc, cols=table_rows)
def test_vector_matches_rowwise(doc, cols):
    rs = parse_ruleset(doc)
    t = build_table(cols)
    bv = BatchValidator(rs)
    mask, viol = bv.evaluate(t)
    re_ = RowEvaluator(rs)
    exp_mask, exp_viols = [], []
    from jsonschema_ray.rules.rowwise import rows_from_table
    for row in rows_from_table(t):
        errs = re_.validate(row)
        exp_mask.append(len(errs) == 0)
        exp_viols += [(v.instance_location, v.keyword, v.keyword_location,
                       v.message, v.offending) for v in errs]
    assert mask.tolist() == exp_mask
    got = sorted(zip(viol["instance_location"].to_pylist(),
                     viol["keyword"].to_pylist(),
                     viol["keyword_location"].to_pylist(),
                     viol["message"].to_pylist(),
                     viol["offending_value"].to_pylist()))
    assert got == sorted(exp_viols)
