"""RuleSet compiler + evaluator semantics, and the vector-vs-rowwise
cross-check (the conformance-suite shape from SURVEY §5: (ruleset, table,
expected verdicts + violation rows))."""

import numpy as np
import pyarrow as pa
import pytest

from jsonschema_ray import (BatchValidator, RowEvaluator, RuleSetError,
                            parse_ruleset)


def cross_check(ruleset: dict, table: pa.Table, key: str = None):
    """Assert the vectorized engine matches the row-wise oracle exactly:
    per-row verdicts AND the violation multiset (keyword, kw_loc, inst_loc,
    message, offending)."""
    rs = parse_ruleset(ruleset)
    bv = BatchValidator(rs, key_columns=[key] if key else [])
    mask, viol = bv.evaluate(table)
    re_ = RowEvaluator(rs)
    rows = table.to_pylist()
    exp_mask = []
    exp_viols = []
    for i, row in enumerate(rows):
        errs = re_.validate(row)
        exp_mask.append(len(errs) == 0)
        for v in errs:
            exp_viols.append((v.instance_location, v.keyword,
                              v.keyword_location, v.message, v.offending))
    assert mask.tolist() == exp_mask, "verdict mismatch"
    got = sorted(zip(viol["instance_location"].to_pylist(),
                     viol["keyword"].to_pylist(),
                     viol["keyword_location"].to_pylist(),
                     viol["message"].to_pylist(),
                     viol["offending_value"].to_pylist()))
    assert got == sorted(exp_viols), "violation rows mismatch"
    return mask, viol


# ---------------------------------------------------------------------------
# compiler


def test_parse_typed_args():
    with pytest.raises(RuleSetError):
        parse_ruleset({"maxLength": -1})  # negative bound is a schema error
    with pytest.raises(RuleSetError):
        parse_ruleset({"multipleOf": 0})
    with pytest.raises(RuleSetError):
        parse_ruleset({"pattern": "("})
    with pytest.raises(RuleSetError):
        parse_ruleset({"type": "integerr"})
    rs = parse_ruleset({"maxLength": 3.0})  # integral float accepted (ToInt)
    assert rs.root.get("maxLength") == 3


def test_keyword_ordering():
    rs = parse_ruleset({"maxContains": 2, "contains": {"type": "integer"},
                        "then": True, "if": True, "items": True,
                        "prefixItems": [True],
                        "unevaluatedProperties": False,
                        "additionalProperties": False,
                        "properties": {"a": True}})
    kws = [p.keyword for p in rs.root.parts]
    assert kws.index("contains") < kws.index("maxContains")
    assert kws.index("if") < kws.index("then")
    assert kws.index("prefixItems") < kws.index("items")
    assert kws.index("properties") < kws.index("additionalProperties")
    assert kws.index("unevaluatedProperties") == len(kws) - 1


def test_unknown_keywords_kept_and_valid():
    rs = parse_ruleset({"x-custom-thing": 42, "minimum": 0})
    assert rs.root.has("x-custom-thing")
    t = pa.table({"v": [1.0]})
    # evaluated at column level via properties
    rs2 = parse_ruleset({"properties": {"v": {"x-nope": 1, "minimum": 5}}})
    mask = BatchValidator(rs2).mask(t)
    assert mask.tolist() == [False]


def test_ruleset_hash_stable():
    a = parse_ruleset({"b": 1, "a": 2})
    b = parse_ruleset({"a": 2, "b": 1})
    assert a.ruleset_hash == b.ruleset_hash


def test_ref_resolution():
    rs = parse_ruleset({
        "$defs": {"pos": {"type": "integer", "minimum": 1}},
        "properties": {"n": {"$ref": "#/$defs/pos"}}})
    t = pa.table({"n": [5, 0, None]})
    mask, viol = BatchValidator(rs).evaluate(t)
    assert mask.tolist() == [True, False, True]  # null = absent = vacuous
    assert viol["keyword"].to_pylist() == ["minimum"]


def test_ref_anchor():
    rs = parse_ruleset({
        "$defs": {"p": {"$anchor": "pos", "minimum": 1}},
        "properties": {"n": {"$ref": "#pos"}}})
    t = pa.table({"n": [2, -1]})
    assert BatchValidator(rs).mask(t).tolist() == [True, False]


# ---------------------------------------------------------------------------
# leaf semantics (edge cases cited from the reference)


def test_integer_accepts_integral_floats():
    # validator.go:797-809: 1.0 is an integer
    t = pa.table({"v": [1.0, 1.5, float("nan")]})
    cross_check({"properties": {"v": {"type": "integer"}}}, t)
    rs = parse_ruleset({"properties": {"v": {"type": "integer"}}})
    assert BatchValidator(rs).mask(t).tolist() == [True, False, False]


def test_numeric_string_coercion():
    # instanceFloat (validator.go:1275-1295): numeric strings compared
    t = pa.table({"v": ["10", "abc", "3.5", None]})
    rs = {"properties": {"v": {"maximum": 5}}}
    cross_check(rs, t)
    assert BatchValidator(parse_ruleset(rs)).mask(t).tolist() == \
        [False, True, True, True]


def test_string_length_code_points():
    # utf8.RuneCountInString (validator.go:977): é and € are 1 each
    t = pa.table({"v": ["héllo", "aé€", "abcdef"]})
    rs = {"properties": {"v": {"maxLength": 5}}}
    cross_check(rs, t)
    assert BatchValidator(parse_ruleset(rs)).mask(t).tolist() == \
        [True, True, False]


def test_multiple_of():
    t = pa.table({"v": [9, 10, 0, None]})
    cross_check({"properties": {"v": {"multipleOf": 3}}}, t)
    t2 = pa.table({"v": [0.01, 0.03, 0.025]})
    cross_check({"properties": {"v": {"multipleOf": 0.01}}}, t2)


def test_enum_const_bool_vs_int():
    t = pa.table({"v": [True, False]})
    rs = {"properties": {"v": {"enum": [1, 0]}}}  # JSON true != 1
    mask, _ = cross_check(rs, t)
    assert mask.tolist() == [False, False]
    rs2 = {"properties": {"v": {"const": True}}}
    mask2, _ = cross_check(rs2, t)
    assert mask2.tolist() == [True, False]


def test_list_keywords():
    t = pa.table({"v": pa.array([[1, 2, 3], [1, 1], [], None, [7]],
                                type=pa.list_(pa.int64()))})
    cross_check({"properties": {"v": {"maxItems": 2}}}, t)
    cross_check({"properties": {"v": {"minItems": 1}}}, t)
    cross_check({"properties": {"v": {"uniqueItems": True}}}, t)
    rs = parse_ruleset({"properties": {"v": {"uniqueItems": True}}})
    assert BatchValidator(rs).mask(t).tolist() == \
        [True, False, True, True, True]


def test_items_and_contains():
    t = pa.table({"v": pa.array([[1, 2, 3], [10, 20], [], [5, -1]],
                                type=pa.list_(pa.int64()))})
    cross_check({"properties": {"v": {"items": {"minimum": 0}}}}, t)
    cross_check({"properties": {"v": {"contains": {"minimum": 10}}}}, t)
    cross_check({"properties": {"v": {"contains": {"minimum": 10},
                                      "maxContains": 1}}}, t)
    cross_check({"properties": {"v": {"contains": {"minimum": 0},
                                      "minContains": 2}}}, t)
    # minContains:0 bypass (validator.go:386-402)
    rs = {"properties": {"v": {"contains": {"minimum": 100},
                               "minContains": 0}}}
    mask, _ = cross_check(rs, t)
    assert mask.tolist() == [True, True, True, True]


def test_prefix_items():
    t = pa.table({"v": pa.array([["1", "a"], ["0"], ["x", "y", "z"], []],
                                type=pa.list_(pa.string()))})
    rs = {"properties": {"v": {
        "prefixItems": [{"pattern": "^[0-9]+$"}, {"pattern": "^[a-z]+$"}],
        "items": {"maxLength": 1}}}}
    cross_check(rs, t)


def test_required_and_dependent():
    t = pa.table({"a": [1, None, 3], "b": [None, 2, 3]})
    cross_check({"required": ["a", "b"]}, t)
    cross_check({"dependentRequired": {"a": ["b"]}}, t)
    cross_check({"required": ["missing_col"]}, t)
    cross_check({"dependentSchemas": {"a": {"required": ["b"]}}}, t)
    cross_check({"dependencies": {"a": ["b"]}}, t)
    cross_check({"dependencies": {"a": {"required": ["b"]}}}, t)


def test_combinators():
    t = pa.table({"v": [5, 15, 25, None]})
    cross_check({"properties": {"v": {"allOf": [{"minimum": 10},
                                                {"maximum": 20}]}}}, t)
    cross_check({"properties": {"v": {"anyOf": [{"maximum": 10},
                                                {"minimum": 20}]}}}, t)
    cross_check({"properties": {"v": {"oneOf": [{"maximum": 10},
                                                {"maximum": 20}]}}}, t)
    cross_check({"properties": {"v": {"not": {"minimum": 10}}}}, t)
    cross_check({"properties": {"v": {"if": {"minimum": 10},
                                      "then": {"maximum": 20},
                                      "else": {"minimum": 0}}}}, t)


def test_if_then_else_row_level():
    t = pa.table({"fmt": ["png", "jpeg", "png"],
                  "w": [100, 100, 9000]})
    rs = {"if": {"properties": {"fmt": {"const": "png"}}},
          "then": {"properties": {"w": {"maximum": 512}}},
          "else": {"properties": {"w": {"maximum": 100}}}}
    mask, _ = cross_check(rs, t)
    assert mask.tolist() == [True, True, False]


def test_additional_properties_closed():
    t = pa.table({"a": [1], "b": ["x"], "c": [2.0]})
    rs = {"properties": {"a": True, "b": True},
          "additionalProperties": False}
    mask, viol = cross_check(rs, t)
    assert mask.tolist() == [False]
    assert viol["message"].to_pylist() == ['unknown property "c"']


def test_pattern_properties():
    t = pa.table({"w_px": [10], "h_px": [700], "name": ["x"]})
    rs = {"patternProperties": {"_px$": {"maximum": 512}},
          "additionalProperties": {"type": "string"}}
    cross_check(rs, t)


def test_property_names():
    t = pa.table({"ok_col": [1], "BAD": [2]})
    rs = {"propertyNames": {"pattern": "^[a-z_]+$"}}
    mask, viol = cross_check(rs, t)
    assert mask.tolist() == [False]


def test_unevaluated_properties():
    t = pa.table({"a": [1, None], "b": ["x", "y"]})
    rs = {"properties": {"a": True}, "unevaluatedProperties": False}
    mask, viol = cross_check(rs, t)
    assert mask.tolist() == [False, False]
    # through a passing allOf branch the member counts as evaluated
    rs2 = {"allOf": [{"properties": {"b": {"type": "string"}}}],
           "properties": {"a": True},
           "unevaluatedProperties": False}
    mask2, _ = cross_check(rs2, t)
    assert mask2.tolist() == [True, True]


def test_unevaluated_items():
    t = pa.table({"v": pa.array([[1, 2, 3], [1]], type=pa.list_(pa.int64()))})
    rs = {"properties": {"v": {"prefixItems": [True],
                               "unevaluatedItems": False}}}
    mask, _ = cross_check(rs, t)
    assert mask.tolist() == [False, True]


def test_boolean_schemas():
    t = pa.table({"a": [1, None]})
    cross_check({"properties": {"a": False}}, t)
    cross_check({"properties": {"a": True}}, t)
    mask, viol = cross_check({"not": True}, t)
    assert mask.tolist() == [False, False]


def test_struct_columns():
    t = pa.table({"meta": pa.array(
        [{"w": 100, "fmt": "png"}, {"w": 900, "fmt": "gif"}, None],
        type=pa.struct([("w", pa.int64()), ("fmt", pa.string())]))})
    rs = {"properties": {"meta": {
        "type": "object",
        "properties": {"w": {"maximum": 512},
                       "fmt": {"enum": ["png", "bmp"]}},
        "required": ["w"]}}}
    cross_check(rs, t)


def test_depth_cap_on_cyclic_ref():
    rs = parse_ruleset({"$defs": {"loop": {"$ref": "#/$defs/loop"}},
                        "properties": {"a": {"$ref": "#/$defs/loop"}}})
    t = pa.table({"a": [1]})
    with pytest.raises(RecursionError):
        BatchValidator(rs).mask(t)


# ---------------------------------------------------------------------------
# randomized cross-check


def test_randomized_cross_check():
    rng = np.random.default_rng(42)
    n = 500
    words = ["alpha", "beta", "GAMMA", "42", "x" * 300, "héllo wörld", ""]
    t = pa.table({
        "id": pa.array([f"img-{i:06d}" for i in range(n)]),
        "w": pa.array(rng.integers(-10, 600, n), type=pa.int32()),
        "h": pa.array(
            np.where(rng.random(n) < 0.1, None,
                     rng.integers(1, 600, n).astype(object))),
        "fmt": pa.array(rng.choice(["png", "bmp", "ppm", "gif", "tiff"], n)),
        "cap": pa.array([None if rng.random() < 0.05
                         else str(rng.choice(words)) for _ in range(n)]),
        "score": pa.array(
            np.where(rng.random(n) < 0.1, np.nan, rng.random(n) * 10)),
        "tags": pa.array([None if rng.random() < 0.1 else
                          [str(rng.choice(words))
                           for _ in range(rng.integers(0, 4))]
                          for _ in range(n)], type=pa.list_(pa.string())),
    })
    rs = {
        "type": "object",
        "required": ["id", "w", "h"],
        "properties": {
            "id": {"pattern": "^img-", "minLength": 5},
            "w": {"type": "integer", "minimum": 16, "maximum": 512},
            "h": {"minimum": 16, "maximum": 512},
            "fmt": {"enum": ["png", "bmp", "ppm"]},
            "cap": {"type": "string", "maxLength": 64,
                    "pattern": "^[\\x20-\\x7e]*$"},
            "score": {"type": "number", "exclusiveMinimum": 0,
                      "multipleOf": 0.5},
            "tags": {"maxItems": 2, "uniqueItems": True,
                     "items": {"minLength": 1}},
        },
        "if": {"properties": {"fmt": {"const": "png"}}},
        "then": {"properties": {"w": {"multipleOf": 2}}},
        "anyOf": [{"properties": {"w": {"minimum": 100}}},
                  {"properties": {"h": {"minimum": 100}}}],
    }
    cross_check(rs, t, key="id")


def test_output_formats_basic_and_flag():
    """Spec output formats over the violations table
    (pkg/errors/errors.go:15-22 field names)."""
    import json

    import pyarrow as pa

    from jsonschema_ray import BatchValidator, parse_ruleset
    from jsonschema_ray.rules.output import (basic_output,
                                             basic_output_column,
                                             flag_output)
    rs = parse_ruleset({"properties": {"v": {"minimum": 0},
                                       "s": {"pattern": "^a"}}})
    t = pa.table({"id": [1, 2, 3], "v": [1, -5, -9], "s": ["ab", "xb", "a"]})
    bv = BatchValidator(rs, key_columns=["id"])
    viol = bv.violations(t)
    out = basic_output_column(t, viol, ["id"])
    docs = [json.loads(d) for d in out["validation_output"].to_pylist()]
    assert docs[0] == {"valid": True}
    assert docs[1]["valid"] is False and len(docs[1]["errors"]) == 2
    err = docs[1]["errors"][0]
    assert set(err) == {"keywordLocation", "instanceLocation", "error"}
    assert docs[2]["valid"] is False and len(docs[2]["errors"]) == 1
    assert flag_output(True) == {"valid": True}
    assert basic_output([]) == {"valid": True}
    b = basic_output([{"keyword_location": "", "instance_location": "/v",
                       "message": "m"}])
    assert b["errors"][0]["keywordLocation"] == "#"


def test_output_formats_detailed_and_verbose():
    """Spec "detailed" (hierarchy + condensation) and "verbose" (full
    schema tree with valid units) formats — surplus over the reference,
    which emits only basic (pkg/errors/errors.go:15-22)."""
    from jsonschema_ray.rules.model import parse_ruleset
    from jsonschema_ray.rules.output import detailed_output, verbose_output

    viol = [{"keyword_location": "/properties/a/minimum",
             "instance_location": "/a", "message": "too small"},
            {"keyword_location": "/properties/b/pattern",
             "instance_location": "/b", "message": "no match"}]

    # detailed: single error condenses to the leaf unit itself
    one = detailed_output(viol[:1])
    assert one["valid"] is False
    assert one["keywordLocation"] == "/properties/a/minimum"
    assert one["error"] == "too small"
    # two errors under a shared branch: branch unit with both leaves
    two = detailed_output(viol)
    assert two["keywordLocation"] == "/properties"
    kls = sorted(e["keywordLocation"] for e in two["errors"])
    assert kls == ["/properties/a/minimum", "/properties/b/pattern"]
    assert detailed_output([]) == {"valid": True}

    rs = parse_ruleset({"type": "object",
                        "properties": {"a": {"type": "integer",
                                             "minimum": 3},
                                       "b": {"pattern": "^x"}}})
    v = verbose_output(rs, viol)
    assert v["valid"] is False and "errors" in v
    by_kl = {u["keywordLocation"]: u for u in v["errors"]}
    assert by_kl["/type"]["valid"] is True          # valid units included
    props = by_kl["/properties"]
    assert props["valid"] is False
    sub_a = {u["keywordLocation"]: u
             for u in props["errors"]}["/properties/a"]
    leaf = {u["keywordLocation"]: u
            for u in sub_a["errors"]}["/properties/a/minimum"]
    assert leaf["valid"] is False
    assert leaf["errors"][0]["error"] == "too small"
    ok = verbose_output(rs, [])
    assert ok["valid"] is True and "annotations" in ok


def test_validate_instance_entry_point():
    """Per-instance convenience API (the reference's Schema.Validate)."""
    from jsonschema_ray import validate_instance
    errs = validate_instance(
        {"properties": {"a": {"minimum": 0}}, "required": ["b"]},
        {"a": -2})
    kws = sorted(e.keyword for e in errs)
    assert kws == ["minimum", "required"]
    assert validate_instance(True, {"anything": 1}) == []
    assert len(validate_instance(False, {"x": 1})) == 1


def test_adversarial_rulesets_and_tables():
    """Verify-skill probes pinned as tests: malformed rule sets name the
    keyword; cyclic $ref hits the depth cap; degenerate tables behave."""
    import pyarrow as pa

    from jsonschema_ray import BatchValidator, RuleSetError, parse_ruleset
    for doc, frag in [
            ({"properties": {"v": {"minLength": -1}}}, "minLength"),
            ({"properties": {"v": {"multipleOf": 0}}}, "multipleOf"),
            ({"properties": {"v": {"type": "integerz"}}}, "type"),
            ({"properties": {"v": {"minimum": "not-a-date"}}}, "minimum"),
            ({"properties": {"v": {"pattern": "("}}}, "pattern")]:
        with pytest.raises(RuleSetError, match=frag):
            parse_ruleset(doc)
    rs = parse_ruleset({"properties": {"v": {"$ref": "#/$defs/a"}},
                        "$defs": {"a": {"$ref": "#/$defs/a"}}})
    with pytest.raises(RecursionError):
        BatchValidator(rs).mask(pa.table({"v": [1]}))
    rs2 = parse_ruleset({"properties": {"v": {"minimum": 0}},
                         "required": ["v"]})
    bv = BatchValidator(rs2)
    assert bv.mask(pa.table({"v": pa.array([], type=pa.int64())})) \
        .tolist() == []
    assert bv.mask(pa.table({"w": [1, 2]})).tolist() == [False, False]
    assert bv.mask(pa.table({"v": pa.array([None],
                                           type=pa.int64())})) \
        .tolist() == [False]
