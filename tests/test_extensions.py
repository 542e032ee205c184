"""Extension surface (SURVEY §2.7): builder, inference, custom keywords,
defaults, ref loader, meta-validation."""

import numpy as np
import pyarrow as pa
import pytest

from jsonschema_ray import (BatchValidator, RowEvaluator, RuleSetBuilder,
                            RuleSetError, apply_defaults, check_ruleset,
                            infer_ruleset, infer_schema_doc, parse_ruleset,
                            register_keyword, unregister_keyword)


def test_builder_fluent():
    rs = (RuleSetBuilder()
          .add_type("object")
          .add_required(["w"])
          .property("w", RuleSetBuilder().add_type("integer")
                    .add_minimum(16).add_maximum(512))
          .property("fmt", RuleSetBuilder().add_enum(["png", "bmp"]))
          .build())
    t = pa.table({"w": [100, 4, None], "fmt": ["png", "gif", "png"]})
    mask = BatchValidator(rs).mask(t)
    assert mask.tolist() == [True, False, False]


def test_builder_type_checks_at_build():
    b = RuleSetBuilder().add_max_length(-2)
    with pytest.raises(RuleSetError):
        b.build()


def test_infer_ruleset_roundtrip():
    schema = pa.schema([
        pa.field("id", pa.string(), nullable=False),
        pa.field("w", pa.int16()),
        pa.field("score", pa.float64()),
        pa.field("tags", pa.list_(pa.string())),
        pa.field("meta", pa.struct([("k", pa.int8())])),
    ])
    doc = infer_schema_doc(schema)
    assert doc["properties"]["w"] == {"type": "integer",
                                      "minimum": -32768, "maximum": 32767}
    assert doc["properties"]["tags"]["items"] == {"type": "string"}
    assert doc["required"] == ["id"]
    assert doc["additionalProperties"] is False
    rs = infer_ruleset(schema)
    # a conforming table passes
    t = pa.table({"id": ["a"], "w": [5], "score": [1.5],
                  "tags": [["x"]], "meta": [{"k": 3}]})
    assert BatchValidator(rs).mask(t).tolist() == [True]
    # out-of-range int16 value fails (sized-int bounds)
    t2 = pa.table({"id": ["a"], "w": [99999], "score": [1.5],
                   "tags": [["x"]], "meta": [{"k": 3}]})
    assert BatchValidator(rs).mask(t2).tolist() == [False]


def test_custom_keyword_row_and_vector():
    register_keyword("x-even", lambda v, arg: (not arg) or int(v) % 2 == 0)
    try:
        rs = parse_ruleset({"properties": {"n": {"x-even": True}}})
        t = pa.table({"n": [2, 3, None]})
        assert BatchValidator(rs).mask(t).tolist() == [True, False, True]
        re_ = RowEvaluator(rs)
        assert len(re_.validate({"n": 2})) == 0
        assert len(re_.validate({"n": 3})) == 1
        # vectorized form
        unregister_keyword("x-even")
        register_keyword(
            "x-even", lambda v, arg: int(v) % 2 == 0,
            vector_fn=lambda arr, arg: (arr.to_numpy(zero_copy_only=False)
                                        % 2 == 0))
        t2 = pa.table({"n": [4, 5]})
        assert BatchValidator(rs).mask(t2).tolist() == [True, False]
    finally:
        unregister_keyword("x-even")


def test_apply_defaults():
    rs = {"properties": {"fmt": {"default": "png"},
                         "w": {"default": 64},
                         "extra": {"default": 1}}}
    t = pa.table({"fmt": ["bmp", None], "w": [10, None]})
    out = apply_defaults(t, rs)
    assert out["fmt"].to_pylist() == ["bmp", "png"]
    assert out["w"].to_pylist() == [10, 64]
    assert out["extra"].to_pylist() == [1, 1]


def test_ref_loader():
    remote = {"https://rules.example/pos.json": {"minimum": 1},
              "https://rules.example/a.json":
              {"$ref": "https://rules.example/a.json"}}  # self-cycle
    calls = []

    def loader(uri):
        calls.append(uri)
        return remote[uri]

    rs = parse_ruleset(
        {"properties": {"n": {"$ref": "https://rules.example/pos.json"}}},
        loader=loader)
    t = pa.table({"n": [3, 0]})
    assert BatchValidator(rs).mask(t).tolist() == [True, False]
    assert calls == ["https://rules.example/pos.json"]  # memoized
    # a remote self-cycle parses (placeholder) and is caught at eval depth
    rs2 = parse_ruleset({"properties": {"n": {
        "$ref": "https://rules.example/a.json"}}}, loader=loader)
    with pytest.raises(RecursionError):
        BatchValidator(rs2).mask(t)
    # without a loader, non-local refs are a compile error
    with pytest.raises(RuleSetError):
        parse_ruleset({"$ref": "https://rules.example/pos.json"})


def test_meta_validation():
    assert check_ruleset({"type": "integer", "minimum": 0}) == []
    assert check_ruleset(True) == []
    assert check_ruleset({"properties": {"w": {"minimum": 1}}}) == []
    v = check_ruleset({"minimum": "not-a-number"})
    assert any(x.instance_location == "/minimum" for x in v)
    v2 = check_ruleset({"maxLength": -1})
    assert any(x.keyword == "minimum" for x in v2)
    v3 = check_ruleset({"properties": {"a": {"pattern": "("}}})
    assert any(x.keyword == "format" for x in v3)
    v4 = check_ruleset({"allOf": []})
    assert any(x.keyword == "minItems" for x in v4)
    # nested error locations point into the document
    v5 = check_ruleset({"properties": {"a": {"type": "strnig"}}})
    assert any("/properties/a/type" in x.instance_location for x in v5)


def test_dynamic_ref_outermost_anchor_wins():
    """$dynamicRef resolves to the OUTERMOST in-scope $dynamicAnchor
    (validate.go:84-182): a library loaded via $ref uses the REFERRING
    document's anchor when one is in scope, its own otherwise."""
    library = {
        "$defs": {"default_T": {"$dynamicAnchor": "T", "type": "number"}},
        "properties": {
            "v": {"$dynamicRef": "#T"},
        },
    }

    def loader(uri):
        assert uri == "https://rules.example/lib.json"
        return library

    # root OVERRIDES T: numbers must be >= 100
    root_with_anchor = {
        "$defs": {"strictT": {"$dynamicAnchor": "T", "minimum": 100}},
        "$ref": "https://rules.example/lib.json",
    }
    rs = parse_ruleset(root_with_anchor, loader=loader)
    t = pa.table({"v": [150.0, 5.0]})
    assert BatchValidator(rs).mask(t).tolist() == [True, False]
    re_ = RowEvaluator(rs)
    assert len(re_.validate({"v": 150.0})) == 0
    assert len(re_.validate({"v": 5.0})) == 1

    # root WITHOUT an anchor: the library's own T applies (type number)
    root_plain = {"$ref": "https://rules.example/lib.json"}
    rs2 = parse_ruleset(root_plain, loader=loader)
    t2 = pa.table({"v": [5.0]})
    assert BatchValidator(rs2).mask(t2).tolist() == [True]
    t3 = pa.table({"v": ["not a number"]})
    assert BatchValidator(rs2).mask(t3).tolist() == [False]


# ---------------------------------------------------------------------------
# Python-type inference (Infer/FromType analog, builder.go:241-522 +
# json/jsonschema field tags builder.go:526-625) — VERDICT-r2 item 7


def test_infer_from_dataclass_scalars_and_required():
    from dataclasses import dataclass, field

    from jsonschema_ray import infer_from_type

    @dataclass
    class Rec:
        name: str
        qty: int
        score: float
        ok: bool
        blob: bytes
        note: str = "x"           # default → optional

    doc = infer_from_type(Rec)
    p = doc["properties"]
    assert p["name"] == {"type": "string"}
    assert p["qty"] == {"type": "integer"}
    assert p["score"] == {"type": "number"}
    assert p["ok"] == {"type": "boolean"}
    assert p["blob"] == {"type": "binary"}
    assert doc["required"] == ["name", "qty", "score", "ok", "blob"]
    assert doc["additionalProperties"] is False  # closed struct


def test_infer_json_tag_semantics():
    """metadata={"json": ...} mirrors Go json tags (builder.go:526-560):
    '-' omits, 'name,omitempty' renames + optional."""
    from dataclasses import dataclass, field

    from jsonschema_ray import infer_from_type

    @dataclass
    class Rec:
        a: int = field(metadata={"json": "alpha"})
        b: int = field(metadata={"json": "-"})
        c: int = field(metadata={"json": ",omitempty"})
        d: int = field(metadata={"json": "dee,omitempty"})

    doc = infer_from_type(Rec)
    p = doc["properties"]
    assert set(p) == {"alpha", "c", "dee"}
    assert doc["required"] == ["alpha"]


def test_infer_jsonschema_tag_enum_and_description():
    from dataclasses import dataclass, field

    import pytest

    from jsonschema_ray import infer_from_type
    from jsonschema_ray.rules.model import RuleSetError

    @dataclass
    class Rec:
        color: str = field(metadata={"jsonschema": "enum=red,enum=green"})
        note: str = field(metadata={"jsonschema": "free text here"},
                          default="")

    doc = infer_from_type(Rec)
    assert doc["properties"]["color"]["enum"] == ["red", "green"]
    assert doc["properties"]["note"]["description"] == "free text here"

    @dataclass
    class Bad:
        x: str = field(metadata={"jsonschema": "nope=1"})

    with pytest.raises(RuleSetError):
        infer_from_type(Bad)


def test_infer_optional_containers_nested():
    from dataclasses import dataclass
    from typing import Dict, List, Optional, Tuple

    from jsonschema_ray import infer_from_type

    @dataclass
    class Inner:
        v: int

    @dataclass
    class Outer:
        xs: List[int]
        pair: Tuple[str, int]
        m: Dict[str, float]
        maybe: Optional[str]
        child: Inner

    doc = infer_from_type(Outer)
    p = doc["properties"]
    assert p["xs"] == {"type": "array", "items": {"type": "integer"}}
    assert p["pair"]["prefixItems"] == [{"type": "string"},
                                       {"type": "integer"}]
    assert p["pair"]["minItems"] == p["pair"]["maxItems"] == 2
    assert p["m"] == {"type": "object",
                      "additionalProperties": {"type": "number"}}
    assert p["maybe"]["type"] == ["null", "string"]
    assert p["child"]["properties"] == {"v": {"type": "integer"}}
    assert p["child"]["additionalProperties"] is False


def test_infer_typeddict_literal_enum_numpy():
    import enum
    from typing import Literal, TypedDict

    import numpy as np

    from jsonschema_ray import infer_from_type

    class Color(enum.Enum):
        RED = "red"
        GREEN = "green"

    class TD(TypedDict, total=False):
        mode: Literal["fast", "slow"]

    class TDReq(TypedDict):
        n: int

    assert infer_from_type(TD)["properties"]["mode"] == \
        {"enum": ["fast", "slow"]}
    assert "required" not in infer_from_type(TD)
    assert infer_from_type(TDReq)["required"] == ["n"]
    assert infer_from_type(Color) == {"enum": ["red", "green"]}
    # numpy sized ints get Go sized-int bounds (builder.go:311-351)
    assert infer_from_type(np.int8) == {"type": "integer",
                                        "minimum": -128, "maximum": 127}
    assert infer_from_type(np.uint16) == {"type": "integer",
                                          "minimum": 0, "maximum": 65535}


def test_infer_cycle_override_and_invalid():
    from dataclasses import dataclass
    from typing import Dict, Optional

    import pytest

    from jsonschema_ray import infer_from_type, infer_ruleset_from_type
    from jsonschema_ray.rules.model import RuleSetError

    @dataclass
    class Node:
        next: Optional["Node"]

    with pytest.raises(RuleSetError, match="cycle"):
        infer_from_type(Node)

    # InferOpts.Types analog: override wins, pointer adds null
    @dataclass
    class Has:
        t: Optional[complex]

    doc = infer_from_type(Has, types={complex: {"type": "string"}})
    assert doc["properties"]["t"]["type"] == ["null", "string"]

    with pytest.raises(RuleSetError):  # non-str map keys unsupported
        infer_from_type(Dict[int, str])
    assert infer_from_type(Dict[int, str], ignore_invalid=True) == {}

    # end-to-end: inferred ruleset compiles and validates
    @dataclass
    class Row:
        name: str
        qty: int

    rs = infer_ruleset_from_type(Row)
    import pyarrow as pa

    from jsonschema_ray.rules.vector import BatchValidator
    t = pa.table({"name": ["ok", None], "qty": [1, 2]})
    mask = BatchValidator(rs).mask(t)
    assert mask.tolist() == [True, False]  # null name fails required


# ---------------------------------------------------------------------------
# property net: random typing constructs → infer → parse → validate


def test_inference_property_net():
    """Randomized Python-type inference round-trip: every generated type
    infers to a document that parses, and values actually OF that type
    validate clean (soundness — completeness is checked only for nulls
    in non-Optional positions)."""
    import random
    import typing

    from jsonschema_ray.rules.builder import infer_from_type
    from jsonschema_ray.rules.model import parse_ruleset
    from jsonschema_ray.rules.rowwise import RowEvaluator

    rng = random.Random(7)

    def gen_type(depth=0):
        opts = ["int", "float", "str", "bool", "none", "literal"]
        if depth < 2:
            opts += ["list", "opt", "union", "dict"]
        k = rng.choice(opts)
        if k == "int":
            return int, lambda: rng.randint(-5, 5)
        if k == "float":
            return float, lambda: rng.choice([0.5, -1.5, 2.0])
        if k == "str":
            return str, lambda: rng.choice(["", "a", "xy"])
        if k == "bool":
            return bool, lambda: rng.choice([True, False])
        if k == "none":
            return type(None), lambda: None
        if k == "literal":
            vals = tuple(rng.sample(["a", "b", "c"], 2))
            return typing.Literal[vals], lambda: rng.choice(vals)
        if k == "list":
            t, g = gen_type(depth + 1)
            return typing.List[t], lambda: [g() for _ in range(
                rng.randint(0, 3))]
        if k == "opt":
            t, g = gen_type(depth + 1)
            return typing.Optional[t], lambda: (
                None if rng.random() < 0.3 else g())
        if k == "union":
            (t1, g1), (t2, g2) = gen_type(depth + 1), gen_type(depth + 1)
            return typing.Union[t1, t2], lambda: rng.choice([g1, g2])()
        if k == "dict":
            t, g = gen_type(depth + 1)
            return typing.Dict[str, t], lambda: {
                rng.choice(["k1", "k2"]): g()
                for _ in range(rng.randint(0, 2))}

    for trial in range(200):
        typ, gen = gen_type()
        doc = infer_from_type(typ)
        rs = parse_ruleset(doc if doc is not None else {})
        re_ = RowEvaluator(rs)
        for _ in range(5):
            v = gen()
            errs = re_.validate(v)
            assert not errs, (typ, doc, v, [str(e) for e in errs])
