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
