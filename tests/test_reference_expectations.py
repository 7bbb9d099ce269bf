"""Reference-anchored parity: the expectations in
tests/golden/reference_expectations.json are the verdicts the REFERENCE'S
OWN unit tests assert (rust/python_bindings/tests/unit/test_validation.py
and test_parser_errors.py — each entry cites its source lines). They were
curated from the reference test code, not produced by this port, so they
break the golden-corpus circularity for this subset: if the port drifted
from the Rust behavior on any of these queries, these tests fail even
though the frozen golden verdicts would drift with it.

Two layers are checked per expectation:
1. the in-process API reproduces the reference-asserted outcome;
2. the frozen golden corpus (tests/golden/verdicts.json, source=unittest)
   carries the SAME outcome — so the Spark-path guard_verdicts oracle is
   anchored to reference assertions for these entries, not merely to
   port-equals-port.
"""

import json
from pathlib import Path

import pytest

from cypher_guard_spark.guard import DbSchema, api
from cypher_guard_spark.guard import errors as guard_errors

GOLDEN_DIR = Path(__file__).parent / "golden"
EXPECTATIONS = json.loads((GOLDEN_DIR / "reference_expectations.json").read_text())
UNIT_SCHEMA = DbSchema.from_dict(
    json.loads((GOLDEN_DIR / "unit_schema.json").read_text())
)


def _ids():
    return [e["id"] for e in EXPECTATIONS]


@pytest.mark.parametrize("exp", EXPECTATIONS, ids=_ids())
def test_reference_asserted_outcome(exp):
    cypher = exp["cypher"]
    if exp["check"] == "validate":
        errors = api.validate_cypher(cypher, UNIT_SCHEMA)
        if exp["expect_valid"]:
            assert errors == [], f"{exp['ref']}: expected valid, got {errors}"
        else:
            assert len(errors) > 0, f"{exp['ref']}: expected errors"
            if exp.get("error_contains"):
                assert any(exp["error_contains"] in e for e in errors), (
                    exp["ref"],
                    errors,
                )
            if exp.get("expect_error_count") is not None:
                assert len(errors) == exp["expect_error_count"], (exp["ref"], errors)
    else:  # parse
        if exp["parse_ok"]:
            assert api.check_syntax(cypher) is True, exp["ref"]
        else:
            classes = tuple(
                getattr(guard_errors, name) for name in exp["exception_class"]
            )
            with pytest.raises(classes):
                api.check_syntax(cypher)


def _golden_by_cypher():
    verdicts = json.loads((GOLDEN_DIR / "verdicts.json").read_text())
    return {e["cypher"]: e for e in verdicts}


@pytest.mark.parametrize("exp", EXPECTATIONS, ids=_ids())
def test_golden_corpus_carries_reference_verdict(exp):
    """Every reference-unit-test query must exist in the frozen golden
    corpus with the verdict the reference test asserts."""
    golden = _golden_by_cypher()
    assert exp["cypher"] in golden, f"{exp['id']} missing from golden corpus"
    g = golden[exp["cypher"]]
    if exp["check"] == "validate":
        assert g["schema"] == "unit", exp["id"]
        assert g["parse_ok"] is True, exp["id"]
        assert g["has_valid_cypher"] is exp["expect_valid"], (exp["id"], g)
        if not exp["expect_valid"] and exp.get("error_contains"):
            assert any(exp["error_contains"] in m for m in g["error_messages"]), (
                exp["id"],
                g["error_messages"],
            )
    else:
        assert g["parse_ok"] is exp["parse_ok"], (exp["id"], g)
        if not exp["parse_ok"]:
            assert g["exception_class"] in exp["exception_class"], (exp["id"], g)
