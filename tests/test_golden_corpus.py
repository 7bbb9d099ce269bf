"""Golden verdict corpus — regression lock for parser/validator behavior.

tests/golden/verdicts.json is produced by scripts/freeze_golden.py over the
reference's own eval query texts + the SURVEY §2.6 quirk queries (both
evaluated against the reference eval schema) + the reference-unit-test
queries (evaluated against tests/golden/unit_schema.json, the
test_validation.py fixture schema; their expected verdicts are additionally
anchored to the reference's own test assertions by
tests/test_reference_expectations.py). Any behavior drift in the guard
shows up here as a verdict or error-string diff.
"""

import json
from pathlib import Path

import pytest

from cypher_guard_spark.guard import DbSchema, api

GOLDEN = json.loads((Path(__file__).parent / "golden/verdicts.json").read_text())
EVAL_SCHEMA_PATH = Path("/root/reference/data/schema/eval_schema.json")


@pytest.fixture(scope="module")
def eval_schema():
    if not EVAL_SCHEMA_PATH.exists():
        pytest.skip("reference eval schema not available")
    return DbSchema.from_dict(json.loads(EVAL_SCHEMA_PATH.read_text()))


@pytest.fixture(scope="module")
def unit_schema():
    return DbSchema.from_dict(
        json.loads((Path(__file__).parent / "golden/unit_schema.json").read_text())
    )


@pytest.mark.parametrize("entry", GOLDEN, ids=[e["query_id"] for e in GOLDEN])
def test_golden_verdict(entry, eval_schema, unit_schema):
    cypher = entry["cypher"]
    schema = unit_schema if entry.get("schema") == "unit" else eval_schema
    ast, perr = api.parse_query_result(cypher)
    assert (perr is None) == entry["parse_ok"], f"parse_ok drift for {entry['query_id']}"
    if perr is not None:
        assert perr.code == entry["exception_class"]
        errors = ["Invalid Cypher syntax"]
    else:
        errors = sorted(api.get_cypher_validation_errors(cypher, schema))
    assert errors == entry["error_messages"]
    assert (not errors) == entry["has_valid_cypher"]
    if perr is None:
        assert api.is_write(cypher) == entry["is_write"]


def test_corpus_summary():
    # frozen at freeze time; a count drift means the corpus itself changed
    assert len(GOLDEN) == 318
    assert sum(1 for e in GOLDEN if e["parse_ok"]) == 103
    assert sum(1 for e in GOLDEN if e["has_valid_cypher"]) == 69
    assert sum(1 for e in GOLDEN if e.get("source") == "unittest") == 65
