"""Property-based robustness tests for the guard API (hypothesis).

The reference's PyO3 surface never leaks an untyped panic: every entry
point either returns a verdict/error-list or raises an exception from the
declared taxonomy. The Python twin must hold the same contract for ANY
input string — these properties fuzz it with adversarial text (ASCII +
unicode + cypher-shaped fragments) and pin determinism (same input, same
output — required for Spark task retries to be exactly-once-equivalent).
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from cypher_guard_spark.guard import (  # noqa: E402
    DbSchema,
    get_cypher_validation_errors,
    has_valid_cypher,
    validate_cypher,
)
from cypher_guard_spark.guard import errors as E  # noqa: E402
from cypher_guard_spark.guard.api import check_syntax, is_write  # noqa: E402

SCHEMA = DbSchema.from_dict(
    {
        "node_props": {
            "Person": [{"name": "name", "neo4j_type": "STRING"}],
            "Company": [{"name": "name", "neo4j_type": "STRING"}],
        },
        "rel_props": {},
        "relationships": [
            {"start": "Person", "end": "Company", "type": "WORKS_FOR"}
        ],
        "metadata": {"constraint": [], "index": []},
    }
)

# cypher-shaped fragments: concatenations of grammar atoms are far more
# likely to reach deep parser states than uniform noise
_ATOMS = st.sampled_from(
    [
        "MATCH ", "RETURN ", "WHERE ", "MERGE ", "CREATE ", "WITH ", "UNWIND ",
        "CALL ", "SET ", "ON CREATE ", "ON MATCH ",
        "(p:Person)", "(c:Company)", "()", "(p)", "[:WORKS_FOR]", "[r]",
        "-[:WORKS_FOR]->", "<-[r:KNOWS]-", "--", "-->",
        "p.name", "c.name", "p", "*", "count(*)", "toUpper(p.name)",
        "= 'x'", "= 1", "<> 2", "> 1", "< 1", ">= 1", "<= 1", "== 1",
        "AND ", "OR ", "NOT ", ", ", " ", "{name: 'a'}", "{", "}", "(", ")",
        "[", "]", ":", "$param", "'unterminated", "1.5", "-1", "AS x",
        "*1..3", "+", "|", ";", "\n", "\t",
    ]
)
cypher_shaped = st.lists(_ATOMS, min_size=0, max_size=12).map("".join)
noise = st.text(max_size=60)
queries = st.one_of(cypher_shaped, noise)


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(queries)
def test_has_valid_cypher_total_and_boolean(q):
    v = has_valid_cypher(q, SCHEMA)
    assert isinstance(v, bool)


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(queries)
def test_validate_cypher_returns_strings_or_taxonomy(q):
    try:
        errs = validate_cypher(q, SCHEMA)
    except (E.CypherValidationError, E.CypherParsingError):
        return  # typed taxonomy exception: allowed (mirrors PyO3 raise path)
    assert isinstance(errs, list)
    assert all(isinstance(e, str) for e in errs)


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(queries)
def test_error_list_and_syntax_deterministic(q):
    """Task-retry safety: repeated evaluation returns identical results."""
    def snap():
        try:
            errs = tuple(get_cypher_validation_errors(q, SCHEMA))
        except (E.CypherValidationError, E.CypherParsingError) as e:
            errs = ("raised", type(e).__name__)
        try:
            syn = check_syntax(q)
        except (E.CypherValidationError, E.CypherParsingError) as e:
            syn = ("raised", type(e).__name__)
        try:
            wr = is_write(q)
        except (E.CypherValidationError, E.CypherParsingError) as e:
            wr = ("raised", type(e).__name__)
        return errs, syn, wr

    assert snap() == snap()


@settings(max_examples=300, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(queries)
def test_verdict_consistency(q):
    """has_valid_cypher(q) true ⇒ the error list is empty (the heuristic
    ladder and the error path may disagree on WHICH error, never on
    whether one exists)."""
    try:
        errs = validate_cypher(q, SCHEMA)
    except (E.CypherValidationError, E.CypherParsingError):
        errs = ["raised"]
    if has_valid_cypher(q, SCHEMA):
        assert errs == []
