"""Characterization suite — queries/expectations carried over verbatim from
the reference's rust/python_bindings/tests/unit/test_validation.py."""

import pytest

from cypher_guard_spark.guard import DbSchema, InvalidNodeLabel, validate_cypher

VALID_QUERIES = [
    "MATCH (a:Person) WHERE a.age > 30 RETURN a.name",
    "MATCH (a:Person)-[r:KNOWS]->(b:Person) WHERE a.name = 'Alice' RETURN b.name",
    "MATCH (a:Person)-[r:ACTED_IN]->(m:Movie) WHERE m.year > 2000 RETURN a.name, m.title",
    "MATCH (a:Person)-[r:KNOWS]->(b:Person) RETURN a.name, b.name",
    "MATCH (a:Person)-[r:ACTED_IN]->(m:Movie) RETURN a.name, m.title",
    "MATCH (a:Person) RETURN a.name",
    "MATCH (a:Person)-[r:KNOWS]->(b:Person) RETURN a.name, r.since, b.name",
    "MATCH (a:Person)-[r:ACTED_IN]->(m:Movie) RETURN a.name, m.title, r.role",
    "MATCH (a:Person) WHERE a.age > 30 AND a.name = 'Alice' RETURN a.name",
    "MATCH (a:Station)-[r:LINK]->(b:Station) WHERE a.name = 'test' RETURN a.name",
]

VALID_QPP_QUERIES = [
    "MATCH ((a:Person)-[r:KNOWS]->(b:Person)){1,3} RETURN a.name, b.name",
    "MATCH ((a:Person)-[r:KNOWS]->(b:Person)){2,4} RETURN a.name, b.name",
    "MATCH ((a:Person)-[r:KNOWS]->(b:Person)){3,5} RETURN a.name, b.name",
    "MATCH ((a:Person)-[r:KNOWS]->(b:Person)){4,6} RETURN a.name, b.name",
    "MATCH ((a:Person)-[r:KNOWS]->(b:Person)){5,7} RETURN a.name, b.name",
    "MATCH ((a:Stop)-[r:NEXT]->(b:Stop)){1,3} RETURN a.departs, b.arrives",
    "MATCH ((a:Station)-[r:LINK]->(b:Station)){1,3} RETURN a.name, b.name",
    "MATCH ((a:Stop)-[r:CALLS_AT]->(b:Station)){1,3} RETURN a.departs, b.name",
    "MATCH ((a:Person)-[r:ACTED_IN]->(b:Movie)){1,3} RETURN a.name, b.title",
    "MATCH ((a:Station)-[r:LINK]->(b:Station)){1,3} WHERE a.name = 'test' RETURN a.name",
]


@pytest.mark.parametrize(
    "query",
    [
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) RETURN a.height",
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) RETURN a.name, r.invalid_property",
    ],
)
def test_cypher_query_invalid_property(query, schema):
    assert len(validate_cypher(query, schema)) > 0


@pytest.mark.parametrize(
    "query",
    [
        "MATCH (a:Person)-[r:FOLLOWS]->(b:Person) RETURN a.name",
        "MATCH (a:Station)-[r:CONNECTS]->(b:Station) RETURN a.name",
    ],
)
def test_cypher_query_invalid_relationship_type(query, schema):
    assert len(validate_cypher(query, schema)) > 0


@pytest.mark.parametrize(
    "query",
    ["MATCH (a:User) RETURN a.name", "MATCH (a:Train) RETURN a.name"],
)
def test_cypher_query_invalid_node_label(query, schema):
    assert len(validate_cypher(query, schema)) > 0


@pytest.mark.parametrize(
    "query",
    [
        "MATCH (a:Person) WHERE a.age = '30' RETURN a.name",
        "MATCH (a:Person) WHERE a.name = 123 RETURN a.name",
    ],
)
def test_cypher_query_invalid_property_type(query, schema):
    assert len(validate_cypher(query, schema)) > 0


@pytest.mark.parametrize(
    "query",
    [
        "MATCH (a:Person)<-[r:ACTED_IN]-(b:Movie) RETURN a.name",
        "MATCH (a:Stop)<-[r:CALLS_AT]-(b:Station) RETURN a.name",
    ],
)
def test_cypher_query_invalid_relationship_direction(query, schema):
    assert len(validate_cypher(query, schema)) > 0


@pytest.mark.parametrize(
    "query",
    [
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) WHERE r.role = 'friend' RETURN a.name",
        "MATCH (a:Station)-[r:LINK]->(b:Station) WHERE r.duration = 10 RETURN a.name",
    ],
)
def test_cypher_query_invalid_relationship_property(query, schema):
    assert len(validate_cypher(query, schema)) > 0


def test_complex_multiline_with_context_aware_validation(schema):
    query = """
    MATCH (a:Person)-[r:KNOWS]->(b:Person)
    WHERE a.age > 30
    WITH a, r, b
    MATCH (b)-[r2:ACTED_IN]->(m:Movie)
    WHERE r.role = 'friend'
    AND r2.role = 'actor'
    RETURN a.name, b.name, m.title
    """
    errors = validate_cypher(query, schema)
    assert len(errors) == 1
    assert any("r.role" in msg or ("r" in msg and "role" in msg) for msg in errors)


def test_complex_multiline_valid_context_aware(schema):
    query = """
    MATCH (a:Person)-[r:KNOWS]->(b:Person)
    WHERE a.age > 30
    WITH a, r, b
    MATCH (b)-[r2:ACTED_IN]->(m:Movie)
    WHERE r.since IS NOT NULL
    AND r2.role = 'actor'
    RETURN a.name, b.name, m.title
    """
    assert validate_cypher(query, schema) == []


@pytest.mark.parametrize("query", VALID_QUERIES)
def test_valid_queries(query, schema):
    assert validate_cypher(query, schema) == []


@pytest.mark.parametrize("query", VALID_QPP_QUERIES)
def test_valid_qpps(query, schema):
    assert validate_cypher(query, schema) == []


def test_basic_validation_valid(schema):
    assert validate_cypher("MATCH (p:Person) RETURN p.name", schema) == []


def test_relationship_pattern_valid(schema):
    q = "MATCH (a:Person)-[r:KNOWS {since: 2020}]->(b:Person) RETURN a.name, r.since"
    assert validate_cypher(q, schema) == []


def test_quantified_path_pattern_valid(schema):
    q = """
    MATCH ((a:Stop)-[:NEXT]->(b:Stop)){1,3}
    RETURN a.departs
    """
    assert validate_cypher(q, schema) == []


def test_merge_clause_valid(schema):
    q = "MERGE (a:Person {name: 'Alice'}) ON CREATE SET a.created = true"
    assert validate_cypher(q, schema) == []


def test_with_clause_valid(schema):
    assert validate_cypher("MATCH (a:Person) WITH a RETURN a.name", schema) == []


def test_with_clause_alias_valid(schema):
    assert validate_cypher("MATCH (a:Person) WITH a AS b RETURN b.name", schema) == []


def test_with_clause_wildcard_valid(schema):
    assert validate_cypher("MATCH (a:Person) WITH * RETURN a.name", schema) == []


def test_with_clause_invalid_variable(schema):
    errors = validate_cypher("MATCH (a:Person) WITH b RETURN b.name", schema)
    assert errors and any("Undefined variable" in e for e in errors)


def test_with_clause_invalid_alias_expression(schema):
    errors = validate_cypher("MATCH (a:Person) WITH b AS c RETURN c.name", schema)
    assert errors and any("Undefined variable" in e for e in errors)


def test_invalid_node_label(schema):
    errors = validate_cypher("MATCH (a:User) RETURN a.name", schema)
    assert errors and any("Invalid node label" in e for e in errors)


def test_invalid_relationship_type(schema):
    errors = validate_cypher(
        "MATCH (a:Person)-[r:FOLLOWS]->(b:Person) RETURN a.name", schema
    )
    assert errors and any("Invalid relationship type" in e for e in errors)


def test_invalid_node_property(schema):
    errors = validate_cypher("MATCH (a:Person) RETURN a.invalid_prop", schema)
    assert errors and any("Invalid property access" in e for e in errors)


def test_invalid_relationship_property(schema):
    errors = validate_cypher(
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) RETURN r.invalid_prop", schema
    )
    assert errors and any("Invalid property access" in e for e in errors)


def test_invalid_property_access(schema):
    errors = validate_cypher("MATCH (a:Person) RETURN a.height", schema)
    assert errors and any("Invalid property access" in e for e in errors)


def test_direct_invalid_node_label():
    with pytest.raises(InvalidNodeLabel):
        raise InvalidNodeLabel("Direct test")
