"""Cypher MATCH executor (pipeline/executor.py): validated queries compile
to DataFrame join plans over the property graph the MERGE codegen
materializes — read-side parity with the write side.

Reference parity note: cypher-guard validates but cannot execute
(rust/cypher_guard/src/lib.rs has no evaluator); execution semantics here
are Neo4j/openCypher for the supported subset — bag semantics,
relationship uniqueness, undirected = both orientations (self-loops
once), unmaterialized-but-schema-valid properties are NULL.
"""

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from cypher_guard_spark.pipeline.executor import (  # noqa: E402
    CypherExecutionRefused,
    UnsupportedCypherFeature,
    execute_cypher,
)


@pytest.fixture(scope="session")
def spark():
    from cypher_guard_spark.spark import build_session

    spark = build_session("executor-tests", cores=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        # (doc, subj, pred, obj, subj_label, obj_label)
        ("d1", "John Smith", "WORKS_FOR", "Acme Corp", "Person", "Company"),
        ("d1", "Acme Corp", "LOCATED_IN", "Berlin", "Company", "Location"),
        ("d2", "Jane Doe", "WORKS_FOR", "Acme Corp", "Person", "Company"),
        ("d2", "John Smith", "KNOWS", "Jane Doe", "Person", "Person"),
        ("d3", "Jane Doe", "KNOWS", "Bob Stone", "Person", "Person"),
        # duplicate triple in another doc: ONE edge after MERGE semantics
        ("d4", "John Smith", "WORKS_FOR", "Acme Corp", "Person", "Company"),
    ]
    return spark.createDataFrame(
        rows, ["doc_id", "subj", "pred", "obj", "subj_label", "obj_label"]
    ).cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_directed_chain(spark, triples):
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:WORKS_FOR]->(c:Company)-[:LOCATED_IN]->(l:Location) "
        "RETURN a.firstName, a.lastName, c.companyName, l.city",
    )
    assert out.columns == ["a_firstName", "a_lastName", "c_companyName", "l_city"]
    assert _rows(out) == [
        ("Jane", "Doe", "Acme Corp", "Berlin"),
        ("John", "Smith", "Acme Corp", "Berlin"),
    ]


def test_merge_semantics_dedupe_edges(spark, triples):
    """The duplicate d4 WORKS_FOR triple is ONE edge — a MERGE-loaded
    Neo4j graph has one relationship per distinct (src, type, dst)."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:WORKS_FOR]->(c:Company) RETURN a.firstName",
    )
    assert sorted(r[0] for r in out.collect()) == ["Jane", "John"]


def test_undirected_binds_both_orientations(spark, triples):
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS]-(b:Person) RETURN a.firstName, b.firstName",
    )
    assert _rows(out) == [
        ("Bob", "Jane"),
        ("Jane", "Bob"),
        ("Jane", "John"),
        ("John", "Jane"),
    ]


def test_varlen_relationship_uniqueness(spark, triples):
    """[:KNOWS*1..2] undirected: John—Jane—Bob chain. 2-hop John→Bob via
    two distinct edges matches; John→Jane→John (same edge twice) must
    NOT — openCypher relationship uniqueness."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS*1..2]-(b:Person) "
        "WHERE a.firstName = 'John' RETURN b.firstName",
    )
    assert sorted(r[0] for r in out.collect()) == ["Bob", "Jane"]


def test_cycle_variable_reuse(spark, triples):
    """(a)-[:KNOWS]->(b)-[:KNOWS]->(a) on a 2-cycle: variable reuse
    compiles to a natural-join equality; distinct edges satisfy
    uniqueness."""
    extra = triples.sparkSession.createDataFrame(
        [("d9", "Jane Doe", "KNOWS", "John Smith", "Person", "Person")],
        triples.columns,
    )
    out = execute_cypher(
        spark,
        triples.unionByName(extra),
        "MATCH (a:Person)-[:KNOWS]->(b:Person)-[:KNOWS]->(a) "
        "RETURN a.firstName, b.firstName",
    )
    assert _rows(out) == [("Jane", "John"), ("John", "Jane")]


def test_self_loop_binds_once_undirected(spark):
    one = pytest.importorskip("pyspark").sql.SparkSession.getActiveSession()
    t = one.createDataFrame(
        [("d1", "Ann Bell", "KNOWS", "Ann Bell", "Person", "Person")],
        ["doc_id", "subj", "pred", "obj", "subj_label", "obj_label"],
    )
    out = execute_cypher(
        one, t, "MATCH (a:Person)-[:KNOWS]-(b:Person) RETURN b.firstName"
    )
    assert [r[0] for r in out.collect()] == ["Ann"]


def test_single_node_pattern_and_node_return(spark, triples):
    out = execute_cypher(spark, triples, "MATCH (a:Location) RETURN a.city")
    assert [r[0] for r in out.collect()] == ["Berlin"]
    ids = execute_cypher(spark, triples, "MATCH (a:Location) RETURN a")
    assert ids.columns == ["a"]
    assert ids.collect()[0][0].startswith("Location\x1f")


def test_pattern_property_map_filter(spark, triples):
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person {firstName: 'Jane'})-[:WORKS_FOR]->(c:Company) "
        "RETURN a.lastName",
    )
    assert [r[0] for r in out.collect()] == ["Doe"]


def test_where_boolean_combinators(spark, triples):
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:WORKS_FOR]->(c:Company) "
        "WHERE a.firstName = 'Jane' OR a.lastName = 'Smith' "
        "RETURN a.firstName",
    )
    assert sorted(r[0] for r in out.collect()) == ["Jane", "John"]
    out2 = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:WORKS_FOR]->(c:Company) "
        "WHERE NOT a.lastName = 'Smith' RETURN a.firstName",
    )
    assert [r[0] for r in out2.collect()] == ["Jane"]


def test_unmaterialized_property_is_null(spark, triples):
    """Schema-valid properties the codegen never writes (Person.age)
    behave like missing keys in Neo4j: comparisons never match, IS NULL
    always does, RETURN yields NULL."""
    none = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS]->(b:Person) WHERE a.age > 30 "
        "RETURN a.firstName",
    )
    assert none.count() == 0
    nulls = execute_cypher(
        spark, triples, "MATCH (a:Person)-[:KNOWS]->(b:Person) RETURN a.age"
    )
    # two directed KNOWS edges in the fixture → two bindings, both NULL
    assert [r[0] for r in nulls.collect()] == [None, None]


def test_validation_gate_refuses(spark, triples):
    with pytest.raises(CypherExecutionRefused) as ei:
        execute_cypher(spark, triples, "MATCH (a:Nope) RETURN a")
    assert ei.value.errors == ["Invalid node label: Nope"]


def test_write_and_unsupported_clauses_raise(spark, triples):
    with pytest.raises(UnsupportedCypherFeature):
        execute_cypher(
            spark, triples, "MERGE (a:Person {firstName: 'X'}) RETURN a"
        )
    with pytest.raises(UnsupportedCypherFeature):
        execute_cypher(
            spark,
            triples,
            "MATCH (a:Person)-[:KNOWS*1..9]-(b:Person) RETURN a.firstName",
        )


def test_quote_stripped_identity_unifies(spark):
    """Surfaces rendering to the same property map are the same node —
    the grammar has no escapes, codegen strips quotes, and MERGE in
    Neo4j would unify them."""
    one = pyspark.sql.SparkSession.getActiveSession()
    t = one.createDataFrame(
        [
            ("d1", "O'Hara Inc", "LOCATED_IN", "Berlin", "Company", "Location"),
            ("d2", 'OHara" Inc', "LOCATED_IN", "Berlin", "Company", "Location"),
        ],
        ["doc_id", "subj", "pred", "obj", "subj_label", "obj_label"],
    )
    out = execute_cypher(
        one, t, "MATCH (c:Company)-[:LOCATED_IN]->(l:Location) RETURN c.companyName"
    )
    assert [r[0] for r in out.collect()] == ["OHara Inc"]


def test_comma_patterns_share_uniqueness_scope(spark, triples):
    """Comma patterns in ONE MATCH: joined on the shared variable c, and
    the two WORKS_FOR hops must bind distinct edges — self-pairs
    excluded without any WHERE (openCypher clause-scoped uniqueness)."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:WORKS_FOR]->(c:Company), "
        "(b:Person)-[:WORKS_FOR]->(c:Company) "
        "RETURN a.firstName, b.firstName",
    )
    assert _rows(out) == [("Jane", "John"), ("John", "Jane")]


def test_separate_match_clauses_have_separate_scopes(spark, triples):
    """Two MATCH clauses: still joined on the shared c, but uniqueness
    never crosses clauses, so self-pairs ARE returned (Neo4j parity)."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:WORKS_FOR]->(c:Company) "
        "MATCH (b:Person)-[:WORKS_FOR]->(c:Company) "
        "RETURN a.firstName, b.firstName",
    )
    assert _rows(out) == [
        ("Jane", "Jane"),
        ("Jane", "John"),
        ("John", "Jane"),
        ("John", "John"),
    ]


def test_disjoint_patterns_cartesian(spark, triples):
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Location) MATCH (b:Person)-[:KNOWS]->(x:Person) "
        "RETURN a.city, b.firstName",
    )
    assert _rows(out) == [("Berlin", "Jane"), ("Berlin", "John")]


def test_aggregate_implicit_grouping(spark, triples):
    """openCypher implicit grouping: non-aggregate RETURN items are the
    grouping keys. Undirected KNOWS degree on the John—Jane—Bob chain:
    Jane 2, John 1, Bob 1. The validating aggregate form is
    `count(var) AS alias` (the guard rejects bare count items —
    reference parity the executor inherits)."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS]-(b:Person) "
        "RETURN a.firstName, count(b) AS n_knows",
    )
    assert out.columns == ["a_firstName", "n_knows"]
    assert _rows(out) == [("Bob", 1), ("Jane", 2), ("John", 1)]


def test_aggregate_after_varlen_union(spark, triples):
    """Aggregation must run AFTER the var-length alternatives union —
    per-branch aggregation would emit one row per branch."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS*1..2]-(b:Person) "
        "WHERE a.firstName = 'John' RETURN count(b) AS n_reached",
    )
    assert out.collect() == [(2,)]


def test_alias_surface_is_reference_parity(spark, triples):
    """The guard's extractor (reference parity) REJECTS `prop AS alias`
    RETURN items ('Invalid property access ... in RETURN clause') while
    ACCEPTING `count(v) AS alias` — execution is gated on validation, so
    the executor inherits exactly that surface."""
    with pytest.raises(CypherExecutionRefused):
        execute_cypher(
            spark, triples, "MATCH (l:Location) RETURN l.city AS where_at"
        )
    out = execute_cypher(
        spark,
        triples,
        "MATCH (l:Location)<-[:LOCATED_IN]-(c:Company) RETURN count(c) AS n",
    )
    assert out.columns == ["n"]
    assert out.collect() == [(1,)]


def test_is_null_operators(spark, triples):
    """IS NULL / IS NOT NULL: unmaterialized properties (Person.age) are
    NULL on every binding, materialized ones never are."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS]->(b:Person) WHERE a.age IS NULL "
        "RETURN a.firstName",
    )
    assert sorted(r[0] for r in out.collect()) == ["Jane", "John"]
    out2 = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS]->(b:Person) "
        "WHERE a.firstName IS NOT NULL RETURN a.firstName",
    )
    assert sorted(r[0] for r in out2.collect()) == ["Jane", "John"]
    out3 = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS]->(b:Person) "
        "WHERE a.firstName IS NULL RETURN a.firstName",
    )
    assert out3.count() == 0


def test_chain_plan_has_no_cartesian(spark, triples):
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:WORKS_FOR]->(c:Company)-[:LOCATED_IN]->(l:Location) "
        "RETURN a.firstName, a.lastName, c.companyName, l.city",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_parameters_are_refused_everywhere_the_executor_reaches(spark, triples):
    """Reference grammar parity: `$param` parses ONLY inside SET values
    and UNWIND lists (clauses.rs:375,669 property_value; the pattern-side
    property_value in components.rs and the WHERE comparison value take
    no parameter alternative) — so a parameterized MATCH query fails the
    ladder with the generic syntax verdict and the executor, which gates
    on validation, inherits the refusal verbatim. Locks that the
    read-only execution surface can never see a parameter."""
    for q in (
        "MATCH (a:Person)-[:KNOWS]->(b:Person) WHERE a.firstName = $who "
        "RETURN b.firstName",
        "MATCH (a:Person {firstName: $who})-[:KNOWS]->(b:Person) "
        "RETURN b.firstName",
    ):
        with pytest.raises(CypherExecutionRefused) as ei:
            execute_cypher(spark, triples, q)
        assert "Invalid Cypher syntax" in str(ei.value)


# ---------------------------------------------------------------------------
# OPTIONAL MATCH (null-extension left joins)
# ---------------------------------------------------------------------------


def test_optional_match_null_extends(spark, triples):
    """Bob has no WORKS_FOR edge: his row survives with c = NULL; the
    employed persons bind normally (openCypher null-extension)."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:WORKS_FOR]->(c:Company) "
        "RETURN a.firstName, c.companyName",
    )
    assert _rows(out) == [
        ("Bob", None),
        ("Jane", "Acme Corp"),
        ("John", "Acme Corp"),
    ]


def test_optional_match_first_clause_yields_one_null_row(spark, triples):
    """OPTIONAL MATCH as the first clause with zero matches: exactly one
    all-NULL row (Neo4j parity), not an empty result."""
    out = execute_cypher(
        spark,
        triples,
        "OPTIONAL MATCH (a:Person {firstName: 'Zed'}) RETURN a.firstName",
    )
    assert _rows(out) == [(None,)]


def test_optional_match_disjoint_pattern(spark, triples):
    """A disjoint OPTIONAL pattern pairs every accumulated row with every
    match; with none, each row null-extends once."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person {firstName: 'Bob'}) "
        "OPTIONAL MATCH (c:Company)-[:LOCATED_IN]->(l:Location {city: 'Paris'}) "
        "RETURN a.firstName, l.city",
    )
    assert _rows(out) == [("Bob", None)]
    out2 = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person {firstName: 'Bob'}) "
        "OPTIONAL MATCH (c:Company)-[:LOCATED_IN]->(l:Location) "
        "RETURN a.firstName, l.city",
    )
    assert _rows(out2) == [("Bob", "Berlin")]


def test_optional_match_count_skips_nulls(spark, triples):
    """count(c) skips the null-extended rows, count(a) does not — the
    Cypher aggregate NULL rule falls out of F.count. (count(*) is not
    testable here: the reference RETURN grammar refuses it — the
    validation gate's verdict is inherited verbatim.)"""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:WORKS_FOR]->(c:Company) "
        "RETURN count(c) AS n, count(a) AS m",
    )
    assert _rows(out) == [(2, 3)]


def test_optional_match_chained_null_propagates(spark, triples):
    """A later OPTIONAL clause joining on a variable an earlier OPTIONAL
    left NULL never matches (NULL keys join nothing) — so the NULL
    propagates down the chain."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:WORKS_FOR]->(c:Company) "
        "OPTIONAL MATCH (c)-[:LOCATED_IN]->(l:Location) "
        "RETURN a.firstName, l.city",
    )
    assert _rows(out) == [
        ("Bob", None),
        ("Jane", "Berlin"),
        ("John", "Berlin"),
    ]


def test_optional_match_varlen_alternatives(spark, triples):
    """Var-length alternatives union BEFORE the left join: John reaches
    Jane in 1 hop and Bob in 2 (relationship uniqueness intact)."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person {firstName: 'John'}) "
        "OPTIONAL MATCH (a)-[:KNOWS*1..2]-(b:Person) RETURN b.firstName",
    )
    assert sorted(r[0] for r in out.collect()) == ["Bob", "Jane"]


def test_where_on_optional_variable_is_refused(spark, triples):
    """The reference AST stores WHERE clauses in a parallel vector
    (ast.rs:3-12): whether the predicate was written against the MATCH
    or the OPTIONAL MATCH is unrecoverable, and the two readings return
    different rows — refuse instead of guessing."""
    with pytest.raises(UnsupportedCypherFeature) as ei:
        execute_cypher(
            spark,
            triples,
            "MATCH (a:Person) OPTIONAL MATCH (a)-[:WORKS_FOR]->(c:Company) "
            "WHERE c.companyName = 'Acme Corp' RETURN a.firstName",
        )
    assert "OPTIONAL MATCH variable" in str(ei.value)
    # the same predicate on a REQUIRED variable stays executable
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:WORKS_FOR]->(c:Company) "
        "WHERE a.firstName = 'Jane' RETURN a.firstName, c.companyName",
    )
    assert _rows(out) == [("Jane", "Acme Corp")]


# ---------------------------------------------------------------------------
# UNWIND (literal lists)
# ---------------------------------------------------------------------------


def test_unwind_literal_list_alone(spark, triples):
    """Pure UNWIND query: list rows, typed by the element kind."""
    out = execute_cypher(spark, triples, "UNWIND [1, 2, 3] AS x RETURN x")
    assert _rows(out) == [(1,), (2,), (3,)]
    assert dict(out.dtypes)["x"] == "bigint"
    out2 = execute_cypher(spark, triples, "UNWIND ['a', 'b'] AS x RETURN x")
    assert _rows(out2) == [("a",), ("b",)]


def test_unwind_empty_list_yields_zero_rows(spark, triples):
    """UNWIND [] kills the result (Cypher parity: no rows, not NULL)."""
    out = execute_cypher(spark, triples, "UNWIND [] AS x RETURN x")
    assert out.count() == 0


def test_unwind_cross_joins_matches(spark, triples):
    """UNWIND after MATCH multiplies every binding by every list row;
    the reference FSM refuses MATCH after UNWIND, so the cross-join
    placement is provably the only reading."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person) UNWIND [1, 2] AS x RETURN a.firstName, x",
    )
    assert _rows(out) == [
        ("Bob", 1), ("Bob", 2),
        ("Jane", 1), ("Jane", 2),
        ("John", 1), ("John", 2),
    ]
    with pytest.raises(CypherExecutionRefused):
        execute_cypher(
            spark,
            triples,
            "UNWIND [1, 2] AS x MATCH (a:Person) RETURN a.firstName, x",
        )


def test_unwind_integer_type_semantics(spark, triples):
    """An INTEGER unwind variable compares against numeric literals and
    never matches a string (Cypher cross-type rule)."""
    out = execute_cypher(
        spark, triples, "UNWIND [1, 2, 3] AS x WHERE x > 1 RETURN x"
    )
    assert _rows(out) == [(2,), (3,)]
    out2 = execute_cypher(
        spark, triples, "UNWIND [1, 2] AS x WHERE x = 'a' RETURN x"
    )
    assert out2.count() == 0
    out3 = execute_cypher(
        spark, triples, "UNWIND ['a', 'b'] AS x WHERE x = 'a' RETURN x"
    )
    assert _rows(out3) == [("a",)]


def test_unwind_aggregates_and_stacking(spark, triples):
    """Implicit grouping works over unwind columns; two UNWINDs nest as
    a cartesian product."""
    out = execute_cypher(
        spark, triples, "UNWIND [1, 1, 2] AS x RETURN x, count(x) AS n"
    )
    assert _rows(out) == [(1, 2), (2, 1)]
    out2 = execute_cypher(
        spark,
        triples,
        "UNWIND [1, 2] AS x UNWIND ['u', 'v'] AS y RETURN x, y",
    )
    assert _rows(out2) == [(1, "u"), (1, "v"), (2, "u"), (2, "v")]


def test_unwind_refusals(spark, triples):
    """Parameters (no value at execution time), mixed-type lists, and
    shadowing a bound variable are all refused."""
    for q in (
        "UNWIND $xs AS x RETURN x",
        "UNWIND [1, 'a'] AS x RETURN x",
        "MATCH (a:Person) UNWIND [1] AS a RETURN a",
    ):
        with pytest.raises(UnsupportedCypherFeature):
            execute_cypher(spark, triples, q)


def test_unwind_composes_with_optional_match(spark, triples):
    """Null-extended optional rows survive the cross join intact."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person) OPTIONAL MATCH (a)-[:WORKS_FOR]->(c:Company) "
        "UNWIND [7] AS x RETURN a.firstName, c.companyName, x",
    )
    assert _rows(out) == [
        ("Bob", None, 7),
        ("Jane", "Acme Corp", 7),
        ("John", "Acme Corp", 7),
    ]


# ---------------------------------------------------------------------------
# Relationship + path variables
# ---------------------------------------------------------------------------

SEP = "\x1f"
PSEP = "\x1e"


def test_relationship_variable_binds_edge_identity(spark, triples):
    """RETURN r yields the edge-identity string (src SEP type SEP dst,
    node identities embedded) — our rendering of Neo4j's relationship
    entity; count(r) aggregates over the bindings."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) RETURN a.firstName, r",
    )
    rows = _rows(out)
    assert [r[0] for r in rows] == ["Jane", "John"]
    jane_edge = rows[0][1]
    assert jane_edge.split(SEP)[:3] == ["Person", "Jane", "Doe"]
    assert "KNOWS" in jane_edge
    out2 = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) RETURN count(r) AS n",
    )
    assert _rows(out2) == [(2,)]


def test_relationship_property_is_null(spark, triples):
    """r.prop in RETURN is NULL — the codegen materializes no
    relationship properties (WHERE on r.prop is refused by the
    validation ladder itself, reference parity)."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) RETURN r.since",
    )
    assert _rows(out) == [(None,), (None,)]
    with pytest.raises(CypherExecutionRefused):
        execute_cypher(
            spark,
            triples,
            "MATCH (a:Person)-[r:KNOWS]->(b:Person) "
            "WHERE r.since = 'x' RETURN a.firstName",
        )


def test_path_variable_binds_edge_chain(spark, triples):
    """RETURN p concatenates the chain's edge identities; a zero-hop
    pattern binds the node id itself."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH p = (a:Person)-[:WORKS_FOR]->(c:Company)"
        "-[:LOCATED_IN]->(l:Location) RETURN p",
    )
    rows = _rows(out)
    assert len(rows) == 2
    for (p,) in rows:
        hop1, hop2 = p.split(PSEP)
        assert "WORKS_FOR" in hop1 and "LOCATED_IN" in hop2
    out2 = execute_cypher(
        spark, triples, "MATCH p = (a:Person {firstName: 'Bob'}) RETURN p"
    )
    assert _rows(out2) == [(SEP.join(["Person", "Bob", "Stone", "", ""]),)]


def test_relationship_variable_refusals(spark, triples):
    """Named var-length rels (would bind a list), clause-internal rel
    variable reuse (Neo4j compile error), and node/rel name collisions
    are refused."""
    for q in (
        "MATCH (a:Person)-[r:KNOWS*1..2]-(b:Person) RETURN b.firstName",
        "MATCH (a:Person)-[r:KNOWS]->(b:Person)-[r:KNOWS]->(c:Person) "
        "RETURN a.firstName",
        "MATCH (a:Person)-[r:KNOWS]->(b:Person), (x:Person)-[r:KNOWS]->"
        "(y:Person) RETURN a.firstName",
    ):
        with pytest.raises(UnsupportedCypherFeature):
            execute_cypher(spark, triples, q)


def test_relationship_variable_cross_clause_is_same_edge(spark, triples):
    """Re-using r in a LATER MATCH clause natural-joins on the same
    edge (openCypher: the variable is already bound)."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) "
        "MATCH (x:Person)-[r:KNOWS]->(y:Person) "
        "RETURN a.firstName, x.firstName",
    )
    assert _rows(out) == [("Jane", "Jane"), ("John", "John")]


def test_relationship_variable_null_extends_with_optional(spark, triples):
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person) OPTIONAL MATCH (a)-[r:WORKS_FOR]->(c:Company) "
        "RETURN a.firstName, r",
    )
    rows = _rows(out)
    assert rows[0] == ("Bob", None)
    assert rows[1][0] == "Jane" and "WORKS_FOR" in rows[1][1]


# ---------------------------------------------------------------------------
# WHERE exists(n.prop)
# ---------------------------------------------------------------------------


def test_where_exists_property_predicate(spark, triples):
    """exists(n.prop) is materialized-property IS NOT NULL: true for
    codegen-rendered properties, false for schema-valid-but-never-
    materialized ones (Person.age) — and NOT exists() inverts under
    the same ternary logic."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS]->(b:Person) "
        "WHERE exists(a.firstName) RETURN a.firstName",
    )
    assert sorted(r[0] for r in out.collect()) == ["Jane", "John"]
    out2 = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS]->(b:Person) "
        "WHERE exists(a.age) RETURN a.firstName",
    )
    assert out2.count() == 0
    out3 = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS]->(b:Person) "
        "WHERE NOT exists(a.age) RETURN a.firstName",
    )
    assert sorted(r[0] for r in out3.collect()) == ["Jane", "John"]


def test_where_function_call_refusals(spark, triples):
    """exists(a.nosuch) dies in the validation ladder (invalid property
    — reference parity); unknown functions and exists over a bare
    variable parse+validate but are out of the executable subset."""
    with pytest.raises(CypherExecutionRefused):
        execute_cypher(
            spark,
            triples,
            "MATCH (a:Person) WHERE exists(a.nosuch) RETURN a.firstName",
        )
    for q in (
        "MATCH (a:Person) WHERE foo(a.firstName) RETURN a.firstName",
        "MATCH (a:Person) WHERE exists(a) RETURN a.firstName",
    ):
        with pytest.raises(UnsupportedCypherFeature):
            execute_cypher(spark, triples, q)


# ---------------------------------------------------------------------------
# WITH pipeline (single-MATCH subset: the clause-order FSM refuses WITH in
# the initial state, so with exactly one reading clause every WITH provably
# follows it — the parallel-vector AST loses placement otherwise)
# ---------------------------------------------------------------------------

def test_with_aggregation_then_property_return(spark, triples):
    out = execute_cypher(
        spark,
        triples,
        "MATCH (p:Person)-[:WORKS_FOR]->(c:Company) "
        "WITH c, count(p) AS n_emp RETURN c.companyName, n_emp",
    )
    assert out.columns == ["c_companyName", "n_emp"]
    assert _rows(out) == [("Acme Corp", 2)]


def test_with_chained_two_level_aggregation(spark, triples):
    """Degree histogram: per-person undirected KNOWS degree, then
    people per degree — the two-level aggregation only WITH can
    express."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS]-(b:Person) WITH a, count(b) AS deg "
        "WITH deg, count(a) AS n_people RETURN deg, n_people",
    )
    assert _rows(out) == [(1, 2), (2, 1)]


def test_with_having_where_on_aggregate(spark, triples):
    """HAVING-style: WHERE on a count alias lands after the aggregation
    — `deg` exists nowhere earlier, so the earliest-in-scope placement
    is the only Neo4j-compilable reading."""
    out = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[:KNOWS]-(b:Person) WITH a, count(b) AS deg "
        "WHERE deg > 1 RETURN a.firstName, deg",
    )
    assert _rows(out) == [("Jane", 2)]


def test_with_where_before_aggregation(spark, triples):
    """A WHERE whose variables are match-bound applies at binding level
    (filters on grouping keys commute with the groupBy, so placement
    cannot change the answer)."""
    out = execute_cypher(
        spark,
        triples,
        'MATCH (p:Person)-[:WORKS_FOR]->(c:Company) WHERE p.firstName = "John" '
        "WITH c, count(p) AS n RETURN c.companyName, n",
    )
    assert _rows(out) == [("Acme Corp", 1)]


def test_with_rename_and_projection(spark, triples):
    out = execute_cypher(
        spark, triples, "MATCH (p:Person) WITH p AS q RETURN q.firstName"
    )
    assert sorted(r[0] for r in out.collect()) == ["Bob", "Jane", "John"]
    out2 = execute_cypher(
        spark, triples, "MATCH (p:Person) WITH p.firstName AS fn RETURN fn"
    )
    assert sorted(r[0] for r in out2.collect()) == ["Bob", "Jane", "John"]
    # wildcard keeps the full scope
    out3 = execute_cypher(
        spark,
        triples,
        "MATCH (p:Person)-[:WORKS_FOR]->(c:Company) WITH * RETURN p.firstName",
    )
    assert sorted(r[0] for r in out3.collect()) == ["Jane", "John"]


def test_with_count_of_projected_scalar(spark, triples):
    out = execute_cypher(
        spark,
        triples,
        "MATCH (p:Person) WITH p.firstName AS fn RETURN count(fn) AS n",
    )
    assert _rows(out) == [(3,)]


def test_with_refusals(spark, triples):
    """Neo4j compile errors (unaliased expressions, shadowing) and the
    parallel-vector placement ambiguities are refused, never guessed."""
    for q in (
        # unaliased expression / aggregate: Neo4j compile error
        "MATCH (p:Person) WITH p.firstName RETURN p",
        "MATCH (p:Person) WITH count(p) RETURN p",
        # alias shadows an in-scope name
        "MATCH (p:Person) WITH p.firstName AS p RETURN p",
        # placement lost by the parallel-vector AST
        "MATCH (a:Person) MATCH (b:Person) WITH a, count(b) AS n RETURN n",
        "MATCH (a:Person) UNWIND [1,2] AS x WITH a, count(a) AS n RETURN n",
    ):
        with pytest.raises(UnsupportedCypherFeature):
            execute_cypher(spark, triples, q)
    # property access on a count alias dies in the validation ladder
    with pytest.raises(CypherExecutionRefused):
        execute_cypher(
            spark,
            triples,
            "MATCH (a:Person)-[:KNOWS]-(b:Person) WITH a, count(b) AS deg "
            "RETURN deg.foo",
        )


# ---------------------------------------------------------------------------
# CALL { subquery } (uncorrelated by construction: the subquery FSM refuses
# a leading WITH, so importing-WITH subqueries never parse; outputs are
# unreferencable outside — the guard's validator refuses them — so a CALL
# contributes exactly its cardinality, openCypher semantics)
# ---------------------------------------------------------------------------

def test_call_multiplies_rows(spark, triples):
    out = execute_cypher(
        spark,
        triples,
        "MATCH (l:Location) CALL { MATCH (p:Person) RETURN p } RETURN l.city",
    )
    # 1 location × 3 persons
    assert [r[0] for r in out.collect()] == ["Berlin", "Berlin", "Berlin"]


def test_call_aggregating_subquery_is_one_row(spark, triples):
    out = execute_cypher(
        spark,
        triples,
        "MATCH (p:Person) CALL { MATCH (x:Person)-[:KNOWS]->(y:Person) "
        "RETURN count(x) AS n } RETURN p.firstName",
    )
    assert sorted(r[0] for r in out.collect()) == ["Bob", "Jane", "John"]


def test_call_empty_subquery_eliminates_rows(spark, triples):
    out = execute_cypher(
        spark,
        triples,
        'MATCH (p:Person) CALL { MATCH (x:Person) WHERE x.firstName = "Zzz" '
        "RETURN x } RETURN p.firstName",
    )
    assert out.count() == 0


def test_call_nested_and_outer_aggregation(spark, triples):
    nested = execute_cypher(
        spark,
        triples,
        "MATCH (l:Location) CALL { MATCH (c:Company) "
        "CALL { MATCH (p:Person) RETURN p } RETURN c } RETURN l.city",
    )
    assert nested.count() == 3  # 1 location × (1 company × 3 persons)
    agg = execute_cypher(
        spark,
        triples,
        "MATCH (l:Location) CALL { MATCH (p:Person)-[:KNOWS]-(q:Person) "
        "RETURN p.firstName, q.firstName } RETURN l.city, count(l) AS n",
    )
    # 4 undirected KNOWS bindings multiply the single location
    assert _rows(agg) == [("Berlin", 4)]


def test_call_subquery_revalidated_standalone(spark, triples):
    """The reference extractor does not descend into subqueries — an
    invalid label inside CALL {} passes the outer ladder — so the
    executor re-runs the ladder on the subquery before compiling."""
    with pytest.raises(CypherExecutionRefused) as ei:
        execute_cypher(
            spark,
            triples,
            "MATCH (a:Person) CALL { MATCH (b:Nope) RETURN b } "
            "RETURN a.firstName",
        )
    assert "in CALL subquery: Invalid node label: Nope" in str(ei.value)


def test_call_refusals(spark, triples):
    for q in (
        # non-catalog procedure: nothing to call natively
        "MATCH (a:Person) CALL apoc.create() YIELD x RETURN a.firstName",
        # CALL + aggregating WITH: relative order lost, doesn't commute
        "MATCH (a:Person) CALL { MATCH (b:Person) RETURN b } "
        "WITH a, count(a) AS n RETURN n",
        # write clause inside the subquery
        'MATCH (a:Person) CALL { MERGE (b:Person {firstName: "X", '
        'lastName: "Y"}) } RETURN a.firstName',
    ):
        with pytest.raises(
            (UnsupportedCypherFeature, CypherExecutionRefused)
        ):
            execute_cypher(spark, triples, q)


def test_call_catalog_procedures(spark, triples):
    """db.labels / db.relationshipTypes / db.propertyKeys execute with
    cardinality semantics (yields are unreferencable — the validator's
    refusal is inherited): the fixture graph has 3 labels, 3 rel types,
    and 4 materialized property keys."""
    for proc, n in (
        ("db.labels() YIELD label", 3),
        ("db.relationshipTypes() YIELD relationshipType", 3),
        ("db.propertyKeys() YIELD propertyKey", 4),
    ):
        out = execute_cypher(
            spark,
            triples,
            f"MATCH (l:Location) CALL {proc} RETURN l.city",
        )
        assert out.count() == n, proc
    counted = execute_cypher(
        spark,
        triples,
        "MATCH (l:Location) CALL db.labels() YIELD label "
        "RETURN l.city, count(l) AS n_labels",
    )
    assert _rows(counted) == [("Berlin", 3)]
    # unknown two-segment procedures refuse as out of subset
    with pytest.raises(UnsupportedCypherFeature):
        execute_cypher(
            spark,
            triples,
            "MATCH (l:Location) CALL apoc.foo() YIELD x RETURN l.city",
        )


def test_where_untyped_rel_var_property_is_null(spark, triples):
    """r.prop on an UNTYPED relationship variable (which the validation
    ladder cannot type-check) is NULL, never the source node's property:
    comparisons match nothing, exists() is false, NOT exists() matches
    every binding — Neo4j parity."""
    none = execute_cypher(
        spark,
        triples,
        'MATCH (a:Person)-[r]->(b:Person) WHERE r.firstName = "John" '
        "RETURN b.firstName",
    )
    assert none.count() == 0
    none2 = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[r]->(b:Person) WHERE exists(r.firstName) "
        "RETURN b.firstName",
    )
    assert none2.count() == 0
    every = execute_cypher(
        spark,
        triples,
        "MATCH (a:Person)-[r]->(b:Person) WHERE NOT exists(r.firstName) "
        "RETURN b.firstName",
    )
    assert every.count() == 2  # both directed KNOWS edges


def test_cross_element_name_collisions_refused(spark, triples):
    """A name bound as a node in one element/clause and as a rel/path
    elsewhere would silently equi-join node ids against edge ids (empty
    result); Neo4j raises variable-already-bound — refused, never
    guessed."""
    for q in (
        "MATCH (a:Person)-[r:KNOWS]->(b:Person), (r:Person)-[:KNOWS]->"
        "(c:Person) RETURN c.firstName",
        "MATCH (a:Person)-[r:KNOWS]->(b:Person) MATCH (r:Person) "
        "RETURN a.firstName",
        "MATCH p = (a:Person)-[:KNOWS]->(b:Person) MATCH (p:Person) "
        "RETURN a.firstName",
        # WHERE on a count alias's property: typed refusal, not a
        # Spark AnalysisException from splitting a bigint
        "MATCH (a:Person)-[:KNOWS]->(b:Person) WITH a, count(b) AS deg "
        'WHERE deg.city = "x" RETURN a.firstName',
    ):
        with pytest.raises(UnsupportedCypherFeature):
            execute_cypher(spark, triples, q)


def test_catalog_yield_validation(spark, triples):
    """Neo4j compile errors around YIELD are refused: in-query CALL
    without YIELD, wrong output names, and a yield name shadowing a
    bound variable."""
    for q in (
        "MATCH (l:Location) CALL db.labels() RETURN l.city",
        "MATCH (l:Location) CALL db.labels() YIELD bogus RETURN l.city",
        "MATCH (label:Person) CALL db.labels() YIELD label "
        "RETURN label.firstName",
    ):
        with pytest.raises(UnsupportedCypherFeature):
            execute_cypher(spark, triples, q)
