"""Native MERGE-batch application: Cypher write statements → property graph.

The reference emits nothing past validation — cypher-guard checks MERGE
batches that a live Neo4j then applies (reference `data/ingest.py` ships
statements over bolt; `rust/cypher_guard/src/lib.rs` has no write engine).
This module completes the write side natively: a batch of guard-valid
MERGE statements applies to a property graph with Neo4j MERGE semantics,
entirely as DataFrame ops, and the read-side executor
(`pipeline/executor.py`) queries the result. The round-trip contract
(write-read parity, pytest + oracle gated):

    apply_merge_batches(spark, build_merge_batches(entity_map, triples))
        == graph_frames(canonical_triples)

i.e. parsing our own emitted Cypher and re-applying it reproduces the
directly-materialized graph node-for-node and edge-for-edge.

Statement MULTISET semantics — order-free, which is exactly what a
distributed apply needs and exactly what MERGE provides on this grammar
subset (idempotent, commutative):
- ``MERGE (n:L {props})`` → the node exists afterwards;
- ``MERGE (a:L1 {p})-[:T]->(b:L2 {q})`` → both endpoints exist, one edge
  per distinct (src node, type, dst node) — Neo4j creates the whole
  path when unmatched, and both halves are property-identified here;
- duplicate statements and equal property maps unify into one node, as
  MERGE would on a uniqueness-constrained store.

Typed refusals (honest subset — never silently dropped):
- CREATE: creates a NEW node per execution regardless of existing data;
  a properties-are-identity graph cannot represent two distinct nodes
  with equal property maps. MERGE-only.
- ON CREATE SET / ON MATCH SET: the storage model renders properties
  INSIDE node identity (the codegen writes the full map in the MERGE
  pattern and never emits SET — codegen.py module docstring); a
  post-merge SET would mutate identity under the executor's feet.
- property keys outside the codegen-rendered model (Person.firstName/
  lastName, Company.companyName, other-label city): schema-VALID keys
  like Person.age pass the guard but are refused here, matching the
  executor's unmaterialized-property treatment (they are never written,
  so reads see NULL).
- undirected / left-pointing / variable-length relationships in MERGE
  (Neo4j itself refuses undirected MERGE relationships), >1 hop paths,
  and relationship property maps (never emitted, nowhere to store).

Scale shape: statements parse in ONE Arrow-batched pandas UDF (broadcast
DbSchema, stateless → embarrassingly parallel, no shuffle introduced —
the `spark/validate_udf.py` pattern); the graph then falls out as
distinct() over id-only columns. No driver loops, no collect on data.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
)

from ..guard import api
from ..guard.schema import DbSchema

_SEP = "\x1f"

# the codegen-rendered property model: label → (identity field slot, keys)
# node id layout (executor._node_id_expr): label␟first␟last␟company␟city
_RENDERED_KEYS = {
    "Person": ("firstName", "lastName"),
    "Company": ("companyName",),
}
_OTHER_KEYS = ("city",)

_PARSED_SCHEMA = StructType(
    [
        StructField("kind", StringType()),  # 'node' | 'rel'
        StructField("src", StringType()),  # node identity string
        StructField("rel_type", StringType()),
        StructField("dst", StringType()),
        StructField("err", StringType()),
    ]
)


class MergeApplyRefused(Exception):
    """A statement failed validation or fell outside the applier subset."""

    def __init__(self, failures: list):
        self.failures = failures
        super().__init__(
            f"{len(failures)} statement(s) refused; first: "
            f"{failures[0][1]} [{failures[0][0][:120]}]"
        )


def _clean(text: str) -> str:
    # codegen.py:_clean — the grammar has no escapes: quotes and
    # newlines/CRs are dropped (byte-parallel with the write side)
    for ch in ("'", '"', "\n", "\r"):
        text = text.replace(ch, "")
    return text


def _node_identity(np) -> str:
    """The node's 5-field identity string from its parsed property map —
    byte-identical to executor._node_id_expr on the canonical surface,
    because the codegen renders exactly these keys from that surface.
    Raises ValueError (→ per-statement err) outside the rendered model."""
    label = np.label
    if not label:
        raise ValueError("MERGE node without a label")
    props = {p.key: p.value for p in (np.properties or [])}
    keys = _RENDERED_KEYS.get(label, _OTHER_KEYS)
    extra = set(props) - set(keys)
    if extra:
        raise ValueError(
            f"property keys outside the rendered model for {label}: "
            f"{sorted(extra)} (the codegen never writes them; the "
            "executor reads them as NULL)"
        )
    missing = set(keys) - set(props)
    if missing:
        raise ValueError(
            f"MERGE {label} without its identity keys: {sorted(missing)}"
        )
    vals = {}
    for k in keys:
        pv = props[k]
        # number literals render through format_string %s the same way
        vals[k] = _clean(str(pv.value))
    first = vals.get("firstName", "")
    last = vals.get("lastName", "")
    company = vals.get("companyName", "")
    city = vals.get("city", "")
    if label == "Person":
        company = city = ""
    elif label == "Company":
        first = last = city = ""
    else:
        first = last = company = ""
        city = vals["city"]
    return _SEP.join([label, first, last, company, city])


def _parse_statement(stmt: str, schema: DbSchema) -> tuple:
    """One statement → (kind, src, rel_type, dst, err)."""
    if stmt is None or not stmt.strip():
        return (None, None, None, None, "empty statement")
    ast, perr, verrors = api.analyze(stmt, schema)
    if perr is not None:
        return (None, None, None, None, f"{perr.code}: {perr.message}")
    if verrors:
        return (None, None, None, None, "; ".join(e.message for e in verrors))
    if ast.create_clauses:
        return (
            None,
            None,
            None,
            None,
            "CREATE is refused: it makes a new node per execution; a "
            "properties-are-identity graph cannot hold two nodes with "
            "equal property maps (MERGE-only applier)",
        )
    if len(ast.merge_clauses) != 1 or any(
        (
            ast.match_clauses,
            ast.with_clauses,
            ast.where_clauses,
            ast.unwind_clauses,
            ast.call_clauses,
            ast.return_clauses,
        )
    ):
        return (
            None,
            None,
            None,
            None,
            "applier statements are exactly one MERGE clause",
        )
    mc = ast.merge_clauses[0]
    if (mc.on_create is not None and mc.on_create.set_clauses) or (
        mc.on_match is not None and mc.on_match.set_clauses
    ):
        return (
            None,
            None,
            None,
            None,
            "ON CREATE/ON MATCH SET is refused: properties live inside "
            "node identity (the codegen never emits SET)",
        )
    if len(mc.elements) != 1:
        return (None, None, None, None, "one pattern per MERGE statement")
    pattern = mc.elements[0].pattern
    nodes = [p for p in pattern if p.__class__.__name__ == "NodePattern"]
    rels = [p for p in pattern if p.__class__.__name__ == "RelationshipPattern"]
    if len(nodes) + len(rels) != len(pattern):
        # quantified path patterns parse inside MERGE (the grammar
        # reuses match_element) but have no apply semantics
        return (
            None,
            None,
            None,
            None,
            "quantified path pattern in MERGE (no apply semantics)",
        )
    try:
        if len(nodes) == 1 and not rels:
            return ("node", _node_identity(nodes[0]), None, None, None)
        if len(nodes) == 2 and len(rels) == 1:
            d = rels[0].details
            if d.direction != "right":
                raise ValueError(
                    "MERGE relationships must be directed left-to-right "
                    "(Neo4j refuses undirected MERGE)"
                )
            if d.length is not None or d.quantifier is not None:
                raise ValueError("variable-length MERGE relationship")
            if d.properties:
                raise ValueError(
                    "relationship property maps are never emitted; "
                    "nowhere to store them"
                )
            if not d.rel_type:
                raise ValueError("MERGE relationship without a type")
            return (
                "rel",
                _node_identity(nodes[0]),
                d.rel_type,
                _node_identity(nodes[1]),
                None,
            )
        raise ValueError("MERGE pattern beyond a node or one directed hop")
    except ValueError as e:
        return (None, None, None, None, str(e))


def _make_parse_fn(bc_schema):
    cache: dict = {}

    def batch(series_iter: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        schema = cache.get("schema")
        if schema is None:
            schema = bc_schema.value
            cache["schema"] = schema
        for series in series_iter:
            rows = [_parse_statement(s, schema) for s in series]
            yield pd.DataFrame(
                rows, columns=["kind", "src", "rel_type", "dst", "err"]
            )

    return batch


def parse_merge_statements(
    spark: SparkSession,
    statements: DataFrame,
    schema: DbSchema,
    statement_col: str = "statement",
) -> DataFrame:
    """statements + (kind, src, rel_type, dst, err) — one Arrow-batched
    pandas UDF over the statement column, DbSchema on a broadcast."""
    bc = spark.sparkContext.broadcast(schema)
    udf = F.pandas_udf(_make_parse_fn(bc), _PARSED_SCHEMA)
    return statements.withColumn("parsed", udf(F.col(statement_col))).select(
        "*",
        F.col("parsed.kind").alias("kind"),
        F.col("parsed.src").alias("src"),
        F.col("parsed.rel_type").alias("rel_type"),
        F.col("parsed.dst").alias("dst"),
        F.col("parsed.err").alias("err"),
    ).drop("parsed")


def apply_merge_batches(
    spark: SparkSession,
    batches: DataFrame,
    schema: DbSchema | None = None,
    cypher_col: str = "cypher",
    on_error: str = "raise",
) -> tuple:
    """Apply MERGE batches → (nodes, edges) in the executor's
    graph_frames layout: nodes (node_id), edges (src, pred, dst,
    edge_id), both distinct.

    `batches` carries newline-joined multi-statement batch strings
    (build_merge_batches output) — statements split and explode JVM-side
    before the single parse UDF. `on_error='raise'` (default) raises
    MergeApplyRefused listing every refused statement; 'skip' applies
    the valid subset (the refusals remain queryable via
    parse_merge_statements). The apply itself is one parse pass + two
    distinct()s — no driver loop, nothing collected but refusals.
    """
    if schema is None:
        from .synth import pipeline_db_schema

        schema = pipeline_db_schema()
    stmts = batches.select(
        F.explode(F.split(F.col(cypher_col), "\n")).alias("statement")
    ).where(F.trim("statement") != "")
    parsed = parse_merge_statements(spark, stmts, schema)
    if on_error == "raise":
        bad = parsed.where(F.col("err").isNotNull()).select("statement", "err")
        failures = [(r["statement"], r["err"]) for r in bad.limit(20).collect()]
        if failures:
            raise MergeApplyRefused(failures)
    else:
        parsed = parsed.where(F.col("err").isNull())
    edges = (
        parsed.where(F.col("kind") == "rel")
        .select("src", F.col("rel_type").alias("pred"), "dst")
        .dropDuplicates()
        .withColumn("edge_id", F.concat_ws(_SEP, "src", "pred", "dst"))
    )
    nodes = (
        parsed.where(F.col("kind") == "node")
        .select(F.col("src").alias("node_id"))
        .unionByName(edges.select(F.col("src").alias("node_id")))
        .unionByName(edges.select(F.col("dst").alias("node_id")))
        .dropDuplicates()
    )
    return nodes, edges
