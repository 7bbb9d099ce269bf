"""Rule-based KG saturation (entailment) — the inference layer of
knowledge-graph construction.

The reference validates MERGE statements against a DbSchema
(`src/lib.rs` validation surface) but has no inference engine; a
production KG-construction pipeline materializes entailed facts before
serving so that downstream queries see the deductive closure, not just
the extracted assertions.  This module implements the two rule families
that cover most ontology-saturation workloads:

- **transitive closure** of a predicate (``x p y, y p z ⇒ x p z`` —
  RDFS/OWL ``TransitiveProperty``), evaluated with the same semi-naive
  datalog strategy as `graph_algo.khop_neighborhoods`: each round
  expands only the previous round's newly-derived frontier and
  anti-joins the known set, so every entailed fact is derived exactly
  once at its minimal derivation depth;
- **property-chain composition** (``x p1 y, y p2 z ⇒ x out z`` — OWL 2
  ``propertyChainAxiom``), one equi-join on the shared midpoint plus a
  distinct.

Scale posture (10^12 facts): the closure is computed per predicate on
the predicate-scoped edge subset — ontology predicates (``is_a``,
``part_of``, social/hierarchy links) are sparse slices of the fact
table, and the scan prunes on the predicate before anything shuffles.
`max_depth` is the discipline that bounds both rounds and output volume
(closure output is O(V·avg_deg^depth), inherent to materializing
entailment); every per-round join is keyed by the frontier endpoint and
every dedup is a (subj,obj)-keyed anti-join, so hub fan-in lands on
AQE's skew split, not a single task.  Chain composition is one shuffle
keyed by the midpoint; a hub midpoint (everyone works for MegaCorp in a
city) inflates its pair count — that blow-up is the semantics, and the
DISTINCT that follows is keyed by the derived pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cypher_guard_spark.pipeline.graph_algo import khop_neighborhoods

__all__ = ["entail_transitive", "entail_chain", "saturate"]


def entail_transitive(
    spark: SparkSession,
    triples: DataFrame,
    pred: str,
    max_depth: int = 4,
    subj: str = "subj",
    pred_col: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """NEW facts entailed by transitivity of `pred`, as
    ``(subj, pred, obj, rule, depth)`` with ``depth ≥ 2`` the minimal
    derivation depth (number of base facts chained).

    Because the closure keeps the MINIMAL depth per pair, a derived pair
    that is also asserted as a base fact has depth 1 and is therefore
    never emitted — "new" falls out of minimality, no anti-join against
    the base set needed.  The closure is irreflexive: a cycle never
    emits ``x p x`` (any walk revisiting a vertex can be cut shorter;
    the reflexive diagonal carries no information for the irreflexive
    social/hierarchy predicates this targets).  `max_depth` truncates
    the closure — the production cap that bounds output volume; pass the
    graph's diameter for the full closure.
    """
    edges = (
        triples.where(F.col(pred_col) == pred)
        .select(F.col(subj).alias("src"), F.col(obj).alias("dst"))
    )
    closure = khop_neighborhoods(spark, edges, k=max_depth)
    return closure.where(F.col("hops") >= 2).select(
        F.col("src").alias("subj"),
        F.lit(pred).alias("pred"),
        F.col("dst").alias("obj"),
        F.lit(f"transitive:{pred}").alias("rule"),
        F.col("hops").cast("int").alias("depth"),
    )


def entail_chain(
    triples: DataFrame,
    p1: str,
    p2: str,
    out_pred: str,
    subj: str = "subj",
    pred_col: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """NEW facts entailed by the property chain ``p1 ∘ p2 ⇒ out_pred``,
    as ``(subj, pred, obj, rule, depth)`` with depth fixed at 2 (two
    base facts consumed per derivation).

    One equi-join on the shared midpoint over the distinct fact set,
    then a distinct on the derived pair; pairs already asserted with
    `out_pred` are anti-joined away so the output is exactly the NEW
    knowledge (same "new facts only" contract as `entail_transitive`).
    """
    facts = triples.select(
        F.col(subj).alias("subj"),
        F.col(pred_col).alias("pred"),
        F.col(obj).alias("obj"),
    ).distinct()
    left = facts.where(F.col("pred") == p1).select(
        F.col("subj").alias("s"), F.col("obj").alias("mid")
    )
    right = facts.where(F.col("pred") == p2).select(
        F.col("subj").alias("mid"), F.col("obj").alias("o")
    )
    derived = left.join(right, "mid").select("s", "o").distinct()
    existing = facts.where(F.col("pred") == out_pred).select(
        F.col("subj").alias("s"), F.col("obj").alias("o")
    )
    return derived.join(existing, ["s", "o"], "left_anti").select(
        F.col("s").alias("subj"),
        F.lit(out_pred).alias("pred"),
        F.col("o").alias("obj"),
        F.lit(f"chain:{p1}*{p2}").alias("rule"),
        F.lit(2).alias("depth"),
    )


def saturate(
    spark: SparkSession,
    triples: DataFrame,
    transitive_preds: tuple | list = (),
    chains: tuple | list = (),
    max_depth: int = 4,
    subj: str = "subj",
    pred_col: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """One-pass saturation: the union of every rule family's NEW facts,
    each row carrying its rule provenance — the inferred-triple table a
    KG materializer unions with the asserted facts before serving.

    `transitive_preds` is an iterable of predicate names; `chains` an
    iterable of ``(p1, p2, out_pred)``.  Rows are unique per
    (subj, pred, obj, rule): two rules deriving the same fact keep both
    provenance rows (consumers dedup on the fact key if they only
    materialize).  Deterministic — set iteration order never reaches the
    data (each rule's output is keyed by its own literals).
    """
    parts = [
        entail_transitive(
            spark, triples, p, max_depth=max_depth,
            subj=subj, pred_col=pred_col, obj=obj,
        )
        for p in transitive_preds
    ] + [
        entail_chain(
            triples, p1, p2, out,
            subj=subj, pred_col=pred_col, obj=obj,
        )
        for (p1, p2, out) in chains
    ]
    if not parts:
        raise ValueError("saturate: no rules given")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
