"""Entailment (pipeline/reasoning.py), metapath profile
(pipeline/schema_infer.metapath_profile) and per-community conductance
(pipeline/graph_algo.community_quality) — hand-valued graphs plus the
closed-form identities each kernel must satisfy."""

from pyspark.sql import functions as F

from cypher_guard_spark.pipeline.graph_algo import community_quality
from cypher_guard_spark.pipeline.reasoning import (
    entail_chain,
    entail_transitive,
    saturate,
)
from cypher_guard_spark.pipeline.schema_infer import metapath_profile


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


# ---------------------------------------------------------------- transitive


def test_transitive_chain_min_depths(spark):
    t = _triples(
        spark, [("a", "P", "b"), ("b", "P", "c"), ("c", "P", "d")]
    )
    got = {
        (r.subj, r.obj): (r.pred, r.rule, r.depth)
        for r in entail_transitive(spark, t, "P", max_depth=4).collect()
    }
    assert got == {
        ("a", "c"): ("P", "transitive:P", 2),
        ("b", "d"): ("P", "transitive:P", 2),
        ("a", "d"): ("P", "transitive:P", 3),
    }


def test_transitive_depth_cap_truncates(spark):
    t = _triples(
        spark, [("a", "P", "b"), ("b", "P", "c"), ("c", "P", "d")]
    )
    got = {
        (r.subj, r.obj)
        for r in entail_transitive(spark, t, "P", max_depth=2).collect()
    }
    assert got == {("a", "c"), ("b", "d")}


def test_transitive_existing_base_fact_not_reemitted(spark):
    # (a,c) is derivable in 2 hops but already asserted: minimal depth is
    # 1, so it never appears — "new facts only" falls out of minimality.
    t = _triples(
        spark, [("a", "P", "b"), ("b", "P", "c"), ("a", "P", "c")]
    )
    assert entail_transitive(spark, t, "P", max_depth=3).count() == 0


def test_transitive_cycle_is_irreflexive(spark):
    t = _triples(
        spark, [("a", "P", "b"), ("b", "P", "c"), ("c", "P", "a")]
    )
    rows = entail_transitive(spark, t, "P", max_depth=5).collect()
    assert all(r.subj != r.obj for r in rows)
    got = {(r.subj, r.obj): r.depth for r in rows}
    assert got == {
        ("a", "c"): 2,
        ("b", "a"): 2,
        ("c", "b"): 2,
    }


def test_transitive_scoped_to_predicate(spark):
    # the Q edge must not bridge the P chain
    t = _triples(spark, [("a", "P", "b"), ("b", "Q", "c")])
    assert entail_transitive(spark, t, "P", max_depth=3).count() == 0


# --------------------------------------------------------------------- chain


def test_chain_composition_and_exclusion(spark):
    t = _triples(
        spark,
        [
            ("p1", "WORKS_FOR", "acme"),
            ("p2", "WORKS_FOR", "acme"),
            ("acme", "LOCATED_IN", "rome"),
            ("p2", "BASED_IN", "rome"),  # already asserted -> excluded
        ],
    )
    got = {
        (r.subj, r.pred, r.obj, r.rule, r.depth)
        for r in entail_chain(
            t, "WORKS_FOR", "LOCATED_IN", "BASED_IN"
        ).collect()
    }
    assert got == {
        ("p1", "BASED_IN", "rome", "chain:WORKS_FOR*LOCATED_IN", 2)
    }


def test_chain_distinct_over_multiple_midpoints(spark):
    # two distinct midpoints deriving the same pair -> one row
    t = _triples(
        spark,
        [
            ("p", "A", "m1"),
            ("p", "A", "m2"),
            ("m1", "B", "x"),
            ("m2", "B", "x"),
        ],
    )
    rows = entail_chain(t, "A", "B", "C").collect()
    assert len(rows) == 1 and rows[0].subj == "p" and rows[0].obj == "x"


# ------------------------------------------------------------------ saturate


def test_saturate_unions_rule_families(spark):
    t = _triples(
        spark,
        [
            ("a", "KNOWS", "b"),
            ("b", "KNOWS", "c"),
            ("a", "WORKS_FOR", "acme"),
            ("acme", "LOCATED_IN", "rome"),
        ],
    )
    out = saturate(
        spark,
        t,
        transitive_preds=["KNOWS"],
        chains=[("WORKS_FOR", "LOCATED_IN", "BASED_IN")],
        max_depth=3,
    )
    got = {(r.subj, r.pred, r.obj, r.rule) for r in out.collect()}
    assert got == {
        ("a", "KNOWS", "c", "transitive:KNOWS"),
        ("a", "BASED_IN", "rome", "chain:WORKS_FOR*LOCATED_IN"),
    }


# ----------------------------------------------------------------- metapaths


def test_metapath_star_degree_product(spark):
    # hub midpoint: 2 in-edges (A) x 3 out-edges (B) = 6 paths, 1 midpoint
    t = _triples(
        spark,
        [("s1", "A", "m"), ("s2", "A", "m")]
        + [("m", "B", f"o{i}") for i in range(3)],
    )
    rows = metapath_profile(t).collect()
    got = {(r.p1, r.p2): (r.n_paths, r.n_mid) for r in rows}
    assert got[("A", "B")] == (6, 1)


def test_metapath_matches_enumeration(spark):
    # brute-force enumeration on a small random-ish fixed graph
    rows = [
        ("a", "P", "b"),
        ("b", "P", "c"),
        ("b", "Q", "d"),
        ("c", "Q", "d"),
        ("d", "P", "a"),
        ("a", "Q", "b"),
        ("a", "P", "b"),  # duplicate fact: distinct set semantics
    ]
    t = _triples(spark, rows)
    facts = set(rows)
    brute = {}
    for s1, p1, o1 in facts:
        for s2, p2, o2 in facts:
            if o1 == s2:
                k = (p1, p2)
                paths, mids = brute.get(k, (0, set()))
                mids.add(o1)
                brute[k] = (paths + 1, mids)
    got = {
        (r.p1, r.p2): (r.n_paths, r.n_mid)
        for r in metapath_profile(t).collect()
    }
    assert got == {k: (n, len(m)) for k, (n, m) in brute.items()}


def test_metapath_plan_is_degree_product_not_enumeration(spark):
    # lock the shape: exactly one join, both sides pre-aggregated — a
    # regression to fact x fact enumeration shows a Join over raw facts
    # (one Aggregate total, after the join)
    t = _triples(spark, [("a", "P", "b"), ("b", "Q", "c")])
    plan = metapath_profile(t)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") == 1
    pre_join = plan.split("Join", 1)[1]
    assert pre_join.count("Aggregate") >= 2, plan


# --------------------------------------------------------- community quality


def test_community_quality_two_triangles_bridge(spark):
    # two triangles joined by one bridge edge; communities given explicitly
    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("a", "c"),
            ("x", "y"), ("y", "z"), ("x", "z"),
            ("c", "x"),
        ],
        "src string, dst string",
    )
    com = spark.createDataFrame(
        [("a", "L"), ("b", "L"), ("c", "L"),
         ("x", "R"), ("y", "R"), ("z", "R")],
        "entity string, community string",
    )
    got = {
        r.community: (
            r.n_vertices, r.internal_edges, r.cut_edges, r.volume,
            r.conductance,
        )
        for r in community_quality(edges, com).collect()
    }
    # m=7; each side: internal 3, cut 1, vol 7; phi = 1/min(7, 14-7) = 1/7
    assert got["L"] == (3, 3, 1, 7, 1 / 7)
    assert got["R"] == (3, 3, 1, 7, 1 / 7)


def test_community_quality_single_community_zero_cut(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "src string, dst string"
    )
    com = spark.createDataFrame(
        [("a", "C"), ("b", "C"), ("c", "C")],
        "entity string, community string",
    )
    rows = community_quality(edges, com).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_vertices, r.internal_edges, r.cut_edges, r.volume) == (
        3, 2, 0, 4,
    )
    # cut 0 -> conductance 0 even though min(vol, 2m-vol)=0
    assert r.conductance == 0.0


def test_community_quality_duplicate_and_self_edges_normalized(spark):
    # duplicates and self-loops never count; direction is ignored
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c")],
        "src string, dst string",
    )
    com = spark.createDataFrame(
        [("a", "C"), ("b", "C"), ("c", "D")],
        "entity string, community string",
    )
    got = {
        r.community: (r.internal_edges, r.cut_edges, r.volume)
        for r in community_quality(edges, com).collect()
    }
    assert got["C"] == (1, 1, 3)
    assert got["D"] == (0, 1, 1)
    # D: phi = 1/min(1, 4-1) = 1.0 — a singleton hanging off a module
    rows = {r.community: r.conductance for r in community_quality(edges, com).collect()}
    assert rows["D"] == 1.0
