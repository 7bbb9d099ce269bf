"""Skew stress for the MinHash LSH band self-join (VERDICT r3 #7).

The link-scoring skew test (test_pipeline.py) covers the salted groupBy
side; this one covers the JOIN side: a boilerplate-heavy corpus where one
band bucket holds a large identical-doc set, asserting that

* AQE's skew-join split ENGAGES on the band self-join (the final
  adaptive plan carries `AQEShuffleRead ... skewed` readers on both join
  sides) under `forceOptimizeSkewedJoin=true` — forcing is required
  because the candidate dropDuplicates re-shuffles on (a, b) downstream
  and the conservative rule backs off when a split would add a shuffle
  (a shuffle this plan pays anyway; documented in the operator), and
* the pair set is IDENTICAL with and without the split (the split is a
  pure physical re-chunking of the hot partition).

Thresholds are scaled down (2KB/1KB vs the 256MB/64MB production
defaults) so the toy corpus's hot partition crosses them — the at-scale
shape, miniaturized, exactly like the link-scoring test pins AQE
coalescing off for its probe.
"""

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

# uses the conftest session-scoped `spark` fixture: every knob this test
# needs is runtime-settable (and restored), and an extra module-local
# session stop/start between suite modules races SparkContext teardown


def _hot_band_corpus(spark, n=800, hot=600):
    """`hot` identical boilerplate docs (every band bucket collides) +
    unique tails — the crawl shape that serializes an unprotected band
    join."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < hot,
            F.lit("the quick brown fox jumps over the lazy dog again and again"),
        )
        .otherwise(
            F.concat(
                F.lit("unique document number "),
                F.col("id").cast("string"),
                F.lit(" with words "),
                (F.col("id") * 7 % 1000).cast("string"),
            )
        )
        .alias("text"),
    )


def test_band_join_skew_split_engages_and_preserves_pairs(spark):
    from cypher_guard_spark.ops.dedup import minhash_near_duplicates

    docs = _hot_band_corpus(spark)
    knobs = {
        # 64 partitions so the median stays tiny and the hot band's
        # partitions clear the x2 factor cleanly (75% of docs identical)
        "spark.sql.shuffle.partitions": "64",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    prev = {k: spark.conf.get(k) for k in knobs}
    try:
        for k, v in knobs.items():
            spark.conf.set(k, v)
        pairs = minhash_near_duplicates(docs, threshold=0.7)
        with_split = {(r["a"], r["b"]) for r in pairs.collect()}
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # both sides of the band self-join read the hot partition split
        assert plan.count("skewed") >= 2, plan[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)

    # the 600 identical docs are all pairwise dups; uniques contribute none
    assert len(with_split) == 600 * 599 // 2
    # split is a physical re-chunking only: same pair set without it
    without_split = {
        (r["a"], r["b"])
        for r in minhash_near_duplicates(docs, threshold=0.7).collect()
    }
    assert with_split == without_split


def test_wedge_join_degree_orientation_bounds_hub_key(spark):
    """VERDICT r4 task 8: the triangle/k-truss wedge join on a hub-heavy
    graph (one vertex on 50% of edges). The degree-ordered orientation
    (`_enumerate_triangles`) pivots every wedge at its LOWEST-degree
    vertex, so the hub never becomes a wedge key: per-key wedge rows stay
    bounded by the small-vertex degree (C(3,2)=3 here) instead of the
    hub's C(300,2)=44,850 — the difference between a bounded reduce task
    and a serialized one at web scale. Counts are verified against the
    closed form (hub-spoke ring: one triangle per ring edge)."""
    from pyspark.sql import functions as F

    from cypher_guard_spark.pipeline.graph_algo import (
        _enumerate_triangles,
        triangle_count,
    )

    n = 300
    hub_edges = [("hub", f"s{i:03d}") for i in range(n)]
    ring_edges = [(f"s{i:03d}", f"s{(i + 1) % n:03d}") for i in range(n)]
    df = spark.createDataFrame(hub_edges + ring_edges, ["src", "dst"])
    und = df.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()

    # closed form: each ring edge closes exactly one triangle with the hub
    tris = _enumerate_triangles(und)
    assert tris.count() == n
    tc = {
        r["entity"]: r["n_triangles"]
        for r in triangle_count(df).collect()
    }
    assert tc["hub"] == n
    assert all(tc[f"s{i:03d}"] == 2 for i in range(n))

    # the orientation invariant itself: reproduce the kernel's
    # (deg, id)-ordered edge direction independently and assert the max
    # per-pivot out-degree (= wedge-join key fan-out) is the SPOKE degree,
    # never the hub's
    deg = (
        und.select(F.col("a").alias("e"))
        .unionByName(und.select(F.col("b").alias("e")))
        .groupBy("e")
        .agg(F.count("*").alias("d"))
    )
    degs = {r["e"]: r["d"] for r in deg.collect()}
    out: dict = {}
    for r in und.collect():
        a, b = r["a"], r["b"]
        u = a if (degs[a], a) < (degs[b], b) else b
        out[u] = out.get(u, 0) + 1
    assert "hub" not in out  # every hub edge points AT the hub
    max_fanout = max(out.values())
    assert max_fanout <= 3, max_fanout
    # wedges per pivot = C(out_deg, 2) <= 3, vs C(300, 2) unoriented
    assert max(v * (v - 1) // 2 for v in out.values()) <= 3


def test_hyperball_hub_star_closed_form(spark):
    """A 500-spoke directed star (center -> every spoke): the HyperBall
    register merge must union the hub's full fan-out in the combiner and
    report the closed form exactly in the sketch's coupon-exact regime
    at lgk=14 — N(1) = 500 (center's ball), nothing new at deeper hops,
    frac_cum 1.0 from hop 1. The hub key never explodes: hll_union_agg
    is a partial agg, so the 500-sketch fan-in collapses map-side
    (plan-locked in test_graph_algo)."""
    from cypher_guard_spark.pipeline.graph_algo import (
        neighborhood_function_approx,
    )

    n = 500
    e = spark.createDataFrame(
        [("hub", f"s{i:03d}") for i in range(n)], ["src", "dst"]
    )
    rows = {
        r["hops"]: (r["pairs_at"], r["pairs_cum"], r["frac_cum"])
        for r in neighborhood_function_approx(spark, e, k=3, lgk=14).collect()
    }
    assert rows[1] == (n, n, 1.0)
    assert rows[2] == (0, n, 1.0)
    assert rows[3] == (0, n, 1.0)
