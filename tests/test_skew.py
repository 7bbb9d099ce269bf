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
