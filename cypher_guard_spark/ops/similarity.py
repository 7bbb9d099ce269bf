"""Similarity search over an embedding column (array<float>).

Two paths:
- brute-force cosine top-k — the exactness baseline; dot products via
  `F.zip_with` + `F.aggregate` (JVM-side, codegen'd — no Python);
- sign-LSH bucketed ANN — the scale path: 2^B hyperoctant buckets from the
  signs of the first B dimensions, candidates restricted to the query's
  bucket. At 100 TB the bucket column becomes the table's partition key so
  a query probes one partition instead of the corpus.

Centroid computation (per-label mean vector) shows the posexplode-and-
aggregate pattern for vector columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    # cast to double BEFORE multiplying: float32 products differ from
    # double products in the low bits, which flips 6-decimal rounding
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b):
    return _dot(a, b) / (_norm2(a) * _norm2(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, sim) — exact cosine top-k per query.

    The query side is broadcast (queries ≪ corpus); scoring is a map-only
    stage over the corpus; the only shuffle is the per-query top-k, whose
    key cardinality is |queries|. Deterministic ranking: sim desc,
    neighbor id asc."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    c = embeddings.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = q.crossJoin(c).where(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def sign_lsh_bucket(vec_col: str, bits: int = 8):
    """Bucket id from the signs of the first `bits` dimensions
    (element_at is 1-based; mirrors the SQL oracle's 1-based list index)."""
    return F.expr(
        f"aggregate(sequence(1, {bits}), 0, (acc, i) -> acc + "
        f"CASE WHEN element_at({vec_col}, i) > 0 THEN shiftleft(1, i - 1) ELSE 0 END)"
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, rank, sim) — ANN restricted to the query's
    sign-LSH bucket. Recall < 1 by design; the bucket equi-join replaces
    the cross join, so candidate count drops ~2^bits-fold."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            sign_lsh_bucket(vec_col, bits).alias("bucket"),
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nvec"),
        sign_lsh_bucket(vec_col, bits).alias("bucket"),
    )
    scored = q.join(c, "bucket").where(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )


def label_centroids(
    embeddings: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """(label, dim, centroid) — per-label mean of each dimension, rounded
    to 6dp. posexplode → groupBy(label, dim): partial aggregation map-side,
    shuffle cardinality = labels × dims."""
    exploded = embeddings.select(
        F.col(label_col).alias("label"), F.posexplode(vec_col).alias("dim", "v")
    )
    return exploded.groupBy("label", "dim").agg(
        F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid")
    )
