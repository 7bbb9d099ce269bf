"""Relational/analytic operators over the TPC-H-ish testdata tables.

These are the headline scan/join/aggregate/window queries: each is written
so Catalyst gets maximal freedom — filters next to scans (pushdown),
explicit broadcast hints for dimension tables, aggregates expressed so
map-side partial aggregation applies. All have exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 flavor: one wide scan, group on two low-cardinality keys —
    partial aggregation does nearly all the work map-side."""
    l = load(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_unshipped_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 flavor: customer ⋈ orders ⋈ lineitem with selective filters
    pushed below the joins; customer is broadcast."""
    c = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1995-03-15"))
    l = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(20)
    )


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 flavor: star join through region/nation/customer/orders/
    lineitem; dimensions broadcast, fact never shuffled for the joins."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy("n_name")
    )


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 flavor via left-semi join (EXISTS)."""
    o = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    # commitdate/receiptdate are absent from this synthetic lineitem; the
    # EXISTS arm uses a quantity predicate as the stand-in.
    l = load(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per customer with deterministic top-k (revenue desc, key asc)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    rev = (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", "revenue")
    )
    return rev.orderBy(F.col("revenue").desc(), "c_custkey").limit(25)


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event counts per type — the batch face of the
    streaming windowed aggregation (same plan shape as readStream+window)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
        .orderBy("window_start", "event_type")
    )


def events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users per event type by total value (window function; rank
    ties broken by user_id for determinism)."""
    e = load(spark, sf_dir, "events")
    per_user = e.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 4).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return (
        per_user.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select("event_type", "user_id", "total_value", "rnk")
    )


def events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session counts per user with a 30-minute inactivity gap — lag +
    cumulative sum over a per-user window (the batch twin of
    session_window in Structured Streaming)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    marked = e.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    sess = marked.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


def events_retention(
    spark: SparkSession, sf_dir: str, period_s: int = 7 * 86400
) -> DataFrame:
    """(cohort_period, period_offset, n_users) — classic cohort
    retention: users are cohorted by the period of their FIRST event
    (floor(epoch/period)), and each (cohort, offset) cell counts the
    distinct users of that cohort active `offset` periods later.

    Scale posture: the first-event cohort is one partial-agg min per
    user; the activity grid is a distinct over (user, period) BEFORE the
    cohort join (shrinking the join input to user-period granularity);
    the final count is a partial agg on the tiny (cohort, offset) key.
    Two keyed shuffles + one join on user_id — no windows, no event-level
    joins. All arithmetic is integer, so the oracle is exact.
    """
    e = load(spark, sf_dir, "events")
    period = F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(period_s)
    ).cast("long")
    activity = e.select("user_id", period.alias("p")).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("p").alias("cohort_p"))
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_p").alias("cohort_period"),
            (F.col("p") - F.col("cohort_p")).alias("period_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
