"""Graph materialization as BUCKETED tables: the at-rest layout for a
property graph that gets joined repeatedly.

The pipeline's hot downstream access patterns are all equi-joins on entity
ids — neighbor expansion (triples ⋈ triples on subj/obj), property lookup
(triples ⋈ entities), MERGE regeneration. At 10^12 triples every such join
costs a full shuffle of the fact table UNLESS the table is written
pre-partitioned on the join key: Spark's bucketing (`bucketBy(n, col)` +
`sortBy`) persists the hash-partitioning and sort order in the table
catalog, and the planner then schedules bucket-local sort-merge joins with
ZERO Exchange and ZERO Sort on the bucketed sides — the one-time shuffle at
write time is amortized over every later join (tests/test_graph_store.py
locks the exchange-free plan).

Bucket count is the scale dial: pick ~(table size / 128 MB) at write time
(buckets are per-table-static, unlike AQE shuffle partitions, so size for
the table's lifetime, not today's corpus). Both relation tables bucket on
their join key with the SAME count so subj-subj, subj-obj and
triples-entities joins all co-locate.

Reference: the cypher-guard reference has no storage layer at all (this
module is part of the Spark-native graph-materialization surface the
north_star asks for, alongside the MERGE-batch codegen in codegen.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_graph_tables(
    spark: SparkSession,
    canonical_triples: DataFrame,
    entity_map: DataFrame,
    db: str = "kg",
    location: str | None = None,
    buckets: int = 8,
) -> None:
    """Materialize the canonical graph as `{db}.edges` (bucketed+sorted by
    subj) and `{db}.nodes` (bucketed+sorted by entity). Overwrites."""
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}{loc}")
    (
        canonical_triples.select("subj", "pred", "obj", "doc_id")
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "subj")
        .sortBy("subj")
        .saveAsTable(f"{db}.edges")
    )
    nodes = (
        entity_map.groupBy(F.col("canonical").alias("entity"), "label")
        .agg(
            F.count("*").alias("n_surfaces"),
            F.sort_array(F.collect_set("surface")).alias("surfaces"),
        )
    )
    (
        nodes.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "entity")
        .sortBy("entity")
        .saveAsTable(f"{db}.nodes")
    )


def two_hop_neighbors(spark: SparkSession, db: str = "kg") -> DataFrame:
    """(a, via, b): paths a -[..]-> via -[..]-> b over the bucketed edge
    table. The e2 leg joins on its bucket column (subj), so it is
    bucket-local and needs no Exchange; the e1 leg arrives keyed by obj —
    the direction flip any 2-hop traversal pays — and costs exactly ONE
    exchange (asserted by test_two_hop_single_exchange). At web scale
    that halves the shuffle of an unbucketed self-join, and a second
    obj-bucketed copy of the edges would remove the remaining exchange at
    the price of 2x storage."""
    e1 = spark.table(f"{db}.edges").select(
        F.col("subj").alias("a"), F.col("obj").alias("via")
    )
    e2 = spark.table(f"{db}.edges").select(
        F.col("subj").alias("via"), F.col("obj").alias("b")
    )
    # join key = via: e2 is bucket-local (subj); e1 arrives by obj and pays
    # the one exchange that any traversal direction-flip costs
    return e1.join(e2, "via").select("a", "via", "b")


def entity_neighborhood(spark: SparkSession, db: str = "kg") -> DataFrame:
    """(subj, pred, obj, label, n_surfaces): edges enriched with the
    subject node's properties — subj-keyed on BOTH sides, fully
    exchange-free."""
    edges = spark.table(f"{db}.edges")
    nodes = spark.table(f"{db}.nodes").select(
        F.col("entity").alias("subj"), "label", "n_surfaces"
    )
    return edges.join(nodes, "subj").select(
        "subj", "pred", "obj", "label", "n_surfaces"
    )


def triple_diff(
    old: DataFrame,
    new: DataFrame,
    keys: tuple[str, ...] = ("subj", "pred", "obj"),
) -> DataFrame:
    """(*keys, status) with status in ('added', 'removed') — the
    incremental-maintenance delta between two KG snapshots (what a new
    crawl run added and what disappeared): `added` = in `new` only,
    `removed` = in `old` only; unchanged triples are not emitted.

    Both sides are deduped to distinct key tuples (a snapshot's identity
    is its triple SET), then one full-outer equi-join on the triple key
    surfaces the asymmetric rows. Scale posture: two partial-agg distincts
    + one keyed join — all on (subj, pred, obj) id tuples, never payloads;
    AQE broadcasts when one snapshot is a small delta, and if both sides
    are written bucketed on subj (write_graph_tables) the join's subj
    prefix co-locates. Output is exact set arithmetic — the oracle is
    trivially exact."""
    ks = list(keys)
    o = old.select(*ks).distinct().withColumn("_o", F.lit(1))
    n = new.select(*ks).distinct().withColumn("_n", F.lit(1))
    j = o.join(n, ks, "full_outer")
    return j.where(F.col("_o").isNull() | F.col("_n").isNull()).select(
        *ks,
        F.when(F.col("_o").isNull(), F.lit("added"))
        .otherwise(F.lit("removed"))
        .alias("status"),
    )


def fuse_triples(triples: DataFrame, exact: bool = False) -> DataFrame:
    """Evidence fusion: the canonical triple stream (one row per
    OBSERVATION, duplicates across documents expected) collapsed to one
    row per distinct (subj, pred, obj) fact with its provenance and a
    fused confidence — the step that turns extraction output into the
    dedup'd fact table a property graph actually materializes:

    - ``n_obs``      observation count (evidence weight),
    - ``n_docs``     distinct supporting documents,
    - ``first_doc`` / ``last_doc``   min/max doc_id (provenance range;
      swap in an event-time column upstream for temporal provenance),
    - ``max_conf``   strongest single observation,
    - ``agg_conf``   noisy-OR fusion ``1 - Π(1 - conf_i)`` rounded 6dp —
      independent-evidence combination (Dong et al., knowledge fusion):
      two weak observations beat one, saturating at 1.

    Determinism contract (same split as PageRank/HITS): FP multiplication
    is order-sensitive, so ``exact=True`` folds the VALUE-SORTED
    complement list (collect_list bounded by the fact's observation
    count — a famous fact with 10^8 observations makes that list
    executor-hostile, so exact mode is for the oracle gate); the DEFAULT
    partial-agg mode fuses via ``exp(Σ ln(1-conf))`` — map-side
    combining, hub-safe, FP-order-dependent in the last ulp, with the
    ``conf == 1.0`` branch handled exactly (any certain observation
    forces agg_conf = 1 without evaluating ln(0)).

    One partial-aggregating shuffle on the fact key; rows carry
    (ids, doc_id, conf) only.
    """
    g = triples.groupBy("subj", "pred", "obj")
    base = [
        F.count("*").alias("n_obs"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.max("conf").alias("max_conf"),
    ]
    if exact:
        fused = F.round(
            F.lit(1.0)
            - F.aggregate(
                F.array_sort(F.collect_list(F.lit(1.0) - F.col("conf"))),
                F.lit(1.0),
                lambda acc, x: acc * x,
            ),
            6,
        )
        return g.agg(*base, fused.alias("agg_conf"))
    # scale mode: ln-sum product, certain observations short-circuited
    certain = F.max((F.col("conf") >= 1.0).cast("int"))
    lnsum = F.sum(
        F.when(F.col("conf") >= 1.0, F.lit(0.0)).otherwise(
            F.log(F.lit(1.0) - F.col("conf"))
        )
    )
    out = g.agg(*base, certain.alias("__c"), lnsum.alias("__l"))
    fused = F.when(F.col("__c") == 1, F.lit(1.0)).otherwise(
        F.round(F.lit(1.0) - F.exp(F.col("__l")), 6)
    )
    return out.select(
        "subj", "pred", "obj", "n_obs", "n_docs", "first_doc", "last_doc",
        "max_conf", fused.alias("agg_conf"),
    )


def triple_history(
    observations: DataFrame, snapshot_col: str = "snapshot_id"
) -> DataFrame:
    """(subj, pred, obj, valid_from, valid_to) — SCD-2-style validity
    intervals for every fact across an ORDERED sequence of KG snapshots
    (integer snapshot ids): one row per contiguous run of snapshots in
    which the fact is present, so "what did we believe between crawls 3
    and 7" and fact-churn analytics become plain interval queries over a
    table, the temporal generalization of `triple_diff` (which is the
    two-snapshot special case: added = run starting at new, removed = run
    ending at old).

    Gaps-and-islands: dedup to distinct (snapshot, fact), then within
    each fact key `snapshot_id - row_number()` is constant exactly on a
    contiguous run — group on that island tag, min/max give the interval.
    Integer arithmetic throughout ⇒ oracle-exact in any engine.

    Scale: one fact-keyed window exchange (per-fact partition is at most
    n_snapshots rows — a content bound, never corpus-scaled) and one
    partial-agg on (fact, island); rows carry ids + two ints. A fact's
    history never concentrates load: the window key is the fact itself,
    so 10^10 facts spread over the cluster and hot snapshots don't skew
    (snapshot id is not a shuffle key)."""
    from pyspark.sql import Window

    d = observations.select(
        F.col(snapshot_col).cast("long").alias("sid"), "subj", "pred", "obj"
    ).distinct()
    w = Window.partitionBy("subj", "pred", "obj").orderBy("sid")
    tagged = d.withColumn("isl", F.col("sid") - F.row_number().over(w))
    return (
        tagged.groupBy("subj", "pred", "obj", "isl")
        .agg(
            F.min("sid").alias("valid_from"),
            F.max("sid").alias("valid_to"),
        )
        .drop("isl")
    )


def fact_churn(
    spark: SparkSession, history: DataFrame, n_snapshots: int
) -> DataFrame:
    """(snapshot_id, facts_born, facts_died, facts_alive) — the KG's fact
    churn timeline from the SCD-2 validity intervals `triple_history`
    emits: per snapshot t, how many facts first became valid at t
    (born: a validity run opening at t), how many ceased entering t
    (died: a run that closed at t-1), and how many are valid AT t.
    The one-table freshness/stability report a continuously-crawled KG
    publishes per crawl — churn spikes localize source changes or
    extraction regressions without diffing snapshots pairwise.

    Interval sweep, not per-snapshot scans: alive(t) never re-reads the
    interval table per t. Births and deaths are two partial aggs on the
    interval endpoints (each yielding ≤ n_snapshots rows), zero-filled
    over a generated snapshot spine, and alive(t) = Σ_{s≤t}(born−died)
    is one cumulative window over that spine — n_snapshots rows,
    driver-scale by construction (same k-row-window economics as
    `neighborhood_function`). The fact table itself is touched exactly
    twice, both map-side-combinable integer counts keyed on an endpoint
    int, so 10^10 intervals spread by hash and hot snapshots cannot skew
    a shuffle (the snapshot id only ever keys the ≤ n_snapshots-row
    agg OUTPUT, never a corpus-scaled exchange).

    Deaths are counted entering t (run closed at t-1), so a fact whose
    run ends at the final snapshot never dies in-range and the identity
    alive(t) = born(≤t) − died(≤t) holds exactly; intervals are assumed
    disjoint per fact (what triple_history produces), else a fact counts
    once per validity run."""
    from pyspark.sql import Window

    births = history.groupBy(
        F.col("valid_from").cast("long").alias("snapshot_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("facts_born"))
    deaths = history.groupBy(
        (F.col("valid_to").cast("long") + F.lit(1)).alias("snapshot_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("facts_died"))
    spine = spark.range(n_snapshots).select(
        F.col("id").cast("long").alias("snapshot_id")
    )
    filled = (
        spine.join(births, "snapshot_id", "left")
        .join(deaths, "snapshot_id", "left")
        .select(
            "snapshot_id",
            F.coalesce("facts_born", F.lit(0)).cast("long").alias(
                "facts_born"
            ),
            F.coalesce("facts_died", F.lit(0)).cast("long").alias(
                "facts_died"
            ),
        )
    )
    w = Window.orderBy("snapshot_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return filled.withColumn(
        "facts_alive",
        F.sum(F.col("facts_born") - F.col("facts_died")).over(w).cast("long"),
    )
