"""Streaming sticky canonicalization: the always-on form of
`pipeline/canonicalize.py:update_entity_map`.

A production KG pipeline doesn't re-canonicalize the corpus per crawl —
it holds the (label, surface) → canonical map AT REST and folds each
arriving mention micro-batch into it under the sticky contract (existing
assignments FROZEN — downstream triples and MERGE batches already
reference them; only novel surfaces are blocked, clustered, assigned).
This module wires that batch operator into Structured Streaming:

    mentions (directory stream)
      └─ foreachBatch per epoch:
           1. read the at-rest map (parquet; empty on first epoch)
           2. batch link stats = (label, surface, n_mentions) partial agg
           3. update_entity_map(old, batch)  — the tested sticky kernel
           4. append ONLY the novel rows (status != 'existing'),
              stamped with the epoch, after an eager checkpoint of the
              map read so the append never races its own scan (the
              ingest-index pattern, ops/dedup.py write path)

Delivery: source progress lives in the stream checkpoint (each file
processed once across restarts). The map append is at-least-once on
CRASH retry, but `update_entity_map` is idempotent by value (a replayed
batch's surfaces are all 'existing' against the already-appended map ⇒
zero new rows; if the crash hit between compute and commit, the retry
re-derives the identical assignments — min-old-canonical / (n_mentions,
surface) election are deterministic), so consumers dedup on the
(label, surface) key and epoch is the audit column, exactly the
foreachBatch contract the kg_stream docstring documents.

Scale: per epoch the one-sided NOVEL×(NOVEL+OLD) band join means work
scales with the batch, never the accumulated map; the map scan reads
(label, surface, canonical) only. State is the at-rest table itself —
nothing driver-resident grows with history.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..pipeline.canonicalize import update_entity_map

STREAM_MENTION_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("surface", StringType()),
        StructField("label", StringType()),
        StructField("n", IntegerType()),
    ]
)

MAP_SCHEMA = "label string, surface string, canonical string, status string, epoch long"


def _read_map(spark: SparkSession, map_dir: str) -> DataFrame:
    # probe through the Hadoop FileSystem API, not os.path (ADVICE r4):
    # a driver-local isdir() on an HDFS/S3 map_dir always reads "absent",
    # which would silently restart the sticky map from empty. An existing
    # dir with no parquet yet (checkpoint scaffolding) still means empty —
    # that is the AnalysisException fallback, not an error.
    from pyspark.errors import AnalysisException

    from cypher_guard_spark.pipeline.lineage import hadoop_path_exists

    if hadoop_path_exists(spark, map_dir):
        try:
            return spark.read.parquet(map_dir).select(
                "label", "surface", "canonical"
            )
        except AnalysisException:
            pass
    return spark.createDataFrame([], "label string, surface string, canonical string")


def apply_mention_batch(
    spark: SparkSession, batch: DataFrame, map_dir: str, epoch_id: int
) -> None:
    """One epoch's fold: sticky-update the at-rest map with the batch's
    mention stats and append the novel assignments."""
    old = _read_map(spark, map_dir).localCheckpoint()  # eager: scan before append
    stats = batch.groupBy("label", "surface").agg(
        F.sum("n").cast("long").alias("n_mentions")
    )
    updated = update_entity_map(spark, old, stats)
    novel = updated.where(F.col("status") != "existing").withColumn(
        "epoch", F.lit(int(epoch_id)).cast("long")
    )
    if novel.take(1):
        novel.write.mode("append").parquet(map_dir)


def run_entity_map_stream(
    spark: SparkSession,
    source_dir: str,
    map_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start the stream; with `available_now` it drains the directory and
    stops (the batch-backfill trigger), else it runs per-file triggers."""
    src = (
        spark.readStream.schema(STREAM_MENTION_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
    )
    writer = src.writeStream.foreachBatch(
        lambda b, e: apply_mention_batch(b.sparkSession, b, map_dir, e)
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
