"""Structured Streaming front-end for the vectorized cypher-guard.

In production the MERGE-batch stream arrives continuously (each pipeline
run appends batches); validation is a stateless per-row operator, so it
lifts onto ``readStream`` unchanged — the same pandas UDF + broadcast
DbSchema used in batch mode (cypher_guard_spark/spark/validate_udf.py).
Late data is handled with an event-time watermark on the windowed
error-rate aggregation; sinks are whatever ``writeStream`` supports
(parquet/Iceberg append, memory for tests).

Scale notes:
- the verdict stage adds no shuffle and no state — it pipelines at source
  parallelism;
- the windowed aggregate keeps one row of state per (window, error_code):
  bounded, watermark-expired;
- ``Trigger.AvailableNow`` (run_available_now) gives exactly-once batch
  catch-up semantics over whatever accumulated in the source directory —
  the same code path serves both replay and continuous tailing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from ..guard.schema import DbSchema
from ..spark.validate_udf import validation_udf

BATCH_STREAM_SCHEMA = StructType(
    [
        StructField("batch_id", StringType()),
        StructField("cypher", StringType()),
        StructField("event_time", TimestampType()),
    ]
)


def read_batch_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """Tail a directory of parquet MERGE-batch files as a stream."""
    return (
        spark.readStream.schema(BATCH_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )


def stream_validate(
    spark: SparkSession,
    batches: DataFrame,
    schema: DbSchema,
    cypher_col: str = "cypher",
) -> DataFrame:
    """streaming batches + verdict columns — identical semantics to the
    batch `validate_dataframe`, stateless, shuffle-free."""
    udf = validation_udf(spark, schema)
    return (
        batches.withColumn("verdict", udf(F.col(cypher_col)))
        .select(
            "*",
            F.col("verdict.is_valid").alias("is_valid"),
            F.col("verdict.syntax_ok").alias("syntax_ok"),
            F.col("verdict.errors").alias("errors"),
        )
        .drop("verdict")
    )


def stream_error_rates(
    validated: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    time_col: str = "event_time",
) -> DataFrame:
    """(window, error_code, n) with watermarked event-time windows — the
    streaming twin of partition_error_summary; state is bounded by
    (windows in watermark horizon) x (distinct error codes)."""
    return (
        validated.withWatermark(time_col, watermark)
        .select(time_col, F.explode_outer("errors").alias("error"))
        .groupBy(
            F.window(F.col(time_col), window).alias("window"),
            F.coalesce(F.col("error.code"), F.lit("OK")).alias("error_code"),
        )
        .agg(F.count("*").alias("n"))
    )


def run_available_now(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    schema: DbSchema,
    query_name: str = "guard_stream",
    output_dir: str | None = None,
) -> None:
    """Drain everything currently in source_dir through the validator —
    exactly-once via the stream checkpoint; used by tests and as the replay
    entry point. Sink: parquet append at ``output_dir`` (checkpoint-
    recoverable — the production path) or, when ``output_dir`` is None, an
    in-memory table `<query_name>` (inspection only; the memory sink cannot
    recover a checkpoint)."""
    validated = stream_validate(spark, read_batch_stream(spark, source_dir), schema)
    # errors is array<struct>; parquet handles it, memory table too
    writer = validated.writeStream.option(
        "checkpointLocation", checkpoint_dir
    ).trigger(availableNow=True)
    if output_dir is not None:
        q = writer.format("parquet").option("path", output_dir).start()
    else:
        q = writer.format("memory").queryName(query_name).start()
    q.awaitTermination()
