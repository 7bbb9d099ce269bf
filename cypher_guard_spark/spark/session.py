"""SparkSession factory tuned for this engine.

Scale stance (SURVEY.md §4.2): everything rides on built-in Catalyst
machinery — AQE for runtime re-planning and skew-join splitting, Arrow for
the Python boundary, and a shuffle-partition count sized to the core count
(at cluster scale this is overridden to ~2-3× total executor cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "cypher-guard-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps every stage wide
        # without tiny-task overhead; on a real cluster set 2-3x total cores.
        shuffle_partitions = max(int(cores), 1)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local mode runs all tasks in the driver JVM: size the heap for the
        # core count (32 concurrent tasks on 8g thrash GC and anti-scale);
        # on a cluster this maps to per-executor memory instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
