"""Per-stage lineage + checkpoint/resume.

Every stage writes its output table (parquet here; the writer format is
pluggable — on a cluster with an Iceberg catalog set
``SPARK_GRAFT_TABLE_FORMAT=iceberg``) plus a lineage record per partition:
(stage, partition_id, rows, checksum, wall_ms). The checksum is a
bit_xor of xxhash64 over the stage's key columns — per-partition values
depend on partitioning, but their XOR is partition-invariant (and immune
to ANSI overflow), which is what resume verification compares.

Resume = skip any stage whose output already exists with a _SUCCESS marker
(atomic commit), loading it instead of recomputing. Incomplete outputs
(killed mid-write → no _SUCCESS) are recomputed. The existence probe goes
through the Hadoop FileSystem API (JVM gateway), so it works on any
cluster filesystem (HDFS/S3A/GCS) — not just file:// paths visible to the
driver's local OS.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def partition_lineage(df: DataFrame, stage: str, key_cols, wall_ms: float) -> DataFrame:
    """One row per partition: rows + checksum."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count("*").alias("rows"),
            F.bit_xor(F.xxhash64(*key_cols)).alias("checksum"),
        )
        .select(
            F.lit(stage).alias("stage"),
            F.col("_pid").alias("partition_id"),
            "rows",
            "checksum",
            F.lit(float(wall_ms)).alias("wall_ms"),
        )
    )


def materialized_lineage(
    df_read: DataFrame, stage: str, wall_ms: float, global_csum: int
) -> DataFrame:
    """Lineage for a freshly-written stage table WITHOUT re-hashing it.

    The global checksum already rode the write action (Observation), so
    the only remaining per-partition fact is the row count — obtained from
    a ZERO-COLUMN scan of the written files (row-group counts, nothing
    decoded). The checksum is carried on one synthetic partition_id=-1 row
    (rows=0): `global_checksum`'s XOR/sum aggregation is partition-
    invariant, so consumers see exactly the same (rows, checksum) as the
    full per-partition hash would produce — at ~zero cost instead of a
    second full scan of every stage table in the finalize job."""
    counts = (
        df_read.select(F.spark_partition_id().alias("_pid"))
        .groupBy("_pid")
        .agg(F.count("*").alias("rows"))
        .select(
            F.lit(stage).alias("stage"),
            F.col("_pid").alias("partition_id"),
            "rows",
            F.lit(None).cast("long").alias("checksum"),
            F.lit(float(wall_ms)).alias("wall_ms"),
        )
    )
    spark = df_read.sparkSession
    grow = spark.range(1).select(
        F.lit(stage).alias("stage"),
        F.lit(-1).cast("int").alias("partition_id"),
        F.lit(0).cast("long").alias("rows"),
        F.lit(int(global_csum)).cast("long").alias("checksum"),
        F.lit(float(wall_ms)).alias("wall_ms"),
    )
    return counts.unionByName(grow)


def global_checksum(lineage_rows, stage: str | None = None) -> tuple:
    """(rows, checksum) aggregated partition-invariantly (XOR)."""
    rows = [r for r in lineage_rows if stage is None or r["stage"] == stage]
    total_rows = sum(r["rows"] for r in rows)
    csum = 0
    for r in rows:
        csum ^= r["checksum"] or 0
    return total_rows, csum


def hadoop_path_exists(spark: SparkSession, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API — cluster-safe
    (HDFS/S3A/…), unlike a driver-local ``os.path.exists``."""
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    return bool(fs.exists(jpath))


class CheckpointManager:
    """Stage-level checkpoint/lineage/resume over a base directory."""

    def __init__(self, spark: SparkSession, base_dir: str | None, resume: bool = True):
        self.spark = spark
        self.base_dir = base_dir
        self.resume = resume
        self.fmt = os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")
        self.lineage: list = []
        self.resumed_stages: list = []
        self._pending: list = []
        self._row_counts: dict[str, int] = {}

    def _path(self, stage: str) -> str:
        return os.path.join(self.base_dir, stage)

    def _complete(self, stage: str) -> bool:
        """Has this stage's output table been committed?

        The probe is FORMAT-GATED: Hadoop-committer formats (parquet/ORC/
        CSV/JSON) commit atomically via a ``_SUCCESS`` marker, but Iceberg
        commits never write one — probing ``_SUCCESS`` under Iceberg would
        silently disable resume and recompute+overwrite every run. For
        path-based Iceberg (HadoopTables) the committed marker is
        ``metadata/version-hint.text``, written only after the first
        successful snapshot commit (an interrupted write leaves data files
        but no version hint, so incomplete outputs still recompute).
        Catalog-managed Iceberg tables don't go through this path-based
        manager at all — point ``base_dir`` at a warehouse path or keep the
        default parquet checkpoints."""
        if self.fmt == "iceberg":
            marker = os.path.join(self._path(stage), "metadata", "version-hint.text")
        else:
            marker = os.path.join(self._path(stage), "_SUCCESS")
        return hadoop_path_exists(self.spark, marker)

    def row_count(self, stage: str) -> int | None:
        """Exact output row count of a stage, if known without a new job.

        Fresh writes observe count(*) on the write action itself (zero extra
        jobs); resumed stages fall back to a parquet-footer count on first
        ask (metadata-only scan)."""
        if stage not in self._row_counts:
            return None
        n = self._row_counts[stage]
        if callable(n):
            n = self._row_counts[stage] = n()
        return n

    def stage(self, name: str, compute, key_cols, materialize: bool = True) -> DataFrame:
        """Run (or resume) a stage. ``compute`` is a thunk returning the
        stage DataFrame; key_cols feed the checksum.

        ``materialize=False`` marks pass-through / single-consumer stages
        (e.g. the raw input table, a stacked projection): they get lineage
        but no checkpoint copy — writing them again costs more than
        recomputing them, and caching them is even worse (the columnar
        cache build for nested rows runs ~10x slower than the parquet
        write+rescan it would save).
        """
        t0 = time.time()
        csum = None
        if materialize and self.base_dir and self.resume and self._complete(name):
            df = self.spark.read.format(self.fmt).load(self._path(name))
            self.resumed_stages.append(name)
            self._row_counts[name] = df.count  # lazy: footer-only if asked
        else:
            df = compute()
            if materialize and self.base_dir:
                # right-size the file count: narrow chains inherit the
                # source's partitioning (e.g. 256 input files), and paying
                # a commit + lineage barrier over hundreds of tiny files
                # per stage is pure driver-serial overhead. coalesce is a
                # no-op when the plan already has <= target partitions, so
                # it is applied unconditionally — probing getNumPartitions
                # first would finalize the AQE plan and run every upstream
                # shuffle's map stages a second time. Row count AND the
                # partition-invariant XOR checksum ride the write action
                # itself (zero extra jobs).
                target = 4 * self.spark.sparkContext.defaultParallelism
                obs = Observation(f"lineage_{name}")
                df = df.coalesce(target).observe(
                    obs,
                    F.count(F.lit(1)).alias("rows"),
                    F.bit_xor(F.xxhash64(*key_cols)).alias("checksum"),
                )
                df.write.format(self.fmt).mode("overwrite").save(self._path(name))
                got = obs.get
                self._row_counts[name] = int(got["rows"])
                csum = int(got["checksum"]) if got["checksum"] is not None else 0
                df = self.spark.read.format(self.fmt).load(self._path(name))
            elif materialize:
                # no checkpoint dir (in-memory run): lazily localCheckpoint
                # multi-consumer stage outputs so the first action
                # materializes them once instead of re-running the full
                # upstream DAG per downstream consumer.
                df = df.localCheckpoint(eager=False)
        wall_ms = (time.time() - t0) * 1000.0
        # defer the collect: per-stage lineage actions each pay a full job
        # barrier; finalize() unions every stage's lineage frame and runs
        # ONE job. Freshly-written stages contribute only a zero-column
        # row-count scan + the observed checksum (materialized_lineage);
        # resumed and pass-through stages hash their key columns in full.
        if csum is not None:
            self._pending.append(materialized_lineage(df, name, wall_ms, csum))
        else:
            self._pending.append(partition_lineage(df, name, key_cols, wall_ms))
        return df

    def finalize(self) -> None:
        """Materialize all pending lineage in a single action."""
        if not self._pending:
            return
        u = self._pending[0]
        for frame in self._pending[1:]:
            u = u.unionByName(frame)
        self.lineage.extend(u.collect())
        self._pending = []

    def write_lineage(self):
        self.finalize()
        if not self.base_dir or not self.lineage:
            return
        ldf = self.spark.createDataFrame(self.lineage)
        ldf.write.mode("append").parquet(os.path.join(self.base_dir, "_lineage"))
