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


def lineage_scan(df: DataFrame, stage: str, key_cols=None) -> DataFrame:
    """(stage, partition_id, h) pre-aggregation frame for ONE stage.

    All stages' frames are unioned and aggregated in a SINGLE
    groupBy(stage, partition_id) — one shuffle, one AQE round, one job for
    the whole pipeline's lineage, instead of one exchange per stage (the
    per-stage groupBys dominated the orchestration floor at small inputs).

    ``key_cols=None`` marks a freshly-written stage whose global checksum
    already rode the write action (Observation): its frame carries a null
    hash term (bit_xor over all-nulls aggregates to null) and reads ZERO
    columns — parquet/ORC answer it from row-group metadata. Stages without
    an observed checksum (pass-through inputs, resumed tables) hash their
    key columns in full."""
    h = F.xxhash64(*key_cols) if key_cols else F.lit(None).cast("long")
    return df.select(
        F.lit(stage).alias("stage"),
        F.spark_partition_id().alias("partition_id"),
        h.alias("h"),
    )


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
        self._observed: dict[str, int] = {}
        self._walls: dict[str, float] = {}
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
        self._walls[name] = (time.time() - t0) * 1000.0
        # defer the collect: per-stage lineage actions each pay a full job
        # barrier; finalize() unions every stage's pre-agg frame and runs
        # ONE job with ONE shuffle. Freshly-written stages contribute only
        # a zero-column row-count scan (their checksum rode the write
        # Observation); resumed and pass-through stages hash their key
        # columns in full.
        if csum is not None:
            self._observed[name] = csum
            self._pending.append(lineage_scan(df, name))
        else:
            self._pending.append(lineage_scan(df, name, key_cols))
        return df

    def finalize(self) -> None:
        """Materialize all pending lineage in a single action (one job,
        one groupBy(stage, partition_id) shuffle across every stage).

        Observed (write-carried) checksums join the collected rows as one
        synthetic partition_id=-1 row each (rows=0): `global_checksum`'s
        XOR/sum aggregation is partition-invariant, so consumers see
        exactly the same (rows, checksum) the full per-partition hash
        would produce — with no second scan of any stage table."""
        if not self._pending:
            return
        from pyspark.sql import Row

        u = self._pending[0]
        for frame in self._pending[1:]:
            u = u.unionByName(frame)
        agg = u.groupBy("stage", "partition_id").agg(
            F.count("*").alias("rows"), F.bit_xor("h").alias("checksum")
        )
        for r in agg.collect():
            self.lineage.append(
                Row(
                    stage=r["stage"],
                    partition_id=r["partition_id"],
                    rows=r["rows"],
                    checksum=r["checksum"],
                    wall_ms=float(self._walls.get(r["stage"], 0.0)),
                )
            )
        for name, csum in self._observed.items():
            self.lineage.append(
                Row(
                    stage=name,
                    partition_id=-1,
                    rows=0,
                    checksum=int(csum),
                    wall_ms=float(self._walls.get(name, 0.0)),
                )
            )
        self._pending = []
        self._observed = {}

    def write_lineage(self):
        self.finalize()
        if not self.base_dir or not self.lineage:
            return
        ldf = self.spark.createDataFrame(self.lineage)
        ldf.write.mode("append").parquet(os.path.join(self.base_dir, "_lineage"))
