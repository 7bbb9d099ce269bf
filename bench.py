#!/usr/bin/env python
"""Bench harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` plus the full
KG-construction pipeline at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the ``noop`` sink (full computation,
no driver collect, no disk write). Extra fields:

- ``kg_docs`` / ``kg_docs_per_sec``: throughput of the whole pipeline
  (synthesize -> triples -> canonicalize -> MERGE codegen -> vectorized
  cypher-guard validation) — the headline docs/sec number from
  BASELINE.json's north_rule.
- ``cores``: parallelism level, so two runs at different
  ``SPARK_GRAFT_CPUS`` give the N-vs-4N scaling-efficiency evidence
  (see scripts/bench_scaling.py -> BENCH/BASELINE.md).

``--kg-only`` skips the per-query suite (used by the scaling harness to
time just the pipeline at two parallelism levels).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


def _force(df) -> None:
    """Execute the full plan without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


def _sf_of(sf_dir: str) -> float:
    name = Path(sf_dir).name
    if name.startswith("sf"):
        try:
            return float(name[2:])
        except ValueError:
            pass
    return -1.0


def _warm_python_workers(spark, cores: int, waves: int = 4) -> None:
    """Push a wide no-op through the extraction UDF so all worker slots are
    live and warm (imports done) before any timed stage runs."""
    from pyspark.sql import functions as F

    from cypher_guard_spark.pipeline.mentions import extract_udf

    df = (
        spark.range(0, cores * waves * 2000, 1, cores * waves)
        .select(F.format_string("warm doc %d.", F.col("id")).alias("text"))
        .select(extract_udf("text").alias("t"))
    )
    df.write.format("noop").mode("overwrite").save()


def run_kg_pipeline(spark, n_docs: int, input_path: str | None = None) -> float:
    """Full pipeline wall seconds over n_docs documents.

    The input table is synthesized and written to parquet OUTSIDE the
    measured window (in production the interleaved corpus already exists as
    an Iceberg table); the measured job is scan -> extract -> link ->
    canonicalize -> MERGE codegen -> vectorized guard validation.

    ``input_path`` (or $SPARK_GRAFT_KG_INPUT) points at a pre-generated
    documents parquet dir, so multi-run/multi-level benches share one
    corpus instead of re-synthesizing per run."""
    import shutil
    import tempfile

    from cypher_guard_spark.pipeline import run_pipeline, synthesize_documents

    # tmpfs when available: the measurement targets compute + shuffle, not
    # this VM's disk-writeback throughput (a cluster's DFS is not one local
    # disk, and writeback stalls from earlier runs bleed into later ones)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="kgbench_", dir=base)
    try:
        if input_path is None:
            input_path = os.path.join(workdir, "documents")
            synthesize_documents(spark, n_docs).write.parquet(input_path)
        docs = spark.read.parquet(input_path)
        t0 = time.perf_counter()
        # production shape: every stage checkpoints to a table (parquet
        # stand-in for Iceberg) with per-partition lineage + resume. The
        # stage writes inside run_pipeline force every plan end-to-end
        # (verdicts and triples are committed tables when it returns), so
        # no extra action is needed — re-scanning the written outputs here
        # would only re-measure the scan, not the pipeline.
        run_pipeline(spark, docs, checkpoint_dir=os.path.join(workdir, "ckpt"))
        return time.perf_counter() - t0
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    kg_only = "--kg-only" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    kg_docs = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "12000"))

    from pyspark.sql import functions as F

    from cypher_guard_spark.spark.session import build_session

    spark = build_session("bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    # warm up the JVM + Arrow path so t[0] isn't charged for startup
    spark.range(100_000).select(F.sum("id")).collect()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    if not kg_only:
        import statistics

        import __spark_entry__ as entry_mod

        # interleaved best-of-N (default 5): this host swings 2-3x over
        # minutes, so consecutive repeats of one query share its luck while
        # interleaving spreads every query across the same weather. The
        # headline per-query number is the MIN (least-noise estimate of the
        # plan's cost); the median is published alongside so a reader can
        # see the spread — a >1.2x min-vs-prior-round delta with a wide
        # median band is host noise, a tight band is a real plan change.
        # round 4 grew the suite 48 -> 120+ entries; best-of-3 keeps the
        # full interleaved min/median protocol while bounding bench wall
        # time (~3x entry growth at 5 reps would pass an hour)
        repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
        qs = entry_mod.queries()

        # materialize-once (VERDICT r4 task 6): the ~40 kg_* entries all
        # derive from the same deterministic canonical-triple chain; in
        # correctness runs each rebuilds it for oracle isolation, but a
        # bench timing ~40 entries × repeats would charge every operator
        # the ~3 s pipeline constant. Write the chain to parquet ONCE and
        # point the entries at it via $SPARK_GRAFT_KG_MATERIALIZED (read
        # inside _kg_canonical_full; rows are identical either way).
        import shutil
        import tempfile

        mat_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        mat_root = tempfile.mkdtemp(prefix="kgmat_", dir=mat_base)
        mat_dir = os.path.join(mat_root, "canonical")
        entry_mod._kg_canonical_full(spark).write.parquet(mat_dir)
        os.environ["SPARK_GRAFT_KG_MATERIALIZED"] = mat_dir
        try:
            samples: dict[str, list] = {name: [] for name in qs}
            for _ in range(repeats):
                for name, fn in qs.items():
                    t0 = time.perf_counter()
                    _force(fn(spark, sf_dir))
                    samples[name].append(time.perf_counter() - t0)
        finally:
            os.environ.pop("SPARK_GRAFT_KG_MATERIALIZED", None)
            shutil.rmtree(mat_root, ignore_errors=True)
        for name, ts in samples.items():
            timings[name] = round(min(ts), 3)
            medians[name] = round(statistics.median(ts), 3)

    # warm-up: (a) a small end-to-end pipeline for JIT/AQE/codegen paths,
    # (b) a full-width python-UDF pass so EVERY worker slot has imported
    # pandas + this package before measurement — cold workers during the
    # first wide stage cost ~100s of serialized startup at 32 cores
    run_kg_pipeline(spark, 1000)
    _warm_python_workers(spark, cores)
    spark.catalog.clearCache()
    kg_input = os.environ.get("SPARK_GRAFT_KG_INPUT")
    kg_wall = run_kg_pipeline(spark, kg_docs, input_path=kg_input)
    timings["kg_pipeline"] = round(kg_wall, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "bench_repeats": int(
                    os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")
                ),
                "sf": _sf_of(sf_dir),
                "cores": cores,
                "kg_docs": kg_docs,
                "kg_docs_per_sec": round(kg_docs / kg_wall, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
