#!/usr/bin/env python
"""Scale-up dry run (VERDICT r2 #4): the full KG pipeline at 32-64M docs,
local[32], checkpoints on DISK (not /dev/shm — the corpus at this size
must not squeeze the page cache), recording docs/sec, per-stage walls from
the lineage table, and peak driver RSS.

The scaling-efficiency evidence runs at 8M docs; this run is the cheapest
way to surface driver-side surprises (lineage row growth, AQE plan blowup,
driver memory creep in the collect-gated fast paths) before a real
cluster would. Usage:

    python scripts/bench_scaleup.py [n_docs=32000000] [cores=32]

Writes BENCH/scaleup.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from cypher_guard_spark.pipeline import run_pipeline, synthesize_documents
    from cypher_guard_spark.spark.session import build_session

    # Speculative execution: at 10^8+ docs a single lost python worker
    # (fork race / silent worker death leaves the JVM blocked forever on
    # the Arrow socket — observed once at 128M: one straggler task, whole
    # job hung with 31 idle cores) would otherwise stall the run. A
    # speculative copy of the straggler completes the stage; this is the
    # standard production setting for any long fan-out job and costs
    # nothing when no straggler appears.
    spark = build_session(
        "scaleup",
        cores=cores,
        extra_conf={
            "spark.speculation": "true",
            "spark.speculation.multiplier": "4",
            "spark.speculation.quantile": "0.9",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="kgscaleup_")  # disk, deliberately
    try:
        input_path = os.path.join(workdir, "documents")
        t_gen = time.perf_counter()
        # file count scaled so scan splits keep all cores in even waves
        files = max(64, (n_docs // 125_000 + cores - 1) // cores * cores)
        synthesize_documents(spark, n_docs).repartition(files).write.parquet(
            input_path
        )
        t_gen = time.perf_counter() - t_gen
        docs = spark.read.parquet(input_path)

        import bench

        bench.run_kg_pipeline(spark, 1000)  # warm-up: code paths + workers
        bench._warm_python_workers(spark, cores)
        spark.catalog.clearCache()

        t0 = time.perf_counter()
        out = run_pipeline(
            spark, docs, checkpoint_dir=os.path.join(workdir, "ckpt")
        )
        wall = time.perf_counter() - t0

        stage_walls: dict = {}
        stage_rows: dict = {}
        for r in out["lineage"]:
            stage_walls[r["stage"]] = max(stage_walls.get(r["stage"], 0), r["wall_ms"] or 0)
            stage_rows[r["stage"]] = stage_rows.get(r["stage"], 0) + (
                r["rows"] or 0
            )
        peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
        result = {
            "metric": "kg_scaleup_dry_run",
            "value": round(n_docs / wall, 2),
            "unit": "docs_per_sec",
            "n_docs": n_docs,
            "cores": cores,
            "wall_sec": round(wall, 3),
            "gen_sec": round(t_gen, 3),
            "driver_peak_rss_mb": peak_rss_mb,
            "stage_wall_ms": {k: int(v) for k, v in sorted(stage_walls.items())},
            "stage_output_rows": {k: int(v) for k, v in sorted(stage_rows.items())},
        }
        (REPO / "BENCH").mkdir(exist_ok=True)
        (REPO / "BENCH" / "scaleup.json").write_text(
            json.dumps(result, indent=2) + "\n"
        )
        print(json.dumps(result))
    finally:
        import shutil

        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
