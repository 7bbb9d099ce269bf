#!/usr/bin/env python
"""Profile the orchestration floor: the 1000-doc pipeline's per-stage walls
plus total, at a pinned core budget. Usage:

    taskset -c 0-1 python scripts/profile_floor.py 2 [n_docs]

Prints one line per stage (wall ms from the lineage records) and the
end-to-end wall, so floor regressions/attacks are attributable.
"""

import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    from cypher_guard_spark.pipeline import run_pipeline, synthesize_documents
    from cypher_guard_spark.spark.session import build_session

    spark = build_session("floorprof", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    with tempfile.TemporaryDirectory(prefix="floorprof_", dir=base) as workdir:
        input_path = os.path.join(workdir, "documents")
        synthesize_documents(spark, n_docs).repartition(64).write.parquet(input_path)
        docs = spark.read.parquet(input_path)
        # warm-up identical to bench.py
        import bench

        bench.run_kg_pipeline(spark, 1000)
        bench._warm_python_workers(spark, cores)
        spark.catalog.clearCache()

        t0 = time.perf_counter()
        out = run_pipeline(
            spark, docs, checkpoint_dir=os.path.join(workdir, "ckpt")
        )
        total = time.perf_counter() - t0
        walls = {}
        for r in out["lineage"]:
            walls.setdefault(r["stage"], r["wall_ms"])
        for stage, ms in walls.items():
            print(f"{stage:16s} {ms/1000.0:7.3f} s")
        accounted = sum(walls.values()) / 1000.0
        print(f"{'SUM(stages)':16s} {accounted:7.3f} s")
        print(f"{'TOTAL wall':16s} {total:7.3f} s  (unaccounted {total-accounted:.3f} s: lineage finalize+write, final forces)")
    spark.stop()


if __name__ == "__main__":
    main()
