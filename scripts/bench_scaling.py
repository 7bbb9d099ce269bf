#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule): the same KG-construction job on
the same input at two parallelism levels.

The sandbox has no multi-executor cluster, so N vs 4N executors is stood in
for by local[8] vs local[32] — separate JVMs, identical input (deterministic
synthesized corpus, same doc count), identical code path (bench.py
--kg-only, which does a warm-up run then measures steady state).

Prints one JSON line and rewrites the results table in BENCH/BASELINE.md:

    efficiency = (docs_per_sec[32] / docs_per_sec[8]) / (32 / 8)   (target >= 0.8)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
CORES = (8, 32)


def run_level(cores: int, kg_docs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cores),
        SPARK_GRAFT_KG_DOCS=str(kg_docs),
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
    kg_docs = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "50000"))
    runs = {c: run_level(c, kg_docs) for c in CORES}
    tput = {c: runs[c]["kg_docs_per_sec"] for c in CORES}
    wall = {c: runs[c]["queries"]["kg_pipeline"] for c in CORES}
    eff = round((tput[32] / tput[8]) / (32 / 8), 3)

    out_dir = REPO / "BENCH"
    out_dir.mkdir(exist_ok=True)
    result = {
        "metric": "kg_scaling_efficiency",
        "value": eff,
        "unit": "ratio",
        "kg_docs": kg_docs,
        "docs_per_sec": {str(c): tput[c] for c in CORES},
        "wall_sec": {str(c): wall[c] for c in CORES},
    }
    (out_dir / "scaling.json").write_text(json.dumps(result, indent=2) + "\n")
    (out_dir / "BASELINE.md").write_text(
        "# BENCH — scaling evidence\n\n"
        "Same KG-construction job (synthesize -> extract -> canonicalize ->\n"
        "MERGE codegen -> vectorized cypher-guard validation), same input\n"
        f"({kg_docs} deterministic docs, seed 42), two parallelism levels\n"
        "(sandbox stand-in for N vs 4N executors). Steady-state: one warm-up\n"
        "run per JVM before the measured run.\n\n"
        "| run | cores | input docs | wall s | docs/sec | efficiency vs 8-core |\n"
        "|---|---|---|---|---|---|\n"
        f"| t-bench-8 | local[8] | {kg_docs} | {wall[8]} | {tput[8]} | 1.00 (base) |\n"
        f"| t-bench-32 | local[32] | {kg_docs} | {wall[32]} | {tput[32]} | "
        f"{eff} (target >= 0.8) |\n"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
