#!/usr/bin/env python
"""Pinned core ladder: the same KG job at 1,2,4,8,16,32 pinned CPUs over
one shared corpus — locates where the HOST stops scaling (memory
bandwidth), independent of the 2-vs-8 efficiency protocol. Rewrites the
ladder table consumed by scripts/bench_scaling.py's BENCH/BASELINE.md
narrative (BENCH/ladder.json).

Usage: SPARK_GRAFT_KG_DOCS=2000000 python scripts/bench_ladder.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent

sys.path.insert(0, str(REPO))
from bench_scaling import _gen_corpus, run_once  # noqa: E402

CORES = (1, 2, 4, 8, 16, 32)


def main() -> None:
    kg_docs = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "2000000"))
    rounds = int(os.environ.get("SPARK_GRAFT_LADDER_ROUNDS", "2"))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    corpus_dir = tempfile.mkdtemp(prefix="kgladder_", dir=base)
    results: dict = {}
    try:
        input_path = os.path.join(corpus_dir, "documents")
        _gen_corpus(input_path, kg_docs)
        # interleaved rounds, best-of per level: the shared host swings
        # 2-3x over minutes, so single-shot rungs produce spurious dips
        for r in range(rounds):
            for c in CORES:
                level = {"cores": c, "cpus": f"0-{c-1}" if c > 1 else "0", "mem": "24g" if c >= 8 else "12g"}
                res = run_once(level, kg_docs, input_path)
                tput = res["kg_docs_per_sec"]
                results[c] = max(results.get(c, 0.0), tput)
                print(f"# round {r} pinned[{c}]: {res['queries']['kg_pipeline']}s "
                      f"({tput} docs/s)", file=sys.stderr)
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)
    out = {
        "metric": "kg_core_ladder",
        "kg_docs": kg_docs,
        "docs_per_sec": {str(c): results[c] for c in CORES if c in results},
        "speedup_vs_1": {
            str(c): round(results[c] / results[CORES[0]], 2)
            for c in CORES
            if c in results
        },
    }
    (REPO.parent / "BENCH").mkdir(exist_ok=True)
    (REPO.parent / "BENCH/ladder.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
