#!/usr/bin/env python
"""Same-boot A/B adjudication of the r4 kg_canonical_triples bench regression
(VERDICT r4 task 2).

Round 4 recorded kg_canonical_triples 3.66 s (r3) -> 5.31 s (r4) and kg-pipeline
docs/s 2,840 -> 2,373 at sf0.1, but the canonicalize code path was untouched
between those rounds and this host has demonstrated 1.4-2x same-code swings
across boots (BENCH/ab_host_variance.json). Protocol (same as the round-3
adjudication): a git worktree of the round-3 commit (643a024) vs HEAD, ONE
boot, interleaved r3,head,r3,head,... Each leg is a fresh subprocess that

  - times queries()['kg_canonical_triples'] end-to-end (noop sink) with the
    FULL extraction -> entity-map -> canonicalize chain (no
    SPARK_GRAFT_KG_MATERIALIZED, so both sides run the identical work the
    r3/r4 bench artifacts measured), best wall of 2 in-process repeats
    after a warm-up pass;
  - runs `bench.py --kg-only` for the kg-pipeline docs/s headline.

Verdict rule from the VERDICT: same-boot delta <= 1.1x => host noise (clear
the `weak` flag); > 1.1x => real regression to fix.

Writes BENCH/ab_canonical_r5.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
R3_TREE = os.environ.get("SPARK_GRAFT_AB_R3", "/tmp/ab_r3")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))

CANON_SNIPPET = """\
import json, sys, time
sys.path.insert(0, {tree!r})
from cypher_guard_spark.spark.session import build_session
import __spark_entry__ as entry_mod

spark = build_session("ab_canon", cores=32)
spark.sparkContext.setLogLevel("ERROR")
fn = entry_mod.queries()["kg_canonical_triples"]

def force(df):
    df.write.format("noop").mode("overwrite").save()

force(fn(spark, {sf!r}))  # warm-up (JIT, python workers, AQE)
walls = []
for _ in range(2):
    t0 = time.perf_counter()
    force(fn(spark, {sf!r}))
    walls.append(time.perf_counter() - t0)
print(json.dumps({{"wall": min(walls), "walls": walls}}))
spark.stop()
"""


def run_canon(tree: str) -> dict:
    env = dict(os.environ, PYTHONPATH=tree)
    env.pop("SPARK_GRAFT_KG_MATERIALIZED", None)
    proc = subprocess.run(
        [sys.executable, "-c", CANON_SNIPPET.format(tree=tree, sf=SF_DIR)],
        capture_output=True, text=True, env=env, cwd=tree, check=True,
    )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def run_kgonly(tree: str) -> dict:
    env = dict(os.environ, PYTHONPATH=tree, SPARK_GRAFT_CPUS="32")
    proc = subprocess.run(
        [sys.executable, str(Path(tree) / "bench.py"), "--kg-only"],
        capture_output=True, text=True, env=env, cwd=tree, check=True,
    )
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sides = {"r3_643a024": R3_TREE, "head": str(REPO)}
    canon: dict[str, list] = {k: [] for k in sides}
    kgdps: dict[str, list] = {k: [] for k in sides}
    kgwall: dict[str, list] = {k: [] for k in sides}
    for r in range(ROUNDS):
        for name, tree in sides.items():
            c = run_canon(tree)
            canon[name].append(round(c["wall"], 3))
            k = run_kgonly(tree)
            kgdps[name].append(k["kg_docs_per_sec"])
            kgwall[name].append(k["queries"]["kg_pipeline"])
            print(
                f"# round {r} {name}: canonical {c['wall']:.3f}s, "
                f"kg {k['kg_docs_per_sec']} docs/s",
                file=sys.stderr,
            )
    best_canon = {k: min(v) for k, v in canon.items()}
    best_dps = {k: max(v) for k, v in kgdps.items()}
    ratio_canon = round(best_canon["head"] / best_canon["r3_643a024"], 3)
    ratio_dps = round(best_dps["r3_643a024"] / best_dps["head"], 3)
    result = {
        "metric": "ab_same_boot_code_comparison_r5",
        "purpose": (
            "adjudicate the r4 kg_canonical_triples 3.66->5.31s and kg docs/s "
            "2840->2373 regression reads (VERDICT r4 task 2)"
        ),
        "protocol": (
            "git worktree of r3 commit 643a024 vs HEAD, one boot, interleaved "
            "r3,head x%d; canonical = best-of-2 in-process fresh-chain walls "
            "after warmup at sf0.1 local[32] (no KG materialize env on either "
            "side); kg docs/s = bench.py --kg-only" % ROUNDS
        ),
        "canonical_wall_sec": canon,
        "canonical_best": best_canon,
        "canonical_head_over_r3": ratio_canon,
        "kg_docs_per_sec": kgdps,
        "kg_pipeline_wall_sec": kgwall,
        "kg_best_docs_per_sec": best_dps,
        "kg_r3_over_head": ratio_dps,
        "verdict_rule": "<=1.1x same-boot delta => host noise, else real",
    }
    out = REPO / "BENCH" / "ab_canonical_r5.json"
    out.write_text(json.dumps(result, indent=2) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
