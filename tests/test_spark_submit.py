"""north_rule launch path: the pipeline must run via ``spark-submit
--py-files <package zip>`` — no repo checkout on the workers, the package
shipped the way a real cluster submission ships it. The test packages the
zip, submits the full pipeline on a small corpus in a separate JVM, and
checks the emitted summary, then re-submits against the same checkpoint
dir to prove resume works through the launch path too."""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

SPARK_SUBMIT = shutil.which("spark-submit") or (
    "/opt/spark/bin/spark-submit" if os.path.exists("/opt/spark/bin/spark-submit") else None
)

pytestmark = pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")


def _submit(zip_path, ckpt, tmp_path, extra=()):
    cmd = [
        SPARK_SUBMIT,
        "--master",
        "local[2]",
        "--conf",
        "spark.ui.enabled=false",
        "--conf",
        "spark.sql.shuffle.partitions=4",
        "--py-files",
        str(zip_path),
        str(REPO / "scripts/submit_pipeline.py"),
        "--docs",
        "120",
        "--checkpoint",
        str(ckpt),
        *extra,
    ]
    env = dict(os.environ)
    # the submitted script must NOT need the repo on PYTHONPATH — that is
    # the point of the test; scrub any inherited path to the checkout
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        cmd, capture_output=True, text=True, cwd=str(tmp_path), timeout=420
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout[-2000:]
    return json.loads(lines[-1])


def test_spark_submit_pyfiles_pipeline_and_resume(tmp_path):
    from scripts.package_pyfiles import build_zip

    zip_path = build_zip(tmp_path / "cypher_guard_spark.zip")
    ckpt = tmp_path / "ckpt"

    out1 = _submit(zip_path, ckpt, tmp_path)
    assert out1["triples"] > 0
    assert out1["batches"] > 0
    assert out1["valid_batches"] == out1["batches"]
    assert out1["resumed"] == []

    # second submission, same checkpoint dir: a fresh JVM must resume every
    # materialized stage instead of recomputing
    out2 = _submit(zip_path, ckpt, tmp_path)
    assert {"triples_raw", "link_stats", "entity_map", "triples"} <= set(
        out2["resumed"]
    )
    assert out2["triples"] == out1["triples"]
    assert out2["valid_batches"] == out1["valid_batches"]
