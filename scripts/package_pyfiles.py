#!/usr/bin/env python
"""Package cypher_guard_spark into a --py-files zip.

Pure-Python files plus the bundled data-free resources; the jar is
excluded (ship it via --jars if the local-FS shim is wanted on a cluster,
which it normally is not — HDFS/S3A/Iceberg paths never touch
RawLocalFileSystem).

Usage: python scripts/package_pyfiles.py [dest.zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def build_zip(dest: str | Path) -> Path:
    dest = Path(dest)
    pkg = REPO / "cypher_guard_spark"
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted(pkg.rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return dest


if __name__ == "__main__":
    out = build_zip(sys.argv[1] if len(sys.argv) > 1 else "cypher_guard_spark.zip")
    print(out)
