#!/usr/bin/env python
"""Driver-correctness simulator: run every queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet, compare row count,
schema (column names), and an order-insensitive value hash — the same
contract CORRECTNESS_r{N}.json is built from.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from cypher_guard_spark.ops.relational import TABLES  # noqa: E402


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif "datetime" in str(col.dtype):
            df[c] = col.astype("datetime64[us]").astype(str)
        elif col.dtype.kind == "f":
            df[c] = col.round(6).map(lambda v: f"{v:.6f}")
        else:
            df[c] = col.astype("Int64").astype(str)
    rows = sorted("\x1f".join(r) for r in df.itertuples(index=False, name=None))
    return hashlib.md5("\x1e".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # VALUES oracles that recompute from the documents parquet (minhash /
    # simhash) must read the same sf dir the Spark side is handed
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    from cypher_guard_spark.spark import build_session

    spark = build_session("oracle-check", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql(sf_dir)
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:28s} rows={len(sdf):6d}  (rows-only: no oracle)")
            continue
        odf = con.sql(oracles[name]).df()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"{name:28s} rows={len(sdf):6d}/{len(odf):6d} cols={'='.join(['ok' if ok_cols else 'MISMATCH'])} hash={'ok' if ok_hash else 'MISMATCH'} {status}"
        )
        if status == "FAIL":
            failures.append(name)
            print("  spark cols:", sorted(sdf.columns))
            print("  oracle cols:", sorted(odf.columns))
            if ok_cols and ok_rows:
                merged_s = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)).head(3)
                merged_o = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).head(3)
                print("  spark head:\n", merged_s.to_string())
                print("  oracle head:\n", merged_o.to_string())
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all oracles match")


if __name__ == "__main__":
    main()
