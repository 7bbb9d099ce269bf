#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline (north_rule's
launch path: ``spark-submit --py-files cypher_guard_spark.zip
scripts/submit_pipeline.py …``).

The package arrives via --py-files (a zip on every executor's
sys.path) — this script deliberately does NOT assume a repo checkout, so
it proves the pipeline is cluster-shippable. Builds the SparkSession from
spark-submit's conf (no master/memory opinions here; the cluster sets
them).

Usage:
  spark-submit --py-files cypher_guard_spark.zip scripts/submit_pipeline.py \
      [--docs N | --input PATH] [--checkpoint DIR] [--out PATH]

Prints one JSON line: {"docs": N, "triples": N, "batches": N,
"valid_batches": N, "resumed": [...]}.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=500)
    ap.add_argument("--input", default=None, help="existing documents table")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", default=None, help="write canonical triples here")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("kg-pipeline-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # imported AFTER the session exists: under spark-submit the zip from
    # --py-files is already on sys.path for driver and executors alike
    from cypher_guard_spark.pipeline import run_pipeline, synthesize_documents

    if args.input:
        docs = spark.read.parquet(args.input)
    else:
        docs = synthesize_documents(spark, args.docs)

    out = run_pipeline(spark, docs, checkpoint_dir=args.checkpoint)
    if args.out:
        out["triples"].write.mode("overwrite").parquet(args.out)
    summary = out["verdicts"].agg(
        F.count("*").alias("batches"),
        F.sum(F.when(F.col("is_valid"), 1).otherwise(0)).alias("valid"),
    ).collect()[0]
    n_triples = out["triples"].count()
    print(
        json.dumps(
            {
                "docs": args.docs if not args.input else docs.count(),
                "triples": n_triples,
                "batches": summary["batches"],
                "valid_batches": int(summary["valid"]),
                "resumed": out["resumed_stages"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
