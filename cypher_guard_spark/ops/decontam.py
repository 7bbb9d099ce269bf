"""Benchmark decontamination: flag training documents that share word
n-grams with a held-out evaluation/benchmark set.

The standard LLM-data hygiene pass (n-gram collision decontamination à la
the GPT-3/Llama data notes): any training document containing an n-gram
that also appears in an evaluation benchmark is suspect and gets dropped
or audited before pretraining.

Scale posture: the benchmark side is SMALL relative to the corpus (a few
10^5-10^6 distinct n-grams even for a large eval suite) — it is exploded,
deduplicated, and BROADCAST, so the 100-TB corpus side stays map-only:
scan → explode distinct per-doc n-grams → broadcast-hash-join → partial
count aggregation. The single shuffle carries (doc_id, partial counts),
never text or n-grams. If the benchmark outgrows broadcast range, the same
plan degrades gracefully to a shuffle join where the corpus side is
already salted by doc_id cardinality; nothing else changes.

No Python anywhere — pure built-in functions, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_shingles


def benchmark_ngrams(benchmark: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """(ngram) — the distinct word n-grams of the benchmark set."""
    return (
        benchmark.select(
            F.explode(F.array_distinct(word_shingles(text_col, n))).alias("ngram")
        )
        .distinct()
    )


def contamination_report(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_ngrams, n_contaminated, contamination, contaminated) —
    per-document benchmark n-gram overlap. `n_ngrams` counts the DISTINCT
    n-grams of the doc (so contamination is a set-overlap ratio in [0,1]);
    `contaminated` flags any overlap at all (the usual drop criterion).

    Documents shorter than n tokens have zero n-grams and report
    (0, 0, 0.0, 0) — explode_outer keeps them in the result.
    """
    grams = F.array_distinct(word_shingles(text_col, n))
    bench = F.broadcast(benchmark_ngrams(benchmark, n, text_col).withColumn("hit", F.lit(1)))
    exploded = docs.select("doc_id", F.explode_outer(grams).alias("ngram"))
    per_doc = (
        exploded.join(bench, "ngram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("ngram").alias("n_ngrams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_ngrams",
        "n_contaminated",
        F.round(
            F.col("n_contaminated") / F.greatest(F.col("n_ngrams"), F.lit(1)), 6
        ).alias("contamination"),
        (F.col("n_contaminated") > 0).cast("int").alias("contaminated"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """The clean corpus: docs with NO benchmark n-gram overlap (left-anti
    join against the contaminated doc_id set — same broadcast plan)."""
    dirty = (
        docs.select("doc_id", F.explode(F.array_distinct(word_shingles(text_col, n))).alias("ngram"))
        .join(F.broadcast(benchmark_ngrams(benchmark, n, text_col)), "ngram", "leftsemi")
        .select("doc_id")
        .distinct()
    )
    return docs.join(dirty, "doc_id", "left_anti")
