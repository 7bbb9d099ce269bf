"""Deterministic sampling operators for training-data curation.

Two samplers, both reproducible bit-for-bit across engines (the keep/rank
decision is a pure function of the row key via Spark's xxhash64, whose
pure-Python twin lives in `cypher_guard_spark.oracle`):

- `stratified_sample`: Bernoulli-by-hash with a per-stratum rate — the
  map-only workhorse for "keep 100% of long docs, 12.5% of short ones"
  rebalancing. NO shuffle at any scale: the keep predicate is evaluated at
  the scan, so at 100 TB this is a single pass that prunes rows before
  anything wide happens downstream.
- `balanced_sample`: EXACTLY k rows per stratum, chosen by hash order
  (i.e. a uniform random draw that every engine reproduces). Per-stratum
  top-k is the classic skew trap — a window over 5 strata sorts 20 TB per
  stratum on one task — so it runs as a salted two-phase top-k: local
  top-k per (stratum, salt) then top-k of the ≤ n_salts*k survivors.
  Exact by the pigeonhole argument: the global k smallest hash values
  within a stratum each survive their own salt's local top-k.

Neither sampler uses `rand()` (non-reproducible across retries — a
re-executed lost task would sample differently, corrupting exactly-once
semantics at scale). Hash-of-key sampling is the standard trick for
re-runnable pipelines (same guarantee `TABLESAMPLE ... REPEATABLE`
aims for, but stable under task retry and engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

SAMPLE_DENOM = 1 << 20  # power of two: per-stratum rates are exact


def length_bucket(
    text_col: str = "text", bucket_tokens: int = 16, n_buckets: int = 4
):
    """Token-length stratum: floor(n_tokens / bucket_tokens), clamped to
    n_buckets-1. A standard curation axis (short docs are low-signal)."""
    return (
        F.least(
            F.floor(F.size(tokens(F.col(text_col))) / bucket_tokens),
            F.lit(n_buckets - 1),
        )
        .cast("int")
    )


def stratified_sample(
    df: DataFrame,
    stratum,
    fractions: dict,
    default_fraction: float = 0.0,
    key_col: str = "doc_id",
) -> DataFrame:
    """Rows of `df` + `stratum`, kept iff
    pmod(xxhash64(key), DENOM) < round(fraction[stratum] * DENOM).

    The threshold map is computed on the DRIVER in exact integer space and
    enters the plan as literals — no float multiply inside the engine, so
    the oracle twin cannot drift on rounding. Map-only; Catalyst pushes
    the stratum expression and the predicate into the scan's codegen stage.
    """
    thresholds = [
        x
        for s, f in fractions.items()
        for x in (F.lit(s), F.lit(int(round(f * SAMPLE_DENOM))))
    ]
    thr = F.coalesce(
        F.create_map(*thresholds)[F.col("stratum")],
        F.lit(int(round(default_fraction * SAMPLE_DENOM))),
    )
    h = F.pmod(F.xxhash64(F.col(key_col)), F.lit(SAMPLE_DENOM))
    return df.withColumn("stratum", stratum).where(h < thr)


def balanced_sample(
    df: DataFrame,
    stratum,
    k: int,
    key_col: str = "doc_id",
    n_salts: int = 16,
) -> DataFrame:
    """Exactly k rows per stratum (fewer iff the stratum is smaller),
    drawn by xxhash64 order — a reproducible uniform draw. Output adds
    `stratum` and `rnk` (1-based position in the stratum's hash order).

    Two-phase: phase 1 takes the local top-k within (stratum, salt) —
    n_salts parallel sorts per stratum instead of one giant one — and
    phase 2 ranks the ≤ n_salts*k survivors per stratum (tiny). The salt
    is pmod(key, n_salts): salt quality only affects balance, never
    correctness, so the cheapest deterministic spreader wins. Ties in the
    hash order are broken by the key itself, making `rnk` total and the
    result set unique.
    """
    h = F.xxhash64(F.col(key_col))
    salted = df.withColumn("stratum", stratum).withColumn(
        "_salt", F.pmod(F.col(key_col), F.lit(n_salts))
    )
    w1 = Window.partitionBy("stratum", "_salt").orderBy(h.asc(), F.col(key_col).asc())
    survivors = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy("stratum").orderBy(h.asc(), F.col(key_col).asc())
    return (
        survivors.withColumn("rnk", F.row_number().over(w2))
        .where(F.col("rnk") <= k)
    )
