"""Parity of the pure-Python oracle hashes vs Spark's built-in expressions.

These functions back the VALUES oracles for the hash-dependent dedup
queries (MinHash LSH banding, SimHash), so they must match Spark
bit-for-bit over every input shape those operators produce: UTF-8 strings
of all lengths (word shingles, tokens), int32 minhash values (negative
included), composed multi-argument folds.
"""

import random
import string

import pytest

pyspark = pytest.importorskip("pyspark")

from cypher_guard_spark.oracle import spark_hash, spark_xxhash64  # noqa: E402


def _corpus():
    rng = random.Random(7)
    words = [
        "".join(rng.choice(string.ascii_lowercase) for _ in range(rng.randint(1, 12)))
        for _ in range(40)
    ]
    # every tail length 0-3 for murmur3, 0-7 + >=32 stripes for xxh64,
    # plus non-ASCII multi-byte UTF-8
    extras = ["", "a", "ab", "abc", "abcd", "abcde" * 13, "héllo wörld", "日本語 テスト"]
    return words + extras


def test_spark_hash_string_int_parity(spark):
    from pyspark.sql import functions as F

    texts = _corpus()
    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    for k in (0, 1, 17, 31):
        got = {
            r["s"]: r["h"]
            for r in df.select("s", F.hash("s", F.lit(k)).alias("h")).collect()
        }
        for t in texts:
            assert spark_hash(t, k) == got[t], (t, k)


def test_spark_hash_single_string_parity(spark):
    from pyspark.sql import functions as F

    texts = _corpus()
    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.hash("s").alias("h")).collect()}
    for t in texts:
        assert spark_hash(t) == got[t], t


def test_spark_xxhash64_string_parity(spark):
    from pyspark.sql import functions as F

    texts = _corpus()
    df = spark.createDataFrame([(t,) for t in texts], ["s"])
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for t in texts:
        assert spark_xxhash64(t) == got[t], t


def test_spark_xxhash64_int_pairs_parity(spark):
    """The MinHash band hash: xxhash64 over two int32 minhash columns."""
    from pyspark.sql import functions as F

    rng = random.Random(11)
    pairs = [(rng.randint(-(2**31), 2**31 - 1), rng.randint(-(2**31), 2**31 - 1)) for _ in range(50)]
    pairs += [(0, 0), (-1, 1), (2**31 - 1, -(2**31))]
    df = spark.createDataFrame(pairs, ["a", "b"]).select(
        F.col("a").cast("int"), F.col("b").cast("int")
    )
    got = {
        (r["a"], r["b"]): r["h"]
        for r in df.select("a", "b", F.xxhash64("a", "b").alias("h")).collect()
    }
    for a, b in pairs:
        assert spark_xxhash64(a, b) == got[(a, b)], (a, b)


def test_spark_xxhash64_long_parity(spark):
    from pyspark.sql import functions as F

    rng = random.Random(13)
    vals = [rng.randint(-(2**63), 2**63 - 1) for _ in range(30)] + [0, -1, 5, -5]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert spark_xxhash64(v, int_widths=("long",)) == got[v], v
