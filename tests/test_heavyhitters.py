"""Streaming Misra–Gries heavy hitters
(streaming/heavyhitters_stream.py): exact small-cardinality regime,
coverage + error-envelope guarantees across different microbatch
slicings, per-group isolation, and checkpoint-restart recovery."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from cypher_guard_spark.streaming.heavyhitters_stream import (
    misra_gries_batch,
    stream_heavy_hitters,
)

SCHEMA = "group string, key string"


def _drain(spark, src, name, ckpt, k):
    obs = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stream_heavy_hitters(obs, k=k)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
    # final sketch = rows of the last trigger per group (n_seen is
    # monotone per group and shared by all rows of one update)
    last = pdf.groupby("group")["n_seen"].transform("max")
    return pdf[pdf["n_seen"] == last]


def _write_waves(spark, src, waves):
    src.mkdir(exist_ok=True)
    existing = len(list(src.glob("w*")))
    for i, rows in enumerate(waves):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(src / f"w{existing + i}")
        )


def test_exact_when_under_k(spark, tmp_path):
    rows = [("g", "a")] * 5 + [("g", "b")] * 3 + [("g", "c")]
    _write_waves(spark, tmp_path / "s1", [rows[:4], rows[4:]])
    final = _drain(spark, tmp_path / "s1", "hh_exact", tmp_path / "c1", 8)
    got = dict(zip(final["key"], final["est_count"]))
    assert got == {"a": 5, "b": 3, "c": 1}
    assert set(final["dropped"]) == {0}
    assert set(final["n_seen"]) == {9}


@pytest.mark.parametrize("n_files", [1, 3])
def test_guarantees_hold_across_slicings(spark, tmp_path, n_files):
    # hot x50, warm x20, 40 singletons; n=110, k=8 -> threshold
    # n/(k+1) = 12.2: hot and warm MUST survive; undercount <= dropped
    # <= n/(k+1)
    rows = (
        [("g", "hot")] * 50
        + [("g", "warm")] * 20
        + [("g", f"cold{i}") for i in range(40)]
    )
    # interleave deterministically so no slice is all-cold
    rows = rows[::2] + rows[1::2]
    k, n = 8, len(rows)
    per = (n + n_files - 1) // n_files
    waves = [rows[i * per:(i + 1) * per] for i in range(n_files)]
    src = tmp_path / f"s_{n_files}"
    _write_waves(spark, src, waves)
    final = _drain(
        spark, src, f"hh_slice_{n_files}", tmp_path / f"c_{n_files}", k
    )
    est = dict(zip(final["key"], final["est_count"]))
    dropped = int(final["dropped"].iloc[0])
    true = Counter(k for _g, k in rows)
    assert len(est) <= k
    assert dropped <= n // (k + 1) + 1
    for key in ("hot", "warm"):
        assert key in est, (key, est)
    for key, e in est.items():
        assert e <= true[key]
        assert true[key] - e <= dropped
    # the single-merge batch twin obeys the same envelope
    sk, dr = misra_gries_batch([k2 for _g, k2 in rows], k)
    assert "hot" in sk and "warm" in sk and dr <= n // (k + 1) + 1


def test_groups_are_isolated(spark, tmp_path):
    rows = (
        [("g1", "x")] * 4
        + [("g2", "y0")] * 9
        + [("g2", f"y{i}") for i in range(1, 12)]
    )
    _write_waves(spark, tmp_path / "s3", [rows])
    final = _drain(spark, tmp_path / "s3", "hh_groups", tmp_path / "c3", 4)
    g1 = final[final["group"] == "g1"]
    g2 = final[final["group"] == "g2"]
    assert dict(zip(g1["key"], g1["est_count"])) == {"x": 4}
    assert int(g1["n_seen"].iloc[0]) == 4
    # g2: 11 singletons evict (m=1), the heavy key survives undercounted
    assert dict(zip(g2["key"], g2["est_count"])) == {"y0": 8}
    assert int(g2["dropped"].iloc[0]) == 1
    assert int(g2["n_seen"].iloc[0]) == 20
    # an all-singleton group reduces to an EMPTY sketch — no false
    # heavy hitters (covered implicitly: y1..y11 are gone)
    assert set(g2["key"]) == {"y0"}


def test_restart_recovery(spark, tmp_path):
    src = tmp_path / "s4"
    out_dir = str(tmp_path / "hh_out")

    def drain_fb():
        obs = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src / "*"))
        )
        q = (
            stream_heavy_hitters(obs, k=4)
            .writeStream.foreachBatch(
                lambda b, e: b.withColumn("epoch", F.lit(int(e)))
                .write.mode("append")
                .parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "c4"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_waves(spark, src, [[("g", "hot")] * 6 + [("g", "a")]])
    drain_fb()
    _write_waves(spark, src, [[("g", "hot")] * 5 + [("g", "b")]])
    drain_fb()  # new query, same checkpoint: state must carry over
    pdf = spark.read.parquet(out_dir).toPandas()
    last = pdf[pdf["n_seen"] == pdf["n_seen"].max()]
    est = dict(zip(last["key"], last["est_count"]))
    assert int(last["n_seen"].iloc[0]) == 13
    assert est["hot"] == 11  # accumulated across the restart, never reset
