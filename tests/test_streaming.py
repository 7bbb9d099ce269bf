"""Structured Streaming validator: verdict parity with the batch path,
exactly-once drain via AvailableNow, watermarked error-rate aggregation."""

import datetime as dt
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from cypher_guard_spark.guard import DbSchema
from cypher_guard_spark.streaming import (
    run_available_now,
    stream_error_rates,
    stream_validate,
)
from cypher_guard_spark.streaming.validate_stream import (
    BATCH_STREAM_SCHEMA,
    read_batch_stream,
)

GOLDEN = json.loads(
    (Path(__file__).parent / "golden/verdicts.json").read_text()
)
EVAL_SCHEMA_PATH = Path("/root/reference/data/schema/eval_schema.json")


@pytest.fixture(scope="module")
def eval_schema():
    if not EVAL_SCHEMA_PATH.exists():
        pytest.skip("reference eval schema not available")
    return DbSchema.from_dict(json.loads(EVAL_SCHEMA_PATH.read_text()))


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (e["query_id"], e["cypher"], t0 + dt.timedelta(seconds=i * 30))
        for i, e in enumerate(GOLDEN[:40])
    ]
    spark.createDataFrame(rows, BATCH_STREAM_SCHEMA).coalesce(2).write.mode(
        "overwrite"
    ).parquet(str(d))
    return str(d)


def test_stream_verdicts_match_batch(spark, eval_schema, source_dir, tmp_path):
    run_available_now(
        spark, source_dir, str(tmp_path / "ckpt"), eval_schema, "t_stream_v"
    )
    got = {
        r["batch_id"]: (r["is_valid"], r["syntax_ok"])
        for r in spark.sql("SELECT * FROM t_stream_v").collect()
    }
    assert len(got) == 40
    for e in GOLDEN[:40]:
        assert got[e["query_id"]] == (e["has_valid_cypher"], e["parse_ok"])


def test_stream_availablenow_is_exactly_once(spark, eval_schema, source_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    out = str(tmp_path / "out")
    run_available_now(spark, source_dir, ckpt, eval_schema, output_dir=out)
    n1 = spark.read.parquet(out).count()
    # re-run with the same checkpoint: no new source files -> no duplicates
    run_available_now(spark, source_dir, ckpt, eval_schema, output_dir=out)
    n2 = spark.read.parquet(out).count()
    assert n1 == 40
    assert n2 == 40


def test_stream_error_rates_windowing(spark, eval_schema, source_dir, tmp_path):
    validated = stream_validate(
        spark, read_batch_stream(spark, source_dir), eval_schema
    )
    rates = stream_error_rates(validated, window="5 minutes", watermark="10 minutes")
    q = (
        rates.writeStream.format("memory")
        .queryName("t_stream_rates")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM t_stream_rates").collect()
    assert rows, "windowed aggregation produced no rows"
    # 40 docs at 30s spacing = 20 min -> four 5-minute windows
    windows = {r["window"]["start"] for r in rows}
    assert len(windows) == 4
    total = sum(r["n"] for r in rows)
    # every row lands exactly once per (window, code-or-OK) partitioning:
    # explode_outer emits >= 1 row per input row
    assert total >= 40


def test_stateful_link_stats_accumulates_across_microbatches(spark, tmp_path):
    """applyInPandasWithState: per-entity running counts must carry state
    across micro-batches and match the batch-mode aggregation exactly."""
    import pandas as pd

    from cypher_guard_spark.streaming import stream_link_stats

    src = tmp_path / "mentions_src"
    src.mkdir()
    schema = "surface string, label string, score double"
    wave1 = [("alice smith", "Person", 0.9), ("acme corp", "Company", 0.8),
             ("alice smith", "Person", 0.7)]
    wave2 = [("alice smith", "Person", 0.5), ("berlin", "Location", 1.0)]
    spark.createDataFrame(wave1, schema).coalesce(1).write.parquet(str(src / "w1"))
    spark.createDataFrame(wave2, schema).coalesce(1).write.parquet(str(src / "w2"))

    mentions = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per wave
        .parquet(str(src / "*"))
    )
    q = (
        stream_link_stats(mentions)
        .writeStream.format("memory")
        .queryName("link_stats_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    updates = spark.sql("SELECT * FROM link_stats_stream").toPandas()
    # multiple update rows per key are expected (one per touched batch);
    # the LAST update per key is the running total
    final = (
        updates.groupby(["surface", "label"]).last().reset_index()
        .set_index(["surface", "label"])
    )
    batch = pd.DataFrame(wave1 + wave2, columns=["surface", "label", "score"])
    expected = batch.groupby(["surface", "label"]).agg(
        n_mentions=("score", "size"), avg_score=("score", "mean")
    )
    assert len(final) == 3
    for key, row in expected.iterrows():
        assert final.loc[key, "n_mentions"] == row["n_mentions"], key
        assert abs(final.loc[key, "avg_score"] - row["avg_score"]) < 1e-9, key
    # state really crossed batches: alice smith saw two updates
    alice_updates = updates[(updates.surface == "alice smith")]
    assert len(alice_updates) == 2
    assert sorted(alice_updates.n_mentions) == [2, 3]
