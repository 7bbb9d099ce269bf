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
