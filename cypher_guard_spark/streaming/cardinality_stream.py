"""Streaming windowed cardinality — continuous distinct-key counting
over event-time windows, the always-on face of the batch
`cardinality_profile` (ops/text.py HLL++ mode).

Why a sketch and not COUNT(DISTINCT): an exact streaming distinct needs
the full key set per open window in the state store — unbounded on a
clickstream where one window can see 10^9 users. `approx_count_distinct`
(HyperLogLog++) keeps a FIXED-width register array per window instead,
so state is O(open windows), not O(keys) — the only formulation that
survives an unbounded stream, and the same estimator the batch profile
publishes, so dashboards reconcile. The sketch merge is associative and
deterministic (register-wise max), which gives cross-microbatch
stability: the result is a pure function of the window's event set,
independent of how triggers sliced it — the parity contract the test
locks against the batch twin.

Emission is append-mode after the watermark closes a window: immutable
per-window facts, the shape a downstream rate-limiter or training-mix
monitor joins against.

Reference scope: the reference repo has no data plane (SURVEY §2.8);
this belongs to the training-data-pipeline suite the brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_windowed_cardinality(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "event_time",
    key_col: str = "user_id",
    rsd: float = 0.05,
) -> DataFrame:
    """(window_start, window_end, n_events, approx_keys) — one row per
    closed tumbling event-time window: exact event count + HLL++
    approximate distinct `key_col` count at relative standard deviation
    `rsd`. Works identically on a batch DataFrame (the parity twin) and
    a streaming one."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct(key_col, rsd).alias("approx_keys"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "approx_keys",
        )
    )
