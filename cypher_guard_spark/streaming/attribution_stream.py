"""Streaming attribution — a STREAM-STREAM interval join: purchases
joined to the same user's views in the preceding attribution window, as
both sides arrive.

This is the two-unbounded-inputs case the batch `range_join` cannot
serve: Spark's stream-stream inner join with event-time bounds on BOTH
sides (watermark + the interval predicate) lets the state store drop a
buffered row as soon as no future row on the other side could still
match it — state is bounded by arrival-rate x (watermark + window), not
stream length. Without the time-range predicate the join would buffer
both streams forever; the predicate is therefore part of the operator's
contract, not an optimization.

A view arriving in one microbatch matches purchases arriving many
microbatches later (within the window) — the cross-batch buffering is
exactly what the parity test locks against the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_click_attribution(
    views: DataFrame,
    purchases: DataFrame,
    window_s: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """(user_id, view_event_id, purchase_event_id, view_ts, purchase_ts)
    — every (view, purchase) pair of the same user with
    ``purchase_ts - window_s <= view_ts < purchase_ts``, emitted as soon
    as both sides have arrived."""
    v = (
        views.select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_event_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    p = (
        purchases.select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return p.join(
        v,
        F.expr(
            "v_user = p_user AND "
            f"view_ts >= purchase_ts - INTERVAL {int(window_s)} SECONDS AND "
            "view_ts < purchase_ts"
        ),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "view_event_id",
        "purchase_event_id",
        "view_ts",
        "purchase_ts",
    )
