"""Streaming sessionization — the stream-native face of the batch
`events_sessionized` query (ops/relational.py): group each user's events
into sessions separated by >= `gap` of inactivity, continuously, as the
events arrive.

Built on Spark's native `session_window` (dynamic-gap event-time windows):
the state store holds ONE open window per active (user, session) and
merges windows when a late event bridges two provisional sessions —
exactly the semantics the batch lag()-based variant computes after the
fact. The watermark closes sessions whose quiet period has definitely
passed and EXPIRES their state, so state is bounded by the number of
concurrently-active users within the horizon, not by stream length —
the only formulation that survives an unbounded clickstream.

Emission is append-mode: a session row is emitted once, when the
watermark passes its close — which is what a downstream training-feature
join wants (immutable session facts, no upserts).

Session identity vs the batch twin: `session_window.end` is
last-event-time + gap (the window's expiry), while the batch query
reports last-event-time; the parity test accounts for the constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "event_time",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """(user_id, session_start, session_end_exclusive, n_events,
    total_value) — one row per closed session. `session_end_exclusive`
    is last event + gap (the session_window contract)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"),
            F.col(user_col).alias("user_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end_exclusive"),
            "n_events",
            "total_value",
        )
    )
