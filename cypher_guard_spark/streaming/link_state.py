"""Stateful streaming entity-link statistics (applyInPandasWithState).

The batch pipeline computes link stats with a salted two-stage aggregation
(pipeline/mentions.py:link_scores). On a continuous mention stream the
same statistic becomes a CUSTOM STATEFUL OPERATOR: per (surface, label)
group, running (n_mentions, score_sum) state carried across micro-batches,
re-emitted whenever the group receives new mentions ("update" semantics).

Scale posture:
- state is O(distinct entities), not O(mentions) — the hub entity that
  skews the batch shuffle contributes exactly one state row here;
- the state payload is two numbers; a 10^9-entity state fits the HDFS/
  RocksDB state store comfortably;
- Arrow batches per group keep the Python boundary vectorized (the
  per-group pandas frames are the same shape the batch UDFs see).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

LINK_STATE_SCHEMA = StructType(
    [
        StructField("n_mentions", LongType()),
        StructField("score_sum", DoubleType()),
    ]
)

LINK_OUTPUT_SCHEMA = StructType(
    [
        StructField("surface", StringType()),
        StructField("label", StringType()),
        StructField("n_mentions", LongType()),
        StructField("avg_score", DoubleType()),
    ]
)


def _update_link_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, score_sum = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += int(len(pdf))
        score_sum += float(pdf["score"].sum())
    state.update((n, score_sum))
    surface, label = key
    yield pd.DataFrame(
        {
            "surface": [surface],
            "label": [label],
            "n_mentions": [n],
            "avg_score": [score_sum / n if n else 0.0],
        }
    )


def stream_link_stats(mentions: DataFrame) -> DataFrame:
    """mentions stream (surface, label, score, …) → per-entity running
    stats, one updated row per touched entity per micro-batch."""
    return mentions.groupBy("surface", "label").applyInPandasWithState(
        _update_link_state,
        LINK_OUTPUT_SCHEMA,
        LINK_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
