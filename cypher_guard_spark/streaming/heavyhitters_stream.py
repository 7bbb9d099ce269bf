"""Streaming heavy hitters — Misra–Gries frequent-item sketches per
group over an unbounded stream (applyInPandasWithState).

Why a sketch: exact streaming top-k needs every key's count in the state
store — unbounded on a clickstream where the key is a user, URL or
n-gram. A Misra–Gries summary keeps AT MOST `k` counters per group, and
still guarantees (the classic ε = 1/(k+1) bound):

- every key with true frequency > n_seen/(k+1) IS in the sketch, and
- each estimate undercounts by at most `dropped` (the published
  per-group error bound, with dropped ≤ n_seen/(k+1)).

Per microbatch the update is the MG MERGE (Agarwal et al., "Mergeable
Summaries"): exact pandas counts for the batch fold into the state's
counter dict; if more than `k` counters survive, the (k+1)-th largest
count m is subtracted from all (dropping non-positives) and added to
`dropped`. Merging is commutative on counts, so the GUARANTEES are
independent of trigger slicing even though individual estimates (like
any MG summary's) depend on arrival order — the test contract is
therefore the coverage + error envelope vs exact batch counts across
DIFFERENT slicings, plus checkpoint-restart recovery, not bit equality.

State per group is O(k) fixed width (two parallel arrays + two longs).
A global (ungrouped) top-k is the single-group degenerate case; at
scale, shard by a group column and union the per-shard sketches (MG
summaries merge losslessly — the same merge rule).

Reference scope: the reference repo has no data plane (SURVEY §2.8);
this belongs to the training-data-pipeline suite the brief adds.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

HH_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("dropped", LongType()),
        StructField("n_seen", LongType()),
    ]
)

HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("group", StringType()),
        StructField("key", StringType()),
        StructField("est_count", LongType()),
        StructField("dropped", LongType()),
        StructField("n_seen", LongType()),
    ]
)


def make_hh_updater(k: int):
    """Build the per-group MG state updater for sketch size `k`."""

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, counts, dropped, n_seen = state.get
            sketch = dict(zip(keys, counts))
        else:
            sketch, dropped, n_seen = {}, 0, 0
        for pdf in pdfs:
            n_seen += int(len(pdf))
            for kk, c in pdf["key"].value_counts().items():
                sketch[kk] = sketch.get(kk, 0) + int(c)
        if len(sketch) > k:
            m = sorted(sketch.values(), reverse=True)[k]
            sketch = {kk: c - m for kk, c in sketch.items() if c - m > 0}
            dropped += m
        ks = sorted(sketch)
        state.update((ks, [sketch[kk] for kk in ks], dropped, n_seen))
        (group,) = key
        yield pd.DataFrame(
            {
                "group": [group] * len(ks),
                "key": ks,
                "est_count": [sketch[kk] for kk in ks],
                "dropped": [dropped] * len(ks),
                "n_seen": [n_seen] * len(ks),
            }
        )

    return _update


def stream_heavy_hitters(
    events: DataFrame,
    k: int = 8,
    group_col: str = "group",
    key_col: str = "key",
) -> DataFrame:
    """(group, key, est_count, dropped, n_seen) per trigger — the
    current Misra–Gries sketch of each group, at most `k` rows per
    group, update output mode. Works on any DataFrame with a group and
    a key column; rename via the col args."""
    from pyspark.sql import functions as F

    src = events.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(key_col).cast("string").alias("key"),
    )
    return src.groupBy("group").applyInPandasWithState(
        make_hh_updater(k),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def misra_gries_batch(rows, k: int) -> tuple[dict, int]:
    """Reference single-merge MG over an iterable of keys — the batch
    twin the stream tests compare envelopes against. Returns
    (sketch, dropped)."""
    from collections import Counter

    sketch = dict(Counter(rows))
    dropped = 0
    if len(sketch) > k:
        m = sorted(sketch.values(), reverse=True)[k]
        sketch = {kk: c - m for kk, c in sketch.items() if c - m > 0}
        dropped += m
    return sketch, dropped
