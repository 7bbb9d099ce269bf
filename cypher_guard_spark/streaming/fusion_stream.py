"""Streaming triple evidence fusion (applyInPandasWithState): the
always-on form of `pipeline/graph_store.py:fuse_triples`.

A continuous extraction pipeline doesn't re-fuse the whole fact table per
crawl — each fact's fused confidence is RUNNING STATE updated as new
observations arrive. Per (subj, pred, obj) group the state carries
(n_obs, certain, ln_sum, max_conf, first_doc, last_doc): the noisy-OR
product Π(1-cᵢ) lives in log space as Σ ln(1-cᵢ) (the batch operator's
scale mode exactly — a sum is the one thing that accumulates cleanly
forever), with any conf ≥ 1 observation latching `certain` so ln(0) never
evaluates and the fact saturates at 1 permanently.

Deliberate contract differences from the batch operator, both forced by
unbounded state:
- `n_docs` (distinct docs) is NOT tracked — a famous fact's distinct-doc
  set is unbounded state; n_obs + the first/last doc range carry the
  provenance signal (documented drop, asserted in the parity test).
- agg_conf may differ from the batch fast mode in the last ulp: the
  stream folds ln terms in arrival order, the batch in partition order —
  the same FP-order caveat the batch docstring already declares (parity
  test pins 1e-9).

Scale posture (the link_state arguments): state is O(distinct facts),
one fixed-width row each — no lists, no growth with observation count;
update output mode re-emits only the facts touched in each micro-batch,
so downstream MERGE work is delta-sized; Arrow batches keep the Python
boundary vectorized.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FUSION_STATE_SCHEMA = StructType(
    [
        StructField("n_obs", LongType()),
        StructField("certain", IntegerType()),
        StructField("ln_sum", DoubleType()),
        StructField("max_conf", DoubleType()),
        StructField("first_doc", StringType()),
        StructField("last_doc", StringType()),
    ]
)

FUSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("subj", StringType()),
        StructField("pred", StringType()),
        StructField("obj", StringType()),
        StructField("n_obs", LongType()),
        StructField("first_doc", StringType()),
        StructField("last_doc", StringType()),
        StructField("max_conf", DoubleType()),
        StructField("agg_conf", DoubleType()),
    ]
)


def _update_fusion_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, certain, ln_sum, max_conf, first_doc, last_doc = state.get
    else:
        n, certain, ln_sum, max_conf, first_doc, last_doc = 0, 0, 0.0, 0.0, None, None
    for pdf in pdfs:
        n += int(len(pdf))
        for doc, conf in zip(pdf["doc_id"], pdf["conf"]):
            conf = float(conf)
            if conf >= 1.0:
                certain = 1
            else:
                ln_sum += math.log(1.0 - conf)
            max_conf = max(max_conf, conf)
            first_doc = doc if first_doc is None or doc < first_doc else first_doc
            last_doc = doc if last_doc is None or doc > last_doc else last_doc
    state.update((n, certain, ln_sum, max_conf, first_doc, last_doc))
    agg = 1.0 if certain else round(1.0 - math.exp(ln_sum), 6)
    subj, pred, obj = key
    yield pd.DataFrame(
        {
            "subj": [subj],
            "pred": [pred],
            "obj": [obj],
            "n_obs": [n],
            "first_doc": [first_doc],
            "last_doc": [last_doc],
            "max_conf": [max_conf],
            "agg_conf": [agg],
        }
    )


def stream_fuse_triples(observations: DataFrame) -> DataFrame:
    """observation stream (doc_id, subj, pred, obj, conf) → running fused
    fact rows, one updated row per touched fact per micro-batch."""
    return observations.groupBy("subj", "pred", "obj").applyInPandasWithState(
        _update_fusion_state,
        FUSION_OUTPUT_SCHEMA,
        FUSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
