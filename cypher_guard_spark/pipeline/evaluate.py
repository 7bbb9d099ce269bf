"""P/R scoring of emitted triples vs the ground-truth oracle (BASELINE.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEYS = ["doc_id", "subj", "pred", "obj"]


def triple_prf(emitted: DataFrame, ground_truth: DataFrame) -> dict:
    """Doc-level (doc_id, subj, pred, obj) precision/recall/F1 — stricter
    than corpus-level distinct triples."""
    e = emitted.select(*_KEYS).dropDuplicates()
    g = ground_truth.select(*_KEYS).dropDuplicates()
    n_e = e.count()
    n_g = g.count()
    n_i = e.join(g, _KEYS, "inner").count()
    precision = n_i / n_e if n_e else 0.0
    recall = n_i / n_g if n_g else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "emitted": n_e,
        "ground_truth": n_g,
        "matched": n_i,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def span_sequence_check(documents_in: DataFrame, documents_out: DataFrame) -> int:
    """Rows whose span sequence (kind, text, media_ref, order) differs
    between pipeline input and its checkpointed output — must be 0
    (input_hint per-row invariant)."""
    key = lambda df: df.select(  # noqa: E731
        "doc_id",
        F.to_json(
            F.expr("transform(spans, s -> struct(s.kind, s.text, s.media_ref, s.offset))")
        ).alias("seq"),
    )
    a, b = key(documents_in), key(documents_out)
    return a.join(b, "doc_id", "full").where(
        (a["seq"].isNull()) | (b["seq"].isNull()) | (a["seq"] != b["seq"])
    ).count()
