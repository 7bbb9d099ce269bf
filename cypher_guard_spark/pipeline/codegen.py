"""Graph materialization: canonical triples → Cypher MERGE batches.

The emitted grammar is deliberately restricted to what the guard parses
(SURVEY.md §2.3 / quirk Q10): single label per node, property-map values
limited to string/number literals, `MERGE ... ON CREATE SET ...` only.
String values are sanitized by dropping quote characters — the reference
grammar has no escapes, a quote char terminates the literal.

Statement rendering is pure `format_string` (JVM, codegen'd); batching is
a shuffle-free mapInPandas that concatenates K statements per partition
chunk — batch composition is partition-dependent, batch *content* (the set
of statements) is deterministic.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

BATCH_SCHEMA = StructType(
    [
        StructField("batch_id", StringType()),
        StructField("cypher", StringType()),
    ]
)


def _clean(col):
    # the guard's string literals have no escape sequences: strip quotes
    return F.translate(col, "'\"", "")


def _person_props(col):
    first = F.element_at(F.split(col, " ", 2), 1)
    last = F.element_at(F.split(col, " ", 2), 2)
    return F.format_string(
        "{firstName: '%s', lastName: '%s'}", _clean(first), _clean(F.coalesce(last, F.lit("")))
    )


def _entity_props(label_col, surface_col):
    return (
        F.when(label_col == "Person", _person_props(surface_col))
        .when(label_col == "Company", F.format_string("{companyName: '%s'}", _clean(surface_col)))
        .otherwise(F.format_string("{city: '%s'}", _clean(surface_col)))
    )


def node_statements(entity_map: DataFrame) -> DataFrame:
    """One MERGE per canonical entity: (label, canonical) → cypher."""
    ents = entity_map.select("label", "canonical").dropDuplicates()
    var = F.lower(F.substring("label", 1, 1))
    stmt = F.format_string(
        "MERGE (%s:%s %s)", var, F.col("label"), _entity_props(F.col("label"), F.col("canonical"))
    )
    return ents.select(stmt.alias("statement"))


def relationship_statements(triples: DataFrame) -> DataFrame:
    """One MERGE path per distinct canonical triple."""
    t = triples.select("subj", "pred", "obj", "subj_label", "obj_label").dropDuplicates()
    stmt = F.format_string(
        "MERGE (a:%s %s)-[:%s]->(b:%s %s)",
        F.col("subj_label"),
        _entity_props(F.col("subj_label"), F.col("subj")),
        F.col("pred"),
        F.col("obj_label"),
        _entity_props(F.col("obj_label"), F.col("obj")),
    )
    return t.select(stmt.alias("statement"))


def build_merge_batches(
    entity_map: DataFrame, triples: DataFrame, statements_per_batch: int = 50
) -> DataFrame:
    """(batch_id, cypher) — multi-MERGE batches (valid clause order:
    AfterWrite → AfterWrite in the guard's FSM). No shuffle: batching is
    per-partition chunking inside mapInPandas."""
    stmts = node_statements(entity_map).unionByName(relationship_statements(triples))

    def chunk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        buf: list = []
        chunk_no = 0
        for pdf in batches:
            buf.extend(pdf["statement"].tolist())
            while len(buf) >= statements_per_batch:
                part, buf = buf[:statements_per_batch], buf[statements_per_batch:]
                yield pd.DataFrame(
                    {"batch_id": [f"b-{pid}-{chunk_no}"], "cypher": ["\n".join(part)]}
                )
                chunk_no += 1
        if buf:
            yield pd.DataFrame(
                {"batch_id": [f"b-{pid}-{chunk_no}"], "cypher": ["\n".join(buf)]}
            )

    return stmts.mapInPandas(chunk, BATCH_SCHEMA)
