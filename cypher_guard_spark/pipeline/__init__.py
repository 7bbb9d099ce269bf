"""KG-construction pipeline: documents → mentions → triples →
canonicalization → MERGE codegen → validation gate, with per-stage
lineage + resume (BASELINE.json north_star)."""

from .synth import pipeline_db_schema, synthesize_documents, ground_truth_triples
from .runner import run_pipeline

__all__ = [
    "pipeline_db_schema",
    "synthesize_documents",
    "ground_truth_triples",
    "run_pipeline",
]
