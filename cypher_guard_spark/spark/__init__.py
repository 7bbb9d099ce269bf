"""Spark-side wrappers: session factory + vectorized guard UDFs."""

from .session import build_session
from .validate_udf import validation_udf, validate_dataframe, partition_error_summary

__all__ = [
    "build_session",
    "validation_udf",
    "validate_dataframe",
    "partition_error_summary",
]
