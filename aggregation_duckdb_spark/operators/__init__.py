"""Operator library: hierarchical aggregation (reference parity) plus
the large-scale pipeline extensions (dedup, similarity, text, events,
multimodal)."""

from aggregation_duckdb_spark.operators.aggregate import (
    aggregate_with_closure,
    aggregate_with_rollup,
    standard_measures,
)

__all__ = [
    "aggregate_with_closure",
    "aggregate_with_rollup",
    "standard_measures",
]
