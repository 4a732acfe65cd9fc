"""Sources & sinks beyond the core parquet loader (io.py).

The reference's storage surface is one DuckDB file plus a CSV export
(SURVEY §2.1 S1–S7). This package carries the Spark-native equivalents
a production deployment needs: schema-explicit CSV/JSON connectors and
bucketed tables — the pre-shuffle layout that turns repeated big-big
joins into zero-exchange joins at 100 TB.
"""

from aggregation_duckdb_spark.sources.bucketing import (
    is_shuffle_free_join, write_bucketed)
from aggregation_duckdb_spark.sources.formats import (
    read_csv, read_json, write_csv_dir, write_json)

__all__ = ["read_csv", "read_json", "write_csv_dir", "write_json",
           "write_bucketed", "is_shuffle_free_join"]
