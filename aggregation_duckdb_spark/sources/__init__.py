"""Sources & sinks beyond the core parquet loader (io.py).

The reference's storage surface is one DuckDB file plus a CSV export
(SURVEY §2.1 S1–S7). This package carries the Spark-native equivalents
a production deployment needs: schema-explicit CSV/JSON connectors,
bucketed tables — the pre-shuffle layout that turns repeated big-big
joins into zero-exchange joins at 100 TB — and Z-order (Morton)
clustered layouts whose coarse buckets let 2-D box predicates prune
partition directories at plan time.
"""

from aggregation_duckdb_spark.sources.bucketing import (
    is_shuffle_free_join, write_bucketed)
from aggregation_duckdb_spark.sources.formats import (
    read_csv, read_json, write_csv_dir, write_json)
from aggregation_duckdb_spark.sources.layout import (
    alter_zordered, append_zordered, append_zordered_many,
    compact_zordered,
    delete_zordered_box,
    delete_zordered_keys, optimize_zordered, purge_zordered_keys,
    read_zordered,
    recluster_zordered,
    read_zordered_box, read_zordered_box_nd,
    read_zordered_box_with_delta, read_zordered_where, table_exists,
    table_history, table_version, upsert_zordered, vacuum_zordered,
    version_at_timestamp,
    write_zordered, write_zordered_nd, zbuckets_for_box,
    zbuckets_for_ranges, zonemap_buckets)

__all__ = ["read_csv", "read_json", "write_csv_dir", "write_json",
           "write_bucketed", "is_shuffle_free_join",
           "write_zordered", "read_zordered", "read_zordered_box",
           "zbuckets_for_box", "append_zordered",
           "append_zordered_many", "compact_zordered",
           "read_zordered_box_with_delta", "table_exists",
           "upsert_zordered", "vacuum_zordered", "table_version",
           "read_zordered_where", "zonemap_buckets",
           "delete_zordered_box", "delete_zordered_keys",
           "write_zordered_nd", "read_zordered_box_nd",
           "zbuckets_for_ranges", "optimize_zordered",
           "table_history", "alter_zordered", "recluster_zordered",
           "version_at_timestamp", "purge_zordered_keys"]
