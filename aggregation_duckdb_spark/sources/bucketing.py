"""Bucketed tables: pre-shuffled storage for co-located joins.

The scale story: a join of two 100 TB-class tables (e.g. orders ⋈
lineitem on orderkey) shuffles both sides *every query*. Writing both
tables bucketed by the join key with the same bucket count moves that
shuffle to write time, once — every subsequent join is a zero-exchange
sort-merge over matching buckets. This is the Spark-native analogue of
the co-partitioning a distributed warehouse does with distribution
keys.

Bucketing requires the session catalog (``saveAsTable``); plain
``.parquet(path)`` writes can't carry bucket metadata.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from aggregation_duckdb_spark.plans.inspect import count_shuffles


def write_bucketed(df: DataFrame, table_name: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.

    ``sort_cols`` additionally sorts within buckets, letting the join
    skip its sort phase entirely (bucketed sort-merge join reads both
    sides already ordered)."""
    spark = df.sparkSession
    if mode == "overwrite":
        # the in-memory catalog is per-session but the warehouse dir is
        # not: a location orphaned by a previous session blocks
        # saveAsTable, so clear both
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
        if warehouse.startswith("file:"):
            warehouse = warehouse[len("file:"):]
        orphan = os.path.join(warehouse, table_name.lower())
        if warehouse and os.path.isdir(orphan):
            shutil.rmtree(orphan)
    writer = (df.write.mode(mode)
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def is_shuffle_free_join(joined: DataFrame) -> bool:
    """True when the join plan contains no shuffle exchange — the
    property bucketed co-located joins exist to deliver."""
    return count_shuffles(joined) == 0
