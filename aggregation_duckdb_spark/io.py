"""Parquet sources and sinks for the engine.

Mirrors the reference's storage role (DuckDB native columnar file,
create_duckdb_database.sh:5) with Parquet — Spark's columnar format with
predicate pushdown, column pruning, and row-group skipping for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Scan one table. Column pruning / filter pushdown happen at the
    parquet scan because callers compose on the returned DataFrame
    lazily (check ``.explain``: PushedFilters / ReadSchema).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
    default; we read it as a nanosecond long and floor to microseconds
    (exactly what DuckDB's reader does), keeping both engines on the
    same instant."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in names}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR,
                   names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so every operator is also
    reachable from ``spark.sql`` (mirrors the reference being pure SQL)."""
    for name in names:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None) -> None:
    """CTAS equivalent (aggregation_example.sql:86, :351 use
    CREATE OR REPLACE TABLE ... AS). Partitioning is the caller's scale
    lever: e.g. partition facts by date for pruning."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """CSV result export — the reference's only sink artifact
    (results/product_reporting_dim_table_contents.csv). ``single_file``
    coalesces to one task; only for dim-sized results."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)
