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


def ensure_nanos_as_long(spark: SparkSession) -> None:
    """Enable reading parquet TIMESTAMP(NANOS) columns as nanosecond
    longs. Session-scoped by necessity (Spark exposes no per-read
    option for it) and safe session-wide: the conf ONLY changes the
    handling of NANOS columns, which Spark 4 otherwise refuses to read
    at all — every other parquet read is unaffected. Set in
    session.SCALE_CONFS for our own sessions; this covers sessions
    created by external callers (e.g. the round driver)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


# Nanos→micros as FLOOR division in pure integer math: `ts div 1000`
# truncates toward zero, which rounds pre-epoch (negative) instants the
# wrong way; pmod keeps the arithmetic on longs (a double division
# would lose precision past 2^53 ns). Matches DuckDB's reader exactly.
_NANOS_TS_TO_MICROS = "timestamp_micros((ts - pmod(ts, 1000)) div 1000)"


def normalize_event_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TimestampType (LTZ) whatever the
    parquet encoding was:

    - TIMESTAMP(NANOS) read as long (``nanosAsLong``) → floor to
      micros, matching DuckDB's reader;
    - TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ →
      wall-clock-preserving cast (session TZ is pinned UTC, so the
      instant is identical and DuckDB's naive read agrees);
    - already TimestampType → unchanged.

    Every downstream time operator (``unix_micros``, watermarks,
    ``dropDuplicatesWithinWatermark``) requires TimestampType, so this
    is the single choke point for event-time typing."""
    from pyspark.sql import functions as F
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.expr(_NANOS_TS_TO_MICROS))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Scan one table. Column pruning / filter pushdown happen at the
    parquet scan because callers compose on the returned DataFrame
    lazily (check ``.explain``: PushedFilters / ReadSchema).

    ``events.ts`` arrives in whatever physical type the generator used
    (nanos or micros-NTZ); :func:`normalize_event_ts` pins it to
    TimestampType either way."""
    if name == "events":
        ensure_nanos_as_long(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
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
