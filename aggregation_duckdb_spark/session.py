"""SparkSession factory with scale-oriented defaults.

The engine targets very large (≈100 TB) fact tables joined against
dimension-sized hierarchies. Defaults below encode that posture:

- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic broadcast-join demotion/promotion.
- Arrow on: every Pandas-UDF / ``mapInPandas`` extension operator moves
  data in columnar batches, not pickled rows.
- shuffle partitions sized for the local test harness; on a real
  cluster AQE coalescing makes the initial number far less sensitive.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

def _default_driver_mem() -> str:
    """16g where the host can afford it (the 128 GiB / 32-thread test
    harness), else a quarter of physical RAM (floor 2g) — -Xms +
    pre-touch below commits the whole amount at JVM start, so a fixed
    16g default would refuse to boot on smaller hosts."""
    try:
        phys_gib = (os.sysconf("SC_PAGE_SIZE")
                    * os.sysconf("SC_PHYS_PAGES")) // (1 << 30)
    except (ValueError, OSError, AttributeError):
        return "4g"
    return "16g" if phys_gib >= 64 else f"{max(2, phys_gib // 4)}g"


_DRIVER_MEM = os.environ.get("SPARK_GRAFT_DRIVER_MEM",
                             _default_driver_mem())

# Configs that matter at 100 TB, applied everywhere so test plans match
# production plans as closely as local mode allows.
SCALE_CONFS: dict[str, str] = {
    # local[N] runs every task in the driver JVM; Spark's 1g default
    # heap starves 32 concurrent shuffle tasks (observed OOM in the
    # near-dup candidate join at ~16k vectors). JVM-start conf: applies
    # when this factory creates the session, inert on an existing one.
    "spark.driver.memory": _DRIVER_MEM,
    # Commit the whole heap at JVM start (-Xms + pre-touch): without
    # this, G1 grows the heap lazily toward -Xmx and the task threads
    # pay multi-second page-fault/zeroing stalls mid-query for the
    # first several jobs (observed: 6-11 s one-off stalls in the LSH
    # bench at 16g, GC pauses <25 ms — allocation, not collection).
    # Moves the cost to startup, where the bench warmup absorbs it.
    "spark.driver.extraJavaOptions":
        f"-Xms{_DRIVER_MEM} -XX:+AlwaysPreTouch",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # dims (hierarchies, region/nation/customer slices) broadcast freely
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ANSI off: the reference depends on NULL (not error) for
    # out-of-range 1-based array access (aggregation_example.sql:188-201
    # — level_2/3 columns of shallow nodes) and on permissive casts.
    "spark.sql.ansi.enabled": "false",
    # deterministic session timezone so timestamp-bucketing operators
    # hash-match the DuckDB oracle regardless of host TZ
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": DEFAULT_CPUS,
    # read side: keep scan tasks big enough to amortize open cost
    "spark.sql.files.maxPartitionBytes": "256m",
    # catalog tables (bucketed writes) land outside the repo
    "spark.sql.warehouse.dir": "/tmp/spark-graft-warehouse",
    # events.ts is parquet TIMESTAMP(NANOS); read as long (io.py floors
    # to micros, matching DuckDB's reader)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(app_name: str = "aggregation-duckdb-spark",
              master: str | None = None,
              extra_confs: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's scale defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for the test
    harness; on a cluster, pass ``None`` with a pre-configured
    spark-submit and the builder inherits it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    elif not SparkSession.getActiveSession():
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    for k, v in SCALE_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
