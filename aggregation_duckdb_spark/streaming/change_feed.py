"""Streaming change feed off the Z-ordered table's manifest log —
the Delta Lake Change Data Feed analogue, composed from parts this
repo already trusts instead of per-commit change files:

- the ``zhistory`` source (:mod:`sources.pydatasource`) tails the
  manifest and emits one METADATA row per new commit, rate-limited,
  with manifest versions as the stream's offsets (checkpointed by
  Spark — exactly-once delivery across restarts for free);
- ``foreachBatch`` materializes each commit's CHANGE ROWS with
  :func:`sources.layout.diff_zordered` (snapshot-vs-snapshot, fully
  distributed — the driver only ever touches the handful of metadata
  rows per micro-batch) and lands them in a parquet sink partitioned
  by ``_commit_version`` with dynamic partition overwrite, so an
  at-least-once replay REWRITES its commit's partition instead of
  duplicating it — exactly-once visible change rows end to end.

The first commit (the CREATE) has no predecessor snapshot: its change
rows are the v1 snapshot tagged ``insert``, so a feed started from
version 1 reconstructs the whole table history. Retention contract:
both endpoints of every pending diff must still be readable — run
mutations with ``vacuum=False`` (or a retention window) while a feed
is live, exactly Delta CDF's requirement.

100 TB: the source moves kilobytes of metadata; each diff costs two
endpoint-pruned snapshot scans plus a keyed join (endpoint-
proportional, never history-proportional), and the sink overwrite is
scoped to one commit's partition. A training-data pipeline resumes
the feed after any crash from the checkpoint alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _commit_changes(spark: SparkSession, table_path: str, version: int,
                    key_cols: list[str]) -> DataFrame:
    """The change rows of ONE commit: v1 = the created snapshot as
    inserts; later versions = the row-level diff against v-1."""
    from aggregation_duckdb_spark.sources import layout as L
    if version == 1:
        return (L.read_zordered(spark, table_path, version=1)
                .drop("zbucket")
                .withColumn("_change_type", F.lit("insert")))
    return L.diff_zordered(spark, table_path, version - 1, version,
                           key_cols=key_cols)


def run_change_feed(spark: SparkSession, table_path: str,
                    sink_path: str, checkpoint_dir: str,
                    key_cols: list[str],
                    max_commits_per_batch: int = 10,
                    starting_version: int = 1) -> None:
    """Drain all outstanding commits of the table into the change-row
    sink, resuming from the checkpoint — call again after more commits
    land, or wrap with a processing-time trigger for a long-lived
    tail. Idempotent per commit: replays rewrite their
    ``_commit_version`` partition.

    Spark's Python micro-batch stream does not support
    Trigger.AvailableNow (it falls back to SINGLE-batch execution),
    so one start() processes at most ``max_commits_per_batch``
    commits; this function loops starts against the same checkpoint
    until the feed has caught up with the manifest head (or a run
    makes no progress — already drained)."""
    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.sources.pydatasource import (
        register_zhistory)
    register_zhistory(spark)
    done: set[int] = set()

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # bounded collect: at most max_commits_per_batch metadata rows
        commits = sorted(r["version"] for r in
                         batch_df.select("version").collect())
        for v in commits:
            rows = (_commit_changes(spark, table_path, v, key_cols)
                    .withColumn("_commit_version", F.lit(int(v))))
            with fsio.dynamic_partition_overwrite(spark):
                (rows.write.mode("overwrite")
                 .partitionBy("_commit_version").parquet(sink_path))
            done.add(int(v))

    mdir = fsio._join(table_path, "_manifest")
    while True:
        processed_before = len(done)
        q = (spark.readStream.format("zhistory")
             .option("tablePath", table_path)
             .option("max_commits_per_batch", int(max_commits_per_batch))
             .option("starting_version", int(starting_version))
             .load()
             .writeStream
             .foreachBatch(fold)
             .option("checkpointLocation", checkpoint_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
        if len(done) == processed_before:
            return                       # no progress: drained
        if max(done) >= fsio.latest_version(spark, mdir):
            return                       # caught up with the head


def read_change_feed(spark: SparkSession, sink_path: str,
                     from_version: int | None = None,
                     to_version: int | None = None) -> DataFrame:
    """Read the materialized change rows back (batch) — optionally a
    version range; ``mergeSchema`` because commits may straddle a
    schema evolution."""
    out = (spark.read.option("mergeSchema", "true").parquet(sink_path))
    if from_version is not None:
        out = out.where(F.col("_commit_version") >= from_version)
    if to_version is not None:
        out = out.where(F.col("_commit_version") <= to_version)
    return out
