"""Streaming event-time operators: watermarked windows and sessions.

Mirrors ``operators/events.py`` (batch). The transformations are the
same ``F.window``/``session_window`` group-bys — streaming-native, so
state is bounded by the watermark: Spark drops window state once the
watermark (max seen event time − delay) passes the window end. At
100 TB/day that bound, not the data volume, sizes the state store.

Determinism notes mirror the batch module: epoch-aligned buckets,
decimal value sums. Streaming aggregation output order is undefined —
callers (and the oracle harness) sort.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from aggregation_duckdb_spark.runtime import materialize

# symlink dirs for single-file sources, one per source path per process
_SYMLINK_DIRS: dict[str, str] = {}

# ---------------------------------------------------------------------
# scale-adaptive state partitioning for finite drains
#
# A stateful streaming aggregation keys its state store to
# spark.sql.shuffle.partitions AT QUERY START and AQE cannot coalesce
# it afterwards (state partitioning is frozen into the checkpoint), so
# the session-wide constant is wrong in BOTH directions: 32 state
# partitions over a few MB of input is pure per-partition commit
# overhead (~20 ms each: delta-file create + fsync + task dispatch —
# measured 986 ms → 301 ms addBatch on the sf0.1 tumbling drain by
# sizing down), while a fixed small number would starve a 100 TB/day
# stream. Derive the partition count from the SOURCE BYTES the drain
# is about to process — the streaming analogue of AQE's
# advisoryPartitionSizeInBytes — bounded by a multiple of the
# cluster's parallelism.
#
# Source builders (:func:`events_stream` / :func:`table_stream`)
# record their input size here; :func:`run_available_now` consumes the
# pending records when it plans the drain. Streams built directly from
# ``spark.readStream`` (tests do this) record nothing and keep the
# session default — behavior unchanged. EVERY finite-drain entry
# point consumes (or clears) the pending list when it runs — a source
# drained through the foreachBatch sinks (``run_zordered_ingest``,
# ``run_dedup_ingest``, ``run_table_stream``, …) must not leave its
# tally behind to skew the width of the NEXT unrelated drain (round
# 16; staleness is perf-only — results were never affected — but a
# stale small entry could shrink an unrelated drain as easily as a
# stale large one could widen it). Single-threaded driver assumed, as
# for the conf save/restore in :func:`run_available_now`.
# ---------------------------------------------------------------------

#: input bytes per state partition — the streaming twin of
#: spark.sql.adaptive.advisoryPartitionSizeInBytes (env-overridable;
#: production guidance in OPTIMIZATION_r15.md).
STATE_PARTITION_TARGET_BYTES = int(os.environ.get(
    "SPARK_GRAFT_STREAM_STATE_TARGET_MB", "32")) << 20

_PENDING_SOURCE_BYTES: list[int] = []


def _record_source_bytes(path: str) -> None:
    """Tally a source's on-disk bytes for the next drain's partition
    derivation (filesystem metadata only — no Spark job)."""
    try:
        total = 0
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files
                             if not f.startswith(("_", ".")))
        else:
            total = os.path.getsize(path)
        _PENDING_SOURCE_BYTES.append(total)
    except OSError:
        pass


def consume_pending_source_bytes() -> None:
    """Drop the recorded source tallies — called by every finite-drain
    entry point that does NOT size itself from them, so a drained
    source never skews the next drain's width derivation."""
    _PENDING_SOURCE_BYTES.clear()


def _drain_shuffle_partitions(spark: SparkSession) -> int | None:
    """Partition count for the next finite drain, from the recorded
    source bytes; None (= keep session default) when no source
    registered."""
    if not _PENDING_SOURCE_BYTES:
        return None
    total = sum(_PENDING_SOURCE_BYTES)
    _PENDING_SOURCE_BYTES.clear()
    import math
    n = max(1, math.ceil(total / max(STATE_PARTITION_TARGET_BYTES, 1)))
    try:
        par = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect
        par = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # cap: wider than a few x the cluster's parallelism only adds
    # per-partition state-store overhead without adding concurrency
    return min(n, 4 * max(par, 1))


def table_stream(spark: SparkSession, sf_dir: str, table: str,
                 max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over any testdata table directory — the
    generic form of :func:`events_stream` (no ts normalization).
    Streaming reads need a declared schema; we take it from a batch
    probe of the same path (schema-on-read, one footer read)."""
    path = f"{sf_dir}/{table}.parquet"
    if os.path.isfile(path):
        d = _SYMLINK_DIRS.get(path)
        if d is None:
            d = tempfile.mkdtemp(prefix=f"{table}_stream_")
            os.symlink(path, os.path.join(d, f"{table}.parquet"))
            _SYMLINK_DIRS[path] = d
        path = d
    _record_source_bytes(path)
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def events_stream(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over the events parquet directory.

    Streaming reads need a declared schema; we take it from a batch
    probe of the same path (schema-on-read, one footer read). With
    ``max_files_per_trigger`` the availableNow run is split into
    multiple micro-batches — used by tests to prove state survives
    batch boundaries."""
    path = f"{sf_dir}/events.parquet"
    if os.path.isfile(path):
        # FileStreamSource monitors a directory; testdata ships a single
        # file, so expose it through a symlinked temp dir (no copy).
        # Cached per source path — callers invoke this many times per
        # session and each mkdtemp would otherwise leak.
        d = _SYMLINK_DIRS.get(path)
        if d is None:
            d = tempfile.mkdtemp(prefix="events_stream_")
            os.symlink(path, os.path.join(d, "events.parquet"))
            _SYMLINK_DIRS[path] = d
        path = d
    # same ts normalization as the batch loader (io.load_table) so both
    # surfaces agree on instants and type (TimestampType — watermarks
    # and dropDuplicatesWithinWatermark reject TIMESTAMP_NTZ)
    from aggregation_duckdb_spark.io import (ensure_nanos_as_long,
                                             normalize_event_ts)
    ensure_nanos_as_long(spark)
    _record_source_bytes(path)
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return normalize_event_ts(reader.parquet(path))


def tumbling_counts_stream(events: DataFrame, width: str = "1 hour",
                           watermark: str = "2 hours", ts_col: str = "ts",
                           type_col: str = "event_type",
                           value_col: str = "value") -> DataFrame:
    """Streaming tumbling windows: per (window, event_type) counts and
    value sums, state bounded by the watermark."""
    # group by the window column ITSELF: projecting .start into the
    # grouping key strips the watermark metadata, and with it state
    # eviction (append mode would even fail analysis)
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), width), F.col(type_col))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col(value_col).cast("decimal(18,3)")).cast("double")
                  .alias("sum_value"))
            .select(F.col("window.start").alias("window_start"), type_col,
                    "n_events", "sum_value"))


def sliding_counts_stream(events: DataFrame, width: str = "1 hour",
                          slide: str = "30 minutes", watermark: str = "2 hours",
                          ts_col: str = "ts",
                          type_col: str = "event_type") -> DataFrame:
    """Streaming sliding windows (width/slide buckets per event)."""
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), width, slide), F.col(type_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("window.start").alias("window_start"), type_col,
                    "n_events"))


def session_windows_stream(events: DataFrame, gap_minutes: int = 30,
                           watermark: str = "2 hours", ts_col: str = "ts",
                           user_col: str = "user_id") -> DataFrame:
    """Gap-based sessions via the native ``session_window`` operator —
    the streaming twin of the batch lag/cumsum islands in
    ``operators.events.sessionize``.

    Session merge rule: an event extends a session iff it arrives
    strictly less than ``gap`` after the previous event (Spark merges
    when next.start < prev.end, end = ts + gap). We report the
    *event-time* extent (min/max ts), not the gap-padded window end,
    so results are directly comparable with the batch form."""
    win = F.session_window(F.col(ts_col), f"{gap_minutes} minutes")
    return (events
            .withWatermark(ts_col, watermark)
            .groupBy(F.col(user_col), win)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"))
            .drop("session_window"))


def dedup_stream(events: DataFrame, keys: list[str] | None = None,
                 ts_col: str = "ts",
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming deduplication with BOUNDED state: keep the first row
    per key, dropping re-deliveries that arrive within the watermark
    horizon (`dropDuplicatesWithinWatermark`). Unlike plain
    ``dropDuplicates``, seen-key state is evicted once the watermark
    passes — the operator runs forever on an unbounded at-least-once
    source without growing state, the shape a 100 TB ingest pipeline
    needs. Exactly-once dedup of arbitrarily-late duplicates is
    impossible with finite state; the watermark IS the contract."""
    # dropDuplicatesWithinWatermark requires a TimestampType event-time
    # column (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on TIMESTAMP_NTZ);
    # defensive for callers that didn't come through events_stream
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (events.withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys or ["event_id"]))


def stream_stream_time_join(left: DataFrame, right: DataFrame,
                            key: str = "user_id", ts_col: str = "ts",
                            id_col: str = "event_id",
                            lookback: str = "1 hour",
                            watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner join: left events matched to right events of
    the same key within [left.ts − lookback, left.ts].

    Both sides carry watermarks and the join has a time-interval
    condition — the two requirements that let Spark bound each side's
    join state (a right row can be evicted once the watermark passes
    its ts + lookback). Without them a stream-stream join would buffer
    forever; this is the canonical bounded-state shape.
    """
    l = left.select(F.col(key).alias("l_key"),
                    F.col(ts_col).alias("l_ts"),
                    F.col(id_col).alias("l_event_id")) \
        .withWatermark("l_ts", watermark)
    r = right.select(F.col(key).alias("r_key"),
                     F.col(ts_col).alias("r_ts"),
                     F.col(id_col).alias("r_event_id")) \
        .withWatermark("r_ts", watermark)
    cond = ((F.col("l_key") == F.col("r_key"))
            & (F.col("r_ts") <= F.col("l_ts"))
            & (F.col("r_ts") >= F.col("l_ts") - F.expr(f"INTERVAL {lookback}")))
    return (l.join(r, cond, "inner")
            .select(F.col("l_key").alias(key), "l_event_id", "l_ts",
                    "r_event_id", "r_ts"))


def run_available_now(result: DataFrame, output_mode: str = "complete") -> DataFrame:
    """Run a (finite-source) streaming DataFrame to completion and
    return the materialized result as a batch DataFrame.

    availableNow trigger → memory sink: processes everything currently
    in the source (possibly as several micro-batches), then stops. The
    memory sink holds the final state for ``complete`` mode, or the
    union of emitted rows for ``append``/``update``."""
    name = f"stream_result_{uuid.uuid4().hex}"
    spark = result.sparkSession
    # scale-adaptive state partitioning (see module section above):
    # the conf is read once at query start and frozen into the
    # checkpoint; set it for the drain, restore after termination so
    # batch queries in the session keep their configured width.
    n_parts = _drain_shuffle_partitions(spark)
    if n_parts is not None:
        try:
            plan = result._jdf.queryExecution().analyzed().toString()
            par = spark.sparkContext.defaultParallelism
        except Exception:
            plan, par = "", None
        if par is not None and ("InPandas" in plan
                                or "Python" in plan
                                or "InArrow" in plan):
            # Python-operator drains (applyInPandasWithState etc.) are
            # per-row PYTHON-compute-bound, not state-store-bound:
            # squeezing them to byte-derived widths serializes the
            # pandas work on one worker, while full session width pays
            # a python worker + state commit per partition. Width
            # sweep at sf0.1 (3 interleaved reps): attribution drain
            # 4.6 s @1 / 1.2-1.9 s @8 / 1.4-1.9 s @32; dau drain
            # 0.8-1.0 s @8 / 1.4-1.5 s @32 — floor at min(par, 8);
            # bigger sources scale through the bytes term as usual.
            n_parts = max(n_parts, min(par, 8))
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if n_parts is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        q = (result.writeStream
             .format("memory")
             .queryName(name)
             .outputMode(output_mode)
             .trigger(availableNow=True)
             .start())
        q.awaitTermination()
    finally:
        if n_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    # detach from the memory sink: checkpoint a copy and drop the view,
    # otherwise every invocation pins its full result (plus a dead
    # query handle) in the driver for the session lifetime
    out = materialize(spark.table(name))
    spark.catalog.dropTempView(name)
    return out
