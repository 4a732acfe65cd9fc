"""Structured Streaming surface.

The reference has no streaming operators (SURVEY §2.9) — this module is
part of the north-star extension set: the same event-time semantics as
``operators/events.py``, expressed streaming-native so they run
unbounded with bounded state (watermarks), and a custom stateful
operator built on ``applyInPandasWithState``.

Every pipeline here is also runnable as a *finite* job via
``run_available_now`` (file source → availableNow trigger → memory
sink), which is how the driver oracle-checks streaming results against
DuckDB SQL.
"""

from aggregation_duckdb_spark.streaming.event_time import (
    dedup_stream, events_stream, run_available_now,
    session_windows_stream, sliding_counts_stream, table_stream,
    tumbling_counts_stream)
from aggregation_duckdb_spark.streaming.anomaly import anomaly_stream
from aggregation_duckdb_spark.streaming.funnel import funnel_stream
from aggregation_duckdb_spark.streaming.near_dedup import (
    near_dedup_stream, signature_buckets)
from aggregation_duckdb_spark.streaming.sinks import (
    read_sink, run_dedup_ingest, run_text_index_ingest,
    run_to_parquet_exactly_once,
    run_zordered_ingest,
    write_batch_idempotent)
from aggregation_duckdb_spark.streaming.change_feed import (
    read_change_feed, run_change_feed)
from aggregation_duckdb_spark.streaming.stream_read import (
    read_table_stream, run_table_stream)
from aggregation_duckdb_spark.streaming.stateful import running_user_totals
from aggregation_duckdb_spark.streaming.attribution import (
    attribution_stream)
from aggregation_duckdb_spark.streaming.dau import dau_stream

__all__ = [
    "dedup_stream", "events_stream", "run_available_now",
    "session_windows_stream", "sliding_counts_stream", "table_stream",
    "tumbling_counts_stream", "running_user_totals",
    "near_dedup_stream", "signature_buckets", "funnel_stream",
    "anomaly_stream", "attribution_stream", "dau_stream",
    "read_sink", "run_to_parquet_exactly_once", "write_batch_idempotent",
    "run_zordered_ingest", "run_dedup_ingest", "run_text_index_ingest",
    "run_change_feed", "read_change_feed",
    "run_table_stream", "read_table_stream",
]
