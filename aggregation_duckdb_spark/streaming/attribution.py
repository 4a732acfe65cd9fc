"""Streaming last-touch attribution: per-user touch state across
micro-batches.

The batch form (``events.attribution``) is a fill-forward window; the
streaming form keeps each user's LATEST touch (ts, channel) as keyed
state and emits every conversion row with its attributed channel the
moment its micro-batch is processed — the always-on twin of the same
question, with O(1) state per user (one struct: you cannot attribute
with less, and never more — history is not retained).

Ordering contract: rows are attributed in (ts, event_id) order WITHIN
each micro-batch, and state carries the latest touch forward BETWEEN
batches — so the stream equals the batch answer whenever batches are
time-ordered per user (true for replayed logs and for event-time-
ordered ingestion; a production deployment with late cross-batch
arrivals would add a watermark-bounded reorder buffer first, the
standard trade). The multi-batch equivalence is pytest-pinned.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType)

STATE_SCHEMA = StructType([
    StructField("touch_us", LongType()),
    StructField("channel", StringType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("channel", StringType()),
    StructField("value", DoubleType()),
    StructField("lag_us", LongType()),
])


def _make_update(conversion_type: str, touch_types: tuple,
                 lookback_us: int):
    touches = set(touch_types)

    def update(key: tuple, pdfs: Iterable[pd.DataFrame],
               state: Any) -> Iterator[pd.DataFrame]:
        touch_us, channel = state.get if state.exists else (None, None)
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for ts_us, event_id, etype, value in zip(
                    pdf["ts_us"], pdf["event_id"], pdf["event_type"],
                    pdf["value"]):
                if etype in touches:
                    touch_us, channel = int(ts_us), str(etype)
                elif etype == conversion_type:
                    if touch_us is not None and \
                            int(ts_us) - touch_us <= lookback_us:
                        out.append((int(key[0]), int(event_id), channel,
                                    float(value), int(ts_us) - touch_us))
                    else:
                        out.append((int(key[0]), int(event_id), "none",
                                    float(value), None))
        if touch_us is not None:
            state.update((touch_us, channel))
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA])

    return update


def attribution_stream(events: DataFrame,
                       conversion_type: str = "purchase",
                       touch_types: tuple = ("click", "view"),
                       lookback_days: int = 7,
                       user_col: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id",
                       type_col: str = "event_type",
                       value_col: str = "value") -> DataFrame:
    """Per-conversion attributed rows as a streaming DataFrame
    (update mode; each conversion is emitted exactly once, in the
    batch that carries it)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(type_col).alias("event_type"),
        F.col(value_col).cast("double").alias("value"))
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_update(conversion_type, tuple(touch_types),
                             lookback_days * 86_400_000_000),
                OUTPUT_SCHEMA, STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
