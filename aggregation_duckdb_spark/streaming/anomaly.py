"""Streaming anomaly detection over a metric stream: prequential
z-scores from per-key running moments.

The batch twin (``operators/events.py hourly_anomalies``) scores every
hour against the WHOLE history's moments; an alerting stream can't see
the future, so the honest streaming semantic is PREQUENTIAL: each
arriving (key, bucket, count) row is scored against the moments of the
rows that came before it, then folded into the state. Same exact-math
discipline as the batch op: state is (n, Σc, Σc²) in int64 — integer
folds commute and survive the state store bit-exactly; the
mean/variance/sqrt happen per emission from exact inputs.

State is three longs per key — model-sized. The first two observations
of a key emit z = NULL (variance undefined); a zero-variance history
emits NULL too (any deviation would be infinitely surprising — flag
decisions on constant histories belong to the caller).
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BooleanType, DoubleType, LongType,
                               StructField, StructType, TimestampType)

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("s", LongType()),
    StructField("ss", LongType()),
])

def _output_schema(key_type) -> StructType:
    # key passes through untouched — carry its actual type so non-string
    # metric keys (long ids, dates) don't crash applyInPandasWithState
    return StructType([
        StructField("event_type", key_type),
        StructField("window_start", TimestampType()),
        StructField("n_events", LongType()),
        StructField("z", DoubleType()),
        StructField("flagged", BooleanType()),
    ])


def _make_update(z_threshold: float):
    def update(key: tuple, pdfs: Iterable[pd.DataFrame],
               state: Any) -> Iterator[pd.DataFrame]:
        n, s, ss = state.get if state.exists else (0, 0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("window_start")
        out = []
        for w, c in zip(pdf["window_start"], pdf["n_events"]):
            c = int(c)
            z = None
            if n >= 2:
                mean = s / n
                var = (ss - s * s / n) / (n - 1)
                if var > 0:
                    z = (c - mean) / math.sqrt(var)
            out.append((key[0], w, c, z,
                        z is not None and abs(z) >= z_threshold))
            n, s, ss = n + 1, s + c, ss + c * c
        state.update((n, s, ss))
        yield pd.DataFrame(out, columns=["event_type", "window_start",
                                         "n_events", "z", "flagged"])

    return update


def anomaly_stream(hourly: DataFrame, z_threshold: float = 2.0,
                   type_col: str = "event_type",
                   ts_col: str = "window_start",
                   count_col: str = "n_events") -> DataFrame:
    """Prequential anomaly flags over a stream of (key, bucket, count)
    rows — e.g. the output of an upstream tumbling-count aggregation
    replayed from storage, or any metric feed. Rows must arrive in
    bucket-time order across micro-batches (the metric-feed contract);
    within a batch they are sorted.

    Timeout: none — moments accumulate for the key's lifetime; a
    production variant would decay or window the moments (EWMA state
    fits the same three-scalars-per-key shape)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = hourly.select(
        F.col(type_col).alias("event_type"),
        F.col(ts_col).alias("window_start"),
        F.col(count_col).cast("long").alias("n_events"))
    out_schema = _output_schema(hourly.schema[type_col].dataType)
    return (prepared
            .groupBy("event_type")
            .applyInPandasWithState(
                _make_update(z_threshold), out_schema, STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
