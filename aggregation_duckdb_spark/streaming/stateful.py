"""Custom stateful streaming operator via ``applyInPandasWithState``.

The pattern the built-in windows can't express: arbitrary per-key
state evolved across micro-batches (running counters, sketches,
session machines with custom logic). State lives in Spark's state
store keyed by the group key; each micro-batch hands the operator the
key's new rows as Arrow batches plus its prior state.

Scale shape: the shuffle is on the group key (same as any groupBy);
state size is O(distinct keys), not O(events) — the operator must keep
per-key state constant-size, as here (three scalars per user).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    # running sum in exact milli units (value is decimal(18,3)-shaped):
    # integer accumulation is order-independent; descaled to a double
    # only at emit
    StructField("sum_millis", LongType()),
    StructField("n_batches", LongType()),
])

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
    StructField("n_batches", LongType()),
])


def _update_totals(key: tuple, pdfs: Iterable[pd.DataFrame],
                   state: Any) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into running totals.

    Emits the updated totals once per (key, batch) — update-mode
    consumers see a monotone sequence per key; the final row is the
    answer. Value sums round to 3 decimals at emit so the result is
    reproducible as decimal math in the oracle."""
    n, sum_millis, b = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # values arrive as decimal(18,3)-compatible doubles; sum in
        # exact milli-unit integer space to stay order-independent
        sum_millis += int(round(pdf["value"].astype(float).mul(1000).sum()))
    state.update((n, sum_millis, b + 1))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "sum_value": [sum_millis / 1000.0],
                        "n_batches": [b + 1]})


def running_user_totals(events: DataFrame, user_col: str = "user_id",
                        value_col: str = "value") -> DataFrame:
    """Per-user running (count, sum) maintained across micro-batches.

    Timeout: none — totals are cumulative forever. A production
    variant with idle-key eviction would set GroupStateTimeout and an
    expiry; kept minimal so the semantics stay oracle-checkable."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = events.select(user_col, value_col)
    return (prepared
            .groupBy(user_col)
            .applyInPandasWithState(
                _update_totals, OUTPUT_SCHEMA, STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
