"""Streaming funnel detection: per-user ordered-step state machines.

The batch form (``operators/events.py funnel_steps``) computes
greedy-earliest step times with k grouped join rounds. On an unbounded
stream the same semantics become a PER-USER STATE MACHINE: the state
is the list of step times achieved so far; each micro-batch's events
for a user are folded in event-time order, and an event advances the
machine iff it is the next step's type and strictly later than the
previous step's chosen time. Folding in-order makes the streaming
result identical to the batch greedy-earliest answer whenever events
arrive in event-time order across batches (the ingest contract; a
late event that predates an already-taken decision is ignored — state
never rolls back).

Scale shape: shuffle on the user key only; state is at most k
timestamps per user — constant-size, like the running-totals operator.
Emits one row per (user, batch); the latest row per user is the
current funnel position. Declared append-mode (each yield is a final
progress record) so it composes with the exactly-once foreachBatch
parquet sink.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BooleanType, LongType,
                               StructField, StructType)

STATE_SCHEMA = StructType([
    StructField("step_times", ArrayType(LongType())),
])

def _output_schema(user_type) -> StructType:
    # the key column passes through the state machine untouched, so the
    # output schema must carry its ACTUAL type — a hardcoded LongType
    # would crash applyInPandasWithState for string/uuid user keys
    return StructType([
        StructField("user_id", user_type),
        StructField("steps_completed", LongType()),
        StructField("converted", BooleanType()),
        StructField("step_times", ArrayType(LongType())),
    ])


def _make_update(steps: list[str]):
    k = len(steps)

    def update(key: tuple, pdfs: Iterable[pd.DataFrame],
               state: Any) -> Iterator[pd.DataFrame]:
        times: list[int] = list(state.get[0]) if state.exists else []
        # concatenate BEFORE sorting: a large group may arrive as
        # several Arrow chunks, and per-chunk order is not event order
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts_us", "event_id"])
        for t, typ in zip(pdf["ts_us"], pdf["event_type"]):
            if (len(times) < k and typ == steps[len(times)]
                    and (not times or int(t) > times[-1])):
                times.append(int(t))
        state.update((times,))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "steps_completed": [len(times)],
            "converted": [len(times) == k],
            "step_times": [times],
        })

    return update


def funnel_stream(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  id_col: str = "event_id",
                  type_col: str = "event_type") -> DataFrame:
    """Streaming twin of ``funnel_steps``: greedy-earliest ordered
    funnels maintained as per-user state across micro-batches.

    Timeout: none — funnels accumulate until conversion. A production
    variant would add a GroupStateTimeout to expire users idle past
    the conversion-window SLA (bounding state to active users)."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = events.select(
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("event_type"))
    out_schema = _output_schema(events.schema[user_col].dataType)
    return (prepared
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_update(steps), out_schema, STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
