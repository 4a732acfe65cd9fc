"""As-of (point-in-time) join — an operator Spark lacks natively.

``asof_join(left, right)``: for each left row, attach the most recent
right row whose time is at or before the left row's time, within a key
group. The canonical time-series/feature-store join (trades←quotes,
facts←dimension-state, events←config-at-time).

Spark-first implementation (global brief: composition of existing
DataFrame ops before UDFs): tag-union both sides, then one window pass
per key carrying the latest right-side values forward
(``last(..., ignoreNulls=True)`` over rows up to the current one).

Scale shape: ONE shuffle (on the key, to co-locate the window), no row
explosion, no range cross-product — both sides stream through the
window in time order. This beats the inequality-join formulation
(left ⋈ right ON key AND r.ts <= l.ts + max-per-left), which Spark
plans as a broadcast-nested-loop at O(|L|·|R|) per key. DuckDB's
native ``ASOF JOIN`` is the oracle.

Tie rule: a right row at exactly the left row's time IS visible
(<= semantics, matching DuckDB ``ON l.ts >= r.ts``); among right rows
at the same (key, time) the tiebreak column decides (latest wins),
keeping the operator deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, *, on: str, by: str,
              value_cols: list[str], suffix: str = "_asof",
              tiebreak: str | None = None) -> DataFrame:
    """Left as-of join: every left row, plus the latest
    ``right.value_cols`` state at-or-before ``left[on]`` within ``by``
    groups (NULL when no prior right row exists).

    ``tiebreak``: a right-side column ordering simultaneous right rows
    (the greatest wins); required for determinism if (by, on) is not
    unique on the right.
    """
    order_cols = [F.col(on), F.col("__side")]
    # SQL join semantics: a NULL key or NULL time on the right can
    # never match (l.key = r.key / l.ts >= r.ts are never true with
    # NULL) — drop such rows so the carry-forward window can't serve
    # them. Left rows with NULL key/time sort before any right state
    # (nulls first) and correctly receive NULL.
    r_sorted = right.where(F.col(by).isNotNull() & F.col(on).isNotNull())
    if tiebreak is not None:
        # keep only the winning right row per (by, on)
        w = Window.partitionBy(by, on).orderBy(F.col(tiebreak).desc())
        r_sorted = (r_sorted.withColumn("__rn", F.row_number().over(w))
                    .where(F.col("__rn") == 1).drop("__rn"))

    # Carry ONE struct per right row, not per-column values: the struct
    # is non-NULL for every right row even when its fields are NULL, so
    # (a) a genuinely NULL right value is reported as NULL rather than
    # skipped for a stale older value, and (b) all carried fields come
    # from the SAME right row — no cross-row mixing.
    r_struct_t = ", ".join(
        f"`{c}`:{dict(right.dtypes)[c]}" for c in value_cols)
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn(
        "__rstate", F.lit(None).cast(f"struct<{r_struct_t}>"))
    r_tagged = r_sorted.select(
        F.col(by), F.col(on), F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__rstate"))
    l_types = dict(l_tagged.dtypes)
    r_cols = set(r_tagged.columns)
    r_tagged = r_tagged.select(
        *r_tagged.columns,
        *[F.lit(None).cast(l_types[c]).alias(c)
          for c in l_tagged.columns if c not in r_cols])

    unioned = l_tagged.unionByName(r_tagged)
    # right rows (__side 0) sort before left rows at the same instant →
    # a same-timestamp right row is visible to the left row (<= rule)
    carry = (Window.partitionBy(by).orderBy(*order_cols)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn(
        "__rstate", F.last(F.col("__rstate"), ignorenulls=True).over(carry))
    out = carried.where(F.col("__side") == 1)
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__rstate").getField(c))
    return out.drop("__side", "__rstate")


def asof_nearest(left: DataFrame, right: DataFrame, *, on: str, by: str,
                 value_cols: list[str], suffix: str = "_near",
                 gap_col: str = "gap_us",
                 tiebreak: str | None = None) -> DataFrame:
    """Nearest-event join: for each left row, the right row minimizing
    ``|right.on - left.on|`` within the key group — EITHER direction
    (the sensor/log-alignment semantics; plain as-of only looks
    backward). Equidistant before/after ties go to the earlier
    (backward) row; simultaneous right rows resolve by ``tiebreak``
    (greatest wins), matching :func:`asof_join`.

    Two chained :func:`asof_join` window passes — backward on the time
    axis, forward on its negation — then an in-row argmin. Still ONE
    logical partitioning by the key (both windows and the final
    projection share it), no inequality join, no row explosion.
    ``on`` must be a timestamp (gap is reported in microseconds) and
    left must not already contain the temporary column names."""
    aug = value_cols if on in value_cols else [*value_cols, on]
    back = asof_join(left, right, on=on, by=by, value_cols=aug,
                     suffix="__b", tiebreak=tiebreak)
    neg = (-F.unix_micros(F.col(on))).alias("__negus")
    fwd = asof_join(back.withColumn("__negus", neg),
                    right.withColumn("__negus", neg),
                    on="__negus", by=by, value_cols=aug,
                    suffix="__f", tiebreak=tiebreak).drop("__negus")
    us = F.unix_micros(F.col(on))
    d_b = us - F.unix_micros(F.col(f"{on}__b"))
    d_f = F.unix_micros(F.col(f"{on}__f")) - us
    choose_b = d_f.isNull() | (d_b.isNotNull() & (d_b <= d_f))
    out = fwd
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(choose_b, F.col(f"{c}__b")).otherwise(F.col(f"{c}__f")))
    out = out.withColumn(gap_col, F.when(choose_b, d_b).otherwise(d_f))
    return out.drop(*[f"{c}__b" for c in aug], *[f"{c}__f" for c in aug])
