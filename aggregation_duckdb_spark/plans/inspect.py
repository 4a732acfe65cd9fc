"""Plan-string helpers built on EXPLAIN output.

All checks read the *physical* plan (post-AQE-compile, pre-execution).
AQE can still re-plan at runtime — these assertions pin the static
strategy; runtime behavior is covered by the bench.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    """EXPLAIN output as a string (df.explain prints; we capture)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def count_shuffles(df: DataFrame) -> int:
    """Number of shuffle exchanges (broadcast exchanges excluded —
    broadcasting a dim is the cheap path, not a shuffle)."""
    plan = physical_plan(df, "simple")
    return len(re.findall(r"Exchange (?!SinglePartition)(?:range|hash)partitioning",
                          plan))


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    got = count_shuffles(df)
    if got > n:
        raise AssertionError(
            f"plan has {got} shuffle exchanges, budget is {n}:\n"
            + physical_plan(df, "simple"))


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    """The join strategy for dim-sized sides must be broadcast-hash —
    a sort-merge join here means the big side shuffles."""
    plan = physical_plan(df, "simple")
    got = plan.count("BroadcastHashJoin")
    if got < at_least:
        raise AssertionError(
            f"expected >= {at_least} BroadcastHashJoin, found {got}:\n" + plan)


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Each fragment must appear in a scan's PushedFilters list —
    i.e. the predicate reaches the parquet reader (row-group skipping),
    not just a Filter node above the scan."""
    plan = physical_plan(df, "formatted")
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    for frag in fragments:
        if frag not in pushed:
            raise AssertionError(
                f"filter {frag!r} not pushed to scan; pushed = {pushed}")


def assert_read_schema_only(df: DataFrame, table_fragment: str,
                            allowed_cols: set[str]) -> None:
    """Column pruning: the scan matching ``table_fragment`` must read a
    subset of ``allowed_cols`` — a wider ReadSchema means dead columns
    cross the I/O boundary."""
    plan = physical_plan(df, "formatted")
    for scan in re.finditer(
            r"file:[^\n]*" + re.escape(table_fragment)
            + r"[^\n]*\n(?:[^\n]*\n)*?[^\n]*ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in scan.group(1).split(",") if c}
        extra = cols - allowed_cols
        if extra:
            raise AssertionError(
                f"scan of {table_fragment} reads unpruned columns {extra}")


def assert_whole_stage_codegen(df: DataFrame) -> None:
    """Hot expressions must sit inside a WholeStageCodegen span.
    Under AQE the pre-execution plan hides codegen annotation
    (isFinalPlan=false), so compile once with AQE off to inspect."""
    conf = df.sparkSession.conf
    prev = conf.get("spark.sql.adaptive.enabled")
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        # df.select("*"): queryExecution is memoized per Dataset, so a
        # prior explain under AQE would otherwise be returned verbatim
        plan = physical_plan(df.select("*"), "simple")
    finally:
        conf.set("spark.sql.adaptive.enabled", prev)
    if "*(" not in plan:
        raise AssertionError("no WholeStageCodegen stage in plan:\n" + plan)


def assert_no_nested_loop_join(df: DataFrame) -> None:
    """Theta/cross joins plan as BroadcastNestedLoopJoin or
    CartesianProduct — O(N·M) row comparisons, the signature of an
    accidental all-pairs path. Candidate-generation plans (LSH, IVF)
    must pair via equi-joins only."""
    plan = physical_plan(df, "simple")
    for node in ("BroadcastNestedLoopJoin", "CartesianProduct"):
        if node in plan:
            raise AssertionError(f"{node} in plan (all-pairs path):\n" + plan)


def assert_no_row_python_udf(df: DataFrame) -> None:
    """Row-at-a-time scalar Python (BatchEvalPython) is banned in the
    data path; Arrow-vectorized forms (ArrowEvalPython, MapInPandas,
    FlatMapGroupsInPandas) and table functions (BatchEvalPythonUDTF —
    a deliberate generator, not a scalar hot loop) are the sanctioned
    escape hatches."""
    plan = physical_plan(df, "simple")
    if re.search(r"BatchEvalPython(?!UDTF)", plan):
        raise AssertionError("row-wise Python UDF in plan:\n" + plan)
