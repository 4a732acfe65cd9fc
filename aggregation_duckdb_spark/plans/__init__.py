"""Physical-plan inspection and assertions.

The reference inherits its optimizer wholesale from DuckDB (SURVEY §4);
our equivalent discipline is *checking* that Catalyst produced the plan
we designed for: dims broadcast, filters and projections pushed into
the parquet scan, hot paths inside whole-stage codegen, no
row-at-a-time Python in the data path. These helpers make those
properties unit-testable so a regression that silently turns a
broadcast join into a 100 TB shuffle fails CI instead of the cluster.
"""

from aggregation_duckdb_spark.plans.inspect import (
    assert_broadcast_join, assert_max_shuffles, assert_no_nested_loop_join,
    assert_no_row_python_udf, assert_pushed_filters, assert_read_schema_only,
    assert_whole_stage_codegen, count_shuffles, physical_plan)

__all__ = [
    "physical_plan", "count_shuffles", "assert_broadcast_join",
    "assert_max_shuffles", "assert_no_nested_loop_join",
    "assert_no_row_python_udf", "assert_pushed_filters",
    "assert_read_schema_only", "assert_whole_stage_codegen",
]
