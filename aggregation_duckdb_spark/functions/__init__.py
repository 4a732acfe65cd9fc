"""Scalar function surface — the reference's F1–F12 (SURVEY §2.7) as
reusable Column helpers with the DuckDB↔Spark semantic edges resolved.
"""

from aggregation_duckdb_spark.functions.scalars import (
    array_append_compat, date_lit, element_at_1based, indent, path_sort_key,
    sql_concat, struct_literal, uuid_col)

__all__ = ["array_append_compat", "date_lit", "element_at_1based", "indent",
           "path_sort_key", "sql_concat", "struct_literal", "uuid_col"]
