"""Scalar surface (reference F1–F12): the DuckDB semantic edges each
helper exists to pin down."""

from __future__ import annotations

from pyspark.sql import functions as F

from aggregation_duckdb_spark.functions import (
    date_lit, element_at_1based, indent, path_sort_key, sql_concat,
    struct_literal, uuid_col)


def test_element_at_is_1based_and_null_oob(spark):
    df = spark.range(1).select(F.array(F.lit("a"), F.lit("b")).alias("arr"))
    row = df.select(
        element_at_1based(F.col("arr"), 1).alias("first"),
        element_at_1based(F.col("arr"), 3).alias("oob")).first()
    assert row["first"] == "a"      # 1-based, like DuckDB arr[1]
    assert row["oob"] is None       # NULL out of range (:188-201)


def test_indent_matches_reference_shape(spark):
    df = spark.range(1)
    row = df.select(
        indent(F.lit(1)).alias("root"),
        indent(F.lit(3)).alias("leaf")).first()
    assert row["root"] == ""            # LPAD('-', 0, '-') = ''
    assert row["leaf"] == "-" * 14      # (3-1)*7


def test_sql_concat_null_propagates(spark):
    row = spark.range(1).select(
        sql_concat(F.lit("a"), F.lit(None).cast("string")).alias("c")).first()
    assert row["c"] is None             # DuckDB || semantics


def test_struct_literal_field_order(spark):
    df = spark.range(1).select(
        struct_literal(node_id=F.lit("x"), level=F.lit(2)).alias("s"))
    assert df.schema["s"].dataType.names == ["node_id", "level"]


def test_path_sort_key_orders_dfs_preorder(spark):
    mk = lambda *keys: F.array(*[
        F.struct(F.lit(k).alias("node_natural_key")) for k in keys])
    df = spark.createDataFrame([(1,), (2,), (3,), (4,)], "i int").select(
        "i",
        F.when(F.col("i") == 1, mk(5)).when(F.col("i") == 2, mk(5, 2))
         .when(F.col("i") == 3, mk(5, 2, 9)).otherwise(mk(5, 7)).alias("p"))
    got = [r["i"] for r in
           df.orderBy(path_sort_key(F.col("p"))).collect()]
    # parent before subtree, siblings by key: 5 < 5/2 < 5/2/9 < 5/7
    assert got == [1, 2, 3, 4]


def test_uuid_and_date_literal(spark):
    row = spark.range(1).select(uuid_col().alias("u"),
                                date_lit("2022-01-01").alias("d")).first()
    assert len(row["u"]) == 36
    assert str(row["d"]) == "2022-01-01"
