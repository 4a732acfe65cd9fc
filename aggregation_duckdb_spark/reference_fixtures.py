"""The reference's exact seed data as DataFrames (F-REF fixtures).

product_nodes: aggregation_example.sql:18-53 (7 nodes, 3 levels).
sales_facts:   :220-298 (8 rows). The reference resolves parent/product
ids with scalar subqueries inside INSERT…VALUES — Spark can't (SURVEY
§2.1 S3), so seeds carry natural keys and the Hierarchy engine
generates surrogate ids (deterministic md5 by default).
"""

from __future__ import annotations

import datetime
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (BooleanType, DateType, DecimalType, IntegerType,
                               LongType, StringType, StructField, StructType)

from aggregation_duckdb_spark.hierarchy import Hierarchy

# (natural_key, name, level_name, parent_natural_key) — :18-53
PRODUCT_NODES = [
    (0, "All Products", "Total Products", None),
    (10, "Produce", "Category", 0),
    (101, "Spinach", "UPC", 10),
    (102, "Tomatoes", "UPC", 10),
    (20, "Candy", "Category", 0),
    (201, "Hershey Bar", "UPC", 20),
    (202, "Nerds", "UPC", 20),
]

# (product_id, customer_id, date_id, unit_quantity, sales_amount) — :220-298
SALES_FACTS = [
    (201, "Phil", datetime.date(2022, 1, 1), Decimal("1"), Decimal("3.00")),
    (201, "Lottie", datetime.date(2022, 1, 2), Decimal("5"), Decimal("15.00")),
    (202, "Kalie", datetime.date(2022, 1, 2), Decimal("2"), Decimal("5.00")),
    (102, "Phil", datetime.date(2022, 1, 2), Decimal("2"), Decimal("2.00")),
    (101, "Popeye", datetime.date(2022, 1, 3), Decimal("10"), Decimal("5.00")),
    (101, "Brutus", datetime.date(2022, 1, 4), Decimal("1"), Decimal("0.50")),
    (101, "Lottie", datetime.date(2022, 1, 4), Decimal("1"), Decimal("0.50")),
    (101, "Phil", datetime.date(2022, 1, 5), Decimal("2"), Decimal("2.00")),
]


def product_nodes_df(spark: SparkSession) -> DataFrame:
    schema = StructType([
        StructField("natural_key", LongType(), False),
        StructField("name", StringType(), False),
        StructField("level_name", StringType(), False),
        StructField("parent_natural_key", LongType(), True),
    ])
    return spark.createDataFrame(PRODUCT_NODES, schema)


def sales_facts_df(spark: SparkSession) -> DataFrame:
    # NUMERIC in DuckDB defaults to DECIMAL(18,3) (SURVEY §1.2)
    schema = StructType([
        StructField("product_id", IntegerType(), False),
        StructField("customer_id", StringType(), False),
        StructField("date_id", DateType(), False),
        StructField("unit_quantity", DecimalType(18, 3), False),
        StructField("sales_amount", DecimalType(18, 3), False),
    ])
    return spark.createDataFrame(SALES_FACTS, schema)


def product_hierarchy(spark: SparkSession, deterministic_ids: bool = True) -> Hierarchy:
    return Hierarchy.from_adjacency(
        product_nodes_df(spark),
        natural_key="natural_key", name="name", level_name="level_name",
        parent_natural_key="parent_natural_key",
        deterministic_ids=deterministic_ids)


# Golden aggregate (FIXTURES.md F-REF-4; hand-computed from :220-298):
# (natural_key, name, level_name, level, sum_sales, sum_qty, distinct_cust, n_facts)
GOLDEN_AGGREGATE = [
    (0, "All Products", "Total Products", 1, Decimal("33.00"), Decimal("24"), 5, 8),
    (10, "Produce", "Category", 2, Decimal("10.00"), Decimal("16"), 4, 5),
    (101, "Spinach", "UPC", 3, Decimal("8.00"), Decimal("14"), 4, 4),
    (102, "Tomatoes", "UPC", 3, Decimal("2.00"), Decimal("2"), 1, 1),
    (20, "Candy", "Category", 2, Decimal("23.00"), Decimal("8"), 3, 3),
    (201, "Hershey Bar", "UPC", 3, Decimal("18.00"), Decimal("6"), 2, 2),
    (202, "Nerds", "UPC", 3, Decimal("5.00"), Decimal("2"), 1, 1),
]
