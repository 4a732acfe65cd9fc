"""CSV / JSON connectors, schema-explicit.

Schema inference reads the data twice and guesses types — both wrong
at scale. Every reader here takes an explicit schema (or a sample-one
escape hatch for interactive use). The CSV sink mirrors the
reference's only export artifact
(results/product_reporting_dim_table_contents.csv).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(spark: SparkSession, path: str, schema: StructType | str,
             header: bool = True, **options) -> DataFrame:
    """CSV scan with a declared schema — no inference pass, bad rows
    land in the permissive-mode corrupt-record column unless callers
    pick a stricter mode."""
    return (spark.read.options(header=header, **options)
            .schema(schema).csv(path))


def read_json(spark: SparkSession, path: str, schema: StructType | str,
              **options) -> DataFrame:
    """JSON-lines scan with a declared schema. Column pruning works
    through the JSON reader when the schema is explicit."""
    return spark.read.options(**options).schema(schema).json(path)


def write_csv_dir(df: DataFrame, path: str, single_file: bool = False,
                  mode: str = "overwrite") -> None:
    """CSV export (reference S6). ``single_file`` coalesces to one
    task — only for dim-sized results; fact-sized exports keep their
    parallelism and produce a file per partition."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", True).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines export; keeps nested struct/array columns intact
    (the reporting dim's node_json/path columns round-trip)."""
    df.write.mode(mode).json(path)
