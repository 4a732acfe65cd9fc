"""Hierarchy engine: adjacency list → reporting dim + closure table.

Re-implements the reference's two recursive-CTE flattenings
(aggregation_example.sql:86-204 reporting dim, :351-425 closure) as
driver-side breadth-first iteration over DataFrame joins — the portable
Spark-native equivalent of ``WITH RECURSIVE`` (native on Spark 4.x; the
loop keeps per-level materialization control and works on 3.x).
"""

from aggregation_duckdb_spark.hierarchy.core import Hierarchy, HierarchyConfig

__all__ = ["Hierarchy", "HierarchyConfig"]
