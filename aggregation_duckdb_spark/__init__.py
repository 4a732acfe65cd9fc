"""aggregation_duckdb_spark — a PySpark-native hierarchical-aggregation engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference workload ``prmoore77/Aggregation-DuckDB``
(an adjacency-list product hierarchy flattened by recursive CTEs into a
reporting dimension and an ancestor/descendant closure table, then
aggregated two equivalent ways), re-expressed Spark-first:

- hierarchy flattening via driver-side breadth-first iteration over
  DataFrame joins (Spark has no recursive CTE below 4.0; on 4.x a native
  ``WITH RECURSIVE`` fast path exists) — see ``hierarchy/``
- aggregation via a broadcast closure-join + ordinary ``groupBy`` (the
  scale path) and via ``rollup()`` + ``grouping()`` (the pivoted path)
  — see ``operators/aggregate.py``
- everything declarative DataFrame/SQL so Catalyst handles pushdown,
  pruning, join strategy, and AQE picks physical plans at runtime.

Beyond reference parity, ``operators/`` adds the large-scale
training-data-pipeline surface: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding-cosine), similarity search,
text analysis, event-time bucketing, and multimodal column plumbing.

Reference semantics are cited throughout as
``aggregation_example.sql:line`` (under /root/reference/).
"""

from aggregation_duckdb_spark.session import get_spark
from aggregation_duckdb_spark.io import load_table, load_tables, register_views
from aggregation_duckdb_spark.hierarchy import Hierarchy

__all__ = [
    "get_spark",
    "load_table",
    "load_tables",
    "register_views",
    "Hierarchy",
]

__version__ = "0.1.0"
