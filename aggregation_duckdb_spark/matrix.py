"""The driver oracle matrix: every implemented operator as a named
(spark_query, duckdb_oracle_sql) pair.

Each query callable takes ``(spark, sf_dir)`` and returns a DataFrame;
the paired SQL computes the identical result in DuckDB over the same
parquet tables. Determinism rules used throughout (so the driver's
order-insensitive value hash matches):

- every computed column aliased identically on both sides;
- double-typed measures summed as DECIMAL then cast to double
  (float summation order is engine-dependent; decimal addition exact);
- window/rank orderings always keyed on a unique column;
- hierarchy ordering keyed on natural-key paths (arrays compare
  lexicographically in both engines — verified), never UUIDs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from aggregation_duckdb_spark import flagship as fs
from aggregation_duckdb_spark.io import load_table

QueryFn = Callable[[SparkSession, DataFrame], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn
    return deco


# The round driver verifies the first 50 entries in dict order against
# their DuckDB oracles. ALL entries pass the same comparison locally
# (scripts/oracle_check.py runs the full set — keep it that way); this
# list only schedules WHICH entries get a driver-recorded row this
# round. Round-12 rotation, closing the round-11 verdict's items 1-2:
# the 44 entries whose newest driver evidence is round 8 (computed
# from CORRECTNESS_r06..r11 — the TPC-H family, the BM25 road,
# sim_pq_indexed, the events attribution/RFM/paths trio, the IO/
# bucketing/window-frame shapes), then q_zorder_merge and
# q_zorder_clone (registered round 11, first driver rows now — merge's
# code ALSO changed this round: null-safe insert anti-join + delta/
# tombstone composition), then the 4 round-12 entries for the
# round-11 library verbs: q_zorder_cdf_write (writer-side CDF,
# emit_changes=True + eager vacuum), q_zorder_time_layout
# (timestamp x key layout, datetime box read), q_zorder_count
# (metadata COUNT(*) across retained versions), q_zorder_maintain
# (auto-maintenance policy fold + no-op path).
# Next stale cohort after this round (schedule for round 13): the 48
# round-9-evidence entries, computed exactly from CORRECTNESS_r06..r11
# newest-green-evidence minus this window: asof_join_events
# emb_label_centroids events_conversion_lag events_sessionize
# events_sliding events_state_intervals events_tumbling
# events_user_gap_stats hier_agg_closure hier_agg_rollup hier_closure
# hier_closure_recursive hier_distinct_twostage hier_reporting_dim
# mm_resize pipeline_decontaminate pipeline_pii_scrub
# pipeline_quantile_filter pipeline_repetition pipeline_split_assign
# pipeline_stratified_sample q21_waiting_suppliers
# q_histogram_totalprice q_math_functions q_merge_upsert
# q_rolling_time_window q_zorder_box3d q_zorder_delete
# q_zorder_delete_keys q_zorder_pruning q_zorder_timetravel
# ref_parity_agg sim_pq_indexed_exact sim_topk_bruteforce
# source_python_datasource stream_dedup stream_sessionize
# stream_sliding stream_stateful_totals stream_stream_join
# stream_tumbling stream_zorder_ingest text_fingerprint
# text_language_id text_quality text_rolling_hash text_stats
# text_tfidf_topterms. 48 names + 2 free slots for round-13 changes
# (re-verify the list against CORRECTNESS_r12 at round-13 start).
# Claim the free slots for q_zorder_alter (metadata-only ALTER TABLE
# via column mapping) and stream_table_read (the Delta readStream
# analogue) — both registered round 12 after the window froze; if a
# round-13 code change needs a slot, it outranks these two, and
# q_zorder_merge_sync (WHEN NOT MATCHED BY SOURCE),
# q_zorder_generated (generated columns) and q_zorder_recluster
# (re-cluster verb), all round 12, queue right behind them.
# Exactly 50 names below.
_DRIVER_WINDOW_FIRST = [
    # newest driver evidence = round 8 (all 44):
    "q_anti_join", "q_order_limit", "q_set_ops", "q_scalar_functions",
    "q_date_functions", "q_percentiles", "q_exists_correlated",
    "q_string_agg", "q_pivot_status", "q3_shipping_priority",
    "q5_local_supplier_volume", "q10_returned_items",
    "q7_volume_shipping", "q_unpivot", "q_collections",
    "q_null_safety", "q_io_roundtrip", "q14_promo_effect",
    "q_window_frames", "q_bucketed_join", "q4_order_priority",
    "q6_revenue_forecast", "q9_profit_by_nation", "q12_priority_class",
    "q13_customer_distribution", "q16_supplier_counts",
    "q19_disjunctive_revenue", "q22_dormant_customers",
    "q2_min_cost_supplier", "q8_market_share", "q11_important_parts",
    "q15_top_supplier", "q17_small_qty_revenue", "q20_promo_suppliers",
    "events_topk_paths", "text_normalize", "text_bm25_search",
    "text_bm25_indexed", "text_bm25_stopterm",
    "pipeline_mixture_order", "events_attribution",
    "stream_attribution", "sim_pq_indexed", "events_rfm",
    # round-11 verbs awaiting first driver rows (merge also changed
    # this round: null-safe anti-join + delta/tombstone composition):
    "q_zorder_merge", "q_zorder_clone",
    # round-12 additions (driver rows for the round-11 library verbs):
    "q_zorder_cdf_write", "q_zorder_time_layout", "q_zorder_count",
    "q_zorder_maintain",
]


def _driver_order(d: dict) -> dict:
    first = [n for n in _DRIVER_WINDOW_FIRST if n in d]
    rest = [n for n in d if n not in set(first)]
    return {n: d[n] for n in (*first, *rest)}


def queries() -> dict[str, QueryFn]:
    # import for registration side effects
    from aggregation_duckdb_spark import (  # noqa: F401
        matrix_extensions, matrix_streaming, matrix_tpch)
    return _driver_order(_QUERIES)


def oracle_sql() -> dict[str, str]:
    from aggregation_duckdb_spark import (  # noqa: F401
        matrix_extensions, matrix_streaming, matrix_tpch)
    return _driver_order(_ORACLES)


# ---------------------------------------------------------------------
# Hierarchy core (reference parity on TPC-H geo hierarchy)
# ---------------------------------------------------------------------

register("hier_agg_closure", fs.flagship_oracle_sql())(fs.flagship_closure_agg)
# Strategy equivalence: the ROLLUP path must match the same oracle.
register("hier_agg_rollup", fs.flagship_oracle_sql())(fs.flagship_rollup_agg)
# Approx-distinct mode: rows-only (HLL estimates are engine-specific).
register("hier_agg_closure_approx")(fs.flagship_closure_agg_approx)


_GEO_DIM_ORACLE = f"""
WITH RECURSIVE nodes AS ({fs.GEO_NODES_SQL}),
levels AS (
    SELECT natural_key, name, level_name, parent_natural_key,
           1 AS level_number,
           [natural_key] AS path_keys, [name] AS path_names
    FROM nodes WHERE parent_natural_key IS NULL
    UNION ALL
    SELECT n.natural_key, n.name, n.level_name, n.parent_natural_key,
           l.level_number + 1,
           list_append(l.path_keys, n.natural_key),
           list_append(l.path_names, n.name)
    FROM nodes n JOIN levels l ON n.parent_natural_key = l.natural_key
)
SELECT l.natural_key AS node_natural_key,
       l.name AS node_name,
       l.level_name,
       l.level_number,
       (l.parent_natural_key IS NULL) AS is_root,
       (p.parent_natural_key IS NULL) AS is_leaf,
       ROW_NUMBER() OVER (ORDER BY l.path_keys ASC) AS node_sort_order,
       l.path_keys[1] AS level_1_node_natural_key, l.path_names[1] AS level_1_node_name,
       l.path_keys[2] AS level_2_node_natural_key, l.path_names[2] AS level_2_node_name,
       l.path_keys[3] AS level_3_node_natural_key, l.path_names[3] AS level_3_node_name
FROM levels l
LEFT JOIN (SELECT DISTINCT parent_natural_key FROM nodes
           WHERE parent_natural_key IS NOT NULL) p
       ON l.natural_key = p.parent_natural_key
ORDER BY node_sort_order
"""


@register("hier_reporting_dim", _GEO_DIM_ORACLE)
def hier_reporting_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reporting dim (aggregation_example.sql:86-204) on the geo
    hierarchy — deterministic columns only (no surrogate ids)."""
    dim = fs.geo_hierarchy(spark, sf_dir).reporting_dim(num_levels=3)
    cols = [
        F.col("node_natural_key"), F.col("node_name"), F.col("level_name"),
        F.col("level_number"), F.col("is_root"), F.col("is_leaf"),
        F.col("node_sort_order").cast("long").alias("node_sort_order"),
    ]
    for i in (1, 2, 3):
        cols.append(F.col(f"level_{i}_node_natural_key"))
        cols.append(F.col(f"level_{i}_node_name"))
    return dim.select(*cols).orderBy("node_sort_order")


_GEO_CLOSURE_ORACLE = f"""
WITH RECURSIVE nodes AS ({fs.GEO_NODES_SQL}),
levels AS (
    SELECT natural_key, name, level_name, 1 AS level_number,
           [natural_key] AS path_keys
    FROM nodes WHERE parent_natural_key IS NULL
    UNION ALL
    SELECT n.natural_key, n.name, n.level_name, l.level_number + 1,
           list_append(l.path_keys, n.natural_key)
    FROM nodes n JOIN levels l ON n.parent_natural_key = l.natural_key
),
closure AS (
    SELECT UNNEST(path_keys) AS ancestor_key,
           natural_key AS descendant_key,
           name AS descendant_node_name,
           level_number AS descendant_level_number
    FROM levels
)
SELECT a.natural_key AS ancestor_node_natural_key,
       a.name AS ancestor_node_name,
       a.level_name AS ancestor_level_name,
       a.level_number AS ancestor_level_number,
       c.descendant_key AS descendant_node_natural_key,
       c.descendant_node_name,
       c.descendant_level_number,
       c.descendant_level_number - a.level_number AS net_level
FROM closure c JOIN levels a ON c.ancestor_key = a.natural_key
ORDER BY ancestor_node_natural_key, descendant_node_natural_key
"""


@register("hier_closure", _GEO_CLOSURE_ORACLE)
def hier_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closure table (:351-425) on the geo hierarchy, natural keys only."""
    closure = fs.geo_hierarchy(spark, sf_dir).closure()
    return closure.select(
        "ancestor_node_natural_key", "ancestor_node_name",
        "ancestor_level_name",
        F.col("ancestor_level_number").cast("int").alias("ancestor_level_number"),
        "descendant_node_natural_key", "descendant_node_name",
        F.col("descendant_level_number").cast("int").alias("descendant_level_number"),
        F.col("net_level").cast("int").alias("net_level"),
    ).orderBy("ancestor_node_natural_key", "descendant_node_natural_key")


@register("hier_closure_recursive", _GEO_CLOSURE_ORACLE)
def hier_closure_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same closure via Spark 4's native WITH RECURSIVE (:353-403's
    literal construct) - the engine-internal twin of hier_closure;
    both sides of the oracle pair now run an actual recursive CTE."""
    closure = fs.geo_hierarchy(spark, sf_dir).closure_recursive_sql()
    return closure.select(
        "ancestor_node_natural_key", "ancestor_node_name",
        "ancestor_level_name",
        F.col("ancestor_level_number").cast("int").alias("ancestor_level_number"),
        "descendant_node_natural_key", "descendant_node_name",
        F.col("descendant_level_number").cast("int").alias("descendant_level_number"),
        F.col("net_level").cast("int").alias("net_level"),
    ).orderBy("ancestor_node_natural_key", "descendant_node_natural_key")


# ---------------------------------------------------------------------
# Reference seed-data parity (the golden 7-row answer, as an oracle pair)
# ---------------------------------------------------------------------

_REF_NODES_VALUES = """
    SELECT * FROM (VALUES
        (CAST(0 AS BIGINT), 'All Products', 'Total Products', CAST(NULL AS BIGINT)),
        (10, 'Produce', 'Category', 0),
        (101, 'Spinach', 'UPC', 10),
        (102, 'Tomatoes', 'UPC', 10),
        (20, 'Candy', 'Category', 0),
        (201, 'Hershey Bar', 'UPC', 20),
        (202, 'Nerds', 'UPC', 20)
    ) AS t(natural_key, name, level_name, parent_natural_key)
"""

_REF_FACTS_VALUES = """
    SELECT * FROM (VALUES
        (201, 'Phil',   DATE '2022-01-01', CAST(1 AS DECIMAL(18,3)), CAST(3.00 AS DECIMAL(18,3))),
        (201, 'Lottie', DATE '2022-01-02', 5, 15.00),
        (202, 'Kalie',  DATE '2022-01-02', 2, 5.00),
        (102, 'Phil',   DATE '2022-01-02', 2, 2.00),
        (101, 'Popeye', DATE '2022-01-03', 10, 5.00),
        (101, 'Brutus', DATE '2022-01-04', 1, 0.50),
        (101, 'Lottie', DATE '2022-01-04', 1, 0.50),
        (101, 'Phil',   DATE '2022-01-05', 2, 2.00)
    ) AS t(product_id, customer_id, date_id, unit_quantity, sales_amount)
"""

_REF_AGG_ORACLE = f"""
WITH RECURSIVE nodes AS ({_REF_NODES_VALUES}),
levels AS (
    SELECT natural_key, name, level_name, 1 AS level_number,
           [natural_key] AS path_keys
    FROM nodes WHERE parent_natural_key IS NULL
    UNION ALL
    SELECT n.natural_key, n.name, n.level_name, l.level_number + 1,
           list_append(l.path_keys, n.natural_key)
    FROM nodes n JOIN levels l ON n.parent_natural_key = l.natural_key
),
dim AS (
    SELECT *, ROW_NUMBER() OVER (ORDER BY path_keys ASC) AS node_sort_order
    FROM levels
),
closure AS (
    SELECT UNNEST(path_keys) AS ancestor_key, natural_key AS descendant_key
    FROM levels
),
facts AS ({_REF_FACTS_VALUES})
SELECT d.natural_key AS node_natural_key,
       d.name AS node_name,
       d.level_name,
       d.level_number,
       CAST(d.node_sort_order AS BIGINT) AS node_sort_order,
       repeat('-', (d.level_number - 1) * 7) || d.name AS product_node_name,
       CAST(SUM(f.sales_amount) AS DOUBLE) AS sum_of_sales_amount,
       CAST(SUM(f.unit_quantity) AS DOUBLE) AS sum_of_unit_quantity,
       COUNT(DISTINCT f.customer_id) AS distinct_customer_count,
       COUNT(*) AS count_of_fact_records
FROM facts f
JOIN closure cl ON f.product_id = cl.descendant_key
JOIN dim d ON cl.ancestor_key = d.natural_key
GROUP BY ALL
ORDER BY node_sort_order
"""


@register("ref_parity_agg", _REF_AGG_ORACLE)
def ref_parity_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's golden 7-row hierarchical aggregate (FIXTURES.md
    F-REF-4), computed by the engine from the exact seed data."""
    from aggregation_duckdb_spark.operators.aggregate import (
        aggregate_with_closure)
    from aggregation_duckdb_spark.reference_fixtures import (
        product_hierarchy, sales_facts_df)
    hier = product_hierarchy(spark)
    measures = [
        F.sum(F.col("sales_amount")).cast("double").alias("sum_of_sales_amount"),
        F.sum(F.col("unit_quantity")).cast("double").alias("sum_of_unit_quantity"),
        F.count_distinct(F.col("customer_id")).alias("distinct_customer_count"),
        F.count(F.lit(1)).alias("count_of_fact_records"),
    ]
    agg = aggregate_with_closure(sales_facts_df(spark), hier.closure(),
                                 "product_id", measures,
                                 reporting_dim=hier.reporting_dim())
    return agg.select(
        F.col("ancestor_node_natural_key").alias("node_natural_key"),
        F.col("ancestor_node_name").alias("node_name"),
        F.col("ancestor_level_name").alias("level_name"),
        F.col("ancestor_level_number").alias("level_number"),
        F.col("node_sort_order").cast("long").alias("node_sort_order"),
        "product_node_name",
        "sum_of_sales_amount", "sum_of_unit_quantity",
        "distinct_customer_count", "count_of_fact_records")
