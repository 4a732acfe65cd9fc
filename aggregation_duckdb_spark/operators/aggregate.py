"""Hierarchical aggregation — the reference's two equivalent strategies.

1. Closure strategy (aggregation_example.sql:433-453): facts join the
   ancestor/descendant closure table on the descendant natural key —
   a deliberate one-to-many fan-out multiplying each fact row by its
   ancestor count — then a plain group-by per ancestor. Handles ragged
   and arbitrarily deep hierarchies; this is the scale path.

2. ROLLUP strategy (:308-348): facts join the pivoted reporting dim on
   the natural key, then ``GROUP BY ROLLUP`` over the level columns
   with ``GROUPING()`` bookkeeping. Only valid when every fact lands on
   a leaf at uniform maximum depth (SURVEY §1.4.3); width-parameterized
   here, fixing the reference's hard-coded 3-level limit (:202, :325).

Scale notes: the closure/reporting dims are dimension-sized, so both
joins are broadcast — fact rows NEVER shuffle for the join, only for
the final aggregation. The expensive operator at 100 TB is the exact
COUNT(DISTINCT) after the closure fan-out (non-additive across levels,
SURVEY §1.4.4): fact rows × depth feed a distinct. Catalyst plans it as
expand + two-phase aggregate; AQE handles skew. For extreme key skew
use ``distinct_count_two_stage`` (pre-distinct then count, cuts the
expand) or swap in ``approx_count_distinct``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def standard_measures(sales_col: str, qty_col: str, customer_col: str) -> list[Column]:
    """The reference's four measures (:317-320 / :440-443)."""
    return [
        F.sum(F.col(sales_col)).alias("sum_of_sales_amount"),
        F.sum(F.col(qty_col)).alias("sum_of_unit_quantity"),
        F.count_distinct(F.col(customer_col)).alias("distinct_customer_count"),
        F.count(F.lit(1)).alias("count_of_fact_records"),
    ]


def _indent(level_col: str, text: Column) -> Column:
    """Reference display indent: LPAD('-', (level−1)*7, '-') || name
    (:334-338, :435-438) — i.e. (level−1)*7 dashes; ``repeat`` is the
    portable spelling (identical in DuckDB and Spark)."""
    return F.concat(F.expr(f"repeat('-', int(({level_col} - 1) * 7))"), text)


def aggregate_with_closure(facts: DataFrame, closure: DataFrame,
                           fact_key: str, measures: list[Column],
                           reporting_dim: DataFrame | None = None) -> DataFrame:
    """Closure-join strategy (:433-453). Returns one row per ancestor
    node with the aggregated measures, display-indented names, in
    deterministic DFS pre-order (when ``reporting_dim`` is provided for
    the sort order; otherwise ordered by natural-key).
    """
    joined = facts.join(
        F.broadcast(closure),  # dim-sized; fan-out join J5 (:444-447)
        facts[fact_key] == closure["descendant_node_natural_key"], "inner")
    agg = (joined
           .groupBy("ancestor_node_id", "ancestor_node_natural_key",
                    "ancestor_node_name", "ancestor_level_name",
                    "ancestor_level_number")  # :448-451
           .agg(*measures))
    agg = (agg
           .withColumn("product_level_name",
                       _indent("ancestor_level_number", F.col("ancestor_level_name")))
           .withColumn("product_node_name",
                       _indent("ancestor_level_number", F.col("ancestor_node_name"))))
    if reporting_dim is not None:
        order = reporting_dim.select(F.col("node_id").alias("__oid"),
                                     F.col("node_sort_order"))
        agg = (agg.join(F.broadcast(order), agg["ancestor_node_id"] == order["__oid"], "left")
               .drop("__oid")
               .orderBy(F.asc("node_sort_order")))
    else:
        agg = agg.orderBy(F.asc("ancestor_node_natural_key"))
    return agg


def aggregate_with_rollup(facts: DataFrame, reporting_dim: DataFrame,
                          fact_key: str, measures: list[Column],
                          num_levels: int) -> DataFrame:
    """ROLLUP strategy (:308-348), width-parameterized.

    Facts join the reporting dim on the natural key (leaf rows only by
    data shape), roll up over ``level_i_node_id``, pick the deepest
    non-rolled level via GROUPING() (:309-315), drop the grand-total
    grouping set (HAVING NOT GROUPING(level_1)=1, :331), and re-attach
    node attributes by joining the dim back on the surrogate id
    (:343-346). Output schema matches :func:`aggregate_with_closure`.
    """
    level_ids = [f"level_{i}_node_id" for i in range(1, num_levels + 1)]
    dim_cols = [F.col("node_natural_key").alias("__nk"), *[F.col(c) for c in level_ids]]
    joined = facts.join(
        F.broadcast(reporting_dim.select(*dim_cols)),  # J3 (:321-324)
        facts[fact_key] == F.col("__nk"), "inner")

    gflags = [F.grouping(c).alias(f"__g_{c}") for c in level_ids]
    rolled = (joined
              .rollup(*level_ids)  # A5 (:326-329)
              .agg(*measures, *gflags)
              .where(F.col(f"__g_{level_ids[0]}") == 0))  # :331 drop grand total

    # CASE over GROUPING() picks the deepest retained level (:309-315),
    # generated for any width.
    pick = None
    for i in range(num_levels, 0, -1):
        cond = F.col(f"__g_level_{i}_node_id") == 0
        val = F.col(f"level_{i}_node_id")
        pick = F.when(cond, val) if pick is None else pick.when(cond, val)
    rolled = rolled.withColumn("product_node_id", pick).drop(
        *level_ids, *[f"__g_{c}" for c in level_ids])

    dim = reporting_dim.select(
        F.col("node_id").alias("__did"),
        F.col("node_natural_key").alias("ancestor_node_natural_key"),
        F.col("node_name").alias("ancestor_node_name"),
        F.col("level_name").alias("ancestor_level_name"),
        F.col("level_number").alias("ancestor_level_number"),
        F.col("node_sort_order"))
    out = (rolled.join(F.broadcast(dim), rolled["product_node_id"] == dim["__did"], "inner")  # J4
           .withColumnRenamed("product_node_id", "ancestor_node_id")
           .drop("__did")
           .withColumn("product_level_name",
                       _indent("ancestor_level_number", F.col("ancestor_level_name")))
           .withColumn("product_node_name",
                       _indent("ancestor_level_number", F.col("ancestor_node_name")))
           .orderBy(F.asc("node_sort_order")))
    return out


def distinct_count_two_stage(facts: DataFrame, closure: DataFrame,
                             fact_key: str, distinct_col: str,
                             group_cols: list[str] | None = None) -> DataFrame:
    """Skew-hardened exact distinct count per ancestor.

    At 100 TB the closure fan-out followed by COUNT(DISTINCT) is the
    bottleneck (SURVEY §1.4.4): Catalyst's expand multiplies rows again.
    Two-stage form: project to (ancestor, value), drop duplicates
    (map-side combine applies), then a cheap count — the heavy shuffle
    moves pre-deduplicated pairs only.
    """
    group_cols = group_cols or ["ancestor_node_id", "ancestor_node_natural_key"]
    pairs = (facts.join(F.broadcast(closure),
                        facts[fact_key] == closure["descendant_node_natural_key"], "inner")
             .select(*group_cols, F.col(distinct_col).alias("__v"))
             .dropDuplicates())
    return pairs.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("distinct_count"))
