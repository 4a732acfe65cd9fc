"""TPC-H-ish operator matrix: one oracle-checked entry per SURVEY §2
operator family over the driver's parquet tables.

Determinism conventions (see matrix.py): money/measure arithmetic is
done entirely in DECIMAL (exact, engine-independent) and cast to double
only at the end; rankings always carry a unique tie-break key.
DataFrame API is used where it maps 1:1; ``spark.sql`` is used for the
subquery-shaped operators (P7/P8, grouping sets) — the views are
registered per call, mirroring the reference being pure SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from aggregation_duckdb_spark.io import load_table
from aggregation_duckdb_spark.matrix import register
from aggregation_duckdb_spark.runtime import broadcast_if_small


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, n, sf_dir).createOrReplaceTempView(n)


def _dec(col, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})") if isinstance(col, str) else col.cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------
# A: aggregations (A1-A7) — TPC-H Q1-shaped pricing summary
# ---------------------------------------------------------------------

_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (1 - CAST(l_discount AS DECIMAL(18,2))) *
                (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_SQL)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/A4/P4/P6 over the big fact table. Decimal arithmetic keeps
    sums bit-identical across engines; the single shuffle is the
    group-by (filter + partial agg are map-side — check .explain)."""
    li = load_table(spark, "lineitem", sf_dir)
    qty, price, disc, tax = (_dec("l_quantity"), _dec("l_extendedprice"),
                             _dec("l_discount"), _dec("l_tax"))
    return (li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(qty).cast("double").alias("sum_qty"),
                 F.sum(price).cast("double").alias("sum_base_price"),
                 F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
                 F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
                 (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
                 (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
                 F.count(F.lit(1)).alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


@register("q_count_distinct", """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS distinct_customers,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
""")
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 exact distinct (the reference's non-additive measure, :319)."""
    return (load_table(spark, "orders", sf_dir)
            .groupBy("o_orderstatus")
            .agg(F.count_distinct("o_custkey").alias("distinct_customers"),
                 F.count(F.lit(1)).alias("n_orders"))
            .orderBy("o_orderstatus"))


@register("q_rollup_grouping", """
SELECT r_name, n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
       CAST(GROUPING(r_name) AS INT) AS g_region,
       CAST(GROUPING(n_name) AS INT) AS g_nation
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY g_region, g_nation, r_name NULLS LAST, n_name NULLS LAST
""")
def q_rollup_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6: rollup + grouping() including the grand total set."""
    cust = load_table(spark, "customer", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir)
    joined = (cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
              .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]))
    return (joined.rollup("r_name", "n_name")
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum(_dec("c_acctbal")).cast("double").alias("sum_acctbal"),
                 F.grouping("r_name").cast("int").alias("g_region"),
                 F.grouping("n_name").cast("int").alias("g_nation"))
            .orderBy("g_region", "g_nation",
                     F.asc_nulls_last("r_name"), F.asc_nulls_last("n_name")))


@register("q_cube_grouping", """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY g_status, g_priority, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
""")
def q_cube_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE extension (not in the reference; native in both engines)."""
    return (load_table(spark, "orders", sf_dir)
            .cube("o_orderstatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.grouping("o_orderstatus").cast("int").alias("g_status"),
                 F.grouping("o_orderpriority").cast("int").alias("g_priority"))
            .orderBy("g_status", "g_priority",
                     F.asc_nulls_last("o_orderstatus"),
                     F.asc_nulls_last("o_orderpriority")))


_GSETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY g_status, g_priority, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST
"""


@register("q_grouping_sets", _GSETS_SQL)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same text runs on DuckDB)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_GSETS_SQL)


# ---------------------------------------------------------------------
# P: projections / filters / predicates
# ---------------------------------------------------------------------

@register("q_filter_project", """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice > 150000.0
ORDER BY o_orderkey
""")
def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P6 + pushdown: both predicates and the 3-column projection
    reach the parquet scan (PushedFilters/ReadSchema in .explain)."""
    return (load_table(spark, "orders", sf_dir)
            .where((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 150000.0))
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy("o_orderkey"))


@register("q_case_when", """
SELECT CASE WHEN c_acctbal < 0 THEN 'overdrawn'
            WHEN c_acctbal < 5000 THEN 'standard'
            ELSE 'premium' END AS tier,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
FROM customer GROUP BY tier ORDER BY tier
""")
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 CASE WHEN (the reference's is_root/is_leaf/grouping-pick shape)."""
    tier = (F.when(F.col("c_acctbal") < 0, "overdrawn")
            .when(F.col("c_acctbal") < 5000, "standard")
            .otherwise("premium").alias("tier"))
    return (load_table(spark, "customer", sf_dir)
            .groupBy(tier)
            .agg(F.count(F.lit(1)).alias("n_customers"),
                 F.sum(_dec("c_acctbal")).cast("double").alias("sum_acctbal"))
            .orderBy("tier"))


_IN_SUBQ_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_nationkey IN (
    SELECT n_nationkey FROM nation
    WHERE n_regionkey = (SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))
ORDER BY c_custkey
"""


@register("q_in_subquery", _IN_SUBQ_SQL)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 membership subquery + P8 scalar subquery (the reference's
    is_leaf / seed-resolution shapes) — same SQL text on both engines."""
    _views(spark, sf_dir, "customer", "nation", "region")
    return spark.sql(_IN_SUBQ_SQL)


_SCALAR_SUBQ_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part
WHERE p_retailprice > (
    SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
    FROM part)
ORDER BY p_partkey
"""


@register("q_scalar_subquery", _SCALAR_SUBQ_SQL)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: uncorrelated scalar subquery; threshold computed in decimal
    so the boundary is identical across engines."""
    _views(spark, sf_dir, "part")
    return spark.sql(_SCALAR_SUBQ_SQL)


@register("q_having", """
SELECT c_nationkey, COUNT(*) AS n_customers
FROM customer
GROUP BY c_nationkey
HAVING COUNT(*) >= 5
ORDER BY c_nationkey
""")
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 post-aggregation filter (:331)."""
    return (load_table(spark, "customer", sf_dir)
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_customers"))
            .where(F.col("n_customers") >= 5)
            .orderBy("c_nationkey"))


# ---------------------------------------------------------------------
# J: joins
# ---------------------------------------------------------------------

@register("q_join_fact_dims", """
SELECT r_name, n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
""")
def q_join_fact_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2-style star join: fact ⋈ three broadcast dims, one shuffle
    (the final group-by)."""
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir)
    return (orders
            .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
            .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
            .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
            .groupBy("r_name", "n_name")
            .agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_orders"))
            .orderBy("r_name", "n_name"))


@register("q_semi_join", """
SELECT n_nationkey, n_name FROM nation
WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
ORDER BY n_nationkey
""")
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 semi-join (the reference's IN-subquery shape, :71-76)."""
    nat = load_table(spark, "nation", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    return (nat.join(sup, nat["n_nationkey"] == sup["s_nationkey"], "left_semi")
            .select("n_nationkey", "n_name").orderBy("n_nationkey"))


@register("q_anti_join", """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
""")
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join — the engine's idiomatic spelling of is_leaf (§1.4.2)."""
    cust = load_table(spark, "customer", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    return (cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
            .select("c_custkey", "c_name").orderBy("c_custkey"))


@register("q_outer_join", """
SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_suppliers
FROM nation LEFT JOIN supplier ON s_nationkey = n_nationkey
GROUP BY n_nationkey, n_name
ORDER BY n_nationkey
""")
def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (beyond-reference; COUNT(col) skips NULLs)."""
    nat = load_table(spark, "nation", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)
    return (nat.join(sup, nat["n_nationkey"] == sup["s_nationkey"], "left")
            .groupBy("n_nationkey", "n_name")
            .agg(F.count("s_suppkey").alias("n_suppliers"))
            .orderBy("n_nationkey"))


# ---------------------------------------------------------------------
# W: window functions
# ---------------------------------------------------------------------

@register("q_window_row_number", """
SELECT * FROM (
    SELECT o_custkey, o_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn
    FROM orders) t
WHERE rn <= 3
ORDER BY o_custkey, rn
""")
def q_window_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 row_number — partitioned (unlike the reference's global dim
    window), with a unique tie-break so ordering is deterministic."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (load_table(spark, "orders", sf_dir)
            .select("o_custkey", "o_orderkey",
                    F.row_number().over(w).cast("long").alias("rn"))
            .where(F.col("rn") <= 3)
            .orderBy("o_custkey", "rn"))


@register("q_window_analytics", """
SELECT o_orderkey, o_custkey,
       lag(o_totalprice) OVER w AS prev_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend,
       CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            AS BIGINT) AS order_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
ORDER BY o_orderkey
""")
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / rank / running aggregate over frames (beyond-reference
    window surface; running sum in decimal for determinism)."""
    by_key = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    by_date = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = by_key.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (load_table(spark, "orders", sf_dir)
            .select("o_orderkey", "o_custkey",
                    F.lag("o_totalprice").over(by_key).alias("prev_price"),
                    F.sum(_dec("o_totalprice")).over(run).cast("double")
                     .alias("running_spend"),
                    F.rank().over(by_date).cast("long").alias("order_rank"))
            .orderBy("o_orderkey"))


# ---------------------------------------------------------------------
# O: sorts / limits / set ops
# ---------------------------------------------------------------------

@register("q_order_limit", """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""")
def q_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O4 ordered limit → TakeOrderedAndProject (no global sort)."""
    return (load_table(spark, "orders", sf_dir)
            .select("o_orderkey", "o_totalprice")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(100))


@register("q_set_ops", """
SELECT 'union_all' AS probe, n_name || '/nation' AS val FROM nation
UNION ALL
SELECT 'union_all' AS probe, r_name || '/region' AS val FROM region
UNION ALL
SELECT 'distinct' AS probe, val FROM (
    SELECT DISTINCT c_mktsegment AS val FROM customer)
UNION ALL
SELECT 'intersect' AS probe, CAST(nationkey AS VARCHAR) AS val FROM (
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'except' AS probe, CAST(nationkey AS VARCHAR) AS val FROM (
    SELECT n_nationkey AS nationkey FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier)
ORDER BY probe, val
""")
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 set-op family in one entry: UNION ALL (the recursive CTE's
    glue, :131/:383) plus DISTINCT / INTERSECT / EXCEPT, tagged by a
    probe column so each branch stays independently checkable.

    NB set-EXCEPT is subtract(), i.e. distinct-then-remove. The
    exceptAll().distinct() spelling is WRONG: with left multiplicity
    above right (e.g. [v,v] except [v]) it keeps v."""
    nat = load_table(spark, "nation", sf_dir)
    reg = load_table(spark, "region", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    sup = load_table(spark, "supplier", sf_dir)

    def tag(probe: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(probe).alias("probe"),
                         F.col("val").cast("string").alias("val"))

    union_all = tag("union_all", nat.select(
        F.concat(F.col("n_name"), F.lit("/nation")).alias("val"))
        .unionByName(reg.select(
            F.concat(F.col("r_name"), F.lit("/region")).alias("val"))))
    distinct = tag("distinct", cust.select(
        F.col("c_mktsegment").alias("val")).distinct())
    inter = tag("intersect", cust.select(
        F.col("c_nationkey").alias("val"))
        .intersect(sup.select(F.col("s_nationkey").alias("val"))))
    exc = tag("except", nat.select(
        F.col("n_nationkey").alias("val"))
        .subtract(sup.select(F.col("s_nationkey").alias("val"))))
    return (union_all.unionByName(distinct).unionByName(inter)
            .unionByName(exc).orderBy("probe", "val"))


# ---------------------------------------------------------------------
# F: scalar functions (F1-F12 surface)
# ---------------------------------------------------------------------

@register("q_scalar_functions", """
SELECT n_nationkey,
       n_name,
       replace(n_name, 'A', '*') AS repl,
       lpad(n_name, 15, '.') AS padded,
       n_name || '/' || CAST(n_nationkey AS VARCHAR) AS tagged,
       upper(substr(n_name, 1, 3)) AS prefix3,
       CAST(length(n_name) AS INT) AS name_len,
       regexp_extract(n_name, '[AEIOU]+') AS vowels,
       regexp_replace(n_name, '[AEIOU]', '_', 'g') AS masked,
       CAST(regexp_matches(n_name, '^[A-Z]+$') AS BOOLEAN) AS is_alpha
FROM nation ORDER BY n_nationkey
""")
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 replace, F9 lpad, F10 || concat, plus substr/upper/length and
    the regex scalar family (extract / global replace / match)."""
    return (load_table(spark, "nation", sf_dir)
            .select("n_nationkey", "n_name",
                    F.replace(F.col("n_name"), F.lit("A"), F.lit("*")).alias("repl"),
                    F.lpad(F.col("n_name"), 15, ".").alias("padded"),
                    F.concat(F.col("n_name"), F.lit("/"),
                             F.col("n_nationkey").cast("string")).alias("tagged"),
                    F.upper(F.substring(F.col("n_name"), 1, 3)).alias("prefix3"),
                    F.length(F.col("n_name")).cast("int").alias("name_len"),
                    F.regexp_extract("n_name", "[AEIOU]+", 0).alias("vowels"),
                    F.regexp_replace("n_name", "[AEIOU]", "_").alias("masked"),
                    F.col("n_name").rlike("^[A-Z]+$").alias("is_alpha"))
            .orderBy("n_nationkey"))


@register("q_struct_array", """
SELECT n_nationkey,
       [struct_pack(k := CAST(n_nationkey AS BIGINT), nm := n_name),
        struct_pack(k := CAST(n_regionkey AS BIGINT), nm := 'parent')][1].nm
           AS first_nm,
       [struct_pack(k := CAST(n_nationkey AS BIGINT), nm := n_name),
        struct_pack(k := CAST(n_regionkey AS BIGINT), nm := 'parent')][2].k
           AS second_k,
       list_append([CAST(n_nationkey AS BIGINT)], CAST(n_regionkey AS BIGINT))[2]
           AS appended_last
FROM nation ORDER BY n_nationkey
""")
def q_struct_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2-F6: struct/array construction, array_append, 1-based
    deref, struct field deref — the reference's path machinery
    (:111-161), surfaced as scalars so schemas compare. Struct-array
    derefs go through element_at_1based (ElementAt on struct arrays
    breaks whole-stage codegen in Spark 4.1.2); the primitive-array
    deref keeps plain element_at, which compiles fine."""
    from aggregation_duckdb_spark.functions.scalars import element_at_1based
    k1 = F.col("n_nationkey").cast("long").alias("k")
    k2 = F.col("n_regionkey").cast("long").alias("k")
    arr = F.array(F.struct(k1, F.col("n_name").alias("nm")),
                  F.struct(k2, F.lit("parent").alias("nm")))
    appended = F.array_append(F.array(F.col("n_nationkey").cast("long")),
                              F.col("n_regionkey").cast("long"))
    return (load_table(spark, "nation", sf_dir)
            .select("n_nationkey",
                    element_at_1based(arr, 1).getField("nm").alias("first_nm"),
                    element_at_1based(arr, 2).getField("k").alias("second_k"),
                    F.element_at(appended, 2).alias("appended_last"))
            .orderBy("n_nationkey"))


@register("q_date_functions", """
SELECT o_orderkey,
       CAST(o_orderdate AS DATE) AS d,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_month,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY AS DATE) AS plus_45d,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
           AS days_since_95,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
       CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INT) AS dow,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(quarter(o_orderdate) AS INT) AS qtr
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
ORDER BY o_orderkey LIMIT 500
""")
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged date family: F11 date literals (the WHERE bounds),
    date_trunc bucketing, interval add (month-end clamped the same way
    in both engines), diffs, last_day, day-of-week (DuckDB is 0=Sunday
    vs Spark 1=Sunday — oracle shifts by one), year/quarter — one
    ordered scan of orders."""
    o = load_table(spark, "orders", sf_dir)
    d = F.col("o_orderdate").cast("date")
    return (o.where((F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                    & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
            .select(
        "o_orderkey",
        d.alias("d"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month"),
        F.add_months(d, 1).alias("plus_month"),
        F.date_add(d, 45).alias("plus_45d"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("int")
         .alias("days_since_95"),
        F.last_day(d).alias("month_end"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.year(d).cast("int").alias("yr"),
        F.quarter(d).cast("int").alias("qtr"))
        .orderBy("o_orderkey").limit(500))


@register("q_percentiles", """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5)  AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       CAST(min(l_quantity) AS DOUBLE) AS qmin,
       CAST(max(l_quantity) AS DOUBLE) AS qmax
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""")
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (linear interpolation — Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the formula, so
    values hash-match)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.groupBy("l_returnflag")
            .agg(F.expr("percentile(l_quantity, 0.25)").alias("p25"),
                 F.expr("percentile(l_quantity, 0.5)").alias("p50"),
                 F.expr("percentile(l_quantity, 0.75)").alias("p75"),
                 F.min("l_quantity").cast("double").alias("qmin"),
                 F.max("l_quantity").cast("double").alias("qmax"))
            .orderBy("l_returnflag"))


@register("q_exists_correlated", """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
ORDER BY c.c_custkey
""")
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery (P7/P8 family) through Spark SQL —
    Catalyst decorrelates to a semi-join."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("__c")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("__o")
    return spark.sql("""
        SELECT c.c_custkey, c.c_name
        FROM __c c
        WHERE EXISTS (SELECT 1 FROM __o o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
        ORDER BY c.c_custkey""")


@register("q_string_agg", """
SELECT n_regionkey,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
""")
def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation: collect_list is unordered in Spark, so
    sort-then-join makes it deterministic (= DuckDB's ORDER BY inside
    string_agg)."""
    return (load_table(spark, "nation", sf_dir)
            .groupBy("n_regionkey")
            .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",")
                  .alias("nations"),
                 F.count(F.lit(1)).alias("n"))
            .orderBy("n_regionkey"))


@register("q_pivot_status", """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_partial,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS filled_revenue
FROM orders GROUP BY order_year ORDER BY order_year
""")
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot via DataFrame .pivot() with explicit values (explicit list
    keeps it one pass, no distinct-discovery job); oracle spelled as
    FILTER aggregates — the portable pivot form."""
    orders = load_table(spark, "orders", sf_dir)
    pivoted = (orders
               .withColumn("order_year", F.year("o_orderdate").cast("int"))
               .groupBy("order_year")
               .pivot("o_orderstatus", ["O", "F", "P"])
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum(_dec("o_totalprice")).cast("double").alias("rev")))
    return (pivoted.select(
        "order_year",
        F.coalesce("O_n", F.lit(0)).alias("n_open"),
        F.coalesce("F_n", F.lit(0)).alias("n_filled"),
        F.coalesce("P_n", F.lit(0)).alias("n_partial"),
        F.col("F_rev").alias("filled_revenue"))
        .orderBy("order_year"))


@register("q3_shipping_priority", """
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join, revenue agg, ordered top-k.
    Filters reach the scans (segment, both dates); customer broadcasts;
    the limit runs as TakeOrderedAndProject."""
    cutoff = F.lit("1997-06-01").cast("timestamp")
    c = (load_table(spark, "customer", sf_dir)
         .where(F.col("c_mktsegment") == "BUILDING").select("c_custkey"))
    o = (load_table(spark, "orders", sf_dir)
         .where(F.col("o_orderdate") < cutoff)
         .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = (load_table(spark, "lineitem", sf_dir)
          .where(F.col("l_shipdate") > cutoff)
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    rev = (_dec("l_extendedprice")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate")
            .orderBy(F.desc("revenue"), F.asc("o_orderdate"),
                     F.asc("l_orderkey"))
            .limit(10))


@register("q5_local_supplier_volume", """
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
""")
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way snowflake join with the local-supplier
    equality (customer and supplier share a nation); dims broadcast,
    the fact chain shuffles only for the final group-by."""
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n = load_table(spark, "nation", sf_dir)
    r = (load_table(spark, "region", sf_dir)
         .where(F.col("r_name") == "ASIA"))
    rev = (_dec("l_extendedprice")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(s), (li["l_suppkey"] == s["s_suppkey"])
                  & (c["c_nationkey"] == s["s_nationkey"]))
            .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .groupBy("n_name")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("n_name")))


@register("q10_returned_items", """
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue,
       n.n_name,
       CAST(c.c_acctbal AS DOUBLE) AS c_acctbal
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top-20 —
    high-cardinality group-by keyed on the customer, dims broadcast."""
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    li = (load_table(spark, "lineitem", sf_dir)
          .where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    n = load_table(spark, "nation", sf_dir).select("n_nationkey", "n_name")
    rev = (_dec("l_extendedprice")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "n_name",
                    F.col("c_acctbal").cast("double").alias("c_acctbal"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


@register("q18_large_volume_customers", """
WITH big AS (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(l_quantity) > 150)
SELECT c.c_custkey, c.c_name, o.o_orderkey,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""")
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: semi-join against an aggregated subquery (the
    'large orders' set), then re-aggregate — two passes over lineitem,
    the qualifying-key set broadcast back as a semi-join."""
    li = load_table(spark, "lineitem", sf_dir)
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("__q"))
           .where(F.col("__q") > 150)
           .select("l_orderkey"))
    o = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    qualified = o.join(F.broadcast(big),
                       o["o_orderkey"] == big["l_orderkey"], "left_semi")
    return (li.select("l_orderkey", "l_quantity")
            .join(F.broadcast(qualified),
                  F.col("l_orderkey") == qualified["o_orderkey"])
            .join(F.broadcast(c), F.col("o_custkey") == c["c_custkey"])
            .groupBy("c_custkey", "c_name", "o_orderkey", "o_totalprice")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                  .cast("double").alias("total_qty"))
            .select("c_custkey", "c_name", "o_orderkey",
                    F.col("o_totalprice").cast("double").alias("o_totalprice"),
                    "total_qty")
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(20))


@register("q7_volume_shipping", """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(year(l.l_shipdate) AS INT) AS ship_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE)
           AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY cust_nation, supp_nation, ship_year
ORDER BY cust_nation, supp_nation, ship_year
""")
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year — the same
    dimension (nation) joined twice under different roles, plus a
    dim-dim inequality applied post-broadcast."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount")
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey")
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_nationkey")
    s = load_table(spark, "supplier", sf_dir).select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("__n1k"), F.col("n_name").alias("cust_nation"))
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("__n2k"), F.col("n_name").alias("supp_nation"))
    rev = (_dec("l_extendedprice")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
            .join(F.broadcast(n1), c["c_nationkey"] == F.col("__n1k"))
            .join(F.broadcast(n2), s["s_nationkey"] == F.col("__n2k"))
            .where(F.col("cust_nation") != F.col("supp_nation"))
            .groupBy("cust_nation", "supp_nation",
                     F.year("l_shipdate").cast("int").alias("ship_year"))
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .orderBy("cust_nation", "supp_nation", "ship_year"))


@register("q_unpivot", """
SELECT c_custkey, metric, CAST(value AS DOUBLE) AS value
FROM (SELECT c_custkey,
             CAST(c_acctbal AS DOUBLE) AS acctbal,
             CAST(c_nationkey AS DOUBLE) AS nationkey
      FROM customer)
UNPIVOT (value FOR metric IN (acctbal, nationkey))
ORDER BY c_custkey, metric
""")
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: wide metrics to (key, metric, value) rows —
    Spark's DataFrame.unpivot vs DuckDB's UNPIVOT."""
    c = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"))
    return (c.unpivot("c_custkey", ["acctbal", "nationkey"],
                      "metric", "value")
            .orderBy("c_custkey", "metric"))


@register("q_collections", """
WITH a AS (
    SELECT n_nationkey, n_regionkey,
           [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT),
            CAST(n_nationkey AS BIGINT) + 10] AS arr,
           map(['nation', 'region'],
               [CAST(n_nationkey AS BIGINT), CAST(n_regionkey AS BIGINT)]) AS kv
    FROM nation)
SELECT n_nationkey,
       array_to_string(list_sort(arr), '|') AS sorted_arr,
       list_contains(arr, CAST(n_regionkey AS BIGINT)) AS has_region,
       CAST(len(list_filter(arr, x -> x % 2 = 0)) AS INT) AS n_even,
       array_to_string(list_transform(arr, x -> x * 2), '|') AS doubled,
       CAST(list_sum(arr) AS BIGINT) AS arr_sum,
       kv['nation'][1] AS nation_val,
       kv['region'][1] AS region_val,
       array_to_string(map_keys(kv), '|') AS keys,
       CAST(cardinality(kv) AS INT) AS n_entries
FROM a ORDER BY n_nationkey
""")
def q_collections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection scalar families in one scan of nation.

    Arrays: sort / contains / filter / transform / aggregate — the
    building blocks the dedup and similarity operators compose (F3-F5
    surface, generalized). Maps: construction, key lookup, keys,
    cardinality (DuckDB map[k] yields a list — the oracle unwraps with
    [1]). Collection-valued results are pipe-serialized: the driver's
    hasher cannot canonicalize list-typed cells."""
    from aggregation_duckdb_spark.functions.scalars import serialize_array

    n = load_table(spark, "nation", sf_dir)
    arr = F.array(F.col("n_nationkey").cast("long"),
                  F.col("n_regionkey").cast("long"),
                  F.col("n_nationkey").cast("long") + 10)
    kv = F.map_from_arrays(
        F.array(F.lit("nation"), F.lit("region")),
        F.array(F.col("n_nationkey").cast("long"),
                F.col("n_regionkey").cast("long")))
    return (n.select(
        "n_nationkey",
        serialize_array(F.array_sort(arr)).alias("sorted_arr"),
        F.array_contains(arr, F.col("n_regionkey").cast("long"))
         .alias("has_region"),
        F.size(F.filter(arr, lambda x: x % 2 == 0)).alias("n_even"),
        serialize_array(F.transform(arr, lambda x: x * 2)).alias("doubled"),
        F.aggregate(arr, F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("arr_sum"),
        F.element_at(kv, "nation").alias("nation_val"),
        F.element_at(kv, "region").alias("region_val"),
        serialize_array(F.map_keys(kv)).alias("keys"),
        F.size(kv).alias("n_entries"))
        .orderBy("n_nationkey"))


@register("q_null_safety", """
WITH v AS (
    SELECT n_nationkey, n_name, n_regionkey,
           CASE WHEN n_nationkey % 5 = 0 THEN NULL
                ELSE n_regionkey END AS maybe_region
    FROM nation)
SELECT a.n_nationkey AS key_a, b.n_nationkey AS key_b,
       TRY_CAST(a.n_name AS BIGINT) AS bad_cast,
       TRY_CAST(CAST(a.n_nationkey AS VARCHAR) AS BIGINT) AS good_cast,
       COALESCE(TRY_CAST(a.n_name AS BIGINT), -1) AS coalesced,
       NULLIF(a.n_regionkey, 0) AS nullif_region,
       IFNULL(NULLIF(a.n_regionkey, 0), 99) AS ifnull_region,
       COALESCE(a.maybe_region, -1) AS region_or_sentinel
FROM v a JOIN v b
  ON a.maybe_region IS NOT DISTINCT FROM b.maybe_region
 AND a.n_nationkey < b.n_nationkey
ORDER BY key_a, key_b
""")
def q_null_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family in one entry. Join side: null-safe equality
    (<=> / IS NOT DISTINCT FROM) — NULL keys match each other, the
    semantics plain '=' silently drops. Scalar side: try_cast (NULL,
    not error), coalesce / nullif / ifnull — identical semantics both
    engines."""
    n = load_table(spark, "nation", sf_dir)
    v = n.select(
        "n_nationkey", "n_name", "n_regionkey",
        F.when(F.col("n_nationkey") % 5 == 0, F.lit(None))
         .otherwise(F.col("n_regionkey")).alias("maybe_region"))
    a, b = v.alias("a"), v.alias("b")
    bad = F.expr("try_cast(a.n_name AS BIGINT)")
    return (a.join(b, F.col("a.maybe_region").eqNullSafe(F.col("b.maybe_region"))
                   & (F.col("a.n_nationkey") < F.col("b.n_nationkey")))
            .select(F.col("a.n_nationkey").alias("key_a"),
                    F.col("b.n_nationkey").alias("key_b"),
                    bad.alias("bad_cast"),
                    F.expr("try_cast(CAST(a.n_nationkey AS STRING) AS BIGINT)")
                     .alias("good_cast"),
                    F.coalesce(bad, F.lit(-1)).alias("coalesced"),
                    F.nullif(F.col("a.n_regionkey"), F.lit(0))
                     .alias("nullif_region"),
                    F.ifnull(F.nullif(F.col("a.n_regionkey"), F.lit(0)),
                             F.lit(99)).alias("ifnull_region"),
                    F.coalesce(F.col("a.maybe_region"), F.lit(-1))
                     .alias("region_or_sentinel"))
            .orderBy("key_a", "key_b"))


@register("q_io_roundtrip", """
SELECT r_name AS region_name,
       CAST(COUNT(*) AS BIGINT) AS nation_count,
       CAST(SUM(n_nationkey) AS BIGINT) AS nationkey_sum
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY region_name
""")
def q_io_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage surface end-to-end (SURVEY S4-S6): CTAS to parquet
    (io.write_parquet), read-back, temp-view + spark.sql access, CSV
    sink (io.write_csv) and CSV read-back with an explicit schema.
    The values must survive both round-trips untouched, so the oracle
    is the plain aggregate over the base tables — any serialization
    drift (types, header handling, row loss) breaks the hash.

    Mirrors aggregation_example.sql's CREATE OR REPLACE TABLE ... AS
    (:86, :351) and the reference's CSV results artifact
    (results/product_reporting_dim_table_contents.csv)."""
    import os
    import tempfile

    from aggregation_duckdb_spark.io import write_csv, write_parquet

    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    agg = (n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
           .groupBy(F.col("r_name").alias("region_name"))
           .agg(F.count(F.lit(1)).alias("nation_count"),
                F.sum("n_nationkey").alias("nationkey_sum")))
    # path keyed on the session's application id: two concurrent
    # sessions (bench + oracle_check, or the round driver) must not
    # overwrite each other's round-trip mid-read
    base = os.path.join(tempfile.gettempdir(), "spark-graft-io-roundtrip",
                        spark.sparkContext.applicationId)
    pq_path = os.path.join(base, "agg.parquet")
    csv_path = os.path.join(base, "agg.csv")
    # S5: CTAS → parquet, then read back
    write_parquet(agg, pq_path)
    back = spark.read.parquet(pq_path)
    # S4: temp view + SQL access
    back.createOrReplaceTempView("io_roundtrip_agg")
    via_sql = spark.sql("SELECT region_name, nation_count, nationkey_sum "
                        "FROM io_roundtrip_agg")
    # S6: CSV sink, then read back with the explicit schema
    write_csv(via_sql, csv_path)
    return (spark.read.option("header", True)
            .schema("region_name string, nation_count bigint, "
                    "nationkey_sum bigint")
            .csv(csv_path)
            .orderBy("region_name"))


@register("q14_promo_effect", """
SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
       CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (1 - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) * CAST(1 AS DECIMAL(18,2)) END)
            AS DOUBLE) /
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
            AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY ship_month
ORDER BY ship_month
""")
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue ratio over a fact⋈dim
    broadcast join. Both legs summed exactly in decimal; the single
    IEEE division happens once per group at the end, so the doubles
    are bit-identical across engines."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        _dec(F.lit(0)) * _dec(F.lit(1)))
    return (li.where((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                     & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
            .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .groupBy(F.date_trunc("month", F.col("l_shipdate"))
                      .alias("ship_month"))
            .agg((F.lit(100.0) * F.sum(promo).cast("double")
                  / F.sum(rev).cast("double")).alias("promo_revenue_pct"))
            .orderBy("ship_month"))


@register("q_window_frames", """
SELECT o_orderkey, o_custkey,
       lead(o_totalprice) OVER w AS next_price,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       CAST(dense_rank() OVER w AS BIGINT) AS drank,
       first_value(o_orderkey) OVER
           (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS neighbor_first,
       last_value(o_orderkey) OVER
           (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS neighbor_last,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
           (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) /
       COUNT(*) OVER
           (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sliding_avg
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
ORDER BY o_orderkey
""")
def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame surface beyond W1: lead / ntile / dense_rank and
    explicit ROWS frames (symmetric neighbor frame, trailing sliding
    frame). All orderings key on the unique o_orderkey; the sliding
    average is an exact decimal sum with one double division."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    nb = w.rowsBetween(-1, 1)
    trail = w.rowsBetween(-2, Window.currentRow)
    return (load_table(spark, "orders", sf_dir)
            .select("o_orderkey", "o_custkey",
                    F.lead("o_totalprice").over(w).alias("next_price"),
                    F.ntile(4).over(w).cast("int").alias("quartile"),
                    F.dense_rank().over(w).cast("long").alias("drank"),
                    F.first("o_orderkey").over(nb).alias("neighbor_first"),
                    F.last("o_orderkey").over(nb).alias("neighbor_last"),
                    (F.sum(_dec("o_totalprice")).over(trail).cast("double")
                     / F.count(F.lit(1)).over(trail)).alias("sliding_avg"))
            .orderBy("o_orderkey"))


@register("q_bucketed_join", """
SELECT l_returnflag,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_order_price
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY l_returnflag
ORDER BY l_returnflag
""")
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact⋈fact join via bucketed storage (the scale lever
    for the 100 TB orders⋈lineitem shuffle: pay the shuffle once at
    write, never per query — sources/bucketing.py). Both sides are
    written bucketed+sorted by the join key, the join reads matching
    buckets with no exchange (plan-asserted in tests/test_plans.py),
    and the aggregate must match the plain-join oracle exactly."""
    from aggregation_duckdb_spark.sources.bucketing import write_bucketed
    o = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_returnflag")
    write_bucketed(o, "q_bkt_orders", ["o_orderkey"], num_buckets=8,
                   sort_cols=["o_orderkey"])
    write_bucketed(li, "q_bkt_lineitem", ["l_orderkey"], num_buckets=8,
                   sort_cols=["l_orderkey"])
    ob, lb = spark.table("q_bkt_orders"), spark.table("q_bkt_lineitem")
    return (ob.join(lb, ob["o_orderkey"] == lb["l_orderkey"])
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_lines"),
                 F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
                 F.sum(_dec("o_totalprice")).cast("double")
                  .alias("sum_order_price"))
            .orderBy("l_returnflag"))


# ---------------------------------------------------------------------
# TPC-H shapes q4..q22, adapted to the driver schema (no commitdate /
# receiptdate / shipmode / partsupp / phone columns — each entry keeps
# the original query's OPERATOR shape and swaps the missing column for
# an equivalent predicate over the columns that exist)
# ---------------------------------------------------------------------

@register("q4_order_priority", """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS
    against the fact table feeding a count-by-priority. The driver
    schema has no l_commitdate/l_receiptdate, so the 'late line'
    predicate becomes ship-lag > 30 days — same semi-join shape
    (Catalyst plans the EXISTS as a left-semi hash join on orderkey)."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql("""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 30 DAYS)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")


@register("q6_revenue_forecast", """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
              CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure scan-filter-agg
    — every predicate pushes to the parquet scan and the whole query is
    one map-side partial + one exchange for the global sum. The plan to
    check at 100 TB: PushedFilters on shipdate/discount/quantity,
    no join, no window."""
    li = load_table(spark, "lineitem", sf_dir)
    return (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24))
        .agg((F.sum(_dec("l_extendedprice") * _dec("l_discount")))
             .cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lines")))


@register("q9_profit_by_nation", """
SELECT n_name AS nation,
       CAST(YEAR(o_orderdate) AS INT) AS o_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS sum_profit
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
WHERE p_name LIKE '%a%'
GROUP BY n_name, YEAR(o_orderdate)
ORDER BY nation, o_year
""")
def q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): the five-way star join —
    fact⋈fact (orders) shuffles on orderkey, the three dims broadcast.
    No ps_supplycost in the driver schema, so profit is the discounted
    revenue leg only; the LIKE filter on p_name prunes parts before the
    join exactly as in Q9."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    p = load_table(spark, "part", sf_dir).where(F.col("p_name").like("%a%"))
    amount = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
            .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(F.sum(amount).cast("double").alias("sum_profit"))
            .orderBy("nation", "o_year"))


@register("q12_priority_class", """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
""")
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority classes): conditional
    two-way counts over the orders⋈lineitem join. No l_shipmode /
    receipt-commit dates in the driver schema — the group key becomes
    l_returnflag and the lateness predicate ship-lag > 60 days; the
    CASE-IN aggregation shape is Q12's."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .where(F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("l_returnflag"))


@register("q13_customer_distribution", """
WITH c_orders AS (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
    GROUP BY c_custkey)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""")
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order distribution): left outer join with an
    extra join-side predicate (kept on the JOIN, not the WHERE — the
    rows it drops must still produce c_count=0 customers), then a
    second aggregation over the first's result — the classic
    'histogram of group sizes' double-agg."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (c.join(o, (c["c_custkey"] == o["o_custkey"])
                       & (o["o_orderpriority"] != "5-LOW"), "left_outer")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@register("q16_supplier_counts", """
SELECT p_brand, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#45'
  AND p_size IN (1, 9, 17, 25, 33, 41, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
""")
def q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): NOT IN
    (null-free) subquery planned as an anti-join, COUNT(DISTINCT) per
    group, negated + IN-list predicates on the dim. No partsupp table
    in the driver schema — lineitem is the part⋈supplier bridge, and
    the excluded-supplier set is acctbal < 0 (complaints stand-in)."""
    _views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql("""
        SELECT p_brand, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#45'
          AND p_size IN (1, 9, 17, 25, 33, 41, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_size""")


@register("q19_disjunctive_revenue", """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
              (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
""")
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): OR-of-ANDs predicate spanning
    both join sides. Catalyst extracts the common per-side conjuncts
    from the disjunction (l_quantity windows push to the lineitem scan,
    brand/size to the part scan) before the join — the optimization Q19
    exists to test. No p_container in the driver schema; size windows
    stand in."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    q, b, sz = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    disj = (((b == "Brand#12") & sz.between(1, 15) & q.between(1, 11))
            | ((b == "Brand#23") & sz.between(1, 25) & q.between(10, 20))
            | ((b == "Brand#34") & sz.between(1, 35) & q.between(20, 30)))
    rev = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .where(disj)
            .agg(F.sum(rev).cast("double").alias("revenue"),
                 F.count(F.lit(1)).alias("n_lines")))


@register("q22_dormant_customers", """
WITH threshold AS (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(*) AS avg_bal
    FROM customer WHERE c_acctbal > 0.0)
SELECT c_nationkey AS cntry,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, threshold
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY cntry
""")
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): scalar-subquery
    threshold (average positive balance — computed as one exact decimal
    sum with a single IEEE division, so the cut-off is bit-identical
    across engines) + NOT EXISTS anti-join against orders, grouped by
    country. No c_phone in the driver schema — c_nationkey is the
    country code; 'dormant' = no orders since 2000 (every synthetic
    customer has SOME order, so the unconditional anti-join would be
    a vacuous 0-row check)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql("""
        WITH threshold AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS avg_bal
            FROM customer WHERE c_acctbal > 0.0)
        SELECT c_nationkey AS cntry,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   AS totacctbal
        FROM customer CROSS JOIN threshold
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        GROUP BY c_nationkey
        ORDER BY cntry""")


# ---------------------------------------------------------------------
# TPC-H shapes, round 3 batch: correlated-MIN lookup (Q2), share ratio
# (Q8), HAVING vs scalar aggregate (Q11), argmax-by-equality (Q15),
# per-group-average correlated filter (Q17), aggregated IN-subquery
# (Q20), EXISTS + NOT EXISTS on the same fact (Q21). Together with the
# earlier batch this covers every TPC-H query plan family expressible
# over the driver schema (no partsupp / commit-receipt dates — each
# docstring notes the stand-in).
# ---------------------------------------------------------------------

_Q2_SQL = """
WITH cost AS (
    SELECT l_partkey, l_suppkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS supply_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost
FROM part
JOIN cost ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE p_size = 25 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
  AND supply_cost = (SELECT MIN(c2.supply_cost)
                     FROM cost c2
                     JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
                     JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
                     JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
                     WHERE c2.l_partkey = p_partkey
                       AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


@register("q2_min_cost_supplier", _Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): a correlated MIN scalar
    subquery over the same derived table the outer query joins —
    Catalyst rewrites it to an aggregate + join on the correlation key
    (p_partkey), never a per-row re-scan. No partsupp in the driver
    schema: per-(part,supplier) average sale price from lineitem stands
    in for ps_supplycost (exact decimal sum, one IEEE division, so the
    MIN and the equality test are bit-identical across engines)."""
    _views(spark, sf_dir, "lineitem", "part", "supplier", "nation",
           "region")
    return spark.sql(_Q2_SQL)


@register("q8_market_share", """
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_1' THEN
                CAST(l_extendedprice AS DECIMAL(18,2)) *
                (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS mkt_share,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
JOIN part     ON p_partkey = l_partkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
ORDER BY o_year
""")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): conditional-sum /
    total-sum ratio per year over a five-dim snowflake. The only
    shuffle-worthy join is lineitem⋈orders (both fact-sized) — every
    dimension is broadcast; the nation table enters twice under
    different roles (customer's vs supplier's), which exercises
    self-alias resolution. Share = one conditional decimal sum divided
    by one total decimal sum (both exact, single IEEE division).
    SUM(CASE WHEN .. THEN x END) with no ELSE is NULL for a year with
    zero matching lines in BOTH engines — kept without COALESCE on
    purpose."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    p = load_table(spark, "part", sf_dir).where(F.col("p_type") == "ECONOMY")
    n1 = load_table(spark, "nation", sf_dir).alias("n1")
    n2 = load_table(spark, "nation", sf_dir).alias("n2")
    r = load_table(spark, "region", sf_dir).where(F.col("r_name") == "AMERICA")
    vol = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    joined = (li
              .join(o.where(
                  (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                  & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))),
                  F.col("l_orderkey") == F.col("o_orderkey"))
              .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
              .join(F.broadcast(n1),
                    F.col("c_nationkey") == F.col("n1.n_nationkey"))
              .join(F.broadcast(r),
                    F.col("n1.n_regionkey") == F.col("r_regionkey"))
              .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
              .join(F.broadcast(n2),
                    F.col("s_nationkey") == F.col("n2.n_nationkey"))
              .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")))
    return (joined
            .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
            .agg((F.sum(F.when(F.col("n2.n_name") == "NATION_1", vol))
                  .cast("double")
                  / F.sum(vol).cast("double")).alias("mkt_share"),
                 F.count(F.lit(1)).alias("n_lines"))
            .orderBy("o_year"))


_Q11_SQL = """
SELECT l_partkey AS p_key,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS part_value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
GROUP BY l_partkey
HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
               CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) >
       (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 0.002
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3')
ORDER BY part_value DESC, p_key
"""


@register("q11_important_parts", _Q11_SQL)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): HAVING
    compared against an uncorrelated scalar aggregate of the SAME
    filtered join — planned as one reusable aggregate feeding a
    broadcast of a single row, not a re-scan per group. No partsupp:
    lineitem value (price×qty) per part over one nation's suppliers
    stands in for stock value. Both sides of the comparison are exact
    decimal sums cast to double (the threshold multiply is one IEEE
    op), so the cut is bit-identical."""
    _views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_Q11_SQL)


_Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
               (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


@register("q15_top_supplier", _Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): argmax by equality against an
    uncorrelated MAX scalar subquery over a shared CTE — the classic
    'view referenced twice' plan. The comparison and MAX run on the
    exact DECIMAL sum (cast to double only in the projection), so
    engines agree even when two suppliers tie to the cent."""
    _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q15_SQL)


_Q17_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity
                                   AS DECIMAL(18,2))) AS DOUBLE)
                                  / COUNT(*))
                    FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


@register("q17_small_qty_revenue", _Q17_SQL)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): per-part average
    correlated subquery — Catalyst decorrelates to an aggregate on
    l_partkey joined back to the filtered fact, so the fact table is
    scanned twice but never per-row. The per-part average is an exact
    decimal sum with one IEEE division then one multiply by 0.2,
    parenthesized identically on both engines."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17_SQL)


_Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) >
             CAST(100 AS DECIMAL(18,2)))
ORDER BY s_suppkey
"""


@register("q20_promo_suppliers", _Q20_SQL)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): IN-subquery whose
    inner query is itself a filtered aggregate with HAVING — plans as
    aggregate → left-semi join, the scalable 'suppliers who shipped
    enough of X' filter. No partsupp: shipped quantity over a year
    stands in for available stock; the HAVING threshold is an exact
    decimal comparison."""
    _views(spark, sf_dir, "supplier", "nation", "region", "lineitem",
           "part")
    return spark.sql(_Q20_SQL)


_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderstatus = 'F' AND r_name = 'ASIA'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1
                  FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


@register("q21_waiting_suppliers", _Q21_SQL)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting), computed
    with ONE pass over lineitem instead of the literal SQL's three
    (main + EXISTS + NOT EXISTS with its own orders re-join): per
    order, EXISTS(other supplier) ⇔ countDistinct(supplier) > 1, and
    NOT EXISTS(other LATE supplier) ⇔ countDistinct(late supplier) = 1
    given the row itself is late — so one slim groupBy(orderkey) feeds
    both quantifiers. orders broadcasts into the fact scan; the only
    fact shuffles are the orderkey aggregate and its rejoin (same key,
    AQE-coalesced); supplier⋈nation⋈region broadcasts at the end. No
    commit/receipt dates in the driver schema: 'late' = shipped more
    than 90 days after the order date. The oracle runs the literal
    EXISTS/NOT-EXISTS SQL — the rewrite must stay bit-equivalent."""
    lineitem = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderstatus") == "F")
    supplier = load_table(spark, "supplier", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).where(
        F.col("r_name") == "ASIA")

    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    # orders (even filtered to status 'F') is ~25% of fact bytes and
    # scales with SF — size-gate the hint: broadcast at bench scale,
    # shuffled join past the gate (AQE decides from runtime stats)
    lo = (lineitem.join(broadcast_if_small(orders),
                        lineitem["l_orderkey"] == orders["o_orderkey"])
          .select("l_orderkey", "l_suppkey", late.alias("is_late")))
    # two-stage distinct (same trick as hier_distinct_twostage): reduce
    # to (order, supplier) pairs first — map-side combinable, no Expand
    # operator — then count pairs per order. The per-pair LATE-ROW
    # COUNT rides the same aggregate (round 16): when an order
    # qualifies, EXACTLY ONE supplier is late (that is the filter), so
    # max(late supplier) and sum(late supplier's rows) recover the
    # qualifying rows WITHOUT rejoining the fact — the old
    # lo ⋈ stats rejoin re-executed the lineitem⋈orders branch,
    # i.e. a second full fact scan (guide §1.2 step 1). numwait is
    # then the SUM of late-row counts per supplier — integer-exact
    # equal to COUNT(*) over the rejoined rows.
    supp_state = (lo.groupBy("l_orderkey", "l_suppkey")
                  .agg(F.max("is_late").alias("supp_late"),
                       F.sum(F.col("is_late").cast("long"))
                       .alias("n_late_rows")))
    qual = (supp_state.groupBy("l_orderkey")
            .agg(F.count(F.lit(1)).alias("n_supp"),
                 F.sum(F.col("supp_late").cast("int")).alias("n_late_supp"),
                 F.max(F.when(F.col("supp_late"), F.col("l_suppkey")))
                 .alias("late_supp"),
                 F.sum(F.when(F.col("supp_late"),
                              F.col("n_late_rows"))).alias("late_rows"))
            .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)))
    asia_supp = (supplier
                 .join(F.broadcast(nation),
                       supplier["s_nationkey"] == nation["n_nationkey"])
                 .join(F.broadcast(region),
                       nation["n_regionkey"] == region["r_regionkey"])
                 .select("s_suppkey", "s_name"))
    return (qual.join(F.broadcast(asia_supp),
                      qual["late_supp"] == asia_supp["s_suppkey"])
            .groupBy("s_name")
            .agg(F.sum("late_rows").cast("long").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name"))


# ---------------------------------------------------------------------
# storage formats beyond parquet/CSV (r5)
# ---------------------------------------------------------------------

@register("q_multiformat_roundtrip", """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_price
FROM orders
GROUP BY o_orderpriority
ORDER BY priority
""")
def q_multiformat_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format-coverage twin of q_io_roundtrip: the same aggregate must
    survive a JSON-lines round-trip AND an ORC round-trip untouched.
    The measure stays DECIMAL(18,2) through both serializations (JSON
    renders decimals as exact numeric strings; an explicit read schema
    parses them back losslessly) and casts to double only at the end —
    any drift in either writer/reader breaks the value hash against
    the straight-from-parquet oracle."""
    import os
    import tempfile

    orders = load_table(spark, "orders", sf_dir)
    agg = (orders.groupBy(F.col("o_orderpriority").alias("priority"))
           .agg(F.count(F.lit(1)).alias("n_orders"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("decimal(18,2)").alias("total_price")))
    base = os.path.join(tempfile.gettempdir(), "spark-graft-multiformat",
                        spark.sparkContext.applicationId)
    json_path = os.path.join(base, "agg.jsonl")
    orc_path = os.path.join(base, "agg.orc")
    agg.write.mode("overwrite").json(json_path)
    back_json = (spark.read
                 .schema("priority string, n_orders bigint, "
                         "total_price decimal(18,2)")
                 .json(json_path))
    back_json.write.mode("overwrite").orc(orc_path)
    return (spark.read.orc(orc_path)
            .select("priority", "n_orders",
                    F.col("total_price").cast("double").alias("total_price"))
            .orderBy("priority"))


@register("q_partitioned_pruning", """
SELECT epoch_us(ts) // 86400000000 AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value
FROM events
WHERE event_type = 'purchase'
GROUP BY day
ORDER BY day
""")
def q_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned CTAS + partition-pruned read-back: events
    land in event_type=... directories; the filtered read must touch
    ONLY the purchase partition (the plan-shape test asserts the filter
    lands in PartitionFilters, not as a post-scan predicate). At 100 TB
    this is the difference between scanning one directory and the whole
    table — partition layout is the first-line pruning tool before
    row-group statistics."""
    import os
    import tempfile

    ev = load_table(spark, "events", sf_dir)
    base = os.path.join(tempfile.gettempdir(), "spark-graft-partitioned",
                        spark.sparkContext.applicationId, "events")
    (ev.write.mode("overwrite").partitionBy("event_type").parquet(base))
    back = spark.read.parquet(base).where(F.col("event_type") == "purchase")
    return (back
            .groupBy(F.expr("unix_micros(ts) div 86400000000").alias("day"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,3)")).cast("double")
                 .alias("sum_value"))
            .orderBy("day"))
