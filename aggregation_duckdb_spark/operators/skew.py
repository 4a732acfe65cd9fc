"""Skew handling: explicit key salting for shuffle joins.

AQE's skew-join splitter handles most skew automatically (enabled in
session.py), but it only fires on sort-merge joins past size
thresholds. This is the explicit form for when you KNOW a key is hot
(a null-ish default key, a mega-customer, boilerplate content): spread
the probe side across ``salt_buckets`` sub-keys derived from a
uniform-ish column, replicate the build side once per bucket, join on
(key, salt). Result is provably identical to the plain join — the
oracle entry asserts it — at the cost of a build side ``salt_buckets``×
larger (still trivial for dimension tables).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(facts: DataFrame, dim: DataFrame, fact_key: str | Column,
                dim_key: str | Column, salt_buckets: int = 8,
                salt_source: str | Column | None = None,
                how: str = "inner") -> DataFrame:
    """facts ⋈ dim on key, with the fact side salted across
    ``salt_buckets`` partitions per key.

    ``salt_source``: a fact column whose hash spreads rows (a unique id
    is ideal). Deterministic — no rand(), so results are reproducible
    and retry-safe (a rand() salt changes on task retry, which can
    duplicate or drop rows under speculative execution). Default:
    ``spark_partition_id()`` — hot-key rows already span input
    partitions before the shuffle, so the partition id spreads them;
    NEVER the join key itself (constant per key ⇒ no spread).

    Only fact-preserving join types are valid: the build side is
    replicated per bucket, so right/full outer would emit
    ``salt_buckets`` null-extended copies of unmatched build rows."""
    if how.replace("_", "") not in ("inner", "left", "leftouter",
                                    "leftsemi", "semi", "leftanti", "anti",
                                    "cross"):
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched "
            "replicated build rows would duplicate under right/full outer")
    src_col = (F.xxhash64(F.col(salt_source)
                          if isinstance(salt_source, str) else salt_source)
               if salt_source is not None else F.spark_partition_id())
    salted_facts = facts.withColumn(
        "__salt", F.pmod(src_col, F.lit(salt_buckets)))
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    # resolve string keys against their own side — bare F.col would be
    # AMBIGUOUS_REFERENCE when both frames share the key column name
    fk_r = salted_facts[fact_key] if isinstance(fact_key, str) else fact_key
    dk_r = replicated_dim[dim_key] if isinstance(dim_key, str) else dim_key
    out = salted_facts.join(
        replicated_dim,
        (fk_r == dk_r) & (salted_facts["__salt"] == replicated_dim["__salt"]),
        how)
    return out.drop("__salt")


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Key-distribution diagnostic — the measurement you take BEFORE
    choosing between a plain shuffle join, :func:`salted_join`, and a
    broadcast: how many distinct keys exist, how lopsided the group
    sizes are (continuous p50/p90/p99 — Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the interpolation formula), the
    biggest group, and what share of ALL rows the hottest key owns
    (``top1_share`` ≈ the fraction of the shuffle that lands on one
    task if you do nothing).

    Two map-side-combinable aggregations, key-cardinality intermediate
    (never row-sized): counts per key, then scalars over the counts —
    the second stage is dictionary-sized, so its single-partition
    aggregate is the right plan, not a bottleneck.

    Returns one row: (n_keys, n_rows, p50, p90, p99, max_count,
    top1_share)."""
    counts = (df.groupBy(F.col(key_col).alias("__k"))
              .agg(F.count(F.lit(1)).alias("__n")))
    return counts.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("__n").cast("long").alias("n_rows"),
        F.expr("percentile(__n, 0.5)").alias("p50"),
        F.expr("percentile(__n, 0.9)").alias("p90"),
        F.expr("percentile(__n, 0.99)").alias("p99"),
        F.max("__n").cast("long").alias("max_count"),
        (F.max("__n").cast("double") / F.sum("__n").cast("double"))
        .alias("top1_share"))
