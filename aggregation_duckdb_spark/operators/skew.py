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
