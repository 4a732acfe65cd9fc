"""Range and interval joins without nested loops.

The reference has no non-equi joins (SURVEY §2.3: "Not present ...
theta/range/as-of/interval joins"); these are the beyond-reference
operators a 100 TB pipeline needs the moment a join key is a RANGE
(value bands, IP blocks, time windows) instead of a value. Spark
plans a join whose ON clause has no equality as a
BroadcastNestedLoopJoin — every fact row probes every band, O(N·B),
catastrophic when the band table is large. The fix is the classic
bucketize-to-equi-join rewrite:

- point-in-interval: each interval explodes into the fixed-width
  buckets it covers; each fact row maps to exactly ONE bucket
  (``floor(value / width)``); the join becomes an equi-join on the
  bucket key plus a residual exact predicate. No duplicates are
  possible — a (fact, band) pair meets only in the fact's bucket.
- interval-overlap: BOTH sides explode into covered buckets, so an
  overlapping pair can meet in several buckets; instead of a
  ``distinct`` (an extra shuffle over the whole result), each pair is
  claimed exactly once by the bucket containing the later of the two
  interval starts — an in-row filter.

Bucket width is the tuning knob: explosion factor for a side is
``avg_interval_len / width + 1`` rows, and residual-filter waste grows
as width exceeds typical interval length. Both joins stay pure
equi-joins (shuffle- or broadcast-hash; AQE picks), which the plan
tests pin (no BroadcastNestedLoopJoin / CartesianProduct).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket_of(col: Column, width: float | int) -> Column:
    return F.floor(col / F.lit(width)).cast("long")


def bucketed_range_join(facts: DataFrame, bands: DataFrame,
                        value_col: str, lo_col: str = "lo",
                        hi_col: str = "hi",
                        bucket_width: float | int = 1,
                        broadcast_bands: bool = True) -> DataFrame:
    """Join fact rows to the interval(s) containing them:
    ``lo <= value < hi`` — as a bucket equi-join, never a nested loop.

    ``bands`` may overlap (a fact then matches several bands — each
    exactly once). Facts outside every band drop (inner join).
    ``broadcast_bands`` force-broadcasts the exploded band table; pass
    False for band tables too large to broadcast (the join then
    shuffles both sides on the bucket key — still an equi-join).
    """
    if not bucket_width > 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    common = set(facts.columns) & set(bands.columns)
    if common:
        # an overlapping name makes the residual predicate silently
        # ambiguous (Spark resolves by fiat) — fail loudly instead
        raise ValueError(f"bucketed_range_join: rename columns present "
                         f"on both sides first: {sorted(common)}")
    v = F.col(value_col)
    fb = facts.withColumn("__rjb", _bucket_of(v, bucket_width))
    bb = bands.withColumn(
        "__rjb",
        F.explode(F.sequence(_bucket_of(F.col(lo_col), bucket_width),
                             _bucket_of(F.col(hi_col), bucket_width))))
    if broadcast_bands:
        bb = F.broadcast(bb)
    return (fb.join(bb, "__rjb")
            .where((v >= F.col(lo_col)) & (v < F.col(hi_col)))
            .drop("__rjb"))


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          left_start: str, left_end: str,
                          right_start: str, right_end: str,
                          bucket_width: float | int = 1,
                          broadcast_right: bool = False) -> DataFrame:
    """All (left, right) pairs whose closed intervals overlap:
    ``left_start <= right_end AND right_start <= left_end`` — as a
    bucket equi-join with an in-row claim filter instead of a
    ``distinct``.

    Both sides explode into the buckets their interval covers; a pair
    overlapping across k shared buckets would appear k times, so only
    the bucket containing ``greatest(left_start, right_start)`` (which
    any overlapping pair shares by construction) emits it. Start/end
    columns must be numeric (cast timestamps with ``unix_micros``
    first); interval ends are inclusive.
    """
    if not bucket_width > 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    common = set(left.columns) & set(right.columns)
    if common:
        raise ValueError(f"interval_overlap_join: rename columns present "
                         f"on both sides first: {sorted(common)}")
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    lb = left.withColumn(
        "__ivb", F.explode(F.sequence(_bucket_of(ls, bucket_width),
                                      _bucket_of(le, bucket_width))))
    rb = right.withColumn(
        "__ivb", F.explode(F.sequence(_bucket_of(rs, bucket_width),
                                      _bucket_of(re_, bucket_width))))
    if broadcast_right:
        rb = F.broadcast(rb)
    claim = _bucket_of(F.greatest(ls, rs), bucket_width)
    return (lb.join(rb, "__ivb")
            .where((ls <= re_) & (rs <= le) & (F.col("__ivb") == claim))
            .drop("__ivb"))
