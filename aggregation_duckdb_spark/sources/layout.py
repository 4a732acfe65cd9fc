"""Z-order (Morton-curve) data layout for multi-dimensional pruning.

The 100 TB problem this solves: a table laid out by ONE key prunes
scans on that key only — a box predicate over TWO columns (user AND
time, custkey AND date) still reads every file on the second
dimension. Interleaving the bits of both keys (the Z / Morton value)
and clustering storage by that value gives every coarse Z prefix a
small bounding box in BOTH dimensions, so a 2-D box predicate maps to
a small set of Z "buckets" — the same layout trick Delta Lake's
``OPTIMIZE ZORDER BY`` and DuckDB/Parquet min-max pruning exploit
(public knowledge; no proprietary system involved).

Mechanics here, all deterministic and engine-neutral:

- :func:`zvalue` builds the interleaved value as pure integer
  arithmetic on binned coordinates — JVM-side, whole-stage-codegen'd,
  no UDF (the bit picks are ``div``/``%`` with Python-int constants,
  so no shift-by-column limitation applies).
- :func:`write_zordered` writes the table partitioned by the top
  ``bucket_bits`` of the Z value (one directory per coarse Z cell) and
  Z-sorted within each bucket, so engines that read footers also get
  row-group locality. Dimension bounds ride along in a sidecar JSON.
- :func:`zbuckets_for_box` is the planning half: enumerate the coarse
  Z cells (pure Python over 2^bucket_bits candidates — bucket_bits is
  small by design) and keep those whose 2-D cell intersects the query
  box. :func:`read_zordered_box` attaches the resulting ``zbucket IN
  (...)`` predicate, which Spark prunes as PARTITION directories at
  plan time (visible as PartitionFilters in explain) — the box filter
  itself still applies row-exactly, so results are identical to a
  full scan with the same box (pinned by tests/test_sources.py).

Bucket sizing at scale: 2^bucket_bits directories must each hold many
files of healthy size (hundreds of MB); bucket_bits 6-10 covers
100 TB-class tables. Locally the default 4 (16 dirs) keeps sf-scale
file counts sane.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

BOUNDS_FILE = "_zorder_bounds.json"


def bin_col(c: Column, lo: int, hi: int, bits: int) -> Column:
    """Linear bin of ``c`` into [0, 2^bits), clamped at the edges."""
    n = 1 << bits
    span = hi - lo + 1
    scaled = (c.cast("long") - F.lit(lo)) * F.lit(n)
    binned = ((scaled - (scaled % F.lit(span))) / F.lit(span)).cast("long")
    return F.greatest(F.lit(0).cast("long"),
                      F.least(F.lit(n - 1).cast("long"), binned))


def interleave(a_bin: Column, b_bin: Column, bits: int) -> Column:
    """Morton value: bit i of ``a_bin`` lands at position 2i, bit i of
    ``b_bin`` at 2i+1. Constants are Python ints, so the whole thing
    is a flat integer expression (no shift-by-column needed)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        p = 1 << i
        # bit i of x = (x div p) % 2; the subtraction keeps the
        # double-typed `/` exact (numerator exactly divisible)
        a_i = (((a_bin - (a_bin % F.lit(p))) / F.lit(p)).cast("long")
               % F.lit(2))
        b_i = (((b_bin - (b_bin % F.lit(p))) / F.lit(p)).cast("long")
               % F.lit(2))
        z = z + a_i * F.lit(1 << (2 * i)) + b_i * F.lit(1 << (2 * i + 1))
    return z.cast("long")


def zvalue(a: Column, b: Column, a_range: tuple[int, int],
           b_range: tuple[int, int], bits: int = 8) -> Column:
    """Z/Morton value of two numeric columns over known bounds."""
    return interleave(bin_col(a, *a_range, bits),
                      bin_col(b, *b_range, bits), bits)


def numeric_bounds(df: DataFrame, a_col: str, b_col: str) -> dict:
    """Exact integer min/max of both layout dimensions — one scalar
    aggregate (4 values collected: the sanctioned model-sized class)."""
    r = df.agg(F.min(F.col(a_col).cast("long")).alias("a_lo"),
               F.max(F.col(a_col).cast("long")).alias("a_hi"),
               F.min(F.col(b_col).cast("long")).alias("b_lo"),
               F.max(F.col(b_col).cast("long")).alias("b_hi")).collect()[0]
    return {"a_lo": r.a_lo, "a_hi": r.a_hi, "b_lo": r.b_lo, "b_hi": r.b_hi}


def write_zordered(df: DataFrame, path: str, a_col: str, b_col: str,
                   bits: int = 8, bucket_bits: int = 4,
                   bounds: dict | None = None,
                   files_per_bucket: int = 1) -> dict:
    """Write ``df`` Z-clustered on (a_col, b_col): one directory per
    coarse Z bucket (top ``bucket_bits`` of the Z value), Z-sorted
    within buckets. Returns the layout spec (also persisted as a
    sidecar JSON next to the data so readers need no coordination).

    ``files_per_bucket`` splits each bucket across that many write
    tasks (salted by the NEXT z bits below the bucket prefix, so each
    file still covers a contiguous z run): at 100 TB a bucket holds
    terabytes and cannot funnel through one task; locally 1 keeps
    file counts sane."""
    if bounds is None:
        bounds = numeric_bounds(df, a_col, b_col)
    spec = {"a_col": a_col, "b_col": b_col, "bits": bits,
            "bucket_bits": bucket_bits, **bounds}
    z = zvalue(F.col(a_col), F.col(b_col),
               (bounds["a_lo"], bounds["a_hi"]),
               (bounds["b_lo"], bounds["b_hi"]), bits)
    shift = 1 << (2 * bits - bucket_bits)
    zb = ((z - (z % F.lit(shift))) / F.lit(shift)).cast("long")
    salt_shift = max(shift // max(files_per_bucket, 1), 1)
    salt = ((z - (z % F.lit(salt_shift))) / F.lit(salt_shift)).cast("long")
    (df.withColumn("__z", z).withColumn("zbucket", zb)
       .withColumn("__salt", salt)
       .repartition("zbucket", "__salt")
       .sortWithinPartitions("zbucket", "__z")
       .drop("__z", "__salt")
       .write.mode("overwrite").partitionBy("zbucket").parquet(path))
    with open(os.path.join(path, BOUNDS_FILE), "w") as f:
        json.dump(spec, f)
    return spec


def _deinterleave(bucket: int, k_a: int, k_b: int) -> tuple[int, int]:
    """Split a bucket id back into its (a, b) high-bit prefixes. The
    bucket is the TOP bucket_bits of the Z value; z bit 2i belongs to
    a, 2i+1 to b, so within the bucket the parity of the global bit
    position decides the dimension."""
    a = b = 0
    # bucket bits, MSB first, map to global z bits [2*bits-1 .. 2*bits-k]
    k = k_a + k_b
    for j in range(k):
        bit = (bucket >> (k - 1 - j)) & 1
        if j % 2 == 0:  # highest remaining z bit is the b dimension (2i+1)
            b = (b << 1) | bit
        else:
            a = (a << 1) | bit
    return a, b


def zbuckets_for_box(spec: dict, a_lo: int, a_hi: int,
                     b_lo: int, b_hi: int) -> list[int]:
    """Every coarse Z bucket whose 2-D cell intersects the query box —
    pure Python over 2^bucket_bits candidates (the planning-time half
    of the index; bucket_bits is small by design, so this is a bounded
    driver-side loop, not a data scan)."""
    bits, kb = spec["bits"], spec["bucket_bits"]
    k_b = (kb + 1) // 2    # b owns the higher z bit of each pair, so it
    k_a = kb - k_b         # gets the extra bit when bucket_bits is odd
    # query box -> bin ranges (same arithmetic as bin_col, floor div)
    def to_bin(v: int, lo: int, hi: int) -> int:
        n = 1 << bits
        span = hi - lo + 1
        return max(0, min(n - 1, ((v - lo) * n) // span))
    qa = (to_bin(a_lo, spec["a_lo"], spec["a_hi"]),
          to_bin(a_hi, spec["a_lo"], spec["a_hi"]))
    qb = (to_bin(b_lo, spec["b_lo"], spec["b_hi"]),
          to_bin(b_hi, spec["b_lo"], spec["b_hi"]))
    out = []
    for bucket in range(1 << kb):
        a_pre, b_pre = _deinterleave(bucket, k_a, k_b)
        # the cell spans full low bits below each prefix
        a_cell = (a_pre << (bits - k_a), ((a_pre + 1) << (bits - k_a)) - 1)
        b_cell = (b_pre << (bits - k_b), ((b_pre + 1) << (bits - k_b)) - 1)
        if a_cell[0] <= qa[1] and qa[0] <= a_cell[1] \
                and b_cell[0] <= qb[1] and qb[0] <= b_cell[1]:
            out.append(bucket)
    return out


def read_spec(path: str) -> dict:
    with open(os.path.join(path, BOUNDS_FILE)) as f:
        return json.load(f)


def read_zordered_box(spark: SparkSession, path: str,
                      a_lo: int, a_hi: int, b_lo: int, b_hi: int,
                      spec: dict | None = None) -> DataFrame:
    """Scan a Z-ordered table under a 2-D box predicate: the coarse
    ``zbucket IN (...)`` list prunes PARTITION DIRECTORIES at plan
    time (PartitionFilters in explain — never listed, never read);
    the exact box filter keeps row-level semantics identical to a
    full-scan filter (results are provably equal: the bucket list is
    a superset of every bucket the box can touch)."""
    if spec is None:
        spec = read_spec(path)
    buckets = zbuckets_for_box(spec, a_lo, a_hi, b_lo, b_hi)
    a, b = F.col(spec["a_col"]), F.col(spec["b_col"])
    return (spark.read.parquet(path)
            .where(F.col("zbucket").isin(buckets))
            .where((a >= a_lo) & (a <= a_hi) & (b >= b_lo) & (b <= b_hi)))


DELTA_DIR = "_delta"


def append_zordered(df: DataFrame, path: str) -> None:
    """Append a batch WITHOUT re-clustering: rows land in a delta
    area that box reads scan in full until the next compaction — the
    standard layered-layout contract (Delta Lake's OPTIMIZE shape):
    ingest stays cheap and layout quality degrades gracefully with
    delta size instead of blocking on a rewrite. Out-of-bounds values
    are fine by construction even after compaction-time rebinning:
    binning CLAMPS, so an outlier lands in an edge bucket, and a box
    that could match it always includes that edge bucket (the planner
    clamps the box the same way)."""
    import uuid
    df.write.mode("append").parquet(
        os.path.join(path, DELTA_DIR, uuid.uuid4().hex))


def compact_zordered(spark: SparkSession, path: str,
                     files_per_bucket: int = 1) -> dict:
    """Fold the delta area back into the Z-clustered layout: one
    rewrite of main + delta with bounds recomputed over the union
    (restoring bin selectivity if the delta stretched the value
    range), then the delta is cleared. The rewrite goes through a
    staging directory so a reader never sees a half-compacted
    table."""
    import shutil
    spec = read_spec(path)
    main = (spark.read.parquet(path).drop("zbucket"))
    delta_path = os.path.join(path, DELTA_DIR)
    frames = [main]
    if os.path.isdir(delta_path):
        for d in sorted(os.listdir(delta_path)):
            frames.append(spark.read.parquet(os.path.join(delta_path, d)))
    full = frames[0]
    for f in frames[1:]:
        full = full.unionByName(f)
    staging = path.rstrip("/") + ".compacting"
    new_spec = write_zordered(full, staging, spec["a_col"], spec["b_col"],
                              bits=spec["bits"],
                              bucket_bits=spec["bucket_bits"],
                              files_per_bucket=files_per_bucket)
    shutil.rmtree(path)
    os.rename(staging, path)
    return new_spec


def read_zordered_box_with_delta(spark: SparkSession, path: str,
                                 a_lo: int, a_hi: int, b_lo: int,
                                 b_hi: int) -> DataFrame:
    """Box read over the layered table: the clustered main area reads
    through the pruned-bucket path; any delta batches are filtered by
    the box alone (they are small between compactions — that is the
    contract). Results equal a full-scan filter over main ∪ delta."""
    spec = read_spec(path)
    out = read_zordered_box(spark, path, a_lo, a_hi, b_lo, b_hi, spec)
    out = out.drop("zbucket")
    delta_path = os.path.join(path, DELTA_DIR)
    if os.path.isdir(delta_path):
        a, b = F.col(spec["a_col"]), F.col(spec["b_col"])
        for d in sorted(os.listdir(delta_path)):
            dd = (spark.read.parquet(os.path.join(delta_path, d))
                  .where((a >= a_lo) & (a <= a_hi)
                         & (b >= b_lo) & (b <= b_hi)))
            out = out.unionByName(dd)
    return out
