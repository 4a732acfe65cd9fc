"""Scale probe for the round-12 verbs: metadata-only ALTER, mapped-
read overhead, the NOT-MATCHED-BY-SOURCE victim scan bound, and the
streaming row read's incremental cost.

The 100 TB claims under test:
1. ``alter_zordered`` cost is FLAT in table size (one manifest
   read + one manifest write — no data IO), so renaming a column on a
   100 TB table costs what it costs on a 100 MB one.
2. A read through the column mapping adds only a Project — full-scan
   and box-read wall-clock within noise of the unmapped table.
3. A conditional NOT MATCHED BY SOURCE merge rewrites ONLY the
   buckets holding affected rows (victim-scan bound), not the table.
4. A table-stream drain after one append costs batch-time, not
   snapshot-time.

Usage: python scripts/alter_probe.py [rows ...] (default 200000 2000000)
Output: one JSON line per measurement.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from aggregation_duckdb_spark.session import get_spark  # noqa: E402
from aggregation_duckdb_spark.sources import layout as L  # noqa: E402


def frame(spark, n):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 10_000).alias("a"),
        ((F.col("id") * 7919) % 10_000).alias("b"),
        (F.col("id") * 2).alias("val"),
        F.concat(F.lit("payload-"), F.col("id")).alias("txt"))


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - t0, 3)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [200_000, 2_000_000]
    spark = get_spark("alter-probe",
                      extra_confs={"spark.ui.enabled": "false"})
    root = tempfile.mkdtemp(prefix="alter_probe_")
    for n in sizes:
        p = f"{root}/t{n}"
        L.write_zordered(frame(spark, n), p, "a", "b",
                         bits=8, bucket_bits=6)
        _, read_plain = t(lambda: L.read_zordered(spark, p).count())
        _, box_plain = t(lambda: L.read_zordered_box(
            spark, p, 0, 500, 0, 500).count())
        _, alter_s = t(lambda: L.alter_zordered(
            spark, p, renames={"val": "value"}, drops=["txt"],
            adds={"lang": {"type": "string", "default": "en"}}))
        c_mapped, read_mapped = t(
            lambda: L.read_zordered(spark, p).count())
        _, box_mapped = t(lambda: L.read_zordered_box(
            spark, p, 0, 500, 0, 500).count())
        assert c_mapped == n
        print(json.dumps({
            "probe": "alter", "rows": n, "alter_seconds": alter_s,
            "full_read_plain_s": read_plain,
            "full_read_mapped_s": read_mapped,
            "box_read_plain_s": box_plain,
            "box_read_mapped_s": box_mapped}), flush=True)

        # NMBS: source covers keys whose (a, b) fall in a narrow box;
        # the conditional delete targets stale rows ONLY in that box,
        # so the victim scan must bound the rewrite to those buckets
        src = (frame(spark, n)
               .where((F.col("a") < 300) & (F.col("b") < 300)
                      & (F.col("k") % 2 == 0))
               .withColumnRenamed("val", "value").drop("txt"))
        total_buckets = len(L.read_manifest(spark, p)["gens"])
        res, merge_s = t(lambda: L.merge_zordered(
            src, p, ["k"],
            when_matched_update={"value": "s.value"},
            when_not_matched_by_source_delete=(
                "t.a < 300 AND t.b < 300"),
            when_not_matched_insert=False))
        print(json.dumps({
            "probe": "merge_nmbs", "rows": n,
            "buckets_rewritten": res["buckets_rewritten"],
            "total_buckets": total_buckets,
            "merge_seconds": merge_s}), flush=True)

        # stream read: initial drain pays the snapshot once; a drain
        # after ONE small append costs batch-time, not snapshot-time
        from aggregation_duckdb_spark.streaming import (
            read_table_stream, run_table_stream)
        sink, ckpt = f"{p}/_rows", f"{p}/_rows_ckpt"
        # fresh history retained for the stream
        p2 = f"{root}/s{n}"
        L.write_zordered(frame(spark, n), p2, "a", "b",
                         bits=8, bucket_bits=6, vacuum=False)
        sink, ckpt = f"{root}/sink{n}", f"{root}/ckpt{n}"
        _, drain0 = t(lambda: run_table_stream(spark, p2, sink, ckpt))
        L.append_zordered(frame(spark, 1000)
                          .withColumn("k", F.col("k") + n), p2)
        _, drain1 = t(lambda: run_table_stream(spark, p2, sink, ckpt))
        got = read_table_stream(spark, sink).count()
        assert got == n + 1000, got
        print(json.dumps({
            "probe": "stream_read", "rows": n,
            "initial_drain_s": drain0,
            "incremental_drain_s": drain1}), flush=True)


if __name__ == "__main__":
    main()
