"""Deep-hierarchy probe (round-11 verdict item 8): the BFS flatten
loop's production evidence was depth-3 dims — this drives a synthetic
depth-12 / 1M-node tree through the SAME distributed loop
(`hierarchy/core.py flattened()`, local fast-path disabled by size)
and records:

- per-level checkpoint cost (each loop iteration's `materialize` is
  timed in place via a wrapper — no probe-side reimplementation of
  the loop, so the readings are the engine's own);
- the closure-size law: closure rows == Σ node depths (explode of the
  root-to-node path — no second recursion);
- parity of the Spark 4 `WITH RECURSIVE` twin
  (`closure_recursive_sql`) against the BFS closure on the full tree
  (count + both-ways exceptAll on the keyed projection).

Output: JSON lines (one per section) for SCALE_PROBE_r12.md.

Usage: python scripts/deep_hierarchy_probe.py [total_nodes]
       (default 1_000_000, depth fixed at 12)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from aggregation_duckdb_spark.hierarchy import core as hcore  # noqa: E402
from aggregation_duckdb_spark.session import get_spark  # noqa: E402

# geometric-ish fan-out, depth 12; the last three levels carry the
# bulk (the org-chart / product-taxonomy shape: most nodes are leaves)
LEVEL_SIZES = [1, 4, 16, 64, 256, 1024, 4096, 16384, 65536,
               160000, 300000, 452619]
assert sum(LEVEL_SIZES) == 1_000_000 and len(LEVEL_SIZES) == 12


def level_sizes(total: int) -> list[int]:
    if total == 1_000_000:
        return LEVEL_SIZES
    scale = total / 1_000_000
    sizes = [max(1, int(s * scale)) for s in LEVEL_SIZES]
    sizes[-1] += total - sum(sizes)
    return sizes


def build_tree(spark, sizes: list[int]):
    """Deterministic synthetic tree, JVM-side: level L's node j points
    at parent (j % size_{L-1}) of level L-1 — no RNG, reproducible,
    every level fully reachable from the single root."""
    offsets = [0]
    for s in sizes:
        offsets.append(offsets[-1] + s)
    frames = []
    for lv, s in enumerate(sizes):
        off = offsets[lv]
        df = spark.range(s).select(
            F.format_string("n%09d", F.col("id") + off).alias("node_id"),
            (F.lit(None).cast("string") if lv == 0 else
             F.format_string("n%09d", (F.col("id") % sizes[lv - 1])
                             + offsets[lv - 1])).alias("parent_node_id"),
            F.format_string("k%09d", F.col("id") + off)
            .alias("node_natural_key"),
            F.format_string("node %d", F.col("id") + off)
            .alias("node_name"),
            F.lit(f"L{lv + 1}").alias("level_name"))
        frames.append(df)
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.repartition(32).localCheckpoint(eager=True)


def main() -> None:
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    sizes = level_sizes(total)
    depth = len(sizes)
    spark = get_spark("deep-hier-probe",
                      extra_confs={"spark.ui.enabled": "false"})
    spark.range(1000).selectExpr("sum(id)").collect()  # JVM warmup
    nodes = build_tree(spark, sizes)
    n = nodes.count()
    print(f"# tree: {n} nodes, depth {depth}, level sizes {sizes}",
          file=sys.stderr)

    # time each loop-level materialization IN the engine's own loop
    level_times: list[float] = []
    real_materialize = hcore.materialize

    def timed_materialize(df):
        t0 = time.time()
        out = real_materialize(df)
        level_times.append(round(time.time() - t0, 2))
        return out

    hcore.materialize = timed_materialize
    try:
        h = hcore.Hierarchy(nodes)
        t0 = time.time()
        flat = h.flattened()
        n_flat = flat.count()
        t_flatten = round(time.time() - t0, 2)
    finally:
        hcore.materialize = real_materialize
    assert n_flat == n, f"flatten lost nodes: {n_flat} != {n}"
    assert h.depth == depth
    # level_times = [anchor, step1..step12 (last one empty), final flat
    # w/ the global DFS window] — label them
    rec = {"probe": "flatten", "nodes": n, "depth": depth,
           "flatten_seconds": t_flatten,
           "anchor_seconds": level_times[0],
           "per_level_seconds": level_times[1:-1],
           "dfs_order_window_seconds": level_times[-1]}
    print(json.dumps(rec))

    # closure-size law: rows == Σ node depths
    expected = sum((lv + 1) * s for lv, s in enumerate(sizes))
    t0 = time.time()
    closure = h.closure()
    n_closure = closure.count()
    t_closure = round(time.time() - t0, 2)
    assert n_closure == expected, (n_closure, expected)
    print(json.dumps({"probe": "closure", "rows": n_closure,
                      "expected_sum_depths": expected,
                      "seconds": t_closure}))

    # WITH RECURSIVE twin parity on the full tree
    keyed = ["ancestor_node_natural_key", "descendant_node_natural_key",
             "net_level"]
    t0 = time.time()
    rec_sql = h.closure_recursive_sql().select(*keyed)
    n_rec = rec_sql.count()
    t_rec = round(time.time() - t0, 2)
    bfs = closure.select(*keyed)
    missing = bfs.exceptAll(rec_sql).count()
    extra = rec_sql.exceptAll(bfs).count()
    print(json.dumps({"probe": "recursive_twin_parity", "rows": n_rec,
                      "seconds": t_rec, "missing_vs_bfs": missing,
                      "extra_vs_bfs": extra,
                      "parity": missing == 0 and extra == 0}))
    assert missing == 0 and extra == 0


if __name__ == "__main__":
    main()
