"""ANN quality/latency curve on the organic sf1 embeddings —
recall@10 vs wall time for brute force, IVF (n_probe 1/2/4), and PQ
(raw ADC vs shortlist+rerank). Evidence for the 100 TB ANN story's
accuracy/cost trade-off (round-9 verdict item 8); results recorded in
SCALE_PROBE_r10.md.

Usage: python scripts/ann_curve.py [sf_dir]   (default: repo/.sf1data)
       python scripts/ann_curve.py --synth N  (deterministic synthetic
           corpus of N vectors — the CROSSOVER probe: the organic sf1
           corpus (20k) sits below the point where index pruning beats
           brute force; a 200k run locates the crossover itself,
           completing SCALE_PROBE_r10 §1's reading. Round-10 verdict
           item 8; results in SCALE_PROBE_r11.md.)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

K = 10
N_QUERIES = 20
DIM = 64


def topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def recall(got: dict[int, set[int]], truth: dict[int, set[int]]) -> float:
    per = [len(got.get(q, set()) & n) / len(n) for q, n in truth.items()]
    return round(sum(per) / len(per), 4)


def timed(fn):
    t0 = time.time()
    out = topk_sets(fn())
    return out, round(time.time() - t0, 2)


def synth_corpus(spark, n: int, dim: int):
    """Deterministic synthetic embeddings, JVM-side (no Python in the
    generation path): component j of vector i is a fixed mixing of
    (i, j) folded into [-1, 1] — reproducible across runs, no RNG, and
    clustered enough (low-frequency term) that IVF cells are
    non-degenerate."""
    from pyspark.sql import functions as F
    cols = [((F.pmod(F.col("id") * (2654435761 + 7 * j) + 13 * j,
                     F.lit(997)) / F.lit(498.0)) - F.lit(1.0)
             + (F.pmod(F.col("id"), F.lit(8)) == (j % 8)).cast("int")
             ).cast("float")
            for j in range(dim)]
    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.array(*cols).alias("embedding"))


def main() -> None:
    from pyspark.sql import functions as F

    from aggregation_duckdb_spark.operators import similarity as S
    from aggregation_duckdb_spark.session import get_spark

    spark = get_spark("ann-curve", extra_confs={"spark.ui.enabled": "false"})
    if len(sys.argv) > 2 and sys.argv[1] == "--synth":
        emb = synth_corpus(spark, int(sys.argv[2]), DIM).localCheckpoint()
        sf_dir = f"synth-{sys.argv[2]}"
    else:
        sf_dir = sys.argv[1] if len(sys.argv) > 1 \
            else os.path.join(REPO, ".sf1data")
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    queries = emb.orderBy("vec_id").limit(N_QUERIES)
    print(f"# corpus {n} vectors, {N_QUERIES} queries, k={K}",
          file=sys.stderr)
    rows = []

    truth, t_bf = timed(lambda: S.brute_force_topk(emb, queries, k=K))
    rows.append({"method": "brute_force", "recall_at_10": 1.0,
                 "seconds": t_bf})

    t0 = time.time()
    # cells scale with the corpus (~sqrt rule, floored at the organic
    # run's 32 for comparability): fixed 32 cells at 200k would leave
    # 6k-vector cells and understate the index
    n_cells = max(32, min(256, int(n ** 0.5 // 16 * 16)))
    cents = S.kmeans_fit(emb, k=n_cells, max_iters=4)
    cents = spark.createDataFrame(cents.collect(), cents.schema)  # pin fit
    fit_ivf = round(time.time() - t0, 2)
    for probe in (1, 2, 4):
        got, t = timed(lambda p=probe: S.ivf_topk(emb, queries, cents,
                                                  k=K, n_probe=p))
        rows.append({"method": f"ivf_probe{probe}", "cells": n_cells,
                     "recall_at_10": recall(got, truth), "seconds": t,
                     "fit_seconds": fit_ivf})

    # the INDEXED road — where the crossover actually lives: the
    # live ivf_topk re-assigns the whole corpus to cells per call
    # (n_cells x corpus distances, dwarfing the query), while the
    # durable index pays assignment once at build and each query scans
    # only its probed cells' partitions
    import tempfile
    t0 = time.time()
    ivf_path = os.path.join(tempfile.mkdtemp(prefix="ann-curve-"),
                            "ivf_idx")
    S.write_ivf_index(emb, cents, ivf_path)
    build_ivf = round(time.time() - t0, 2)
    for probe in (1, 2, 4):
        got, t = timed(lambda p=probe: S.ivf_topk_indexed(
            spark, ivf_path, queries, k=K, n_probe=p))
        rows.append({"method": f"ivf_indexed_probe{probe}",
                     "cells": n_cells,
                     "recall_at_10": recall(got, truth), "seconds": t,
                     "build_seconds": build_ivf,
                     "fit_seconds": fit_ivf})

    t0 = time.time()
    books = S.pq_fit(emb, num_subspaces=8, k=16, max_iters=3, dim=DIM)
    books = spark.createDataFrame(books.collect(), books.schema)
    codes = S.pq_encode(emb, books, num_subspaces=8, dim=DIM)
    codes = codes.localCheckpoint()
    fit_pq = round(time.time() - t0, 2)
    got, t = timed(lambda: S.pq_topk(codes, books, queries, k=K,
                                     num_subspaces=8, dim=DIM))
    rows.append({"method": "pq_adc", "recall_at_10": recall(got, truth),
                 "seconds": t, "fit_seconds": fit_pq})
    for short in (100, 200):
        got, t = timed(lambda s=short: S.pq_topk_rerank(
            emb, codes, books, queries, k=K, shortlist=s,
            num_subspaces=8, dim=DIM))
        rows.append({"method": f"pq_rerank{short}",
                     "recall_at_10": recall(got, truth), "seconds": t,
                     "fit_seconds": fit_pq})

    print(json.dumps({"corpus": n, "queries": N_QUERIES, "k": K,
                      "rows": rows}))


if __name__ == "__main__":
    main()
