"""ANN quality/latency curve on the organic sf1 embeddings —
recall@10 vs wall time for brute force, IVF (n_probe 1/2/4), and PQ
(raw ADC vs shortlist+rerank). Evidence for the 100 TB ANN story's
accuracy/cost trade-off (round-9 verdict item 8); results recorded in
SCALE_PROBE_r10.md.

Usage: python scripts/ann_curve.py [sf_dir]   (default: repo/.sf1data)
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


def main() -> None:
    from pyspark.sql import functions as F

    from aggregation_duckdb_spark.operators import similarity as S
    from aggregation_duckdb_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 \
        else os.path.join(REPO, ".sf1data")
    spark = get_spark("ann-curve", extra_confs={"spark.ui.enabled": "false"})
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
    cents = S.kmeans_fit(emb, k=32, max_iters=4)
    cents = spark.createDataFrame(cents.collect(), cents.schema)  # pin fit
    fit_ivf = round(time.time() - t0, 2)
    for probe in (1, 2, 4):
        got, t = timed(lambda p=probe: S.ivf_topk(emb, queries, cents,
                                                  k=K, n_probe=p))
        rows.append({"method": f"ivf_probe{probe}",
                     "recall_at_10": recall(got, truth), "seconds": t,
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
