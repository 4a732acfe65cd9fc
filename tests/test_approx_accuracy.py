"""Numeric accuracy bounds for the two approximate (rows-only) paths.

These entries are deliberately NOT DuckDB-oracled — float centroid
means and HLL sketches are engine-specific — so their correctness
story is a quantified bound against their exact twins:

- ``sim_ivf_topk`` (operators/similarity.py ivf_topk): recall@k vs
  the brute-force exact top-k must be >= 0.9 at the matrix entry's
  own parameters (n_probe=3 over label centroids).
- ``hier_agg_closure_approx`` (flagship.py flagship_closure_agg_approx):
  approx_count_distinct(rsd=0.02) per hierarchy node must sit within
  a 5-sigma HLL error band of the exact distinct count, with all
  non-sketch columns bit-identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aggregation_duckdb_spark import flagship as fs
from aggregation_duckdb_spark.io import load_table
from aggregation_duckdb_spark.operators import similarity as S

SF01 = "/root/testdata/sf0.01"


def test_ivf_topk_recall_vs_bruteforce(spark):
    """Recall bound at the sim_ivf_topk matrix entry's own parameters.

    The synthetic embeddings are i.i.d. noise — the IVF worst case:
    no partition correlates with neighborhoods, so recall ~= the
    probed fraction (measured: label-centroid cells 0.48 @ 3/10,
    k-means cells 0.60 @ 3/10, 0.98 @ 9/10). The entry therefore
    probes 9 of 10 k-means cells to meet the >= 0.9 target on this
    data; the clustered-data test below pins that REAL pruning (2 of
    10 cells) holds the target when geometry exists."""
    emb = load_table(spark, "embeddings", SF01)
    queries = emb.where(F.col("vec_id") < 5)
    k = 10
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.brute_force_topk(emb, queries, k=k).collect()}
    cents = S.kmeans_fit(emb, k=10, max_iters=8)
    approx = {(r["query_id"], r["neighbor_id"])
              for r in S.ivf_topk(emb, queries, cents, k=k,
                                  n_probe=9).collect()}
    assert exact, "exact baseline returned no pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall@{k} = {recall:.3f} < 0.9"


def test_ivf_topk_prunes_with_high_recall_on_clustered_data(spark):
    """The claim IVF actually makes: when the corpus has cluster
    geometry, probing a small fraction of cells keeps recall high.
    Ten tight gaussian clusters, k-means k=10, probe 2 cells (80% of
    the corpus pruned) → recall >= 0.95."""
    import random
    rnd = random.Random(7)
    centers = [[rnd.gauss(0, 1) for _ in range(64)] for _ in range(10)]
    rows = [(i, [x + rnd.gauss(0, 0.05) for x in centers[i % 10]])
            for i in range(400)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = corpus.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.brute_force_topk(corpus, queries, k=10).collect()}
    cents = S.kmeans_fit(corpus, k=10, max_iters=8)
    approx = {(r["query_id"], r["neighbor_id"])
              for r in S.ivf_topk(corpus, queries, cents, k=10,
                                  n_probe=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, f"clustered IVF recall = {recall:.3f} < 0.95"


def test_kmeans_fit_deterministic_codebook(spark):
    """Fixed-point means + salted-md5 init → rerunning the fit yields
    the identical codebook bit-for-bit (the reproducibility contract
    an index build needs)."""
    emb = load_table(spark, "embeddings", SF01).limit(200)
    a = {r["centroid_id"]: r["centroid"]
         for r in S.kmeans_fit(emb, k=5, max_iters=4).collect()}
    b = {r["centroid_id"]: r["centroid"]
         for r in S.kmeans_fit(emb, k=5, max_iters=4).collect()}
    assert a == b


def test_closure_approx_within_hll_error_of_exact(spark):
    rsd = 0.02
    exact = {r["node_natural_key"]: r
             for r in fs.flagship_closure_agg(spark, SF01).collect()}
    approx = {r["node_natural_key"]: r
              for r in fs.flagship_closure_agg_approx(
                  spark, SF01, rsd=rsd).collect()}
    assert set(exact) == set(approx)  # same node set, same grouping
    for key, ex in exact.items():
        ap = approx[key]
        # non-sketch measures take the identical plan — bit-equal
        assert ap["sum_total_price"] == ex["sum_total_price"], key
        assert ap["count_of_fact_records"] == ex["count_of_fact_records"], key
        e, a = ex["distinct_customer_count"], ap["distinct_customer_count"]
        # HLL++ error is ~N(0, rsd·n); 5 sigma plus small-n slack of 2
        # (sparse-mode rounding) keeps this deterministic-in-practice
        assert abs(a - e) <= max(5 * rsd * e, 2), (
            f"{key}: approx {a} vs exact {e} outside 5*rsd band")


def test_pq_shortlist_rerank_recall(spark, sf_dir):
    """Product quantization as a candidate generator: raw ADC order is
    lossy on these hard (unit-norm, weakly clustered) embeddings, but
    a 200-of-500 PQ shortlist + exact rerank must recover >= 0.9
    recall@10 vs brute force — the production pattern the operator
    documents. Also pins codebook shape and the 8-byte code budget."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.orderBy("vec_id").limit(10)
    books = S.pq_fit(emb, num_subspaces=8, k=16, max_iters=3)
    assert books.count() == 8 * 16
    codes = S.pq_encode(emb, books, num_subspaces=8)
    per_vec = codes.groupBy("vec_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per_vec] == [8]   # 8 bytes per vector
    approx = S.pq_topk_rerank(emb, codes, books, queries, k=10,
                              shortlist=200, num_subspaces=8)
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    exact = S.brute_force_topk(emb, queries, k=10)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    assert len(e) > 0
    recall = len(a & e) / len(e)
    assert recall >= 0.9, f"shortlist-rerank recall {recall}"


def test_dau_wau_window_param_and_approx_band(spark):
    """window_days is honored (window=1 ⇒ WAU == DAU, stickiness 1)
    and approx mode tracks the exact counts within the HLL error band
    — same accuracy policy as hier_agg_closure_approx."""
    from aggregation_duckdb_spark.operators import events as E
    ev = load_table(spark, "events", SF01)
    w1 = E.dau_wau(ev, window_days=1).collect()
    assert w1 and all(r["dau"] == r["wau"] and r["stickiness"] == 1.0
                      for r in w1)
    rsd = 0.02
    exact = {r["day"]: r for r in E.dau_wau(ev).collect()}
    approx = {r["day"]: r for r in E.dau_wau(ev, approx=True,
                                             rsd=rsd).collect()}
    assert set(exact) == set(approx)
    for day, ex in exact.items():
        ap = approx[day]
        for col in ("dau", "wau"):
            e, a = ex[col], ap[col]
            assert abs(a - e) <= max(5 * rsd * e, 2), (
                f"day {day} {col}: approx {a} vs exact {e}")


def test_kmeans_fit_sample_cap_bounds_fit_cost_not_quality(spark):
    """Sampled codebook fit (the FAISS train-on-subset rule): Lloyd
    runs on a deterministic md5 sample capped at ``fit_sample_cap``;
    the full corpus is assigned against the sampled codebook. Pins:
    (a) md5_sample is deterministic and partitioning-independent,
    (b) corpora at/under the cap pass through UNCHANGED (the capped
    fit is bit-identical to the uncapped one there — every existing
    oracle entry is unaffected), and (c) on clustered geometry a fit
    trained on <=1/4 of the corpus still serves n_probe=2 queries at
    recall >= 0.95 over the FULL corpus."""
    import random
    rnd = random.Random(11)
    centers = [[rnd.gauss(0, 1) for _ in range(32)] for _ in range(10)]
    rows = [(i, [x + rnd.gauss(0, 0.05) for x in centers[i % 10]])
            for i in range(1600)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")

    # (a) deterministic + partitioning-independent sample
    s1 = sorted(r.vec_id for r in
                S.md5_sample(corpus, 400).select("vec_id").collect())
    s2 = sorted(r.vec_id for r in
                S.md5_sample(corpus.repartition(13), 400)
                .select("vec_id").collect())
    assert s1 == s2 and 0 < len(s1) < 1600
    assert abs(len(s1) - 400) < 120   # ~cap rows (binomial tolerance)

    # (b) at/under the cap the sample IS the corpus
    assert S.md5_sample(corpus, 1600) is corpus
    capped = {r["centroid_id"]: r["centroid"] for r in
              S.kmeans_fit(corpus, k=10, max_iters=4,
                           fit_sample_cap=1600).collect()}
    uncapped = {r["centroid_id"]: r["centroid"] for r in
                S.kmeans_fit(corpus, k=10, max_iters=4,
                             fit_sample_cap=None).collect()}
    assert capped == uncapped

    # (c) quality: fit on <=400 of 1600, serve the full corpus
    cents = S.kmeans_fit(corpus, k=10, max_iters=8,
                         fit_sample_cap=400)
    queries = corpus.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.brute_force_topk(corpus, queries, k=10).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in S.ivf_topk(corpus, queries, cents, k=10,
                                  n_probe=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.95, f"sampled-fit recall = {recall:.3f} < 0.95"


def test_ivf_assign_arrow_path_bit_equals_jvm_fold(spark, sf_dir):
    """ivf_assign dispatches on codebook size (JVM literal fold under
    k=32, Arrow batches at or above); the two paths must agree
    BIT-FOR-BIT on the same large codebook — the Arrow side's
    explicit left-to-right +0.0-seeded accumulation, IEEE
    sqrt/divide, explicit squares and first-hit argmax exist exactly
    to reproduce the fold (the DuckDB oracle twins rely on it). Pins
    cosine AND l2 by rebuilding the pre-dispatch JVM expression
    inline against a 40-centroid codebook."""
    from pyspark.sql import functions as F

    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import similarity as S

    emb = load_table(spark, "embeddings", sf_dir)
    base = S.label_centroids(emb)
    cents = base
    for i in range(3):
        cents = cents.unionByName(base.select(
            (F.col("centroid_id") + (i + 1) * 1000).alias("centroid_id"),
            F.transform("centroid",
                        lambda x: x + F.lit(float(i + 1) * 0.37))
            .alias("centroid")))
    rows = cents.collect()
    assert len(rows) == 40                  # forces the Arrow path
    lit = F.array(*[
        F.struct(F.lit(int(r["centroid_id"])).cast("long").alias("cid"),
                 F.array(*[F.lit(float(x)) for x in r["centroid"]])
                 .alias("cvec"))
        for r in rows])
    for metric in ("cosine", "l2"):
        if metric == "cosine":
            score = lambda c: S.cosine(F.col("embedding"), c["cvec"])  # noqa: E731,E501
        else:
            score = lambda c: -F.aggregate(  # noqa: E731
                F.zip_with(F.col("embedding"), c["cvec"],
                           lambda a, b: (a.cast("double") - b)
                           * (a.cast("double") - b)),
                F.lit(0.0), lambda acc, x: acc + x)
        scored = F.transform(lit, lambda c: F.struct(
            score(c).alias("sim"), (-c["cid"]).alias("negcid")))
        jvm = emb.select("vec_id", (-F.array_max(scored)["negcid"])
                         .alias("jvm_cid"))
        arrow = S.ivf_assign(emb, cents, metric=metric) \
            .select("vec_id", F.col("centroid_id").alias("arrow_cid"))
        diff = jvm.join(arrow, "vec_id") \
            .where("jvm_cid <> arrow_cid").count()
        assert diff == 0, f"{metric}: {diff} mismatches"
