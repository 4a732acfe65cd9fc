"""Unit tests for the corpus-pipeline operators (splits, PII,
repetition, decontamination, exact centroids) at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aggregation_duckdb_spark.io import load_table
from aggregation_duckdb_spark.operators import pipeline as P
from aggregation_duckdb_spark.operators import similarity as S


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).cache()


def test_split_assign_partitions_and_is_stable(spark, docs):
    out = P.split_assign(docs).cache()
    n = docs.count()
    # every row assigned exactly once
    assert out.count() == n
    by_split = {r["split"]: r["count"]
                for r in out.groupBy("split").count().collect()}
    assert set(by_split) <= {"train", "val", "test"}
    assert sum(by_split.values()) == n
    # deterministic: re-running yields the identical assignment
    again = P.split_assign(docs)
    assert out.join(again, ["doc_id", "bucket", "split"]).count() == n
    # a different salt re-deals at least one document
    redeal = P.split_assign(docs, salt="v2")
    moved = (out.alias("a").join(redeal.alias("b"), "doc_id")
             .where(F.col("a.split") != F.col("b.split")).count())
    assert moved > 0


def test_pii_scrub_masks_planted_pii(spark):
    d = spark.createDataFrame(
        [(1, "mail me at bob@example.com or 10.1.2.3 tel 555-0199"),
         (2, "nothing sensitive here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in P.pii_scrub(d).collect()}
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 1 \
        and out[1]["n_phone"] == 1
    assert "<EMAIL>" in out[1]["scrubbed_text"]
    assert "bob@example.com" not in out[1]["scrubbed_text"]
    assert "10.1.2.3" not in out[1]["scrubbed_text"]
    assert "555-0199" not in out[1]["scrubbed_text"]
    assert out[2]["n_email"] == out[2]["n_ipv4"] == out[2]["n_phone"] == 0
    assert out[2]["scrubbed_text"] == "nothing sensitive here"


def test_repetition_stats_flags_degenerate_doc(spark):
    d = spark.createDataFrame(
        [(1, "spam spam spam spam spam"),
         (2, "a varied document with many different words")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in P.repetition_stats(d).collect()}
    assert out[1]["top_token_share"] == 1.0 and not out[1]["keep"]
    assert out[2]["keep"]
    assert out[2]["n_distinct"] == out[2]["n_tokens"]


def test_decontaminate_flags_ngram_overlap(spark):
    leak = "alpha bravo charlie delta echo foxtrot golf"
    train = spark.createDataFrame(
        [(1, f"prefix words {leak} suffix words"),
         (2, "completely unrelated content with no overlap at all here")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(10, f"benchmark question containing {leak} verbatim")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["contaminated"]
           for r in P.decontaminate(train, bench, width=6).collect()}
    assert out[1] is True
    assert out[2] is False


def test_label_centroids_exact_matches_plain_mean(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    out = S.label_centroids_exact(emb)
    # spot-check one (label, pos) cell against a driver-side mean of
    # the same fixed-point rounding
    row = out.orderBy("centroid_id", "pos").first()
    vals = [r[0] for r in emb.where(F.col("label") == row["centroid_id"])
            .select(F.element_at("embedding", int(row["pos"]))
                    .cast("double")).collect()]
    expect = sum(round(v * S.CENTROID_SCALE) for v in vals) / len(vals) \
        / S.CENTROID_SCALE
    assert row["n_vectors"] == len(vals)
    assert abs(row["mean_value"] - expect) < 1e-12
    # partition-order independence: same bits under a different layout
    reparted = S.label_centroids_exact(emb.repartition(13))
    joined = (out.alias("a").join(reparted.alias("b"),
                                  ["centroid_id", "pos"])
              .where(F.col("a.mean_value") != F.col("b.mean_value")))
    assert joined.count() == 0


def test_connected_components_labels_min_id(spark):
    from aggregation_duckdb_spark.operators import graph as G
    # two components: {1,2,3,4} via a chain, {10,11}; 20-21-22 triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "src long, dst long")
    labels = {r["id"]: r["label"]
              for r in G.connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                      20: 20, 21: 20, 22: 20}


def test_duplicate_clusters_transitive_closure(spark):
    from aggregation_duckdb_spark.operators import graph as G
    # A~B, B~C but LSH never paired A~C: one cluster of three
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 9)],
                                  "doc_a long, doc_b long")
    out = {r["doc_id"]: r for r in G.duplicate_clusters(pairs).collect()}
    assert {out[i]["cluster_id"] for i in (1, 2, 3)} == {1}
    assert out[1]["cluster_size"] == 3 and out[1]["is_keeper"]
    assert not out[2]["is_keeper"] and not out[3]["is_keeper"]
    assert out[7]["cluster_id"] == 7 and out[7]["cluster_size"] == 2
    assert out[9]["cluster_id"] == 7


def test_pack_sequences_invariants(spark, docs):
    out = P.pack_sequences(docs, context_len=256, num_buckets=8).cache()
    assert out.count() == docs.count()
    # within a bucket: offsets are the exclusive cumsum in id order
    rows = (out.where(F.col("bucket") == out.first()["bucket"])
            .orderBy("doc_id").collect())
    acc = 0
    for r in rows:
        assert r["start_offset"] == acc
        assert r["seq_idx"] == acc // 256
        acc += r["n_tokens"]


def test_stratified_sample_deterministic_and_bounded(spark, docs):
    frac = {"en": 0.5, "zh": 0.25}
    s1 = P.stratified_sample(docs, frac, default_fraction=0.125).cache()
    s2 = P.stratified_sample(docs, frac, default_fraction=0.125)
    # identical under re-execution AND different partitioning
    assert s1.count() == s2.count()
    assert s1.join(s2, "doc_id", "left_anti").count() == 0
    s3 = P.stratified_sample(docs.repartition(7), frac,
                             default_fraction=0.125)
    assert s1.join(s3, "doc_id", "left_anti").count() == 0
    # per-group rates in a generous tolerance band around the targets
    tot = {r["lang"]: r["count"]
           for r in docs.groupBy("lang").count().collect()}
    kept = {r["lang"]: r["count"]
            for r in s1.groupBy("lang").count().collect()}
    for lang, f in (("en", 0.5), ("zh", 0.25)):
        assert abs(kept.get(lang, 0) / tot[lang] - f) < 0.2


def test_quantile_filter_keeps_upper_half_per_group(spark):
    rows = [(i, "g1", float(i)) for i in range(1, 11)] \
        + [(100 + i, "g2", float(i * 10)) for i in range(1, 5)]
    d = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    thr = {r["lang"]: r["threshold"]
           for r in P.group_quantile_threshold(d, "score", "lang", 0.5)
           .collect()}
    # rank ceil(0.5*10)=5 -> value 5.0 ; ceil(0.5*4)=2 -> 20.0
    assert thr == {"g1": 5.0, "g2": 20.0}
    kept = P.quantile_filter(d, "score", "lang", 0.5)
    assert kept.count() == 6 + 3  # scores 5..10 and 20,30,40


def test_tfidf_topterms_ranks_distinctive_terms(spark):
    from aggregation_duckdb_spark.operators import text as T
    d = spark.createDataFrame(
        [(1, "zebra zebra zebra common common"),
         (2, "common words only here"),
         (3, "common quail words")],
        "doc_id long, text string")
    out = T.tfidf_top_terms(d, k=2)
    top1 = {r["doc_id"]: r["term"]
            for r in out.where(F.col("rank") == 1).collect()}
    # 'zebra' (df=1, tf=3) dominates doc 1; 'common' (df=3) never wins
    assert top1[1] == "zebra"
    assert top1[2] != "common"
    assert top1[3] == "quail"
    # deterministic tie-break: rerun yields identical rows
    again = T.tfidf_top_terms(d, k=2)
    assert out.exceptAll(again).count() == 0


def test_end_to_end_pipeline_stages_shrink_monotonically(spark):
    """Each cleaning stage may only remove documents; the composite's
    per-stage survivor counts must be monotonically non-increasing,
    and the final split assignment must cover every survivor exactly
    once."""
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.operators import graph as G
    from aggregation_duckdb_spark.operators import text as T
    sf = "/root/testdata/sf0.001"
    from aggregation_duckdb_spark.io import load_table
    docs = load_table(spark, "documents", sf)
    corpus = docs.where(F.col("source") != "src0")
    n0 = corpus.count()
    good = (T.quality_score(corpus)
            .where(F.col("quality_score") >= 0.45).select("doc_id"))
    s1 = corpus.join(good, "doc_id"); n1 = s1.count()
    s2 = D.exact_dedup(s1); n2 = s2.count()
    pairs = D.near_duplicates(s2, threshold=0.6, num_hashes=12,
                              num_bands=4)
    losers = (G.duplicate_clusters(pairs)
              .where(~F.col("is_keeper")).select("doc_id"))
    s3 = s2.join(losers, "doc_id", "left_anti"); n3 = s3.count()
    cont = P.decontaminate(s3, docs.where(F.col("source") == "src0"),
                           width=6).where(F.col("contaminated"))
    s4 = s3.join(cont.select("doc_id"), "doc_id", "left_anti")
    n4 = s4.count()
    assert n0 >= n1 >= n2 >= n3 >= n4 > 0
    split = P.split_assign(s4)
    assert split.count() == n4
    assert split.select("doc_id").distinct().count() == n4


def test_mixture_weights_and_rebalance(spark):
    from aggregation_duckdb_spark.operators import pipeline as P
    from pyspark.sql import functions as F
    rows = [(i, " ".join(["w"] * (10 if i % 2 == 0 else 30)),
             "big" if i % 2 == 0 else "small")
            for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # give the token-heavy source a small target: it must downsample
    w = {r["group_key"]: r for r in P.mixture_weights(
        d, {"big": 0.5, "small": 0.25}, by="source").collect()}
    assert abs(w["big"]["actual_share"] - 0.25) < 0.01
    assert abs(w["small"]["actual_share"] - 0.75) < 0.01
    assert w["big"]["keep_rate"] == 1.0           # under target: keep all
    assert 0.30 < w["small"]["keep_rate"] < 0.37  # 0.25/0.75 = 1/3
    out = P.rebalance_sample(d, {"big": 0.5, "small": 0.25}, by="source")
    kept = {r["source"]: r["n"] for r in
            out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert kept["big"] == 100                # rate 1.0 keeps every doc
    assert 20 <= kept["small"] <= 46         # ~1/3 of 100, md5-Bernoulli
    # absent group → dropped entirely
    none_kept = P.rebalance_sample(d, {"big": 1.0}, by="source")
    assert none_kept.where(F.col("source") == "small").count() == 0


def test_rebalance_sample_deterministic_across_runs(spark):
    from aggregation_duckdb_spark.operators import pipeline as P
    rows = [(i, "w " * 20, f"s{i % 3}") for i in range(90)]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    t = {"s0": 0.2, "s1": 0.4, "s2": 0.4}
    a = sorted(r["doc_id"] for r in P.rebalance_sample(d, t).collect())
    b = sorted(r["doc_id"] for r in P.rebalance_sample(d, t).collect())
    assert a == b and len(a) > 0


def test_bloom_decontaminate_superset_of_exact(spark, sf_dir):
    """Bloom flags must include every exactly-contaminated doc (no
    false negatives — the one-sided error guarantee), and at the
    default sizing the false-positive overhead stays small."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import pipeline as P
    from pyspark.sql import functions as F
    docs = load_table(spark, "documents", sf_dir)
    train = docs.where(F.col("source") != "src0")
    bench = docs.where(F.col("source") == "src0")
    exact = {r.doc_id: r.contaminated
             for r in P.decontaminate(train, bench, width=6).collect()}
    bloom = {r.doc_id: r.bloom_contaminated
             for r in P.bloom_decontaminate(train, bench, width=6).collect()}
    assert set(exact) == set(bloom)
    false_neg = [d for d, c in exact.items() if c and not bloom[d]]
    assert not false_neg, f"bloom missed contaminated docs: {false_neg}"
    false_pos = [d for d, c in bloom.items() if c and not exact[d]]
    # 16384·8 bits, tiny eval key set → FP docs should be rare
    assert len(false_pos) <= max(2, len(exact) // 20), false_pos


def test_bloom_build_is_bounded(spark):
    from aggregation_duckdb_spark.operators import pipeline as P
    keys = spark.range(5000).selectExpr("md5(cast(id as string)) AS __key")
    bloom = P.bloom_build(keys, num_words=64, k=3)
    rows = bloom.collect()
    assert len(rows) <= 64          # fixed-size no matter the key count
    assert all(r.bits != 0 for r in rows)


def test_group_sample_fixed_exact_quota_and_deterministic(spark, sf_dir):
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import pipeline as P
    from pyspark.sql import functions as F
    docs = load_table(spark, "documents", sf_dir)
    out1 = P.group_sample_fixed(docs, n=3, by="source")
    counts = {r["source"]: r["n"] for r in
              out1.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in counts.items():
        assert n == min(3, totals[src])
    # deterministic: identical id set on re-run
    ids1 = sorted(r.doc_id for r in out1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in
                  P.group_sample_fixed(docs, n=3, by="source")
                  .select("doc_id").collect())
    assert ids1 == ids2


def test_leakage_free_split_keeps_near_dups_together(spark, sf_dir):
    """Every verified near-dup pair must land in the SAME split — the
    invariant a per-document split violates whenever a pair's md5
    buckets straddle a boundary."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.operators import pipeline as P
    docs = load_table(spark, "documents", sf_dir)
    out = P.leakage_free_split(docs, threshold=0.6)
    splits = {r.doc_id: r.split for r in out.collect()}
    assert set(splits) == {r.doc_id for r in docs.select("doc_id").collect()}
    pairs = D.near_duplicates(docs, threshold=0.6,
                              max_bucket_size=None).collect()
    assert pairs, "fixture corpus should contain near-dups"
    for p in pairs:
        assert splits[p.doc_a] == splits[p.doc_b], (p.doc_a, p.doc_b)
    # the plain per-doc split DOES separate at least one such pair
    # (otherwise this test proves nothing on this corpus)
    plain = {r.doc_id: r.split for r in P.split_assign(docs).collect()}
    assert any(plain[p.doc_a] != plain[p.doc_b] for p in pairs)


def test_snapshot_diff_statuses(spark):
    from aggregation_duckdb_spark.operators import pipeline as P
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        "doc_id long, text string")
    got = {r.doc_id: r.status for r in P.snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_text(spark):
    """Presence is decided by id membership, not hash nullness: a NULL
    text on either side must never masquerade as added/removed."""
    from aggregation_duckdb_spark.operators import pipeline as P
    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "text"), (5, None)],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, None), (2, "filled in"), (3, None), (4, None)],
        "doc_id long, text string")
    got = {r.doc_id: r.status for r in P.snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "changed",
                   4: "added", 5: "removed"}


def test_changed_buckets_localize_edits(spark):
    """One edited doc, one added doc, one removed doc — each dirties
    exactly its own md5 bucket; identical snapshots dirty none."""
    from aggregation_duckdb_spark.operators import pipeline as P
    rows = [(i, f"doc body {i}") for i in range(300)]
    schema = "doc_id long, text string"
    old = spark.createDataFrame(rows, schema)
    assert P.changed_buckets(old, old).count() == 0

    def bucket_of(doc_id):
        row = (P.bucket_fingerprints(
            spark.createDataFrame([(doc_id, "x")], schema))
            .collect())
        return row[0].bucket

    edited = spark.createDataFrame(
        rows[:-1] + [(299, "doc body 299 EDITED")], schema)
    got = [r.bucket for r in P.changed_buckets(old, edited).collect()]
    assert got == [bucket_of(299)]
    added = spark.createDataFrame(rows + [(1000, "new doc")], schema)
    got = [r.bucket for r in P.changed_buckets(old, added).collect()]
    assert got == [bucket_of(1000)]
    removed = spark.createDataFrame(rows[1:], schema)
    got = [r.bucket for r in P.changed_buckets(old, removed).collect()]
    assert got == [bucket_of(0)]


def test_pack_greedy_invariants(spark):
    """Hard packing guarantees: every doc assigned exactly once; no
    multi-doc sequence exceeds the budget; an oversize doc sits alone;
    seq indices are dense 1..k per bucket; and the whole thing is
    deterministic across runs."""
    from aggregation_duckdb_spark.operators import pipeline as P
    import random
    rnd = random.Random(7)
    rows = [(i, "w " * rnd.randrange(0, 90)) for i in range(400)]
    rows.append((998, "w " * 150))        # oversize vs C=100
    rows.append((999, ""))                # empty doc
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = P.pack_greedy(docs, context_len=100, num_buckets=8).collect()
    assert sorted(r.doc_id for r in out) == sorted(i for i, _ in rows)
    by_seq = {}
    for r in out:
        by_seq.setdefault((r.bucket, r.seq_idx), []).append(r.n_tokens)
    for (b, s), sizes in by_seq.items():
        if len(sizes) > 1:
            assert sum(sizes) <= 100, (b, s, sizes)
    big = [r for r in out if r.doc_id == 998][0]
    assert len(by_seq[(big.bucket, big.seq_idx)]) == 1
    for b in {r.bucket for r in out}:
        seqs = sorted({r.seq_idx for r in out if r.bucket == b})
        assert seqs == list(range(1, len(seqs) + 1)), (b, seqs)
    again = P.pack_greedy(docs, context_len=100, num_buckets=8).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
