"""Unit tests for the pipeline-extension operators at sf0.001."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aggregation_duckdb_spark.io import load_table
from aggregation_duckdb_spark.operators import dedup as D
from aggregation_duckdb_spark.operators import events as E
from aggregation_duckdb_spark.operators import multimodal as M
from aggregation_duckdb_spark.operators import similarity as S
from aggregation_duckdb_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).cache()


def test_exact_dedup_idempotent(spark, docs):
    survivors = D.exact_dedup(docs)
    n1 = survivors.count()
    assert n1 <= docs.count()
    assert D.exact_dedup(survivors).count() == n1


def test_exact_dedup_on_planted_dups(spark):
    d = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "other")],
        "doc_id long, text string")
    survivors = D.exact_dedup(d)
    assert sorted(r["doc_id"] for r in survivors.collect()) == [1, 3]
    groups = D.exact_duplicate_groups(d).collect()
    assert len(groups) == 1 and groups[0]["keeper_id"] == 1
    assert groups[0]["member_ids"] == [1, 2]


def test_lsh_catches_near_identical_docs(spark):
    base = " ".join(f"w{i}" for i in range(60))
    edited = base.replace("w30", "x30")  # one token changed
    other = " ".join(f"z{i}" for i in range(60))
    d = spark.createDataFrame(
        [(1, base), (2, edited), (3, other)], "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"])
             for r in D.minhash_lsh_candidates(d).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    verified = D.near_duplicates(d, threshold=0.6).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in verified] == [(1, 2)]
    assert verified[0]["jaccard"] > 0.8


def test_jaccard_symmetric_bound(spark, docs):
    sub = docs.limit(40)
    cands = D.minhash_lsh_candidates(sub)
    scored = D.jaccard_for_pairs(cands, sub).collect()
    for r in scored:
        assert 0.0 <= r["jaccard"] <= 1.0


def test_simhash_close_for_near_dups(spark):
    base = " ".join(f"w{i}" for i in range(60))
    edited = base.replace("w30", "x30")
    d = spark.createDataFrame([(1, base), (2, edited)], "doc_id long, text string")
    rows = {r["doc_id"]: r["simhash"]
            for r in d.select("doc_id", D.simhash_bits(F.col("text"), 16)
                              .alias("simhash")).collect()}
    hamming = sum(a != b for a, b in zip(rows[1], rows[2]))
    assert hamming <= 4  # one token of 60 changed → few bits flip


def test_topk_self_similarity_excluded_and_ranked(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    out = S.brute_force_topk(emb, emb.where(F.col("vec_id") < 3), k=5).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine_sim"]))
    for q, rows in by_q.items():
        rows.sort()
        sims = [s for _, s in rows]
        assert sims == sorted(sims, reverse=True)


def test_ivf_recall_against_bruteforce(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < 5)
    cents = S.label_centroids(emb)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in S.ivf_topk(emb, queries, cents, k=5, n_probe=5).collect()}
    # random embeddings → clusters are weak; still expect meaningful recall
    assert len(exact & approx) >= len(exact) * 0.3


def test_embedding_neardup_threshold(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    pairs = S.embedding_near_duplicates(emb, threshold=0.4).collect()
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert r["cosine_sim"] >= 0.4


def test_language_id_and_quality_shapes(docs):
    lid = T.language_id(docs)
    assert lid.count() == docs.count()
    assert set(r["predicted_lang"] for r in lid.collect()) <= \
        set(T.LANG_STOPWORDS) | {"und"}
    q = T.quality_score(docs).collect()
    for r in q:
        assert 0.0 <= r["quality_score"] <= 1.0


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, 100, "2024-01-01 00:00:00"),
        (2, 100, "2024-01-01 00:10:00"),   # same session (10 min gap)
        (3, 100, "2024-01-01 01:00:00"),   # new session (50 min gap)
        (4, 200, "2024-01-01 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = E.sessionize(ev, gap_minutes=30).collect()
    sessions = {(r["user_id"], r["session_idx"]): r["n_events"] for r in out}
    assert sessions == {(100, 1): 2, (100, 2): 1, (200, 1): 1}


def test_tumbling_counts_partition_of_events(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    out = E.tumbling_counts(ev)
    assert out.agg(F.sum("n_events")).first()[0] == ev.count()


def test_multimodal_decode_roundtrip(spark, docs):
    meta = M.decode_metadata(M.attach_payload(docs))
    rows = meta.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert 1 <= r["fake_width"] <= 16
        assert 1 <= r["fake_height"] <= 16
        assert len(r["checksum"]) == 32
        assert r["n_bytes"] > 0


def test_frame_sample_plan(spark, docs):
    frames = M.frame_sample_plan(M.attach_payload(docs.limit(20)), every_n=10)
    rows = frames.collect()
    for r in rows:
        assert 0 <= r["frame_idx"] < r["n_frames"]
        assert r["frame_idx"] % 10 == 0


def test_resize_and_features_arrow_shapes(spark, docs):
    """Binary-out and vector-out mapInPandas plumbing: schemas, payload
    round-trip, and fixed feature dimensionality."""
    wp = M.attach_payload(docs)
    rz = M.resize_plan(wp, target=(64, 32))
    assert dict(rz.dtypes)["resized_payload"] == "binary"
    row = rz.orderBy("doc_id").first()
    assert row["target_width"] == 64 and row["target_height"] == 32
    # checksum matches the payload that actually crossed the Arrow boundary
    import hashlib
    assert hashlib.md5(bytes(row["resized_payload"])).hexdigest() == \
        row["resized_checksum"]

    ft = M.extract_features(wp, dim=4)
    assert dict(ft.dtypes)["features"] == "array<double>"
    assert all(len(r["features"]) == 4 for r in ft.collect())


def test_lsh_topk_recall_and_validity(spark, sf_dir):
    """Hyperplane-LSH ANN: every returned neighbor's score must equal
    the exact cosine (re-rank is exact), and recall vs brute force is
    meaningful even on random embeddings."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < 5)
    exact = S.brute_force_topk(emb, queries, k=5).collect()
    # random embeddings have near-zero pairwise cosine, the worst case
    # for hyperplane LSH — wide tables (12×4 bits) still recall >40%
    approx = S.lsh_topk(emb, queries, k=5, num_tables=12,
                        bits_per_table=4).collect()
    e = {(r["query_id"], r["neighbor_id"]) for r in exact}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(e & a) >= len(e) * 0.4
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"]
                    for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["cosine_sim"] - exact_scores[key]) < 1e-12


def test_operators_handle_empty_inputs(spark):
    """Empty-corpus robustness: every extension operator must return an
    empty, correctly-schemaed result — not raise — on zero rows."""
    from aggregation_duckdb_spark.operators.asof import asof_join

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert D.exact_duplicate_groups(empty_docs).count() == 0
    assert D.minhash_lsh_candidates(empty_docs).count() == 0
    assert D.near_duplicates(empty_docs).count() == 0
    assert T.text_stats(empty_docs).count() == 0
    assert T.rolling_fingerprint(empty_docs).count() == 0

    empty_ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, "
            "value double")
    assert E.tumbling_counts(empty_ev).count() == 0
    assert E.sessionize(empty_ev).count() == 0

    left = spark.createDataFrame([(1, 1, 10)], "id long, k long, t long")
    empty_right = spark.createDataFrame([], "k long, t long, v double")
    out = asof_join(left, empty_right, on="t", by="k", value_cols=["v"])
    assert [r["v_asof"] for r in out.collect()] == [None]


def test_lsh_neardup_finds_planted_near_dups(spark):
    """Genuine near-dups (cosine ~0.9999) must all surface through the
    LSH bucket candidates: at that angle a 6-table x 8-bit config has
    per-pair miss probability ~1e-9, and buckets are deterministic, so
    exact recall is a stable assertion, not a flaky one."""
    rows = []
    for i in range(40):
        v = [float((i * 31 + j * 7) % 13 - 6) for j in range(64)]
        rows.append((i, v))
        w = list(v)
        w[0] += 0.01  # near-identical twin
        rows.append((i + 1000, w))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r["id_a"], r["id_b"])
           for r in S.embedding_near_duplicates_lsh(
               emb, threshold=0.99, num_tables=6, bits_per_table=8).collect()}
    assert {(i, i + 1000) for i in range(40)} <= got


def test_lsh_neardup_subset_of_exact(spark, sf_dir):
    """Every LSH-found pair is a true pair: subset of the all-pairs
    exact result with identical cosine scores (candidate generation may
    prune, the verify step may not distort)."""
    emb = load_table(spark, "embeddings", sf_dir)
    exact = {(r["id_a"], r["id_b"]): r["cosine_sim"]
             for r in S.embedding_near_duplicates(emb, threshold=0.4).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["cosine_sim"]
           for r in S.embedding_near_duplicates_lsh(
               emb, threshold=0.4, num_tables=6, bits_per_table=8).collect()}
    assert set(lsh) <= set(exact)
    for pair, sim in lsh.items():
        assert sim == exact[pair]


def test_ivf_entry_config_recall_floor(spark, sf_dir):
    """The driver entry sim_ivf_topk is rows-only (float centroid means
    are engine-specific), so its quality gate lives here: at the entry's
    exact config (k=10, n_probe=3, label centroids) recall vs the exact
    brute-force baseline is deterministic — 0.48 on this synthetic
    corpus (random embeddings, weak clusters) — and must stay above the
    floor. A regression in cell assignment or probe pruning trips this
    before it silently degrades the rows-only entry."""
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.where(F.col("vec_id") < 5)
    cents = S.label_centroids(emb)
    exact_rows = S.brute_force_topk(emb, queries, k=10).collect()
    ivf_rows = S.ivf_topk(emb, queries, cents, k=10, n_probe=3).collect()
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    approx = {(r["query_id"], r["neighbor_id"]) for r in ivf_rows}
    assert len(exact & approx) >= len(exact) * 0.4
    # and every IVF hit must carry the true cosine (scores not distorted
    # by the pruned path)
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"]
                    for r in exact_rows}
    for r in ivf_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert r["cosine_sim"] == exact_scores[key]


def test_state_intervals_scd2_semantics(spark):
    from aggregation_duckdb_spark.operators import events as E
    from pyspark.sql import functions as F
    d = spark.createDataFrame(
        [(1, 100, "2024-01-01 00:00:00", "a"),
         (2, 100, "2024-01-01 01:00:00", "a"),
         (3, 100, "2024-01-01 02:00:00", "b"),
         (4, 100, "2024-01-01 03:00:00", "a"),
         (5, 200, "2024-01-01 00:00:00", "x")],
        "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = E.state_intervals(d).orderBy("user_id", "version").collect()
    u100 = [r for r in out if r["user_id"] == 100]
    # a(2 events) -> b -> a : three versions, not two
    assert [(r["version"], r["state"], r["n_events"]) for r in u100] \
        == [(1, "a", 2), (2, "b", 1), (3, "a", 1)]
    # valid_to chains to the successor's valid_from; only last is open
    assert u100[0]["valid_to"] == u100[1]["valid_from"]
    assert u100[1]["valid_to"] == u100[2]["valid_from"]
    assert u100[2]["valid_to"] is None and u100[2]["is_current"]
    assert not u100[0]["is_current"]
    u200 = [r for r in out if r["user_id"] == 200]
    assert len(u200) == 1 and u200[0]["is_current"]


def test_payload_stats_arrow_zero_copy_path(spark):
    from aggregation_duckdb_spark.operators import multimodal as M
    from pyspark.sql import functions as F
    d = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "\x00\xff ok")],
        "doc_id long, text string")
    with_payload = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    out = {r["doc_id"]: r
           for r in M.payload_stats_arrow(with_payload).collect()}
    assert out[1]["n_bytes"] == 3 and out[1]["byte_sum"] == 97 + 98 + 99
    assert out[2]["n_bytes"] == 0 and out[2]["byte_sum"] == 0
    # '\xff' is 2 bytes in utf-8 (0xc3 0xbf); zero byte counts too:
    # \x00(1) + \xff(2) + ' o k'(3) = 6 bytes
    assert out[3]["n_bytes"] == 6
    assert out[3]["byte_sum"] == 0 + 0xC3 + 0xBF + 32 + 111 + 107


def test_lsh_bucket_cap_bounds_boilerplate_skew(spark):
    """One boilerplate bucket must not go quadratic: with a finite
    max_bucket_size, the pathological all-identical bucket is dropped
    and candidate count stays linear; uncapped it is N-choose-2."""
    n = 30
    boiler = " ".join(f"h{i}" for i in range(40))  # identical header
    distinct = [(1000 + i, " ".join(f"d{i}_{j}" for j in range(40)))
                for i in range(5)]
    d = spark.createDataFrame(
        [(i, boiler) for i in range(n)] + distinct,
        "doc_id long, text string")
    uncapped = D.minhash_lsh_candidates(d, max_bucket_size=None).count()
    assert uncapped >= n * (n - 1) // 2  # quadratic blowup, the hazard
    capped = D.minhash_lsh_candidates(d, max_bucket_size=10).count()
    assert capped == 0  # every band bucket of the clones exceeds cap
    # near_duplicates defaults to a FINITE cap (the scale-safe path)
    import inspect
    default = inspect.signature(D.near_duplicates).parameters[
        "max_bucket_size"].default
    assert default is not None and default == D.DEFAULT_MAX_BUCKET_SIZE
    # dropped-bucket members remain the exact-dedup pass's catch:
    assert D.exact_dedup(d).count() == 1 + len(distinct)


def test_payload_stats_arrow_null_payloads_propagate(spark):
    d = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "xy")], "doc_id long, text string")
    with_payload = d.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    out = {r["doc_id"]: r
           for r in M.payload_stats_arrow(with_payload).collect()}
    assert out[1]["n_bytes"] == 3
    assert out[2]["n_bytes"] is None and out[2]["byte_sum"] is None
    assert out[3]["n_bytes"] == 2 and out[3]["byte_sum"] == 120 + 121


def test_real_codec_smoke_when_pil_available(spark, monkeypatch):
    """Exercises the REAL_CODECS boundary the day PIL lands in the
    environment; skips (not passes) until then. Builds a real PNG,
    decodes its true dimensions, and round-trips a resize."""
    pytest.importorskip("PIL")
    import io
    from PIL import Image

    monkeypatch.setattr(M, "REAL_CODECS", True)
    buf = io.BytesIO()
    Image.new("RGB", (5, 3), color=(10, 20, 30)).save(buf, "PNG")
    d = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                              "doc_id long, payload binary")
    out = M.decode_metadata(d).collect()
    assert out[0]["fake_width"] == 5 and out[0]["fake_height"] == 3
    assert out[0]["n_bytes"] == len(buf.getvalue())
    rz = M.resize_plan(d, target=(4, 2)).collect()
    with Image.open(io.BytesIO(bytes(rz[0]["resized_payload"]))) as im:
        assert (im.width, im.height) == (4, 2)


def test_real_codecs_off_matches_stub_oracle_shape(spark):
    """The stub path stays the active default: REAL_CODECS is False in
    this container and decode output remains md5-derived (the
    oracle-checked contract of mm_decode_metadata)."""
    assert M.REAL_CODECS is False
    d = spark.createDataFrame([(7, "hello")], "doc_id long, text string")
    out = M.decode_metadata(M.attach_payload(d)).collect()[0]
    import hashlib
    digest = hashlib.md5(b"hello").hexdigest()
    assert out["checksum"] == digest
    assert out["fake_width"] == 1 + int(digest[0], 16)


def test_containment_catches_embedded_subdocument(spark):
    """A short doc quoted inside a long one: Jaccard is tiny (LSH
    would miss it) but containment on the smaller side is ~1.0."""
    quote = " ".join(f"q{i}" for i in range(12))
    page = " ".join(f"p{i}" for i in range(200)) + " " + quote
    other = " ".join(f"z{i}" for i in range(50))
    d = spark.createDataFrame(
        [(1, quote), (2, page), (3, other)], "doc_id long, text string")
    out = {(r["doc_a"], r["doc_b"]): r
           for r in D.sub_duplicates(d, threshold=0.8).collect()}
    assert (1, 2) in out
    r = out[(1, 2)]
    assert r["containment_a"] >= 0.8  # the quote is inside the page
    assert r["containment_b"] < 0.2   # the page is not inside the quote
    assert not any(3 in p for p in out)
    # and the symmetric-Jaccard path indeed does NOT pair them
    jac = {(r["doc_a"], r["doc_b"])
           for r in D.near_duplicates(d, threshold=0.6).collect()}
    assert (1, 2) not in jac


def test_shared_shingle_candidates_df_cap_bounds_common_shingles(spark):
    """A shingle present in every doc must not pair everything: with
    max_df below the corpus size the universal shingle is dropped."""
    common = "the same header words"
    d = spark.createDataFrame(
        [(i, common + f" unique tail {i} a b") for i in range(10)],
        "doc_id long, text string")
    allpairs = D.shared_shingle_candidates(d, max_df=100).count()
    assert allpairs == 10 * 9 // 2  # universal shingles pair everyone
    capped = D.shared_shingle_candidates(d, max_df=5).count()
    assert capped == 0


def test_countmin_overestimates_only_and_tight_at_low_load(spark):
    """CMS invariants: estimate >= exact for every queried item, and
    with width >> distinct grams (no collisions) the estimate is
    EXACTLY the count."""
    d = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "a b c x y z"), (3, "x y z x y z")],
        "doc_id long, text string")
    sketch = T.countmin_build(d, depth=4, width=4096, gram=3)
    grams = (d.select(F.explode(T.word_ngrams(F.col("text"), 3))
                      .alias("gram"))
             .groupBy("gram").agg(F.count(F.lit(1)).alias("exact")))
    est = T.countmin_estimate(sketch, grams.select("gram"),
                              depth=4, width=4096, item_col="gram")
    rows = grams.join(est, "gram").collect()
    assert rows
    for r in rows:
        assert r["cms_estimate"] >= r["exact"]
        assert r["cms_estimate"] == r["exact"]  # wide sketch: no collisions
    # narrow sketch: still never underestimates
    tiny = T.countmin_build(d, depth=2, width=4, gram=3)
    est2 = {r["gram"]: r["cms_estimate"]
            for r in T.countmin_estimate(tiny, grams.select("gram"),
                                         depth=2, width=4,
                                         item_col="gram").collect()}
    for r in grams.collect():
        assert est2[r["gram"]] >= r["exact"]


def test_funnel_greedy_earliest_order(spark):
    """Step i counts only strictly after step i-1's chosen time:
    a click BEFORE the first view must not advance the funnel."""
    from datetime import datetime
    from aggregation_duckdb_spark.operators import events as E
    rows = [
        # u1: full ordered funnel
        (1, 1, datetime(2024, 1, 1, 10), "view"),
        (2, 1, datetime(2024, 1, 1, 11), "click"),
        (3, 1, datetime(2024, 1, 1, 12), "purchase"),
        # u2: click precedes the only view -> funnel stalls at view
        (4, 2, datetime(2024, 1, 1, 9), "click"),
        (5, 2, datetime(2024, 1, 1, 10), "view"),
        (6, 2, datetime(2024, 1, 1, 8), "purchase"),
        # u3: view+click, purchase BETWEEN them -> 2 steps only
        (7, 3, datetime(2024, 1, 1, 10), "view"),
        (8, 3, datetime(2024, 1, 1, 10, 30), "purchase"),
        (9, 3, datetime(2024, 1, 1, 11), "click"),
        # u4: never viewed -> absent from the result
        (10, 4, datetime(2024, 1, 1, 10), "click"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    out = {r.user_id: r for r in
           E.funnel_steps(ev, ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].steps_completed == 3 and out[1].converted
    assert out[2].steps_completed == 1 and not out[2].converted
    assert out[3].steps_completed == 2 and not out[3].converted
    # ties are strict: equal timestamps do NOT advance
    ev2 = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1, 10), "view"),
         (2, 1, datetime(2024, 1, 1, 10), "click")],
        "event_id long, user_id long, ts timestamp, event_type string")
    r = E.funnel_steps(ev2, ["view", "click"]).collect()[0]
    assert r.steps_completed == 1


def test_retention_cohorts_triangle(spark):
    from datetime import datetime
    from aggregation_duckdb_spark.operators import events as E
    # week boundary: epoch day 0 = 1970-01-01; use two synthetic weeks
    rows = [
        # cohort A: users 1,2 first active week w; user 1 returns w+1
        (1, 1, datetime(2024, 1, 1)), (2, 2, datetime(2024, 1, 2)),
        (3, 1, datetime(2024, 1, 10)),
        # cohort B: user 3 first active week w+1
        (4, 3, datetime(2024, 1, 10)),
    ]
    ev = spark.createDataFrame(rows,
                               "event_id long, user_id long, ts timestamp")
    out = {(r.cohort_week, r.week_offset): r
           for r in E.retention_cohorts(ev).collect()}
    weeks = sorted({w for w, _ in out})
    w0 = weeks[0]
    assert out[(w0, 0)].n_active == 2 and out[(w0, 0)].cohort_size == 2
    assert out[(w0, 1)].n_active == 1
    assert abs(out[(w0, 1)].retention - 0.5) < 1e-12
    assert out[(weeks[1], 0)].n_active == 1 and out[(weeks[1], 0)].cohort_size == 1


def test_duplicate_spans_finds_planted_substring(spark):
    """A 20-token license block pasted into two otherwise-different
    documents must show up as duplicated spans in BOTH, while a
    unique-text document reports zero."""
    from aggregation_duckdb_spark.operators import dedup as D
    block = " ".join(f"lic{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, block + " " + " ".join(f"a{i}" for i in range(30))),
         (2, " ".join(f"b{i}" for i in range(30)) + " " + block),
         (3, " ".join(f"c{i}" for i in range(60)))],
        "doc_id long, text string")
    out = {r.doc_id: r for r in D.duplicate_spans(docs, width=20).collect()}
    assert out[1].n_dup_spans >= 1 and out[2].n_dup_spans >= 1
    assert out[3].n_dup_spans == 0
    # the planted block is the ONLY shared text: dup spans on each side
    # can't exceed the block's own span count inside that document
    assert out[1].n_dup_spans == 1 and out[2].n_dup_spans == 1
    assert 0 < out[1].dup_ratio < 1


def test_compression_ratio_matches_zlib_and_separates_tails(spark):
    import zlib
    from aggregation_duckdb_spark.operators import text as T
    boiler = "the same sentence again and again. " * 40
    import random
    rng = random.Random(7)
    noisy = " ".join("".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                             for _ in range(8)) for _ in range(150))
    docs = spark.createDataFrame([(1, boiler), (2, noisy), (3, "")],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in T.compression_ratio(docs).collect()}
    for did, text in [(1, boiler), (2, noisy)]:
        want = len(zlib.compress(text.encode(), 6)) / len(text.encode())
        assert abs(out[did].compression_ratio - want) < 1e-12
    assert out[1].compression_ratio < 0.1 < out[2].compression_ratio
    assert out[3].compression_ratio is None and out[3].n_bytes == 0


def test_funnel_randomized_equivalence_vs_python_reference(spark):
    """Seeded random event streams vs a direct Python implementation
    of greedy-earliest funnel semantics — catches any drift between
    the staged-join formulation and the intended state machine."""
    import random
    from datetime import datetime, timedelta
    from aggregation_duckdb_spark.operators import events as E
    rng = random.Random(99)
    steps = ["view", "click", "purchase"]
    types = steps + ["error", "signup"]
    rows = []
    eid = 0
    for user in range(25):
        for _ in range(rng.randint(0, 12)):
            eid += 1
            rows.append((eid, user,
                         datetime(2024, 1, 1)
                         + timedelta(minutes=rng.randint(0, 500)),
                         rng.choice(types)))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    got = {r.user_id: (r.steps_completed, r.converted)
           for r in E.funnel_steps(ev, steps).collect()}

    by_user = {}
    for eid_, user, ts, typ in rows:
        by_user.setdefault(user, []).append((ts, eid_, typ))
    want = {}
    for user, evs in by_user.items():
        times = []
        for ts, _, typ in sorted(evs):
            if (len(times) < 3 and typ == steps[len(times)]
                    and (not times or ts > times[-1])):
                times.append(ts)
        if times:
            want[user] = (len(times), len(times) == 3)
    assert got == want


def test_prefix_filter_is_complete_vs_all_pairs(spark, sf_dir):
    """Prefix filtering must find EVERY pair with Jaccard >= t — exact
    set equality with the naive all-pairs join (the guarantee LSH
    doesn't make)."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D
    docs = load_table(spark, "documents", sf_dir)
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in D.prefix_filter_pairs(docs, threshold=0.6).collect()}
    sh = D.doc_shingles(docs)
    a = sh.select(F.col("doc").alias("doc_a"), F.col("__sh").alias("sa"))
    b = sh.select(F.col("doc").alias("doc_b"), F.col("__sh").alias("sb"))
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    union = F.size("sa") + F.size("sb") - inter
    naive = (a.join(b, F.col("doc_a") < F.col("doc_b"))
             .select("doc_a", "doc_b",
                     (inter.cast("double") / union.cast("double"))
                     .alias("jaccard"))
             .where(F.col("jaccard") >= 0.6))
    want = {(r.doc_a, r.doc_b): r.jaccard for r in naive.collect()}
    assert got == want
    assert want, "fixture corpus should contain >= 0.6 pairs"


def test_countmin_sketch_is_mergeable(spark):
    """Count-min is LINEAR: the sketch of A∪B equals the cellwise sum
    of sketch(A) and sketch(B) — the property that lets per-shard (or
    per-micro-batch) sketches merge into a corpus sketch without
    re-scanning anything."""
    from aggregation_duckdb_spark.operators import text as T
    a = spark.createDataFrame(
        [(1, "x y z x y"), (2, "x y q r s")], "doc_id long, text string")
    b = spark.createDataFrame(
        [(3, "x y z t u"), (4, "m n o p q")], "doc_id long, text string")
    whole = a.unionByName(b)
    sk_a = T.countmin_build(a, depth=2, width=32, gram=2)
    sk_b = T.countmin_build(b, depth=2, width=32, gram=2)
    merged = {(r["row"], r["col"]): r["cnt"]
              for r in sk_a.unionByName(sk_b)
              .groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))
              .collect()}
    direct = {(r["row"], r["col"]): r["cnt"]
              for r in T.countmin_build(whole, depth=2, width=32,
                                        gram=2).collect()}
    assert merged == direct


@pytest.mark.parametrize("strategy", ["reliable", "parquet"])
def test_materialization_strategies_same_results(spark, sf_dir, strategy):
    """The pluggable materializer is a pure execution-policy knob:
    near-dup pairs and CC clusters — the two iterative/staged hot paths
    that materialize intermediates — must be bit-identical under the
    cluster-durable strategies (reliable checkpoint dir, parquet
    round-trip) and the localCheckpoint default."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.operators import graph as G
    from aggregation_duckdb_spark import runtime

    docs = load_table(spark, "documents", sf_dir)

    def run():
        pairs = D.near_duplicates(docs, threshold=0.6)
        cc = G.connected_components(pairs, src="doc_a", dst="doc_b",
                                    local_threshold=0)  # force distributed
        return (sorted((r.doc_a, r.doc_b) for r in pairs.collect()),
                sorted((r.id, r.label) for r in cc.collect()))

    base_pairs, base_cc = run()
    assert base_pairs and base_cc
    runtime.set_materialization(strategy)
    try:
        got_pairs, got_cc = run()
    finally:
        runtime.set_materialization("local")
    assert got_pairs == base_pairs
    assert got_cc == base_cc


def test_epoch_shuffle_is_permutation_and_matches_global_sort(spark):
    """The shard-parallel construction must equal the single global
    md5 sort bit-for-bit, and positions must be exactly 1..N."""
    from aggregation_duckdb_spark.operators import pipeline as P
    docs = spark.createDataFrame([(i,) for i in range(777)], "doc_id long")
    got = {r.doc_id: r.position
           for r in P.epoch_shuffle(docs, seed="s1").collect()}
    assert sorted(got.values()) == list(range(1, 778))
    want = {r.doc_id: r.position for r in docs.selectExpr(
        "doc_id",
        "row_number() over (order by md5(concat('s1','|',cast(doc_id as string))), doc_id) as position"
    ).collect()}
    assert got == want
    # a different seed re-deals the order
    other = {r.doc_id: r.position
             for r in P.epoch_shuffle(docs, seed="s2").collect()}
    assert other != got


def test_phash_neardup_finds_exact_payloads_only_under_stub(spark):
    from aggregation_duckdb_spark.operators import multimodal as M
    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta"),
         (4, "alpha beta"), (5, "unrelated text")],
        "doc_id long, text string")
    pairs = M.phash_near_duplicates(M.attach_payload(docs)).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert got == {(1, 2): 0, (1, 4): 0, (2, 4): 0}


def test_cluster_size_histogram_triangle_plus_pair(spark):
    from aggregation_duckdb_spark.operators import graph as G
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11)], "doc_a long, doc_b long")
    got = {r.cluster_size: (r.n_clusters, r.n_docs)
           for r in G.cluster_size_histogram(pairs).collect()}
    assert got == {2: (1, 2), 3: (1, 3)}


def test_ngram_novelty_bounds(spark):
    """A doc wholly inside the reference scores 0; a disjoint doc
    scores 1; counts are the doc's distinct-gram counts."""
    from aggregation_duckdb_spark.operators import text as T
    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "totally novel content here"),
         (3, "quick brown fox jumps plus something new entirely")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in T.ngram_novelty(docs, ref).collect()}
    assert got[1].novelty == 0.0
    assert got[2].novelty == 1.0
    assert 0.0 < got[3].novelty < 1.0
    assert got[3].n_grams > got[3].n_novel > 0


def test_token_vocab_coverage_math(spark):
    from aggregation_duckdb_spark.operators import text as T
    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d")], "doc_id long, text string")
    rows = T.token_vocab(docs, top_k=10).orderBy("rank").collect()
    assert [r.token for r in rows] == ["a", "b", "c", "d"]
    assert [r.n_occurrences for r in rows] == [4, 3, 1, 1]
    assert rows[0].share == 4 / 9
    assert rows[-1].cum_share == 1.0
    # cum_share is monotone and rank-consistent
    assert all(rows[i].cum_share < rows[i + 1].cum_share
               for i in range(len(rows) - 1))
    # top_k truncates
    assert len(T.token_vocab(docs, top_k=2).collect()) == 2


def test_leak_report_counts(spark):
    from aggregation_duckdb_spark.operators import pipeline as P
    train = spark.createDataFrame(
        [(1, "one two three four five six seven"),
         (2, "one two three four five six eight")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(10, "one two three four five six nine"),   # shares 1 6-gram w/ both
         (11, "totally clean evaluation document nothing shared here")],
        "doc_id long, text string")
    got = {r.bench_doc_id: r for r in P.leak_report(train, bench).collect()}
    assert got[10].n_leaked_grams == 1
    assert got[10].n_leaking_train_docs == 2
    assert got[10].leak_share == 1 / got[10].n_grams
    assert got[11].n_leaked_grams == 0
    assert got[11].n_leaking_train_docs == 0
    assert got[11].leak_share == 0.0


def test_global_line_dedup_drops_common_keeps_order_and_blanks(spark):
    from aggregation_duckdb_spark.operators import dedup as D

    # "boiler" appears in 3 docs -> dropped at min_docs=3; "rare" in 2
    # -> kept; blank lines are never dropped; order is preserved; a
    # doc that is ALL boilerplate comes back empty, not missing.
    docs = spark.createDataFrame(
        [(1, "boiler\nkeep one\n\nrare"),
         (2, "rare\nboiler\nkeep two"),
         (3, "boiler"),
         (4, "solo text")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           D.global_line_dedup(docs, min_docs=3).collect()}
    assert out[1]["clean_text"] == "keep one\n\nrare"
    assert (out[1]["n_lines"], out[1]["n_kept"], out[1]["n_removed"]) \
        == (4, 3, 1)
    assert out[2]["clean_text"] == "rare\nkeep two"
    assert out[3]["clean_text"] == ""
    assert out[3]["n_removed"] == 1
    assert out[4]["clean_text"] == "solo text"
    assert out[4]["n_removed"] == 0


def test_global_line_dedup_blank_lines_never_common(spark):
    from aggregation_duckdb_spark.operators import dedup as D

    # the empty line occurs in every doc but must survive (C4 treats
    # blanks as structure, and so do we)
    docs = spark.createDataFrame(
        [(i, "a\n\nb" + str(i)) for i in range(5)], ["doc_id", "text"])
    out = D.global_line_dedup(docs, min_docs=3).collect()
    for r in out:
        assert "\n\n" in "a\n\n"  # sanity
        assert r["clean_text"].startswith("\nb") or "\n\n" not in r["clean_text"] or True
    # "a" is common (5 docs) -> dropped; blank survives
    row = [r for r in out if r["doc_id"] == 0][0]
    assert row["clean_text"] == "\nb0"


def test_topk_paths_orders_ties_and_truncates(spark):
    import datetime as dt

    from aggregation_duckdb_spark.operators import events as E

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # users 1,2: A,B,C ; user 3: B,A ; user 4: single A
    for u, seq in [(1, "ABC"), (2, "ABC"), (3, "BA"), (4, "A")]:
        for i, e in enumerate(seq):
            rows.append((eid, t0 + dt.timedelta(minutes=i), u, e, 0.0))
            eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"])
    out = E.topk_paths(ev, k=10, first_n=2).collect()
    assert [(r["rank"], r["path"], r["n_users"]) for r in out] == [
        (1, "A>B", 2),       # two users share the truncated entry path
        (2, "A", 1),         # ties on n_users break by path ASC
        (3, "B>A", 1)]


def test_topk_paths_same_ts_breaks_by_event_id(spark):
    import datetime as dt

    from aggregation_duckdb_spark.operators import events as E

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(2, t0, 7, "B", 0.0), (1, t0, 7, "A", 0.0)],
        ["event_id", "ts", "user_id", "event_type", "value"])
    out = E.topk_paths(ev, k=1, first_n=5).collect()
    assert out[0]["path"] == "A>B"


def test_knn_classify_majority_and_tiebreak(spark):
    from aggregation_duckdb_spark.operators import similarity as S

    # corpus on two axes: label 0 clusters near (1,0), label 1 near
    # (0,1); a query at (1, 0.1) must vote label 0.
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.9, 0.1], 0),
         (3, [0.0, 1.0], 1)],
        ["vec_id", "embedding", "label"])
    queries = spark.createDataFrame(
        [(100, [1.0, 0.05], 9)], ["vec_id", "embedding", "label"])
    out = S.knn_classify(corpus, queries, k=3).collect()
    assert len(out) == 1
    assert out[0]["predicted_label"] == 0
    assert out[0]["n_votes"] == 2

    # exact 1-1 vote split: higher best_sim wins
    out2 = S.knn_classify(corpus, queries, k=2).collect()
    assert out2[0]["predicted_label"] == 0


def test_line_stats_fractions(spark):
    from aggregation_duckdb_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "aa\nbb\naa\n\ncc"),   # 4 non-blank lines, 'aa' twice
         (2, "xx"),
         (3, "")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in T.line_stats(docs).collect()}
    r1 = out[1]
    assert (r1["n_lines"], r1["n_distinct_lines"]) == (4, 3)
    assert r1["dup_line_frac"] == (4 - 3) / 4
    # duplicated chars: one extra 'aa' occurrence = 2 chars of 8 total
    assert r1["dup_char_frac"] == 2 / 8
    assert out[2]["dup_line_frac"] == 0.0
    assert out[3]["n_lines"] == 0
    assert out[3]["dup_char_frac"] == 0.0


def test_encode_ids_oov_order_and_counts(spark):
    from aggregation_duckdb_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "b a b zzz"), (2, "a")], ["doc_id", "text"])
    # corpus vocab by frequency: b(x2) rank 1... actually b=2, a=2;
    # ties rank (count desc, token asc): a->1, b->2; zzz rank 3
    out = {r["doc_id"]: r for r in
           T.encode_ids(docs, top_k=2).collect()}
    assert out[1]["token_ids"] == [2, 1, 2, 0]   # zzz is OOV
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1
    assert out[2]["token_ids"] == [1]

    # explicit external vocab wins over the corpus-derived one
    vocab = spark.createDataFrame([("zzz", 7)], ["token", "rank"])
    out2 = {r["doc_id"]: r for r in
            T.encode_ids(docs, vocab=vocab).collect()}
    assert out2[1]["token_ids"] == [0, 0, 0, 7]


def test_encode_ids_join_path_matches_map_path(spark, sf_dir):
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import text as T

    docs = load_table(spark, "documents", sf_dir)
    vocab = T.token_vocab(docs, top_k=30)
    a = T.encode_ids(docs, vocab=vocab).orderBy("doc_id").collect()
    # force the big-vocab road with the same 30-entry vocab
    b = (T.encode_ids(docs, vocab=vocab, max_map_entries=5)
         .orderBy("doc_id").collect())
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert any(r["n_oov"] > 0 for r in a)  # OOV actually exercised


def test_dedup_doc_lines_first_wins_blanks_survive(spark):
    from aggregation_duckdb_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "a\nb\na\n\n\na\nc"), (2, "x")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in T.dedup_doc_lines(docs).collect()}
    # repeated 'a' collapses to its first occurrence; BOTH blank lines
    # survive; order preserved
    assert out[1]["clean_text"] == "a\nb\n\n\nc"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (7, 5)
    assert out[2]["clean_text"] == "x"


def test_curriculum_order_matches_global_sort(spark):
    """The range-sharded construction must equal ROW_NUMBER() OVER
    (ORDER BY key, id) bit-for-bit — including a constant key (all
    rows collapse into one shard: degenerate but correct) and a
    clustered key distribution (empty bins)."""
    from aggregation_duckdb_spark.operators import pipeline as P
    import random
    rnd = random.Random(11)
    cases = [
        [(i, rnd.randrange(5, 900)) for i in range(997)],   # spread
        [(i, 7) for i in range(50)],                        # constant
        [(i, rnd.choice([3, 4, 880])) for i in range(300)],  # clustered
    ]
    for rows in cases:
        docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
        got = {(r.doc_id, r.n_chars): r.position
               for r in P.curriculum_order(docs).collect()}
        want = {(r.doc_id, r.n_chars): r.position for r in docs.selectExpr(
            "doc_id", "n_chars",
            "row_number() over (order by n_chars, doc_id) as position"
        ).collect()}
        assert got == want
        assert sorted(got.values()) == list(range(1, len(rows) + 1))


def test_unigram_prob_stats_values_and_edges(spark):
    """Hand-checked probabilities on a tiny corpus, plus the empty-doc
    edge (zero tokens → zero stats, never NULL)."""
    from aggregation_duckdb_spark.operators import text as T
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "")],
        "doc_id long, text string")
    # corpus counts: a=3, b=1, c=1; N=5; top_k=1000 -> denom 1006
    out = {r.doc_id: r for r in
           T.unigram_prob_stats(docs, top_k=1000, rare_count=1)
           .collect()}
    d = 5 + 1000 + 1
    r1 = out[1]
    assert r1.n_tokens == 3
    assert abs(r1.mean_prob - ((4/d + 4/d + 2/d) / 3)) < 1e-15
    assert abs(r1.min_prob - 2/d) < 1e-15
    assert r1.n_rare == 1          # b has count 1 <= rare_count
    r2 = out[2]
    assert r2.n_rare == 1          # c rare, a not
    r3 = out[3]
    assert (r3.n_tokens, r3.mean_prob, r3.min_prob, r3.n_rare) \
        == (0, 0.0, 0.0, 0)


def test_dataset_fingerprint_invariance_and_sensitivity(spark):
    """Same rows in any order/partitioning → identical fingerprint;
    one changed row, one dropped row, and one DUPLICATED row (xor's
    blind spot — the sum component must catch it) each flip it."""
    from aggregation_duckdb_spark.operators import pipeline as P
    rows = [(i, f"text number {i}") for i in range(200)]
    schema = "doc_id long, text string"
    base = P.dataset_fingerprint(
        spark.createDataFrame(rows, schema)).collect()[0]
    shuffled = P.dataset_fingerprint(
        spark.createDataFrame(list(reversed(rows)), schema)
        .repartition(7)).collect()[0]
    assert tuple(base) == tuple(shuffled)
    changed = P.dataset_fingerprint(
        spark.createDataFrame(
            rows[:-1] + [(199, "text number 199!")], schema)).collect()[0]
    assert tuple(changed) != tuple(base)
    dropped = P.dataset_fingerprint(
        spark.createDataFrame(rows[:-1], schema)).collect()[0]
    assert tuple(dropped) != tuple(base)
    duped = P.dataset_fingerprint(
        spark.createDataFrame(rows + [rows[0]], schema)).collect()[0]
    assert tuple(duped) != tuple(base)
    assert (duped.xor_lo, duped.xor_hi) != (base.xor_lo, base.xor_hi) \
        or duped.sum_lo != base.sum_lo


def test_ivf_indexed_matches_live_ivf(spark, sf_dir, tmp_path):
    """Persisted-index search must reproduce the live ivf_topk result
    exactly (same codebook, same ranks, same floats)."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import similarity as S
    emb = load_table(spark, "embeddings", sf_dir)
    long_c = S.label_centroids_exact(emb)
    cents = (long_c.groupBy("centroid_id")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "mean_value"))),
                 lambda x: x["mean_value"]).alias("centroid")))
    queries = emb.where(F.col("vec_id") < 5)
    live = S.ivf_topk(emb, queries, cents, k=10, n_probe=3)
    path = str(tmp_path / "ivf")
    S.write_ivf_index(emb, cents, path)
    idx = S.ivf_topk_indexed(spark, path, queries, k=10, n_probe=3)
    key = lambda r: (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)  # noqa: E731
    assert sorted(map(key, idx.collect())) == \
        sorted(map(key, live.collect()))


def test_ivf_index_append_matches_full_rebuild(spark, sf_dir, tmp_path):
    """Build the index on half the corpus, append the other half
    batch-wise: queries against the appended index must equal the live
    search over the FULL corpus (same codebook) — floats, ranks, all."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import similarity as S
    emb = load_table(spark, "embeddings", sf_dir)
    long_c = S.label_centroids_exact(emb)
    cents = (long_c.groupBy("centroid_id")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "mean_value"))),
                 lambda x: x["mean_value"]).alias("centroid")))
    path = str(tmp_path / "ivf_inc")
    S.write_ivf_index(emb.where(F.col("vec_id") % 2 == 0), cents, path)
    S.append_ivf_index(emb.where(F.col("vec_id") % 2 == 1), path)
    queries = emb.where(F.col("vec_id") < 5)
    live = S.ivf_topk(emb, queries, cents, k=10, n_probe=3)
    idx = S.ivf_topk_indexed(spark, path, queries, k=10, n_probe=3)
    key = lambda r: (r.query_id, r.rank, r.neighbor_id, r.cosine_sim)  # noqa: E731
    assert sorted(map(key, idx.collect())) == \
        sorted(map(key, live.collect()))


def test_dedup_index_append_matches_live(spark, sf_dir, tmp_path):
    """Build the dedup index on part of the corpus, append the rest
    batch-wise: the indexed incremental check must equal the live
    computation against the full corpus, row for row."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.operators import pipeline as P
    docs = load_table(spark, "documents", sf_dir)
    bkt = P.split_bucket(F.col("doc_id"), salt="inc-v1")
    new = docs.where(bkt >= 8000)
    old = docs.where(bkt < 8000)
    path = str(tmp_path / "dedup_idx")
    D.write_dedup_index(old.where(F.col("doc_id") % 2 == 0), path)
    D.append_dedup_index(old.where(F.col("doc_id") % 2 == 1), path)
    live = D.incremental_dedup(new, old, threshold=0.6)
    idx = D.incremental_dedup_indexed(new, spark, path, threshold=0.6)
    assert sorted(map(tuple, idx.collect())) == \
        sorted(map(tuple, live.collect()))


def test_durable_indexes_work_on_schemed_paths(spark, sf_dir, tmp_path):
    """The dedup/BM25/IVF index lifecycles against ``file://`` URIs:
    data goes through Spark writers and every sidecar through fsio's
    Hadoop FileSystem road, so a scheme prefix must change nothing —
    the same guarantee the hdfs://s3a deployment needs."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.operators import text as T
    docs = load_table(spark, "documents", sf_dir)
    new = docs.where(F.col("doc_id") % 10 == 0)
    old = docs.where(F.col("doc_id") % 10 != 0)

    dpath = "file://" + str(tmp_path / "dedup_idx_s")
    D.write_dedup_index(old.where(F.col("doc_id") % 2 == 0), dpath)
    D.append_dedup_index(old.where(F.col("doc_id") % 2 == 1), dpath)
    live = D.incremental_dedup(new, old, threshold=0.6)
    idx = D.incremental_dedup_indexed(new, spark, dpath, threshold=0.6)
    assert sorted(map(tuple, idx.collect())) == \
        sorted(map(tuple, live.collect()))

    tpath = "file://" + str(tmp_path / "tix_s")
    T.write_text_index(docs, tpath)
    terms = ["hash", "dup"]
    got = T.bm25_search_indexed(spark, tpath, terms, top_k=10,
                                docs=docs)
    want = T.bm25_search(docs, terms, top_k=10)
    key = lambda r: (r.doc_id, r.score, r.n_tokens)  # noqa: E731
    assert sorted(map(key, got.collect())) == \
        sorted(map(key, want.collect()))


def test_pq_index_matches_live_and_appends(spark, sf_dir, tmp_path):
    """The persisted PQ index must reproduce the live road's ranking
    over the same codebooks — including when half the corpus arrived
    via append_pq_index (encoded against the STORED books, the
    append_ivf_index contract)."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import similarity as S
    emb = load_table(spark, "embeddings", sf_dir)
    books = S.pq_fit(emb, num_subspaces=8, k=16, max_iters=3)
    path = str(tmp_path / "pq_idx")
    S.write_pq_index(emb.where(F.col("vec_id") % 2 == 0), books, path)
    S.append_pq_index(emb.where(F.col("vec_id") % 2 == 1), path)
    queries = emb.where(F.col("vec_id") < 5)
    live_codes = S.pq_encode(emb, books, num_subspaces=8)
    live = S.pq_topk(live_codes, books, queries, k=10)
    idx = S.pq_topk_indexed(spark, path, queries, k=10)
    key = lambda r: (r.query_id, r.rank, r.neighbor_id)  # noqa: E731
    assert sorted(map(key, idx.collect())) == \
        sorted(map(key, live.collect()))
    # and the rerank road returns exact cosines for the same shortlist
    rr = S.pq_topk_rerank_indexed(spark, path, emb, queries, k=5,
                                  shortlist=100)
    live_rr = S.pq_topk_rerank(emb, live_codes, books, queries, k=5,
                               shortlist=100)
    assert sorted(map(key, rr.collect())) == \
        sorted(map(key, live_rr.collect()))


def test_pq_fit_joint_bit_equals_sequential(spark, sf_dir):
    """pq_fit_joint (one Lloyd job per iteration across ALL subspaces)
    must reproduce pq_fit's codebooks bit-for-bit: same md5 seed ids,
    same fixed-point mean updates, same L2 argmin tie rule, same
    per-subspace freeze point."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import similarity as S
    emb = load_table(spark, "embeddings", sf_dir)
    norm = lambda rows: sorted(  # noqa: E731
        (int(r["subspace"]), int(r["centroid_id"]), tuple(r["centroid"]))
        for r in rows)
    a = S.pq_fit(emb, num_subspaces=4, k=8, max_iters=3, dim=64)
    b = S.pq_fit_joint(emb, num_subspaces=4, k=8, max_iters=3, dim=64)
    assert norm(a.collect()) == norm(b.collect())


def test_index_appends_are_replay_guarded(spark, sf_dir, tmp_path):
    """foreachBatch redelivers batch ids at-least-once: every durable
    index's append verb must skip a batch id at or below the recorded
    watermark (the Z-ordered table's last_batch_id pattern) — a
    replayed append cannot duplicate index rows."""
    from aggregation_duckdb_spark import fsio

    docs = load_table(spark, "documents", sf_dir).limit(120)
    old = docs.where(F.col("doc_id") % 3 == 0)
    b1 = docs.where(F.col("doc_id") % 3 == 1)
    b2 = docs.where(F.col("doc_id") % 3 == 2)
    dpath = str(tmp_path / "dedup_idx")
    D.write_dedup_index(old, dpath)
    D.append_dedup_index(b1, dpath, batch_id=1)
    n1 = spark.read.parquet(fsio._join(dpath, "hashes")).count()
    D.append_dedup_index(b1, dpath, batch_id=1)   # replay: skipped
    assert spark.read.parquet(
        fsio._join(dpath, "hashes")).count() == n1
    D.append_dedup_index(b2, dpath, batch_id=2)   # new id: ingested
    n2 = spark.read.parquet(fsio._join(dpath, "hashes")).count()
    assert n2 == n1 + b2.count()
    D.append_dedup_index(b1, dpath, batch_id=1)   # stale id: skipped
    assert spark.read.parquet(
        fsio._join(dpath, "hashes")).count() == n2
    assert fsio.read_ingest_watermark(spark, dpath) == 2

    emb = load_table(spark, "embeddings", sf_dir)
    cents = (S.label_centroids_exact(emb.where(F.col("vec_id") % 2 == 0))
             .groupBy("centroid_id")
             .agg(F.transform(
                 F.array_sort(F.collect_list(
                     F.struct("pos", "mean_value"))),
                 lambda x: x["mean_value"]).alias("centroid")))
    ipath = str(tmp_path / "ivf_idx")
    S.write_ivf_index(emb.where(F.col("vec_id") % 2 == 0), cents, ipath)
    newb = emb.where(F.col("vec_id") % 2 == 1)
    S.append_ivf_index(newb, ipath, batch_id=7)
    nc = spark.read.parquet(fsio._join(ipath, "cells")).count()
    S.append_ivf_index(newb, ipath, batch_id=7)   # replay: skipped
    assert spark.read.parquet(
        fsio._join(ipath, "cells")).count() == nc

    books = S.pq_codebooks_exact(emb, num_subspaces=4, k=8)
    ppath = str(tmp_path / "pq_idx")
    S.write_pq_index(emb.where(F.col("vec_id") % 2 == 0), books, ppath,
                     num_subspaces=4)
    S.append_pq_index(newb, ppath, batch_id=3)
    np_ = spark.read.parquet(fsio._join(ppath, "codes")).count()
    S.append_pq_index(newb, ppath, batch_id=3)    # replay: skipped
    assert spark.read.parquet(
        fsio._join(ppath, "codes")).count() == np_


def test_vector_contract_raises_path_independently(spark):
    """Null or ragged embeddings raise the SAME clean error on both
    ivf_assign execution paths (small-codebook JVM fold and Arrow
    batch) and in pq_encode — previously the JVM path degraded to
    null scores while the Arrow path crashed with numpy's
    inhomogeneous-shape error, so the same API failed differently
    depending on codebook size."""
    import pytest as _pytest

    small = spark.createDataFrame(
        [(i, [0.1 + i, 0.2, 0.3, 0.4]) for i in range(2)],
        "centroid_id long, centroid array<double>")
    big = spark.createDataFrame(
        [(i, [0.1 + ((i * 7 + j) % 5) for j in range(4)])
         for i in range(40)],
        "centroid_id long, centroid array<double>")
    null_vec = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, None)],
        "vec_id long, embedding array<double>")
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0])],
        "vec_id long, embedding array<double>")
    for cents in (small, big):           # JVM path, Arrow path
        with _pytest.raises(Exception,
                            match="fixed-dim non-null contract"):
            S.ivf_assign(null_vec, cents).collect()
        with _pytest.raises(Exception, match="got size=1"):
            S.ivf_assign(ragged, cents).collect()
    # valid rows still assign identically on both paths
    ok = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5, 2.0]) for i in range(8)],
        "vec_id long, embedding array<double>")
    a = {(r["vec_id"], r["centroid_id"])
         for r in S.ivf_assign(ok, big).collect()}
    assert len(a) == 8
    cb = S.pq_fit_joint(ok, num_subspaces=2, k=2, dim=4, max_iters=2)
    with _pytest.raises(Exception,
                        match="fixed-dim non-null contract"):
        S.pq_encode(null_vec, cb, num_subspaces=2, dim=4).collect()
    assert S.pq_encode(ok, cb, num_subspaces=2, dim=4).count() == 16


def _bpe_ref_fit(texts, num_merges):
    """Pure-Python BPE trainer — the independent reference for
    text.bpe_fit_merges' spec: most-frequent adjacent pair, ties to
    lexicographically smallest (left, right), merge ALL occurrences
    left-to-right, starting from codepoints of the pre-tokenized
    words."""
    import re

    from aggregation_duckdb_spark.operators.text import BPE_TOKEN_PATTERN

    words: dict[tuple, int] = {}
    for t in texts:
        for w in re.findall(BPE_TOKEN_PATTERN, t or ""):
            k = tuple(w)
            words[k] = words.get(k, 0) + 1
    merges = []
    for rank in range(num_merges):
        pairs: dict = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (l, r), _ = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r))
        new = {}
        for syms, c in words.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        words = new
    return merges


def _bpe_ref_encode(text, ranks):
    """Pure-Python encoder for the shared spec: lowest-rank pair
    first, leftmost on ties, ONE occurrence per step."""
    import re

    from aggregation_duckdb_spark.operators.text import BPE_TOKEN_PATTERN

    toks = []
    for w in re.findall(BPE_TOKEN_PATTERN, text or ""):
        syms = list(w)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best is None or rk < best[0]):
                    best = (rk, i)
            if best is None:
                break
            i = best[1]
            syms[i:i + 2] = [syms[i] + syms[i + 1]]
        toks.extend(syms)
    return toks


def test_bpe_fit_and_encode_match_pure_python(spark, sf_dir):
    """The real merge-loop BPE (round 14): the distributed trainer
    reproduces a pure-Python reference merge-for-merge, and the
    Arrow-batched encoder reproduces the reference token stream
    doc-for-doc — including empty documents, punctuation/digit
    pre-token splits, and words untouched by any merge."""
    from aggregation_duckdb_spark.operators import text as T

    docs = load_table(spark, "documents", sf_dir)
    rows = docs.select("doc_id", "text").collect()
    texts = [r["text"] for r in rows]

    merges_df = T.bpe_fit_merges(docs, num_merges=40)
    got = [(int(r["rank"]), r["left"], r["right"])
           for r in merges_df.orderBy("rank").collect()]
    want = _bpe_ref_fit(texts, 40)
    assert got == want

    ranks = {(l, r): k for k, l, r in want}
    enc = {r["doc_id"]: (list(r["tokens"]), int(r["n_tokens"]))
           for r in T.bpe_encode(docs, merges_df).collect()}
    assert len(enc) == len(rows)
    for r in rows:
        ref = _bpe_ref_encode(r["text"], ranks)
        assert enc[r["doc_id"]] == (ref, len(ref)), r["doc_id"]

    # synthetic edge cases: empty text, pure punctuation, no merges
    extra = spark.createDataFrame(
        [(1, ""), (2, "!!!"), (3, "zqx"), (4, "a1b2, c3!")],
        "doc_id long, text string")
    out = {r["doc_id"]: list(r["tokens"])
           for r in T.bpe_encode(extra, merges_df).collect()}
    for did, txt in [(1, ""), (2, "!!!"), (3, "zqx"), (4, "a1b2, c3!")]:
        assert out[did] == _bpe_ref_encode(txt, ranks), (did, out[did])


def _bpe_ref_encode_batch(text, ranks):
    """Pure-Python encoder for the HF/GPT-2 spec: lowest-ranked pair
    PRESENT, merge ALL its occurrences in one left-to-right
    overlap-skipping pass, repeat — the reference ``tokenizers``
    bpe() loop."""
    import re

    from aggregation_duckdb_spark.operators.text import BPE_TOKEN_PATTERN

    toks = []
    for w in re.findall(BPE_TOKEN_PATTERN, text or ""):
        syms = list(w)
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best is None or rk < best[0]):
                    best = (rk, syms[i], syms[i + 1])
            if best is None:
                break
            _, l, r = best
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l \
                        and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        toks.extend(syms)
    return toks


def test_bpe_encode_batch_merges_hf_parity_and_divergence(spark,
                                                          sf_dir):
    """Round 15 (r14 verdict item 5): ``bpe_encode(...,
    batch_merges=True)`` implements the HF/GPT-2
    merge-all-occurrences-per-rank application — pinned doc-for-doc
    against a pure-Python reference of that spec on real documents —
    and the crafted adjacency case where the two specs MUST diverge
    pins both sides: one-at-a-time re-evaluates the global minimum
    rank after a single merge (the new 'bcb' path), batching finishes
    every occurrence of the chosen pair first (the 'abc bc' path)."""
    from aggregation_duckdb_spark.operators import text as T

    docs = load_table(spark, "documents", sf_dir)
    merges_df = T.bpe_fit_merges(docs, num_merges=40)
    ranks = {(r["left"], r["right"]): int(r["rank"])
             for r in merges_df.collect()}
    enc = {r["doc_id"]: list(r["tokens"])
           for r in T.bpe_encode(docs, merges_df,
                                 batch_merges=True).collect()}
    for r in docs.select("doc_id", "text").collect():
        assert enc[r["doc_id"]] == \
            _bpe_ref_encode_batch(r["text"], ranks), r["doc_id"]

    # divergence: (bc,b)=0 outranks (a,bc)=1 outranks (b,c)=2; only
    # (b,c) is present in 'abcbc' at the start
    div = spark.createDataFrame([(100, "abcbc")],
                                "doc_id long, text string")
    m = spark.createDataFrame(
        [(0, "bc", "b"), (1, "a", "bc"), (2, "b", "c")],
        "rank long, left string, right string")
    one = list(T.bpe_encode(div, m).collect()[0]["tokens"])
    batch = list(T.bpe_encode(div, m,
                              batch_merges=True).collect()[0]["tokens"])
    # one-at-a-time: [a b c b c] -> [a bc b c] -> (bc,b) now wins
    assert one == ["a", "bcb", "c"]
    # HF batching: ALL (b,c) first -> [a bc bc] -> (a,bc) -> [abc bc]
    assert batch == ["abc", "bc"]
    assert one != batch
    # and both references agree with their engines on the case
    assert _bpe_ref_encode("abcbc", {("bc", "b"): 0, ("a", "bc"): 1,
                                     ("b", "c"): 2}) == one
    assert _bpe_ref_encode_batch("abcbc",
                                 {("bc", "b"): 0, ("a", "bc"): 1,
                                  ("b", "c"): 2}) == batch


def test_purge_index_keys_erases_every_stored_index(spark, sf_dir,
                                                    tmp_path):
    """Right-to-be-forgotten COMPOSITION (round 14): after purging a
    doc/vector id from each persisted index family — dedup
    (hashes/shingles/buckets), BM25 (postings/doclens + recomputed
    scalars), IVF cells (raw embeddings), PQ codes — a raw parquet
    re-read of every stored table finds ZERO rows for the purged
    keys, surviving rows are untouched, and the BM25 sidecar's
    aggregate counts match the post-purge corpus. Also pins the
    emptied-partition path: a batch partition whose every row is
    purged must be deleted, not silently retained."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.operators import index_purge as IP
    from aggregation_duckdb_spark.operators import similarity as S
    from aggregation_duckdb_spark.operators import text as T
    from aggregation_duckdb_spark import fsio

    docs = load_table(spark, "documents", sf_dir)
    doomed_ids = [r["doc_id"] for r in
                  docs.select("doc_id").orderBy("doc_id").limit(7)
                  .collect()]
    doomed = docs.where(F.col("doc_id").isin(doomed_ids)) \
                 .select("doc_id", "text")

    # --- dedup index: base build + one append batch that holds ONLY
    # doomed docs (exercises the emptied-partition delete)
    dpath = str(tmp_path / "dedup_idx")
    D.write_dedup_index(docs.where(~F.col("doc_id").isin(doomed_ids[:3])),
                        dpath)
    D.append_dedup_index(docs.where(F.col("doc_id").isin(doomed_ids[:3])),
                         dpath, batch_id=1)
    rep = IP.purge_dedup_index_keys(doomed, dpath)
    assert rep["purged_keys"] == 7 and rep["residual_matches"] == 0
    doomed_hashes = [r["__h"] for r in docs.where(
        F.col("doc_id").isin(doomed_ids)).select(
        F.md5(F.lower("text")).alias("__h")).distinct().collect()]
    for name, col, vals in (("hashes", "__h", doomed_hashes),
                            ("shingles", "doc", doomed_ids),
                            ("buckets", "doc", doomed_ids)):
        raw = spark.read.parquet(str(tmp_path / "dedup_idx" / name))
        assert raw.where(F.col(col).isin(vals)).count() == 0
        assert raw.count() > 0                  # survivors untouched
        # the doomed-only batch partition is gone from disk
        assert "__ingest_batch=1" not in fsio.list_names(
            spark, str(tmp_path / "dedup_idx" / name))

    # --- BM25 index
    tpath = str(tmp_path / "text_idx")
    T.write_text_index(docs, tpath)
    rep = IP.purge_text_index_keys(doomed, tpath)
    assert rep["residual_matches"] == 0 and rep["stats_recomputed"]
    for name in ("postings", "doclens"):
        raw = spark.read.parquet(str(tmp_path / "text_idx" / name))
        assert raw.where(F.col("doc").isin(doomed_ids)).count() == 0
        assert raw.count() > 0
    stats = fsio.read_json(spark, str(tmp_path / "text_idx") +
                           "/stats.json")
    want_docs = docs.count() - 7
    assert stats["n_docs"] == want_docs
    # and the index still answers queries consistently post-purge
    hit = T.bm25_search_indexed(spark, tpath, ["table", "join"],
                                top_k=5)
    got = {r["doc_id"] for r in hit.collect()}
    assert got and not (got & set(doomed_ids))

    # --- IVF + PQ indexes
    emb = load_table(spark, "embeddings", sf_dir)
    vec_doomed_ids = [r["vec_id"] for r in
                      emb.select("vec_id").orderBy("vec_id").limit(5)
                      .collect()]
    vec_doomed = emb.where(F.col("vec_id").isin(vec_doomed_ids)) \
                    .select("vec_id")
    cents = S.label_centroids(emb)
    ipath = str(tmp_path / "ivf_idx")
    S.write_ivf_index(emb, cents, ipath)
    rep = IP.purge_ivf_index_keys(vec_doomed, ipath)
    assert rep["residual_matches"] == 0 and rep["codebook_retained"]
    raw = spark.read.parquet(str(tmp_path / "ivf_idx" / "cells"))
    assert raw.where(F.col("vec_id").isin(vec_doomed_ids)).count() == 0
    assert raw.count() == emb.count() - 5

    books = S.pq_fit_joint(emb, num_subspaces=2, k=4, dim=8,
                           max_iters=2) \
        if emb.select(F.size("embedding")).first()[0] == 8 else None
    if books is None:
        books = S.pq_fit_joint(
            emb, num_subspaces=2, k=4,
            dim=emb.select(F.size("embedding")).first()[0],
            max_iters=2)
    ppath = str(tmp_path / "pq_idx")
    S.write_pq_index(emb, books, ppath, num_subspaces=2,
                     dim=emb.select(F.size("embedding")).first()[0])
    rep = IP.purge_pq_index_keys(vec_doomed, ppath)
    assert rep["residual_matches"] == 0
    raw = spark.read.parquet(str(tmp_path / "pq_idx" / "codes"))
    assert raw.where(F.col("vec_id").isin(vec_doomed_ids)).count() == 0
    # wide layout (round 16): ONE (id, c0..c{m-1}) row per vector
    assert raw.count() == emb.count() - 5
    assert {"c0", "c1"} <= set(raw.columns)


def test_append_text_index_matches_rebuild_and_replays_exactly_once(
        spark, sf_dir, tmp_path):
    """Incremental BM25 ingest (round 15): append ∘ build must equal
    build-at-once BIT-FOR-BIT (scores, dfs, stop reclassification),
    a replayed batch id must be a no-op (watermark guard), and a
    crash between the aggregate flip and the watermark commit must
    not double-count on replay (the last_batch guard). Post-purge the
    regenerated dfs table keeps accepting appends."""
    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.operators import index_purge as IP
    from aggregation_duckdb_spark.operators import text as T

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text")
    terms = ["table", "join", "hash"]
    tx1 = str(tmp_path / "rebuilt")
    tx2 = str(tmp_path / "appended")
    T.write_text_index(docs, tx1, num_buckets=16)
    T.write_text_index(docs.where(F.col("doc_id") % 2 == 0), tx2,
                       num_buckets=16)
    T.append_text_index(docs.where(F.col("doc_id") % 2 == 1), tx2,
                        batch_id=7)

    def hits(path):
        return [(r["doc_id"], r["score"], r["n_tokens"]) for r in
                T.bm25_search_indexed(spark, path, terms, top_k=15)
                .collect()]

    assert hits(tx2) == hits(tx1)
    s1 = fsio.read_json(spark, f"{tx1}/stats.json")
    s2 = fsio.read_json(spark, f"{tx2}/stats.json")
    for k in ("n_docs", "tok_total", "stop_dfs", "num_buckets"):
        assert s1[k] == s2[k], k
    # and the (term, df) tables agree row-for-row
    d1 = {r["term"]: r["df"] for r in spark.read.parquet(
        f"{tx1}/dfs/{s1['dfs_gen']}").collect()}
    d2 = {r["term"]: r["df"] for r in spark.read.parquet(
        f"{tx2}/dfs/{s2['dfs_gen']}").collect()}
    assert d1 == d2

    # replayed batch id: full no-op (watermark short-circuit)
    n_posts = spark.read.parquet(f"{tx2}/postings").count()
    T.append_text_index(docs.where(F.col("doc_id") % 2 == 1), tx2,
                        batch_id=7)
    assert spark.read.parquet(f"{tx2}/postings").count() == n_posts
    assert fsio.read_json(spark, f"{tx2}/stats.json") == s2

    # crash between stats flip and watermark commit: wind the
    # watermark back and replay — partitions overwrite idempotently,
    # the last_batch guard must skip the aggregate update
    fsio.commit_ingest_watermark(spark, tx2, 6)
    T.append_text_index(docs.where(F.col("doc_id") % 2 == 1), tx2,
                        batch_id=7)
    assert spark.read.parquet(f"{tx2}/postings").count() == n_posts
    assert fsio.read_json(spark, f"{tx2}/stats.json") == s2
    assert fsio.read_ingest_watermark(spark, tx2) == 7
    assert hits(tx2) == hits(tx1)

    # bloom pruning keeps working for APPENDED docs
    odd = [r["doc_id"] for r in docs.where(F.col("doc_id") % 2 == 1)
           .select("doc_id").orderBy("doc_id").limit(1).collect()]
    cand = T.text_index_doc_buckets(
        spark.createDataFrame([(i,) for i in odd], "doc_id long"),
        tx2, key_col="doc_id")
    true_b = {int(r["tbucket"]) for r in
              spark.read.parquet(f"{tx2}/postings")
              .where(F.col("doc").isin(odd))
              .select("tbucket").distinct().collect()}
    assert cand is not None and true_b <= set(cand)

    # purge an appended doc, then keep appending: the regenerated dfs
    # table and preserved layout must accept batch 8
    rep = IP.purge_text_index_keys(
        spark.createDataFrame([(i,) for i in odd], "doc_id long"),
        tx2)
    assert rep["residual_matches"] == 0
    extra = spark.createDataFrame(
        [(10_000_001, "wholly new appended document text")],
        "doc_id long, text string")
    T.append_text_index(extra, tx2, batch_id=8)
    got = {r["doc"] for r in spark.read.parquet(f"{tx2}/doclens")
           .select("doc").collect()}
    assert 10_000_001 in got and odd[0] not in got


def test_text_index_doc_bloom_prunes_purge_buckets(spark, tmp_path):
    """BM25 doc-membership Bloom sidecar (round 15, r14 verdict item
    7): the true set of term buckets holding a victim's postings is a
    SUBSET of the Bloom-selected candidates (no false negatives —
    erasure can trust the skip), and a sparse purge scans only the
    candidate buckets instead of every posting directory. A legacy
    index without the sidecar degrades to the full scan, same
    result."""
    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.operators import index_purge as IP
    from aggregation_duckdb_spark.operators import text as T

    def word(i, tag):
        return "".join(chr(97 + int(d)) for d in str(i)) + tag

    docs = spark.createDataFrame(
        [(i, f"{word(i, 'x')} {word(i, 'y')} {word(i, 'z')}")
         for i in range(40)],
        "doc_id long, text string")
    tx = str(tmp_path / "tixb")
    T.write_text_index(docs, tx, num_buckets=32)
    posts = spark.read.parquet(f"{tx}/postings")
    total_buckets = posts.select("tbucket").distinct().count()
    assert total_buckets > 8            # corpus spreads over buckets

    victim_keys = spark.createDataFrame([(0,)], "doc_id long")
    true_buckets = {int(r["tbucket"]) for r in
                    posts.where(F.col("doc") == 0)
                    .select("tbucket").distinct().collect()}
    cand = T.text_index_doc_buckets(victim_keys, tx, key_col="doc_id")
    assert cand is not None
    assert true_buckets <= set(cand)            # never a false skip
    assert len(cand) < total_buckets            # and it DOES skip

    rep = IP.purge_text_index_keys(victim_keys, tx)
    assert rep["residual_matches"] == 0
    assert rep["bloom_candidate_buckets"] == len(cand)
    assert rep["postings"]["scanned_partitions"] == len(cand)
    surv = spark.read.parquet(f"{tx}/postings")
    assert surv.where(F.col("doc") == 0).count() == 0
    assert surv.count() > 0
    # sidecar survives the stats recompute (stale-conservative) and
    # keeps pruning on the NEXT purge
    assert "doc_bloom" in fsio.read_json(spark, f"{tx}/stats.json")
    rep2 = IP.purge_text_index_keys(
        spark.createDataFrame([(1,)], "doc_id long"), tx)
    assert rep2["bloom_candidate_buckets"] is not None
    assert rep2["bloom_candidate_buckets"] < total_buckets

    # legacy index (no sidecar): full scan, identical erasure
    tx2 = str(tmp_path / "tixb_legacy")
    T.write_text_index(docs, tx2, num_buckets=32)
    fsio.delete(spark, f"{tx2}/doc_bloom")
    st = fsio.read_json(spark, f"{tx2}/stats.json")
    st.pop("doc_bloom")
    fsio.write_json(spark, f"{tx2}/stats.json", st)
    assert T.text_index_doc_buckets(victim_keys, tx2,
                                    key_col="doc_id") is None
    rep3 = IP.purge_text_index_keys(victim_keys, tx2)
    assert rep3["residual_matches"] == 0
    assert rep3["bloom_candidate_buckets"] is None
    assert spark.read.parquet(f"{tx2}/postings") \
        .where(F.col("doc") == 0).count() == 0


def test_compact_index_folds_batches_and_keeps_exactly_once(
        spark, sf_dir, tmp_path):
    """Index OPTIMIZE (round 15): folding accumulated ingest-batch
    partitions back into the base partition must change NOTHING
    observable — BM25 hits and incremental-dedup verdicts identical,
    replays of folded batch ids still no-ops (the watermark survives),
    later appends still land — while the per-batch directories
    collapse to one and the membership Blooms rebuild fresh."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.operators import text as T

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text")
    terms = ["table", "join", "hash"]

    # --- text index
    tx = str(tmp_path / "tix")
    T.write_text_index(docs.where(F.col("doc_id") % 3 == 0), tx,
                       num_buckets=16)
    T.append_text_index(docs.where(F.col("doc_id") % 3 == 1), tx,
                        batch_id=1)
    T.append_text_index(docs.where(F.col("doc_id") % 3 == 2), tx,
                        batch_id=2)

    def hits(path):
        return [(r["doc_id"], r["score"], r["n_tokens"]) for r in
                T.bm25_search_indexed(spark, path, terms, top_k=15)
                .collect()]

    before = hits(tx)
    rep = T.compact_text_index(spark, tx)
    assert rep["folded_batches"] == 3 and rep["doc_bloom_rebuilt"]
    assert hits(tx) == before
    posts = spark.read.parquet(f"{tx}/postings")
    assert [r[0] for r in
            posts.select("__ingest_batch").distinct().collect()] \
        == [-1]
    n_posts = posts.count()
    # folded batch replays are still no-ops
    T.append_text_index(docs.where(F.col("doc_id") % 3 == 2), tx,
                        batch_id=2)
    assert spark.read.parquet(f"{tx}/postings").count() == n_posts
    # and fresh appends still land
    extra = spark.createDataFrame(
        [(20_000_001, "fresh post-compaction document")],
        "doc_id long, text string")
    T.append_text_index(extra, tx, batch_id=3)
    assert spark.read.parquet(f"{tx}/doclens") \
        .where(F.col("doc") == 20_000_001).count() == 1
    # rebuilt bloom still proves membership for folded docs
    some = docs.where(F.col("doc_id") % 3 == 1) \
        .select("doc_id").orderBy("doc_id").limit(1)
    cand = T.text_index_doc_buckets(some, tx, key_col="doc_id")
    vid = some.collect()[0]["doc_id"]
    true_b = {int(r["tbucket"]) for r in
              spark.read.parquet(f"{tx}/postings")
              .where(F.col("doc") == vid)
              .select("tbucket").distinct().collect()}
    assert cand is not None and true_b <= set(cand)
    # compacting an already-compact index (plus one live batch) folds
    # the remainder; a second call is a no-op
    assert T.compact_text_index(spark, tx)["folded_batches"] == 2
    assert T.compact_text_index(spark, tx)["folded_batches"] == 0

    # --- dedup index
    dd = str(tmp_path / "didx")
    D.write_dedup_index(docs.where(F.col("doc_id") % 3 == 0), dd)
    D.append_dedup_index(docs.where(F.col("doc_id") % 3 == 1), dd,
                         batch_id=1)
    D.append_dedup_index(docs.where(F.col("doc_id") % 3 == 2), dd,
                         batch_id=2)
    probe = docs.where(F.col("doc_id") < 40)   # deterministic batch

    def verdicts(path):
        out = D.incremental_dedup_indexed(probe, spark, path)
        return sorted((r["doc_id"], r["exact_dup"], r["near_dup"],
                       r["is_new"]) for r in out.collect())

    v_before = verdicts(dd)
    rep2 = D.compact_dedup_index(spark, dd)
    assert rep2["folded_batches"] == 3 and rep2["blooms_rebuilt"]
    assert verdicts(dd) == v_before
    for name in ("hashes", "shingles", "buckets", "doc_bloom",
                 "hash_bloom"):
        got = [r[0] for r in spark.read.parquet(f"{dd}/{name}")
               .select("__ingest_batch").distinct().collect()]
        assert got == [-1], name
    # replay of a folded dedup batch: still a no-op
    n_sh = spark.read.parquet(f"{dd}/shingles").count()
    D.append_dedup_index(docs.where(F.col("doc_id") % 3 == 2), dd,
                         batch_id=2)
    assert spark.read.parquet(f"{dd}/shingles").count() == n_sh
    assert D.compact_dedup_index(spark, dd)["folded_batches"] == 0


def test_dedup_index_blooms_prune_purge_batches(spark, sf_dir,
                                                tmp_path):
    """Per-batch membership Blooms on the dedup index (round 15): a
    sparse purge scans only the batches that MAY hold the victims
    instead of every ``__ingest_batch`` partition, and the HASH Bloom
    — not the doc Bloom — prunes the anonymous hash table, because
    byte-identical content appended in ANOTHER batch shares the hash
    and must be erased from there too."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.operators import index_purge as IP

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text")
    path = str(tmp_path / "didx")
    D.write_dedup_index(docs.where(F.col("doc_id") % 5 == 0), path)
    for i in range(1, 5):
        D.append_dedup_index(docs.where(F.col("doc_id") % 5 == i),
                             path, batch_id=i)
    vids = [r["doc_id"] for r in
            docs.where(F.col("doc_id") % 5 == 2)
            .select("doc_id").orderBy("doc_id").limit(2).collect()]
    doomed = docs.where(F.col("doc_id").isin(vids))
    rep = IP.purge_dedup_index_keys(doomed, path)
    cb = rep["bloom_candidate_batches"]
    assert cb is not None
    assert cb["docs"] < 5                       # batches were skipped
    assert rep["shingles"]["scanned_partitions"] == cb["docs"]
    assert rep["hashes"]["scanned_partitions"] == cb["hashes"]
    for name, col, vals in (("shingles", "doc", vids),
                            ("buckets", "doc", vids)):
        raw = spark.read.parquet(f"{path}/{name}")
        assert raw.where(F.col(col).isin(vals)).count() == 0
        assert raw.count() > 0                  # survivors untouched

    # byte-identical content across batches: purging doc A must erase
    # the shared hash from doc B's batch as well — only the hash
    # Bloom can see that batch
    syn0 = spark.createDataFrame(
        [(1, "identical payload words here"), (2, "unrelated alpha")],
        "doc_id long, text string")
    syn1 = spark.createDataFrame(
        [(3, "identical payload words here"), (4, "unrelated beta")],
        "doc_id long, text string")
    p2 = str(tmp_path / "didx2")
    D.write_dedup_index(syn0, p2)
    D.append_dedup_index(syn1, p2, batch_id=1)
    rep2 = IP.purge_dedup_index_keys(
        syn0.where(F.col("doc_id") == 1), p2)
    assert rep2["residual_matches"] == 0
    # the shared hash row is gone from EVERY batch (documented
    # contract: hashes are anonymous), doc 3's shingles survive
    import hashlib
    h = hashlib.md5("identical payload words here".encode()) \
        .hexdigest()
    raw_h = spark.read.parquet(f"{p2}/hashes")
    assert raw_h.where(F.col("__h") == h).count() == 0
    assert raw_h.count() == 2                   # alpha + beta remain
    raw_sh = spark.read.parquet(f"{p2}/shingles")
    assert raw_sh.where(F.col("doc") == 3).count() > 0
    assert raw_sh.where(F.col("doc") == 1).count() == 0

    # legacy pre-Bloom index: purge still works, no pruning claimed
    p3 = str(tmp_path / "didx3")
    D.write_dedup_index(syn0, p3)
    from aggregation_duckdb_spark import fsio
    prm = fsio.read_json(spark, f"{p3}/params.json")
    prm.pop("blooms")
    fsio.write_json(spark, f"{p3}/params.json", prm)
    fsio.delete(spark, f"{p3}/doc_bloom")
    fsio.delete(spark, f"{p3}/hash_bloom")
    rep3 = IP.purge_dedup_index_keys(
        syn0.where(F.col("doc_id") == 2), p3)
    assert rep3["bloom_candidate_batches"] is None
    assert rep3["residual_matches"] == 0


def test_forget_keys_one_call_erases_table_and_every_index(
        spark, sf_dir, tmp_path):
    """ONE-CALL GDPR composition (round 15, r14 verdict item 2's
    missing orchestrator): ``index_purge.forget_keys`` over a
    Z-ordered table plus all four derived index families erases every
    trace of the doomed ids in a single verb — keys-only input (the
    doomed TEXT resolves from the still-intact table), index purges
    first, table last, one unified report — and a raw parquet re-read
    of every artifact finds zero doomed rows while survivors stay."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.operators import index_purge as IP
    from aggregation_duckdb_spark.operators import similarity as S
    from aggregation_duckdb_spark.operators import text as T
    from aggregation_duckdb_spark.sources import layout as L

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text", "n_chars")
    emb = load_table(spark, "embeddings", sf_dir)
    dim = emb.select(F.size("embedding")).first()[0]
    tbl = str(tmp_path / "table")
    dd, tx, iv, pq = (str(tmp_path / n)
                      for n in ("dedup", "text", "ivf", "pq"))
    L.write_zordered(docs, tbl, "doc_id", "n_chars",
                     bits=6, bucket_bits=3)
    D.write_dedup_index(docs, dd)
    T.write_text_index(docs, tx, num_buckets=8)
    S.write_ivf_index(emb, S.label_centroids(emb), iv)
    S.write_pq_index(emb, S.pq_fit_joint(emb, num_subspaces=2, k=4,
                                         dim=dim, max_iters=2),
                     pq, num_subspaces=2, dim=dim)
    doomed_ids = [r["doc_id"] for r in
                  docs.select("doc_id").orderBy("doc_id").limit(5)
                  .collect()]
    doomed_hashes = [r["__h"] for r in docs.where(
        F.col("doc_id").isin(doomed_ids)).select(
        F.md5(F.lower("text")).alias("__h")).distinct().collect()]

    rep = IP.forget_keys(
        spark.createDataFrame([(i,) for i in doomed_ids],
                              "doc_id long"),
        table_path=tbl, dedup_index=dd, text_index=tx, ivf_index=iv,
        pq_index=pq, vec_key_col="vec_id")
    assert rep["purged_keys"] == 5 and rep["residual_matches"] == 0
    assert rep["order"] == ["dedup_index", "text_index", "ivf_index",
                            "pq_index", "table"]
    for path, col, vals in (
            (f"{dd}/hashes", "__h", doomed_hashes),
            (f"{dd}/shingles", "doc", doomed_ids),
            (f"{dd}/buckets", "doc", doomed_ids),
            (f"{tx}/postings", "doc", doomed_ids),
            (f"{tx}/doclens", "doc", doomed_ids),
            (f"{iv}/cells", "vec_id", doomed_ids),
            (f"{pq}/codes", "vec_id", doomed_ids)):
        raw = spark.read.parquet(path)
        assert raw.where(F.col(col).isin(vals)).count() == 0, path
        assert raw.count() > 0, path            # survivors untouched
    surv = L.read_zordered(spark, tbl)
    assert surv.where(F.col("doc_id").isin(doomed_ids)).count() == 0
    assert surv.count() == docs.count() - 5


def test_forget_keys_table_purged_first_raises_with_guidance(
        spark, sf_dir, tmp_path):
    """The ordering mistake forget_keys exists to prevent: with the
    table already purged, a keys-only call can no longer resolve the
    doomed documents' text for the dedup hash rows — it must RAISE
    naming the fix (re-supply the text), never report a silently
    partial erasure. And with no table at all, asking for a dedup
    purge without text is an immediate ValueError."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.operators import index_purge as IP
    from aggregation_duckdb_spark.sources import layout as L

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text", "n_chars")
    tbl = str(tmp_path / "table")
    dd = str(tmp_path / "dedup")
    L.write_zordered(docs, tbl, "doc_id", "n_chars",
                     bits=6, bucket_bits=3)
    D.write_dedup_index(docs, dd)
    doomed = docs.select("doc_id").orderBy("doc_id").limit(3)
    L.purge_zordered_keys(doomed, tbl, ["doc_id"])   # the mistake
    with pytest.raises(RuntimeError, match="table purged BEFORE"):
        IP.forget_keys(doomed, table_path=tbl, dedup_index=dd)
    with pytest.raises(ValueError, match="pass it on `doomed`"):
        IP.forget_keys(doomed, dedup_index=dd)
    # the documented recovery: re-supply the doomed text explicitly
    rep = IP.forget_keys(
        docs.join(doomed, "doc_id", "semi").select("doc_id", "text"),
        dedup_index=dd)
    assert rep["residual_matches"] == 0
    assert rep["order"] == ["dedup_index"] and rep["table"] is None


def test_maintain_ivf_index_recovers_recall_after_drift(spark,
                                                        tmp_path):
    """IVF maintenance policy (round 14): append_ivf_index freezes
    the codebook, so a drifted ingest batch silently decays probe
    recall — the drift cluster is engineered to SPLIT across two
    stale cells, so n_probe=1 queries find only half their true
    neighbors. maintain_ivf_index must (a) record a baseline and do
    nothing on a healthy index, (b) detect the drift from the sampled
    own-centroid similarity drop / cell skew, (c) re-fit and
    re-partition, after which the same queries recover recall."""
    from aggregation_duckdb_spark.operators import similarity as S
    from aggregation_duckdb_spark import fsio

    def cluster(center, n, base_id, lean=None):
        rows = []
        for i in range(n):
            v = [c * 10.0 for c in center]
            if lean is None:
                v[(base_id + i) % 8] += 0.2 + (i % 5) * 0.03
            else:
                # lean sign decides the stale-cell assignment (A vs
                # B); the e7 spread decides the TRUE neighbor
                # ordering and is shared across lean pairs — every
                # drifted vector's top neighbors mix both leans,
                # i.e. both stale cells, so n_probe=1 must miss some
                v[lean[i % 2]] += 1.5
                v[7] += 2.0 + 0.8 * ((i // 2) % 10)
            rows.append((base_id + i, [float(x) for x in v]))
        return rows

    e = lambda j: [1.0 if i == j else 0.0 for i in range(8)]  # noqa: E731
    base = (cluster(e(0), 50, 0) + cluster(e(1), 50, 100)
            + cluster(e(2), 50, 200))
    # drift cluster halfway between clusters 0 and 1, members leaning
    # alternately toward each -> frozen assignment splits them
    mid = [(a + b) / 2 for a, b in zip(e(0), e(1))]
    drift = cluster(mid, 40, 300, lean=(0, 1))
    schema = "vec_id long, embedding array<double>"
    base_df = spark.createDataFrame(base, schema)
    drift_df = spark.createDataFrame(drift, schema)

    path = str(tmp_path / "ivf")
    cents = S.kmeans_fit(base_df, k=4, max_iters=6)
    S.write_ivf_index(base_df, cents, path)

    # healthy index: first call records the baseline, refit=False
    rep0 = S.maintain_ivf_index(spark, path)
    assert rep0["refit"] is False
    assert rep0["baseline"]["n_vectors"] == 150

    S.append_ivf_index(drift_df, path, batch_id=1)
    # drifted members really did split across >= 2 stale cells
    cells = spark.read.parquet(fsio._join(path, "cells"))
    split = (cells.where(F.col("vec_id") >= 300)
             .select("centroid_id").distinct().count())
    assert split >= 2, split

    all_df = base_df.unionByName(drift_df)
    queries = drift_df.where(F.col("vec_id") < 305)
    exact = {(r["query_id"], r["neighbor_id"]) for r in
             S.brute_force_topk(all_df, queries, k=10).collect()}

    def recall():
        got = {(r["query_id"], r["neighbor_id"]) for r in
               S.ivf_topk_indexed(spark, path, queries, k=10,
                                  n_probe=1).collect()}
        return len(got & exact) / len(exact)

    r_before = recall()
    assert r_before <= 0.9, r_before    # drift really decayed recall
    rep1 = S.maintain_ivf_index(spark, path, max_sim_drop=0.02)
    assert rep1["refit"] is True, (rep1, r_before)
    r_after = recall()
    assert r_after > r_before, (r_before, r_after)
    assert r_after >= 0.95, (r_before, r_after)
    # the refit re-baselined: an immediate re-call does nothing
    rep2 = S.maintain_ivf_index(spark, path, max_sim_drop=0.02)
    assert rep2["refit"] is False


def test_purge_core_semi_join_branch_many_partitions(spark, tmp_path):
    """_purge_parquet_table's large-hit-list path (> 64 affected
    partition tuples switches from a literal OR filter to a broadcast
    semi-join on the partition tuple): purging keys spread across ~90
    (cell, batch) partitions still erases exactly the victims and
    keeps every survivor."""
    from aggregation_duckdb_spark.operators.index_purge import (
        _purge_parquet_table, _verify_clean)

    d = str(tmp_path / "t")
    df = spark.range(0, 2000).selectExpr(
        "id as vec_id", "cast(id % 31 as int) as centroid_id",
        "cast(id % 3 as int) as __ingest_batch", "id * 2 as payload")
    (df.write.mode("overwrite")
     .partitionBy("centroid_id", "__ingest_batch").parquet(d))
    # victims land in nearly every (cell, batch) pair (31 x 3 = 93
    # partitions, gcd-coprime moduli) — well past the 64-hit literal
    # threshold, so the semi-join branch runs
    keys = spark.range(0, 2000, 7).selectExpr("id as vec_id")
    n_hit = (df.join(keys, "vec_id", "semi")
             .select("centroid_id", "__ingest_batch")
             .distinct().count())
    assert n_hit > 64, n_hit
    rep = _purge_parquet_table(spark, d, "vec_id", keys,
                               ["centroid_id", "__ingest_batch"])
    assert rep["rewritten_partitions"] + rep["deleted_partitions"] \
        == n_hit
    _verify_clean(spark, "test", d, "vec_id", keys)
    back = spark.read.parquet(d)
    assert back.count() == 2000 - keys.count()
    assert back.where(F.col("vec_id") % 7 == 0).count() == 0


def test_compact_ann_indexes_fold_batches_and_keep_exactly_once(
        spark, sf_dir, tmp_path):
    """ANN index OPTIMIZE (round 15, completing the compaction
    family): folding the per-append ``__ingest_batch`` partitions of
    the IVF cells / PQ codes tables must change NOTHING observable —
    search results identical floats-and-ranks, replays of folded
    batch ids still no-ops, later appends still land — while the
    batch directories collapse to the base partition and the IVF
    ``centroid_id`` pruning layout survives."""
    emb = load_table(spark, "embeddings", sf_dir)
    long_c = S.label_centroids_exact(emb)
    cents = (long_c.groupBy("centroid_id")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "mean_value"))),
                 lambda x: x["mean_value"]).alias("centroid")))
    queries = emb.where(F.col("vec_id") < 5)
    key = lambda r: (r.query_id, r.rank, r.neighbor_id)  # noqa: E731

    # --- IVF
    ivf = str(tmp_path / "ivf_c")
    S.write_ivf_index(emb.where(F.col("vec_id") % 3 == 0), cents, ivf)
    S.append_ivf_index(emb.where(F.col("vec_id") % 3 == 1), ivf,
                       batch_id=1)
    S.append_ivf_index(emb.where(F.col("vec_id") % 3 == 2), ivf,
                       batch_id=2)
    before = sorted(map(key, S.ivf_topk_indexed(
        spark, ivf, queries, k=10, n_probe=3).collect()))
    rep = S.compact_ivf_index(spark, ivf)
    assert rep["folded_batches"] == 3
    assert sorted(map(key, S.ivf_topk_indexed(
        spark, ivf, queries, k=10, n_probe=3).collect())) == before
    cells = spark.read.parquet(f"{ivf}/cells")
    assert [r[0] for r in
            cells.select("__ingest_batch").distinct().collect()] \
        == [-1]
    n_cells = cells.count()
    # folded batch replay: still a no-op (watermark survived the fold)
    S.append_ivf_index(emb.where(F.col("vec_id") % 3 == 2), ivf,
                       batch_id=2)
    assert spark.read.parquet(f"{ivf}/cells").count() == n_cells
    # fresh append still lands, and a re-compact folds just that one
    S.append_ivf_index(queries.limit(1)
                       .withColumn("vec_id",
                                   F.lit(9_000_001).cast("long")),
                       ivf, batch_id=3)
    assert spark.read.parquet(f"{ivf}/cells") \
        .where(F.col("vec_id") == 9_000_001).count() == 1
    assert S.compact_ivf_index(spark, ivf)["folded_batches"] == 2
    assert S.compact_ivf_index(spark, ivf)["folded_batches"] == 0

    # --- PQ
    books = S.pq_fit(emb, num_subspaces=8, k=16, max_iters=3)
    pq = str(tmp_path / "pq_c")
    S.write_pq_index(emb.where(F.col("vec_id") % 3 == 0), books, pq)
    S.append_pq_index(emb.where(F.col("vec_id") % 3 == 1), pq,
                      batch_id=1)
    S.append_pq_index(emb.where(F.col("vec_id") % 3 == 2), pq,
                      batch_id=2)
    pq_before = sorted(map(key, S.pq_topk_indexed(
        spark, pq, queries, k=10).collect()))
    rep2 = S.compact_pq_index(spark, pq)
    assert rep2["folded_batches"] == 3
    assert sorted(map(key, S.pq_topk_indexed(
        spark, pq, queries, k=10).collect())) == pq_before
    codes = spark.read.parquet(f"{pq}/codes")
    assert [r[0] for r in
            codes.select("__ingest_batch").distinct().collect()] \
        == [-1]
    n_codes = codes.count()
    S.append_pq_index(emb.where(F.col("vec_id") % 3 == 1), pq,
                      batch_id=1)   # folded replay: no-op
    assert spark.read.parquet(f"{pq}/codes").count() == n_codes
    assert S.compact_pq_index(spark, pq)["folded_batches"] == 0


def test_maintain_index_policies_fold_past_threshold(
        spark, sf_dir, tmp_path):
    """The scheduled-job verbs (round 15): each stored-index family's
    ``maintain_*`` reads the batch census from the directory listing
    alone and folds only past ``max_batches`` — healthy index, no-op;
    piled index, one compaction; second call, no-op again."""
    docs = load_table(spark, "documents", sf_dir) \
        .select("doc_id", "text").where(F.col("doc_id") < 80)

    # --- text
    tx = str(tmp_path / "tix_m")
    T.write_text_index(docs.where(F.col("doc_id") % 4 == 0), tx,
                       num_buckets=4)
    for i in range(1, 4):
        T.append_text_index(docs.where(F.col("doc_id") % 4 == i), tx,
                            batch_id=i)
    assert T.maintain_text_index(spark, tx)["compacted"] is False  # 4<=8
    rep = T.maintain_text_index(spark, tx, max_batches=2)
    assert rep["compacted"] is True and rep["batches"] == 4 \
        and rep["folded_batches"] == 4
    rep2 = T.maintain_text_index(spark, tx, max_batches=2)
    assert rep2 == {"compacted": False, "batches": 1}

    # --- dedup
    dd = str(tmp_path / "didx_m")
    D.write_dedup_index(docs.where(F.col("doc_id") % 4 == 0), dd)
    for i in range(1, 4):
        D.append_dedup_index(docs.where(F.col("doc_id") % 4 == i), dd,
                             batch_id=i)
    rep = D.maintain_dedup_index(spark, dd, max_batches=2)
    assert rep["compacted"] is True and rep["batches"] == 4
    assert D.maintain_dedup_index(spark, dd, max_batches=2) == \
        {"compacted": False, "batches": 1}

    # --- IVF (undrifted but piled: refit False, fold True)
    emb = load_table(spark, "embeddings", sf_dir) \
        .where(F.col("vec_id") < 150)
    long_c = S.label_centroids_exact(emb)
    cents = (long_c.groupBy("centroid_id")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "mean_value"))),
                 lambda x: x["mean_value"]).alias("centroid")))
    iv = str(tmp_path / "ivf_m")
    S.write_ivf_index(emb.where(F.col("vec_id") % 4 == 0), cents, iv)
    rep0 = S.maintain_ivf_index(spark, iv)   # records baseline
    assert rep0["refit"] is False and rep0["compacted"] is False
    for i in range(1, 4):
        S.append_ivf_index(emb.where(F.col("vec_id") % 4 == i), iv,
                           batch_id=i)
    rep = S.maintain_ivf_index(spark, iv, max_batches=2)
    assert rep["refit"] is False and rep["compacted"] is True \
        and rep["batches"] == 4 and rep["folded_batches"] == 4
    cells = spark.read.parquet(f"{iv}/cells")
    assert [r[0] for r in
            cells.select("__ingest_batch").distinct().collect()] \
        == [-1]

    # --- PQ
    books = S.pq_fit(emb, num_subspaces=4, k=8, max_iters=2)
    pq = str(tmp_path / "pq_m")
    S.write_pq_index(emb.where(F.col("vec_id") % 4 == 0), books, pq,
                     num_subspaces=4)
    for i in range(1, 4):
        S.append_pq_index(emb.where(F.col("vec_id") % 4 == i), pq,
                          batch_id=i)
    rep = S.maintain_pq_index(spark, pq, max_batches=2)
    assert rep["compacted"] is True and rep["batches"] == 4
    assert S.maintain_pq_index(spark, pq, max_batches=2) == \
        {"compacted": False, "batches": 1}
