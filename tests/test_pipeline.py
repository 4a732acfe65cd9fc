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
