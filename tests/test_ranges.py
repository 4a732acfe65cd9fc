"""Range/interval join semantics + round-5 pipeline operators:
the bucketized rewrites must return EXACTLY the naive theta-join's
answer (bucketing is an execution strategy, not an approximation),
chunking must cover every token, and incremental dedup must flag
exactly the planted duplicates."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aggregation_duckdb_spark.operators import dedup as D
from aggregation_duckdb_spark.operators import pipeline as P
from aggregation_duckdb_spark.operators import ranges as R


# ---------------------------------------------------------------------
# bucketed_range_join
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def facts(spark):
    # values straddle band edges, fall outside every band, and land
    # exactly ON lo (inclusive) and hi (exclusive)
    rows = [(i, v) for i, v in enumerate(
        [0.0, 0.5, 1.0, 4.999, 5.0, 9.0, 25.0, 99.9, 100.0, -3.0, 1e6])]
    return spark.createDataFrame(rows, "fact_id long, v double")


BANDS = [("a", 0.0, 1.0), ("b", 1.0, 5.0), ("c", 5.0, 100.0),
         # overlapping band: everything in [0, 50) matches it too
         ("wide", 0.0, 50.0)]


@pytest.mark.parametrize("width", [0.5, 1, 7, 1000])
def test_range_join_matches_naive_theta_join(spark, facts, width):
    bands = spark.createDataFrame(BANDS, "band_id string, lo double, hi double")
    got = (R.bucketed_range_join(facts, bands, "v", bucket_width=width)
           .select("fact_id", "band_id"))
    naive = facts.join(bands, (F.col("v") >= F.col("lo"))
                       & (F.col("v") < F.col("hi")))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, naive.select("fact_id", "band_id").collect()))


def test_range_join_boundaries(spark, facts):
    bands = spark.createDataFrame(BANDS[:3], "band_id string, lo double, hi double")
    got = dict(R.bucketed_range_join(facts, bands, "v", bucket_width=2)
               .select("fact_id", "band_id").collect())
    assert got[0] == "a"        # v=0.0: lo inclusive
    assert got[2] == "b"        # v=1.0: hi exclusive for a, lo for b
    assert got[4] == "c"        # v=5.0
    assert 9 not in got         # v=-3.0: below every band
    assert 10 not in got        # v=1e6: above every band


# ---------------------------------------------------------------------
# interval_overlap_join
# ---------------------------------------------------------------------

def _naive_overlap(left, right):
    return left.join(right, (F.col("ls") <= F.col("re"))
                     & (F.col("rs") <= F.col("le")))


@pytest.mark.parametrize("width", [1, 3, 10, 500])
def test_overlap_join_matches_naive_and_never_duplicates(spark, width):
    # long intervals spanning many buckets (the duplicate trap),
    # touching endpoints (inclusive), disjoint pairs, containment
    left = spark.createDataFrame(
        [(1, 0, 100), (2, 10, 12), (3, 50, 55), (4, 200, 300)],
        "lid long, ls long, le long")
    right = spark.createDataFrame(
        [(10, 90, 210), (11, 12, 14), (12, 56, 60), (13, 1000, 1001)],
        "rid long, rs long, re long")
    got = (R.interval_overlap_join(left, right, "ls", "le", "rs", "re",
                                   bucket_width=width)
           .select("lid", "rid").collect())
    naive = _naive_overlap(left, right).select("lid", "rid").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, naive))
    # claim filter, not distinct: exact multiset equality proves no dup
    assert len(got) == len(set(map(tuple, got)))
    pairs = set(map(tuple, got))
    assert (1, 10) in pairs     # overlap mid-interval
    assert (2, 11) in pairs     # touching endpoint (le == rs) counts
    assert (4, 10) in pairs     # containment edge
    assert (3, 12) not in pairs  # gap of 1


# ---------------------------------------------------------------------
# chunk_overlap
# ---------------------------------------------------------------------

def test_chunk_overlap_covers_every_token_and_overlaps(spark):
    text = " ".join(f"t{i}" for i in range(1, 101))  # 100 tokens
    docs = spark.createDataFrame([(1, text), (2, "a b"), (3, "x " * 24)],
                                 "doc_id long, text string")
    out = P.chunk_overlap(docs, context_len=24, stride=16).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 2 (2 tokens) and doc 3 (exactly 24): one chunk each
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 2
    assert len(by_doc[3]) == 1 and by_doc[3][0].n_chunk_tokens == 24
    # doc 1: ceil((100-24)/16)+1 = 6 chunks; all tokens covered, in order
    chunks = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert len(chunks) == 6
    assert chunks[0].start_token == 1 and chunks[5].start_token == 81
    covered = set()
    for c in chunks:
        toks = c.chunk_text.split(" ")
        assert toks == [f"t{i}" for i in
                        range(c.start_token, c.start_token + c.n_chunk_tokens)]
        covered.update(range(c.start_token, c.start_token + c.n_chunk_tokens))
    assert covered == set(range(1, 101))
    # consecutive chunks overlap by context_len - stride = 8 tokens
    assert chunks[1].start_token - chunks[0].start_token == 16
    assert chunks[0].n_chunk_tokens == 24


def test_chunk_overlap_rejects_bad_stride(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        P.chunk_overlap(docs, context_len=8, stride=0)
    with pytest.raises(ValueError):
        P.chunk_overlap(docs, context_len=8, stride=9)


# ---------------------------------------------------------------------
# incremental_dedup
# ---------------------------------------------------------------------

def test_incremental_dedup_flags_planted_duplicates(spark):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark woods tonight")
    existing = spark.createDataFrame(
        [(1, base),
         (2, "completely different content about spark aggregation "
             "engines and their shuffle behavior at scale"),
         (3, "unrelated third document with its own words entirely "
             "nothing shared here at all friends")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(100, base.upper()),                      # exact dup (normalized)
         (101, base.replace("tonight", "today")),  # near dup of 1
         (102, "fresh never before seen text that matches nothing "
               "in the corpus whatsoever brand new")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in D.incremental_dedup(new, existing).collect()}
    assert set(out) == {100, 101, 102}
    assert out[100].exact_dup and not out[100].is_new
    assert out[101].near_dup and out[101].n_near_matches >= 1
    assert not out[101].exact_dup and not out[101].is_new
    assert out[102].is_new and not out[102].exact_dup and not out[102].near_dup


def test_incremental_dedup_ignores_new_vs_new(spark):
    # two identical NEW docs, corpus unrelated: neither is flagged —
    # within-batch dedup is a separate (documented) pass
    existing = spark.createDataFrame(
        [(1, "old corpus content entirely different from the batch "
             "with many distinct words of its own")],
        "doc_id long, text string")
    dup = ("twin new documents with identical content should not flag "
           "each other in the incremental pass at all")
    new = spark.createDataFrame([(100, dup), (101, dup)],
                                "doc_id long, text string")
    out = {r.doc_id: r for r in D.incremental_dedup(new, existing).collect()}
    assert out[100].is_new and out[101].is_new


def test_range_joins_reject_overlapping_column_names(spark):
    f = spark.createDataFrame([(1, 2.0)], "id long, v double")
    b = spark.createDataFrame([("x", 0.0, 5.0, 9)],
                              "band_id string, lo double, hi double, id long")
    with pytest.raises(ValueError, match="rename"):
        R.bucketed_range_join(f, b, "v")
    l = spark.createDataFrame([(1, 0, 5)], "id long, s long, e long")
    r = spark.createDataFrame([(2, 1, 2)], "id long, rs long, re long")
    with pytest.raises(ValueError, match="rename"):
        R.interval_overlap_join(l, r, "s", "e", "rs", "re")


def test_overlap_join_randomized_equivalence_with_negatives(spark):
    """Seeded randomized intervals (including negative coordinates and
    zero-length points) across several widths: the bucketized join
    must return exactly the naive theta join's multiset — floor
    semantics on negatives and the claim filter included."""
    import random
    rng = random.Random(42)

    def intervals(n, lo=-500, hi=500):
        out = []
        for i in range(n):
            a = rng.randint(lo, hi)
            out.append((i, a, a + rng.randint(0, 80)))
        return out

    left = spark.createDataFrame(intervals(60), "lid long, ls long, le long")
    right = spark.createDataFrame(intervals(60), "rid long, rs long, re long")
    naive = sorted(map(tuple, _naive_overlap(left, right)
                       .select("lid", "rid").collect()))
    for width in (1, 7, 64, 1000):
        got = (R.interval_overlap_join(left, right, "ls", "le", "rs", "re",
                                       bucket_width=width)
               .select("lid", "rid").collect())
        assert sorted(map(tuple, got)) == naive, width
        assert len(got) == len(set(map(tuple, got))), width


def test_range_join_randomized_equivalence_with_negatives(spark):
    import random
    rng = random.Random(7)
    facts = spark.createDataFrame(
        [(i, rng.uniform(-200, 200)) for i in range(200)],
        "fact_id long, v double")
    bands = []
    for b in range(30):
        lo = rng.uniform(-220, 200)
        bands.append((f"b{b}", lo, lo + rng.uniform(0, 60)))
    bdf = spark.createDataFrame(bands, "band_id string, lo double, hi double")
    naive = sorted(map(tuple,
                       facts.join(bdf, (F.col("v") >= F.col("lo"))
                                  & (F.col("v") < F.col("hi")))
                       .select("fact_id", "band_id").collect()))
    for width in (0.5, 3, 50):
        got = sorted(map(tuple,
                         R.bucketed_range_join(facts, bdf, "v",
                                               bucket_width=width)
                         .select("fact_id", "band_id").collect()))
        assert got == naive, width


def test_range_joins_reject_nonpositive_width(spark):
    f = spark.createDataFrame([(1, 2.0)], "id long, v double")
    b = spark.createDataFrame([("x", 0.0, 5.0)],
                              "band_id string, lo double, hi double")
    with pytest.raises(ValueError, match="positive"):
        R.bucketed_range_join(f, b, "v", bucket_width=0)
    l = spark.createDataFrame([(1, 0, 5)], "lid long, ls long, le long")
    r = spark.createDataFrame([(2, 1, 2)], "rid long, rs long, re long")
    with pytest.raises(ValueError, match="positive"):
        R.interval_overlap_join(l, r, "ls", "le", "rs", "re",
                                bucket_width=-1)


def test_incremental_dedup_consistent_with_batch_pairs(spark, sf_dir):
    """Cross-table consistency: a new doc is near-dup-flagged by the
    incremental pass iff the BATCH near-dup join over the full corpus
    (same parameters, uncapped) produces a pair linking it to some
    existing doc — the incremental operator is the batch semantics
    restricted to cross-table pairs, not a different detector."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import pipeline as P
    docs = load_table(spark, "documents", sf_dir)
    bkt = P.split_bucket(F.col("doc_id"), salt="inc-v1")
    new = docs.where(bkt >= 8000)
    old = docs.where(bkt < 8000)
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    old_ids = {r.doc_id for r in old.select("doc_id").collect()}
    inc = {r.doc_id: r.near_dup
           for r in D.incremental_dedup(new, old, threshold=0.6).collect()}
    pairs = D.near_duplicates(docs, threshold=0.6,
                              max_bucket_size=None).collect()
    cross_flagged = set()
    for p in pairs:
        if p.doc_a in new_ids and p.doc_b in old_ids:
            cross_flagged.add(p.doc_a)
        if p.doc_b in new_ids and p.doc_a in old_ids:
            cross_flagged.add(p.doc_b)
    assert {d for d, nd in inc.items() if nd} == cross_flagged
    assert cross_flagged, "fixture corpus should contain cross pairs"
