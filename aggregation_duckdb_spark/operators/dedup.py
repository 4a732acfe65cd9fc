"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Design rules for 100 TB of documents:

- Everything is native ``pyspark.sql.functions`` — shingling, hashing,
  signatures, and band keys are all computed IN-ROW at scan speed (one
  map-side pass, no Python, no shuffle until the candidate join).
- Hashes are md5 hex strings (F.md5 is JVM-side): deterministic across
  runs, partitionings, AND engines — the DuckDB oracle reproduces every
  signature bit-for-bit. No seeded RNG anywhere.
- The only shuffles are groupBy(hash) for exact dedup and the
  band-bucket self-join for LSH. Bucket skew (boilerplate text → one
  giant bucket) is the classic failure mode: ``max_bucket_size`` drops
  pathological buckets (their members are near-identical anyway and are
  caught by the exact pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from aggregation_duckdb_spark.operators.text import tokens
from aggregation_duckdb_spark.runtime import (
    broadcast_if_counted, ensure_parallelism, materialize)


def shingles(text: Column, width: int = 3) -> Column:
    """Distinct word n-gram shingles, computed in-row.

    Short documents (< width tokens) produce their single truncated
    shingle rather than none, so every doc has a signature.

    The token array is LET-BOUND via a single-element outer transform:
    lambda variables hold evaluated values, so the per-start
    ``F.slice(toks, ...)`` references the bound array instead of
    re-running the tokenizing regex split once per shingle start (the
    same no-CSE-inside-HOF-bodies trap as the md5 pass in
    minhash_lsh_candidates — measured 5.6× on sf0.1 documents)."""
    def body(toks: Column) -> Column:
        starts = F.sequence(
            F.lit(1), F.greatest(F.size(toks) - (width - 1), F.lit(1)))
        return F.array_distinct(
            F.transform(starts,
                        lambda i: F.concat_ws(" ", F.slice(toks, i, width))))
    return F.element_at(F.transform(F.array(tokens(text)), body), 1)


# Smallest prime > 2^32 — modulus for the double-hashing MinHash family.
MINHASH_PRIME = 4294967311


def shingle_hash_pairs(shingle_col: Column) -> Column:
    """md5 per shingle split into two 32-bit halves (h1, h2); every
    hash family derives from them by integer arithmetic
    (Kirsch–Mitzenmacher double hashing), so signature width costs
    ~nothing extra. Both halves are exact in int64 and reproduce in
    DuckDB via ('0x'||substr)::BIGINT.

    NB: as a single Column expression the two halves each evaluate
    F.md5 (no CSE inside higher-order-function bodies) — convenience
    form only. The hot path (minhash_lsh_candidates) stages the md5
    pass as its own projection so it runs once per shingle."""
    return F.transform(
        shingle_col,
        lambda s: F.struct(
            F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(F.md5(s), 9, 8), 16, 10).cast("long").alias("h2")))


def minhash_signature_from_pairs(pairs_col: Column, num_hashes: int = 12) -> Column:
    """MinHash signature array<bigint>: slot i = min over shingles of
    (h1 + i·h2) mod P.  h1,h2 < 2^32 and i ≤ num_hashes, so the sum
    stays < 2^37 — exact in int64 in both Spark and DuckDB.

    IMPORTANT: pass a *column attribute* (materialized via select),
    not the raw expression — this column is referenced num_hashes
    times, and an inlined expression would recompute the md5 pass per
    family."""
    def family(i: int):
        return lambda p: (p.h1 + F.lit(i).cast("long") * p.h2) % MINHASH_PRIME

    return F.array(*[F.array_min(F.transform(pairs_col, family(i)))
                     for i in range(num_hashes)])


def minhash_signature(shingle_col: Column, num_hashes: int = 12) -> Column:
    """MinHash signature as a single expression (convenience form).
    Prefer the staged pipeline in minhash_lsh_candidates for hot paths —
    this form inlines the hash pass once per family."""
    return minhash_signature_from_pairs(shingle_hash_pairs(shingle_col),
                                        num_hashes)


def band_keys(signature: Column, num_bands: int, band_size: int) -> Column:
    """LSH band keys: md5 over each band's slice of the signature
    (bigint slots rendered base-10, '|'-joined — identical text in
    DuckDB's array_to_string). Two docs sharing any band key become a
    candidate pair."""
    return F.array(*[
        F.md5(F.concat_ws("|", F.lit(str(b)),
                          F.concat_ws("|", F.slice(signature, b * band_size + 1,
                                                   band_size).cast("array<string>"))))
        for b in range(num_bands)])


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           normalize: bool = True) -> DataFrame:
    """Exact dedup via hash-groupBy: one shuffle on the md5 key.
    Returns one row per duplicated content group with the keeper
    (minimum id) and group size."""
    t = F.lower(F.col(text_col)) if normalize else F.col(text_col)
    return (docs
            .select(F.md5(t).alias("content_hash"), F.col(id_col))
            .groupBy("content_hash")
            .agg(F.min(id_col).alias("keeper_id"),
                 F.count(F.lit(1)).alias("group_size"),
                 F.sort_array(F.collect_list(id_col)).alias("member_ids"))
            .where(F.col("group_size") > 1))


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", normalize: bool = True) -> DataFrame:
    """Survivors after exact dedup (keeps min id per content hash).
    Window-free: a groupBy(min) + semi-join keeps the fact-side plan
    shuffle-light and avoids a global sort."""
    t = F.lower(F.col(text_col)) if normalize else F.col(text_col)
    hashed = docs.withColumn("__h", F.md5(t))
    # Alias the aggregate's columns so the semi-join condition compares
    # distinct lineages — joining keepers["__h"] back against its own
    # parent would be the ambiguous-self-join shape Spark warns about
    # ("trivially true equals predicate") and resolves by fiat.
    keepers = (hashed.groupBy("__h").agg(F.min(id_col).alias("__keep_id"))
               .select(F.col("__h").alias("__keep_h"), "__keep_id"))
    return (hashed.join(keepers, (hashed["__h"] == keepers["__keep_h"])
                        & (hashed[id_col] == keepers["__keep_id"]), "left_semi")
            .drop("__h"))


def doc_shingles(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", shingle_width: int = 3,
                 out_col: str = "__sh", checkpoint: bool = True) -> DataFrame:
    """(id, shingle-set) for the corpus, parallelism-guarded and
    (when shared) checkpointed: the single expensive scan that both
    the LSH candidate pass and the Jaccard verify derive from. At
    cluster scale this is 'tokenize once, write, reuse'. Pass
    ``checkpoint=False`` when exactly one consumer follows — the
    materialization would just double the work."""
    # Local inputs can arrive as one parquet split; the shingle/hash
    # pass is the CPU-bound stage, so spread it. Project to (id, text)
    # BEFORE repartitioning so only those bytes shuffle. On a real
    # cluster the scan already yields >= cores partitions and the
    # repartition is skipped.
    slim = ensure_parallelism(
        docs.select(F.col(id_col).alias("doc"), F.col(text_col)))
    sh = slim.select("doc",
                     shingles(F.col(text_col), shingle_width).alias(out_col))
    return materialize(sh) if checkpoint else sh


def band_buckets(shingled: DataFrame, num_hashes: int = 12,
                 num_bands: int = 4) -> DataFrame:
    """(doc, bucket) LSH band keys from a :func:`doc_shingles` frame.

    md5 staged as its own projection: inside a single higher-order
    lambda the two 32-bit halves would each evaluate F.md5 (no CSE in
    HOF bodies) — this keeps the expensive pass at ONE md5 per
    shingle. Shared by the batch self-join path and the incremental
    new-vs-corpus path."""
    if num_bands <= 0 or num_hashes % num_bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} must be a positive multiple of "
            f"num_bands={num_bands}")
    band_size = num_hashes // num_bands
    hs = shingled.select("doc", F.transform(F.col("__sh"), F.md5).alias("hs"))
    hp = hs.select("doc", F.transform(
        F.col("hs"),
        lambda h: F.struct(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("h2"))
    ).alias("hp"))
    sigged = hp.select("doc", minhash_signature_from_pairs(
        F.col("hp"), num_hashes).alias("sig"))
    return sigged.select(
        "doc", F.explode(band_keys(F.col("sig"), num_bands, band_size)).alias("bucket"))


def minhash_lsh_candidates(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 12,
                           num_bands: int = 4, shingle_width: int = 3,
                           max_bucket_size: int | None = None,
                           shingled: DataFrame | None = None) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    shingle→minhash→band→bucket-join: signatures and band keys are
    map-side; the shuffle is the explode+self-join on band buckets.
    Returns distinct (doc_a, doc_b) with doc_a < doc_b.

    Staged as separate projections so each pass is computed once per
    row: shingles → one md5/shingle → arithmetic hash families →
    band keys. (A single nested expression would re-inline the md5
    pass num_hashes·num_bands times — measured 45× slower.)

    ``shingled``: pre-computed :func:`doc_shingles` output to share
    the corpus scan with a downstream verify stage."""
    if num_bands <= 0 or num_hashes % num_bands != 0:
        # a remainder would silently drop signature slots from banding;
        # band_size=0 would give every doc identical band keys (the
        # self-join degenerates to a full cross product)
        raise ValueError(
            f"num_hashes={num_hashes} must be a positive multiple of "
            f"num_bands={num_bands}")
    band_size = num_hashes // num_bands
    if shingled is None:
        # sole consumer here — the bucketed frame below is the
        # checkpoint; materializing shingles too would double the work
        shingled = doc_shingles(docs, text_col, id_col, shingle_width,
                                checkpoint=False)
    bucketed = band_buckets(shingled, num_hashes, num_bands)
    if max_bucket_size is not None:
        # capped path: ONE shuffle — each bucket's docs collect into a
        # sorted array (bounded by the cap, so the row is bounded),
        # oversize buckets drop, and the pairs generate IN-ROW. No
        # bucket-sizes pass, no self-join, no checkpoint needed (the
        # signature pass runs once because the plan is linear).
        grouped = (bucketed.groupBy("bucket")
                   .agg(F.sort_array(F.collect_set("doc")).alias("docs"))
                   .where((F.size("docs") >= 2)
                          & (F.size("docs") <= max_bucket_size)))
        pair_arrays = F.flatten(F.transform(
            F.col("docs"),
            lambda x, i: F.transform(
                F.slice(F.col("docs"), i + F.lit(2), F.size(F.col("docs"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")))))
        return (grouped.select(F.explode(pair_arrays).alias("p"))
                .select(F.col("p.doc_a"), F.col("p.doc_b"))
                .distinct())
    # uncapped (oracle-exact) path: bucket self-join. Materialize
    # before the join so the signature pass runs once, not once per
    # join side — at cluster scale this is "write signatures, then
    # join", which the `parquet` materialization strategy does
    # literally (runtime.set_materialization).
    bucketed = materialize(bucketed)
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                   & (F.col("a.doc") < F.col("b.doc")))
            .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
            .distinct())


def jaccard_for_pairs(pairs: DataFrame, docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", shingle_width: int = 3,
                      shingled: DataFrame | None = None) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs.

    |A∩B| via array_intersect of the (already distinct) shingle sets;
    |A∪B| by inclusion-exclusion — all integer math, then one double
    division: bit-identical across engines."""
    if shingled is None:
        shingled = doc_shingles(docs, text_col, id_col, shingle_width)
    sh = shingled.withColumnRenamed("doc", "__id")
    a = sh.alias("sa")
    b = sh.alias("sb")
    inter = F.size(F.array_intersect(F.col("sa.__sh"), F.col("sb.__sh")))
    union = F.size(F.col("sa.__sh")) + F.size(F.col("sb.__sh")) - inter
    # plain equi-joins: the shingle table is corpus-sized (one row per
    # doc carrying its whole shingle set) — force-broadcasting it would
    # replicate the corpus to every executor. AQE may still choose
    # broadcast when it is actually small.
    return (pairs
            .join(a, pairs["doc_a"] == F.col("sa.__id"))
            .join(b, pairs["doc_b"] == F.col("sb.__id"))
            .select("doc_a", "doc_b",
                    (inter.cast("double") / union.cast("double")).alias("jaccard")))


DEFAULT_MAX_BUCKET_SIZE = 1000


def near_duplicates(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", threshold: float = 0.6,
                    num_hashes: int = 12, num_bands: int = 4,
                    shingle_width: int = 3,
                    max_bucket_size: int | None = DEFAULT_MAX_BUCKET_SIZE,
                    ) -> DataFrame:
    """The full scale path: LSH candidates → exact Jaccard verify →
    threshold. False positives from banding are filtered here; false
    negatives are bounded by the (num_hashes, num_bands) S-curve.

    ``max_bucket_size`` defaults FINITE: one boilerplate-heavy band
    bucket (N identical headers) makes the self-join quadratic in N —
    at corpus scale that single bucket dominates the whole job. Members
    of a dropped bucket are near-identical to each other and still pair
    up through their other (num_bands - 1) band keys unless they
    collide there too, in which case the exact-dedup pass is the
    intended catcher. Pass ``None`` only for oracle-exact comparisons
    at small scale."""
    shingled = doc_shingles(docs, text_col, id_col, shingle_width)
    cands = minhash_lsh_candidates(docs, text_col, id_col, num_hashes,
                                   num_bands, shingle_width, max_bucket_size,
                                   shingled=shingled)
    scored = jaccard_for_pairs(cands, docs, text_col, id_col, shingle_width,
                               shingled=shingled)
    return scored.where(F.col("jaccard") >= threshold)


def shared_shingle_candidates(docs: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id",
                              shingle_width: int = 3,
                              max_df: int = 20,
                              shingled: DataFrame | None = None) -> DataFrame:
    """Candidate pairs from an inverted shingle index — the candidate
    generator for CONTAINMENT dedup, where MinHash-LSH is the wrong
    tool (LSH recall follows Jaccard, and a short document embedded in
    a long one has low Jaccard despite full containment).

    explode(shingles) → drop shingles with document frequency >
    ``max_df`` (stop-shingles would pair everything with everything —
    the same quadratic-bucket hazard as LSH, same cure) → self-join on
    shingle → distinct (doc_a < doc_b). Exact for any pair sharing at
    least one sub-``max_df`` shingle; a fully-contained document whose
    every shingle is corpus-common is boilerplate by definition and
    exact/LSH dedup's business."""
    if shingled is None:
        shingled = doc_shingles(docs, text_col, id_col, shingle_width,
                                checkpoint=False)
    ex = shingled.select("doc", F.explode(F.col("__sh")).alias("s"))
    df_counts = ex.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
    rare = ex.join(df_counts.where(F.col("__df") <= max_df), "s", "left_semi")
    rare = materialize(rare)  # shared by both join sides
    a, b = rare.alias("a"), rare.alias("b")
    return (a.join(b, (F.col("a.s") == F.col("b.s"))
                   & (F.col("a.doc") < F.col("b.doc")))
            .select(F.col("a.doc").alias("doc_a"),
                    F.col("b.doc").alias("doc_b"))
            .distinct())


def containment_for_pairs(pairs: DataFrame, docs: DataFrame,
                          text_col: str = "text", id_col: str = "doc_id",
                          shingle_width: int = 3,
                          shingled: DataFrame | None = None) -> DataFrame:
    """Asymmetric overlap for candidate pairs: containment(X→Y) =
    |X∩Y| / |X|. A 50-token quote inside a 5000-token page scores
    ~1.0 here but ~0.01 Jaccard — this is the sub-document dedup
    signal. Emits both directions plus ``max_containment`` (the
    smaller side's score); integer set math then one double division,
    bit-identical across engines."""
    if shingled is None:
        shingled = doc_shingles(docs, text_col, id_col, shingle_width)
    sh = shingled.withColumnRenamed("doc", "__id")
    a = sh.alias("ca")
    b = sh.alias("cb")
    inter = F.size(F.array_intersect(F.col("ca.__sh"), F.col("cb.__sh")))
    return (pairs
            .join(a, pairs["doc_a"] == F.col("ca.__id"))
            .join(b, pairs["doc_b"] == F.col("cb.__id"))
            .select(
                "doc_a", "doc_b",
                (inter.cast("double")
                 / F.size(F.col("ca.__sh")).cast("double"))
                .alias("containment_a"),
                (inter.cast("double")
                 / F.size(F.col("cb.__sh")).cast("double"))
                .alias("containment_b"))
            .withColumn("max_containment",
                        F.greatest("containment_a", "containment_b")))


def sub_duplicates(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", threshold: float = 0.8,
                   shingle_width: int = 3, max_df: int = 20) -> DataFrame:
    """Sub-document (containment) dedup, full path: inverted-index
    candidates → exact containment verify → threshold on the smaller
    side. One shared shingle scan feeds both stages.

    Fused DICTIONARY-ENCODED pipeline (same trick as
    :func:`prefix_filter_pairs`, measured there 3× on the verify):
    the inverted-index census assigns each distinct shingle a unique
    int64 id — a pinned bijection, so candidate generation (equi-join
    on the id ≡ equi-join on the string) and the containment ratios
    (intersection sizes / set sizes under a bijection) are
    bit-identical to the string form in
    :func:`shared_shingle_candidates` + :func:`containment_for_pairs`,
    which remain the composable public pieces."""
    shingled = doc_shingles(docs, text_col, id_col, shingle_width)
    ex = shingled.select("doc", F.explode(F.col("__sh")).alias("s"))
    cens = materialize(
        ex.groupBy("s").agg(F.count(F.lit(1)).alias("__df"))
        .withColumn("tid", F.monotonically_increasing_id()))
    exi = ex.join(cens.select("s", "tid", "__df"), "s")
    rare = materialize(exi.where(F.col("__df") <= max_df)
                       .select("doc", "tid"))  # shared by both sides
    # per-doc set size n and rare-shingle count r: the candidate bound
    # below needs both, and the frame is doc-sized (round 16)
    sizes = (shingled.select("doc", F.size("__sh").alias("__n"))
             .join(rare.groupBy("doc")
                   .agg(F.count(F.lit(1)).alias("__r")), "doc"))
    rare_n = rare.join(sizes, "doc")
    a, b = rare_n.alias("a"), rare_n.alias("b")
    # Grouped candidate bound (round 16, the containment analogue of
    # prefix_filter_pairs' suffix bound): per pair, m counts the
    # SHARED RARE shingles (each shared rare tid matches exactly once
    # — shingle sets are distinct), and any further common shingle is
    # COMMON (df > max_df) on both sides, so
    #   |X∩Y| <= m + min(n_a - r_a, n_b - r_b).
    # max_containment >= t  <=>  |X∩Y| / min(n_a, n_b) >= t; compare
    # the bound through the SAME double division the verify uses —
    # division by a shared positive denominator is monotone under
    # IEEE rounding, so bound >= |X∩Y| implies bound-ratio >=
    # verify-ratio and no qualifying pair can be dropped (a ceil-form
    # bound would risk exactly that on float edges like 0.8*5).
    # Measured at sf0.1: 1,119,733 distinct candidate pairs -> 256
    # into the exact array_intersect verify, output identical.
    bound = (F.col("__m")
             + F.least(F.col("__na") - F.col("__ra"),
                       F.col("__nb") - F.col("__rb"))).cast("double")
    cands = (a.join(b, (F.col("a.tid") == F.col("b.tid"))
                    & (F.col("a.doc") < F.col("b.doc")))
             .select(F.col("a.doc").alias("doc_a"),
                     F.col("b.doc").alias("doc_b"),
                     F.col("a.__n").alias("__na"),
                     F.col("a.__r").alias("__ra"),
                     F.col("b.__n").alias("__nb"),
                     F.col("b.__r").alias("__rb"))
             .groupBy("doc_a", "doc_b", "__na", "__ra", "__nb", "__rb")
             .agg(F.count(F.lit(1)).alias("__m"))
             .where(bound / F.least(F.col("__na"), F.col("__nb"))
                    .cast("double") >= F.lit(threshold))
             .select("doc_a", "doc_b"))
    sh_int = materialize(
        exi.groupBy("doc").agg(F.collect_list("tid").alias("__shi")))
    ca = sh_int.select(F.col("doc").alias("__ida"),
                       F.col("__shi").alias("__sa"))
    cb = sh_int.select(F.col("doc").alias("__idb"),
                       F.col("__shi").alias("__sb"))
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    scored = (cands
              .join(ca, cands["doc_a"] == F.col("__ida"))
              .join(cb, cands["doc_b"] == F.col("__idb"))
              .select(
                  "doc_a", "doc_b",
                  (inter.cast("double")
                   / F.size(F.col("__sa")).cast("double"))
                  .alias("containment_a"),
                  (inter.cast("double")
                   / F.size(F.col("__sb")).cast("double"))
                  .alias("containment_b"))
              .withColumn("max_containment",
                          F.greatest("containment_a", "containment_b")))
    return scored.where(F.col("max_containment") >= threshold)


def simhash_bits(text: Column, bits: int = 16) -> Column:
    """SimHash over tokens as a bit string.

    Bit b of a token's hash = high bit of hex digit b of its md5 (a
    digit in '89abcdef'); the document bit is the sign of the ±1 sum
    over tokens (repeats included). Pure integer math — portable.

    The md5 pass is staged: one ``transform(tokens, md5)`` projection,
    then a single fold over the cached hex strings with an
    array-of-counters accumulator. A per-bit fold would re-evaluate
    ``md5(t)`` inside each lambda body (HOF bodies get no common
    subexpression elimination) — ``bits``× the hash work, the same
    trap the MinHash path stages around (see minhash_lsh_candidates).
    """
    hashed = F.transform(tokens(text), F.md5)

    def contribs(h: Column) -> Column:
        # per-token ±1 vector, one cheap substring per bit of the
        # ALREADY-hashed hex — md5 runs exactly once per token above
        return F.array(*[
            F.when(F.substring(h, b + 1, 1).isin(*list("89abcdef")), 1)
             .otherwise(-1)
            for b in range(bits)])

    counts = F.aggregate(
        hashed,
        F.array(*[F.lit(0)] * bits),
        lambda acc, h: F.zip_with(acc, contribs(h), lambda a, c: a + c))
    return F.array_join(
        F.transform(counts, lambda c: F.when(c > 0, "1").otherwise("0")), "")


def simhash_groups(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", bits: int = 16) -> DataFrame:
    """Docs grouped by identical SimHash — near-dup buckets at the
    chosen bit width (coarser than MinHash; one shuffle)."""
    return (docs
            .select(F.col(id_col), simhash_bits(F.col(text_col), bits).alias("simhash"))
            .groupBy("simhash")
            .agg(F.count(F.lit(1)).alias("group_size"),
                 F.min(id_col).alias("keeper_id"),
                 F.sort_array(F.collect_list(id_col)).alias("member_ids")))


def incremental_dedup(new: DataFrame, existing: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      threshold: float = 0.6, num_hashes: int = 12,
                      num_bands: int = 4, shingle_width: int = 3,
                      normalize: bool = True) -> DataFrame:
    """Dedup an incoming batch AGAINST an existing corpus — the
    steady-state shape of a production pipeline, where each crawl
    increment is checked against everything already ingested rather
    than re-deduping the whole corpus.

    Returns one row per new document:
    (id, exact_dup, n_near_matches, near_dup, is_new) where
    ``exact_dup`` = content hash already in the corpus, ``near_dup`` =
    some existing doc with n-gram Jaccard >= threshold (MinHash-LSH
    candidates, exact verify — same family as :func:`near_duplicates`
    but across the two tables, so no self-join), ``is_new`` = neither.

    Scale shape: the existing corpus is touched only through two
    narrow projections — (content_hash) and (doc, bucket)/(doc,
    shingles) — which at 100 TB are precomputed once at ingest and
    stored; the per-batch cost is then proportional to the BATCH, and
    every join against the corpus side is a hash equi-join where the
    (usually small) new-batch side broadcasts — gated on an exact
    batch count, so an unbounded batch demotes to a shuffled join
    instead of an OOM. New-vs-new duplicates are NOT
    flagged here — run :func:`exact_dedup`/:func:`near_duplicates`
    within the batch for that.
    """
    ex_hashes, ex_sh, ex_b = corpus_dedup_projections(
        existing, text_col, id_col, num_hashes, num_bands,
        shingle_width, normalize)
    return _incremental_against(new, ex_hashes, ex_sh, ex_b, text_col,
                                id_col, threshold, num_hashes,
                                num_bands, shingle_width, normalize)


def corpus_dedup_projections(existing: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id", num_hashes: int = 12,
                             num_bands: int = 4, shingle_width: int = 3,
                             normalize: bool = True):
    """The three narrow corpus projections incremental dedup joins
    against — (content_hash), (doc, shingles), (doc, band bucket).
    Exposed so an ingest pipeline can compute them ONCE and persist
    them (:func:`write_dedup_index`) instead of re-deriving them from
    raw corpus text on every batch."""
    ex_hashes = existing.select(
        (F.md5(F.lower(F.col(text_col))) if normalize
         else F.md5(F.col(text_col))).alias("__h")).distinct()
    ex_sh = doc_shingles(existing, text_col, id_col, shingle_width,
                         checkpoint=True)
    ex_b = band_buckets(ex_sh, num_hashes, num_bands)
    return ex_hashes, ex_sh, ex_b


def _incremental_against(new: DataFrame, ex_hashes: DataFrame,
                         ex_sh: DataFrame, ex_b: DataFrame,
                         text_col: str, id_col: str, threshold: float,
                         num_hashes: int, num_bands: int,
                         shingle_width: int, normalize: bool) -> DataFrame:
    """incremental_dedup's join core over ALREADY-BUILT corpus
    projections (live-computed or read back from a persisted index —
    identical results either way, pytest-pinned)."""
    t_new = F.lower(F.col(text_col)) if normalize else F.col(text_col)
    new_hashed = new.select(F.col(id_col).alias("doc"),
                            F.md5(t_new).alias("__h"))
    # corpus side streams; the batch side broadcasts — gated on an
    # exact batch row count (one cheap count() job; Catalyst's
    # estimate for a projection of an arbitrary user frame is
    # untrustworthy): an unbounded admission batch stays unhinted and
    # AQE picks the join strategy instead of forcing an OOM broadcast
    n_batch = new_hashed.count()
    exact = (ex_hashes.join(broadcast_if_counted(new_hashed,
                                                 known_rows=n_batch),
                            "__h")
             .select("doc").distinct()
             .withColumn("__exact", F.lit(True)))

    new_sh = doc_shingles(new, text_col, id_col, shingle_width,
                          checkpoint=True)
    # band rows = batch docs x num_bands, so the same count gates them
    new_b = band_buckets(new_sh, num_hashes, num_bands)
    cands = (ex_b.join(broadcast_if_counted(
                           new_b, known_rows=n_batch * num_bands),
                       "bucket")
             .select(ex_b["doc"].alias("old_doc"),
                     new_b["doc"].alias("doc"))
             .distinct())
    sa = new_sh.select(F.col("doc").alias("__na"),
                       F.col("__sh").alias("__sha"))
    sb = ex_sh.select(F.col("doc").alias("__ob"),
                      F.col("__sh").alias("__shb"))
    inter = F.size(F.array_intersect(F.col("__sha"), F.col("__shb")))
    union = F.size(F.col("__sha")) + F.size(F.col("__shb")) - inter
    verified = (cands
                .join(sa, cands["doc"] == sa["__na"])
                .join(sb, cands["old_doc"] == sb["__ob"])
                .select(cands["doc"],
                        (inter.cast("double") / union.cast("double"))
                        .alias("jaccard"))
                .where(F.col("jaccard") >= threshold)
                .groupBy("doc")
                .agg(F.count(F.lit(1)).alias("__n_near")))
    return (new.select(F.col(id_col).alias("doc"))
            .join(exact, "doc", "left")
            .join(verified, "doc", "left")
            .select(
                F.col("doc").alias(id_col),
                F.coalesce(F.col("__exact"), F.lit(False)).alias("exact_dup"),
                F.coalesce(F.col("__n_near"), F.lit(0)).cast("long")
                .alias("n_near_matches"),
                (F.coalesce(F.col("__n_near"), F.lit(0)) > 0).alias("near_dup"))
            .withColumn("is_new",
                        ~F.col("exact_dup") & ~F.col("near_dup")))


def duplicate_spans(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", width: int = 20) -> DataFrame:
    """Exact duplicated-substring census — the hash-based Spark shape
    of suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): every ``width``-token
    span is hashed; a span whose hash occurs more than once
    corpus-wide is verbatim-repeated text (licenses, boilerplate,
    templated pages) that document-level dedup cannot see when the
    surrounding text differs.

    Returns per document (id, n_spans, n_dup_spans, dup_ratio) for
    documents with >= width tokens. Cost is linear in corpus tokens:
    one shuffle on the span hash for the global counts, one equi-join
    back (same key — the partitioning is reused), one per-doc
    aggregate. No suffix array, no global sort — the md5 groupBy IS
    the duplicate detector, and at 100 TB it's the same plan with more
    partitions."""
    toks = tokens(F.col(text_col))
    sized = (docs.select(F.col(id_col).alias("doc"), toks.alias("__toks"))
             .where(F.size("__toks") >= width))
    spans = (sized.select(
        "doc",
        F.explode(F.sequence(F.lit(1), F.size("__toks") - (width - 1)))
        .alias("pos"), "__toks")
        .select("doc", "pos",
                F.md5(F.concat_ws(" ", F.slice(F.col("__toks"), F.col("pos"),
                                               width))).alias("__h")))
    counts = spans.groupBy("__h").agg(F.count(F.lit(1)).alias("__df"))
    return (spans.join(counts, "__h")
            .groupBy(F.col("doc").alias(id_col))
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.sum((F.col("__df") > 1).cast("long")).alias("n_dup_spans"))
            .withColumn("dup_ratio",
                        F.col("n_dup_spans").cast("double")
                        / F.col("n_spans").cast("double")))


def prefix_filter_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.6,
                        shingle_width: int = 3) -> DataFrame:
    """EXACT set-similarity self-join by prefix filtering (the
    AllPairs/PPJoin family) — the deterministic complement to
    MinHash-LSH: where LSH trades recall for speed probabilistically,
    prefix filtering guarantees EVERY pair with Jaccard >= threshold
    is found. Theorem: if J(X, Y) >= t then X and Y must share at
    least one element among each side's first |X| - ceil(t·|X|) + 1
    elements under any GLOBAL total order — rarest-first ordering
    makes those prefixes the least-common shingles, so the candidate
    join stays small.

    Shape: shingle df census (one groupBy), per-doc rarest-first sort
    (one groupBy — window-free), prefix explode → shingle equi-join →
    exact Jaccard verify. All shuffles are hash equi-partitions; the
    df-ordered prefix is why this doesn't degenerate into the full
    inverted-index join (stop-shingles never enter prefixes of large
    sets). Returns (doc_a, doc_b, jaccard) with doc_a < doc_b —
    provably the complete >= threshold pair set.
    """
    shingled = doc_shingles(docs, text_col, id_col, shingle_width,
                            checkpoint=True)
    ex = shingled.select("doc", F.explode("__sh").alias("sg"))
    # the census doubles as a shingle DICTIONARY: each distinct
    # shingle gets a unique int64 id (uniqueness is all that matters —
    # any bijection preserves intersection sizes exactly; the
    # materialization pins the nondeterministic ids before the two
    # verify branches read them). The verify then intersects int64
    # arrays instead of ~25-char strings: measured 6.1 s -> 2.0 s at
    # sf0.1 (190k candidate pairs), and proportionally fewer shuffle
    # bytes at any scale (guide §8: move ids, not payloads).
    cens = materialize(
        ex.groupBy("sg").agg(F.count(F.lit(1)).alias("df"))
        .withColumn("tid", F.monotonically_increasing_id()))
    ordered = (ex.join(cens.select("sg", "df"), "sg")
               .groupBy("doc")
               .agg(F.transform(
                   F.array_sort(F.collect_list(F.struct("df", "sg"))),
                   lambda x: x["sg"]).alias("ordered"),
                   F.count(F.lit(1)).alias("n")))
    # prefix length |X| - ceil(t|X|) + 1; both engines parse the same
    # double literal for t, so the ceil agrees bit-for-bit
    plen = (F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1).cast("int")
    # materialize before the self-join: the census + per-doc sort +
    # prefix explode would otherwise recompute once per join side
    # (same rule as the LSH bucket self-join above). Carry the set
    # size and the 0-based prefix position: the PPJoin length and
    # position filters below prune candidates inside the join, before
    # the (CPU-dominant) exact array_intersect verify ever sees them.
    pfx = materialize(
        ordered.select("doc", "n",
                       F.posexplode(F.slice("ordered", F.lit(1), plen))
                       .alias("pos", "sg")))
    # exactness-preserving candidate filters (PPJoin, Xiao et al.):
    # - length: J >= t  =>  t*|X| <= |Y| (and symmetrically);
    # - position: a token matching at 0-based positions (i, j) of the
    #   rarest-first-ordered sets bounds the overlap by
    #   min(i, j) + 1 + min(na-i-1, nb-j-1), which must reach the
    #   required overlap ceil(t/(1+t) * (na+nb)). Every matching
    #   occurrence yields a VALID upper bound, so dropping rows whose
    #   bound fails loses no qualifying pair; the verify stage stays
    #   the decider for everything kept.
    an, bn = F.col("a.n"), F.col("b.n")
    ai, bj = F.col("a.pos"), F.col("b.pos")
    min_overlap = F.ceil(F.lit(threshold / (1.0 + threshold)) * (an + bn))
    ubound = (F.least(ai, bj) + 1
              + F.least(an - ai - 1, bn - bj - 1))
    # The pair-level distinct is upgraded to a grouped PPJoin+-style
    # suffix bound (round 16): per surviving pair, m = the number of
    # prefix-shared shingles and (amax, bmax) = their last matched
    # 0-based positions. Under the global rarest-first order every
    # common element NOT matched in both prefixes must sort strictly
    # after the last matched one in BOTH docs (if it sorted before,
    # it would lie inside both prefixes and have matched), so
    #   overlap <= m + min(na-1-amax, nb-1-bmax).
    # Exactness-preserving: for a truly qualifying pair every prefix
    # occurrence passes the per-occurrence filters above (each bound
    # is >= the true overlap >= min_overlap), so m counts ALL its
    # prefix matches and the grouped bound is >= the true overlap —
    # only never-qualifying pairs are dropped before the CPU-dense
    # exact verify (completeness stays pytest-pinned against the
    # all-pairs oracle).
    cands = (pfx.alias("a").join(pfx.alias("b"),
                                 (F.col("a.sg") == F.col("b.sg"))
                                 & (F.col("a.doc") < F.col("b.doc"))
                                 & (bn >= F.ceil(F.lit(threshold) * an))
                                 & (an >= F.ceil(F.lit(threshold) * bn))
                                 & (ubound >= min_overlap))
             .select(F.col("a.doc").alias("doc_a"),
                     F.col("b.doc").alias("doc_b"),
                     an.alias("__na"), bn.alias("__nb"),
                     ai.alias("__ai"), bj.alias("__bj"))
             .groupBy("doc_a", "doc_b", "__na", "__nb")
             .agg(F.count(F.lit(1)).alias("__m"),
                  F.max("__ai").alias("__amax"),
                  F.max("__bj").alias("__bmax"))
             .where((F.col("__m")
                     + F.least(F.col("__na") - 1 - F.col("__amax"),
                               F.col("__nb") - 1 - F.col("__bmax")))
                    >= F.ceil(F.lit(threshold / (1.0 + threshold))
                              * (F.col("__na") + F.col("__nb"))))
             .select("doc_a", "doc_b"))
    # exact verify over the dictionary-encoded sets (ids are a
    # bijection of the shingles, so |A∩B| and the Jaccard double are
    # bit-identical to the string form)
    sh_int = materialize(
        ex.join(cens.select("sg", "tid"), "sg")
        .groupBy("doc").agg(F.collect_list("tid").alias("__shi")))
    a = sh_int.select(F.col("doc").alias("__ida"),
                      F.col("__shi").alias("__sa"))
    b = sh_int.select(F.col("doc").alias("__idb"),
                      F.col("__shi").alias("__sb"))
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    union = F.size(F.col("__sa")) + F.size(F.col("__sb")) - inter
    return (cands
            .join(a, cands["doc_a"] == F.col("__ida"))
            .join(b, cands["doc_b"] == F.col("__idb"))
            .select("doc_a", "doc_b",
                    (inter.cast("double") / union.cast("double"))
                    .alias("jaccard"))
            .where(F.col("jaccard") >= threshold))


def global_line_dedup(docs: DataFrame, min_docs: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      sep: str = "\n") -> DataFrame:
    """Corpus-wide line deduplication (the C4 boilerplate rule): drop
    every line that occurs in >= ``min_docs`` distinct documents, and
    rebuild each document's text from its surviving lines in original
    order. Blank lines are never counted as "common" (and therefore
    never dropped) — they are structure, not boilerplate.

    Scale shape: the heavy ``text`` column never rides a shuffle for
    the census — only DISTINCT (doc, line) pairs flow into the
    line-frequency group-by, and only the *common* hits (the
    boilerplate subset, typically tiny) come back through the per-doc
    collect. The final join is a plain doc_id equi-join (bucket both
    sides by doc_id at 100 TB to make it co-located); the line filter
    itself is an in-row higher-order function, so reconstruction costs
    no explode/re-sort shuffle of full text.

    ``sep`` is both the split regex and the re-join literal — keep it
    a fixed string (default newline).

    Returns (doc_id, clean_text, n_lines, n_kept, n_removed).
    """
    d = docs.select(F.col(id_col).alias("doc_id"),
                    F.split(F.col(text_col), sep).alias("__ls"))
    # distinct lines per doc -> the census counts documents, not
    # occurrences, without a count_distinct shuffle
    per_doc_lines = (d.select("doc_id",
                              F.explode(F.array_distinct("__ls"))
                              .alias("line"))
                     .where(F.trim(F.col("line")) != ""))
    common = (per_doc_lines.groupBy("line")
              .agg(F.count(F.lit(1)).alias("__n_docs"))
              .where(F.col("__n_docs") >= min_docs)
              .select("line"))
    # per-doc drop-set: only boilerplate lines survive to this point
    drops = (per_doc_lines.join(common, "line")
             .groupBy("doc_id")
             .agg(F.collect_set("line").alias("__drop")))
    keep = lambda l: ~F.coalesce(  # noqa: E731
        F.array_contains(F.col("__drop"), l), F.lit(False))
    kept = F.filter(F.col("__ls"), keep)
    return (d.join(drops, "doc_id", "left")
            .select("doc_id",
                    F.concat_ws(sep, kept).alias("clean_text"),
                    F.size("__ls").cast("long").alias("n_lines"),
                    F.size(kept).cast("long").alias("n_kept"),
                    (F.size("__ls") - F.size(kept)).cast("long")
                    .alias("n_removed")))


def write_dedup_index(existing: DataFrame, path: str,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 12, num_bands: int = 4,
                      shingle_width: int = 3,
                      normalize: bool = True) -> None:
    """Persist the corpus dedup index — the stored form of the
    projections :func:`incremental_dedup` docstring promises ("at
    100 TB precomputed once at ingest and stored"): content hashes,
    per-doc shingle sets, and band buckets as three parquet tables,
    plus a params sidecar (written through :mod:`fsio`, so the index
    lives happily on hdfs://s3a) so a reader can't silently join
    against an index built with different LSH parameters.

    Each table is partitioned by ``__ingest_batch`` (-1 for this base
    build): per-batch appends land under their own partition, which is
    what makes a replayed streaming append an idempotent OVERWRITE of
    its earlier attempt instead of a duplicate (see
    :func:`append_dedup_index`). The column is bookkeeping only —
    readers drop it."""
    from aggregation_duckdb_spark import fsio
    h, sh, b = corpus_dedup_projections(
        existing, text_col, id_col, num_hashes, num_bands,
        shingle_width, normalize)
    for frame, name in ((h, "hashes"), (sh, "shingles"), (b, "buckets")):
        (frame.withColumn("__ingest_batch", F.lit(-1))
         .write.mode("overwrite").partitionBy("__ingest_batch")
         .parquet(fsio._join(path, name)))
    _write_dedup_blooms(existing.sparkSession, path, -1, "overwrite")
    fsio.write_json(existing.sparkSession, fsio._join(path, "params.json"),
                    {"num_hashes": num_hashes, "num_bands": num_bands,
                     "shingle_width": shingle_width,
                     "normalize": normalize,
                     "blooms": {"num_words": DEDUP_BLOOM_WORDS,
                                "k": DEDUP_BLOOM_K}})


#: Per-ingest-batch membership Bloom sizing (round 15): purges probe
#: these instead of scanning every batch partition — a sparse GDPR
#: purge on a thousand-batch index reads only the victims' batches.
#: An over-full batch Bloom saturates toward all-bits-set, which
#: degrades the SKIP RATE only (false positives), never correctness.
DEDUP_BLOOM_WORDS = 4096
DEDUP_BLOOM_K = 3


def _write_dedup_blooms(spark, path: str, part: int,
                        mode: str) -> None:
    """The two per-batch membership Blooms a purge probes: doc ids
    (prunes shingles/buckets batches) and content hashes (prunes
    hashes batches — hashes are anonymous, so doc membership alone
    cannot prune them: a byte-identical document appended in ANOTHER
    batch shares the hash, and the hash Bloom sees it there). Written
    under the SAME partition scheme and write mode as the data
    tables, so a replayed exactly-once batch overwrites its own Bloom
    partition with its tables.

    The key sets are READ BACK from the just-written parquet tables,
    partition-pruned to ``part`` and column-pruned to the key alone —
    NOT recomputed from the projection plans, which would re-execute
    the md5/shingle passes over the raw corpus a second time (guide
    §1.2 step 1: the round-15 Bloom sidecars cost an extra full pass
    per index build; this rides the bytes that already landed). In
    the ad-hoc ``part=-1`` append mode the read-back covers the whole
    base partition (batch rows are indistinguishable there) — the
    extra bits are a superset, which Bloom's contract makes correct
    (false positives only, never false negatives)."""
    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.operators.pipeline import \
        bloom_part_rows
    for table, key, name in (("shingles", "doc", "doc_bloom"),
                             ("hashes", "__h", "hash_bloom")):
        back = (spark.read.parquet(fsio._join(path, table))
                .where(F.col("__ingest_batch") == part)
                .select(F.lit(part).alias("__ingest_batch"), key))
        (bloom_part_rows(back, key, "__ingest_batch",
                         DEDUP_BLOOM_WORDS, DEDUP_BLOOM_K)
         .write.mode(mode).partitionBy("__ingest_batch")
         .parquet(fsio._join(path, name)))


def append_dedup_index(admitted: DataFrame, path: str,
                       text_col: str = "text",
                       id_col: str = "doc_id",
                       batch_id: int | None = None) -> None:
    """Grow the index with a batch of ADMITTED documents (the ones
    incremental dedup let through): compute the same three projections
    for the batch only and append — per-batch cost proportional to
    the batch, the corpus never re-read.

    ``batch_id`` makes the append EXACTLY-ONCE for streaming ingest
    (foreachBatch redelivers batch ids at-least-once), by two
    mechanisms layered: ids at or below the recorded watermark are
    skipped outright (the batch fully committed earlier), and an
    UNCOMMITTED replay — a crash landed some projections but not the
    watermark — rewrites its own ``__ingest_batch=N`` partition via
    dynamic partition overwrite instead of appending next to the
    partial attempt. The watermark commits LAST. Ids must be monotonic
    per index (checkpointed streaming queries guarantee this); single
    writer, as for every durable artifact. Without a ``batch_id``
    (ad-hoc growth) the append lands under the base ``-1`` partition
    in plain append mode — rerunning it duplicates, as any blind
    append does."""
    from aggregation_duckdb_spark import fsio
    spark = admitted.sparkSession
    if batch_id is not None and \
            batch_id <= fsio.read_ingest_watermark(spark, path):
        return  # replayed micro-batch: already ingested, skip
    p = fsio.read_json(admitted.sparkSession,
                       fsio._join(path, "params.json"))
    h, sh, b = corpus_dedup_projections(
        admitted, text_col, id_col, p["num_hashes"], p["num_bands"],
        p["shingle_width"], p["normalize"])
    part = -1 if batch_id is None else int(batch_id)
    mode = "append" if batch_id is None else "overwrite"
    with fsio.dynamic_partition_overwrite(spark):
        for frame, name in ((h, "hashes"), (sh, "shingles"),
                            (b, "buckets")):
            (frame.withColumn("__ingest_batch", F.lit(part))
             .write.mode(mode).partitionBy("__ingest_batch")
             .parquet(fsio._join(path, name)))
        # only when the BUILD declared blooms (every batch must have
        # rows, or a probe would falsely clear uncovered batches)
        if "blooms" in p:
            _write_dedup_blooms(spark, path, part, mode)
    if batch_id is not None:
        fsio.commit_ingest_watermark(spark, path, batch_id)


def compact_dedup_index(spark, path: str) -> dict:
    """Fold the dedup index's accumulated ``__ingest_batch``
    partitions back into the base partition — the OPTIMIZE analogue
    for the stored projections (round 15, the same small-file story
    as ``text.compact_text_index``): long streaming ingest leaves one
    tiny directory per batch per table, and every incremental check's
    corpus-side scan starts tracking append count. One rewrite per
    table folds them via write-temp-then-swap (a complete copy exists
    at every instant; a crash between delete and rename leaves the
    folded copy at ``<table>.__compact_tmp``). The hash table is
    DISTINCT-ed in the fold (batches store their own distinct hash
    sets, so cross-batch duplicate content collapses to one row —
    semantics unchanged, the admission join is a semi-membership
    test). Per-batch membership Blooms rebuild as a single base-batch
    row set — clearing purge staleness as a side effect. The ingest
    watermark is untouched: replays of folded batch ids still
    short-circuit, so exactly-once survives compaction."""
    from aggregation_duckdb_spark import fsio

    p = fsio.read_json(spark, fsio._join(path, "params.json"))
    probe = spark.read.parquet(fsio._join(path, "hashes"))
    if "__ingest_batch" not in probe.columns:
        return {"folded_batches": 0}
    batches = [int(r[0]) for r in
               probe.select("__ingest_batch").distinct().collect()]
    if len(batches) <= 1:
        return {"folded_batches": 0}

    def swap(name, folded):
        table_dir = fsio._join(path, name)
        tmp = table_dir.rstrip("/") + ".__compact_tmp"
        fsio.delete(spark, tmp)
        (folded.withColumn("__ingest_batch", F.lit(-1))
         .write.mode("errorifexists").partitionBy("__ingest_batch")
         .parquet(tmp))
        fsio.delete(spark, table_dir)
        if not fsio.rename(spark, tmp, table_dir):
            raise RuntimeError(
                f"compact_dedup_index: rename from {tmp} failed — "
                f"the complete folded table is intact there; move it "
                f"into place and re-run")

    swap("hashes",
         probe.drop("__ingest_batch").distinct())
    for name in ("shingles", "buckets"):
        swap(name, spark.read.parquet(fsio._join(path, name))
             .drop("__ingest_batch"))
    report = {"folded_batches": len(batches)}
    if "blooms" in p:
        _write_dedup_blooms(spark, path, -1, "overwrite")
        report["blooms_rebuilt"] = True
    return report


def incremental_dedup_indexed(new: DataFrame, spark, path: str,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              threshold: float = 0.6) -> DataFrame:
    """:func:`incremental_dedup` against the PERSISTED index: the
    batch joins three narrow parquet tables instead of re-shingling
    the raw corpus — identical output (pytest-pinned and verified by
    the same DuckDB oracle as the live path)."""
    from aggregation_duckdb_spark import fsio
    p = fsio.read_json(spark, fsio._join(path, "params.json"))

    def rd(name):  # __ingest_batch is write-side bookkeeping only
        return (spark.read.parquet(fsio._join(path, name))
                .drop("__ingest_batch"))

    ex_hashes, ex_sh, ex_b = rd("hashes"), rd("shingles"), rd("buckets")
    return _incremental_against(new, ex_hashes, ex_sh, ex_b, text_col,
                                id_col, threshold, p["num_hashes"],
                                p["num_bands"], p["shingle_width"],
                                p["normalize"])


def maintain_dedup_index(spark, path: str, max_batches: int = 8) -> dict:
    """Maintenance policy for the dedup index — the
    ``text.maintain_text_index`` twin: metadata-only batch census on
    the hashes table's partition listing, fold via
    :func:`compact_dedup_index` only past ``max_batches``; a healthy
    index costs one directory listing."""
    from aggregation_duckdb_spark import fsio
    batches = fsio.ingest_batches(spark, fsio._join(path, "hashes"))
    if len(batches) <= max_batches:
        return {"compacted": False, "batches": len(batches)}
    rep = compact_dedup_index(spark, path)
    return {"compacted": True, "batches": len(batches), **rep}
