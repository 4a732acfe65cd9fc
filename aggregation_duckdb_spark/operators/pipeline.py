"""Corpus-pipeline operators: deterministic splits, PII scrubbing,
repetition filtering, benchmark decontamination.

These are the pre-training data-prep steps that sit between raw scans
and dedup/similarity: assign every document to train/val/test without
coordination, strip contact-info strings, drop degenerate repetitive
documents, and remove anything that shares n-grams with an evaluation
benchmark. All hot-path logic is native ``pyspark.sql.functions``
(JVM-side, codegen'd); the only shuffle in the whole module is the
decontamination semi-join, which is a hash equi-join on md5 keys —
broadcastable when the benchmark side is small (it always is).

Determinism: split buckets and n-gram keys are md5-derived (exact hex
string math in both engines), so every operator hash-matches its DuckDB
oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from aggregation_duckdb_spark.operators.dedup import shingles
from aggregation_duckdb_spark.operators.text import tokens

# ---------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------

#: bucket space for split assignment; 10_000 gives basis-point
#: resolution on split fractions, plenty for corpus work.
SPLIT_BUCKETS = 10_000


def split_bucket(id_col: Column, salt: str = "v1") -> Column:
    """Deterministic bucket in [0, SPLIT_BUCKETS): the first 8 hex
    chars of md5(salt|id) as an integer, mod the bucket space. Pure
    map-side — every executor assigns identically with zero
    coordination, and re-runs (or late-arriving shards at 100 TB)
    land in the same split. Changing ``salt`` re-deals the whole
    corpus."""
    h = F.md5(F.concat(F.lit(salt), F.lit("|"), id_col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % SPLIT_BUCKETS)


def split_assign(docs: DataFrame, id_col: str = "doc_id",
                 fractions: dict[str, float] | None = None,
                 salt: str = "v1") -> DataFrame:
    """Assign each row to a named split by cumulative bucket ranges.
    ``fractions`` preserves insertion order; values must sum to 1."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    bucket = split_bucket(F.col(id_col), salt)
    expr: Column | None = None
    edge = 0.0
    cases = []
    for name, frac in fractions.items():
        edge += frac
        cases.append((name, int(round(edge * SPLIT_BUCKETS))))
    expr = F.lit(cases[-1][0])  # last split absorbs rounding remainder
    for name, hi in reversed(cases[:-1]):
        expr = F.when(bucket < hi, F.lit(name)).otherwise(expr)
    return docs.select(F.col(id_col), bucket.alias("bucket"),
                       expr.alias("split"))


# ---------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------

# Patterns are intersection-of-dialects: every construct here (classes,
# bounded repeats, alternation) means the same thing to Java regex
# (Spark) and RE2 (DuckDB). Order matters: emails go first so an IP
# inside a hostname is already masked when the IP pass runs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    # word-boundary anchored so date fragments (2024-01), ZIP+4, and
    # digit runs inside longer numbers don't get over-redacted; \b is
    # an ASCII word boundary in both Java regex and RE2
    ("phone", r"\b[0-9]{3}-[0-9]{3,4}\b", "<PHONE>"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Mask contact-info spans and count redactions per category.
    Map-only: one projection, no shuffle, no Python in the row path."""
    scrubbed = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(scrubbed, F.lit(pat)).cast("long")
                      .alias(f"n_{name}"))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return docs.select(F.col(id_col), *counts,
                       scrubbed.alias("scrubbed_text"))


# ---------------------------------------------------------------------
# repetition / degeneracy filter
# ---------------------------------------------------------------------

def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     max_top_share: float = 0.2) -> DataFrame:
    """Per-document repetition signals: share of the most frequent
    token and distinct-token ratio, plus the keep/drop verdict a
    cleaning pipeline would apply.

    Computed in-row (distinct-tokens × occurrences scan per document)
    rather than explode→groupBy: document length is bounded, so the
    quadratic term is a constant, and the operator stays a pure
    map-side projection — no shuffle at any corpus size."""
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks).cast("long")
    top_count = F.array_max(F.transform(
        F.array_distinct(toks),
        lambda d: F.size(F.filter(toks, lambda t: t == d))))
    n_distinct = F.size(F.array_distinct(toks)).cast("long")
    # empty documents (zero tokens): shares are undefined (NULL) and the
    # verdict is an explicit drop — without the guard, NULL share would
    # make `keep` NULL and silently vanish from downstream keep-filters
    top_share = F.when(n_tok > 0, top_count.cast("double") / n_tok)
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        top_count.cast("long").alias("top_token_count"),
        top_share.alias("top_token_share"),
        F.when(n_tok > 0, n_distinct.cast("double") / n_tok)
         .alias("distinct_ratio"),
        F.when(n_tok > 0, top_share <= max_top_share)
         .otherwise(F.lit(False)).alias("keep"))


# ---------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------

def pack_sequences(docs: DataFrame, context_len: int,
                   text_col: str = "text", id_col: str = "doc_id",
                   num_buckets: int = 64) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences —
    concat-then-chunk packing: within a bucket, documents are laid out
    end-to-end in id order and cut every ``context_len`` tokens; a
    document's sequence is the chunk its first token lands in.

    Scale shape: a single global cumulative sum would serialize on one
    task, so packing is sharded into ``num_buckets`` md5-derived
    buckets (deterministic, coordination-free, same trick as
    :func:`split_assign`); each bucket packs independently under one
    window partition — one shuffle, ``num_buckets``-way parallel. The
    cost is at most one partially-filled final sequence per bucket.

    Returns (doc_id, bucket, n_tokens, start_offset, seq_idx) where
    ``start_offset`` is the document's first-token position within its
    bucket's layout and ``seq_idx`` = start_offset div context_len.
    """
    from pyspark.sql import Window
    from aggregation_duckdb_spark.operators.text import token_count
    bucket = split_bucket(F.col(id_col), salt="pack") % num_buckets
    w = (Window.partitionBy("bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    sized = docs.select(F.col(id_col), bucket.alias("bucket"),
                        token_count(F.col(text_col)).alias("n_tokens"))
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset")
    return (sized
            .withColumn("start_offset", start)
            # integer division, not float-divide-then-truncate: double
            # has 53 mantissa bits, so a float quotient of very large
            # long offsets can misround before the cast (invisible for
            # power-of-two context_len, wrong in general)
            .withColumn("seq_idx",
                        F.expr(f"start_offset div {int(context_len)}")))


def chunk_overlap(docs: DataFrame, context_len: int = 64, stride: int = 48,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the RAG-retrieval / long-document-training chunking shape, where
    ``stride < context_len`` repeats the tail of each chunk at the head
    of the next so no span falls on a boundary unseen.

    Chunk i covers tokens [i·stride + 1, i·stride + context_len]
    (1-based); the final chunk may be short; a document with
    <= context_len tokens yields exactly one chunk. Entirely in-row
    (tokenize → sequence-explode → slice): zero shuffles, scan-speed,
    embarrassingly parallel at any corpus size — output volume is the
    only cost, larger than the input by ~context_len/stride.

    Returns (id, chunk_idx, start_token, n_chunk_tokens, chunk_text).
    """
    if not (0 < stride <= context_len):
        # stride 0 would loop forever in spirit (here: divide by zero);
        # stride > context_len would silently drop the gap's tokens
        raise ValueError(
            f"stride={stride} must be in (0, context_len={context_len}]")
    toked = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    sized = toked.withColumn("n_tokens", F.size("__toks"))
    n_chunks = (F.when(F.col("n_tokens") <= context_len, F.lit(1))
                .otherwise(F.expr(
                    f"(n_tokens - {int(context_len)} + {int(stride) - 1}) "
                    f"div {int(stride)}") + 1))
    exploded = (sized
                .withColumn("chunk_idx",
                            F.explode(F.sequence(F.lit(0), n_chunks - 1)))
                .withColumn("start_token",
                            (F.col("chunk_idx") * stride + 1).cast("long")))
    chunk = F.slice(F.col("__toks"), F.col("start_token").cast("int"),
                    context_len)
    return exploded.select(
        F.col(id_col), F.col("chunk_idx").cast("long").alias("chunk_idx"),
        "start_token",
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"))


# ---------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------

def stratified_sample(docs: DataFrame, fractions: dict[str, float],
                      group_col: str = "lang", id_col: str = "doc_id",
                      default_fraction: float = 0.0,
                      salt: str = "sample-v1") -> DataFrame:
    """Deterministic per-group Bernoulli sampling: keep a row iff its
    md5 bucket falls under its group's fraction. Pure map-side (the
    fraction map compiles to a CASE literal — no join, no shuffle, no
    RNG), so the sample is reproducible across runs, engines, and
    late-arriving shards — the property corpus re-balancing needs
    (e.g. downsample web crawl, keep all books).

    Sampling and split assignment use independent salts: a row's
    sample fate must not correlate with its train/val/test fate.
    """
    frac: Column = F.lit(default_fraction)
    for g, f in sorted(fractions.items()):
        frac = F.when(F.col(group_col) == g, F.lit(f)).otherwise(frac)
    keep = split_bucket(F.col(id_col), salt) < (frac * SPLIT_BUCKETS)
    return docs.where(keep)


# ---------------------------------------------------------------------
# per-group quantile filter
# ---------------------------------------------------------------------

def group_quantile_threshold(scored: DataFrame, score_col: str,
                             group_col: str, q: float) -> DataFrame:
    """Per-group discrete ``q``-quantile: the smallest score s.t. at
    least ``q`` of the group's rows are ≤ it (the value at rank
    ceil(q·n), i.e. SQL ``quantile_disc`` semantics). Discrete — an
    actual member value, no interpolation — so the threshold is
    bit-exact across engines.

    Scale shape: first compress to (group, distinct score) counts —
    a map-side-combinable aggregation that collapses 100 TB of rows to
    the score *domain* — then run the cumulative window over that
    compressed table only. No sort or window ever touches full-size
    data. ASSUMES a bounded score domain (quality scores here are
    rounded to 6 decimals); a truly continuous score would defeat the
    compression and needs iterative selection (binary-search the
    value against count(≤v)) instead. Returns (group_col, threshold)."""
    from pyspark.sql import Window
    counts = (scored.groupBy(group_col, score_col)
              .agg(F.count(F.lit(1)).alias("__c")))
    w = (Window.partitionBy(group_col).orderBy(score_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = counts.withColumn("__le", F.sum("__c").over(w))
    totals = counts.groupBy(group_col).agg(F.sum("__c").alias("__n"))
    return (cum.join(totals, group_col)
            .where(F.col("__le") >= F.ceil(F.lit(q) * F.col("__n")))
            .groupBy(group_col)
            .agg(F.min(score_col).alias("threshold")))


def quantile_filter(scored: DataFrame, score_col: str,
                    group_col: str = "lang", q: float = 0.5) -> DataFrame:
    """Keep rows at or above their group's discrete ``q``-quantile —
    the per-language "drop the low-quality half" gate. The threshold
    table is group-cardinality-sized, so the filter join broadcasts."""
    thresholds = group_quantile_threshold(scored, score_col, group_col, q)
    return (scored.join(F.broadcast(thresholds), group_col)
            .where(F.col(score_col) >= F.col("threshold"))
            .drop("threshold"))


# ---------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------

def ngram_keys(text: Column, width: int) -> Column:
    """Distinct md5 keys of word n-grams — the contamination unit."""
    return F.transform(shingles(text, width), F.md5)


def decontaminate(train: DataFrame, bench: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  width: int = 6) -> DataFrame:
    """Flag training documents sharing any word ``width``-gram with a
    benchmark document — the standard eval-set decontamination pass.

    Shape for 100 TB: both sides reduce to distinct md5 n-gram keys
    *before* the join (explode → distinct is map-side combinable), the
    benchmark side is tiny by construction (eval sets are thousands of
    documents, not billions) so Spark broadcasts it, and the verdict
    is a semi-join — the train text itself never shuffles; only its
    (id, key) pairs do.
    """
    train_keys = (train.select(F.col(id_col),
                               F.explode(ngram_keys(F.col(text_col), width))
                               .alias("__key")))
    bench_keys = (bench.select(F.explode(ngram_keys(F.col(text_col), width))
                               .alias("__key"))
                  .distinct())
    hit = (train_keys.join(bench_keys, "__key", "left_semi")
           .select(id_col).distinct()
           .withColumn("contaminated", F.lit(True)))
    return (train.select(id_col).distinct()
            .join(hit, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce(F.col("contaminated"), F.lit(False))
                    .alias("contaminated")))


def corpus_report(docs: DataFrame, by: tuple[str, ...] = ("lang", "source"),
                  quality_threshold: float = 0.45, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """The dataset-card cross-tab: per group (language × source by
    default) — document counts, exact token sums, mean quality score,
    and how many docs clear the quality gate. The summary a corpus
    ships with, and the monitoring query a nightly ingest diffs.

    Mean quality aggregates in FIXED POINT (quality_score is rounded
    to 6 decimals, so ×1e6 is integral): integer sums commute across
    any partitioning, then two IEEE divisions at the end — the mean is
    bit-identical across engines, unlike a float-fold avg(). One
    shuffle (the group-by): the quality expressions compute in the
    SAME projection as the token counts — never a second scan joined
    back on the id."""
    from aggregation_duckdb_spark.operators.text import (quality_exprs,
                                                         token_count)
    q = quality_exprs(F.col(text_col))["quality_score"]
    joined = docs.select(*[F.col(c) for c in by],
                         token_count(F.col(text_col)).alias("__tok"),
                         q.alias("quality_score"))
    qfix = F.round(F.col("quality_score") * 1_000_000).cast("long")
    return (joined.groupBy(*[F.col(c) for c in by])
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("__tok").cast("long").alias("sum_tokens"),
                 (F.sum(qfix).cast("double") / F.count(F.lit(1))
                  / 1_000_000).alias("mean_quality"),
                 F.sum((F.col("quality_score") >= quality_threshold)
                       .cast("long")).alias("n_above_threshold")))


def leakage_free_split(docs: DataFrame,
                       fractions: dict[str, float] | None = None,
                       id_col: str = "doc_id", text_col: str = "text",
                       threshold: float = 0.6,
                       max_bucket_size: int | None = None,
                       salt: str = "leak-v1") -> DataFrame:
    """Train/val/test assignment where near-duplicate CLUSTERS move as
    one unit: the split key is the connected-component label of the
    verified near-dup graph, so two near-identical documents can never
    land on opposite sides of the train/eval boundary — the leakage
    mode a per-document split silently permits (eval docs with a
    near-copy in train inflate benchmark scores).

    Pipeline: LSH near-dup pairs → connected components → every doc
    keyed by its cluster id (singletons are their own cluster) → the
    md5-bucket split applied to the CLUSTER id. Deterministic like
    :func:`split_assign`; ``max_bucket_size`` defaults to None here
    because cluster-true splits want the oracle-exact pair set — pass
    the finite default for adversarial corpora at scale.

    Returns (id, cluster_id, split)."""
    from aggregation_duckdb_spark.operators import dedup, graph
    pairs = dedup.near_duplicates(docs, text_col=text_col, id_col=id_col,
                                  threshold=threshold,
                                  max_bucket_size=max_bucket_size)
    labels = graph.connected_components(pairs, src="doc_a", dst="doc_b")
    clustered = (docs.select(F.col(id_col))
                 .join(labels.select(F.col("id").alias(id_col), "label"),
                       id_col, "left")
                 .select(F.col(id_col),
                         F.coalesce(F.col("label"), F.col(id_col))
                         .alias("cluster_id")))
    csplits = split_assign(clustered.select("cluster_id").distinct(),
                           id_col="cluster_id", fractions=fractions,
                           salt=salt)
    return (clustered
            .join(csplits.select("cluster_id", "split"), "cluster_id")
            .select(id_col, "cluster_id", "split"))


def group_sample_fixed(docs: DataFrame, n: int, by: str = "source",
                       id_col: str = "doc_id",
                       salt: str = "gs-v1") -> DataFrame:
    """Exactly min(n, |group|) rows per group — the fixed-SIZE
    counterpart of :func:`stratified_sample`'s fixed-RATE Bernoulli
    (rates give binomial size jitter; quota sampling needs exact
    counts). Selection order is md5(salt|id): deterministic across
    runs/engines/shard order, uniform over the group, and stable under
    re-runs — the same ids win every time.

    One shuffle (the group partitioning); rank is row_number over the
    md5 key. For very hot groups at 100 TB the per-group sort is the
    cost — pre-filter with an approximate md5-threshold (keep only
    hash < c·n/|group| quantile) before ranking if a single group's
    rows overwhelm a task; at ordinary group cardinalities the plain
    window is the right plan. Returns input columns + sample_rank.
    """
    from pyspark.sql import Window
    h = F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    w = Window.partitionBy(by).orderBy(h.asc(), F.col(id_col).asc())
    return (docs.withColumn("sample_rank",
                            F.row_number().over(w).cast("long"))
            .where(F.col("sample_rank") <= n))


# ---------------------------------------------------------------------
# Bloom-filter decontamination
# ---------------------------------------------------------------------

#: bits used per int64 word — 32, not 64: DuckDB raises on the 1<<63
#: overflow, and staying in the positive int32 range makes the mask
#: arithmetic identical (and oracle-checkable) across engines.
BLOOM_BITS_PER_WORD = 32


def _bloom_pos(key: Column, i: int, num_bits: int) -> Column:
    """Deterministic bit position i for a key: md5-derived, exact
    integer math — reproduces bit-for-bit in DuckDB."""
    h = F.md5(F.concat(F.lit(f"bf{i}|"), key))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % num_bits


def _bloom_mask() -> Column:
    # F.shiftleft takes only a literal shift amount; the SQL form
    # accepts a column
    return F.expr(f"shiftleft(cast(1 as bigint), "
                  f"cast(pos % {BLOOM_BITS_PER_WORD} as int))")


def bloom_member_parts(bloom: DataFrame, keys: DataFrame,
                       key_col: str, part_col: str,
                       num_words: int, k: int) -> DataFrame:
    """The partitions that MAY contain any of ``keys``, judged by a
    per-partition Bloom table ``bloom`` = (part_col, word, bits) —
    the shared probe behind doc-scoped index reads and purge
    partition pruning (round 15). A key is (maybe) in a partition iff
    EVERY one of its probed bit positions is set there; two hash
    functions can collide on a position, so the hit count compares
    against the key's own distinct-position count, not ``k``.
    Conservative by Bloom's contract: returned partitions may hold
    nothing; partitions NOT returned provably hold no key. One join
    of the keys' positions against the bloom table — never a data
    read. Returns a 1-column DataFrame of distinct ``part_col``."""
    num_bits = num_words * BLOOM_BITS_PER_WORD
    probes = (keys.select(F.col(key_col).cast("string").alias("__k"))
              .distinct()
              .select("__k", F.explode(F.array(*[
                  _bloom_pos(F.col("__k"), i, num_bits)
                  for i in range(k)])).alias("pos"))
              .withColumn("word", F.expr(
                  f"pos div {BLOOM_BITS_PER_WORD}")))
    per_key = probes.groupBy("__k").agg(
        F.countDistinct("pos").alias("__np"))
    return (probes.join(bloom, "word")
            .where(F.expr(
                f"(bits & shiftleft(cast(1 as bigint), "
                f"cast(pos % {BLOOM_BITS_PER_WORD} as int))) != 0"))
            .groupBy(part_col, "__k")
            .agg(F.countDistinct("pos").alias("__nhit"))
            .join(per_key, "__k")
            .where(F.col("__nhit") >= F.col("__np"))
            .select(part_col).distinct())


def bloom_part_rows(pairs: DataFrame, key_col: str, part_col: str,
                    num_words: int, k: int) -> DataFrame:
    """Build the per-partition Bloom table ``bloom_member_parts``
    probes: distinct (part, key) pairs → (part_col, word, bits)."""
    num_bits = num_words * BLOOM_BITS_PER_WORD
    return (pairs.select(part_col,
                         F.col(key_col).cast("string").alias("__k"))
            .distinct()
            .select(part_col, F.explode(F.array(*[
                _bloom_pos(F.col("__k"), i, num_bits)
                for i in range(k)])).alias("pos"))
            .select(part_col,
                    F.expr(f"pos div {BLOOM_BITS_PER_WORD}")
                    .alias("word"),
                    _bloom_mask().alias("__mask"))
            .groupBy(part_col, "word")
            .agg(F.bit_or("__mask").alias("bits")))


def bloom_build(keys: DataFrame, key_col: str = "__key",
                num_words: int = 4096, k: int = 3) -> DataFrame:
    """Aggregate a key set into a Bloom filter as a (word, bits) table
    of at most ``num_words`` rows — a fixed-size, broadcastable sketch
    of an arbitrarily large membership set.

    Map-side: each key contributes k (word, mask) pairs; one
    ``bit_or`` shuffle over at most num_words·k rows of state
    collapses them. num_words·32 total bits; size the filter so fill
    stays under ~10% for a sub-1e-3 false-positive rate at k=3."""
    num_bits = num_words * BLOOM_BITS_PER_WORD
    pairs = keys.select(F.explode(F.array(*[
        _bloom_pos(F.col(key_col), i, num_bits) for i in range(k)
    ])).alias("pos"))
    mask = _bloom_mask()
    return (pairs
            .select(F.expr(f"pos div {BLOOM_BITS_PER_WORD}").alias("word"),
                    mask.alias("__mask"))
            .groupBy("word")
            .agg(F.bit_or("__mask").alias("bits")))


def bloom_decontaminate(train: DataFrame, bench: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        width: int = 6, num_words: int = 4096,
                        k: int = 3) -> DataFrame:
    """:func:`decontaminate` with the benchmark key set replaced by a
    Bloom filter — the 100 TB shape when even the *eval side's* n-gram
    set is too large to ship: the exact path broadcasts every distinct
    benchmark key (gigabytes at web scale); this broadcasts a
    num_words-row sketch (32 KB at the default) no matter how many
    keys went in.

    One-sided error, deterministically: no false negatives ever (every
    truly contaminated doc is flagged), and false positives — docs
    whose grams happen to hit k set bits — are the same on every
    run/engine because the hash family is md5-derived, so the result
    still hash-matches its oracle. Returns (id, bloom_contaminated).
    """
    num_bits = num_words * BLOOM_BITS_PER_WORD
    bench_keys = (bench.select(F.explode(ngram_keys(F.col(text_col), width))
                               .alias("__key"))
                  .distinct())
    bloom = bloom_build(bench_keys, "__key", num_words, k)

    train_keys = train.select(F.col(id_col),
                              F.explode(ngram_keys(F.col(text_col), width))
                              .alias("__key"))
    probes = train_keys.select(
        id_col, "__key",
        F.explode(F.array(*[
            _bloom_pos(F.col("__key"), i, num_bits) for i in range(k)
        ])).alias("pos"))
    mask = _bloom_mask()
    hit = (F.col("bits").isNotNull()
           & (F.col("bits").bitwiseAND(mask) != 0)).cast("int")
    per_key = (probes
               .withColumn("word", F.expr(f"pos div {BLOOM_BITS_PER_WORD}"))
               .join(F.broadcast(bloom), "word", "left")
               .groupBy(id_col, "__key")
               .agg(F.min(hit).alias("__allhit")))
    return (train.select(id_col).distinct()
            .join(per_key.groupBy(id_col)
                  .agg(F.max("__allhit").alias("__anykey")),
                  id_col, "left")
            .select(F.col(id_col),
                    (F.coalesce(F.col("__anykey"), F.lit(0)) == 1)
                    .alias("bloom_contaminated")))


# ---------------------------------------------------------------------
# corpus mixture rebalancing
# ---------------------------------------------------------------------

def mixture_weights(docs: DataFrame, targets: dict[str, float],
                    by: str = "source",
                    text_col: str = "text") -> DataFrame:
    """Per-group sampling rates that move the corpus toward target
    token shares — the data-mixing step of a training pipeline
    (downsample the over-represented crawl, keep all of the small
    high-quality source).

    For each group g: ``keep_rate_g = min(1, target_share_g /
    actual_share_g)`` where actual_share is the group's fraction of
    corpus tokens. Rates are capped at 1 — upsampling is an epoch
    decision, not a sampling one. Groups absent from ``targets`` get
    target share 0 (dropped by :func:`rebalance_sample`).

    Scale shape: one groupBy(``by``) with map-side combine reduces the
    corpus to a handful of group rows; the corpus total then rides
    along as a 1-row broadcast cross join (the same sanctioned scalar
    attach as tfidf_top_terms — no driver action, stays one lazy
    plan). Token shares use exact integer sums; the only doubles are
    the final divisions, bit-identical across engines."""
    from aggregation_duckdb_spark.operators.text import token_count
    stats = (docs.groupBy(F.col(by).alias("group_key"))
             .agg(F.count(F.lit(1)).alias("n_docs"),
                  F.sum(token_count(F.col(text_col))).cast("long")
                  .alias("sum_tokens")))
    total = stats.agg(F.sum("sum_tokens").cast("long").alias("__total"))
    target_expr = F.lit(0.0)
    for name, share in targets.items():
        target_expr = F.when(F.col("group_key") == name,
                             F.lit(float(share))).otherwise(target_expr)
    return (stats.crossJoin(F.broadcast(total))
            .select(
                "group_key", "n_docs", "sum_tokens",
                (F.col("sum_tokens").cast("double")
                 / F.col("__total").cast("double")).alias("actual_share"),
                target_expr.alias("target_share"))
            .withColumn(
                "keep_rate",
                F.least(F.lit(1.0),
                        F.col("target_share") / F.col("actual_share"))))


def rebalance_sample(docs: DataFrame, targets: dict[str, float],
                     by: str = "source", id_col: str = "doc_id",
                     text_col: str = "text",
                     salt: str = "mix-v1") -> DataFrame:
    """Apply :func:`mixture_weights`: keep each document iff its
    deterministic md5 bucket falls under its group's keep rate.
    Coordination-free and reproducible (same salt → same sample across
    runs, engines, and late shards); the weights table is group-sized,
    so the join broadcasts — the corpus never shuffles."""
    rates = mixture_weights(docs, targets, by, text_col).select(
        "group_key", "keep_rate")
    bucket = split_bucket(F.col(id_col), salt)
    return (docs.join(F.broadcast(rates),
                      docs[by] == rates["group_key"])
            .where(bucket < F.col("keep_rate") * SPLIT_BUCKETS)
            .drop("group_key", "keep_rate"))


def snapshot_diff(old: DataFrame, new: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  normalize: bool = False) -> DataFrame:
    """Corpus snapshot diff — the nightly-ingest ops primitive: which
    documents were added, removed, changed (same id, different content
    hash), or unchanged between two snapshots. One full-outer hash
    equi-join on the id; content compared by md5 so the diff never
    ships text twice.

    Returns (id, status ∈ {added, removed, changed, unchanged})."""
    t_old = F.lower(F.col(text_col)) if normalize else F.col(text_col)
    t_new = t_old
    # presence is tracked by explicit flags, not hash nullness: a NULL
    # text hashes to NULL, and inferring "added" from a NULL old-side
    # hash would misclassify a document present in both snapshots
    o = old.select(F.col(id_col), F.md5(t_old).alias("__ho"),
                   F.lit(True).alias("__in_old"))
    n = new.select(F.col(id_col), F.md5(t_new).alias("__hn"),
                   F.lit(True).alias("__in_new"))
    status = (F.when(F.col("__in_old").isNull(), "added")
              .when(F.col("__in_new").isNull(), "removed")
              .when(F.col("__ho").eqNullSafe(F.col("__hn")), "unchanged")
              .otherwise("changed"))
    return (o.join(n, id_col, "full_outer")
            .select(F.col(id_col), status.alias("status")))


def epoch_shuffle(docs: DataFrame, seed: str = "epoch-0",
                  id_col: str = "doc_id",
                  num_shards: int = 256) -> DataFrame:
    """Deterministic global shuffle order for a training epoch:
    position = rank of md5(seed|id) — same seed, same order, on any
    engine, any partitioning, any day (the reproducibility contract a
    training run needs to resume mid-epoch).

    Scale shape: a single global ROW_NUMBER window would sort the
    corpus on ONE task. Instead the hash's leading bits pick one of
    ``num_shards`` shards, rows rank locally within their shard
    (window partitioned by shard — parallel), and each shard adds the
    total count of all earlier shards (shard offsets: a shard-count
    aggregate, num_shards rows, broadcast back). Because the shard is
    a PREFIX of the sort key, shard-major order IS global hash order —
    the two-level construction equals the one global sort bit-for-bit.

    Returns (id, position) with position 1..N."""
    hx = F.md5(F.concat(F.lit(seed), F.lit("|"),
                        F.col(id_col).cast("string")))
    keyed = docs.select(F.col(id_col), hx.alias("__hx"),
                        F.substring(hx, 1, 2).alias("__shard"))
    from pyspark.sql import Window
    within = F.row_number().over(
        Window.partitionBy("__shard").orderBy("__hx", id_col))
    counts = keyed.groupBy("__shard").agg(F.count(F.lit(1)).alias("__n"))
    offsets = counts.select(
        "__shard",
        (F.sum("__n").over(Window.orderBy("__shard")
                           .rowsBetween(Window.unboundedPreceding, -1)))
        .alias("__off")).fillna(0, ["__off"])
    return (keyed.withColumn("__pos", within)
            .join(F.broadcast(offsets), "__shard")
            .select(F.col(id_col),
                    (F.col("__off") + F.col("__pos")).alias("position")))


def curriculum_order(docs: DataFrame, key_col: str = "n_chars",
                     id_col: str = "doc_id",
                     num_shards: int = 64,
                     carry: tuple = ()) -> DataFrame:
    """Global curriculum position: rank of (key, id) ascending — the
    short-to-long length curriculum (or any numeric difficulty score)
    a training scheduler consumes.

    Scale shape: the naive form is ``ROW_NUMBER() OVER (ORDER BY key,
    id)`` — a window with no PARTITION BY, which Spark plans as an
    Exchange to ONE partition: the whole corpus sorts on one task, the
    classic global-ordering scale-killer. This is the range-sharded
    twin of :func:`epoch_shuffle`'s hash-prefix construction: that one
    only works because its sort key IS the hash, so an arbitrary
    numeric key needs order-preserving shards instead. The shard is a
    linear bin of the key between the corpus min/max (one scalar
    min/max aggregate, attached as a broadcast 1-row frame — the
    sanctioned model-sized class), rows rank locally within their
    shard (parallel window), and broadcast per-shard offsets lift
    local ranks to global positions. The bin is pure integer
    arithmetic of (key, min, max) — deliberately NOT
    ``repartitionByRange``, whose reservoir-sampled boundaries differ
    run to run; this construction is deterministic and bit-equal to
    the one global sort on any engine. The min/max is a 2-value
    scalar collect folded into the plan as literals (the sanctioned
    model-sized class — same policy as ivf_assign's codebook), which
    keeps the shard expression a plain map-side projection instead of
    a 1-row cross join duplicated under every consumer of the keyed
    frame.

    Skew caveat: heavily clustered keys collapse into few bins; the
    construction stays correct (a bin is just a window partition), and
    a near-constant key degrades toward the single-task sort — for
    such keys compose with a secondary spread key. The key must be
    NON-NULL: engines disagree on where NULLs sort (Spark ASC is
    NULLS FIRST, DuckDB NULLS LAST), so a null key has no
    well-defined cross-engine position — filter or coalesce first.
    Returns (id, key, position) with position 1..N.
    """
    from pyspark.sql import Window
    mn, mx = docs.agg(F.min(key_col).cast("long"),
                      F.max(key_col).cast("long")).collect()[0]
    if mn is None:
        # empty input (or all-null key): the min/max literals the shard
        # expression interpolates don't exist — fail clearly instead of
        # building '(key - None)' and dying in an AnalysisException
        raise ValueError(
            f"curriculum_order: no non-null '{key_col}' values to rank")
    # bin arithmetic stays < num_shards by construction:
    # ((mx-mn)*S) div (mx-mn+1) <= S-1, so no clamp is needed
    keyed = docs.select(
        F.col(id_col), F.col(key_col), *[F.col(c) for c in carry],
        F.expr(f"(({key_col} - {mn}) * {num_shards}) "
               f"div {mx - mn + 1}").alias("__shard"))
    within = F.row_number().over(
        Window.partitionBy("__shard").orderBy(key_col, id_col))
    counts = keyed.groupBy("__shard").agg(F.count(F.lit(1)).alias("__n"))
    offsets = counts.select(
        "__shard",
        (F.sum("__n").over(Window.orderBy("__shard")
                           .rowsBetween(Window.unboundedPreceding, -1)))
        .alias("__off")).fillna(0, ["__off"])
    return (keyed.withColumn("__pos", within)
            .join(F.broadcast(offsets), "__shard")
            .select(F.col(id_col), F.col(key_col),
                    *[F.col(c) for c in carry],
                    (F.col("__off") + F.col("__pos")).alias("position")))


def mixture_order(docs: DataFrame, weights: dict[str, float],
                  default_weight: float = 0.125,
                  group_col: str = "lang", id_col: str = "doc_id",
                  seed: str = "mix-0", denom: int = 10_000,
                  num_shards: int = 64) -> DataFrame:
    """Deterministic mixture-weighted global training order — the data
    MIXING schedule a multi-source training run consumes (weights say
    "1 part code to 4 parts web"), where :func:`epoch_shuffle` gives
    the uniform order and :func:`curriculum_order` the difficulty
    order.

    Construction (stride scheduling / weighted fair queueing — the
    classic deterministic form of weighted sampling): each source's
    documents are ranked locally by md5(seed|id), and document r of
    source s is scheduled at virtual time ``vt = (r-1)·denom div
    w_parts(s)`` with ``w_parts = round(weight·denom)``. A source with
    twice the weight fires twice as often; every source advances
    monotonically; the whole schedule is pure integer arithmetic, so
    it reproduces on any engine, partitioning, or day.

    Scale shape — two single-task sorts refused: (a) the PER-SOURCE
    rank would be a window with one partition per source (a handful of
    corpus-sized tasks), so it runs epoch_shuffle's hash-prefix
    construction WITHIN each source — windows partitioned by (source,
    hash-prefix shard), per-(source, shard) offsets broadcast back;
    shard-major order is hash order because the shard is a prefix of
    the sort key. (b) The GLOBAL position over (vt, id) rides
    :func:`curriculum_order`'s range-sharded machinery. Both are
    bit-equal to their one-task forms by the same prefix argument.

    Sources missing from ``weights`` get ``default_weight``; weights
    need not sum to 1 (only ratios matter). Returns
    (id, group, vt, position), position 1..N."""
    parts = {g: int(round(w * denom)) for g, w in weights.items()}
    if any(p <= 0 for p in parts.values()) or \
            int(round(default_weight * denom)) <= 0:
        raise ValueError("mixture_order: every weight must round to "
                         f">= 1/{denom}")
    from pyspark.sql import Window
    hx = F.md5(F.concat(F.lit(seed), F.lit("|"),
                        F.col(id_col).cast("string")))
    keyed = docs.select(F.col(id_col), F.col(group_col),
                        hx.alias("__hx"),
                        F.substring(hx, 1, 2).alias("__shard"))
    within = F.row_number().over(
        Window.partitionBy(group_col, "__shard").orderBy("__hx", id_col))
    counts = keyed.groupBy(group_col, "__shard").agg(
        F.count(F.lit(1)).alias("__n"))
    offsets = counts.select(
        group_col, "__shard",
        (F.sum("__n").over(Window.partitionBy(group_col)
                           .orderBy("__shard")
                           .rowsBetween(Window.unboundedPreceding, -1)))
        .alias("__off")).fillna(0, ["__off"])
    ranked = (keyed.withColumn("__pos", within)
              .join(F.broadcast(offsets), [group_col, "__shard"]))
    w_parts = F.lit(int(round(default_weight * denom)))
    for g, p in sorted(parts.items()):
        w_parts = F.when(F.col(group_col) == g, F.lit(p)) \
            .otherwise(w_parts)
    staged = ranked.select(
        F.col(id_col), F.col(group_col),
        ((F.col("__off") + F.col("__pos") - 1) * denom).alias("__num"),
        w_parts.alias("__w")
    ).select(id_col, group_col, F.expr("__num div __w").alias("vt"))
    return curriculum_order(staged, key_col="vt", id_col=id_col,
                            num_shards=num_shards, carry=(group_col,))


def leak_report(train: DataFrame, bench: DataFrame, width: int = 6,
                text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-benchmark-document leakage report — decontamination's
    inverse view: for each eval document, how many of ITS n-grams
    appear in the training corpus and how many training documents
    carry them. 'Which benchmarks are compromised, and how badly' —
    the number an eval-integrity review asks for, where
    :func:`decontaminate` only answers 'which training docs to drop'.

    Same join discipline as decontaminate: both sides reduce to
    (id, md5-gram) pairs, the bench side is small, one hash equi-join.

    Returns (bench_doc_id, n_grams, n_leaked_grams, n_leaking_train_docs,
    leak_share)."""
    bench_keys = bench.select(
        F.col(id_col).alias("bench_doc_id"),
        F.explode(ngram_keys(F.col(text_col), width)).alias("__key"))
    train_keys = (train.select(F.col(id_col).alias("__tid"),
                               F.explode(ngram_keys(F.col(text_col), width))
                               .alias("__key")))
    hits = (bench_keys.join(train_keys, "__key")
            .groupBy("bench_doc_id")
            .agg(F.count_distinct("__key").alias("n_leaked_grams"),
                 F.count_distinct("__tid").alias("n_leaking_train_docs")))
    base = bench.select(F.col(id_col).alias("bench_doc_id"),
                        F.size(ngram_keys(F.col(text_col), width))
                        .cast("long").alias("n_grams"))
    return (base.join(hits, "bench_doc_id", "left")
            .select("bench_doc_id", "n_grams",
                    F.coalesce("n_leaked_grams", F.lit(0)).cast("long")
                    .alias("n_leaked_grams"),
                    F.coalesce("n_leaking_train_docs", F.lit(0)).cast("long")
                    .alias("n_leaking_train_docs"))
            .withColumn("leak_share",
                        F.col("n_leaked_grams").cast("double")
                        / F.col("n_grams").cast("double")))


def dataset_fingerprint(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Order-invariant corpus checksum — the snapshot-integrity
    primitive for data versioning: two copies of a corpus match
    byte-for-byte (any partitioning, any row order, any file layout)
    iff their fingerprints match, and the comparison is one number
    per side instead of a corpus-sized diff. Use it to certify a
    migration/compaction/relayout (e.g. a Z-order rewrite) changed
    NOTHING, where snapshot_diff answers the follow-up question of
    WHAT changed.

    Shape: one map-side pass (md5 per row, split into 32-bit halves)
    into a single scalar aggregate — commutative combiners (xor, sum,
    count), so the plan is a partial/final hash aggregate with a
    1-row exchange; nothing corpus-sized shuffles. xor catches
    any single-row difference; sum additionally catches duplicated
    rows (xor of a row with itself cancels — the classic xor-only
    blind spot); 32-bit halves summed over < 2^31 rows cannot
    overflow int64.

    Returns one row: (n_docs, xor_lo, xor_hi, sum_lo)."""
    x = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|"),
                       F.coalesce(F.col(text_col), F.lit(""))))
    h1 = F.conv(F.substring(x, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(x, 9, 8), 16, 10).cast("long")
    return docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.bit_xor(h1).alias("xor_lo"),
        F.bit_xor(h2).alias("xor_hi"),
        F.sum(h1).alias("sum_lo"))


def bucket_fingerprints(docs: DataFrame, num_buckets: int = 64,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Merkle-style per-bucket corpus checksums: the whole-corpus
    :func:`dataset_fingerprint` sharded over ``num_buckets``
    deterministic md5 id-buckets, so two snapshots can be compared at
    bucket granularity and only DIFFERING buckets re-read — the
    rsync/Merkle idea for corpus sync: at 100 TB, "which 1/64th of
    the corpus changed" costs two fingerprint scans and a
    64-row compare, not a corpus-sized diff. The id-hash bucket
    (not a range) keeps every bucket statistically even, so one
    changed document dirties exactly one bucket.

    Returns (bucket, n_docs, xor_lo, xor_hi, sum_lo), one row per
    NON-EMPTY bucket."""
    x = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|"),
                       F.coalesce(F.col(text_col), F.lit(""))))
    h1 = F.conv(F.substring(x, 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(x, 9, 8), 16, 10).cast("long")
    bucket = (split_bucket(F.col(id_col), salt="fp") % num_buckets)
    return (docs.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.bit_xor(h1).alias("xor_lo"),
                 F.bit_xor(h2).alias("xor_hi"),
                 F.sum(h1).alias("sum_lo")))


def changed_buckets(old: DataFrame, new: DataFrame,
                    num_buckets: int = 64, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Compare two snapshots by bucket fingerprint: returns the
    buckets whose contents differ in ANY way (membership, text, or
    duplication — the xor+sum+count triple has no silent collision
    class short of an md5 break). Each side is one fingerprint scan;
    the compare is a ``num_buckets``-row full-outer join."""
    a = bucket_fingerprints(old, num_buckets, text_col, id_col)
    b = bucket_fingerprints(new, num_buckets, text_col, id_col)
    cols = ["n_docs", "xor_lo", "xor_hi", "sum_lo"]
    bn = b.select("bucket", *[F.col(c).alias(f"__n_{c}") for c in cols])
    same = None
    for c in cols:
        eq = F.col(c).eqNullSafe(F.col(f"__n_{c}"))
        same = eq if same is None else (same & eq)
    return (a.join(bn, "bucket", "full_outer")
            .where(~same)
            .select("bucket"))


def pack_greedy(docs: DataFrame, context_len: int,
                text_col: str = "text", id_col: str = "doc_id",
                num_buckets: int = 16) -> DataFrame:
    """Greedy bin-packing of documents into fixed-budget training
    sequences — next-fit-decreasing: within a bucket, docs in
    (tokens desc, id) order either join the current sequence (if they
    fit) or open a new one. Where :func:`pack_sequences`
    (concat-then-chunk) SPLITS documents across sequence boundaries,
    this keeps every document whole and trades a little padding for
    it — the packing a no-document-truncation training recipe needs;
    decreasing order keeps that padding small (big docs first, small
    docs fill the tails).

    Scale shape: the greedy scan is inherently sequential PER BUCKET
    (each step needs the previous fill level), so it runs as an
    Arrow-batched ``applyInPandas`` over the same md5 buckets
    pack_sequences shards by — ``num_buckets``-way parallel, one
    shuffle, per-task state bounded by bucket size. Only (id, bucket,
    n_tokens) rides the shuffle — never text. Semantics are exactly
    reproducible in recursive SQL (the oracle steps row-rank by
    row-rank carrying (seq_idx, fill)), so this is the repo's one
    Python-stateful batch operator with a full DuckDB oracle.

    A doc longer than ``context_len`` gets its own sequence (it must
    overflow somewhere; flagging beats silent truncation). Returns
    (id, bucket, n_tokens, seq_idx) with seq_idx 1.. per bucket.
    """
    from aggregation_duckdb_spark.operators.text import token_count
    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        (split_bucket(F.col(id_col), salt="pack") % num_buckets)
        .alias("bucket"),
        token_count(F.col(text_col)).alias("n_tokens"))

    def pack(pdf):
        pdf = pdf.sort_values(["n_tokens", "doc_id"],
                              ascending=[False, True])
        seq_col, seq, fill = [], 0, 0
        for n in pdf["n_tokens"]:
            if seq > 0 and fill + n <= context_len:
                fill += n
            else:
                seq += 1
                fill = n
            seq_col.append(seq)
        out = pdf.copy()
        out["seq_idx"] = seq_col
        return out

    return (sized.groupBy("bucket")
            .applyInPandas(pack, "doc_id long, bucket long, "
                                 "n_tokens long, seq_idx long"))
