"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built from native ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen'd) — no row-at-a-time Python UDFs
anywhere: at 100 TB of documents these run at scan speed. The one
Arrow-batched exception is :func:`bpe_encode`'s merge fold (a
data-dependent loop no SQL expression expresses; SURVEY §2.8's
sanctioned path). Determinism: every derived value is exact
integer/string math (hashes are md5 hex strings), so results
hash-match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations


from pyspark.sql import Column, DataFrame, functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Order = deterministic tie-break priority.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "est", "que"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty strings filtered (leading/trailing
    whitespace would otherwise produce them)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def punct_count(text: Column) -> Column:
    """Characters that are not alphanumeric/space — the quality signal
    'too much punctuation'."""
    return (F.length(text) -
            F.length(F.regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("long")


def stopword_hits(toks: Column, words: list[str]) -> Column:
    """How many tokens are in the given stopword list (with repeats) —
    an in-row intersection, no shuffle."""
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t))).cast("long")


def text_stats(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document surface statistics (token/char counts, ratios).
    Entirely map-side: one pass over the scan, no shuffle."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks).cast("long")
    return docs.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        n_tok.alias("n_tokens"),
        punct_count(t).alias("n_punct"),
        # mean token length: exact integer inputs → deterministic double
        (F.aggregate(toks, F.lit(0).cast("long"),
                     lambda acc, x: acc + F.length(x)).cast("double") / n_tok
         ).alias("avg_token_len"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
    )


def language_id(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language ID heuristic. Scores per language are
    computed in-row; argmax with fixed priority tie-break (list order
    in LANG_STOPWORDS) so the answer is deterministic."""
    toks = tokens(F.col(text_col))
    scored = docs.select(
        F.col(id_col), toks.alias("__toks"),
        *[stopword_hits(toks, ws).alias(f"score_{lang}")
          for lang, ws in LANG_STOPWORDS.items()])
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_STOPWORDS])
    pick = None
    for lang in LANG_STOPWORDS:  # first max wins — fixed priority
        cond = F.col(f"score_{lang}") == best
        pick = F.when(cond, lang) if pick is None else pick.when(cond, lang)
    return scored.select(
        id_col, *[f"score_{lang}" for lang in LANG_STOPWORDS],
        F.when(best > 0, pick).otherwise("und").alias("predicted_lang"))


def quality_exprs(text: Column) -> dict[str, Column]:
    """The quality-filter trio as plain Column expressions, so callers
    (corpus_report, custom gates) can compute them inside their OWN
    projection — no extra scan, no join back on the id."""
    toks = tokens(text)
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text).cast("double")
    punct_ratio = (punct_count(text).cast("double")
                   / F.greatest(n_chars, F.lit(1.0)))
    all_stop = sorted({w for ws in LANG_STOPWORDS.values() for w in ws})
    stop_ratio = (stopword_hits(toks, all_stop).cast("double")
                  / F.greatest(n_tok, F.lit(1.0)))
    length_score = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    score = (F.lit(0.4) * length_score
             + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
             + F.lit(0.3) * F.least(stop_ratio * 4, F.lit(1.0)))
    return {
        "length_score": F.round(length_score, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def quality_score(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Composite quality score ∈ [0,1] from length, punctuation, and
    stopword density — the standard pre-training filter trio. All
    arithmetic from exact integers → deterministic doubles."""
    exprs = quality_exprs(F.col(text_col))
    return docs.select(F.col(id_col),
                       *[c.alias(name) for name, c in exprs.items()])


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", shingle_width: int = 3) -> DataFrame:
    """Document fingerprints: full-text md5 (exact-dup key) plus the
    minimum shingle hash (a 1-permutation MinHash — robust to small
    edits). Both are md5 hex strings: deterministic and portable."""
    from aggregation_duckdb_spark.operators.dedup import shingles
    t = F.col(text_col)
    sh = shingles(t, shingle_width)
    return docs.select(
        F.col(id_col),
        F.md5(F.lower(t)).alias("exact_fingerprint"),
        F.array_min(F.transform(sh, F.md5)).alias("min_shingle_hash"))


def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` characteristic terms per document by tf·idf, with the
    raw-ratio idf variant idf = N/df (no logarithm): ln() is
    library-dependent in its last ulp across engines, while one IEEE
    division of exact integers is bit-identical everywhere — and a
    monotone per-term transform, so each term's score ordering across
    documents is unchanged. The keyword-extraction primitive for corpus
    exploration and topic labeling.

    Scale shape: explode → groupBy(doc, term) for tf (map-side
    combinable); df reduces the same pairs by term (tiny: vocabulary-
    sized); the tf⋈df join is on term — vocabulary tables broadcast;
    the top-k window partitions by doc over rows already co-located by
    the tf group-by. The corpus size N rides along as a broadcast
    1-row cross join, so the whole operator is one lazy plan — no
    driver-side action. Ties break on term text ascending so results
    are deterministic."""
    from pyspark.sql import Window
    pairs = (docs.select(F.col(id_col),
                         F.explode(tokens(F.col(text_col))).alias("term")))
    tf = (pairs.groupBy(id_col, "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count_distinct(F.col(id_col)).alias("__n"))
    scored = (tf.join(F.broadcast(df_), "term")
              .crossJoin(F.broadcast(n_docs))
              .withColumn("score",
                          F.col("tf").cast("double") * F.col("__n")
                          / F.col("df"))
              .drop("__n"))
    w = (Window.partitionBy(id_col)
         .orderBy(F.col("score").desc(), F.col("term").asc()))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(id_col, "term",
                    F.col("tf").cast("long").alias("tf"),
                    F.col("df").cast("long").alias("df"),
                    "score", F.col("rank").cast("long").alias("rank")))


ROLLING_BASE = 131
ROLLING_MOD = 2147483647  # 2^31 − 1 (prime); acc·131 + 255 < 2^39, exact int64


def _poly_hash(codes) -> "F.Column":
    """Left fold (acc·B + c) mod M — the Rabin–Karp polynomial hash,
    exact integer math, identical in DuckDB's list_reduce."""
    return F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + c) % ROLLING_MOD)


def rolling_fingerprint(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", gram: int = 8) -> DataFrame:
    """Rolling-hash fingerprints: the whole-document polynomial hash
    plus the minimum ``gram``-char window hash (winnowing-style local
    fingerprint — stable under content reordering/appends that move but
    don't change a window). All integer column math, no UDFs."""
    t = F.col(text_col)
    codes = F.transform(
        F.sequence(F.lit(1), F.length(t)),
        lambda i: F.ascii(F.substring(t, i, 1)).cast("long"))
    window_hash = lambda i: _poly_hash(F.transform(
        F.sequence(F.lit(0), F.least(F.lit(gram - 1), F.length(t) - i)),
        lambda j: F.ascii(F.substring(t, i + j, 1)).cast("long")))
    min_gram = F.array_min(F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (gram - 1), F.lit(1))),
        window_hash))
    return docs.select(F.col(id_col),
                      _poly_hash(codes).alias("doc_hash"),
                      min_gram.alias("min_gram_hash"))


# ---------------------------------------------------------------------
# count-min sketch: bounded-memory n-gram counting
# ---------------------------------------------------------------------

def _cms_col(item: Column, row: int, width: int) -> Column:
    """Hash row ``row``'s counter index for ``item``: first 8 hex chars
    of md5("row|item") mod width — exact integer math, reproducible in
    DuckDB, independent across rows by salt."""
    h = F.md5(F.concat(F.lit(f"cms{row}|"), item))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % width


def word_ngrams(text: Column, n: int = 3) -> Column:
    """All word n-grams in order, repeats preserved (unlike
    ``dedup.shingles``, which distinct-ifies for set semantics);
    docs shorter than ``n`` tokens yield their single truncated
    gram."""
    t = tokens(text)
    starts = F.sequence(F.lit(1), F.greatest(F.size(t) - (n - 1), F.lit(1)))
    return F.transform(starts, lambda i: F.concat_ws(" ", F.slice(t, i, n)))


def countmin_build(docs: DataFrame, depth: int = 4, width: int = 1024,
                   gram: int = 3, text_col: str = "text") -> DataFrame:
    """Count-min sketch over word ``gram``-grams: a (depth × width)
    counter table summarizing corpus n-gram frequencies in FIXED
    memory — the heavy-hitter primitive for when the exact n-gram
    group-by's key cardinality (billions at 100 TB) is itself the
    problem.

    Shape: grams explode in-row to (row, col) coordinate pairs (depth
    per gram), then ONE groupBy(row, col) with map-side combine — the
    shuffle carries at most depth × width distinct keys regardless of
    corpus size. Estimates are biased up only (collisions add), with
    the standard (eps, delta) bounds from (width, depth).
    """
    grams = word_ngrams(F.col(text_col), gram)
    coords = F.flatten(F.transform(
        grams,
        lambda g: F.array(*[
            F.struct(F.lit(d).alias("row"),
                     _cms_col(g, d, width).alias("col"))
            for d in range(depth)])))
    return (docs.select(F.explode(coords).alias("c"))
            .groupBy(F.col("c.row").alias("row"), F.col("c.col").alias("col"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def countmin_build_grams(grams: DataFrame, depth: int = 4,
                         width: int = 1024,
                         gram_col: str = "gram") -> DataFrame:
    """:func:`countmin_build` over an ALREADY-EXPLODED gram frame —
    for pipelines that also need the grams for another pass (exact
    heavy-hitter counts, say) and want to tokenize the corpus once,
    not once per consumer. Identical counters: the (row, col)
    coordinates per gram are the same expressions."""
    coords = F.explode(F.array(*[
        F.struct(F.lit(d).alias("row"),
                 _cms_col(F.col(gram_col), d, width).alias("col"))
        for d in range(depth)]))
    return (grams.select(coords.alias("c"))
            .groupBy(F.col("c.row").alias("row"),
                     F.col("c.col").alias("col"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def countmin_estimate(sketch: DataFrame, items: DataFrame,
                      depth: int = 4, width: int = 1024,
                      item_col: str = "item") -> DataFrame:
    """Point-query the sketch: estimate(item) = min over rows of the
    item's counter. The item set is query-sized — it explodes to
    (item, row, col) probes and BROADCASTS into the join against the
    (depth × width)-row sketch; nothing corpus-sized moves."""
    probes = items.select(
        F.col(item_col),
        F.explode(F.array(*[
            F.struct(F.lit(d).alias("row"),
                     _cms_col(F.col(item_col), d, width).alias("col"))
            for d in range(depth)])).alias("p"))
    probes = probes.select(item_col, F.col("p.row").alias("row"),
                           F.col("p.col").alias("col"))
    return (sketch.join(F.broadcast(probes), ["row", "col"])
            .groupBy(item_col)
            .agg(F.min("cnt").alias("cms_estimate")))


#: BPE-style pre-tokenization pattern: letter runs, digit runs, and
#: single punctuation marks split into separate tokens (the
#: subword-tokenizer convention), unlike whitespace counting which
#: glues "word," into one token. Deliberately alternation-unambiguous
#: and lookahead-free so Java regex (Spark) and RE2 (DuckDB) match
#: identically.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Subword-style token count via the BPE-ish pre-tokenizer regex —
    the budget a real tokenizer would charge tracks this far closer
    than whitespace counting (punctuation and digits become their own
    tokens). In-row, JVM-side."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN)).cast("long")


def compression_ratio(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    Gopher/FineWeb-style quality signal: boilerplate and templated text
    compresses far below ~0.5, near-random text approaches 1.0+; both
    tails are filter candidates. Complements the token-level
    repetition filter, which only sees exact token repeats.

    Codec work can't be expressed in pyspark.sql.functions, so this is
    the sanctioned Arrow path (``mapInPandas``, like the multimodal
    decoders): zlib runs executor-side per Arrow batch, no driver
    collect, no row-at-a-time Python UDF in a SQL expression. No
    DuckDB oracle exists for zlib — correctness is pinned by pytest
    against direct ``zlib.compress`` on the same rows."""
    import zlib

    def batches(it):
        import pandas as pd
        for pdf in it:
            raw = [t.encode("utf-8") if isinstance(t, str) else b""
                   for t in pdf[text_col]]
            comp = [len(zlib.compress(b, level)) for b in raw]
            n = [len(b) for b in raw]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "n_bytes": n,
                "n_compressed": comp,
                "compression_ratio": [
                    (c / b) if b else None for c, b in zip(comp, n)],
            })

    # schema follows the caller's id column — name AND type (a fixed
    # long would Arrow-fail for string doc ids)
    id_type = docs.schema[id_col].dataType.simpleString()
    schema = (f"{id_col} {id_type}, n_bytes long, n_compressed long, "
              f"compression_ratio double")
    return (docs.select(F.col(id_col), F.col(text_col))
            .mapInPandas(batches, schema))


def ngram_novelty(docs: DataFrame, reference: DataFrame, width: int = 3,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document novelty vs a reference corpus: the fraction of the
    document's distinct word n-grams that appear nowhere in the
    reference — low novelty means the doc is re-hashed reference
    content (dedup candidate / low marginal training value), high
    novelty on a trusted reference flags distribution drift. The
    per-doc complement of corpus-level decontamination.

    Scale shape: the reference reduces to distinct grams (map-side
    combinable) and is broadcast when small (eval slices, snapshots);
    the corpus side ships (id, gram) pairs through one anti-join and
    one per-id count — the text itself never shuffles. Counts are
    integers; novelty is one int/int division — bit-identical
    cross-engine.

    Returns (id, n_grams, n_novel, novelty)."""
    from aggregation_duckdb_spark.operators.dedup import shingles
    base = docs.select(F.col(id_col),
                       shingles(F.col(text_col), width).alias("__sh"))
    grams = base.select(F.col(id_col), F.size("__sh").alias("n_grams"),
                        F.explode("__sh").alias("__g"))
    ref = (reference.select(F.explode(shingles(F.col(text_col), width))
                            .alias("__g")).distinct())
    novel = (grams.join(ref, "__g", "left_anti")
             .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_novel")))
    return (base.select(F.col(id_col), F.size("__sh").alias("n_grams"))
            .join(novel, id_col, "left")
            .select(F.col(id_col), "n_grams",
                    F.coalesce("n_novel", F.lit(0)).cast("long")
                    .alias("n_novel"))
            .withColumn("novelty",
                        F.col("n_novel").cast("double")
                        / F.col("n_grams").cast("double")))


def token_vocab(docs: DataFrame, top_k: int = 1000,
                text_col: str = "text") -> DataFrame:
    """Corpus token vocabulary: the top-``top_k`` tokens by frequency
    with per-token corpus share and cumulative coverage — the
    tokenizer-design primitive (what does a k-entry vocab cover?) and
    a drift monitor between corpus snapshots.

    Scale shape: explode→count is one map-side-combinable shuffle; the
    rank/cumulative windows then run on the VOCAB (dictionary-sized,
    orders of magnitude below the corpus), where a single-partition
    window is the right plan, not a bottleneck. Shares divide exact
    integer counts — bit-identical cross-engine. Ties rank
    deterministically by (count desc, token asc).

    Returns (rank, token, n_occurrences, share, cum_share)."""
    from pyspark.sql import Window
    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_occurrences"))
    order = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    whole = Window.partitionBy().rowsBetween(Window.unboundedPreceding,
                                             Window.unboundedFollowing)
    running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (counts
            .withColumn("rank", F.row_number().over(order))
            .withColumn("__total", F.sum("n_occurrences").over(whole))
            .withColumn("__cum", F.sum("n_occurrences").over(running))
            .where(F.col("rank") <= top_k)
            .select(F.col("rank").cast("long").alias("rank"), "token",
                    "n_occurrences",
                    (F.col("n_occurrences").cast("double")
                     / F.col("__total").cast("double")).alias("share"),
                    (F.col("__cum").cast("double")
                     / F.col("__total").cast("double")).alias("cum_share")))


def line_stats(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id", sep: str = "\n") -> DataFrame:
    """Within-document duplicate-line statistics (the Gopher
    repetition signals): per doc, the fraction of lines that are
    repeats of an earlier line, and the fraction of characters sitting
    in those repeated occurrences. Everything is an in-row
    higher-order-function pass over the split text — no explode, no
    shuffle; a quality gate this cheap should never cost a stage.

    dup_line_frac  = (n_lines - n_distinct) / n_lines
    dup_char_frac  = sum over lines with count c>1 of (c-1)*len(line)
                     / total line chars
    Blank lines are dropped before counting (they are structure, not
    content). Empty docs yield zero fractions.
    """
    ls = F.filter(F.split(F.col(text_col), sep),
                  lambda l: F.trim(l) != "")
    d = docs.select(F.col(id_col).alias("doc_id"), ls.alias("__ls"))
    dist = F.array_distinct(F.col("__ls"))
    # per distinct line, its occurrence count (in-row quadratic over
    # the doc's OWN lines — docs are small; the corpus never joins)
    counted = F.transform(
        dist, lambda u: F.struct(
            u.alias("line"),
            F.size(F.filter(F.col("__ls"), lambda l: l == u))
            .alias("cnt")))
    total_chars = F.aggregate(F.col("__ls"), F.lit(0).cast("long"),
                              lambda acc, l: acc + F.length(l))
    dup_chars = F.aggregate(
        counted, F.lit(0).cast("long"),
        lambda acc, s: acc + F.when(
            s["cnt"] > 1,
            (s["cnt"] - 1).cast("long") * F.length(s["line"]))
        .otherwise(F.lit(0).cast("long")))
    n_lines = F.size("__ls")
    n_distinct = F.size(dist)
    return d.select(
        "doc_id",
        n_lines.cast("long").alias("n_lines"),
        n_distinct.cast("long").alias("n_distinct_lines"),
        F.when(n_lines > 0,
               (n_lines - n_distinct).cast("double") / n_lines)
        .otherwise(F.lit(0.0)).alias("dup_line_frac"),
        F.when(total_chars > 0, dup_chars.cast("double") / total_chars)
        .otherwise(F.lit(0.0)).alias("dup_char_frac"))


def encode_ids(docs: DataFrame, vocab: DataFrame | None = None,
               top_k: int = 1000, text_col: str = "text",
               id_col: str = "doc_id", oov_id: int = 0,
               max_map_entries: int = 10_000) -> DataFrame:
    """Vocabulary encoding: tokenize each document and map every token
    to its vocabulary id (= frequency rank from ``token_vocab``),
    out-of-vocabulary tokens to ``oov_id`` — the tokenize→ids step of
    a pretraining pipeline.

    Scale shape (the ``ivf_assign`` codebook pattern on text): a
    MODEL-sized vocabulary (≤ ``max_map_entries`` rows) is collected
    once and folded into the plan as a map literal; the encode is then
    a ZERO-SHUFFLE map-side transform — no explode, no per-token
    join, nothing corpus-sized ever shuffles. A vocabulary too large
    to fold into the plan (BPE merges at 1M+ entries) must NOT be
    collected to the driver at all — that path explodes to
    (doc, pos, token), equi-joins the vocab (AQE broadcasts it if it
    fits, shuffles it if not), and re-assembles arrays by position;
    two corpus-sized exchanges, each spillable. Both paths produce
    identical arrays (pytest-pinned).

    Returns (doc_id, token_ids array<int>, n_tokens, n_oov)."""
    if vocab is None:
        vocab = token_vocab(docs, top_k=top_k, text_col=text_col)
    if vocab.limit(max_map_entries + 1).count() > max_map_entries:
        return _encode_ids_join(docs, vocab, text_col, id_col, oov_id)
    rows = vocab.select("token", "rank").collect()  # bounded: checked
    if rows:
        mapping = F.create_map(*[
            lit for r in rows
            for lit in (F.lit(r["token"]), F.lit(int(r["rank"])))])
        lookup = lambda t: F.coalesce(  # noqa: E731
            F.element_at(mapping, t), F.lit(oov_id))
    else:
        lookup = lambda t: F.lit(oov_id)  # noqa: E731
    ids = F.transform(tokens(F.col(text_col)), lookup)
    return docs.select(
        F.col(id_col),
        ids.alias("token_ids"),
        F.size(ids).cast("long").alias("n_tokens"),
        F.size(F.filter(ids, lambda i: i == oov_id)).cast("long")
        .alias("n_oov"))


def _encode_ids_join(docs: DataFrame, vocab: DataFrame, text_col: str,
                     id_col: str, oov_id: int) -> DataFrame:
    """encode_ids for vocabularies too large for a plan literal:
    posexplode → token equi-join → position-ordered re-assembly. The
    per-doc collect is bounded by document length; empty docs survive
    through the left join back to the corpus."""
    ex = docs.select(
        F.col(id_col),
        F.posexplode_outer(tokens(F.col(text_col)))
        .alias("__pos", "__tok"))
    joined = ex.join(vocab.select(F.col("token").alias("__tok"),
                                  F.col("rank").alias("__rank")),
                     "__tok", "left")
    enc = (joined
           .where(F.col("__pos").isNotNull())
           .groupBy(id_col)
           .agg(F.transform(
               F.array_sort(F.collect_list(F.struct(
                   F.col("__pos").alias("p"),
                   F.coalesce(F.col("__rank"), F.lit(oov_id)).cast("int")
                   .alias("t")))),
               lambda s: s["t"]).alias("token_ids")))
    empty = F.array().cast("array<int>")
    return (docs.select(F.col(id_col))
            .join(enc, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce("token_ids", empty).alias("token_ids"))
            .select(
                id_col, "token_ids",
                F.size("token_ids").cast("long").alias("n_tokens"),
                F.size(F.filter("token_ids", lambda i: i == oov_id))
                .cast("long").alias("n_oov")))


def dedup_doc_lines(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", sep: str = "\n") -> DataFrame:
    """Within-document line dedup: keep the FIRST occurrence of every
    repeated line (blank lines survive as structure) and rebuild the
    text in original order — the rewrite twin of ``line_stats``. Pure
    in-row: the first-occurrence test is an indexed higher-order
    filter over the doc's own lines (quadratic in lines-per-doc,
    bounded by document size), so the operator plans ZERO shuffles.

    Returns (doc_id, clean_text, n_lines, n_kept)."""
    ls = F.split(F.col(text_col), sep)
    d = docs.select(F.col(id_col).alias("doc_id"), ls.alias("__ls"))
    kept = F.filter(
        F.col("__ls"),
        lambda x, i: (F.trim(x) == "")
        | (F.array_position(F.slice(F.col("__ls"), 1, i), x) == 0))
    return d.select(
        "doc_id",
        F.concat_ws(sep, kept).alias("clean_text"),
        F.size("__ls").cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"))


def unigram_prob_stats(docs: DataFrame, vocab: DataFrame | None = None,
                       top_k: int = 1000, rare_count: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Unigram-LM quality proxy (the KenLM-style perplexity filter's
    cheap cousin): score each document by how PROBABLE its tokens are
    under the corpus's own unigram distribution. Low mean probability
    = exotic/noisy text; a high rare-token count = OCR junk, code in a
    prose corpus, wrong-language fragments.

    p(t) = (c_t + 1) / (N + top_k + 1), Laplace-smoothed, where c_t is
    the corpus count when t is in the top-``top_k`` vocabulary and 0
    otherwise (outside-vocab tokens are "rare" by definition — at
    web-corpus scale the tail is exactly what the filter exists to
    catch), and N is the total corpus token count.

    Scale shape: one explode→count shuffle builds the vocabulary
    (map-side combinable); the vocab and the scalar N fold into the
    plan (model-sized, the ivf_assign/encode_ids policy), so scoring
    is a ZERO-SHUFFLE in-row pass. Float discipline: per-token
    probabilities are single IEEE divisions of exact integers and the
    per-doc mean is a sequential left fold in token order — both
    bit-reproducible cross-engine, no ln() (last-ulp trap, same
    reason tfidf uses ratio idf).

    Returns (doc_id, n_tokens, mean_prob, min_prob, n_rare) where
    n_rare counts tokens with effective corpus count <= ``rare_count``
    (integer comparison, no float edge)."""
    if vocab is None:
        vocab = token_vocab(docs, top_k=top_k, text_col=text_col)
    n_total = docs.agg(
        F.sum(F.size(tokens(F.col(text_col))))).collect()[0][0] or 0
    rows = vocab.select("token", "n_occurrences").collect()  # <= top_k
    denom = float(n_total + top_k + 1)
    if rows:
        counts = F.create_map(*[
            lit for r in rows
            for lit in (F.lit(r["token"]), F.lit(int(r["n_occurrences"])))])
        cnt = lambda t: F.coalesce(  # noqa: E731
            F.element_at(counts, t), F.lit(0)).cast("long")
    else:
        cnt = lambda t: F.lit(0).cast("long")  # noqa: E731
    toks = tokens(F.col(text_col))
    cnts = F.transform(toks, cnt)
    probs = F.transform(cnts, lambda c: (c.cast("double") + 1.0) / denom)
    fold = F.aggregate(probs, F.lit(0.0), lambda acc, p: acc + p)
    n_tok = F.size(toks)
    return docs.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.when(n_tok > 0, fold / n_tok).otherwise(F.lit(0.0))
        .alias("mean_prob"),
        F.when(n_tok > 0, F.array_min(probs)).otherwise(F.lit(0.0))
        .alias("min_prob"),
        F.size(F.filter(cnts, lambda c: c <= rare_count)).cast("long")
        .alias("n_rare"))


def normalize_text(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """First-stage canonicalization — the step every dedup/match key
    should agree on before anything else runs: lowercase, collapse
    whitespace runs to single spaces, trim; plus an aggressive
    alphanumeric-only ``match_text`` (punctuation → space, then the
    same collapse) for fuzzy match keys. Pure map pass, zero shuffle;
    every regex is intersection-of-dialects (same meaning to Java
    regex and RE2, the pii_scrub discipline), so both engines produce
    identical bytes.

    Returns (id, norm_text, match_text, n_chars, n_chars_norm)."""
    # explicit whitespace class, not \s: Java regex's \s includes
    # vertical tab, RE2's does not — the one dialect divergence in the
    # repo's regex discipline, spelled out per-engine instead
    ws = r"[ \t\n\r\x0B\f]+"
    lowered = F.lower(F.col(text_col))
    norm = F.trim(F.regexp_replace(lowered, ws, " "))
    match = F.trim(F.regexp_replace(
        F.regexp_replace(lowered, "[^a-z0-9 \t\n\r]", " "), ws, " "))
    return docs.select(
        F.col(id_col),
        norm.alias("norm_text"),
        match.alias("match_text"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.length(norm).cast("long").alias("n_chars_norm"))


def bm25_search(docs: DataFrame, terms: list[str], k1: float = 1.2,
                b: float = 0.75, top_k: int = 20,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """BM25 keyword retrieval for a FIXED query — the classic lexical
    relevance baseline a data-mining pipeline uses to pull topical
    documents out of a web corpus. Uses the division-only idf
    ``(N - df + 0.5) / (df + 0.5)`` (no ln(), same last-ulp rationale
    as tfidf's ratio idf).

    Scale shape: corpus statistics (N, avgdl, one df per query term)
    are ONE scalar aggregate — conditional sums in a single pass —
    folded into the plan as literals; scoring is then a zero-shuffle
    in-row pass (per-term tf from the token array, fixed-order sum of
    per-term scores, so float grouping is deterministic), and only
    the top-k sort touches an exchange. Query terms are a bounded
    literal list by construction — this is point lookup, not the
    inverted-index build (that is tfidf_top_terms' shape).

    Returns top_k rows (id, score, n_tokens) by (score desc, id)."""
    toks = tokens(F.col(text_col))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(toks)).alias("tok_total"),
        *[F.sum(F.array_contains(toks, t).cast("int")).alias(f"df_{i}")
          for i, t in enumerate(terms)]).collect()[0]
    n_docs = stats["n"]
    avgdl = stats["tok_total"] / n_docs
    dfs = {t: stats[f"df_{i}"] for i, t in enumerate(terms)}
    return _bm25_text_fold(docs, terms, dfs, n_docs, avgdl, k1, b,
                           top_k, text_col, id_col)


def _bm25_text_fold(docs: DataFrame, terms: list[str], dfs: dict,
                    n_docs: int, avgdl: float, k1: float, b: float,
                    top_k: int, text_col: str, id_col: str) -> DataFrame:
    """The zero-shuffle scoring half of :func:`bm25_search`: per-term
    tf from the token array, fixed-order sum of per-term scores (so
    float grouping is deterministic), one top-k exchange. Shared with
    the indexed road's stop-term fallback so the two roads fold the
    exact same doubles in the exact same order."""
    toks = tokens(F.col(text_col))
    dl = F.size(toks).cast("double")
    score = F.lit(0.0)
    for t in terms:
        df_t = dfs[t]
        idf = (n_docs - df_t + 0.5) / (df_t + 0.5)
        tf = F.size(F.filter(toks, lambda x: x == F.lit(t))).cast("double")
        score = score + F.lit(idf) * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * dl / F.lit(avgdl)))
    return (docs.select(F.col(id_col), score.alias("score"),
                        F.size(toks).cast("long").alias("n_tokens"))
            .orderBy(F.desc("score"), F.asc(id_col))
            .limit(top_k))


#: Doc-membership Bloom sidecar sizing (per term bucket): 2048 words
#: x 32 bits holds ~6.5k distinct docs/bucket at ~1% fpp with k=3;
#: at larger corpora the fpp degrades the SKIP RATE only, never
#: correctness (false positives read a bucket that held nothing).
_DOC_BLOOM_WORDS = 2048
_DOC_BLOOM_K = 3


def _new_gen() -> str:
    import uuid
    return f"g{uuid.uuid4().hex[:12]}"


def _doc_bloom_rows(posts: DataFrame) -> DataFrame:
    """(tbucket, word, bits) Bloom rows over the distinct (bucket,
    doc) pairs of a postings frame — shared by the index build and
    the append path (which unions its batch's rows with the prior
    generation and re-ORs)."""
    from aggregation_duckdb_spark.operators.pipeline import \
        bloom_part_rows
    return bloom_part_rows(posts.select("tbucket", "doc"), "doc",
                           "tbucket", _DOC_BLOOM_WORDS, _DOC_BLOOM_K)


def _doc_bloom_dir(path: str, meta: dict) -> str:
    from aggregation_duckdb_spark import fsio
    gen = meta.get("gen")
    return fsio._join(path, "doc_bloom", gen) if gen \
        else fsio._join(path, "doc_bloom")


def _index_frames(docs: DataFrame, num_buckets: int, text_col: str,
                  id_col: str):
    """(sized, postings) for a document frame — the index's two
    stored projections, shared by build and append. dl rides IN the
    posting row (denormalized, the way real posting lists carry
    norms): the query path then reads ONLY its terms' directories — a
    doclens join at query time would scan a corpus-sized table and
    erase the index's point."""
    toks = tokens(F.col(text_col))
    sized = docs.select(F.col(id_col).alias("doc"),
                        toks.alias("__toks"),
                        F.size(toks).cast("long").alias("dl"))
    postings = (sized.select("doc", "dl",
                             F.explode("__toks").alias("term"))
                .groupBy("term", "doc", "dl")
                .agg(F.count(F.lit(1)).alias("tf"))
                .withColumn("tbucket",
                            _term_bucket(F.col("term"), num_buckets)))
    return sized, postings


def text_index_doc_buckets(keys: DataFrame, path: str,
                           key_col: str = "doc") -> list[int] | None:
    """The term buckets that MAY hold posting rows for any of
    ``keys``, judged by the index's doc-membership Bloom sidecar —
    the doc-scoped-read primitive (round 15): a doc's purge or
    audit otherwise scans EVERY bucket, because term buckets are
    keyed by term hash, not doc. Returns None when the index predates
    the sidecar (callers then scan everything — degrade, don't
    break). Conservative by Bloom's contract: a returned bucket may
    hold nothing (false positive), a bucket NOT returned provably
    holds no posting row for any key. The probe is one join of the
    keys' k bit positions against the (bucket, word, bits) table —
    never a postings read."""
    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.operators.pipeline import \
        bloom_member_parts

    spark = keys.sparkSession
    st = fsio.read_json(spark, fsio._join(path, "stats.json"))
    db = st.get("doc_bloom")
    if not db or not fsio.exists(spark, fsio._join(path, "doc_bloom")):
        return None
    bloom = spark.read.parquet(_doc_bloom_dir(path, db))
    hits = bloom_member_parts(bloom, keys, key_col, "tbucket",
                              int(db["num_words"]), int(db["k"]))
    return sorted(int(r["tbucket"]) for r in hits.collect())


def write_text_index(docs: DataFrame, path: str, num_buckets: int = 64,
                     text_col: str = "text", id_col: str = "doc_id",
                     max_df_frac: float = 0.25) -> None:
    """Persist the lexical index behind :func:`bm25_search_indexed`:
    posting lists (term, doc, tf) partitioned by an md5 term bucket,
    per-doc lengths, and the corpus scalars as a sidecar (written
    through :mod:`fsio`, so the index lives happily on hdfs://s3a).

    The sidecar also records every STOP-CLASS term — df above
    ``max_df_frac`` of the corpus — with its exact df. That set is
    provably model-sized: Σ df = total tokens ≤ N·avgdl, so at most
    ``avgdl / max_df_frac`` terms can each exceed ``max_df_frac·N``
    (a few hundred at any corpus size — a bounded collect). The query
    path uses it to refuse corpus-sized posting reads: a stop term's
    posting directory is the one part of an inverted index that is NOT
    small, and reading it is slower than the full-scan fold it was
    meant to replace (measured: SCALE_PROBE_r06 stop-word workload)."""
    from aggregation_duckdb_spark import fsio
    spark = docs.sparkSession
    sized, postings = _index_frames(docs, num_buckets, text_col,
                                    id_col)
    (postings.withColumn("__ingest_batch", F.lit(-1))
     .write.mode("overwrite").partitionBy("tbucket", "__ingest_batch")
     .parquet(fsio._join(path, "postings")))
    posts_back = spark.read.parquet(fsio._join(path, "postings"))
    (sized.select("doc", "dl")
     .withColumn("__ingest_batch", F.lit(-1))
     .write.mode("overwrite").partitionBy("__ingest_batch")
     .parquet(fsio._join(path, "doclens")))
    # per-term-bucket DOC-membership Bloom sidecar (round 15): a doc's
    # terms hash into many buckets, so doc-keyed operations (purge,
    # doc-scoped reads) otherwise have to scan EVERY bucket's postings
    # to find the affected ones. One (bucket, word, bits) table —
    # num_buckets x _DOC_BLOOM_WORDS x 4 bytes total — lets them skip
    # buckets provably free of the victims (Bloom contract: false
    # positives only, never false negatives). Generation-named so
    # appends can replace it atomically via the stats.json flip.
    bloom_gen = _new_gen()
    (_doc_bloom_rows(posts_back)
     .write.mode("errorifexists")
     .parquet(fsio._join(path, "doc_bloom", bloom_gen)))
    # corpus scalars from the just-written doclens (one row per doc,
    # dl = token count) — NOT a third tokenize pass over the raw
    # corpus text (guide §1.2 step 1: the bytes already landed; sum
    # over nulls matches sum over size(toks) because dl IS size(toks))
    stats = (spark.read.parquet(fsio._join(path, "doclens"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("dl").alias("tt")).collect()[0])
    n_docs = int(stats["n"])
    # full (term, df) table — vocab-sized (Heaps' law), the state that
    # lets APPENDS reclassify stop terms without a corpus-sized
    # postings re-scan (round 15); generation-named like the Bloom
    dfs_gen = _new_gen()
    dfs_tbl = (posts_back.groupBy("term")
               .agg(F.count(F.lit(1)).alias("df")))
    (dfs_tbl.write.mode("errorifexists")
     .parquet(fsio._join(path, "dfs", dfs_gen)))
    dfs_back = spark.read.parquet(fsio._join(path, "dfs", dfs_gen))
    # stop-class dfs: bounded by avgdl/max_df_frac rows (see docstring)
    stop_rows = (dfs_back
                 .where(F.col("df") > F.lit(max_df_frac * n_docs))
                 .collect())
    fsio.write_json(spark, fsio._join(path, "stats.json"),
                    {"n_docs": n_docs, "tok_total": int(stats["tt"]),
                     "num_buckets": num_buckets,
                     "max_df_frac": max_df_frac,
                     "doc_bloom": {"num_words": _DOC_BLOOM_WORDS,
                                   "k": _DOC_BLOOM_K,
                                   "gen": bloom_gen},
                     "dfs_gen": dfs_gen,
                     "last_batch": -1,
                     "stop_dfs": {r["term"]: int(r["df"])
                                  for r in stop_rows}})


def append_text_index(admitted: DataFrame, path: str,
                      text_col: str = "text", id_col: str = "doc_id",
                      batch_id: int | None = None) -> None:
    """Grow the BM25 index with a batch of NEW documents (round 15 —
    the incremental-ingest parity the dedup index has had since r11):
    the batch's posting and doclen rows land under their own
    ``__ingest_batch`` partition (per-batch cost proportional to the
    BATCH; the stored corpus is never re-read), and the three derived
    aggregates update incrementally — corpus scalars by addition, the
    (term, df) table by a VOCAB-sized outer-join merge (this is why
    the table exists: stop-term reclassification without a
    corpus-sized postings re-scan), and the doc-membership Bloom by
    OR-ing the batch's rows into a fresh generation.

    Doc ids must be NEW to the index (the incremental-dedup admission
    contract) — a re-ingested id would double its posting rows, as in
    any inverted index fed duplicate documents.

    ``batch_id`` makes the append EXACTLY-ONCE for streaming ingest,
    by the same two layered mechanisms as ``dedup.append_dedup_index``
    plus one for the aggregates: ids at or below the recorded
    watermark skip outright; an uncommitted replay overwrites its own
    ``__ingest_batch=N`` partitions via dynamic partition overwrite
    (idempotent); and the aggregate update is guarded by the
    sidecar's ``last_batch`` (a crash AFTER the stats flip but before
    the watermark must not double-count on replay — stats.json is the
    atomic aggregate commit point, written before the watermark).
    Superseded dfs/doc_bloom generations are deleted after the flip;
    a crash in between leaves harmless orphan directories. Single
    writer, monotonic ids, as for every durable artifact. Without a
    ``batch_id`` (ad-hoc growth) rows land under ``-1`` in plain
    append mode — rerunning duplicates, as any blind append does."""
    from aggregation_duckdb_spark import fsio

    spark = admitted.sparkSession
    if batch_id is not None and \
            batch_id <= fsio.read_ingest_watermark(spark, path):
        return  # replayed micro-batch: already ingested, skip
    st = fsio.read_json(spark, fsio._join(path, "stats.json"))
    if "dfs_gen" not in st:
        raise ValueError(
            f"append_text_index on {path}: index predates the "
            f"appendable layout (no dfs table) — rebuild it with "
            f"write_text_index first")
    sized, postings = _index_frames(admitted, st["num_buckets"],
                                    text_col, id_col)
    part = -1 if batch_id is None else int(batch_id)
    mode = "append" if batch_id is None else "overwrite"
    with fsio.dynamic_partition_overwrite(spark):
        (postings.withColumn("__ingest_batch", F.lit(part))
         .write.mode(mode).partitionBy("tbucket", "__ingest_batch")
         .parquet(fsio._join(path, "postings")))
        (sized.select("doc", "dl")
         .withColumn("__ingest_batch", F.lit(part))
         .write.mode(mode).partitionBy("__ingest_batch")
         .parquet(fsio._join(path, "doclens")))
    if batch_id is None or st.get("last_batch", -1) < batch_id:
        if batch_id is not None:
            # exactly-once batch: its doclens partition holds exactly
            # the batch's (doc, dl) rows — aggregate those instead of
            # re-tokenizing the batch text (guide §1.2 step 1)
            agg = (spark.read.parquet(fsio._join(path, "doclens"))
                   .where(F.col("__ingest_batch") == part)
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.coalesce(F.sum("dl"), F.lit(0)).alias("tt"))
                   .collect()[0])
        else:
            # ad-hoc append: rows land in the shared -1 partition, so
            # the read-back cannot isolate the batch — aggregate the
            # input frame as before
            toks = tokens(F.col(text_col))
            agg = admitted.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(F.sum(F.size(toks)), F.lit(0)).alias("tt")
                ).collect()[0]
        n_docs = int(st["n_docs"]) + int(agg["n"])
        tok_total = int(st["tok_total"]) + int(agg["tt"])
        old_dfs = spark.read.parquet(
            fsio._join(path, "dfs", st["dfs_gen"]))
        # exactly-once batches count dfs from their just-written
        # postings partition (column-pruned term read) instead of
        # re-executing the tokenize+explode projection; ad-hoc rows
        # share the -1 partition and keep the plan-side count
        batch_dfs = ((spark.read.parquet(fsio._join(path, "postings"))
                      .where(F.col("__ingest_batch") == part))
                     if batch_id is not None else postings) \
            .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        merged = (old_dfs.withColumnRenamed("df", "__a")
                  .join(batch_dfs.withColumnRenamed("df", "__b"),
                        "term", "full_outer")
                  .select("term",
                          (F.coalesce(F.col("__a"), F.lit(0))
                           + F.coalesce(F.col("__b"), F.lit(0)))
                          .alias("df")))
        dfs_gen = _new_gen()
        (merged.write.mode("errorifexists")
         .parquet(fsio._join(path, "dfs", dfs_gen)))
        dfs_back = spark.read.parquet(fsio._join(path, "dfs", dfs_gen))
        stop_rows = (dfs_back.where(
            F.col("df") > F.lit(st["max_df_frac"] * n_docs))
            .collect())
        bloom_gen = _new_gen()
        old_bloom_meta = st.get("doc_bloom", {})
        batch_posts = (spark.read.parquet(fsio._join(path, "postings"))
                       .where(F.col("__ingest_batch") == part))
        bloom_rows = _doc_bloom_rows(batch_posts)
        if old_bloom_meta:
            prior = spark.read.parquet(
                _doc_bloom_dir(path, old_bloom_meta))
            bloom_rows = (prior.unionByName(bloom_rows)
                          .groupBy("tbucket", "word")
                          .agg(F.bit_or("bits").alias("bits")))
        (bloom_rows.write.mode("errorifexists")
         .parquet(fsio._join(path, "doc_bloom", bloom_gen)))
        new_st = dict(st)
        new_st.update({
            "n_docs": n_docs, "tok_total": tok_total,
            "dfs_gen": dfs_gen,
            "doc_bloom": {"num_words": _DOC_BLOOM_WORDS,
                          "k": _DOC_BLOOM_K, "gen": bloom_gen},
            "last_batch": part,
            "stop_dfs": {r["term"]: int(r["df"]) for r in stop_rows}})
        fsio.write_json(spark, fsio._join(path, "stats.json"), new_st)
        # reclaim superseded generations AFTER the atomic flip
        fsio.delete(spark, fsio._join(path, "dfs", st["dfs_gen"]))
        if old_bloom_meta.get("gen"):
            fsio.delete(spark, _doc_bloom_dir(path, old_bloom_meta))
    if batch_id is not None:
        fsio.commit_ingest_watermark(spark, path, batch_id)


def compact_text_index(spark, path: str) -> dict:
    """Fold the index's accumulated ``__ingest_batch`` partitions back
    into the base partition — the OPTIMIZE analogue for the inverted
    index (round 15): ten thousand streaming appends leave ten
    thousand tiny batch directories under EVERY term bucket, and scan
    cost starts tracking append count instead of data size. One
    rewrite folds them; search results are pytest-pinned identical.

    The doc-membership Bloom is REBUILT from the folded postings —
    a free side effect that also clears purge staleness (bits of
    since-purged docs), restoring full skip rates.

    Crash safety: postings and doclens are rewritten via
    write-temp-then-swap, so a complete copy exists at every instant;
    a crash between the delete and the rename leaves the full folded
    copy recoverable at ``<table>.__compact_tmp``. The ingest
    watermark is NOT touched: a replay of an already-folded batch id
    still short-circuits on it, so exactly-once survives compaction.
    Aggregate scalars, stop terms and the (term, df) table are
    invariant under folding and stay as they are."""
    from aggregation_duckdb_spark import fsio

    st = fsio.read_json(spark, fsio._join(path, "stats.json"))
    post_dir = fsio._join(path, "postings")
    dl_dir = fsio._join(path, "doclens")
    posts = spark.read.parquet(post_dir)
    if "__ingest_batch" not in posts.columns:
        return {"folded_batches": 0}
    batches = [int(r[0]) for r in
               posts.select("__ingest_batch").distinct().collect()]
    if len(batches) <= 1:
        return {"folded_batches": 0}

    def swap(table_dir, folded, part_cols):
        tmp = table_dir.rstrip("/") + ".__compact_tmp"
        fsio.delete(spark, tmp)
        (folded.write.mode("errorifexists").partitionBy(*part_cols)
         .parquet(tmp))
        fsio.delete(spark, table_dir)
        if not fsio.rename(spark, tmp, table_dir):
            raise RuntimeError(
                f"compact_text_index: rename from {tmp} failed — the "
                f"complete folded table is intact there; move it into "
                f"place and re-run")

    swap(post_dir,
         posts.withColumn("__ingest_batch", F.lit(-1)),
         ["tbucket", "__ingest_batch"])
    dl = spark.read.parquet(dl_dir)
    swap(dl_dir, dl.withColumn("__ingest_batch", F.lit(-1)),
         ["__ingest_batch"])
    report = {"folded_batches": len(batches)}
    if st.get("doc_bloom"):
        old_meta = st["doc_bloom"]
        gen = _new_gen()
        (_doc_bloom_rows(spark.read.parquet(post_dir))
         .write.mode("errorifexists")
         .parquet(fsio._join(path, "doc_bloom", gen)))
        st = dict(st)
        st["doc_bloom"] = {"num_words": _DOC_BLOOM_WORDS,
                           "k": _DOC_BLOOM_K, "gen": gen}
        fsio.write_json(spark, fsio._join(path, "stats.json"), st)
        if old_meta.get("gen"):
            fsio.delete(spark, _doc_bloom_dir(path, old_meta))
        report["doc_bloom_rebuilt"] = True
    return report


def _term_bucket(term, num_buckets: int):
    from aggregation_duckdb_spark.operators.pipeline import SPLIT_BUCKETS
    h = F.md5(F.concat(F.lit("tix|"), term))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % SPLIT_BUCKETS % num_buckets)


def _term_bucket_py(term: str, num_buckets: int) -> int:
    import hashlib
    h = hashlib.md5(f"tix|{term}".encode()).hexdigest()
    return int(h[:8], 16) % 10_000 % num_buckets


def bm25_search_indexed(spark, path: str, terms: list[str],
                        k1: float = 1.2, b: float = 0.75,
                        top_k: int = 20, docs: DataFrame | None = None,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """BM25 against the persisted inverted index: reads ONLY the query
    terms' posting-list directories (term-bucket partition pruning —
    the Z-order/IVF mechanism applied to text) and reproduces
    :func:`bm25_search`'s scores bit-for-bit: a term with tf=0
    contributes an exact +0.0 to the live fold, so folding only
    MATCHED terms in the same term order gives the identical double.

    Stop-term guard: a query term recorded in the sidecar's stop set
    (df above the build-time ``max_df_frac``) has a CORPUS-SIZED
    posting directory — reading and pivoting it is slower than the
    full-scan fold it was meant to replace. Such queries route to
    :func:`_bm25_text_fold` over ``docs`` (pass the corpus frame for
    workloads that may contain stop terms), reusing the sidecar's
    N/avgdl and every df — no stats pass, half the live road's work —
    and never read a stop term's postings. Scores stay bit-identical
    (same fold, same doubles). Without ``docs`` the guard can only
    degrade gracefully: it reads the big directory and stays correct.

    Underfull-match padding: when fewer than ``top_k`` documents match
    any term, the tail is filled from the doclens table with exact
    +0.0 scores ordered by doc id — the precise tail the live road
    produces — so the two roads agree at every ``top_k``, not just
    below the match count. The padding scan only runs when the match
    count actually falls short (a bounded ``limit`` probe)."""
    from aggregation_duckdb_spark import fsio
    st = fsio.read_json(spark, fsio._join(path, "stats.json"))
    n_docs, avgdl = st["n_docs"], st["tok_total"] / st["n_docs"]
    stop_dfs = st.get("stop_dfs", {})
    hot = [t for t in terms if t in stop_dfs]
    if hot and docs is not None:
        cold = [t for t in terms if t not in stop_dfs]
        dfs = dict(stop_dfs)
        if cold:
            cold_buckets = sorted({_term_bucket_py(t, st["num_buckets"])
                                   for t in cold})
            cold_posts = (
                spark.read.parquet(fsio._join(path, "postings"))
                .where(F.col("tbucket").isin(cold_buckets)
                       & F.col("term").isin(cold)))
            found = {r["term"]: r["df"] for r in
                     cold_posts.groupBy("term")
                     .agg(F.count(F.lit(1)).alias("df")).collect()}
            dfs.update({t: found.get(t, 0) for t in cold})
        return _bm25_text_fold(docs, terms, dfs, n_docs, avgdl, k1, b,
                               top_k, text_col, id_col)
    buckets = sorted({_term_bucket_py(t, st["num_buckets"])
                      for t in terms})
    posts = (spark.read.parquet(fsio._join(path, "postings"))
             .where(F.col("tbucket").isin(buckets)
                    & F.col("term").isin(list(terms))))
    # per-term df: bounded collect (len(terms) values)
    dfs = {r["term"]: r["df"] for r in
           posts.groupBy("term")
           .agg(F.count_distinct("doc").alias("df")).collect()}
    scored = posts.groupBy("doc").agg(
        F.max("dl").alias("dl"),
        *[F.max(F.when(F.col("term") == t, F.col("tf")))
          .alias(f"__tf_{i}") for i, t in enumerate(terms)])
    if len(scored.limit(top_k).collect()) < top_k:
        # underfull match set: give unmatched docs their live-road rows
        # (tf=0 for every term; the fold below turns that into the
        # exact +0.0 the live scan computes)
        doclens = spark.read.parquet(fsio._join(path, "doclens"))
        pad = (doclens.join(scored.select("doc"), "doc", "left_anti")
               .select("doc", "dl",
                       *[F.lit(None).cast("long").alias(f"__tf_{i}")
                         for i in range(len(terms))]))
        scored = scored.unionByName(pad)
    dl = F.col("dl").cast("double")
    score = F.lit(0.0)
    for t in terms:
        df_t = dfs.get(t, 0)
        idf = (n_docs - df_t + 0.5) / (df_t + 0.5)
        tf = F.coalesce(F.col(f"__tf_{terms.index(t)}"),
                        F.lit(0)).cast("double")
        score = score + F.lit(idf) * (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * dl / F.lit(avgdl)))
    return (scored.select(F.col("doc").alias("doc_id"),
                          score.alias("score"),
                          F.col("dl").alias("n_tokens"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(top_k))


def bpe_fit_merges(docs: DataFrame, num_merges: int = 200,
                   text_col: str = "text", id_col: str = "doc_id",
                   fit_sample_cap: int | None = 20_000,
                   max_vocab_words: int = 30_000) -> DataFrame:
    """Learn a BPE merge table from the corpus — the REAL merge-loop
    trainer (round 14; closes the "pre-tokenizer counts only" gap):
    repeatedly merge the most frequent adjacent symbol pair, starting
    from codepoints, exactly the Sennrich/GPT-2 training procedure.

    Scale shape (the codebook-fit pattern): ONE distributed pass
    reduces the corpus to a (word, count) frequency table — the only
    state BPE training ever needs — bounded by ``max_vocab_words``
    (top counts, deterministic ties) over an md5-sampled
    ``fit_sample_cap`` subset; the merge loop then runs driver-side
    over that model-sized dict, like sentencepiece/HF trainers, which
    also train from an in-memory word-frequency table. Applying the
    merges is the corpus-sized job (:func:`bpe_encode`), fitting is
    not. Fully deterministic: ties on pair frequency break to the
    lexicographically smallest (left, right).

    Returns (rank long, left string, right string): merge `rank`
    replaces adjacent (left, right) with left||right; lower rank =
    higher priority (learned earlier)."""
    from aggregation_duckdb_spark.operators.similarity import md5_sample

    spark = docs.sparkSession
    base = docs
    if fit_sample_cap is not None:
        base = md5_sample(base, fit_sample_cap, id_col)
    # bounded collect: at most max_vocab_words (word, count) rows —
    # Zipf means the dropped tail carries negligible pair mass. The
    # truncation must not be SILENT, though: a heavy-tailed corpus
    # (near-unique words) would mistrain quietly, so the dropped
    # word-mass fraction is measured and warned about when material.
    wc_df = (base.select(F.explode(
            F.regexp_extract_all(F.col(text_col),
                                 F.lit(BPE_TOKEN_PATTERN), F.lit(0)))
          .alias("w"))
          .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    totals = wc_df.agg(
        F.count(F.lit(1)).alias("nw"),
        F.coalesce(F.sum("c"), F.lit(0)).alias("mass")).collect()[0]
    wc = (wc_df.orderBy(F.desc("c"), F.asc("w"))
          .limit(max_vocab_words)
          .collect())
    if int(totals["nw"]) > len(wc):
        import warnings
        kept = sum(int(r["c"]) for r in wc)
        dropped_frac = 1.0 - kept / max(1, int(totals["mass"]))
        if dropped_frac > 0.05:     # Zipf-normal truncation is fine;
            warnings.warn(          # a heavy tail is not
                f"bpe_fit_merges: word-frequency table truncated to "
                f"{len(wc)} of {int(totals['nw'])} distinct words — "
                f"{dropped_frac:.1%} of the sampled token mass "
                f"dropped; raise max_vocab_words if this corpus's "
                f"tail matters", stacklevel=2)
    words: dict[tuple[str, ...], int] = {}
    for r in wc:
        k = tuple(r["w"])
        words[k] = words.get(k, 0) + int(r["c"])
    merges: list[tuple[int, str, str]] = []
    for rank in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        (left, right), _ = min(pairs.items(),
                               key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right))
        merged = left + right
        new_words: dict[tuple[str, ...], int] = {}
        for syms, c in words.items():
            out: list[str] = []
            i = 0
            while i < len(syms):                 # all occurrences,
                if (i < len(syms) - 1            # left-to-right
                        and syms[i] == left and syms[i + 1] == right):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + c
        words = new_words
    return spark.createDataFrame(
        merges, "rank long, left string, right string")


def bpe_encode(docs: DataFrame, merges: DataFrame,
               text_col: str = "text", id_col: str = "doc_id",
               batch_merges: bool = False) -> DataFrame:
    """Apply a BPE merge table: pre-tokenize JVM-side
    (:data:`BPE_TOKEN_PATTERN` via ``regexp_extract_all`` — Java and
    RE2 agree on this alternation, so the oracle pre-tokenizes
    identically), then fold merges over each word's codepoints.

    Default merge application spec (deterministic, shared by the
    engine, the DuckDB recursive-CTE oracle, and the pure-Python
    pytest reference): repeatedly pick the adjacent pair with the
    LOWEST merge rank — leftmost occurrence on rank ties — merge that
    ONE occurrence, repeat until no adjacent pair is in the table.
    This one-occurrence-at-a-time greedy is the textbook BPE
    application; it differs from HF's merge-all-occurrences batching
    only in the rare case where the merged symbol immediately forms a
    lower-ranked pair than the remaining occurrences of the current
    bigram — a spec choice, pinned by tests either way.

    ``batch_merges=True`` selects the HF/GPT-2-parity spec instead
    (round 15): per iteration, pick the lowest-ranked pair PRESENT,
    then merge ALL its occurrences in one left-to-right overlap-
    skipping pass before re-evaluating — exactly the reference
    ``tokenizers``/GPT-2 ``bpe()`` loop. Use this mode when token
    counts must budget against a real GPT-2/LLaMA-family tokenizer
    (e.g. feeding ``pipeline.pack_sequences``, whose budgets assume
    whatever spec produced ``n_tokens``); the two specs are pinned
    against each other on a crafted divergence case in
    test_extensions. (Both modes are codepoint-level — byte-level
    pre-mapping is out of scope and documented as such.)

    Scale shape: the merge table is MODEL-sized (bounded like the IVF
    codebooks) — collected once, closed over by an Arrow-batched
    pandas UDF; the encode is a ZERO-SHUFFLE map pass over the corpus
    (no explode, no join; the sanctioned Arrow extension path, SURVEY
    §2.8), with a per-batch word→tokens memo so the Zipf head of the
    vocabulary encodes once per executor, not once per occurrence.

    Returns (id, tokens array<string>, n_tokens long)."""
    # pandas is NOT a module-level dependency (every other text
    # operator is JVM-only); the UDF's postponed `pd.Series`
    # annotations resolve through MODULE globals, so the lazy import
    # is published there on first use
    import pandas as pd
    globals().setdefault("pd", pd)

    ranks: dict[tuple[str, str], int] = {
        (r["left"], r["right"]): int(r["rank"])
        for r in merges.collect()}   # model-sized, like ivf_assign

    @F.pandas_udf("array<string>")
    def _enc(words: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            t = memo.get(w)
            if t is None:
                syms = list(w)
                while len(syms) > 1:
                    best_rank, best_i = None, -1
                    for i in range(len(syms) - 1):
                        rk = ranks.get((syms[i], syms[i + 1]))
                        if rk is not None and (best_rank is None
                                               or rk < best_rank):
                            best_rank, best_i = rk, i
                    if best_rank is None:
                        break
                    if batch_merges:
                        # HF/GPT-2 spec: ALL occurrences of the
                        # chosen pair, left-to-right, skip overlaps
                        left = syms[best_i]
                        right = syms[best_i + 1]
                        out: list[str] = []
                        i = 0
                        while i < len(syms):
                            if (i < len(syms) - 1 and syms[i] == left
                                    and syms[i + 1] == right):
                                out.append(left + right)
                                i += 2
                            else:
                                out.append(syms[i])
                                i += 1
                        syms = out
                    else:
                        syms[best_i:best_i + 2] = [
                            syms[best_i] + syms[best_i + 1]]
                t = memo[w] = syms
            return t

        out = []
        for ws in words:
            toks: list[str] = []
            for w in (ws if ws is not None else []):
                toks.extend(enc_word(w))
            out.append(toks)
        return pd.Series(out)

    pre = F.regexp_extract_all(F.col(text_col),
                               F.lit(BPE_TOKEN_PATTERN), F.lit(0))
    # stage the UDF output before deriving from it: one Arrow pass,
    # not one per downstream expression
    staged = docs.select(F.col(id_col), _enc(pre).alias("tokens"))
    return staged.select(
        F.col(id_col), F.col("tokens"),
        F.size("tokens").cast("long").alias("n_tokens"))


def maintain_text_index(spark, path: str, max_batches: int = 8) -> dict:
    """One-call index maintenance policy — the ``maintain_zordered``
    shape for the inverted index: a scheduled job calls this after
    every ingest wave; it reads the per-batch partition count from the
    doclens DIRECTORY LISTING (metadata-only, no Spark job) and folds
    via :func:`compact_text_index` only once batches pile past
    ``max_batches``. A healthy index costs one listing and does
    nothing. Returns {"compacted", "batches", ...fold report}."""
    from aggregation_duckdb_spark import fsio
    batches = fsio.ingest_batches(spark, fsio._join(path, "doclens"))
    if len(batches) <= max_batches:
        return {"compacted": False, "batches": len(batches)}
    rep = compact_text_index(spark, path)
    return {"compacted": True, "batches": len(batches), **rep}
