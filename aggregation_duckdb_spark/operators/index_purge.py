"""Right-to-be-forgotten for DERIVED index artifacts (round 14).

``layout.purge_zordered_keys`` proves table-level erasure, but a
document also leaves traces in every index built FROM it: the dedup
index stores its content hashes and shingle sets, the BM25 index its
posting rows, the IVF index its raw embedding inside a cell file, the
PQ index its quantized codes. A real GDPR pipeline must compose the
table purge with index purges — these verbs are that composition,
one per stored-index family, all sharing the same contract as the
table verb: anti-join rewrite of ONLY the affected partitions, then a
raw re-read verification sweep that RAISES unless zero retained rows
still match.

Aggregate-model caveats (the layout.py Bloom rule, stated per family):

- **Bloom sidecars / count-min rows** are one-way hash bits — not
  recoverable values; rebuild if policy counts membership bits.
- **IVF centroids / PQ codebooks** are aggregate model parameters
  (means over many vectors). They are not per-row content and are NOT
  rewritten here; re-fit the codebook if policy counts a vector's
  influence on a mean as a trace.
- **BM25 corpus scalars** (n_docs, tok_total, stop-class dfs) are
  aggregate counts; :func:`purge_text_index_keys` RECOMPUTES them
  from the rewritten tables so scoring stays consistent post-purge.

Scale shape: cost tracks the affected partitions, never index
history. Dedup/PQ tables partition by ``__ingest_batch`` — erasing a
batch's docs rewrites that batch's partitions only. IVF cells
partition by (centroid_id, batch) — only the victims' cells rewrite.
BM25 postings partition by TERM bucket, so a doc's erasure touches
every bucket its terms hash into (documented: posting lists are the
one index where doc-keyed pruning does not exist — the same reason a
stop term's posting directory is corpus-sized)."""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession, functions as F

from aggregation_duckdb_spark import fsio
from aggregation_duckdb_spark.runtime import (
    broadcast_if_counted, materialize)


def _purge_parquet_table(spark: SparkSession, table_dir: str,
                         id_col: str, keys: DataFrame,
                         part_cols: list[str],
                         n_keys: int | None = None,
                         candidate_parts: list[tuple] | None = None,
                         candidate_cols: list[str] | None = None)\
        -> dict:
    """Anti-join rewrite of one parquet table: affected partitions are
    found with a column-pruned semi-join (bounded collect — partition
    tuples, not rows), survivors are MATERIALIZED before the dynamic
    partition overwrite (breaks lineage to the files being replaced —
    Spark refuses to overwrite a path its own plan still reads), and
    partitions left with ZERO survivors are deleted explicitly
    (dynamic overwrite only replaces partitions PRESENT in the write —
    an emptied partition would otherwise silently retain its files,
    exactly the leak this verb exists to prevent).

    The doomed key set scales with USER input (a bulk GDPR wave), so
    its broadcasts are count-gated (``n_keys`` — the callers already
    counted it for their reports); over the gate the joins demote to
    shuffles, never a forced OOM broadcast.

    A non-partitioned table first short-circuits on a semi-join hit
    probe (zero matches must cost a scan, not a rewrite), then
    rewrites via write-temp-then-rename: the survivor write reads the
    ORIGINAL files (no materialize needed — lineage stays valid), and
    a full copy of the data exists at every instant; a crash between
    the delete and the rename leaves the complete survivor set
    recoverable at ``<dir>.__purge_tmp``.

    ``candidate_parts`` (when a sidecar can prove it — the BM25
    doc-membership Bloom) bounds the AFFECTED-PARTITION SCAN to the
    listed tuples over ``candidate_cols`` (default: ``part_cols`` —
    pass a PREFIX of the partition columns when the sidecar's
    knowledge is coarser, e.g. term buckets but not ingest batches):
    the semi-join that finds victims reads only candidate directories
    (plan-literal partition pruning), so a sparse purge's cost tracks
    the victims' buckets, not the index. Must be conservative
    (superset of the true hit set) — Bloom's no-false-negative
    contract."""
    df = spark.read.parquet(table_dir)
    kb = broadcast_if_counted(keys, known_rows=n_keys)
    scan = df
    if candidate_parts is not None and part_cols:
        ccols = candidate_cols or part_cols
        if not candidate_parts:
            return {"rewritten_partitions": 0, "deleted_partitions": 0,
                    "scanned_partitions": 0}
        if len(ccols) == 1:
            scan = df.where(F.col(ccols[0]).isin(
                [c[0] for c in candidate_parts]))
        else:
            conds = None
            for h in candidate_parts:
                c = F.lit(True)
                for col, v in zip(ccols, h):
                    c = c & (F.col(col) == F.lit(v))
                conds = c if conds is None else (conds | c)
            scan = df.where(conds)
    if not part_cols:
        if not df.join(kb, id_col, "semi").limit(1).count():
            return {"rewritten_partitions": 0, "deleted_partitions": 0}
        tmp = table_dir.rstrip("/") + ".__purge_tmp"
        fsio.delete(spark, tmp)
        (df.join(kb, id_col, "left_anti")
         .write.mode("errorifexists").parquet(tmp))
        fsio.delete(spark, table_dir)
        if not fsio.rename(spark, tmp, table_dir):
            raise RuntimeError(
                f"purge rewrite of {table_dir}: rename from {tmp} "
                f"failed — the complete survivor set is intact there; "
                f"move it into place and re-run")
        return {"rewritten_partitions": 1, "deleted_partitions": 0}
    hits = [tuple(r[c] for c in part_cols)
            for r in (scan.join(kb, id_col, "semi")
                      .select(*part_cols).distinct().collect())]
    out_extra = {} if candidate_parts is None else \
        {"scanned_partitions": len(candidate_parts)}
    if not hits:
        return {"rewritten_partitions": 0, "deleted_partitions": 0,
                **out_extra}
    if len(part_cols) == 1:
        sub = df.where(F.col(part_cols[0]).isin([h[0] for h in hits]))
    elif len(hits) <= 64:
        # OR of per-tuple conjunctions — still a plan-literal filter
        # Catalyst can push to partition pruning
        conds = None
        for h in hits:
            c = F.lit(True)
            for col, v in zip(part_cols, h):
                c = c & (F.col(col) == F.lit(v))
            conds = c if conds is None else (conds | c)
        sub = df.where(conds)
    else:
        # hundreds of (cell, batch) victims: a broadcast semi-join on
        # the partition tuple beats an unboundedly deep OR expression
        spark_ = df.sparkSession
        hit_df = spark_.createDataFrame(
            [tuple(h) for h in hits],
            df.select(*part_cols).schema)
        sub = df.join(F.broadcast(hit_df), part_cols, "semi")
    survivors = materialize(
        sub.join(kb, id_col, "left_anti"))
    kept = {tuple(r[c] for c in part_cols)
            for r in survivors.select(*part_cols).distinct().collect()}
    emptied = [h for h in hits if h not in kept]
    if len(emptied) < len(hits):
        with fsio.dynamic_partition_overwrite(spark):
            (survivors.write.mode("overwrite")
             .partitionBy(*part_cols).parquet(table_dir))
    for h in emptied:
        sub = table_dir
        for c, v in zip(part_cols, h):
            sub = fsio._join(sub, f"{c}={v}")
        fsio.delete(spark, sub)
    return {"rewritten_partitions": len(hits) - len(emptied),
            "deleted_partitions": len(emptied), **out_extra}


def _verify_clean(spark: SparkSession, verb: str, table_dir: str,
                  id_col: str, keys: DataFrame,
                  n_keys: int | None = None) -> None:
    """Raw re-read residual sweep — the raise-unless-clean contract
    shared with ``layout.purge_zordered_keys``. Only the two
    provably-empty cases short-circuit to 'clean' (directory gone, or
    present but holding no parquet after every partition emptied); a
    transient FS/permission/read failure PROPAGATES — reporting a
    failed sweep as verified erasure is the one lie this verb must
    never tell."""
    if not fsio.exists(spark, table_dir):
        return                      # table emptied entirely: clean
    try:
        raw = spark.read.parquet(table_dir)
    except AnalysisException:
        # dir survives but holds no parquet (every partition deleted)
        return
    residual = raw.join(
        broadcast_if_counted(keys, known_rows=n_keys),
        id_col, "semi").count()
    if residual:
        raise RuntimeError(
            f"{verb} on {table_dir}: {residual} residual row(s) still "
            f"match the purged keys after the rewrite — a concurrent "
            f"append may have re-landed them mid-purge; re-run")


def _keys(keys_df: DataFrame, key_col: str, id_col: str) -> DataFrame:
    return (keys_df.select(F.col(key_col).alias(id_col))
            .distinct())


def purge_dedup_index_keys(doomed_docs: DataFrame, path: str,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> dict:
    """Erase documents from a ``dedup.write_dedup_index`` artifact:
    shingle sets and band-bucket rows rewrite by doc id; the content
    HASH table stores anonymous distinct md5 VALUES (no doc
    attribution — ``corpus_dedup_projections``), so the doomed docs'
    hashes are computed from their TEXT (``doomed_docs`` must carry
    it — purge the index BEFORE or alongside the source table, while
    the content is still addressable) under the index's stored
    ``normalize`` parameter. Every table raw-verifies clean.

    Contract note: if a SURVIVING document carries byte-identical
    content to a purged one, its shared hash row is removed too
    (the table cannot attribute hashes) — future ingests of that
    content will be admitted once more; re-append the survivors or
    rebuild if exact-dedup admission of such content matters.

    The per-batch membership Blooms stay stale-conservative after a
    purge (victim bits remain set — false positives only, the same
    rule as the table verb's Bloom sidecars); rebuild the index to
    restore full skip rates after heavy erasure churn."""
    spark = doomed_docs.sparkSession
    p = fsio.read_json(spark, fsio._join(path, "params.json"))
    t = F.col(text_col)
    hashes = (doomed_docs.select(
        (F.md5(F.lower(t)) if p.get("normalize", True) else F.md5(t))
        .alias("__h")).distinct())
    keys = _keys(doomed_docs, id_col, "doc")
    n = keys.count()
    report: dict = {"purged_keys": n, "residual_matches": 0}
    # per-batch membership Blooms (round 15): a sparse purge scans
    # only the batches that MAY hold the victims — doc Bloom for the
    # doc-keyed tables, hash Bloom for the anonymous hash table
    # (byte-identical content in another batch shares the hash, so
    # doc membership alone cannot prune it). Legacy indexes without
    # blooms scan every batch, as before.
    doc_cand = hash_cand = None
    bl = p.get("blooms")
    if bl:
        from aggregation_duckdb_spark.operators.pipeline import \
            bloom_member_parts
        w, k = int(bl["num_words"]), int(bl["k"])
        doc_cand = [(int(r["__ingest_batch"]),) for r in
                    bloom_member_parts(
                        spark.read.parquet(
                            fsio._join(path, "doc_bloom")),
                        keys, "doc", "__ingest_batch", w, k
                    ).collect()]
        hash_cand = [(int(r["__ingest_batch"]),) for r in
                     bloom_member_parts(
                         spark.read.parquet(
                             fsio._join(path, "hash_bloom")),
                         hashes, "__h", "__ingest_batch", w, k
                     ).collect()]
        report["bloom_candidate_batches"] = {
            "docs": len(doc_cand), "hashes": len(hash_cand)}
    else:
        report["bloom_candidate_batches"] = None
    d = fsio._join(path, "hashes")
    report["hashes"] = _purge_parquet_table(
        spark, d, "__h", hashes, ["__ingest_batch"], n_keys=n,
        candidate_parts=hash_cand)
    _verify_clean(spark, "purge_dedup_index_keys", d, "__h", hashes,
                  n_keys=n)
    for name in ("shingles", "buckets"):
        d = fsio._join(path, name)
        report[name] = _purge_parquet_table(
            spark, d, "doc", keys, ["__ingest_batch"], n_keys=n,
            candidate_parts=doc_cand)
        _verify_clean(spark, "purge_dedup_index_keys", d, "doc", keys,
                      n_keys=n)
    return report


def purge_text_index_keys(keys_df: DataFrame, path: str,
                          key_col: str = "doc_id") -> dict:
    """Erase documents from a ``text.write_text_index`` artifact:
    posting rows and doc-length rows rewrite and raw-verify clean;
    the corpus scalars sidecar (n_docs, tok_total, stop-class dfs —
    aggregate counts, not content) is RECOMPUTED from the rewritten
    tables so ``bm25_search_indexed`` keeps scoring consistently
    post-purge.

    Bucket pruning (round 15): a doc's terms hash into many buckets,
    so the victim-bucket search is bounded by the index's
    doc-membership Bloom sidecar when present
    (``text.text_index_doc_buckets``) — a sparse purge scans only the
    buckets that MAY hold the victims instead of every posting
    directory. The Bloom is stale-conservative after a purge (victim
    bits stay set — false positives only); rebuild the index to
    restore full skip rates after heavy erasure churn."""
    from aggregation_duckdb_spark.operators.text import \
        text_index_doc_buckets

    spark = keys_df.sparkSession
    keys = _keys(keys_df, key_col, "doc")
    n = keys.count()
    report: dict = {"purged_keys": n, "residual_matches": 0}
    old = fsio.read_json(spark, fsio._join(path, "stats.json"))
    cand = text_index_doc_buckets(keys, path, key_col="doc")
    report["bloom_candidate_buckets"] = \
        None if cand is None else len(cand)
    post_dir = fsio._join(path, "postings")
    # postings partition by (tbucket, __ingest_batch) since the
    # appendable layout (round 15); older flat layouts partition by
    # tbucket alone — detect from the schema and purge either
    pdf_cols = spark.read.parquet(post_dir).columns
    post_parts = ["tbucket", "__ingest_batch"] \
        if "__ingest_batch" in pdf_cols else ["tbucket"]
    report["postings"] = _purge_parquet_table(
        spark, post_dir, "doc", keys, post_parts, n_keys=n,
        candidate_parts=None if cand is None
        else [(b,) for b in cand],
        candidate_cols=["tbucket"])
    _verify_clean(spark, "purge_text_index_keys", post_dir, "doc",
                  keys, n_keys=n)
    dl_dir = fsio._join(path, "doclens")
    dl_parts = ["__ingest_batch"] \
        if "__ingest_batch" in spark.read.parquet(dl_dir).columns \
        else []
    report["doclens"] = _purge_parquet_table(
        spark, dl_dir, "doc", keys, dl_parts, n_keys=n)
    _verify_clean(spark, "purge_text_index_keys", dl_dir, "doc", keys,
                  n_keys=n)
    # recompute the aggregate sidecar from what actually remains
    dl = spark.read.parquet(dl_dir)
    stats = dl.agg(F.count(F.lit(1)).alias("n"),
                   F.coalesce(F.sum("dl"), F.lit(0)).alias("tt")
                   ).collect()[0]
    n_docs = int(stats["n"])
    dfs_tbl = (spark.read.parquet(post_dir)
               .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
               ) if n_docs else None
    new_stats = {"n_docs": n_docs, "tok_total": int(stats["tt"]),
                 "num_buckets": old["num_buckets"],
                 "max_df_frac": old["max_df_frac"]}
    if "dfs_gen" in old and dfs_tbl is not None:
        # the appendable layout's (term, df) table re-derives from the
        # rewritten postings (a purge is rare; appends stay vocab-
        # bounded) — new generation, flip, then reclaim the old
        from aggregation_duckdb_spark.operators.text import _new_gen
        gen = _new_gen()
        dfs_tbl.write.mode("errorifexists").parquet(
            fsio._join(path, "dfs", gen))
        dfs_tbl = spark.read.parquet(fsio._join(path, "dfs", gen))
        new_stats["dfs_gen"] = gen
        if "last_batch" in old:
            new_stats["last_batch"] = old["last_batch"]
    stop_rows = (dfs_tbl
                 .where(F.col("df") > F.lit(old["max_df_frac"]
                                            * n_docs))
                 .collect()) if dfs_tbl is not None else []
    new_stats["stop_dfs"] = {r["term"]: int(r["df"])
                             for r in stop_rows}
    if "doc_bloom" in old:     # sidecar survives (stale-conservative)
        new_stats["doc_bloom"] = old["doc_bloom"]
    fsio.write_json(spark, fsio._join(path, "stats.json"), new_stats)
    if "dfs_gen" in old and new_stats.get("dfs_gen") \
            and new_stats["dfs_gen"] != old["dfs_gen"]:
        fsio.delete(spark, fsio._join(path, "dfs", old["dfs_gen"]))
    report["stats_recomputed"] = True
    return report


def purge_ivf_index_keys(keys_df: DataFrame, path: str,
                         key_col: str = "vec_id") -> dict:
    """Erase vectors from a ``similarity.write_ivf_index`` artifact:
    cell rows carry the RAW embedding, so only the victims' (cell,
    batch) partitions rewrite, then the cells table raw-verifies
    clean. The codebook is NOT rewritten — centroids are aggregate
    model parameters (means over many vectors, the Bloom-bit rule);
    re-fit via ``maintain_ivf_index``/``kmeans_fit`` if policy counts
    a vector's influence on a mean as a trace (reported via
    ``codebook_retained``)."""
    spark = keys_df.sparkSession
    keys = _keys(keys_df, key_col, "vec_id")
    n = keys.count()
    d = fsio._join(path, "cells")
    rep = _purge_parquet_table(spark, d, "vec_id", keys,
                               ["centroid_id", "__ingest_batch"],
                               n_keys=n)
    _verify_clean(spark, "purge_ivf_index_keys", d, "vec_id", keys,
                  n_keys=n)
    return {"purged_keys": n, "residual_matches": 0, "cells": rep,
            "codebook_retained": True}


def purge_pq_index_keys(keys_df: DataFrame, path: str,
                        key_col: str = "vec_id") -> dict:
    """Erase vectors from a ``similarity.write_pq_index`` artifact:
    code rows are derived content (the quantized embedding — a few
    bytes that still reconstruct an approximation), so the victims'
    batch partitions rewrite and raw-verify clean. Codebooks retained
    under the same aggregate-model rule as IVF centroids."""
    spark = keys_df.sparkSession
    keys = _keys(keys_df, key_col, "vec_id")
    n = keys.count()
    d = fsio._join(path, "codes")
    rep = _purge_parquet_table(spark, d, "vec_id", keys,
                               ["__ingest_batch"], n_keys=n)
    _verify_clean(spark, "purge_pq_index_keys", d, "vec_id", keys,
                  n_keys=n)
    return {"purged_keys": n, "residual_matches": 0, "codes": rep,
            "codebook_retained": True}


def forget_keys(doomed: DataFrame, *,
                table_path: str | None = None,
                table_key_cols: list[str] | None = None,
                dedup_index: str | None = None,
                text_index: str | None = None,
                ivf_index: str | None = None,
                pq_index: str | None = None,
                id_col: str = "doc_id",
                text_col: str = "text",
                vec_key_col: str | None = None,
                files_per_bucket: int = 1) -> dict:
    """The one-call right-to-be-forgotten orchestrator: compose the
    table purge (``layout.purge_zordered_keys``) with every derived
    index family's purge in the ONE order that is always safe —
    **indexes first, table last** — and return a single unified
    report. Each constituent verb keeps its own raise-unless-clean
    contract, so returning at all means every artifact raw-verified
    clean.

    Why the ordering is load-bearing: the dedup index's hash table
    stores anonymous content MD5s (no doc attribution), so erasing a
    doc's hash requires its TEXT. When ``doomed`` does not carry
    ``text_col``, it is resolved from the (not-yet-purged) table;
    purging the table first would make that content unaddressable —
    this verb detects exactly that state (dedup-indexed doc ids whose
    text is no longer resolvable) and RAISES with guidance instead of
    reporting a silently partial erasure.

    ``doomed`` must carry ``id_col`` (and ``table_key_cols``, if the
    table is keyed differently); ``vec_key_col`` defaults to
    ``id_col`` for the IVF/PQ artifacts. Pass only the artifacts that
    exist — omitted ones are skipped and reported ``None``.

    Scale shape: inherits each constituent verb's bounds — victim
    partitions only, count-gated key broadcasts, no unbounded
    collects. The doomed TEXT is materialized once (bounded by the
    doomed set) so the dedup purge never re-reads the table after
    later steps mutate it."""
    from aggregation_duckdb_spark.sources import layout as L

    spark = doomed.sparkSession
    keys = doomed.select(id_col).distinct()
    n = keys.count()
    report: dict = {"purged_keys": n, "residual_matches": 0,
                    "order": [], "table": None, "dedup_index": None,
                    "text_index": None, "ivf_index": None,
                    "pq_index": None}
    if dedup_index is not None:
        d_docs = doomed
        if text_col not in doomed.columns:
            if table_path is None:
                raise ValueError(
                    "forget_keys: purging a dedup index needs the "
                    f"doomed documents' '{text_col}' (its hash table "
                    "stores anonymous content hashes) — pass it on "
                    "`doomed`, or pass `table_path` so it can be "
                    "resolved from the table before the table purge")
            d_docs = materialize(
                L.read_zordered(spark, table_path)
                .join(broadcast_if_counted(keys, known_rows=n),
                      id_col, "semi")
                .select(id_col, text_col))
            # ids the dedup index STILL holds but whose text is no
            # longer addressable — the table-purged-first mistake
            sh = (spark.read.parquet(fsio._join(dedup_index,
                                                "shingles"))
                  .select(F.col("doc").alias(id_col)).distinct()
                  .join(broadcast_if_counted(keys, known_rows=n),
                        id_col, "semi"))
            orphans = (sh.join(d_docs.select(id_col), id_col,
                               "left_anti").limit(5)
                       .collect())
            if orphans:
                raise RuntimeError(
                    "forget_keys: dedup-indexed doc id(s) "
                    f"{sorted(r[id_col] for r in orphans)} have no "
                    f"resolvable '{text_col}' in {table_path} — was "
                    "the table purged BEFORE this call? forget_keys "
                    "must run while the content is still addressable "
                    "(indexes purge first, table last); re-supply "
                    "the purged documents' text on `doomed` to "
                    "finish erasing the dedup index")
        report["dedup_index"] = purge_dedup_index_keys(
            d_docs, dedup_index, text_col=text_col, id_col=id_col)
        report["order"].append("dedup_index")
    if text_index is not None:
        report["text_index"] = purge_text_index_keys(
            keys, text_index, key_col=id_col)
        report["order"].append("text_index")
    if ivf_index is not None:
        report["ivf_index"] = purge_ivf_index_keys(
            keys.withColumnRenamed(id_col, vec_key_col or id_col),
            ivf_index, key_col=vec_key_col or id_col)
        report["order"].append("ivf_index")
    if pq_index is not None:
        report["pq_index"] = purge_pq_index_keys(
            keys.withColumnRenamed(id_col, vec_key_col or id_col),
            pq_index, key_col=vec_key_col or id_col)
        report["order"].append("pq_index")
    if table_path is not None:
        report["table"] = L.purge_zordered_keys(
            doomed.select(*(table_key_cols or [id_col])), table_path,
            table_key_cols or [id_col],
            files_per_bucket=files_per_bucket)
        report["order"].append("table")
    return report
