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

from pyspark.sql import DataFrame, SparkSession, functions as F

from aggregation_duckdb_spark import fsio
from aggregation_duckdb_spark.runtime import materialize


def _purge_parquet_table(spark: SparkSession, table_dir: str,
                         id_col: str, keys: DataFrame,
                         part_cols: list[str]) -> dict:
    """Anti-join rewrite of one parquet table: affected partitions are
    found with a column-pruned semi-join (bounded collect — partition
    tuples, not rows), survivors are MATERIALIZED before the dynamic
    partition overwrite (breaks lineage to the files being replaced —
    Spark refuses to overwrite a path its own plan still reads), and
    partitions left with ZERO survivors are deleted explicitly
    (dynamic overwrite only replaces partitions PRESENT in the write —
    an emptied partition would otherwise silently retain its files,
    exactly the leak this verb exists to prevent)."""
    df = spark.read.parquet(table_dir)
    if not part_cols:
        survivors = materialize(df.join(F.broadcast(keys), id_col,
                                        "left_anti"))
        survivors.write.mode("overwrite").parquet(table_dir)
        return {"rewritten_partitions": 1, "deleted_partitions": 0}
    hits = [tuple(r[c] for c in part_cols)
            for r in (df.join(F.broadcast(keys), id_col, "semi")
                      .select(*part_cols).distinct().collect())]
    if not hits:
        return {"rewritten_partitions": 0, "deleted_partitions": 0}
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
        sub.join(F.broadcast(keys), id_col, "left_anti"))
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
            "deleted_partitions": len(emptied)}


def _verify_clean(spark: SparkSession, verb: str, table_dir: str,
                  id_col: str, keys: DataFrame) -> None:
    """Raw re-read residual sweep — the raise-unless-clean contract
    shared with ``layout.purge_zordered_keys``."""
    try:
        raw = spark.read.parquet(table_dir)
    except Exception:
        return                      # table emptied entirely: clean
    residual = raw.join(F.broadcast(keys), id_col, "semi").count()
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
    rebuild if exact-dedup admission of such content matters."""
    spark = doomed_docs.sparkSession
    p = fsio.read_json(spark, fsio._join(path, "params.json"))
    t = F.col(text_col)
    hashes = (doomed_docs.select(
        (F.md5(F.lower(t)) if p.get("normalize", True) else F.md5(t))
        .alias("__h")).distinct())
    keys = _keys(doomed_docs, id_col, "doc")
    n = keys.count()
    report: dict = {"purged_keys": n, "residual_matches": 0}
    d = fsio._join(path, "hashes")
    report["hashes"] = _purge_parquet_table(
        spark, d, "__h", hashes, ["__ingest_batch"])
    _verify_clean(spark, "purge_dedup_index_keys", d, "__h", hashes)
    for name in ("shingles", "buckets"):
        d = fsio._join(path, name)
        report[name] = _purge_parquet_table(
            spark, d, "doc", keys, ["__ingest_batch"])
        _verify_clean(spark, "purge_dedup_index_keys", d, "doc", keys)
    return report


def purge_text_index_keys(keys_df: DataFrame, path: str,
                          key_col: str = "doc_id") -> dict:
    """Erase documents from a ``text.write_text_index`` artifact:
    posting rows (every term bucket the doc's terms hash into) and
    doc-length rows rewrite and raw-verify clean; the corpus scalars
    sidecar (n_docs, tok_total, stop-class dfs — aggregate counts,
    not content) is RECOMPUTED from the rewritten tables so
    ``bm25_search_indexed`` keeps scoring consistently post-purge."""
    spark = keys_df.sparkSession
    keys = _keys(keys_df, key_col, "doc")
    n = keys.count()
    report: dict = {"purged_keys": n, "residual_matches": 0}
    post_dir = fsio._join(path, "postings")
    report["postings"] = _purge_parquet_table(
        spark, post_dir, "doc", keys, ["tbucket"])
    _verify_clean(spark, "purge_text_index_keys", post_dir, "doc",
                  keys)
    dl_dir = fsio._join(path, "doclens")
    report["doclens"] = _purge_parquet_table(
        spark, dl_dir, "doc", keys, [])
    _verify_clean(spark, "purge_text_index_keys", dl_dir, "doc", keys)
    # recompute the aggregate sidecar from what actually remains
    old = fsio.read_json(spark, fsio._join(path, "stats.json"))
    dl = spark.read.parquet(dl_dir)
    stats = dl.agg(F.count(F.lit(1)).alias("n"),
                   F.coalesce(F.sum("dl"), F.lit(0)).alias("tt")
                   ).collect()[0]
    n_docs = int(stats["n"])
    stop_rows = (spark.read.parquet(post_dir)
                 .groupBy("term").agg(F.count(F.lit(1)).alias("df"))
                 .where(F.col("df") > F.lit(old["max_df_frac"] * n_docs))
                 .collect()) if n_docs else []
    fsio.write_json(spark, fsio._join(path, "stats.json"),
                    {"n_docs": n_docs, "tok_total": int(stats["tt"]),
                     "num_buckets": old["num_buckets"],
                     "max_df_frac": old["max_df_frac"],
                     "stop_dfs": {r["term"]: int(r["df"])
                                  for r in stop_rows}})
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
                               ["centroid_id", "__ingest_batch"])
    _verify_clean(spark, "purge_ivf_index_keys", d, "vec_id", keys)
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
                               ["__ingest_batch"])
    _verify_clean(spark, "purge_pq_index_keys", d, "vec_id", keys)
    return {"purged_keys": n, "residual_matches": 0, "codes": rep,
            "codebook_retained": True}
