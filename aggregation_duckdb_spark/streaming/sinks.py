"""Streaming sinks: the foreachBatch exactly-once parquet pattern.

Structured Streaming guarantees at-least-once delivery of micro-batches
to ``foreachBatch`` — after a crash between "sink wrote" and
"checkpoint committed", the SAME batch id is replayed. The canonical
production answer is an idempotent sink: make the write a deterministic
function of (data, batch_id) such that replaying overwrites the
previous attempt instead of appending next to it. Parquet partitioned
by ``batch_id`` with dynamic partition overwrite does exactly that —
replayed batch N rewrites only partition ``batch_id=N``; committed
partitions from other batches are untouched. Combined with the
checkpoint (which makes batch contents deterministic per id), this
yields end-to-end exactly-once without a transactional table format.

Scale notes: one partition directory per micro-batch keeps the
overwrite scoped (no full-table rewrite); compaction of many small
batch partitions is a downstream concern, not the sink's.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from aggregation_duckdb_spark.streaming.event_time import (
    consume_pending_source_bytes)


def write_batch_idempotent(batch_df: DataFrame, batch_id: int,
                           path: str) -> None:
    """The foreachBatch body: write one micro-batch under its
    ``batch_id=N`` partition with dynamic overwrite, so a replay of the
    same id replaces (not duplicates) the earlier attempt."""
    from aggregation_duckdb_spark import fsio
    spark = batch_df.sparkSession
    with fsio.dynamic_partition_overwrite(spark):
        (batch_df.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite").partitionBy("batch_id").parquet(path))


def run_to_parquet_exactly_once(result: DataFrame, path: str,
                                checkpoint_dir: str,
                                output_mode: str = "append") -> None:
    """Run a (finite-source) streaming DataFrame to completion through
    the idempotent foreachBatch parquet sink, with a checkpoint so a
    restarted job resumes (and re-delivers only uncommitted batches)."""
    q = (result.writeStream
         .foreachBatch(lambda df, bid: write_batch_idempotent(df, bid, path))
         .option("checkpointLocation", checkpoint_dir)
         .outputMode(output_mode)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # a drained source must not leave its recorded bytes behind to
    # skew the NEXT drain's state-partition derivation (round 16)
    consume_pending_source_bytes()


def read_sink(spark: SparkSession, path: str) -> DataFrame:
    """Read the sink back (batch), dropping the bookkeeping column."""
    if not os.path.isdir(path):
        raise FileNotFoundError(path)
    return spark.read.parquet(path).drop("batch_id")


def run_zordered_ingest(result: DataFrame, path: str,
                        checkpoint_dir: str) -> None:
    """Stream (finite source) INTO a Z-ordered table: each micro-batch
    lands as a manifest-committed delta via
    :func:`sources.layout.append_zordered` with its batch id, so
    foreachBatch's at-least-once replays are skipped and visible rows
    are exactly-once — the streaming half of the layered-layout
    contract (box reads see main ∪ deltas immediately; the next
    ``compact_zordered`` folds the streamed deltas per-bucket). The
    table must exist (``write_zordered``) before ingest starts."""
    from aggregation_duckdb_spark.sources import layout as L
    q = (result.writeStream
         .foreachBatch(lambda df, bid: L.append_zordered(df, path,
                                                         batch_id=bid))
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # a drained source must not leave its recorded bytes behind to
    # skew the NEXT drain's state-partition derivation (round 16)
    consume_pending_source_bytes()


def run_dedup_ingest(docs: DataFrame, index_path: str,
                     admitted_path: str, checkpoint_dir: str,
                     text_col: str = "text", id_col: str = "doc_id",
                     threshold: float = 0.6,
                     maintain_every: int | None = None,
                     max_batches: int = 8) -> None:
    """Stream documents through corpus-level dedup ADMISSION — the
    crawl-ingest composition at 100 TB: each micro-batch is exact-
    deduped within itself, checked against the PERSISTED dedup index
    (``dedup.incremental_dedup_indexed`` — the corpus is touched only
    through its three narrow projections), and only the novel
    documents land: their text in the idempotent batch-partitioned
    sink, their projections appended to the index so the NEXT batch
    dedups against them.

    Exactly-once end to end despite foreachBatch's at-least-once
    redelivery, by ordering the effects per batch:
    (1) skip outright when the batch id is at or below the index's
    ingest watermark — the whole batch already committed; (2) decide
    the admitted set: if the INDEX holds any ``__ingest_batch=N``
    projection partition, an earlier attempt reached step 3, which
    strictly follows a COMPLETE step-2 write — so reuse the admitted
    ``batch_id=N`` partition verbatim (recomputing against an index
    already holding this batch's own projections would shrink the
    set, and the overwrite would silently drop already-admitted
    docs); otherwise the index is clean of this batch and the
    admitted set is recomputed and written under its partition with
    dynamic overwrite (replacing any partial earlier attempt);
    (3) append the index — itself an idempotent per-batch partition
    overwrite (``append_dedup_index``), so a partial earlier attempt
    is replaced, never doubled — and commit the watermark LAST.
    Within-batch NEAR duplicates are admitted together by design (the
    batch is the admission unit; they collapse at the next
    corpus-level pass) — exact within-batch copies are dropped here.
    The index must exist (``dedup.write_dedup_index``) before ingest
    starts; single writer, as for every durable artifact.
    ``maintain_every=N`` runs :func:`dedup.maintain_dedup_index`
    every N batches AT THE POST-COMMIT BOUNDARY — the only point in
    the cycle where no uncommitted partition exists for a fold to
    swallow — so long-running ingest never piles small files past
    ``max_batches`` (crash mid-fold is covered by the compaction
    verbs' write-temp-then-swap contract)."""
    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.operators import dedup as D

    def body(batch_df: DataFrame, bid: int) -> None:
        spark = batch_df.sparkSession
        if bid <= fsio.read_ingest_watermark(spark, index_path):
            return  # fully committed earlier: skip every effect
        reached_step3 = any(
            fsio.exists(spark, fsio._join(index_path, t,
                                          f"__ingest_batch={int(bid)}"))
            for t in ("hashes", "shingles", "buckets"))
        if reached_step3:
            # uncommitted replay past step 2: the admitted partition
            # is complete (step 3 only runs after step 2 committed)
            # and the index may hold this batch's own projections —
            # reuse, never recompute
            admitted = (spark.read.option("basePath", admitted_path)
                        .parquet(fsio._join(admitted_path,
                                            f"batch_id={int(bid)}"))
                        .drop("batch_id"))
        else:
            batch = D.exact_dedup(batch_df, text_col, id_col)
            flags = D.incremental_dedup_indexed(
                batch, spark, index_path, text_col, id_col, threshold)
            admitted = batch.join(
                flags.where(F.col("is_new")).select(id_col), id_col,
                "left_semi")
            write_batch_idempotent(admitted, bid, admitted_path)
        D.append_dedup_index(admitted, index_path, text_col, id_col,
                             batch_id=bid)
        if maintain_every and (int(bid) + 1) % int(maintain_every) == 0:
            # post-commit boundary: the watermark for bid just
            # committed, so no uncommitted __ingest_batch partition
            # exists for the fold to swallow (the reached_step3 probe
            # above depends on uncommitted partitions SURVIVING)
            D.maintain_dedup_index(spark, index_path,
                                   max_batches=max_batches)

    q = (docs.writeStream
         .foreachBatch(body)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # a drained source must not leave its recorded bytes behind to
    # skew the NEXT drain's state-partition derivation (round 16)
    consume_pending_source_bytes()


def run_text_index_ingest(docs: DataFrame, index_path: str,
                          checkpoint_dir: str,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          maintain_every: int | None = None,
                          max_batches: int = 8) -> None:
    """Stream documents into the persisted BM25 index — the search
    side of the crawl-ingest composition (pair it with
    :func:`run_dedup_ingest`: its admitted sink is exactly the
    novel-ids stream this sink's contract requires, since a
    re-ingested id would double its posting rows in any inverted
    index). Each micro-batch is one :func:`text.append_text_index`
    call, which is exactly-once by itself (watermark skip +
    per-batch dynamic partition overwrite + the stats.json aggregate
    commit point), so the sink body needs no admission logic of its
    own. ``maintain_every=N`` folds piled batch partitions every N
    batches at the post-commit boundary (the ``run_dedup_ingest``
    cadence rule). The index must exist
    (``text.write_text_index``) before ingest starts; single
    writer."""
    from aggregation_duckdb_spark.operators import text as T

    def body(batch_df: DataFrame, bid: int) -> None:
        T.append_text_index(batch_df, index_path, text_col, id_col,
                            batch_id=bid)
        if maintain_every and (int(bid) + 1) % int(maintain_every) == 0:
            T.maintain_text_index(batch_df.sparkSession, index_path,
                                  max_batches=max_batches)

    q = (docs.writeStream
         .foreachBatch(body)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # a drained source must not leave its recorded bytes behind to
    # skew the NEXT drain's state-partition derivation (round 16)
    consume_pending_source_bytes()
