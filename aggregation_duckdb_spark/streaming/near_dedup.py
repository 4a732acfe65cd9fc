"""Streaming near-duplicate detection: LSH-bucketed stateful dedup.

The batch path (operators/dedup.py) finds near-duplicates with a
shingle→minhash→band→bucket self-join. On an unbounded ingest stream
there is no "other side" to self-join — instead, each LSH band bucket
keeps the signatures it has seen as STREAMING STATE, and a new
document is flagged when its signature agrees with a stored one on
enough minhash slots (slot-agreement is an unbiased estimator of
Jaccard: E[match fraction] = J, the MinHash property).

Shape: the signature/band computation is the same staged map-side
projection as batch (one md5 per shingle, no Python); the ONLY
stateful operator is ``applyInPandasWithState`` grouped by bucket key.
A document appears in ``num_bands`` buckets, so the emitted flags are
per-(doc, bucket); the consumer ORs them per doc (one line of
``groupBy(max)`` in the sink/foreachBatch — kept outside this operator
because chaining a second stateful aggregation would constrain output
modes).

State bounding: real ingest can't keep every signature forever.
``max_state_per_bucket`` caps each bucket's memory FIFO-style — oldest
signatures are evicted first, so the operator degrades to "dedup
against the most recent N per bucket", the standard sliding-corpus
contract (a watermark-TTL variant would evict by time instead).
Detection is estimator-based and capped-state — a candidate FILTER at
ingest, not the exact-verify batch pipeline; route flagged pairs
through ``jaccard_for_pairs`` offline when exactness matters.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BooleanType, LongType, StringType,
                               StructField, StructType)

from aggregation_duckdb_spark.operators.dedup import (
    band_keys, minhash_signature_from_pairs, shingles)

FLAG_SCHEMA = StructType([
    StructField("bucket", StringType()),
    StructField("doc_id", LongType()),
    StructField("is_near_dup", BooleanType()),
    StructField("matched_doc_id", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("ids", ArrayType(LongType())),
    StructField("sigs_flat", ArrayType(LongType())),
])


def signature_buckets(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 12,
                      num_bands: int = 4,
                      shingle_width: int = 3) -> DataFrame:
    """(doc, sig, bucket) projection — batch- and streaming-compatible
    (pure column expressions, staged one-md5-per-shingle like the batch
    hot path)."""
    band_size = num_hashes // num_bands
    sh = docs.select(F.col(id_col).alias("doc"),
                     shingles(F.col(text_col), shingle_width).alias("__sh"))
    hp = sh.select("doc", F.transform(
        F.transform(F.col("__sh"), F.md5),
        lambda h: F.struct(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(h, 9, 8), 16, 10).cast("long").alias("h2"))
    ).alias("hp"))
    sigged = hp.select("doc", minhash_signature_from_pairs(
        F.col("hp"), num_hashes).alias("sig"))
    return sigged.select(
        "doc", "sig",
        F.explode(band_keys(F.col("sig"), num_bands, band_size))
        .alias("bucket"))


def near_dedup_stream(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 12,
                      num_bands: int = 4, shingle_width: int = 3,
                      threshold: float = 0.6,
                      max_state_per_bucket: int = 1024) -> DataFrame:
    """Flag per-(doc, bucket) near-duplicates against everything this
    bucket has seen across ALL previous micro-batches. Deterministic:
    rows process in ascending doc id within each (bucket, batch)."""
    if num_bands <= 0 or num_hashes % num_bands != 0:
        raise ValueError(
            f"num_hashes={num_hashes} must be a positive multiple of "
            f"num_bands={num_bands}")
    min_slots = threshold * num_hashes

    def dedup(key: tuple, pdfs: Iterable[pd.DataFrame],
              state: Any) -> Iterator[pd.DataFrame]:
        ids, flat = state.get if state.exists else ([], [])
        ids, flat = list(ids), list(flat)
        out_rows = []
        # applyInPandasWithState may deliver one group as several
        # chunks; sorting per-chunk would make state/match assignment
        # depend on chunking. Concatenate first so ascending-doc-id
        # order holds across the whole (bucket, batch) group.
        merged = pd.concat(list(pdfs), ignore_index=True)
        for _, row in merged.sort_values("doc").iterrows():
            sig = [int(s) for s in row["sig"]]
            matched = None
            for j in range(len(ids)):
                stored = flat[j * num_hashes:(j + 1) * num_hashes]
                agree = sum(a == b for a, b in zip(sig, stored))
                if agree >= min_slots:
                    matched = ids[j]
                    break
            out_rows.append((key[0], int(row["doc"]), matched is not None,
                             matched))
            if matched is None:
                ids.append(int(row["doc"]))
                flat.extend(sig)
        if len(ids) > max_state_per_bucket:
            drop = len(ids) - max_state_per_bucket
            ids = ids[drop:]
            flat = flat[drop * num_hashes:]
        state.update((ids, flat))
        yield pd.DataFrame(out_rows,
                           columns=["bucket", "doc_id", "is_near_dup",
                                    "matched_doc_id"])

    from pyspark.sql.streaming.state import GroupStateTimeout
    bucketed = signature_buckets(docs, text_col, id_col, num_hashes,
                                 num_bands, shingle_width)
    return (bucketed.groupBy("bucket")
            .applyInPandasWithState(dedup, FLAG_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
