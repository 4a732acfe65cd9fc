"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real pipelines carry image/audio/video as ``binary`` columns with typed
metadata alongside. The Spark-side machinery that matters at 100 TB —
schema, Arrow batch transfer, ``mapInPandas`` signatures, partition
sizing — is fully real here; only the codec call itself is stubbed
(image/audio libraries are not in this container): ``decode_image``
raises NotImplementedError on the real path and otherwise derives
deterministic fake metadata from the payload's md5, so the plumbing is
oracle-checkable end-to-end.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` modest so a partition of blobs
fits executor memory, and never collect payload columns. ``mapInPandas``
streams Arrow batches; the decode loop below is per-batch vectorizable
numpy when a real codec lands.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

#: On the stub path fake_width/fake_height derive from the payload md5;
#: with REAL_CODECS they carry the actual decoded image dimensions
#: (same schema either way — consumers don't fork on the mode).
DECODE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("checksum", StringType()),
    StructField("fake_width", IntegerType()),
    StructField("fake_height", IntegerType()),
])

REAL_CODECS = False  # flip when PIL/libav land; fake path below is the stub


def _pil_decode(payload: bytes) -> tuple[int, str, int, int]:
    """REAL decode path (active when REAL_CODECS): PIL image open —
    n_bytes/checksum as in the stub, width/height from the actual
    image header. Raises NotImplementedError (not ImportError) when
    the codec library is absent so the boundary stays explicit."""
    try:
        import io
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "REAL_CODECS=True but PIL is not installed") from exc
    with Image.open(io.BytesIO(payload)) as im:
        return (len(payload), hashlib.md5(payload).hexdigest(),
                im.width, im.height)


def _pil_resize(payload: bytes, tw: int, th: int) -> bytes:
    """REAL resize path: decode, bilinear resize, re-encode PNG."""
    try:
        import io
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "REAL_CODECS=True but PIL is not installed") from exc
    with Image.open(io.BytesIO(payload)) as im:
        out = io.BytesIO()
        im.resize((tw, th)).save(out, "PNG")
        return out.getvalue()


def attach_payload(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Stand-in payload: utf-8 bytes of the text as an opaque binary
    column (real pipelines read image bytes from object storage)."""
    return docs.select(F.col(id_col),
                       F.encode(F.col(text_col), "utf-8").alias("payload"))


def _fake_decode(payload: bytes) -> tuple[int, str, int, int]:
    """STUB decode: deterministic metadata from the payload md5 —
    width/height from the first two hex digits. Replace with the real
    codec when available (see REAL_CODECS)."""
    digest = hashlib.md5(payload).hexdigest()
    width = 1 + int(digest[0], 16)
    height = 1 + int(digest[1], 16)
    return len(payload), digest, width, height


def decode_metadata(with_payload: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode/inspect payloads via ``mapInPandas`` (Arrow-batched; the
    idiomatic shape for per-row Python work that built-ins can't do)."""

    # captured at plan time on the driver, so the executors see the
    # mode the plan was built under (module globals re-resolve per
    # worker import and could silently disagree)
    decode = _pil_decode if REAL_CODECS else _fake_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pd.Series([m[0] for m in meta], dtype="int64"),
                "checksum": [m[1] for m in meta],
                "fake_width": pd.Series([m[2] for m in meta], dtype="int32"),
                "fake_height": pd.Series([m[3] for m in meta], dtype="int32"),
            })

    return with_payload.mapInPandas(decode_batches, DECODE_SCHEMA)


RESIZE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("target_width", IntegerType()),
    StructField("target_height", IntegerType()),
    StructField("resized_payload", BinaryType()),
    StructField("resized_checksum", StringType()),
])


def resize_plan(with_payload: DataFrame, target: tuple[int, int] = (224, 224),
                id_col: str = "doc_id") -> DataFrame:
    """Resize plumbing: binary in → binary out through Arrow batches —
    the exact shape a real PIL/torchvision resize produces (payload
    column out, NOT collected to the driver). STUB: the 'resized'
    payload is the utf-8 of ``md5(payload) || 'WxH'`` — deterministic,
    so the checksum is oracle-checkable in DuckDB."""
    tw, th = target

    real = REAL_CODECS  # captured at plan time (see decode_metadata)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                fake = [_pil_resize(bytes(p), tw, th)
                        for p in pdf["payload"]]
            else:
                fake = [(hashlib.md5(bytes(p)).hexdigest()
                         + f"{tw}x{th}").encode()
                        for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "target_width": pd.Series([tw] * len(pdf), dtype="int32"),
                "target_height": pd.Series([th] * len(pdf), dtype="int32"),
                "resized_payload": fake,
                "resized_checksum": [hashlib.md5(b).hexdigest() for b in fake],
            })

    return with_payload.mapInPandas(resize_batches, RESIZE_SCHEMA)


FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("features", ArrayType(DoubleType())),
])


def extract_features(with_payload: DataFrame, dim: int = 8,
                     id_col: str = "doc_id") -> DataFrame:
    """Feature-extraction plumbing: payload → fixed-dim double vector
    (the embedding-model shape). STUB features: byte-histogram moments
    over ``dim`` equal-width buckets of the payload's md5 digest bytes
    — deterministic integer math, reproducible in DuckDB SQL."""

    if REAL_CODECS:
        # unlike decode/resize there is no library that makes this
        # real — features need a model runtime; fail at plan time
        raise NotImplementedError(
            "real feature extraction requires model runtimes")

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                digest = hashlib.md5(bytes(p)).digest()
                step = len(digest) // dim
                feats.append([float(sum(digest[i * step:(i + 1) * step]))
                              for i in range(dim)])
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"),
                                "features": feats})

    return with_payload.mapInPandas(feat_batches, FEATURE_SCHEMA)


PAYLOAD_STATS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("byte_sum", LongType()),
])


def payload_stats_arrow(with_payload: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Per-payload byte statistics via ``mapInArrow`` — the Arrow-level
    sibling of ``mapInPandas`` and the right path for binary-heavy
    columns: a pandas conversion materializes one Python ``bytes``
    object per row, while Arrow record batches expose the payloads as
    one contiguous buffer + offsets, which numpy reduces zero-copy
    (``np.add.reduceat`` over the values buffer). At 100 TB of blobs
    the per-row-object overhead IS the job cost; this path never
    creates per-row objects."""
    import numpy as np
    import pyarrow as pa

    def stats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(batch.schema.get_field_index(id_col))
            pay = batch.column(batch.schema.get_field_index("payload"))
            # offsets are int32 for binary, int64 for large_binary —
            # reading a LargeBinary buffer as int32 would silently
            # misparse, so branch on the actual type
            if pa.types.is_binary(pay.type):
                off_dtype = np.int32
            elif pa.types.is_large_binary(pay.type):
                off_dtype = np.int64
            else:
                raise TypeError(
                    f"payload must be binary/large_binary, got {pay.type}")
            off = np.frombuffer(pay.buffers()[1], dtype=off_dtype)[
                pay.offset:pay.offset + len(pay) + 1].astype(np.int64)
            # slice the values buffer to THIS batch's byte range (a
            # sliced array shares the buffer with bytes outside it, and
            # reduceat's final segment would otherwise run to buffer end)
            data = np.frombuffer(pay.buffers()[2], dtype=np.uint8)[
                off[0]:off[-1]].astype(np.int64)
            off = off - off[0]
            lengths = np.diff(off)
            # reduceat misbehaves on zero-length segments (repeats the
            # next value) — mask empties to 0 explicitly. With empties
            # removed, the remaining start offsets still partition the
            # byte range exactly (empty rows occupy zero bytes).
            sums = np.zeros(len(pay), dtype=np.int64)
            nonempty = lengths > 0
            if nonempty.any():
                sums[nonempty] = np.add.reduceat(data, off[:-1][nonempty])
            # null payloads have zero-width offset slots — without a
            # mask they'd surface as 0-byte rows; propagate null instead
            null_mask = (np.asarray(pay.is_null()) if pay.null_count
                         else None)
            yield pa.RecordBatch.from_arrays(
                [ids.cast(pa.int64()),
                 pa.array(lengths, type=pa.int64(), mask=null_mask),
                 pa.array(sums, type=pa.int64(), mask=null_mask)],
                names=["doc_id", "n_bytes", "byte_sum"])

    return with_payload.mapInArrow(stats, PAYLOAD_STATS_SCHEMA)


def frame_sample_plan(with_payload: DataFrame, every_n: int = 10,
                      id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: derive a
    deterministic pseudo frame count from the payload, then explode one
    row per sampled frame index — the exact shape a real ffmpeg-backed
    sampler produces (decode itself stubbed as above)."""
    n_frames = (F.pmod(F.conv(F.substring(F.md5(F.col("payload")), 1, 4), 16, 10)
                       .cast("long"), F.lit(240)) + 1)
    return (with_payload
            .select(F.col(id_col), n_frames.alias("n_frames"))
            .select(id_col, "n_frames",
                    F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1,
                                         F.lit(every_n))).alias("frame_idx")))


PHASH_BITS = 32


def perceptual_hash(with_payload: DataFrame,
                    id_col: str = "doc_id") -> DataFrame:
    """32-bit locality-sensitive fingerprint per binary payload,
    JVM-side: SimHash over the payload's byte 4-grams (bit b = sign of
    the ±1 sum of md5-bit b across grams). Payloads differing by a
    small edit share most byte-grams, so their hashes land within a
    small hamming distance — the property perceptual image hashes
    (pHash/aHash) provide for pixels, computed here on raw bytes
    because the decode step needs a codec this container lacks. With a
    real codec only THIS fingerprint expression changes (decode → DCT
    sign bits); the banding/verify machinery downstream is unchanged.

    The hex encoding of the payload is let-bound through a
    single-element transform (same no-CSE-inside-HOF-bodies trap as
    dedup.shingles — otherwise every gram window re-hexes the whole
    payload). Bit extraction is integer arithmetic, not per-character
    string tests: bit b of the fingerprint reads the high bit of md5
    hex nibble b+1, so each gram's md5 is parsed ONCE into four 32-bit
    ints (``conv`` of 8 hex chars) and the 32 contributions are
    shift-and-mask — a ~3x cheaper inner loop than 32
    substring-isin's, same bits exactly.

    The input is fanned out to the session's parallelism first: the
    per-payload fold is the expensive part, and a small parquet scan
    arriving as one partition would serialize it on one core (at 100
    TB the scan already has more partitions than cores and this is a
    no-op)."""
    def body(hx: Column) -> Column:
        nbytes = (F.length(hx) / 2).cast("int")
        starts = F.sequence(F.lit(1), F.greatest(nbytes - 3, F.lit(1)))
        grams = F.transform(
            starts, lambda i: hx.substr((i - 1) * 2 + 1, F.lit(8)))
        # per gram: md5 once (let-bound), then four 32-bit chunks via
        # conv — both bindings go through single-element transforms
        # because lambda bodies get no CSE
        chunked = F.transform(
            grams,
            lambda g: F.element_at(F.transform(
                F.array(F.md5(g)),
                lambda h: F.array(*[
                    F.conv(F.substring(h, 1 + 8 * c, 8), 16, 10)
                    .cast("long") for c in range(PHASH_BITS // 8)])), 1))

        def contribs(ch: Column) -> Column:
            # ch is a BOUND 4-long array value; nibble j's high bit of
            # chunk c is bit 31-4j — identical to
            # substring(md5, b+1, 1) IN ('8'..'f') with b = 8c + j
            return F.array(*[
                (F.shiftrightunsigned(F.element_at(ch, b // 8 + 1),
                                      31 - 4 * (b % 8))
                 .bitwiseAND(F.lit(1)) * 2 - 1).cast("int")
                for b in range(PHASH_BITS)])

        counts = F.aggregate(
            chunked, F.array(*[F.lit(0)] * PHASH_BITS),
            lambda acc, ch: F.zip_with(acc, contribs(ch),
                                       lambda a, c: a + c))
        # pack MSB-first by binary doubling (F.shiftleft takes a plain
        # int, not a per-element Column, so a shift-and-sum can't fold)
        return F.aggregate(
            counts, F.lit(0).cast("long"),
            lambda a, c: a * 2 + F.when(c > 0, 1).otherwise(0))

    from aggregation_duckdb_spark.runtime import ensure_parallelism
    hx = F.lower(F.hex(F.col("payload")))
    return ensure_parallelism(with_payload).select(
        F.col(id_col),
        F.element_at(F.transform(F.array(hx), body), 1).alias("phash"))


def phash_near_duplicates(with_payload: DataFrame, id_col: str = "doc_id",
                          max_hamming: int = 3, num_bands: int = 4,
                          max_bucket_size: int | None = 1000) -> DataFrame:
    """Near-duplicate payload pairs by hamming distance on the
    perceptual hash — the multimodal twin of MinHash-LSH dedup.

    Scale shape (same discipline as the text path): split the hash
    into ``num_bands`` contiguous bit bands; two payloads within
    hamming ``h`` of each other agree EXACTLY on at least one band
    whenever ``h < num_bands`` by pigeonhole (the defaults satisfy
    this — raise ``num_bands`` with ``max_hamming`` to keep the
    completeness guarantee) — so candidates come from a hash EQUI-join
    on (band index, band value), never an all-pairs distance join. The
    exact ``bit_count(xor)`` hamming check then verifies candidates.
    One shuffle for the band join, one verify.

    ``max_bucket_size`` guards the self-join the same way the LSH
    bucket cap does (dedup.DEFAULT_MAX_BUCKET_SIZE): a 32-bit hash has
    only ``2^band_bits`` distinct values per band, so at corpus scale
    a popular band value would make the join quadratic — oversize
    buckets drop, and their members still pair through the other
    bands. Pass ``None`` for oracle-exact comparisons at small scale.

    Returns (doc_a, doc_b, hamming) with doc_a < doc_b,
    hamming <= max_hamming."""
    hashed = perceptual_hash(with_payload, id_col)
    band_bits = PHASH_BITS // num_bands
    bands = hashed.select(
        F.col(id_col).alias("doc"), "phash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftrightunsigned(F.col("phash"), i * band_bits)
                     .bitwiseAND(F.lit((1 << band_bits) - 1)).alias("val"))
            for i in range(num_bands)])).alias("b"))
    bands = bands.select("doc", "phash", F.col("b.band").alias("band"),
                         F.col("b.val").alias("val"))
    if max_bucket_size is not None:
        # capped path: one shuffle, in-row pair generation, oversize
        # buckets dropped (same construction as the LSH capped path)
        grouped = (bands.groupBy("band", "val")
                   .agg(F.sort_array(
                       F.collect_set(F.struct("doc", "phash"))).alias("ds"))
                   .where((F.size("ds") >= 2)
                          & (F.size("ds") <= max_bucket_size)))
        pair_arrays = F.flatten(F.transform(
            F.col("ds"),
            lambda x, i: F.transform(
                F.slice(F.col("ds"), i + F.lit(2), F.size(F.col("ds"))),
                lambda y: F.struct(x["doc"].alias("doc_a"),
                                   y["doc"].alias("doc_b"),
                                   x["phash"].alias("__pa"),
                                   y["phash"].alias("__pb")))))
        cands = (grouped.select(F.explode(pair_arrays).alias("p"))
                 .select("p.doc_a", "p.doc_b", "p.__pa", "p.__pb")
                 .distinct())
    else:
        a, b = bands.alias("a"), bands.alias("b")
        cands = (a.join(b, (F.col("a.band") == F.col("b.band"))
                        & (F.col("a.val") == F.col("b.val"))
                        & (F.col("a.doc") < F.col("b.doc")))
                 .select(F.col("a.doc").alias("doc_a"),
                         F.col("b.doc").alias("doc_b"),
                         F.col("a.phash").alias("__pa"),
                         F.col("b.phash").alias("__pb"))
                 .distinct())
    hamming = F.bit_count(F.col("__pa").bitwiseXOR(F.col("__pb")))
    return (cands.select("doc_a", "doc_b",
                         hamming.cast("int").alias("hamming"))
            .where(F.col("hamming") <= max_hamming))
