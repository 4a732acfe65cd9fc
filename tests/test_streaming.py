"""Structured Streaming semantics: streaming results must equal the
batch answers on the same data, including across micro-batch
boundaries (the part a batch test can't cover)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aggregation_duckdb_spark.io import load_table
from aggregation_duckdb_spark.operators import events as E
from aggregation_duckdb_spark.streaming import (
    events_stream, run_available_now, running_user_totals,
    session_windows_stream, tumbling_counts_stream)


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_stream_tumbling_equals_batch(spark, sf_dir):
    ev = events_stream(spark, sf_dir)
    out = run_available_now(tumbling_counts_stream(ev), "complete")
    batch = E.tumbling_counts(load_table(spark, "events", sf_dir))
    assert _rows(out, "window_start", "event_type") == \
        _rows(batch, "window_start", "event_type")


def test_stream_sessions_match_batch_convention(spark, sf_dir):
    """session_window splits at diff >= gap; batch islands split at
    diff > gap. On data with no exact-gap ties the session sets match."""
    ev = events_stream(spark, sf_dir)
    out = run_available_now(session_windows_stream(ev, gap_minutes=30),
                            "complete")
    batch = E.sessionize(load_table(spark, "events", sf_dir), gap_minutes=30)
    assert _rows(out.select("user_id", "session_start", "session_end",
                            "n_events"),
                 "user_id", "session_start") == \
        _rows(batch.select("user_id", "session_start", "session_end",
                           "n_events"),
              "user_id", "session_start")


@pytest.fixture()
def multi_file_events(spark, sf_dir, tmp_path):
    """events split across 4 parquet files so maxFilesPerTrigger=1
    forces 4 micro-batches."""
    path = str(tmp_path / "events_multi")
    load_table(spark, "events", sf_dir).repartition(4) \
        .write.mode("overwrite").parquet(path)
    return path


def test_stateful_totals_survive_batch_boundaries(spark, sf_dir,
                                                  multi_file_events):
    stream = (spark.readStream
              .schema(spark.read.parquet(multi_file_events).schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(multi_file_events))
    out = run_available_now(running_user_totals(stream), "update")

    # final (= max n_batches) row per user is the cumulative total
    final = (out.groupBy("user_id")
             .agg(F.max_by(F.struct("n_events", "sum_value", "n_batches"),
                           F.col("n_batches")).alias("s"))
             .select("user_id", "s.n_events", "s.sum_value", "s.n_batches"))
    got = {r["user_id"]: (r["n_events"], round(r["sum_value"], 3))
           for r in final.collect()}

    batch = (spark.read.parquet(multi_file_events)
             .groupBy("user_id")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("value").cast("decimal(18,3)")).alias("s")))
    want = {r["user_id"]: (r["n"], round(float(r["s"]), 3))
            for r in batch.collect()}
    assert got == want

    # state actually crossed micro-batches: some user saw >1 batch
    assert final.agg(F.max("n_batches")).first()[0] > 1


def test_checkpointed_stream_resumes_exactly_once(spark, sf_dir, tmp_path):
    """Restart semantics: a checkpointed file-source → parquet-sink
    stream picks up only unseen files after a restart; every input row
    lands in the sink exactly once."""
    src_all = str(tmp_path / "all")
    load_table(spark, "events", sf_dir).repartition(4) \
        .write.mode("overwrite").parquet(src_all)
    import glob, os
    parts = sorted(glob.glob(src_all + "/part-*.parquet"))
    assert len(parts) == 4

    src = tmp_path / "src"
    src.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = spark.read.parquet(src_all).schema

    def run_once():
        q = (spark.readStream.schema(schema).parquet(str(src))
             .writeStream.format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    for p in parts[:2]:
        os.symlink(p, src / os.path.basename(p))
    run_once()
    n_first = spark.read.parquet(sink).count()

    for p in parts[2:]:
        os.symlink(p, src / os.path.basename(p))
    run_once()

    got = spark.read.parquet(sink)
    want = spark.read.parquet(src_all)
    assert n_first == sum(spark.read.parquet(p).count() for p in parts[:2])
    assert got.count() == want.count()  # no duplicates after restart
    assert got.agg(F.count_distinct("event_id")).first()[0] == \
        want.agg(F.count_distinct("event_id")).first()[0]


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Real watermark semantics: a row arriving in a later micro-batch,
    older than (max event time seen − watermark), must be dropped from
    an append-mode windowed aggregation."""
    import os
    src = tmp_path / "late_src"
    src.mkdir()
    sink_dir = str(tmp_path / "late_sink")

    base = "2024-01-01 "
    on_time = spark.createDataFrame(
        [(1, base + "10:00:00"), (2, base + "10:30:00"),
         (3, base + "14:00:00")],          # advances watermark to 12:00
        "id long, ts_s string").select(
        "id", F.col("ts_s").cast("timestamp").alias("ts"))
    late = spark.createDataFrame(
        [(4, base + "10:15:00")],           # < 12:00 watermark → dropped
        "id long, ts_s string").select(
        "id", F.col("ts_s").cast("timestamp").alias("ts"))
    stage = tmp_path / "stage"
    on_time.coalesce(1).write.mode("overwrite").parquet(str(stage / "b1"))
    late.coalesce(1).write.mode("overwrite").parquet(str(stage / "b2"))
    import glob as _glob
    b1, = _glob.glob(str(stage / "b1" / "part-*.parquet"))
    b2, = _glob.glob(str(stage / "b2" / "part-*.parquet"))
    schema = spark.read.parquet(str(stage / "b1")).schema
    ckpt = str(tmp_path / "late_ckpt")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        # NB append mode requires grouping by the full window column —
        # a .getField("start") projection severs the watermark link
        agg = (stream.withWatermark("ts", "2 hours")
               .groupBy(F.window("ts", "1 hour"))
               .agg(F.count(F.lit(1)).alias("n"))
               .select(F.col("window.start").alias("window_start"), "n"))
        q = (agg.writeStream.format("parquet")
             .option("path", sink_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    # batch 1: on-time rows only → watermark advances to 12:00
    os.symlink(b1, src / "b1.parquet")
    run_once()
    # batch 2: the 10:15 row is older than the watermark → dropped
    os.symlink(b2, src / "b2.parquet")
    run_once()

    got = {str(r["window_start"]): r["n"]
           for r in spark.read.parquet(sink_dir).collect()}
    # the 10:00 window closed with exactly the 2 on-time rows; the late
    # row (id 4) did not resurrect or re-emit it
    assert got.get("2024-01-01 10:00:00") == 2


def test_stream_dedup_collapses_redelivery(spark, sf_dir):
    from aggregation_duckdb_spark.streaming import (
        dedup_stream, events_stream, run_available_now)

    doubled = events_stream(spark, sf_dir).unionByName(
        events_stream(spark, sf_dir))
    out = run_available_now(dedup_stream(doubled), "append")
    n_src = load_table(spark, "events", sf_dir).count()
    assert out.count() == n_src
    assert out.select("event_id").distinct().count() == n_src


def test_foreach_batch_sink_idempotent_on_replay(spark, tmp_path):
    """The exactly-once contract: multiple micro-batches land under
    their own batch_id partitions; replaying a batch (the at-least-once
    failure mode) overwrites its partition instead of duplicating."""
    from pyspark.sql import functions as F
    from aggregation_duckdb_spark.streaming import (
        event_time as ET, read_sink, run_to_parquet_exactly_once,
        write_batch_idempotent)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    src = ET.events_stream(spark, "/root/testdata/sf0.001")
    result = src.select("event_id", "user_id", "value")
    run_to_parquet_exactly_once(result, sink, ckpt)
    out = read_sink(spark, sink)
    expected = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet").count()
    assert out.count() == expected
    # simulate the crash-replay: re-deliver batch 0's content verbatim
    # (materialized first — the replay source must not lazily read the
    # very files the idempotent write is about to replace)
    batch0 = (spark.read.parquet(sink).where(F.col("batch_id") == 0)
              .drop("batch_id").localCheckpoint(eager=True))
    n0 = batch0.count()
    assert n0 > 0
    write_batch_idempotent(batch0, 0, sink)
    assert read_sink(spark, sink).count() == expected  # no duplication
    # and a DIFFERENT batch id appends rather than clobbering others
    write_batch_idempotent(batch0.limit(5), 999, sink)
    assert read_sink(spark, sink).count() == expected + 5


def test_stream_near_dedup_state_survives_restart(spark, tmp_path):
    """LSH-bucketed streaming near-dedup: a document re-ingested in a
    LATER run (same checkpoint) is flagged against bucket state
    restored from the state store — the cross-restart dedup contract a
    100 TB ingest needs. Distinct documents stay unflagged."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from aggregation_duckdb_spark.streaming import near_dedup as ND
    from aggregation_duckdb_spark.streaming.sinks import (
        run_to_parquet_exactly_once)

    base = ("the quick brown fox jumps over the lazy dog "
            "and keeps jumping all day long")
    src = tmp_path / "src"; src.mkdir()
    sink = str(tmp_path / "sink"); ckpt = str(tmp_path / "ckpt")

    def write_file(name, rows):
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string())}),
            str(src / name))

    def run():
        stream = (spark.readStream
                  .schema("doc_id long, text string")
                  .parquet(str(src)))
        run_to_parquet_exactly_once(
            ND.near_dedup_stream(stream), sink, ckpt)

    write_file("f1.parquet",
               [(1, base),
                (2, "completely different words entirely unrelated here")])
    run()
    out1 = spark.read.parquet(sink)
    assert out1.where(F.col("is_near_dup")).count() == 0  # all novel

    # second ingest run: doc 3 re-delivers doc 1's content verbatim
    write_file("f2.parquet",
               [(3, base),
                (4, "yet another fully unique document nothing shared")])
    run()
    out2 = spark.read.parquet(sink)
    flagged = out2.where(F.col("is_near_dup"))
    # doc 3 flagged in every band bucket, matched to doc 1, via state
    # restored from the checkpoint; doc 4 clean
    assert {r["doc_id"] for r in flagged.collect()} == {3}
    assert {r["matched_doc_id"] for r in flagged.collect()} == {1}
    assert flagged.count() == 4  # one flag per band
    assert out2.where(F.col("doc_id") == 4)\
               .where(F.col("is_near_dup")).count() == 0


def test_stream_funnel_matches_batch_across_restart(spark, sf_dir, tmp_path):
    """Funnel state machines across a stream RESTART: the first run
    ingests the early half of events (by time), the second run — same
    checkpoint — the late half. The final per-user funnel must equal
    the batch greedy-earliest answer on the full data, which requires
    step state (e.g. a 'view' from run 1 completed by a 'click' in
    run 2) to survive the state store round-trip."""
    from aggregation_duckdb_spark.streaming import funnel_stream
    from aggregation_duckdb_spark.streaming.sinks import (
        run_to_parquet_exactly_once)

    ev = load_table(spark, "events", sf_dir)
    batch = E.funnel_steps(ev, ["view", "click", "purchase"])
    # cut at the LATEST converted user's click time: that user's view+
    # click land in run 1 and their purchase in run 2 — a guaranteed
    # straddler, so the restart is never vacuously green
    cut = (batch.where(F.col("converted"))
           .agg(F.max("t_1")).first()[0])
    src = tmp_path / "src"; src.mkdir()
    sink = str(tmp_path / "sink"); ckpt = str(tmp_path / "ckpt")

    def run():
        stream = (spark.readStream.schema(ev.schema).parquet(str(src)))
        run_to_parquet_exactly_once(
            funnel_stream(stream, ["view", "click", "purchase"]),
            sink, ckpt)

    import glob
    import shutil

    def add_half(df, name):
        # the file source reads top-level files only — stage the write,
        # then drop the part file directly into src/
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.copy(glob.glob(stage + "/part-*.parquet")[0],
                    str(src / f"{name}.parquet"))

    add_half(ev.where(F.col("ts") <= cut), "early")
    run()
    add_half(ev.where(F.col("ts") > cut), "late")
    run()

    out = spark.read.parquet(sink)
    # last emission per user (2 runs -> up to 2 rows; batch_id column
    # comes from the exactly-once sink)
    final = (out.groupBy("user_id")
             .agg(F.max_by(F.struct("steps_completed", "converted"),
                           F.col("batch_id")).alias("s"))
             .select("user_id", "s.steps_completed", "s.converted"))
    got = {r["user_id"]: (r["steps_completed"], r["converted"])
           for r in final.collect()}

    want = {r["user_id"]: (r["steps_completed"], r["converted"])
            for r in batch.collect()}
    # stream covers every user (even step-0-less ones, at 0 steps);
    # batch reports only users who reached step 0
    for uid, (steps, conv) in want.items():
        assert got[uid] == (steps, conv), uid
    # users the batch omits never saw a 'view'
    for uid, (steps, conv) in got.items():
        if uid not in want:
            assert steps == 0 and not conv
    # cross-restart progress actually happened: at least one user
    # started their funnel before the cut (run 1) and completed it
    # after (run 2) — exactly the case that fails if step state does
    # not survive the checkpoint restart (its equality was asserted in
    # the loop above)
    straddlers = batch.where((F.col("t_0") <= F.lit(cut))
                             & (F.col("t_2") > F.lit(cut))).count()
    assert straddlers > 0


def test_anomaly_stream_prequential_across_restart(spark, sf_dir, tmp_path):
    """Prequential z-scores over a metric stream: run 1 ingests the
    early half of hourly counts, run 2 (same checkpoint) the late
    half; every emission must match a direct Python fold of the same
    prequential semantics — which requires the integer moments to
    survive the state-store round-trip exactly."""
    import glob
    import math
    import shutil
    from aggregation_duckdb_spark.streaming import anomaly_stream
    from aggregation_duckdb_spark.streaming.sinks import (
        run_to_parquet_exactly_once)

    hourly = (load_table(spark, "events", sf_dir)
              .groupBy("event_type",
                       F.window("ts", "1 hour").getField("start")
                       .alias("window_start"))
              .agg(F.count(F.lit(1)).alias("n_events")))
    cut = hourly.agg(F.percentile_approx("window_start", 0.5)).first()[0]
    src = tmp_path / "src"; src.mkdir()
    sink = str(tmp_path / "sink"); ckpt = str(tmp_path / "ckpt")

    def add(df, name):
        stage = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        shutil.copy(glob.glob(stage + "/part-*.parquet")[0],
                    str(src / f"{name}.parquet"))

    def run():
        stream = spark.readStream.schema(hourly.schema).parquet(str(src))
        run_to_parquet_exactly_once(anomaly_stream(stream), sink, ckpt)

    add(hourly.where(F.col("window_start") <= cut), "early")
    run()
    add(hourly.where(F.col("window_start") > cut), "late")
    run()

    got = {(r.event_type, r.window_start): (r.n_events, r.z, r.flagged)
           for r in spark.read.parquet(sink).collect()}

    rows = sorted(map(tuple, hourly.collect()))
    state: dict = {}
    want = {}
    for typ, w, c in sorted(rows, key=lambda r: (r[0], r[1])):
        n, s, ss = state.get(typ, (0, 0, 0))
        z = None
        if n >= 2:
            mean = s / n
            var = (ss - s * s / n) / (n - 1)
            if var > 0:
                z = (c - mean) / math.sqrt(var)
        want[(typ, w)] = (c, z, z is not None and abs(z) >= 2.0)
        state[typ] = (n + 1, s + c, ss + c * c)
    assert set(got) == set(want)
    for k, (c, z, fl) in want.items():
        gc, gz, gfl = got[k]
        assert gc == c and gfl == fl, k
        if z is None:
            assert gz is None or (gz != gz), k  # NULL (or NaN) both fine
        else:
            assert abs(gz - z) < 1e-12, k
    # both runs contributed emissions, and some hour was flagged
    assert any(fl for _, _, fl in want.values())
    early = {k for k in want if k[1] <= cut}
    late = {k for k in want if k[1] > cut}
    assert early and late


def test_stream_dau_matches_batch_distincts(spark, sf_dir,
                                            multi_file_events):
    """Per-day DAU folded across micro-batches equals the batch
    distinct count, and state genuinely crossed batch boundaries."""
    from aggregation_duckdb_spark.streaming.dau import dau_stream
    stream = (spark.readStream
              .schema(spark.read.parquet(multi_file_events).schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(multi_file_events))
    out = run_available_now(dau_stream(stream), "update")
    final = (out.groupBy("day")
             .agg(F.max_by(F.struct("dau", "n_batches"),
                           F.col("n_batches")).alias("s"))
             .select("day", "s.dau", "s.n_batches"))
    got = {r["day"]: r["dau"] for r in final.collect()}
    batch = (spark.read.parquet(multi_file_events)
             .select(F.expr("unix_micros(ts) div 86400000000").alias("day"),
                     "user_id").distinct()
             .groupBy("day").agg(F.count(F.lit(1)).alias("dau")))
    want = {r["day"]: r["dau"] for r in batch.collect()}
    assert got == want and got
    assert final.agg(F.max("n_batches")).first()[0] > 1


def test_corpus_hash_state_survives_micro_batches(spark, sf_dir, tmp_path):
    """The streaming fingerprint must accumulate across micro-batch
    boundaries: 4 files streamed one per trigger, final complete-mode
    row equal to the batch fingerprint of the whole corpus."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import pipeline as P
    from aggregation_duckdb_spark.streaming import (run_available_now,
                                                    table_stream)
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    docs.repartition(4).write.parquet(src)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    got = run_available_now(P.dataset_fingerprint(stream),
                            "complete").collect()
    want = P.dataset_fingerprint(docs).collect()[0]
    assert len(got) == 1
    assert tuple(got[0]) == tuple(want)


def test_table_stream_matches_batch_scan(spark, sf_dir):
    """table_stream must surface the same rows as the batch loader."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.streaming import (run_available_now,
                                                    table_stream)
    got = run_available_now(
        table_stream(spark, sf_dir, "documents").select("doc_id"),
        "append")
    assert sorted(r.doc_id for r in got.collect()) == \
        sorted(r.doc_id for r in
               load_table(spark, "documents", sf_dir).collect())


def test_zordered_ingest_exactly_once_multi_batch(spark, tmp_path):
    """Streaming ingest into the Z-ordered table: several micro-batches
    of appends must land exactly once (restart with the same checkpoint
    adds nothing; a stale batch id is skipped outright), and the box
    read over main ∪ streamed-deltas must equal the plain filter."""
    from aggregation_duckdb_spark.sources import layout as L
    from aggregation_duckdb_spark.streaming import run_zordered_ingest

    seed = spark.range(0, 4000).select(
        (F.col("id") % 500).alias("a"), ((F.col("id") * 7) % 300).alias("b"),
        F.col("id").alias("payload"))
    path = str(tmp_path / "z_ingest")
    L.write_zordered(seed, path, "a", "b", bits=7, bucket_bits=4)

    # multi-file source -> maxFilesPerTrigger=1 -> multiple micro-batches
    src = str(tmp_path / "incoming")
    extra = spark.range(10_000, 10_900).select(
        (F.col("id") % 520).alias("a"), ((F.col("id") * 11) % 320).alias("b"),
        F.col("id").alias("payload"))
    extra.repartition(3).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    ckpt = str(tmp_path / "ckpt")
    run_zordered_ingest(stream, path, ckpt)

    m = L.read_manifest(spark, path)
    assert m["last_batch_id"] >= 1          # really several batches
    assert len(m["deltas"]) == m["last_batch_id"] + 1

    want_all = seed.unionByName(extra)
    box = (0, 200, 0, 150)
    def box_rows():
        return sorted(
            (r.a, r.b, r.payload) for r in
            L.read_zordered_box_with_delta(spark, path, *box).collect())
    want = sorted((r.a, r.b, r.payload) for r in want_all.where(
        (F.col("a").between(*box[:2]))
        & (F.col("b").between(*box[2:]))).collect())
    assert box_rows() == want

    # restart with the same checkpoint: availableNow re-plans, finds
    # nothing new, appends nothing
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(src))
    run_zordered_ingest(stream2, path, ckpt)
    assert len(L.read_manifest(spark, path)["deltas"]) == \
        m["last_batch_id"] + 1

    # a replayed (stale) batch id is skipped before anything writes
    L.append_zordered(extra.limit(5), path, batch_id=0)
    assert len(L.read_manifest(spark, path)["deltas"]) == \
        m["last_batch_id"] + 1
    assert box_rows() == want

    # compaction folds the streamed deltas and keeps the watermark
    L.compact_zordered(spark, path)
    m2 = L.read_manifest(spark, path)
    assert m2["deltas"] == [] and m2["last_batch_id"] == m["last_batch_id"]
    got = sorted((r.a, r.b, r.payload) for r in
                 L.read_zordered_box(spark, path, *box).collect())
    assert got == want


def test_attribution_stream_state_survives_batches(spark, tmp_path):
    """Touch state must carry BETWEEN micro-batches: a touch in batch
    1 attributes a conversion in batch 2; the finished multi-batch
    stream equals the batch fill-forward answer."""
    from aggregation_duckdb_spark.operators import events as E
    from aggregation_duckdb_spark.streaming import (attribution_stream,
                                                    run_available_now)
    rows = [
        # (event_id, ts_us, user_id, type, value) — user 1's touch and
        # conversion land in DIFFERENT time-ordered files
        (1, 1_000_000, 1, "click", 0.0),
        (2, 2_000_000, 2, "view", 0.0),
        (3, 9_000_000, 1, "purchase", 10.0),   # attributed to click
        (4, 9_500_000, 2, "purchase", 20.0),   # attributed to view
        (5, 9_600_000, 3, "purchase", 30.0),   # no touch ever: none
        (6, 99_000_000 + 7 * 86_400_000_000, 1, "purchase", 40.0),
        # ^ last touch older than the 7-day lookback: none
    ]
    df = spark.createDataFrame(
        [(e, t, u, ty, v) for e, t, u, ty, v in rows],
        "event_id long, ts_us long, user_id long, event_type string, "
        "value double").select(
        "event_id", F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "user_id", "event_type", "value")
    src = str(tmp_path / "attr_src")
    # two time-ordered files -> two micro-batches with state between
    df.where(F.col("event_id") <= 2).coalesce(1).write.parquet(src)
    df.where(F.col("event_id") > 2).coalesce(1).write.mode(
        "append").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .option("latestFirst", "false").parquet(src))
    got = run_available_now(attribution_stream(stream), "update")
    by_event = {r.event_id: (r.channel, r.value, r.lag_us)
                for r in got.collect()}
    assert by_event[3] == ("click", 10.0, 8_000_000)
    assert by_event[4] == ("view", 20.0, 7_500_000)
    assert by_event[5] == ("none", 30.0, None)
    assert by_event[6][0] == "none"
    assert set(by_event) == {3, 4, 5, 6}
    # and the channel rollup equals the batch operator's
    batch = {r.channel: (r.n_conversions, r.sum_value)
             for r in E.attribution(df).collect()}
    stream_roll = {r.channel: (r.n_conversions, r.sum_value)
                   for r in got.groupBy("channel")
                   .agg(F.count(F.lit(1)).alias("n_conversions"),
                        F.sum(F.col("value").cast("decimal(18,3)"))
                        .cast("double").alias("sum_value")).collect()}
    assert stream_roll == batch


def test_dedup_ingest_admits_novel_docs_exactly_once(spark, tmp_path):
    """Streaming dedup admission over the persisted index: novel docs
    land exactly once (restart with the same checkpoint adds nothing;
    a stale batch id is skipped), exact duplicates of the corpus and
    of earlier batches are refused, and the index grows so LATER
    batches dedup against EARLIER ones."""
    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.streaming import (read_sink,
                                                    run_dedup_ingest)

    def mk(ids, dup_of=None):
        # md5-derived word runs like the organic corpus; dup_of maps
        # a doc to another id's text (an exact duplicate)
        src = F.coalesce(F.lit(dup_of), F.col("id")) if dup_of is not None \
            else F.col("id")
        words = F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda j: F.substring(
                F.md5(F.concat(src.cast("string"), F.lit("|"),
                               (j - j % 3).cast("string"))), 1, 6))
        return (spark.range(ids[0], ids[1])
                .select(F.col("id").alias("doc_id"),
                        F.concat_ws(" ", words).alias("text")))

    corpus = mk((0, 40))
    index = str(tmp_path / "idx")
    D.write_dedup_index(corpus, index)

    # incoming: 3 files -> 3 micro-batches. Batch content: novel docs
    # 100-139, PLUS exact copies of corpus docs (dup_of=7) and a doc
    # duplicated ACROSS batches (id text copied from 100)
    novel = mk((100, 140))
    dup_corpus = mk((200, 206), dup_of=7)          # exact corpus copies
    dup_cross = mk((300, 304), dup_of=100)         # dups of batch-1 doc
    incoming = str(tmp_path / "in")
    novel.repartition(1).write.mode("append").parquet(incoming)
    dup_corpus.repartition(1).write.mode("append").parquet(incoming)
    dup_cross.repartition(1).write.mode("append").parquet(incoming)

    schema = spark.read.parquet(incoming).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(incoming))
    admitted = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")
    run_dedup_ingest(stream, index, admitted, ckpt)

    got = {r.doc_id for r in read_sink(spark, admitted).collect()}
    # all novel docs admitted; every corpus copy refused; the
    # cross-batch dups refused IF their batch ran after doc 100's
    # batch (file order is not guaranteed, so assert the invariant
    # per-content: exactly ONE admitted doc carries each text)
    texts = [r.text for r in read_sink(spark, admitted).collect()]
    assert len(texts) == len(set(texts))        # no duplicate content
    assert not ({r.doc_id for r in dup_corpus.collect()} & got)
    assert {r.doc_id for r in novel.collect()} <= got | {100}
    wm = fsio.read_ingest_watermark(spark, index)
    assert wm >= 1                               # several batches ran

    # restart with the same checkpoint: nothing new, nothing changes
    n_before = read_sink(spark, admitted).count()
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(incoming))
    run_dedup_ingest(stream2, index, admitted, ckpt)
    assert read_sink(spark, admitted).count() == n_before
    assert fsio.read_ingest_watermark(spark, index) == wm

    # a NEW batch that duplicates an admitted doc is refused by the
    # grown index; a truly new doc still gets in
    extra = mk((400, 402)).unionByName(mk((500, 501), dup_of=100))
    extra.repartition(1).write.mode("append").parquet(incoming)
    stream3 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(incoming))
    run_dedup_ingest(stream3, index, admitted, ckpt)
    got3 = {r.doc_id for r in read_sink(spark, admitted).collect()}
    assert {400, 401} <= got3 and 500 not in got3


def test_dedup_ingest_replay_of_uncommitted_batch_drops_nothing(
        spark, tmp_path):
    """The crash window the watermark alone cannot cover: batch N's
    admitted partition AND (some of) its index projections landed,
    but the crash hit before the watermark commit. The replay must
    REUSE the admitted partition — recomputing against an index that
    already holds the batch's own projections would shrink the
    admitted set and the idempotent overwrite would silently drop
    already-admitted docs — and the per-batch index partitions must
    be overwritten, never doubled."""
    import os
    import shutil

    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.streaming.sinks import (read_sink,
                                                          run_dedup_ingest)

    def mk(lo, hi):
        words = F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda j: F.substring(
                F.md5(F.concat(F.col("id").cast("string"), F.lit("|"),
                               (j - j % 3).cast("string"))), 1, 6))
        return (spark.range(lo, hi)
                .select(F.col("id").alias("doc_id"),
                        F.concat_ws(" ", words).alias("text")))

    index = str(tmp_path / "idx")
    D.write_dedup_index(mk(0, 30), index)
    incoming = str(tmp_path / "in")
    mk(100, 120).repartition(1).write.mode("append").parquet(incoming)
    mk(200, 220).repartition(1).write.mode("append").parquet(incoming)
    schema = spark.read.parquet(incoming).schema
    admitted = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(incoming))
    run_dedup_ingest(stream, index, admitted, ckpt)

    before = {r.doc_id for r in read_sink(spark, admitted).collect()}
    hashes_before = spark.read.parquet(
        fsio._join(index, "hashes")).count()
    assert fsio.read_ingest_watermark(spark, index) == 1

    # simulate the crash: batch 1 unacknowledged by the stream
    # checkpoint, watermark rolled back to 0, and one of its index
    # projection partitions torn away mid-append
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    wdir = fsio._join(index, fsio.INGEST_DIR)
    fsio.delete(spark, fsio._join(
        wdir, f"v{fsio.latest_version(spark, wdir):08d}.json"))
    assert fsio.read_ingest_watermark(spark, index) == 0
    shutil.rmtree(fsio._join(index, "buckets", "__ingest_batch=1"))

    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(incoming))
    run_dedup_ingest(stream2, index, admitted, ckpt)

    after = {r.doc_id for r in read_sink(spark, admitted).collect()}
    assert after == before                      # nothing dropped
    assert spark.read.parquet(
        fsio._join(index, "hashes")).count() == hashes_before  # no dups
    assert fsio.exists(spark, fsio._join(       # torn partition healed
        index, "buckets", "__ingest_batch=1"))
    assert fsio.read_ingest_watermark(spark, index) == 1


def test_change_feed_tails_commits_exactly_once(spark, tmp_path):
    """The streaming change feed (Delta CDF analogue): a zhistory
    source tails the manifest with versions as offsets; foreachBatch
    materializes each commit's diff into a per-commit partition. The
    collected rows equal the batch diffs; a SECOND drain from the same
    checkpoint after more commits processes only the new versions; a
    replay from a fresh checkpoint rewrites partitions idempotently
    (exactly-once visible rows)."""
    from aggregation_duckdb_spark.sources import layout as L
    from aggregation_duckdb_spark.streaming import (read_change_feed,
                                                    run_change_feed)

    base = spark.range(0, 400).select(
        (F.col("id") % 97).alias("a"),
        ((F.col("id") * 37) % 61).alias("b"),
        F.col("id").alias("payload"),
        (F.col("id") * 10).alias("val"))
    path = str(tmp_path / "z_cdf")
    sink = str(tmp_path / "cdf_sink")
    ckpt = str(tmp_path / "cdf_ckpt")
    L.write_zordered(base, path, "a", "b", bits=7, bucket_bits=4)  # v1
    L.upsert_zordered(base.where(F.col("payload") % 10 == 0)
                      .withColumn("val", F.lit(-1).cast("long")),
                      path, ["payload"], vacuum=False)             # v2

    run_change_feed(spark, path, sink, ckpt, key_cols=["payload"])
    got = read_change_feed(spark, sink)
    assert set(r._commit_version for r in
               got.select("_commit_version").distinct().collect()) \
        == {1, 2}
    # v1 = the created snapshot as inserts
    v1 = got.where(F.col("_commit_version") == 1)
    assert v1.count() == 400
    assert {r._change_type for r in
            v1.select("_change_type").distinct().collect()} == {"insert"}
    # v2 equals the batch diff
    want2 = {(r.payload, r.val, r._change_type) for r in
             L.diff_zordered(spark, path, 1, 2,
                             key_cols=["payload"]).collect()}
    got2 = {(r.payload, r.val, r._change_type) for r in
            got.where(F.col("_commit_version") == 2).collect()}
    assert got2 == want2 and len(got2) == 80   # 40 pre + 40 post

    # more commits; resumed drain processes ONLY the new versions
    L.delete_zordered_keys(base.where(F.col("payload") < 5)
                           .select("payload"), path, ["payload"])  # v3
    run_change_feed(spark, path, sink, ckpt, key_cols=["payload"])
    got3 = read_change_feed(spark, sink, from_version=3)
    assert {(r.payload, r._change_type) for r in got3.collect()} == \
        {(p, "delete") for p in range(5)}
    assert read_change_feed(spark, sink).count() == 400 + 80 + 5

    # replay from a FRESH checkpoint: partitions rewritten, not doubled
    run_change_feed(spark, path, sink, str(tmp_path / "cdf_ckpt2"),
                    key_cols=["payload"])
    assert read_change_feed(spark, sink).count() == 400 + 80 + 5

    # rate limit: a 1-commit-per-batch feed drains the same 3 commits
    sink2 = str(tmp_path / "cdf_sink2")
    run_change_feed(spark, path, sink2, str(tmp_path / "cdf_ckpt3"),
                    key_cols=["payload"], max_commits_per_batch=1)
    assert read_change_feed(spark, sink2).count() == 400 + 80 + 5


def test_change_feed_requires_retained_history(spark, tmp_path):
    """A feed over a table whose covered versions were vacuumed raises
    cleanly (the retention contract), instead of emitting partial
    change rows."""
    import pytest as _pytest

    from aggregation_duckdb_spark.sources import layout as L
    from aggregation_duckdb_spark.streaming import run_change_feed

    base = spark.range(0, 100).select(
        (F.col("id") % 7).alias("a"), (F.col("id") % 5).alias("b"),
        F.col("id").alias("payload"))
    path = str(tmp_path / "z_cdf_vac")
    L.write_zordered(base, path, "a", "b", bits=6, bucket_bits=3)  # v1
    L.upsert_zordered(base.where(F.col("payload") < 3), path,
                      ["payload"])        # v2, vacuum=True: v1 pruned?
    L.vacuum_zordered(spark, path, keep_versions=1)
    with _pytest.raises(Exception, match="vacuumed|min-live|retain"):
        run_change_feed(spark, path, str(tmp_path / "s"),
                        str(tmp_path / "c"), key_cols=["payload"])


def test_change_feed_per_op_derivation(spark, tmp_path):
    """Change rows are derived per OPERATION: an append commit reads
    only its delta batch (inserts), a key-delete commit one semi-join
    (full preimages), and compaction emits NOTHING (physical rewrites
    are logically invisible — deltas/tombstones were already applied
    by every read); the derived rows equal the general endpoint
    diff."""
    from aggregation_duckdb_spark.sources import layout as L
    from aggregation_duckdb_spark.streaming import (read_change_feed,
                                                    run_change_feed)

    base = spark.range(0, 200).select(
        (F.col("id") % 31).alias("a"), ((F.col("id") * 7) % 23).alias("b"),
        F.col("id").alias("payload"), (F.col("id") * 10).alias("val"))
    path = str(tmp_path / "z_cdf_ops")
    L.write_zordered(base, path, "a", "b", bits=6, bucket_bits=3)   # v1
    extra = spark.range(1000, 1005).select(
        (F.col("id") % 31).alias("a"), ((F.col("id") * 7) % 23).alias("b"),
        F.col("id").alias("payload"), (F.col("id") * 10).alias("val"))
    L.append_zordered(extra, path)                                  # v2
    L.compact_zordered(spark, path, vacuum=False)                   # v3
    L.delete_zordered_keys(base.where(F.col("payload") < 3)
                           .select("payload"), path, ["payload"])   # v4

    sink = str(tmp_path / "sink")
    run_change_feed(spark, path, sink, str(tmp_path / "ckpt"),
                    key_cols=["payload"])
    feed = read_change_feed(spark, sink)
    # compaction (v3) emitted nothing; every other commit did
    assert {r._commit_version for r in
            feed.select("_commit_version").distinct().collect()} \
        == {1, 2, 4}
    # append derivation: exactly the batch rows, tagged insert
    v2 = {(r.payload, r.val, r._change_type) for r in
          feed.where(F.col("_commit_version") == 2).collect()}
    assert v2 == {(p, p * 10, "insert") for p in range(1000, 1005)}
    # delete derivation: full preimages, equal to the endpoint diff
    v4 = {(r.payload, r.val, r._change_type) for r in
          feed.where(F.col("_commit_version") == 4).collect()}
    want = {(r.payload, r.val, r._change_type) for r in
            L.diff_zordered(spark, path, 3, 4,
                            key_cols=["payload"]).collect()}
    assert v4 == want == {(p, p * 10, "delete") for p in range(3)}


def test_change_feed_reads_writer_side_change_files(spark, tmp_path):
    """Writer-side CDF (emit_changes=True): mutations store their
    exact change rows in the same commit; the feed reads them back
    with ZERO endpoint scans and NO retention requirement — the
    mutated table here vacuums eagerly (old snapshots unreadable), yet
    the feed reproduces exactly the diffs a retention-keeping twin
    yields; a provably-empty change set is an explicit null marker
    (feed emits nothing); the per-commit field never leaks into later
    commits' manifests."""
    import pytest as _pytest

    from aggregation_duckdb_spark.sources import layout as L
    from aggregation_duckdb_spark.streaming import (read_change_feed,
                                                    run_change_feed)

    base = spark.range(0, 300).select(
        (F.col("id") % 31).alias("a"), ((F.col("id") * 7) % 23).alias("b"),
        F.col("id").alias("payload"), (F.col("id") * 10).alias("val"))
    t1, t2 = str(tmp_path / "z_cdf_w"), str(tmp_path / "z_cdf_ref")
    ups = base.where(F.col("payload") % 10 == 0) \
        .withColumn("val", F.lit(-1).cast("long"))
    for p in (t1, t2):
        L.write_zordered(base, p, "a", "b", bits=6, bucket_bits=3)  # v1
    L.upsert_zordered(ups, t1, ["payload"], emit_changes=True)      # v2
    L.merge_zordered(base.where(F.col("payload") < 20), t1,
                     ["payload"], when_matched_delete="t.val >= 100",
                     when_not_matched_insert=False,
                     emit_changes=True)                             # v3
    L.upsert_zordered(ups, t2, ["payload"], vacuum=False)
    L.merge_zordered(base.where(F.col("payload") < 20), t2,
                     ["payload"], when_matched_delete="t.val >= 100",
                     when_not_matched_insert=False, vacuum=False)

    # eager vacuum made t1's old snapshots unreadable — diffs would be
    # impossible; the stored change rows carry the feed anyway
    with _pytest.raises(Exception):
        L.read_zordered(spark, t1, version=1).collect()
    sink = str(tmp_path / "sink")
    run_change_feed(spark, t1, sink, str(tmp_path / "ckpt"),
                    key_cols=["payload"], starting_version=2)
    feed = read_change_feed(spark, sink)
    for v in (2, 3):
        got = {(r.payload, r.val, r._change_type) for r in
               feed.where(F.col("_commit_version") == v).collect()}
        want = {(r.payload, r.val, r._change_type) for r in
                L.diff_zordered(spark, t2, v - 1, v,
                                key_cols=["payload"]).collect()}
        assert got == want and got, v

    # an IDENTICAL upsert changes nothing: explicit null marker, no
    # partition, and the next commit does not inherit the field
    after = L.read_zordered(spark, t1).select("a", "b", "payload",
                                              "val")
    L.upsert_zordered(after.where(F.col("payload") % 50 == 1), t1,
                      ["payload"], emit_changes=True)               # v4
    m4 = L.read_manifest(spark, t1, 4)
    assert "change_file" in m4 and m4["change_file"] is None
    L.append_zordered(base.where(F.col("payload") == 299)
                      .withColumn("payload", F.lit(5000).cast("long")),
                      t1)                                           # v5
    assert "change_file" not in L.read_manifest(spark, t1, 5)
    run_change_feed(spark, t1, sink, str(tmp_path / "ckpt"),
                    key_cols=["payload"])
    feed2 = read_change_feed(spark, sink)
    assert feed2.where(F.col("_commit_version") == 4).count() == 0
    assert {r.payload for r in
            feed2.where(F.col("_commit_version") == 5).collect()} \
        == {5000}


def test_change_feed_processing_time_trigger_tails_live(spark, tmp_path):
    """A LONG-LIVED feed: with a processing-time trigger the zhistory
    source keeps polling the manifest inside ONE running query, so
    commits that land while the stream is up surface without
    run_change_feed's re-start loop (that loop exists only because
    the Python micro-batch source downgrades Trigger.AvailableNow to
    single-batch execution — change_feed.py docstring). Exactly-once
    still holds: each commit's rows land once, in its own partition."""
    import time

    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.sources import layout as L
    from aggregation_duckdb_spark.sources.pydatasource import (
        register_zhistory)
    from aggregation_duckdb_spark.streaming import change_feed as CF

    base = spark.range(0, 300).select(
        (F.col("id") % 97).alias("a"),
        ((F.col("id") * 37) % 61).alias("b"),
        F.col("id").alias("payload"),
        (F.col("id") * 10).alias("val"))
    path = str(tmp_path / "z_live")
    sink = str(tmp_path / "live_sink")
    ckpt = str(tmp_path / "live_ckpt")
    L.write_zordered(base, path, "a", "b", bits=7, bucket_bits=4)  # v1
    register_zhistory(spark)

    def fold(batch_df, batch_id):
        commits = sorted(r["version"] for r in
                         batch_df.select("version").collect())
        for v in commits:
            changes = CF._commit_changes(spark, path, v, ["payload"])
            if changes is not None:
                rows = changes.withColumn("_commit_version",
                                          F.lit(int(v)))
                with fsio.dynamic_partition_overwrite(spark):
                    (rows.write.mode("overwrite")
                     .partitionBy("_commit_version").parquet(sink))

    def landed() -> set[int]:
        got = CF.read_change_feed(spark, sink)
        return {r._commit_version for r in
                got.select("_commit_version").distinct().collect()}

    def wait_for(versions: set[int], timeout_s: float = 90.0):
        deadline = time.time() + timeout_s
        while time.time() < deadline:
            if versions <= landed():
                return
            time.sleep(0.5)
        raise AssertionError(
            f"feed never surfaced {versions - landed()} "
            f"(have {landed()})")

    q = (spark.readStream.format("zhistory")
         .option("tablePath", path)
         .option("max_commits_per_batch", 10)
         .option("starting_version", 1)
         .load()
         .writeStream
         .foreachBatch(fold)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(processingTime="500 milliseconds")
         .start())
    try:
        wait_for({1})
        # commits land WHILE the stream stays up — no re-start loop
        L.upsert_zordered(base.where(F.col("payload") % 10 == 0)
                          .withColumn("val", F.lit(-1).cast("long")),
                          path, ["payload"], vacuum=False)       # v2
        wait_for({2})
        L.delete_zordered_keys(base.where(F.col("payload") < 5)
                               .select("payload"), path, ["payload"])
        wait_for({3})                                            # v3
    finally:
        q.stop()

    got = CF.read_change_feed(spark, sink)
    assert got.where(F.col("_commit_version") == 1).count() == 300
    # v2: 30 upserted keys -> 30 pre + 30 post, exactly once
    v2 = got.where(F.col("_commit_version") == 2)
    assert v2.count() == 60
    assert v2.groupBy("payload", "_change_type").count() \
        .where(F.col("count") > 1).count() == 0
    # v3: the 5 deleted keys with full preimages (payload 0 was
    # upserted to -1 in v2 — the preimage reflects it), exactly once
    v3 = {(r.payload, r.val, r._change_type) for r in
          got.where(F.col("_commit_version") == 3).collect()}
    assert v3 == {(0, -1, "delete")} | \
        {(p, p * 10, "delete") for p in range(1, 5)}


def test_text_index_ingest_streams_exactly_once_with_maintenance(
        spark, tmp_path):
    """Streaming BM25 ingest (round 15): three micro-batches of novel
    docs land in the persisted index exactly once (checkpoint restart
    adds nothing), search over the streamed index equals the live
    scorer over the full corpus, and the in-stream maintenance
    cadence folds the per-batch partitions so long ingest never piles
    small files."""
    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.operators import text as T
    from aggregation_duckdb_spark.streaming import run_text_index_ingest

    def mk(lo, hi):
        words = F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda j: F.substring(
                F.md5(F.concat(F.col("id").cast("string"), F.lit("|"),
                               (j - j % 3).cast("string"))), 1, 6))
        return (spark.range(lo, hi)
                .select(F.col("id").alias("doc_id"),
                        F.concat_ws(" ", words).alias("text")))

    base = mk(0, 40)
    index = str(tmp_path / "tix")
    T.write_text_index(base, index, num_buckets=4)

    incoming = str(tmp_path / "in")
    for lo, hi in ((100, 140), (140, 180), (180, 220)):
        mk(lo, hi).repartition(1).write.mode("append").parquet(incoming)
    schema = spark.read.parquet(incoming).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(incoming))
    ckpt = str(tmp_path / "ckpt")
    run_text_index_ingest(stream, index, ckpt, maintain_every=1,
                          max_batches=0)

    # every batch folded at its post-commit boundary
    assert fsio.ingest_batches(spark, f"{index}/doclens") == [-1]
    wm = fsio.read_ingest_watermark(spark, index)
    assert wm == 2

    # search over the streamed index == live scorer over full corpus
    full = base.unionByName(mk(100, 220))
    terms = [mk(100, 101).select(
        F.split("text", " ")[0]).collect()[0][0]]
    idx_hits = T.bm25_search_indexed(spark, index, terms, top_k=10)
    live_hits = T.bm25_search(full, terms, top_k=10)
    key = lambda r: (r.doc_id, r.score, r.n_tokens)  # noqa: E731
    assert sorted(map(key, idx_hits.collect())) == \
        sorted(map(key, live_hits.collect()))

    # restart with the same checkpoint: nothing doubles
    n_post = spark.read.parquet(f"{index}/postings").count()
    stream2 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(incoming))
    run_text_index_ingest(stream2, index, ckpt, maintain_every=1,
                          max_batches=0)
    assert spark.read.parquet(f"{index}/postings").count() == n_post
    assert fsio.read_ingest_watermark(spark, index) == wm

    # and a later wave still lands + folds
    mk(300, 310).repartition(1).write.mode("append").parquet(incoming)
    stream3 = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(incoming))
    run_text_index_ingest(stream3, index, ckpt, maintain_every=1,
                          max_batches=0)
    assert spark.read.parquet(f"{index}/doclens") \
        .where(F.col("doc") == 305).count() == 1
    assert fsio.ingest_batches(spark, f"{index}/doclens") == [-1]


def test_dedup_ingest_maintenance_cadence_folds_batches(
        spark, tmp_path):
    """run_dedup_ingest's maintain_every: the admission pipeline's
    index folds at the post-commit boundary and later batches still
    dedup correctly against the folded index."""
    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.streaming import (read_sink,
                                                    run_dedup_ingest)

    def mk(ids, dup_of=None):
        src = F.coalesce(F.lit(dup_of), F.col("id")) \
            if dup_of is not None else F.col("id")
        words = F.transform(
            F.sequence(F.lit(0), F.lit(29)),
            lambda j: F.substring(
                F.md5(F.concat(src.cast("string"), F.lit("|"),
                               (j - j % 3).cast("string"))), 1, 6))
        return (spark.range(ids[0], ids[1])
                .select(F.col("id").alias("doc_id"),
                        F.concat_ws(" ", words).alias("text")))

    index = str(tmp_path / "idx")
    D.write_dedup_index(mk((0, 30)), index)
    incoming = str(tmp_path / "in")
    mk((100, 120)).repartition(1).write.mode("append").parquet(incoming)
    # second batch: copies of FIRST-wave docs + novel — must dedup
    # against the index even after the first batch was folded into it
    mk((200, 205), dup_of=100).unionByName(mk((300, 305))) \
        .repartition(1).write.mode("append").parquet(incoming)
    schema = spark.read.parquet(incoming).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(incoming))
    admitted = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")
    run_dedup_ingest(stream, index, admitted, ckpt,
                     maintain_every=1, max_batches=0)
    assert fsio.ingest_batches(spark, f"{index}/hashes") == [-1]
    texts = [r.text for r in read_sink(spark, admitted).collect()]
    assert len(texts) == len(set(texts))       # no duplicate content
    got = {r.doc_id for r in read_sink(spark, admitted).collect()}
    assert {300, 301, 302, 303, 304} <= got
    assert not ({200, 201, 202, 203, 204} & got) or 100 not in got


def test_drain_state_partitions_scale_with_source_bytes(spark, sf_dir):
    """The finite-drain partition policy: state partitions derive from
    recorded source bytes (the streaming analogue of AQE's advisory
    partition size), are capped at 4x parallelism, leave the session
    conf untouched afterwards, and never change the drained answer."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.streaming import event_time as et
    from aggregation_duckdb_spark.streaming import run_available_now

    # policy math: bytes -> ceil(bytes / target), floor 1
    et._PENDING_SOURCE_BYTES.clear()
    et._PENDING_SOURCE_BYTES.append(5 << 20)
    assert et._drain_shuffle_partitions(spark) == 1
    assert et._PENDING_SOURCE_BYTES == []     # consumed
    et._PENDING_SOURCE_BYTES.extend(
        [3 * et.STATE_PARTITION_TARGET_BYTES,
         et.STATE_PARTITION_TARGET_BYTES])    # multiple sources sum
    assert et._drain_shuffle_partitions(spark) == 4
    # cap at 4x the cluster parallelism
    et._PENDING_SOURCE_BYTES.append(1 << 50)
    par = spark.sparkContext.defaultParallelism
    assert et._drain_shuffle_partitions(spark) == 4 * par
    # nothing recorded (a stream built straight from readStream):
    # keep the session default
    assert et._drain_shuffle_partitions(spark) is None

    # end-to-end: drain restores the conf; answer equals the batch
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    ev = et.events_stream(spark, sf_dir)
    out = run_available_now(et.tumbling_counts_stream(ev), "complete")
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev
    batch = (load_table(spark, "events", sf_dir)
             .groupBy(F.window("ts", "1 hour"), "event_type")
             .count())
    assert out.count() == batch.count()
