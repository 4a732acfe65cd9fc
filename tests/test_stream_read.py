"""Streaming table READ (`streaming.stream_read` — the Delta
readStream-on-a-table analogue): snapshot first, appends tail through,
rewrites/metadata commits are invisible, mutations fail the stream
unless skipped (Delta's skipChangeCommits), renames surface logically.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aggregation_duckdb_spark.sources import layout as L
from aggregation_duckdb_spark.streaming import (read_table_stream,
                                                run_table_stream)


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 20).alias("a"),
        (F.col("id") % 13).alias("b"),
        (F.col("id") * 3).alias("val"))


def test_table_stream_snapshot_then_appends(spark, tmp_path):
    p = str(tmp_path / "t")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    L.write_zordered(_rows(spark, 0, 200), p, "a", "b", bits=5,
                     bucket_bits=3, vacuum=False)                   # v1
    run_table_stream(spark, p, sink, ckpt)
    got = read_table_stream(spark, sink)
    assert got.count() == 200
    assert got.agg(F.max("_commit_version")).collect()[0][0] == 1

    L.append_zordered(_rows(spark, 200, 250), p)                    # v2
    L.compact_zordered(spark, p, vacuum=False)                      # v3
    L.append_zordered(_rows(spark, 250, 260), p)                    # v4
    run_table_stream(spark, p, sink, ckpt)                 # resume
    got = read_table_stream(spark, sink)
    assert got.count() == 260                   # compact emitted nothing
    assert set(r[0] for r in
               got.select("_commit_version").distinct().collect()) \
        == {1, 2, 4}
    # exactly the appended rows in their commit's partition
    assert read_table_stream(spark, sink, from_version=4).count() == 10
    # the sink equals a batch read of the final snapshot
    assert got.select("k").exceptAll(
        L.read_zordered(spark, p).select("k")).count() == 0


def test_table_stream_fails_on_mutations_unless_skipped(spark,
                                                        tmp_path):
    p = str(tmp_path / "t")
    L.write_zordered(_rows(spark, 0, 100), p, "a", "b", bits=5,
                     bucket_bits=3, vacuum=False)                   # v1
    up = _rows(spark, 0, 1).withColumn("val", F.lit(-1))
    L.upsert_zordered(up, p, ["k"], vacuum=False)                   # v2
    sink, ckpt = str(tmp_path / "s1"), str(tmp_path / "c1")
    with pytest.raises(ValueError, match="skip_change_commits"):
        run_table_stream(spark, p, sink, ckpt)
    sink2, ckpt2 = str(tmp_path / "s2"), str(tmp_path / "c2")
    run_table_stream(spark, p, sink2, ckpt2, skip_change_commits=True)
    assert read_table_stream(spark, sink2).count() == 100


def test_table_stream_maps_renamed_columns(spark, tmp_path):
    p = str(tmp_path / "t")
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    L.write_zordered(_rows(spark, 0, 50), p, "a", "b", bits=4,
                     bucket_bits=2, vacuum=False)                   # v1
    L.alter_zordered(spark, p, renames={"val": "value"})            # v2
    L.append_zordered(
        _rows(spark, 50, 60).withColumnRenamed("val", "value"), p)  # v3
    run_table_stream(spark, p, sink, ckpt)
    got = read_table_stream(spark, sink)
    # the snapshot (v1) was emitted under v1's logical schema (val);
    # post-rename appends surface as value — both eras present, the
    # same union a schema evolution produces
    assert got.count() == 60
    assert got.where(F.col("value").isNotNull()).count() == 10


def test_empty_sink_reads_as_typed_empty_frame(spark, tmp_path):
    got = read_table_stream(spark, str(tmp_path / "nope"))
    assert got.count() == 0 and "_commit_version" in got.columns


def test_retention_error_surfaces_unwrapped(spark, tmp_path,
                                            monkeypatch):
    """A pruned-manifest retention error raised inside foreachBatch
    must reach the caller as the original FileNotFoundError (with its
    retain-history guidance), not wrapped in an opaque
    StreamingQueryException — the same clean-propagation contract
    mutation refusals (ValueError) already have."""
    from aggregation_duckdb_spark.streaming import stream_read as SR

    p = str(tmp_path / "t")
    L.write_zordered(_rows(spark, 0, 50), p, "a", "b", bits=4,
                     bucket_bits=2, vacuum=False)

    def pruned(*a, **k):
        raise FileNotFoundError(
            "stream read needs manifest version 1, but it was pruned "
            "— retain history while a stream is live")

    monkeypatch.setattr(SR, "_commit_rows", pruned)
    with pytest.raises(FileNotFoundError, match="retain history"):
        run_table_stream(spark, p, str(tmp_path / "sink"),
                         str(tmp_path / "ckpt"))


def test_backlog_drains_in_one_start_with_chunked_writes(
        spark, tmp_path, monkeypatch):
    """The auto (max_commits_per_batch=0) drain pays ONE stream
    startup for the whole backlog — the checkpoint records exactly
    one micro-batch — and the sink writes chunk (≤ _WRITE_CHUNK
    commits per write job), instead of one ~3s start per 10 commits
    and one write per commit. Content is identical to the bounded
    path: per-commit partitions, exactly the appended rows."""
    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.streaming import change_feed as CF

    p = str(tmp_path / "t")
    L.write_zordered(_rows(spark, 0, 40), p, "a", "b", bits=4,
                     bucket_bits=2, vacuum=False)                   # v1
    n_appends = 24
    for i in range(n_appends):                       # v2..v25
        L.append_zordered(_rows(spark, 40 + i, 41 + i), p)

    writes = {"n": 0}
    real = fsio.dynamic_partition_overwrite

    def counting(spk):
        writes["n"] += 1
        return real(spk)

    monkeypatch.setattr(fsio, "dynamic_partition_overwrite", counting)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    run_table_stream(spark, p, sink, ckpt)
    monkeypatch.undo()

    got = read_table_stream(spark, sink)
    assert got.count() == 40 + n_appends
    assert got.select("_commit_version").distinct().count() \
        == 1 + n_appends
    # one write per storage pass, not per commit: the snapshot's
    # chunk write plus ONE multi-path scan+write for the whole
    # plain-append run (batched since round 13)
    assert writes["n"] <= 2, writes
    # ONE micro-batch in the checkpoint = one stream start drained it
    offsets = [n for n in fsio.list_names(spark, ckpt + "/offsets")
               if not n.startswith(".")]
    assert len(offsets) == 1, offsets


def test_failed_run_flush_marks_nothing_drained(spark, tmp_path,
                                                monkeypatch):
    """_flush_append_run marks run versions drained only AFTER the
    sink write lands (the same ordering _write_commit_chunks uses):
    a write failure must leave the in-memory `done` set untouched, so
    a retrying caller re-drains the run instead of silently skipping
    it. Empty runs (no-op replays) still count as drained."""
    from aggregation_duckdb_spark import fsio
    from aggregation_duckdb_spark.streaming.change_feed import (
        _flush_append_run, _plain_append_check)

    p = str(tmp_path / "t")
    L.write_zordered(_rows(spark, 0, 20), p, "a", "b", bits=4,
                     bucket_bits=2, vacuum=False)                   # v1
    L.append_zordered(_rows(spark, 20, 22), p)                      # v2
    L.append_zordered(_rows(spark, 22, 25), p)                      # v3
    meta, _ = _plain_append_check(spark, p, (1,))

    def boom(spk):
        raise RuntimeError("sink write failed")

    monkeypatch.setattr(fsio, "dynamic_partition_overwrite", boom)
    done: set[int] = set()
    sink = str(tmp_path / "sink")
    with pytest.raises(RuntimeError, match="sink write failed"):
        _flush_append_run(spark, p, sink, [2, 3], meta, done)
    assert done == set()          # nothing falsely marked drained
    monkeypatch.undo()

    _flush_append_run(spark, p, sink, [2, 3], meta, done)
    assert done == {2, 3}
    got = spark.read.parquet(sink)
    assert got.count() == 5


def test_tombstoned_append_runs_batch_into_one_scan(spark, tmp_path,
                                                    monkeypatch):
    """Round 14: appends carrying an UNCHANGED outstanding tombstone
    set batch into one merged scan (previously any tombstones forced
    the per-commit path). The shared set is anti-joined once against
    the merged frame — the sink must hide exactly the tombstoned keys
    from the appended rows, byte-identical to the per-commit path —
    and the whole tombstoned backlog still costs O(1) storage passes."""
    from aggregation_duckdb_spark import fsio

    p = str(tmp_path / "t")
    L.write_zordered(_rows(spark, 0, 40), p, "a", "b", bits=4,
                     bucket_bits=2, vacuum=False)                   # v1
    # tombstone keys 10..19 (logical delete, no rewrite)           # v2
    L.delete_zordered_keys(
        _rows(spark, 10, 20).select("k"), p, ["k"])
    # 12 appends; some re-land tombstoned keys — reads hide them,
    # so the row stream must too                                # v3..v14
    for i in range(12):
        lo = 100 + 2 * i
        batch = _rows(spark, lo, lo + 2).unionByName(
            _rows(spark, 10 + i % 3, 11 + i % 3))   # a doomed key
        L.append_zordered(batch, p)

    writes = {"n": 0}
    real = fsio.dynamic_partition_overwrite

    def counting(spk):
        writes["n"] += 1
        return real(spk)

    monkeypatch.setattr(fsio, "dynamic_partition_overwrite", counting)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    # the delete commit is a mutation — a row stream cannot retract,
    # so it must be explicitly skipped (Delta's skipChangeCommits);
    # the appends AFTER it are what the run batching covers
    run_table_stream(spark, p, sink, ckpt, skip_change_commits=True)
    monkeypatch.undo()

    got = read_table_stream(spark, sink)
    # snapshot (v1): all 40 rows — the tombstones land at v2, after
    # the snapshot version, so the stream had already emitted them
    assert got.where(F.col("_commit_version") == 1).count() == 40
    appended = got.where(F.col("_commit_version") >= 3)
    # 2 fresh rows per append survive; the re-landed doomed keys are
    # hidden by the shared tombstone set
    assert appended.count() == 24, appended.count()
    assert appended.where(F.col("k").between(10, 19)).count() == 0
    # run batching held: snapshot chunk + ONE merged scan write for
    # the whole tombstoned append run
    assert writes["n"] <= 2, writes
