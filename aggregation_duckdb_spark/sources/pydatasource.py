"""Custom connector via Spark 4's Python Data Source API.

The reference's only "connector" is the DuckDB CLI piping a SQL file
into a database (create_duckdb_database.sh:5-7); real deployments wrap
external systems — REST feeds, object-store listings, proprietary
stores — as first-class sources. Spark 4's public
``pyspark.sql.datasource`` API makes that a pure-Python exercise:
``partitions()`` declares the parallel split (this is the scale lever
— one partition per shard/prefix/page of the external system, so a
1000-executor cluster fans out the ingest), and ``read(partition)``
streams one split's rows.

``synthdocs`` is a deterministic synthetic-document source used to
prove the wiring end-to-end: every value derives from md5 of the row
id, so the SAME rows are reproducible in DuckDB SQL
(generate_series + md5) and the driver's oracle hash-check applies to
a custom-connector read exactly like to a parquet scan. Weights are
carried as exact integers (`weight_int`, the first 4 md5 hex digits)
so downstream sums stay order-independent; the double form is one
IEEE division away.
"""

from __future__ import annotations

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition)

SYNTHDOCS_SCHEMA = ("doc_id bigint, bucket int, token_a string, "
                    "token_b string, weight_int bigint")


class SynthDocsDataSource(DataSource):
    """``spark.read.format("synthdocs")`` — options:

    - ``n_docs`` (default 1000): total rows;
    - ``partitions`` (default 8): parallel splits (row ``i`` lives in
      partition ``i % partitions``, so splits are balanced and
      disjoint by construction).
    """

    @classmethod
    def name(cls) -> str:
        return "synthdocs"

    def schema(self) -> str:
        return SYNTHDOCS_SCHEMA

    def reader(self, schema) -> "SynthDocsReader":
        return SynthDocsReader(self.options)


class SynthDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_parts)]

    def read(self, partition: InputPartition):
        import hashlib
        for doc_id in range(partition.value, self.n_docs, self.n_parts):
            h = hashlib.md5(str(doc_id).encode()).hexdigest()
            yield (doc_id,
                   int(h[:2], 16) % 10,
                   h[:8],
                   h[8:16],
                   int(h[:4], 16))


def register_synthdocs(spark) -> None:
    """Idempotent registration; call before the first format() read in
    a session."""
    spark.dataSource.register(SynthDocsDataSource)


class SynthTicksStreamReader:
    """Streaming half of the Python Data Source API
    (``SimpleDataSourceStreamReader``): a deterministic tick feed.
    Offsets are plain dicts checkpointed by Spark; each micro-batch
    covers rows [offset, offset + rows_per_batch) up to ``n_total``,
    after which read() returns an empty batch with an UNCHANGED offset
    (the stream quiesces instead of inventing data). Rows derive from
    md5(row id) exactly like the batch source, so replay
    (``readBetweenOffsets`` — exactly-once recovery) regenerates
    byte-identical rows from offsets alone, with no external log."""

    def __init__(self, options) -> None:
        self.rows_per_batch = int(options.get("rows_per_batch", 50))
        self.n_total = int(options.get("n_total", 200))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def _rows(self, start: int, end: int) -> list:
        import hashlib
        out = []
        for i in range(start, end):
            h = hashlib.md5(str(i).encode()).hexdigest()
            out.append((i, h[:8], int(h[:4], 16)))
        return out

    def read(self, start: dict):
        # a LIST ITERATOR, not a bare list and not a generator: the
        # runner pickles prefetched rows into its replay cache (bare
        # generators fail to pickle), and on the empty quiesced batch
        # (end offset == start) it calls next() on the value expecting
        # StopIteration — which a bare list raises TypeError on
        s = int(start["offset"])
        e = min(s + self.rows_per_batch, self.n_total)
        return iter(self._rows(s, e)), {"offset": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["offset"]), int(end["offset"])))

    def commit(self, end: dict) -> None:
        pass  # nothing external to acknowledge


SYNTHTICKS_SCHEMA = "tick_id bigint, token string, weight_int bigint"


class SynthTicksDataSource(DataSource):
    """``spark.readStream.format("synthticks")`` — options
    ``rows_per_batch`` (default 50) and ``n_total`` (default 200)."""

    @classmethod
    def name(cls) -> str:
        return "synthticks"

    def schema(self) -> str:
        return SYNTHTICKS_SCHEMA

    def simpleStreamReader(self, schema) -> "SynthTicksStreamReader":
        return SynthTicksStreamReader(self.options)


def register_synthticks(spark) -> None:
    spark.dataSource.register(SynthTicksDataSource)


ZHISTORY_SCHEMA = ("version bigint, op string, n_gens bigint, "
                   "n_deltas bigint, n_tombstones bigint")


class ZHistoryStreamReader:
    """Tail a Z-ordered table's manifest log as a stream — the commit
    feed the change-data capture rides (offsets ARE manifest versions,
    so Spark's checkpoint makes delivery exactly-once: a replayed
    range re-reads the same immutable, versioned manifests and
    regenerates identical rows). Optionally rate-limited: a positive
    ``max_commits_per_batch`` advances at most that many commits per
    micro-batch (bounded steps); ``<= 0`` (the runners' default)
    drains to the manifest head in one batch — still only one
    metadata row per commit. Requires the covered versions to still be retained (run
    mutations with ``vacuum=False`` / a retention window — the same
    contract as Delta's change feed); a pruned version raises cleanly.

    Listing/reads go through :mod:`fsio`'s sessionless local path (the
    reader runs in a Python worker with no JVM gateway); remote
    schemes raise NotImplementedError there — wiring a real object
    store needs its SDK in the worker, which this environment can't
    install."""

    def __init__(self, options) -> None:
        self.table_path = options["tablepath"]
        self.max_commits = int(options.get("max_commits_per_batch", 10))
        self.start_version = int(options.get("starting_version", 1))

    def _mdir(self) -> str:
        from aggregation_duckdb_spark import fsio
        return fsio._join(self.table_path, "_manifest")

    def initialOffset(self) -> dict:
        return {"version": self.start_version - 1}

    def _rows(self, lo: int, hi: int) -> list:
        """One row per commit version in (lo, hi]."""
        from aggregation_duckdb_spark import fsio
        out = []
        for v in range(lo + 1, hi + 1):
            p = fsio._join(self._mdir(), f"v{v:08d}.json")
            if not fsio.exists(None, p):
                raise FileNotFoundError(
                    f"change feed needs manifest version {v} of "
                    f"{self.table_path}, but it was vacuumed — retain "
                    f"history (vacuum=False / keep_versions) while a "
                    f"feed is live")
            m = fsio.read_json(None, p)
            out.append((v, m.get("op", "unknown"),
                        len(m.get("gens", {})),
                        len(m.get("deltas", [])),
                        len(m.get("tombstones", []))))
        return out

    def read(self, start: dict):
        from aggregation_duckdb_spark import fsio
        s = int(start["version"])
        latest = fsio.latest_version(None, self._mdir())
        # max_commits <= 0 means "drain to the head in ONE batch":
        # Spark's Python micro-batch source runs a single batch per
        # start() (no true AvailableNow), so a bounded cap costs one
        # ~3s stream startup per cap-sized step — a 10k-commit backlog
        # at cap 10 would pay 1,000 startups. Unbounded, the batch is
        # still only metadata rows (one per commit); the row-sized
        # work happens downstream in foreachBatch.
        e = latest if self.max_commits <= 0 \
            else min(latest, s + self.max_commits)
        if e <= s:
            return iter([]), {"version": s}
        return iter(self._rows(s, e)), {"version": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(int(start["version"]),
                               int(end["version"])))

    def commit(self, end: dict) -> None:
        pass  # the manifest log is the external system's own record


class ZHistoryDataSource(DataSource):
    """``spark.readStream.format("zhistory").option("tablePath", p)``
    — one row per NEW manifest commit of the Z-ordered table at ``p``.
    Options: ``tablePath`` (required), ``max_commits_per_batch``
    (default 10), ``starting_version`` (default 1)."""

    @classmethod
    def name(cls) -> str:
        return "zhistory"

    def schema(self) -> str:
        return ZHISTORY_SCHEMA

    def simpleStreamReader(self, schema) -> "ZHistoryStreamReader":
        return ZHistoryStreamReader(self.options)


def register_zhistory(spark) -> None:
    spark.dataSource.register(ZHistoryDataSource)
