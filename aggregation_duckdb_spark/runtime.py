"""Execution-runtime policy shared by the operator hot paths.

Two concerns live here, both "how the cluster runs it", not "what is
computed":

**Materialization.** The iterative/staged operators (LSH dedup,
connected components, the shingle census) cut lineage and pin shared
intermediates with ``localCheckpoint`` — the right default on a single
machine (no replication cost, no filesystem round-trip). But
``localCheckpoint`` stores blocks on executors WITHOUT replication: on
a 1000-executor cluster one lost executor kills a multi-hour job. The
strategy is therefore pluggable:

- ``local`` (default) — ``df.localCheckpoint(eager=True)``.
- ``reliable`` — ``df.checkpoint(eager=True)`` against a checkpoint
  directory (HDFS/object store on a real cluster); survives executor
  loss.
- ``parquet`` — explicit write-then-read round-trip; additionally
  survives DRIVER loss (a restarted job can resume from the written
  signatures — the "write signatures, then join" shape the dedup
  module docstring describes).

Select via :func:`set_materialization` or the
``SPARK_GRAFT_MATERIALIZE`` / ``SPARK_GRAFT_MATERIALIZE_DIR``
environment variables. Every strategy has identical semantics (a
materialized, lineage-free, nondeterminism-pinned frame) — pinned by
``tests/test_extensions.py::test_reliable_materialization_same_results``.

**Parallelism flooring.** Small local parquet inputs arrive as one
split, which would serialize a CPU-bound pass (shingling, LSH
signatures) on one core; ``ensure_parallelism`` repartitions up to the
session's parallelism only when the input has fewer partitions. At
cluster scale the scan already yields >= cores partitions and this is
a no-op. The partition probe uses the classic ``df.rdd`` API when
available and degrades gracefully under Spark Connect (no
``sparkContext``/``rdd`` there): it falls back to
``spark.sql.shuffle.partitions`` as the target and skips the
probe-before-repartition optimization rather than crashing.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame

STRATEGIES = ("local", "reliable", "parquet")

_strategy: str = os.environ.get("SPARK_GRAFT_MATERIALIZE", "local")
_directory: str | None = os.environ.get("SPARK_GRAFT_MATERIALIZE_DIR")


def set_materialization(strategy: str, directory: str | None = None) -> None:
    """Select the materialization strategy for every subsequent
    :func:`materialize` call. ``directory`` backs the ``reliable`` and
    ``parquet`` strategies (defaults to a per-application temp dir —
    fine locally; on a real cluster pass an HDFS/object-store path)."""
    if strategy not in STRATEGIES:
        raise ValueError(f"strategy must be one of {STRATEGIES}: {strategy}")
    global _strategy, _directory
    _strategy = strategy
    if directory is not None:
        _directory = directory


def get_materialization() -> str:
    return _strategy


def _base_dir(df: DataFrame) -> str:
    if _directory:
        return _directory
    app_id = df.sparkSession.conf.get("spark.app.id", "app")
    return os.path.join(tempfile.gettempdir(), "spark-graft-mat", app_id)


def materialize(df: DataFrame) -> DataFrame:
    """Materialize ``df`` (cut lineage, pin nondeterministic columns,
    make it safely shareable by multiple downstream consumers) under
    the session-wide strategy. See the module docstring for when each
    strategy is the right call."""
    if _strategy == "local":
        return df.localCheckpoint(eager=True)
    if _strategy == "reliable":
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(os.path.join(_base_dir(df), "checkpoints"))
        return df.checkpoint(eager=True)
    path = os.path.join(_base_dir(df), f"mat-{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ``df`` up to the session's parallelism iff the scan
    produced fewer partitions (see module docstring). Safe under Spark
    Connect: without the classic ``rdd`` probe it repartitions to the
    shuffle-partition setting unconditionally — correct, one extra
    exchange on an input that was about to be CPU-bound anyway."""
    spark = df.sparkSession
    try:
        par = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() >= par:
            return df
    except Exception:  # Spark Connect: no sparkContext / .rdd
        par = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return df.repartition(par)


#: Gate for deliberate broadcast hints, as a multiple of the session's
#: autoBroadcastJoinThreshold. The hint exists to override stats the
#: optimizer UNDERESTIMATES on frames we know are join-profitable —
#: not to force unbounded sides through the block manager; 10x the
#: auto threshold (640 MB at the session default 64m) is comfortably
#: inside executor memory while still hinting every genuinely
#: dimension-shaped side.
BROADCAST_HINT_MULTIPLE = 10


def _parse_bytes(s: str) -> int:
    """'64m' / '64MB' / '67108864' → bytes (Spark conf spellings)."""
    t = str(s).strip().lower().removesuffix("b")
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if t and t[-1] in units:
        return int(float(t[:-1]) * units[t[-1]])
    return int(t)


def _gate_bytes(spark) -> int:
    """The deliberate-hint gate in bytes: BROADCAST_HINT_MULTIPLE x
    the session's autoBroadcastJoinThreshold; 0 when auto-broadcast is
    disabled (no hints then — the user turned broadcasting off)."""
    try:
        thr = _parse_bytes(spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"))
    except Exception:
        thr = 64 << 20
    return BROADCAST_HINT_MULTIPLE * thr if thr > 0 else 0


#: Conservative in-memory expansion of snappy-parquet bytes for
#: narrow key columns (dictionary + RLE encoding routinely packs keys
#: 4-10x tighter than the unpacked broadcast hash relation).
PARQUET_BROADCAST_EXPANSION = 8

#: Per-type in-memory width estimates (bytes) for
#: :func:`estimated_row_bytes` — Catalyst's own defaultSize values,
#: with strings/binary at a key-column-realistic 32.
_VAR_WIDTH_DEFAULT = 32


def estimated_row_bytes(schema) -> int:
    """Schema-based per-row byte estimate for frames whose Catalyst
    size estimate is untrustworthy (derived projections inherit the
    parent SCAN's stats — the ``_auto_bucket_bits`` lesson). Fixed
    types use their storage width; variable-width types (string,
    binary, arrays, structs) use a flat default that is realistic for
    the key/hash columns these estimates gate."""
    total = 0
    for f in schema.fields:
        w = getattr(f.dataType, "defaultSize", None)
        try:
            w = int(w) if not callable(w) else int(w())
        except Exception:
            w = None
        tn = f.dataType.typeName()
        if w is None or tn in ("string", "binary", "array", "map",
                               "struct"):
            w = _VAR_WIDTH_DEFAULT
        total += w
    return max(8, total)


def broadcast_if_counted(df: DataFrame, known_rows: int | None = None,
                         max_bytes: int | None = None) -> DataFrame:
    """Row-count-gated broadcast hint for frames whose Catalyst size
    estimate LIES — derived key-set projections of user batches
    inherit the parent scan's byte stats, so :func:`broadcast_if_small`
    would drop the hint on a 100-row key set projected off a wide
    frame. Gate on an exact row count instead: ``known_rows`` when the
    caller already counted (mutation verbs usually did, for their
    metrics), else one ``count()`` job — a per-partition partial count
    plus a 1-row exchange, the cheapest exact probe Spark has — times
    the schema-estimated row width (:func:`estimated_row_bytes`).

    ``known_rows=None`` with no session gate (auto-broadcast disabled)
    returns unhinted WITHOUT running the count."""
    from pyspark.sql import functions as F

    gate = max_bytes if max_bytes is not None \
        else _gate_bytes(df.sparkSession)
    if gate <= 0:
        return df
    n = df.count() if known_rows is None else int(known_rows)
    return F.broadcast(df) if n * estimated_row_bytes(df.schema) <= gate \
        else df


def broadcast_if_small(df: DataFrame, max_bytes: int | None = None,
                       known_bytes: int | None = None) -> DataFrame:
    """Size-gated broadcast hint: ``F.broadcast`` is a HARD hint that
    overrides ``spark.sql.autoBroadcastJoinThreshold`` with no upper
    bound — correct and fast when the side really is dimension-shaped,
    an executor/driver OOM when a "dimension" silently scales with the
    fact data (TPC-H customer is ~2 TB at 100 TB of orders; q21's
    filtered orders is ~25% of fact bytes). Hint only when Catalyst's
    optimized-plan size estimate is under the gate (default
    :data:`BROADCAST_HINT_MULTIPLE` x the session's auto threshold);
    otherwise return the frame UNHINTED and let AQE pick the join
    strategy from runtime shuffle statistics — at scale that is a
    shuffled hash/sort-merge join, which is the right answer there.

    An unknown or sentinel estimate also returns unhinted: forcing a
    broadcast on a side we cannot size is exactly the failure mode
    this gate exists to prevent.

    ``known_bytes`` bypasses the Catalyst estimate with a
    caller-known in-memory size — e.g. tombstone key sets, whose
    on-disk parquet bytes are free filesystem metadata (scale by
    :data:`PARQUET_BROADCAST_EXPANSION` before passing)."""
    from pyspark.sql import functions as F

    if max_bytes is None:
        max_bytes = _gate_bytes(df.sparkSession)
        if max_bytes <= 0:      # auto-broadcast disabled: no hints
            return df
    if known_bytes is not None:
        return F.broadcast(df) if known_bytes <= max_bytes else df
    try:
        est = int(str(df._jdf.queryExecution().optimizedPlan()
                      .stats().sizeInBytes()))
    except Exception:
        return df
    if est <= 0 or est >= (1 << 60):    # Catalyst's unknown sentinel
        return df
    return F.broadcast(df) if est <= max_bytes else df
