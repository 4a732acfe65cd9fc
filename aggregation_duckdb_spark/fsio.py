"""Metadata IO for durable indexes, routed through Hadoop's FileSystem.

The durable artifacts (Z-order layout, IVF cells, dedup projections,
BM25 postings) write their DATA through Spark writers, which already
speak every Hadoop filesystem. Their small METADATA files — bounds,
params, corpus stats, table manifests — previously used bare
``open()``/``os``/``shutil``, which fail outright on ``hdfs://`` or
``s3a://`` paths, the only place a 100 TB table lives. This module is
the one place that bridges that gap: each helper resolves the path's
own filesystem via ``Path.getFileSystem(hadoopConf)`` (the same
resolution Spark's writers use), so a ``file:``, ``hdfs:`` or object
-store URI all behave identically.

Atomicity contract for mutable metadata: a manifest is never
overwritten in place — each update writes a temp file and renames it
to a versioned name (``v00000042.json``); the rename is the commit
point and readers take the highest complete version, so a crashed
writer leaves an invisible temp file, never a torn manifest. Two
commit primitives split by what the content depends on:

- :func:`write_json_version` — BLIND appends (watermarks, logs,
  sidecars): content independent of the state it lands on; losing a
  rename race just means committing one version later (auto-retry).
- :func:`write_json_at` — STATE-DERIVED commits (table manifests): a
  committer that derived its state from version N targets N+1
  SPECIFICALLY; an intervening commit surfaces as
  :class:`CommitCollision` for the caller to rebase or abort
  (``layout._commit``'s optimistic-concurrency loop), never to be
  silently committed past.

Multi-writer safety is scoped to filesystems whose rename is an
atomic fail-if-destination-exists operation — HDFS (and local paths,
where the fallback uses ``os.link`` / ``O_CREAT|O_EXCL``, both atomic
existence checks). On S3A and similar object stores, "rename" is
copy+delete behind a check-then-act existence test: two racing
committers can BOTH report success and one version is silently lost —
the same reason Delta Lake requires a LogStore/conditional-put there.
:func:`atomic_rename_scheme` classifies a path; on a non-atomic
scheme the contract degrades to SINGLE-WRITER (still crash-safe:
readers only see complete versions). Concurrent readers are always
safe everywhere.

Spark Connect has no JVM gateway; helpers then fall back to Python
file IO for local/``file:`` paths (same semantics, local-only reach)
and raise clearly for remote schemes rather than corrupting anything.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid
from contextlib import contextmanager

_VERSION_RE = re.compile(r"^v(\d{8})\.json$")

# Object-store schemes whose FileSystem.rename is copy+delete behind a
# check-then-act existence test — NOT atomic, so the CommitCollision
# protocol cannot detect two racing committers there (one manifest
# version would be silently lost). Azure ADLS Gen2 (abfs/abfss) and
# HDFS do have atomic rename and are not listed.
_NON_ATOMIC_RENAME_SCHEMES = frozenset(
    {"s3", "s3a", "s3n", "gs", "oss", "cos", "swift", "wasb", "wasbs"})


_WARNED_NON_ATOMIC: set[str] = set()


def atomic_rename_scheme(path: str) -> bool:
    """Whether ``path``'s filesystem gives the atomic
    fail-if-destination-exists rename the multi-writer commit
    protocol needs. False => run SINGLE-WRITER against this table (or
    front it with a conditional-put LogStore); crash-safety and
    reader correctness hold either way."""
    m = re.match(r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", path)
    scheme = m.group(1).lower() if m else "file"
    return scheme not in _NON_ATOMIC_RENAME_SCHEMES


class CommitCollision(RuntimeError):
    """Two committers raced for the same manifest version name. The
    loser's temp file is already cleaned up; retrying is safe —
    re-read the latest manifest, re-validate the mutation's
    preconditions against it, and commit again (what
    ``layout._commit`` does with bounded retries)."""


def _gateway(spark):
    """(jvm, hadoopConf) when the classic JVM gateway exists, else
    None (Spark Connect)."""
    try:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        if jvm is None or conf is None:
            return None
        return jvm, conf
    except Exception:
        return None


def _fs(spark, path: str):
    jvm, conf = _gateway(spark)
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(conf), jpath, jvm


def _local_path(path: str) -> str:
    """Local fallback: accept bare and file:-scheme paths only.

    ``file://`` URIs may carry an authority component
    (``file://localhost/x``); only the empty and ``localhost``
    authorities are local — anything else (``file://nas01/x``) names a
    remote host this fallback cannot reach, so it raises instead of
    silently treating ``nas01/x`` as a relative path."""
    if path.startswith("file://"):
        rest = path[len("file://"):]
        if rest and not rest.startswith("/"):
            authority, sep, tail = rest.partition("/")
            if authority not in ("", "localhost"):
                raise NotImplementedError(
                    f"no JVM gateway (Spark Connect) and non-local "
                    f"file:// authority {authority!r}: {path}")
            rest = "/" + tail
        return rest or "/"
    if path.startswith("file:"):
        return path[len("file:"):]
    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path):
        raise NotImplementedError(
            f"no JVM gateway (Spark Connect) and non-local scheme: {path}")
    return path


def read_bytes(spark, path: str) -> bytes:
    if _gateway(spark) is None:
        with open(_local_path(path), "rb") as f:
            return f.read()
    fs, jpath, jvm = _fs(spark, path)
    stream = fs.open(jpath)
    try:
        out = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 65536, False)
        return bytes(out.toByteArray())
    finally:
        stream.close()


def write_bytes(spark, path: str, data: bytes) -> None:
    """Create (overwrite) ``path`` with ``data``. Not atomic by itself —
    mutable metadata goes through :func:`write_json_version` instead."""
    if _gateway(spark) is None:
        local = _local_path(path)
        parent = os.path.dirname(local)
        if parent:  # a bare filename has no parent to create
            os.makedirs(parent, exist_ok=True)
        with open(local, "wb") as f:
            f.write(data)
        return
    fs, jpath, _ = _fs(spark, path)
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(data))
    finally:
        stream.close()


def read_text(spark, path: str) -> str:
    return read_bytes(spark, path).decode("utf-8")


def write_text(spark, path: str, text: str) -> None:
    write_bytes(spark, path, text.encode("utf-8"))


def read_json(spark, path: str):
    return json.loads(read_text(spark, path))


def write_json(spark, path: str, obj) -> None:
    write_text(spark, path, json.dumps(obj))


def exists(spark, path: str) -> bool:
    if _gateway(spark) is None:
        return os.path.exists(_local_path(path))
    fs, jpath, _ = _fs(spark, path)
    return bool(fs.exists(jpath))


def list_names(spark, path: str) -> list[str]:
    """Sorted child names of a directory ([] if it doesn't exist)."""
    if _gateway(spark) is None:
        local = _local_path(path)
        return sorted(os.listdir(local)) if os.path.isdir(local) else []
    fs, jpath, _ = _fs(spark, path)
    if not fs.exists(jpath):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(jpath))


def delete(spark, path: str) -> None:
    """Recursive delete; missing paths are a no-op."""
    if _gateway(spark) is None:
        local = _local_path(path)
        if os.path.isdir(local):
            shutil.rmtree(local)
        elif os.path.exists(local):
            os.remove(local)
        return
    fs, jpath, _ = _fs(spark, path)
    if fs.exists(jpath):
        fs.delete(jpath, True)


def rename(spark, src: str, dst: str) -> bool:
    """Rename that FAILS (returns False) when ``dst`` already exists —
    the HDFS ``FileSystem.rename`` contract :func:`write_json_version`
    relies on to detect two committers racing for the same version
    name. The local fallback must match: bare ``os.rename`` silently
    REPLACES an existing destination on POSIX (both racers would
    "succeed" and a manifest version would be lost), so it links the
    source to the destination first — ``os.link`` is atomic and raises
    ``FileExistsError`` if the destination exists — then unlinks the
    source. Filesystems without hard links (some overlay/NFS/FAT
    mounts raise EPERM/ENOTSUP/EXDEV) fall back to an
    ``O_CREAT|O_EXCL`` exclusive create — the atomic existence check —
    and write the content THROUGH that fd (one write + fsync) rather
    than reserving an empty name and renaming later: a crash between
    an empty reservation and its rename would leave a torn (empty)
    file at a committed version name, which readers treat as loud
    corruption; a direct write narrows the window to a short file on
    crash mid-syscall, the same exposure any non-rename filesystem
    has."""
    if _gateway(spark) is None:
        lsrc, ldst = _local_path(src), _local_path(dst)
        try:
            os.link(lsrc, ldst)
        except FileExistsError:
            return False
        except OSError:
            # hard links unsupported on this mount
            try:
                fd = os.open(ldst, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            except FileExistsError:
                return False
            try:
                with open(lsrc, "rb") as f:
                    view = memoryview(f.read())
                # os.write may write fewer bytes than asked (pipes,
                # some network mounts, large buffers): loop until the
                # whole manifest is down before the name is treated as
                # committed — a short single write would commit a
                # truncated manifest at a final version name.
                while view:
                    view = view[os.write(fd, view):]
                os.fsync(fd)
            finally:
                os.close(fd)
            os.unlink(lsrc)
            return True
        os.unlink(lsrc)
        return True
    fs, jsrc, jvm = _fs(spark, src)
    return bool(fs.rename(jsrc, jvm.org.apache.hadoop.fs.Path(dst)))


def size_of(spark, path: str) -> int:
    """File size in bytes (0 if it doesn't exist)."""
    if _gateway(spark) is None:
        local = _local_path(path)
        return os.path.getsize(local) if os.path.exists(local) else 0
    fs, jpath, _ = _fs(spark, path)
    if not fs.exists(jpath):
        return 0
    return int(fs.getFileStatus(jpath).getLen())


def list_files_recursive(spark, path: str) -> list[tuple[str, int]]:
    """Every file under ``path`` as ``(path, size)`` in ONE recursive
    listing ([] if the root doesn't exist) — ``FileSystem.listFiles``
    with ``recursive=True``, which object stores implement as a flat
    LIST instead of a per-file getFileStatus round trip; the metadata
    cost of a DESCRIBE-style walk stays O(list pages), not O(files)
    RPCs."""
    if _gateway(spark) is None:
        local = _local_path(path)
        if not os.path.isdir(local):
            return []
        out = []
        for root, _, names in os.walk(local):
            for n in names:
                p = os.path.join(root, n)
                out.append((p, os.path.getsize(p)))
        return sorted(out)
    fs, jpath, _ = _fs(spark, path)
    if not fs.exists(jpath):
        return []
    it = fs.listFiles(jpath, True)
    out = []
    while it.hasNext():
        st = it.next()
        out.append((st.getPath().toString(), int(st.getLen())))
    return sorted(out)


def modified_ms(spark, path: str) -> int:
    """Last-modification time of a path in epoch milliseconds (0 if it
    doesn't exist) — what vacuum's retention window compares against."""
    if _gateway(spark) is None:
        local = _local_path(path)
        return int(os.path.getmtime(local) * 1000) \
            if os.path.exists(local) else 0
    fs, jpath, _ = _fs(spark, path)
    if not fs.exists(jpath):
        return 0
    return int(fs.getFileStatus(jpath).getModificationTime())


def mkdirs(spark, path: str) -> None:
    if _gateway(spark) is None:
        os.makedirs(_local_path(path), exist_ok=True)
        return
    fs, jpath, _ = _fs(spark, path)
    fs.mkdirs(jpath)


def _join(base: str, *parts: str) -> str:
    """Scheme-preserving path join (os.path.join would eat 'hdfs://')."""
    out = base.rstrip("/")
    for p in parts:
        out = f"{out}/{p.strip('/')}"
    return out


def latest_version(spark, manifest_dir: str) -> int:
    """Highest committed manifest version in ``manifest_dir`` (0 if
    none)."""
    best = 0
    for name in list_names(spark, manifest_dir):
        m = _VERSION_RE.match(name)
        if m:
            best = max(best, int(m.group(1)))
    return best


def read_json_latest(spark, manifest_dir: str):
    """The newest committed manifest, or None if none exists."""
    v = latest_version(spark, manifest_dir)
    if v == 0:
        return None
    return read_json(spark, _join(manifest_dir, f"v{v:08d}.json"))


def write_json_at(spark, manifest_dir: str, obj, version: int) -> None:
    """Commit ``obj`` at EXACTLY the given version name — the
    optimistic-concurrency primitive: a committer that derived its
    state from version N attempts N+1 specifically, so an intervening
    commit (which took N+1) surfaces as :class:`CommitCollision`
    rather than being silently overwritten-past. Write a temp file,
    rename-if-absent to ``v{version}.json``; the rename is the commit
    point — readers only ever see complete versions. Collision
    DETECTION requires atomic rename (module docstring): on an object
    store without it this warns once and the caller must guarantee a
    single writer."""
    if not atomic_rename_scheme(manifest_dir) \
            and manifest_dir not in _WARNED_NON_ATOMIC:
        _WARNED_NON_ATOMIC.add(manifest_dir)
        import warnings
        warnings.warn(
            f"{manifest_dir}: this filesystem's rename is not atomic —"
            f" concurrent-writer collisions CANNOT be detected here; "
            f"run single-writer (crash-safety is unaffected)",
            RuntimeWarning, stacklevel=2)
    mkdirs(spark, manifest_dir)
    tmp = _join(manifest_dir, f".tmp-{uuid.uuid4().hex}")
    write_json(spark, tmp, obj)
    final = _join(manifest_dir, f"v{version:08d}.json")
    if not rename(spark, tmp, final):
        delete(spark, tmp)
        raise CommitCollision(
            f"manifest commit lost a rename race (concurrent writer): "
            f"{final}")


def write_json_version(spark, manifest_dir: str, obj,
                       retries: int = 8) -> int:
    """Commit ``obj`` as the next manifest version, retrying past
    collisions — the BLIND-append commit (watermarks, logs): content
    does not depend on the state it lands on, so losing a race just
    means committing one version later. State-derived commits (table
    manifests) must NOT use this — they go through
    :func:`write_json_at` with their base version so staleness is
    detected, not papered over."""
    for _ in range(retries + 1):
        nxt = latest_version(spark, manifest_dir) + 1
        try:
            write_json_at(spark, manifest_dir, obj, nxt)
            return nxt
        except CommitCollision:
            continue
    raise CommitCollision(
        f"manifest commit lost a rename race {retries + 1} times: "
        f"{manifest_dir}")


@contextmanager
def dynamic_partition_overwrite(spark):
    """Scope ``spark.sql.sources.partitionOverwriteMode=dynamic`` to a
    block: an overwrite-with-partitionBy write inside it replaces ONLY
    the partitions present in the data — the idempotent-replay
    primitive (batch N's rewrite touches batch_id=N alone). The prior
    setting is restored on exit — crucially restored to UNSET when it
    was unset, or later overwrite+partitionBy writes would silently
    become partial overwrites."""
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        yield
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        else:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")


INGEST_DIR = "_ingest"


def read_ingest_watermark(spark, index_path: str) -> int:
    """Highest batch id already ingested into a durable index (-1 if
    none recorded) — the replay guard for at-least-once micro-batch
    delivery (Structured Streaming's foreachBatch redelivers a batch
    id after a crash between sink write and checkpoint commit; the
    watermark lets the index-append verbs skip the replay, the same
    pattern the Z-ordered table's ``last_batch_id`` uses)."""
    m = read_json_latest(spark, _join(index_path, INGEST_DIR))
    return -1 if m is None else int(m.get("last_batch_id", -1))


def commit_ingest_watermark(spark, index_path: str,
                            batch_id: int) -> None:
    """Record ``batch_id`` as ingested (atomic versioned commit)."""
    write_json_version(spark, _join(index_path, INGEST_DIR),
                       {"last_batch_id": int(batch_id)})


def ingest_batches(spark, table_dir: str) -> list[int]:
    """Distinct ``__ingest_batch`` partition values of a stored-index
    table, read from the DIRECTORY LISTING alone — the metadata-only
    probe the index maintenance policies decide from (no parquet
    footers, no Spark job; the ``maintain_zordered`` manifest-read
    analogue for the Hive-partitioned index tables). Missing table
    directory → empty list (``list_names`` contract)."""
    return sorted(int(n.split("=", 1)[1])
                  for n in list_names(spark, table_dir)
                  if n.startswith("__ingest_batch="))


def prune_versions(spark, manifest_dir: str, keep: int = 5) -> None:
    """Delete all but the newest ``keep`` manifest versions (each is a
    few hundred bytes; this only bounds listing growth)."""
    versions = sorted(
        int(m.group(1)) for m in
        (_VERSION_RE.match(n) for n in list_names(spark, manifest_dir)) if m)
    for v in versions[:-keep] if keep else versions:
        delete(spark, _join(manifest_dir, f"v{v:08d}.json"))
