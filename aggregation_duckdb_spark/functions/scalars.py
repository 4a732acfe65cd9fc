"""The reference workload's scalar functions, Spark-native.

Each helper cites the reference site it reproduces
(/root/reference/aggregation_example.sql) and resolves the semantic
differences SURVEY §1.2/§2.7 found between DuckDB and Spark:

- 1-based array indexing returns NULL (not error) out of range —
  the reference's level-pivot columns depend on it (:188-201);
- ASC defaults to NULLS FIRST in Spark but NULLS LAST in the
  reference's window (:184-186);
- ``||`` concat is NULL-propagating in DuckDB — ``F.concat`` matches,
  ``F.concat_ws`` does not.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def uuid_col() -> Column:
    """``DEFAULT uuid()`` (:3). Nondeterministic by design — the engine
    prefers deterministic surrogate ids (Hierarchy deterministic_ids);
    this exists for reference-faithful mode."""
    return F.expr("uuid()")


def struct_literal(**fields: Column) -> Column:
    """DuckDB struct literal ``{k: v, ...}`` (:111-119). Field order
    follows keyword order (Python ≥3.7 dicts preserve it)."""
    return F.struct(*[col.alias(name) for name, col in fields.items()])


def array_append_compat(arr: Column, elem: Column) -> Column:
    """``array_append`` (:151-161, :396-398); Spark ≥3.4 native."""
    return F.array_append(arr, elem)


def element_at_1based(arr: Column, index: int) -> Column:
    """DuckDB ``arr[n]`` — 1-based, NULL out of range (:188-201).

    Size-guarded ``getItem`` rather than ``(try_)element_at``: the
    semantics are identical (NULL out of range, NULL array → NULL, ANSI
    or not), but Spark 4.1.2's ElementAt breaks whole-stage codegen on
    arrays of non-literal structs ("isNull_N is not an rvalue" →
    silent interpreted fallback), and the hierarchy path pivot sits on
    exactly that shape. GetArrayItem with the in-range guard compiles.
    """
    return F.when(F.size(arr) >= index, arr[index - 1])


def serialize_array(arr: Column, elem_type: str = "string",
                    sep: str = "|") -> Column:
    """Flatten an array column to one delimited string — REQUIRED for
    every array-typed matrix-entry output: the driver's pandas hasher
    cannot canonicalize list cells (factorize → ``unhashable type:
    'list'``), and scripts/oracle_check.py rejects nested output types
    for the same reason. ``elem_type`` is the per-element cast applied
    before rendering (pass ``"bigint"`` for whole-valued doubles so
    Spark prints ``12``, not ``12.0``, matching DuckDB's
    ``array_to_string``)."""
    return F.concat_ws(
        sep, F.transform(arr, lambda x: x.cast(elem_type).cast("string")))


def indent(level_number: Column, per_level: int = 7,
           fill: str = "-") -> Column:
    """``LPAD('-', (level-1)*7, '-')`` (:334-337, :435-438): visual
    hierarchy indent. n=0 yields '' in both engines."""
    return F.lpad(F.lit(fill), (level_number - 1) * per_level, fill)


def sql_concat(*cols: Column) -> Column:
    """DuckDB ``||`` (:334-338): NULL-propagating concat. ``F.concat``
    has identical NULL semantics; ``concat_ws`` (skips NULLs) does not."""
    return F.concat(*cols)


def date_lit(iso: str) -> Column:
    """``DATE '2022-01-01'`` literal (:225 etc.)."""
    return F.lit(iso).cast("date")


def path_sort_key(path: Column, key_field: str = "node_natural_key") -> Column:
    """Deterministic DFS sort key replacing the reference's
    UUID-string ROW_NUMBER trick (:184-186; SURVEY §1.4.1): the
    root-to-node array of natural keys. Arrays compare element-wise in
    both Spark and DuckDB, parents (strict prefixes) sort before their
    children, and siblings order by natural key — stable across runs
    and engines."""
    return F.transform(path, lambda s: s[key_field])
