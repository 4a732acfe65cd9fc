"""Core hierarchy engine.

The reference flattens its adjacency-list hierarchy twice with two
separate recursive CTEs — once into a reporting dimension
(aggregation_example.sql:86-204) and once into an ancestor/descendant
closure table (:351-425). SQL CTEs cannot share work; DataFrames can.
This engine runs ONE breadth-first flattening that carries each node's
root-to-node path as an array of structs, then derives:

- the reporting dim by pivoting ``path[i]`` into ``level_i_*`` columns
  (width-parameterized — fixing the reference's hard-coded 3-level
  limitation it warns about at :202 and :325), and
- the closure table by ``explode(path)`` — every element of a node's
  path IS one (ancestor, descendant) pair, so the second recursion is
  unnecessary. Closure cardinality = Σ node depths (17 for the 7-node
  reference tree), identical to the reference's unfiltered-anchor CTE
  (:368-382).

Determinism: the reference's sibling sort order is UUID-lexicographic,
i.e. random per run (ROW_NUMBER over the stringified path, :184-186 —
see SURVEY.md §1.4.1). The semantic invariant is depth-first pre-order;
this engine keys the order on the path of natural keys (an
``array<long>`` compared lexicographically), which is deterministic and
portable across engines.

Scale notes (100 TB discipline): hierarchies are dimension-sized (≤
millions of nodes) even when facts are huge. The flattening loop joins
dim × dim with the frontier broadcast, runs depth — not node-count —
iterations, and materializes each level (``runtime.materialize`` —
pluggable local/reliable/parquet) to keep lineage flat. The
single global window for ``node_sort_order`` runs on one task by
design; it is a dim-only operation and never touches facts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from aggregation_duckdb_spark.runtime import materialize

NODE_ATTRS = ("node_id", "node_natural_key", "node_name", "level_name",
              "parent_node_id", "is_root", "is_leaf", "level_number")


@dataclass
class HierarchyConfig:
    # cycle guard: DuckDB relies on FK acyclicity (:11-12); Spark cannot,
    # so the loop raises if the frontier is still non-empty at max_depth.
    max_depth: int = 32
    validate: bool = True
    # Hierarchies at or below this node count are flattened driver-side
    # in one collect instead of the per-level BFS loop (which costs
    # several local Spark jobs *per tree level*). Dims are driver-sized
    # by definition — the reference's is 7 rows; even a million-node
    # hierarchy is a few hundred MB. Set 0 to force the distributed
    # loop (property tests assert both paths agree).
    local_build_threshold: int = 100_000


class HierarchyValidationError(ValueError):
    """A constraint the reference enforces via PK/UK/FK DDL (:9-12) was
    violated; Spark cannot enforce constraints, so we assert at build."""


class Hierarchy:
    """An adjacency-list hierarchy over a Spark DataFrame.

    ``nodes`` must carry the canonical columns: ``node_id`` (surrogate,
    string), ``node_natural_key`` (long — the key facts join on),
    ``node_name``, ``level_name``, ``parent_node_id`` (NULL ⇔ root).
    Use :meth:`from_adjacency` to build from natural-key parent links.
    """

    def __init__(self, nodes: DataFrame, config: HierarchyConfig | None = None):
        self.config = config or HierarchyConfig()
        self._raw = nodes
        self._prepared: DataFrame | None = None
        self._flat: DataFrame | None = None
        self._depth: int | None = None

    # -- construction -------------------------------------------------

    @classmethod
    def from_adjacency(cls, df: DataFrame, *, natural_key: str, name: str,
                       level_name: str, parent_natural_key: str,
                       config: HierarchyConfig | None = None,
                       deterministic_ids: bool = True) -> "Hierarchy":
        """Build from (natural_key, name, level_name, parent_natural_key).

        Surrogate ids: the reference uses ``DEFAULT uuid()`` (:3), which
        is nondeterministic (SURVEY §1.4.1). Default here is
        ``md5(natural_key)`` — stable across runs and engines, which is
        what golden tests and the DuckDB oracle need. Pass
        ``deterministic_ids=False`` for reference-faithful uuids (the
        frame is checkpointed first so the nondeterministic ids are
        fixed before the parent self-resolution join).
        """
        nk = F.col(natural_key).cast("long")
        pk = F.col(parent_natural_key).cast("long")
        if deterministic_ids:
            nodes = df.select(
                F.md5(nk.cast("string")).alias("node_id"),
                nk.alias("node_natural_key"),
                F.col(name).alias("node_name"),
                F.col(level_name).alias("level_name"),
                F.when(pk.isNotNull(), F.md5(pk.cast("string"))).alias("parent_node_id"),
            )
        else:
            with_ids = materialize(df.select(
                F.expr("uuid()").alias("node_id"),
                nk.alias("node_natural_key"),
                F.col(name).alias("node_name"),
                F.col(level_name).alias("level_name"),
                pk.alias("__parent_nk"),
            ))  # pin nondeterministic ids before self-join
            parents = with_ids.select(F.col("node_natural_key").alias("__p_nk"),
                                      F.col("node_id").alias("__p_id"))
            nodes = (with_ids
                     .join(F.broadcast(parents), with_ids["__parent_nk"] == parents["__p_nk"], "left")
                     .select("node_id", "node_natural_key", "node_name", "level_name",
                             F.col("__p_id").alias("parent_node_id")))
        return cls(nodes, config)

    # -- node preparation (aggregation_example.sql:60-78) --------------

    def prepared(self) -> DataFrame:
        """Nodes + ``is_root``/``is_leaf`` flags.

        is_root: parent IS NULL (:67-70). is_leaf: the reference uses a
        NOT-IN subquery whose correctness rides on three-valued logic
        (:71-76, SURVEY §1.4.2); the idiomatic, equivalent form is a
        left join against the distinct non-NULL parent ids with a
        null-check — same result, no 3VL fragility, and Catalyst plans
        it as a broadcast join.
        """
        if self._prepared is not None:
            return self._prepared
        nodes = self._raw
        parent_ids = (nodes.select(F.col("parent_node_id").alias("__pid"))
                      .where(F.col("__pid").isNotNull()).distinct())
        prepared = (nodes
                    .join(F.broadcast(parent_ids), nodes["node_id"] == parent_ids["__pid"], "left")
                    .select(
                        "node_id", "node_natural_key", "node_name", "level_name",
                        "parent_node_id",
                        F.col("parent_node_id").isNull().alias("is_root"),
                        F.col("__pid").isNull().alias("is_leaf"),
                    ))
        prepared = materialize(prepared)
        if self.config.validate:
            self._validate(prepared)
        self._prepared = prepared
        return prepared

    def _validate(self, nodes: DataFrame) -> None:
        """Build-time assertions standing in for the reference's PK (:9),
        UNIQUE (:10), self-FK (:11-12) constraints."""
        stats = nodes.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("node_natural_key")).alias("nk"),
            F.count(F.col("node_natural_key")).alias("nk_nonnull"),
            F.count_distinct(F.col("node_id")).alias("nid"),
            F.sum(F.col("is_root").cast("long")).alias("roots"),
        ).first()
        if stats["nk_nonnull"] != stats["n"]:
            raise HierarchyValidationError(
                "node_natural_key is NULL (facts join on it; NOT NULL per :4-6)")
        # SUM over zero rows is NULL, not 0 — catch the empty frame
        # explicitly so both build paths raise 'no root' identically
        if stats["n"] == 0 or stats["roots"] is None:
            raise HierarchyValidationError(
                "no root (empty node set)")
        if stats["nk"] != stats["n"]:
            raise HierarchyValidationError(
                f"node_natural_key not unique: {stats['nk']} distinct of {stats['n']} rows")
        if stats["nid"] != stats["n"]:
            raise HierarchyValidationError(
                f"node_id not unique: {stats['nid']} distinct of {stats['n']} rows")
        if stats["roots"] == 0:
            raise HierarchyValidationError("no root (every parent_node_id is non-NULL)")
        ids = nodes.select(F.col("node_id").alias("__id"))
        dangling = (nodes.where(F.col("parent_node_id").isNotNull())
                    .join(F.broadcast(ids), F.col("parent_node_id") == F.col("__id"), "left_anti")
                    .count())
        if dangling:
            raise HierarchyValidationError(
                f"{dangling} nodes have parent_node_id not matching any node_id")

    # -- single BFS flattening -----------------------------------------

    @staticmethod
    def _node_struct(level_number: Column) -> Column:
        """The reference's node struct literal (:111-119) — field order kept."""
        return F.struct(
            F.col("node_id"), F.col("node_natural_key"), F.col("node_name"),
            F.col("level_name"), F.col("parent_node_id"),
            F.col("is_root"), F.col("is_leaf"),
            level_number.alias("level_number"),
        )

    # -- driver-side fast path for dim-sized hierarchies ----------------

    def _flatten_local(self) -> DataFrame | None:
        """Flatten driver-side when the node set fits the threshold.

        One ``limit(threshold+1).collect()`` decides applicability AND
        fetches the data; everything else — validation, flags, BFS,
        DFS ordering — is plain Python, and the result returns to Spark
        as a local relation. Semantically identical to the distributed
        loop (property-tested); returns None when the dim is too big.
        """
        t = self.config.local_build_threshold
        if t <= 0:
            return None
        raw = self._raw.select("node_id", "node_natural_key", "node_name",
                               "level_name", "parent_node_id")
        rows = raw.limit(t + 1).collect()
        if len(rows) > t:
            return None

        parent_ids = {r["parent_node_id"] for r in rows
                      if r["parent_node_id"] is not None}
        if self.config.validate:
            n = len(rows)
            if any(r["node_natural_key"] is None for r in rows):
                raise HierarchyValidationError(
                    "node_natural_key is NULL (facts join on it; "
                    "NOT NULL per :4-6)")
            if len({r["node_natural_key"] for r in rows}) != n:
                raise HierarchyValidationError("node_natural_key not unique")
            ids = {r["node_id"] for r in rows}
            if len(ids) != n:
                raise HierarchyValidationError("node_id not unique")
            if not any(r["parent_node_id"] is None for r in rows):
                raise HierarchyValidationError(
                    "no root (every parent_node_id is non-NULL)")
            dangling = parent_ids - ids
            if dangling:
                raise HierarchyValidationError(
                    f"{len(dangling)} nodes have parent_node_id not "
                    "matching any node_id")

        children: dict[str | None, list] = {}
        for r in rows:
            children.setdefault(r["parent_node_id"], []).append(r)

        out: list[tuple] = []

        def visit(r, level: int, path: list[tuple]) -> None:
            if level > self.config.max_depth:
                raise HierarchyValidationError(
                    f"hierarchy deeper than max_depth="
                    f"{self.config.max_depth} (cycle?)")
            node = (r["node_id"], r["node_natural_key"], r["node_name"],
                    r["level_name"], r["parent_node_id"],
                    r["parent_node_id"] is None,       # is_root (:67-70)
                    r["node_id"] not in parent_ids,    # is_leaf (:71-76)
                    level)
            full_path = path + [node]
            out.append((*node, node, full_path))
            for ch in children.get(r["node_id"], ()):
                visit(ch, level + 1, full_path)

        import sys
        limit = sys.getrecursionlimit()
        if self.config.max_depth + 100 > limit:
            sys.setrecursionlimit(self.config.max_depth + 200)
        try:
            for root in children.get(None, ()):
                visit(root, 1, [])
        finally:
            sys.setrecursionlimit(limit)

        if self.config.validate and len(out) != len(rows):
            raise HierarchyValidationError(
                f"{len(rows) - len(out)} nodes unreachable from any root "
                "(cycle in parent pointers?)")

        # DFS pre-order == sort by path of natural keys (SURVEY §1.4.1)
        out.sort(key=lambda t_: [p[1] for p in t_[9]])
        rows_sorted = [(*t_, i + 1) for i, t_ in enumerate(out)]

        self._depth = max((t_[7] for t_ in out), default=1)

        from pyspark.sql.types import (ArrayType, BooleanType, IntegerType,
                                       LongType, StringType, StructField,
                                       StructType)
        node_t = StructType([
            StructField("node_id", StringType()),
            StructField("node_natural_key", LongType()),
            StructField("node_name", StringType()),
            StructField("level_name", StringType()),
            StructField("parent_node_id", StringType()),
            StructField("is_root", BooleanType()),
            StructField("is_leaf", BooleanType()),
            StructField("level_number", IntegerType()),
        ])
        schema = StructType(
            list(node_t.fields)
            + [StructField("node_json", node_t),
               StructField("node_json_path", ArrayType(node_t)),
               StructField("node_sort_order", IntegerType())])
        return self._raw.sparkSession.createDataFrame(rows_sorted, schema)

    def flattened(self) -> DataFrame:
        """One row per node with level_number, node_json, node_json_path,
        and the deterministic ``node_sort_order`` (DFS pre-order).

        Replaces both recursive CTEs (:86-166 anchor+step, :353-403).
        Dim-sized hierarchies flatten driver-side in one collect; larger
        ones run the breadth-first loop with the frontier broadcast, one
        iteration per tree level.
        """
        if self._flat is not None:
            return self._flat
        local = self._flatten_local()
        if local is not None:
            self._flat = local
            return local
        nodes = self.prepared()

        frontier = (nodes.where(F.col("parent_node_id").isNull())  # anchor, :130
                    .withColumn("level_number", F.lit(1))
                    .withColumn("node_json", self._node_struct(F.lit(1)))
                    .withColumn("node_json_path", F.array(F.col("node_json"))))
        frontier = materialize(frontier)
        levels = [frontier]
        depth = 1
        while True:
            parents = frontier.select(F.col("node_id").alias("__p_id"),
                                      F.col("level_number").alias("__p_level"),
                                      F.col("node_json_path").alias("__p_path"))
            step = (nodes.join(F.broadcast(parents),  # :162-165 recursive join
                               nodes["parent_node_id"] == parents["__p_id"], "inner")
                    .withColumn("level_number", F.col("__p_level") + F.lit(1))  # :141
                    .withColumn("node_json", self._node_struct(F.col("level_number")))
                    .withColumn("node_json_path",  # :151-161 array_append
                                F.array_append(F.col("__p_path"), F.col("node_json")))
                    .drop("__p_id", "__p_level", "__p_path"))
            # checkpoint BEFORE the emptiness probe: one materialization
            # serves the probe, the next iteration's join, and the
            # final union
            step = materialize(step)
            if step.isEmpty():
                break
            depth += 1
            if depth > self.config.max_depth:
                raise HierarchyValidationError(
                    f"hierarchy deeper than max_depth={self.config.max_depth} (cycle?)")
            frontier = step
            levels.append(step)

        flat = levels[0]
        for lv in levels[1:]:
            flat = flat.unionByName(lv)  # :131/:383 UNION ALL

        if self.config.validate:
            # Reachability: a node in a cycle (or under one) is never
            # visited by the root-anchored BFS — DuckDB's FK (:11-12)
            # makes that impossible; we must assert it.
            n_flat, n_nodes = flat.count(), nodes.count()
            if n_flat != n_nodes:
                raise HierarchyValidationError(
                    f"{n_nodes - n_flat} nodes unreachable from any root "
                    "(cycle in parent pointers?)")

        # Deterministic DFS pre-order (replaces the UUID-string
        # ROW_NUMBER at :184-186): lexicographic compare of the path of
        # natural keys. Global window is dim-only by design (W1 note).
        from pyspark.sql import Window
        sort_key = F.transform(F.col("node_json_path"), lambda s: s["node_natural_key"])
        flat = (flat
                .withColumn("__sort_key", sort_key)
                .withColumn("node_sort_order",
                            F.row_number().over(Window.orderBy(F.asc_nulls_last("__sort_key"))))
                .drop("__sort_key"))
        flat = materialize(flat)
        self._flat = flat
        self._depth = depth
        return flat

    @property
    def depth(self) -> int:
        if self._depth is None:
            self.flattened()
        return self._depth

    # -- derived structures -------------------------------------------

    def reporting_dim(self, num_levels: int | None = None) -> DataFrame:
        """The pivoted reporting dimension (:167-204), width-parameterized.

        ``level_i_*`` columns come from ``path[i]`` (1-based, NULL above
        a node's depth — matching DuckDB's out-of-range NULL, which the
        reference relies on at :188-201; ``element_at_1based`` gives the
        same semantics under ANSI mode and stays inside whole-stage
        codegen, which ElementAt on struct arrays does not).
        """
        flat = self.flattened()
        width = num_levels or self.depth
        cols = [F.col(c) for c in NODE_ATTRS]
        cols += [F.col("node_json"), F.col("node_json_path"), F.col("node_sort_order")]
        from aggregation_duckdb_spark.functions.scalars import element_at_1based
        for i in range(1, width + 1):
            elem = element_at_1based(F.col("node_json_path"), i)
            for attr in ("node_id", "node_natural_key", "node_name", "level_name"):
                cols.append(elem.getField(attr).alias(f"level_{i}_{attr}"))
        return flat.select(*cols)

    def descendants_of(self, ancestor_natural_key) -> DataFrame:
        """All nodes at or under the given ancestor (self included) —
        one closure filter, no recursion at query time."""
        return (self.closure()
                .where(F.col("ancestor_node_natural_key")
                       == F.lit(ancestor_natural_key))
                .select(F.col("descendant_node_natural_key").alias("node_natural_key"),
                        F.col("descendant_node_name").alias("node_name"),
                        F.col("descendant_level_name").alias("level_name"),
                        F.col("descendant_level_number").alias("level_number"),
                        F.col("net_level")))

    def subtree_facts(self, facts: DataFrame, fact_key: str,
                      ancestor_natural_key) -> DataFrame:
        """Facts restricted to one subtree via a broadcast semi-join on
        the filtered closure — the 'WHERE department under X' pattern.
        The fact scan stays shuffle-free; at 100 TB this is a broadcast
        of a handful of leaf keys against the full scan."""
        leaves = (self.closure()
                  .where(F.col("ancestor_node_natural_key")
                         == F.lit(ancestor_natural_key))
                  .select(F.col("descendant_node_natural_key").alias("__k"))
                  .distinct())
        return facts.join(F.broadcast(leaves),
                          facts[fact_key] == F.col("__k"), "left_semi")

    def closure_recursive_sql(self) -> DataFrame:
        """Closure table via Spark 4's native ``WITH RECURSIVE`` — the
        reference's literal construct (:353-403) executed inside the
        engine, no driver loop.

        Alternative to :meth:`closure`; produces the same
        (ancestor, descendant, net_level) relation with the natural-key
        attribute columns (property-tested equal). The iterative BFS
        remains the default: it shares the flattening with the
        reporting dim and carries the struct path columns, which the
        SQL recursion would have to rebuild."""
        import uuid as _uuid
        nodes = self.prepared()
        spark = nodes.sparkSession
        # Spark 4 caps recursive-CTE output at
        # spark.sql.cteRecursionRowLimit rows (default 1M) and FAILS
        # past it — the lvl CTE emits exactly one row per node, so a
        # 1M-node dim hits the cap (found by the depth-12/1M probe).
        # Nodes are dim-sized by contract: one cheap count sizes the
        # limit up front instead of letting the query die mid-run.
        n = nodes.count()
        try:
            cur = int(spark.conf.get("spark.sql.cteRecursionRowLimit"))
        except Exception:
            cur = -1
        if 0 <= cur <= n:
            spark.conf.set("spark.sql.cteRecursionRowLimit",
                           str(n + 1000))
        view = f"__hier_nodes_{_uuid.uuid4().hex}"
        nodes.createOrReplaceTempView(view)
        return spark.sql(f"""
            WITH RECURSIVE lvl AS (
                SELECT node_id, node_natural_key, node_name, level_name,
                       1 AS level_number,
                       array(node_id) AS path_ids
                FROM {view} WHERE parent_node_id IS NULL
                UNION ALL
                SELECT n.node_id, n.node_natural_key, n.node_name,
                       n.level_name, l.level_number + 1,
                       array_append(l.path_ids, n.node_id)
                FROM {view} n JOIN lvl l ON n.parent_node_id = l.node_id
            )
            SELECT a.node_natural_key AS ancestor_node_natural_key,
                   a.node_name       AS ancestor_node_name,
                   a.level_name      AS ancestor_level_name,
                   a.level_number    AS ancestor_level_number,
                   d.node_natural_key AS descendant_node_natural_key,
                   d.node_name       AS descendant_node_name,
                   d.level_number    AS descendant_level_number,
                   d.level_number - a.level_number AS net_level
            FROM (SELECT l.*, explode(path_ids) AS anc_id FROM lvl l) d
            JOIN lvl a ON d.anc_id = a.node_id
        """)

    def closure(self) -> DataFrame:
        """Ancestor/descendant closure table (:351-425) via explode(path).

        Every element of a node's root-to-node path is one of its
        ancestors (including itself), so ``explode(node_json_path)``
        yields exactly the reference's unfiltered-anchor closure —
        Σ(node depths) rows: self-pairs (net_level 0) through
        root→leaf pairs — without a second recursion.
        """
        flat = self.flattened()
        anc = F.col("__ancestor")
        cols = [anc.getField(a).alias(f"ancestor_{a}") for a in NODE_ATTRS]
        cols += [F.col(a).alias(f"descendant_{a}") for a in NODE_ATTRS]
        # :423 net_level = descendant level − ancestor level
        cols.append((F.col("level_number") - anc.getField("level_number")).alias("net_level"))
        return (flat
                .select(F.explode(F.col("node_json_path")).alias("__ancestor"), *
                        [F.col(c) for c in NODE_ATTRS])
                .select(*cols))
