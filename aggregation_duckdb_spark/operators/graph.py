"""Graph operators: distributed connected components.

The missing piece of near-duplicate deduplication at scale: LSH +
verify yields *pairs*, but the unit a cleaning pipeline drops is the
*cluster* (a duplicate group is the transitive closure of its pairs —
A~B, B~C puts A and C in one group even if LSH never paired them).

``connected_components`` is iterative min-label propagation, the
standard Spark-shaped form (no GraphX dependency, pure DataFrame ops):

- state: one (id, label) row per vertex, label = smallest vertex id
  seen so far in its component;
- step: every vertex sends its label across its edges; each vertex
  keeps the minimum of its own and received labels — one groupBy(min)
  shuffle per iteration;
- termination: no label changed (checked with a cheap join+count on
  dimension-sized state), or ``max_iters``.

Scale analysis (100 TB corpus → billions of vertices):

- each round pairs min-label propagation with POINTER DOUBLING (path
  shortcutting: follow your label to *its* label, halving the
  remaining path — the contraction idea behind Kiveris et al.,
  "Connected Components in MapReduce"), so convergence is
  O(log diameter), not O(diameter). Near-dup clusters are
  small-diameter anyway (members are mutually similar, LSH pairs
  them densely), but the log bound means even an adversarial long
  path converges in a handful of rounds.
- per-iteration state is (id, label) pairs only — two longs per
  vertex, never the document payload;
- each round materializes via ``runtime.materialize`` — lineage stays
  flat (an unrolled loop would re-execute every prior shuffle on each
  action and overflow the planner at depth), and the strategy is
  pluggable: ``localCheckpoint`` locally, a reliable checkpoint dir or
  parquet round-trip on a cluster where executor loss mid-job is a
  certainty, not a tail risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from aggregation_duckdb_spark.runtime import materialize


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iters: int = 25,
                         stats: dict | None = None,
                         local_threshold: int = 50_000) -> DataFrame:
    """Label every vertex of the undirected graph ``edges`` with the
    minimum vertex id of its connected component.

    Returns (id, label); isolated vertices don't appear (the caller
    unions them back with label = own id if needed — for dedup they
    are the non-duplicates).

    Small graphs take a DRIVER-LOCAL fast path: when a bounded probe
    (``limit(local_threshold + 1)``, two longs per row) shows the edge
    list fits, a path-compressed union-find labels it in one pass —
    the iterative Spark loop's per-round fixed latency (shuffle +
    checkpoint + convergence probe) dwarfs the work at this size. Same
    applicability-probe pattern as the hierarchy local build
    (hierarchy/core.py). The distributed path is unchanged and takes
    over past the threshold; pass ``local_threshold=0`` to force it.

    Raises if ``max_iters`` rounds don't converge — a truncated
    labeling silently merges/splits clusters, which for dedup means
    wrongly kept or dropped documents.

    ``stats``: optional dict that receives ``{"rounds": k}`` on
    convergence (``{"rounds": 0, "local": True}`` on the local path) —
    the scale probe asserts round count stays flat as the graph
    multiplies (it tracks diameter, not size).
    """
    # materialize the projected edge list ONCE up front: the caller's
    # edge plan is typically the whole LSH+verify pipeline, and without
    # this it would re-execute for the local-path probe and then TWICE
    # more for the symmetrized union (each select scans the plan). Two
    # ids per row — the copy is cheap at any scale; for 100 TB runs the
    # parquet strategy makes it the standard "write edges, then
    # iterate" checkpoint.
    edges = materialize(edges.select(F.col(src).alias(src),
                                     F.col(dst).alias(dst)))
    if local_threshold > 0:
        probe = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
                 .limit(local_threshold + 1).collect())
        if len(probe) <= local_threshold:
            parent: dict[int, int] = {}

            def find(x: int) -> int:
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for r in probe:
                ra, rb = find(r["a"]), find(r["b"])
                if ra != rb:
                    parent[ra] = rb
            comp: dict[int, list[int]] = {}
            for v in parent:
                comp.setdefault(find(v), []).append(v)
            rows = [(v, min(members))
                    for members in comp.values() for v in members]
            if stats is not None:
                stats["rounds"] = 0
                stats["local"] = True
            return edges.sparkSession.createDataFrame(
                rows, "id long, label long")
    sym = materialize(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"),
                                  F.col(src).alias("b")))
        .distinct())
    labels = materialize(
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label")))
    for rounds in range(1, max_iters + 1):
        msgs = (sym.join(labels, sym["a"] == labels["id"])
                .select(F.col("b").alias("id"), F.col("label")))
        prop = (labels.unionByName(msgs)
                .groupBy("id").agg(F.min("label").alias("label")))
        # pointer doubling: jump to the label's own label. A label is
        # always <= its id, and every label is itself a vertex with a
        # row, so following the pointer only lowers it — this halves
        # the remaining hop-distance to the component minimum each
        # round (O(log diameter) total, vs O(diameter) without).
        hop = prop.select(F.col("id").alias("__pid"),
                          F.col("label").alias("__plabel"))
        new_labels = materialize(
            prop.join(hop, prop["label"] == hop["__pid"], "left")
            .select("id",
                    F.coalesce("__plabel", "label").alias("label")))
        changed = (labels.alias("o")
                   .join(new_labels.alias("n"), "id")
                   .where(F.col("o.label") != F.col("n.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            if stats is not None:
                stats["rounds"] = rounds
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds "
        f"despite O(log diameter) shortcutting — raise max_iters")


def duplicate_clusters(pairs: DataFrame, id_a: str = "doc_a",
                       id_b: str = "doc_b") -> DataFrame:
    """Near-duplicate clusters from verified pairs: transitive closure
    via :func:`connected_components`, plus per-cluster bookkeeping.

    Returns one row per clustered document:
    (doc_id, cluster_id = min doc id of the cluster, cluster_size,
    is_keeper = this doc is the cluster representative). Documents in
    no pair are absent — they are their own keepers by definition.
    """
    labels = connected_components(pairs, src=id_a, dst=id_b)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (labels.join(sizes, "label")
            .select(F.col("id").alias("doc_id"),
                    F.col("label").alias("cluster_id"),
                    "cluster_size",
                    (F.col("id") == F.col("label")).alias("is_keeper")))


def cluster_size_histogram(pairs: DataFrame, id_a: str = "doc_a",
                           id_b: str = "doc_b") -> DataFrame:
    """Distribution of near-duplicate cluster sizes — the dataset-card
    number that tells you whether duplication is a long tail of pairs
    or a few giant boilerplate clusters (which need the bucket-cap /
    stop-shingle guards, not pairwise dedup). Transitive closure via
    :func:`connected_components`, then two tiny aggregates.

    Returns (cluster_size, n_clusters, n_docs) ordered by size."""
    labels = connected_components(pairs, src=id_a, dst=id_b)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (sizes.groupBy("cluster_size")
            .agg(F.count(F.lit(1)).alias("n_clusters"),
                 (F.count(F.lit(1)) * F.col("cluster_size"))
                 .cast("long").alias("n_docs"))
            .orderBy("cluster_size"))
