"""Scale-up probe: flagship throughput as fact volume multiplies.

The 100 TB question isn't sf0.1 latency — it's whether cost grows
linearly in fact rows with no plan degradation. This probe unions the
orders scan N× (same dims, same plan shape) and times the closure
aggregation at each multiple. Linear wall-clock growth + unchanged
plan (broadcast joins, one agg shuffle) is the pass condition; output
is one JSON line per multiple.

Usage: python scripts/scale_probe.py [multiples ...] (default 1 4 16)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from aggregation_duckdb_spark import flagship as fs  # noqa: E402
from aggregation_duckdb_spark.operators.aggregate import (  # noqa: E402
    aggregate_with_closure)
from aggregation_duckdb_spark.plans import (  # noqa: E402
    count_shuffles, physical_plan)
from aggregation_duckdb_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    multiples = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    h = fs.geo_hierarchy(spark, SF_DIR)
    closure = h.closure()
    dim = h.reporting_dim()
    base = fs.order_facts(spark, SF_DIR)
    # warmup
    aggregate_with_closure(base, closure, "nation_key",
                           fs.flagship_measures(), reporting_dim=dim).count()

    for m in multiples:
        facts = base
        for i in range(m - 1):
            # re-key so distinct counts grow with volume (union of the
            # same rows would dedupe to the base answer)
            shifted = base.select(
                "o_orderkey",
                (F.col("o_custkey") + (i + 1) * 10_000_000).alias("o_custkey"),
                "o_totalprice", "nation_key")
            facts = facts.unionByName(shifted)
        agg = aggregate_with_closure(facts, closure, "nation_key",
                                     fs.flagship_measures(),
                                     reporting_dim=dim)
        t0 = time.time()
        n_rows = agg.count()
        elapsed = time.time() - t0
        plan = physical_plan(agg, "simple")
        print(json.dumps({
            "multiple": m,
            "fact_rows": facts.count(),
            "seconds": round(elapsed, 3),
            "result_rows": n_rows,
            "shuffles": count_shuffles(agg),
            "broadcast_joins": plan.count("BroadcastHashJoin"),
            "sort_merge_joins": plan.count("SortMergeJoin"),
        }))


def hierarchy_probe(n_nodes: int = 200_000, fanout: int = 8) -> None:
    """Distributed-BFS probe: a generated n_nodes-node hierarchy ABOVE
    the local threshold, so the per-level loop + closure explode run
    distributed. Reports build/derive times and closure cardinality."""
    from aggregation_duckdb_spark.hierarchy import Hierarchy, HierarchyConfig

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    # deterministic fanout-ary tree: parent(k) = (k-1) // fanout
    nodes = spark.range(n_nodes).select(
        F.col("id").alias("natural_key"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
        F.lit("L").alias("level_name"),
        F.when(F.col("id") > 0, (F.col("id") - 1) / fanout)
         .cast("long").alias("parent_natural_key"))
    h = Hierarchy.from_adjacency(
        nodes, natural_key="natural_key", name="name", level_name="level_name",
        parent_natural_key="parent_natural_key",
        config=HierarchyConfig(local_build_threshold=0, max_depth=64))
    t0 = time.time()
    flat_n = h.flattened().count()
    t_flat = time.time() - t0
    t0 = time.time()
    closure_n = h.closure().count()
    t_closure = time.time() - t0
    print(json.dumps({
        "probe": "hierarchy_distributed_bfs", "n_nodes": n_nodes,
        "depth": h.depth, "flatten_seconds": round(t_flat, 2),
        "flat_rows": flat_n, "closure_rows": closure_n,
        "closure_seconds": round(t_closure, 2)}))


def dedup_probe(multiples: list) -> None:
    """Extension scale path: MinHash-LSH candidate generation as the
    corpus multiplies (docs re-keyed per copy so the near-dup structure
    replicates). Linear growth + a shuffle-stable plan is the pass."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    D.minhash_lsh_candidates(base).count()  # warmup

    for m in multiples:
        docs = base
        for i in range(m - 1):
            docs = docs.unionByName(base.select(
                (F.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"),
                "text"))
        n_docs = docs.count()  # outside the timed region
        t0 = time.time()
        cands = D.minhash_lsh_candidates(docs)
        n = cands.count()
        elapsed = round(time.time() - t0, 2)
        print(json.dumps({
            "probe": "dedup_minhash_lsh", "multiple": m,
            "docs": n_docs, "candidate_pairs": n,
            "seconds": elapsed}))


def _organic_corpus(spark, n: int):
    """Generated corpus with CONTROLLED duplicate structure — no
    replication artifact: ids are grouped in blocks of 20 where role 19
    is an exact duplicate of the block head, role 18 a one-word-changed
    near-duplicate of it, and roles 0-17 unique documents (so 5% exact
    dups, 5% near dups, 90% unique at every size). Text is md5-derived
    pseudo-words in runs of 3 (shingle structure), 30-69 words per doc,
    all generated distributed-side as expressions — no driver loop."""
    role = F.col("id") % 20
    head = F.col("id") - role
    src = F.when(role >= 18, head).otherwise(F.col("id"))
    seed = src.cast("string")
    length = (F.lit(30) + src % 40).cast("int")
    mutant = F.substring(
        F.md5(F.concat(F.col("id").cast("string"), F.lit("!"))), 1, 6)
    words = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda j: F.when((role == 18) & (j == 4), mutant).otherwise(
            F.substring(F.md5(F.concat(seed, F.lit("|"),
                                       (j - j % 3).cast("string"))),
                        1, 6)))
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", words).alias("text"))


def organic_dedup_probe(sizes: list) -> None:
    """Dedup growth WITHOUT the replication artifact (round-6 verdict
    'What's missing' #4): the sf1 dedup numbers were dominated by the
    replicated corpus's verbatim duplicate groups, whose PAIR OUTPUT
    grows quadratically by construction. This corpus holds the
    duplicate RATE constant as it grows, so candidate pairs and
    survivors must both grow ~linearly in docs — any superlinear bend
    here would be a real plan defect, not an artifact."""
    from aggregation_duckdb_spark.operators import dedup as D

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    D.minhash_lsh_candidates(_organic_corpus(spark, 2_000)).count()  # warmup

    for n in sizes:
        docs = _organic_corpus(spark, n)
        n_docs = docs.count()  # outside the timed region
        t0 = time.time()
        n_cands = D.minhash_lsh_candidates(docs).count()
        t_lsh = round(time.time() - t0, 2)
        t0 = time.time()
        n_survivors = D.exact_dedup(docs).count()
        t_exact = round(time.time() - t0, 2)
        print(json.dumps({
            "probe": "organic_dedup", "docs": n_docs,
            "candidate_pairs": n_cands,
            "pairs_per_doc": round(n_cands / n_docs, 4),
            "exact_survivors": n_survivors,
            "exact_dup_share": round(1 - n_survivors / n_docs, 4),
            "lsh_seconds": t_lsh, "exact_seconds": t_exact}))


def neardup_probe(multiples: list) -> None:
    """Embedding near-dup at growing corpus size: candidate pairs from
    the LSH bucket equi-join versus the N·(N-1)/2 an all-pairs join
    would compare. Pass = candidate count a small fraction of
    all-pairs and no nested-loop join in the plan. Copies are
    deterministically perturbed (component 0 += copy/1000) so they
    spread across buckets like real near-identical vectors."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import similarity as S
    from aggregation_duckdb_spark.plans import physical_plan

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = load_table(spark, "embeddings", SF_DIR).select("vec_id", "embedding")
    S.embedding_near_duplicates_lsh(base, threshold=0.99).count()  # warmup

    for m in multiples:
        corpus = base
        for i in range(m - 1):
            corpus = corpus.unionByName(base.select(
                (F.col("vec_id") + (i + 1) * 10_000_000).alias("vec_id"),
                F.concat(
                    F.array((F.element_at("embedding", 1)
                             + (i + 1) / 1000.0).cast("float")),
                    F.slice("embedding", 2, 63)).alias("embedding")))
        n_vecs = corpus.count()
        mats = S.lsh_sign_matrix(6, 8, 64)
        bucketed = corpus.select(
            F.explode(S._bucket_keys(F.col("embedding"), mats))
            .alias("__bucket"))
        cand_per_bucket = (bucketed.groupBy("__bucket")
                           .agg(F.count(F.lit(1)).alias("n"))
                           .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2)
                                .alias("pairs")).first()["pairs"])
        t0 = time.time()
        pairs = S.embedding_near_duplicates_lsh(corpus, threshold=0.99)
        n_pairs = pairs.count()
        plan = physical_plan(pairs, "simple")
        print(json.dumps({
            "probe": "embedding_neardup_lsh", "multiple": m,
            "vectors": n_vecs,
            "all_pairs": n_vecs * (n_vecs - 1) // 2,
            "bucket_candidate_pairs": int(cand_per_bucket),
            "result_pairs": n_pairs,
            "seconds": round(time.time() - t0, 2),
            "nested_loop_join": ("BroadcastNestedLoopJoin" in plan
                                 or "CartesianProduct" in plan)}))


def cc_probe(multiples: list) -> None:
    """Connected-components probe: clustering time and propagation
    rounds as the near-dup pair graph multiplies. Copies are re-keyed,
    so the component *structure* replicates — diameter is constant —
    and the pass condition is a FLAT round count with roughly linear
    time: label propagation cost tracks diameter × edge volume, never
    graph size × size."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.operators import graph as G

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    base = (D.near_duplicates(docs, threshold=0.6)
            .select("doc_a", "doc_b").localCheckpoint(eager=True))

    for m in multiples:
        pairs = base
        for i in range(m - 1):
            pairs = pairs.unionByName(base.select(
                (F.col("doc_a") + (i + 1) * 10_000_000).alias("doc_a"),
                (F.col("doc_b") + (i + 1) * 10_000_000).alias("doc_b")))
        stats: dict = {}
        n_edges = pairs.count()  # outside the timed region
        t0 = time.time()
        labels = G.connected_components(pairs, src="doc_a", dst="doc_b",
                                        stats=stats, local_threshold=0)
        n_vertices = labels.count()
        elapsed = round(time.time() - t0, 2)
        n_clusters = labels.select("label").distinct().count()
        print(json.dumps({
            "probe": "connected_components", "multiple": m,
            "edges": n_edges, "vertices": n_vertices,
            "clusters": n_clusters, "rounds": stats.get("rounds"),
            "seconds": elapsed}))


def rangejoin_probe(multiples: list, n_bands: int = 10_000) -> None:
    """Range-join probe: events × a 10k-band table. The naive theta
    join is a BroadcastNestedLoopJoin evaluating N·B predicates — at
    multiple 1 it is timed once as the contrast; the bucketized
    equi-join rewrite must beat it decisively and keep scaling
    linearly in N while the naive form's cost is N·B."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import ranges as R

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = load_table(spark, "events", SF_DIR).select("event_id", "value")
    width = 500.0 / n_bands
    bands = (spark.range(n_bands)
             .select(F.col("id").alias("band_id"),
                     (F.col("id") * width).alias("lo"),
                     ((F.col("id") + 1) * width).alias("hi"))
             .localCheckpoint(eager=True))
    R.bucketed_range_join(base, bands, "value",
                          bucket_width=width).count()  # warmup

    t0 = time.time()
    n_naive = (base.join(bands, (F.col("value") >= F.col("lo"))
                         & (F.col("value") < F.col("hi"))).count())
    naive_s = round(time.time() - t0, 2)

    for m in multiples:
        facts = base
        for i in range(m - 1):
            facts = facts.unionByName(base.select(
                (F.col("event_id") + (i + 1) * 10_000_000).alias("event_id"),
                "value"))
        n_facts = facts.count()  # outside the timed region
        t0 = time.time()
        joined = R.bucketed_range_join(facts, bands, "value",
                                       bucket_width=width)
        n = joined.count()
        elapsed = round(time.time() - t0, 2)
        plan = physical_plan(joined, "simple")
        print(json.dumps({
            "probe": "bucketed_range_join", "multiple": m,
            "facts": n_facts, "bands": n_bands, "matched": n,
            "seconds": elapsed,
            "naive_nlj_seconds_at_x1": naive_s if m == multiples[0] else None,
            "naive_matched": n_naive if m == multiples[0] else None,
            "nested_loop_join": ("BroadcastNestedLoopJoin" in plan
                                 or "CartesianProduct" in plan)}))


def incremental_probe(multiples: list) -> None:
    """Incremental-dedup probe: a FIXED 500-doc batch checked against
    a corpus that multiplies. The claim under test: per-batch cost is
    dominated by corpus scan (linear, unavoidable) while all join
    state stays batch-sized — so seconds grow far slower than corpus
    volume and the candidate count tracks true duplicate structure."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    batch = docs.orderBy("doc_id").limit(500).localCheckpoint(eager=True)
    base = docs  # the whole sf0.1 corpus is the x1 "existing" side
    D.incremental_dedup(batch, base).count()  # warmup

    for m in multiples:
        corpus = base
        for i in range(m - 1):
            corpus = corpus.unionByName(base.select(
                (F.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"),
                "text"))
        n_corpus = corpus.count()  # outside the timed region
        t0 = time.time()
        out = D.incremental_dedup(batch, corpus)
        flagged = out.where("exact_dup OR near_dup").count()
        elapsed = round(time.time() - t0, 2)
        print(json.dumps({
            "probe": "incremental_dedup", "multiple": m,
            "corpus_docs": n_corpus, "batch_docs": 500,
            "flagged": flagged,
            "seconds": elapsed}))


def spans_probe(multiples: list) -> None:
    """Duplicate-span census as the corpus multiplies: cost must stay
    linear in corpus tokens (one hash shuffle + join-back), and the
    duplicated-occurrence count grows with real repeated text, not
    quadratically."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    D.duplicate_spans(base, width=20).count()  # warmup

    for m in multiples:
        docs = base
        for i in range(m - 1):
            docs = docs.unionByName(base.select(
                (F.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"),
                "text"))
        n_docs = docs.count()  # outside the timed region
        t0 = time.time()
        out = D.duplicate_spans(docs, width=20)
        agg = out.agg(F.sum("n_spans").alias("s"),
                      F.sum("n_dup_spans").alias("d")).first()
        elapsed = round(time.time() - t0, 2)
        print(json.dumps({
            "probe": "duplicate_spans", "multiple": m, "docs": n_docs,
            "total_spans": int(agg["s"]), "dup_spans": int(agg["d"]),
            "seconds": elapsed}))


def prefix_probe(multiples: list) -> None:
    """Prefix-filter exact set-similarity join as the corpus
    multiplies: wall-clock should track corpus size (census + sort +
    prefix join, all hash-partitioned) while staying EXACT — the pair
    count grows with true near-dup structure (replication makes every
    copy pair with every other copy)."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    D.prefix_filter_pairs(base, threshold=0.6).count()  # warmup

    for m in multiples:
        docs = base
        for i in range(m - 1):
            docs = docs.unionByName(base.select(
                (F.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"),
                "text"))
        n_docs = docs.count()  # outside the timed region
        t0 = time.time()
        n_pairs = D.prefix_filter_pairs(docs, threshold=0.6).count()
        elapsed = round(time.time() - t0, 2)
        print(json.dumps({
            "probe": "prefix_filter_pairs", "multiple": m, "docs": n_docs,
            "pairs": n_pairs, "seconds": elapsed}))


def global_lines_probe(multiples: list) -> None:
    """Corpus line dedup as the corpus multiplies (docs re-keyed per
    copy, so every line's doc-frequency multiplies and the boilerplate
    set is stable). Pass = linear wall-clock, shuffle-stable plan, and
    per-copy results identical to the base run (the census threshold
    scales with the replication)."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.matrix_extensions import _lined_docs
    from aggregation_duckdb_spark.operators import dedup as D
    from aggregation_duckdb_spark.plans import physical_plan
    from aggregation_duckdb_spark.plans.inspect import count_shuffles

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = _lined_docs(
        load_table(spark, "documents", SF_DIR).select("doc_id", "text"), 4)
    D.global_line_dedup(base, min_docs=3).count()  # warmup

    for m in multiples:
        docs = base
        for i in range(m - 1):
            docs = docs.unionByName(base.select(
                (F.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"),
                "text"))
        n_docs = docs.count()  # outside the timed region
        out = D.global_line_dedup(docs, min_docs=3 * m)
        t0 = time.time()
        removed = out.agg(F.sum("n_removed")).collect()[0][0]
        elapsed = round(time.time() - t0, 2)
        print(json.dumps({
            "probe": "global_line_dedup", "multiple": m, "docs": n_docs,
            "lines_removed": int(removed), "seconds": elapsed,
            "shuffles": count_shuffles(out),
            "nested_loop": "NestedLoop" in physical_plan(out, "simple")}))

def curriculum_probe(multiples: list) -> None:
    """Global-ordering probe: curriculum_order vs the naive global
    ROW_NUMBER window as the corpus multiplies. The naive form funnels
    every row through ONE task — fine for toy sizes (sorting 100k longs
    on one core is instant), catastrophic when a corpus partition
    doesn't fit one task; the sharded form pays two extra tiny
    aggregates but keeps every data-sized stage parallel. Rows are
    generated (range + hash-derived key) so the probe reaches
    tens of millions of rows without union-bloating the plan."""
    from aggregation_duckdb_spark.operators import pipeline as P
    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base_n = 5_000
    def gen(n):
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.abs(F.hash(F.col("id").cast("string"))) % 2000 + 5)
            .alias("n_chars"))
    # force the rank itself (sum over position): a bare count() lets
    # column pruning delete the window node and times nothing
    def run(df):
        t0 = time.time()
        df.agg(F.sum("position")).collect()
        return round(time.time() - t0, 2)
    run(P.curriculum_order(gen(base_n)))  # warmup
    for m in multiples:
        docs = gen(base_n * m)
        out = P.curriculum_order(docs)
        sharded_s = run(out)
        naive = docs.selectExpr(
            "doc_id", "n_chars",
            "row_number() over (order by n_chars, doc_id) as position")
        naive_s = run(naive)
        print(json.dumps({
            "probe": "curriculum_order", "multiple": m, "docs": base_n * m,
            "sharded_seconds": sharded_s, "naive_global_window_seconds": naive_s,
            "speedup": round(naive_s / sharded_s, 2) if sharded_s else None,
            "nested_loop": "NestedLoop" in physical_plan(out, "simple")}))


def zorder_probe(multiples: list) -> None:
    """Z-order layout probe: as the table multiplies, the fraction of
    the data a 2-D box read touches must stay FLAT (the bucket list
    depends on the box, not the volume), and the pruned read should
    beat the full-scan filter by roughly the skipped-data ratio."""
    import tempfile
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.sources import layout as L
    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = (load_table(spark, "events", SF_DIR)
            .select("event_id", "user_id", "value"))
    for m in multiples:
        ev = base
        for i in range(m - 1):
            ev = ev.unionByName(base.select(
                (F.col("event_id") + (i + 1) * 100_000_000).alias("event_id"),
                "user_id", "value"))
        n_rows = ev.count()
        path = tempfile.mkdtemp(prefix=f"zorder-probe-{m}-")
        # files_per_bucket > 1 matters even locally: pruning to 2
        # buckets of ONE file each would leave 2 decode tasks against
        # the full scan's 16 — a parallelism artifact, not a layout
        # property; 8 files per bucket keeps the pruned read as wide
        # as the machine
        spec = L.write_zordered(ev, path, "user_id", "value",
                                bits=8, bucket_bits=4,
                                files_per_bucket=8)
        box = (10, 60, 50, 200)
        buckets = L.zbuckets_for_box(spec, *box)
        # warm the file-status cache, then alternate min-of-3: a fresh
        # table bills its directory listing to whichever read runs
        # first, and sub-second scans are JIT/scheduling-noisy
        L.read_zordered(spark, path).count()
        full = L.read_zordered(spark, path).where(
            (F.col("user_id").between(box[0], box[1]))
            & (F.col("value").between(box[2], box[3])))
        # build BOTH frames once: re-planning a fresh relation re-lists
        # the table every iteration and would bill ~100ms of metadata
        # work to the pruned side only
        pruned_df = L.read_zordered_box(spark, path, *box)
        pruned_t, full_t, counts = [], [], set()
        for _ in range(3):
            t0 = time.time()
            counts.add(pruned_df.count())
            pruned_t.append(time.time() - t0)
            t0 = time.time()
            counts.add(full.count())
            full_t.append(time.time() - t0)
        assert len(counts) == 1, counts
        import glob
        import os as _os
        allf = glob.glob(_os.path.join(path, L.DATA_DIR, "zbucket=*",
                                       "gen=*", "*.parquet"))
        chosen = [f for f in allf
                  if any(f"zbucket={b}/" in f for b in buckets)]
        # NOTE the honest local reading: wall-clock PARITY is expected
        # here — the data is z-sorted, so parquet row-group min/max
        # stats already skip non-matching groups even in the full
        # scan. What directory pruning buys at 100 TB (object-store
        # listing + footer I/O scale with FILES, and metadata ops
        # dominate small scans there) is the files_read column: flat
        # 2/16 regardless of volume, guaranteed before any file opens.
        print(json.dumps({
            "probe": "zorder_box_read", "multiple": m, "rows": n_rows,
            "buckets_read": len(buckets),
            "buckets_total": 1 << spec["bucket_bits"],
            "files_read": len(chosen), "files_total": len(allf),
            "box_rows": counts.pop(),
            "pruned_seconds": round(min(pruned_t), 2),
            "full_filter_seconds": round(min(full_t), 2)}))

def zorder_compaction_probe(multiples: list) -> None:
    """Per-bucket compaction cost model: append a FIXED-size delta to
    tables of growing size and time the default (incremental)
    compaction against a full rebin rewrite. Pass = incremental cost
    ~flat in table size (it rewrites only the buckets the delta
    dirties) while the full rewrite grows with the table — the same
    lifecycle argument append_dedup_index already won."""
    import tempfile
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.sources import layout as L

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = (load_table(spark, "events", SF_DIR)
            .select("event_id", "user_id", "value"))
    # fixed delta: 200 rows in a tight (user, value) corner -> few
    # dirtied buckets regardless of table volume
    delta = spark.range(200).select(
        (F.col("id") + 900_000_000).alias("event_id"),
        (F.col("id") % 5 + 10).alias("user_id"),
        (F.col("id") % 7 + 60).alias("value"))
    for m in multiples:
        ev = base
        for i in range(m - 1):
            ev = ev.unionByName(base.select(
                (F.col("event_id") + (i + 1) * 100_000_000)
                .alias("event_id"), "user_id", "value"))
        n_rows = ev.count()
        for mode in ("incremental", "full"):
            path = tempfile.mkdtemp(prefix=f"zcomp-{mode}-{m}-")
            L.write_zordered(ev, path, "user_id", "value",
                             bits=8, bucket_bits=4, files_per_bucket=8)
            L.append_zordered(delta, path)
            before = L.read_manifest(spark, path)
            t0 = time.time()
            L.compact_zordered(spark, path, files_per_bucket=8,
                               mode=mode)
            elapsed = round(time.time() - t0, 2)
            after = L.read_manifest(spark, path)
            dirtied = sum(1 for k, g in after["gens"].items()
                          if before["gens"].get(k) != g)
            print(json.dumps({
                "probe": "zorder_compaction", "multiple": m,
                "table_rows": n_rows, "delta_rows": 200, "mode": mode,
                "buckets_rewritten": dirtied,
                "buckets_total": len(after["gens"]),
                "seconds": elapsed}))


def zorder_upsert_probe(multiples: list) -> None:
    """Keyed-MERGE cost model: upsert a FIXED batch (200 updates + 50
    inserts in a 2-bucket corner) into tables of growing size. Pass =
    wall ~flat and buckets_rewritten pinned to the corner's buckets at
    every table size — merge cost tracks the batch, not the table."""
    import tempfile
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.sources import layout as L

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = (load_table(spark, "events", SF_DIR)
            .select("event_id", "user_id", "value", "event_type"))
    for m in multiples:
        ev = base
        for i in range(m - 1):
            ev = ev.unionByName(base.select(
                (F.col("event_id") + (i + 1) * 100_000_000)
                .alias("event_id"), "user_id", "value", "event_type"))
        n_rows = ev.count()
        path = tempfile.mkdtemp(prefix=f"zups-{m}-")
        L.write_zordered(ev, path, "user_id", "value",
                         bits=8, bucket_bits=4, files_per_bucket=8)
        # updates keep their layout dims (the documented contract);
        # inserts land in the same tight corner
        upd = (ev.where((F.col("user_id").between(10, 14))
                        & (F.col("value").between(60, 66)))
               .limit(200).withColumn("event_type", F.lit("upserted")))
        ins = spark.range(50).select(
            (F.col("id") + 950_000_000).alias("event_id"),
            (F.col("id") % 5 + 10).alias("user_id"),
            (F.col("id") % 7 + 60).cast("double").alias("value"),
            F.lit("inserted").alias("event_type"))
        batch = upd.unionByName(ins).localCheckpoint(eager=True)
        before = L.read_manifest(spark, path)
        t0 = time.time()
        L.upsert_zordered(batch, path, ["event_id"],
                          files_per_bucket=8)
        elapsed = round(time.time() - t0, 2)
        after = L.read_manifest(spark, path)
        dirtied = sum(1 for k, g in after["gens"].items()
                      if before["gens"].get(k) != g)
        print(json.dumps({
            "probe": "zorder_upsert", "multiple": m,
            "table_rows": n_rows, "batch_rows": 250,
            "buckets_rewritten": dirtied,
            "buckets_total": len(after["gens"]),
            "seconds": elapsed}))


def zorder_keydelete_probe(multiples: list) -> None:
    """Tombstone key-DELETE cost model: delete a FIXED victim set
    (300 ids whose rows sit in a 2-bucket layout corner) from tables
    of growing size. Pass = (a) delete time ~flat — it is a keys-batch
    write plus a manifest commit, no data rewrite; (b) tombstone-read
    overhead small — one broadcast anti-join on the scan; (c) the
    compaction fold rewrites exactly the victim buckets at every table
    size — physical removal tracks the victims, not the table."""
    import tempfile
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.sources import layout as L

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = (load_table(spark, "events", SF_DIR)
            .select("event_id", "user_id", "value", "event_type"))
    for m in multiples:
        ev = base
        for i in range(m - 1):
            ev = ev.unionByName(base.select(
                (F.col("event_id") + (i + 1) * 100_000_000)
                .alias("event_id"), "user_id", "value", "event_type"))
        n_rows = ev.count()
        path = tempfile.mkdtemp(prefix=f"zdelk-{m}-")
        L.write_zordered(ev, path, "user_id", "value",
                         bits=8, bucket_bits=4, files_per_bucket=8)
        victims = (ev.where((F.col("user_id").between(10, 14))
                            & (F.col("value").between(60, 66)))
                   .select("event_id").limit(300)
                   .localCheckpoint(eager=True))
        n_victims = victims.count()
        before = L.read_manifest(spark, path)
        t0 = time.time()
        L.delete_zordered_keys(victims, path, ["event_id"])
        t_delete = round(time.time() - t0, 2)
        t0 = time.time()
        n_visible = L.read_zordered(spark, path).count()
        t_read = round(time.time() - t0, 2)
        t0 = time.time()
        L.compact_zordered(spark, path, files_per_bucket=8)
        t_fold = round(time.time() - t0, 2)
        after = L.read_manifest(spark, path)
        dirtied = sum(1 for k in set(before["gens"]) | set(after["gens"])
                      if before["gens"].get(k) != after["gens"].get(k))
        print(json.dumps({
            "probe": "zorder_keydelete", "multiple": m,
            "table_rows": n_rows, "victim_keys": n_victims,
            "visible_after_delete": n_visible,
            "delete_seconds": t_delete,
            "tombstone_read_seconds": t_read,
            "fold_seconds": t_fold,
            "buckets_rewritten": dirtied,
            "buckets_total": len(after["gens"])}))


def pack_probe(multiples: list) -> None:
    """Greedy-packing probe: the Arrow-batched per-bucket scan must
    grow linearly in docs (per-task state is one (seq, fill) pair; the
    shuffle carries only (id, bucket, n_tokens)) and keep padding
    waste low — both numbers printed per multiple."""
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import pipeline as P
    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    C = 1024
    P.pack_greedy(base, C).count()  # warmup
    for m in multiples:
        docs = base
        for i in range(m - 1):
            docs = docs.unionByName(base.select(
                (F.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"),
                "text"))
        n_docs = docs.count()
        out = P.pack_greedy(docs, C, num_buckets=64)
        t0 = time.time()
        stats = (out.groupBy("bucket", "seq_idx")
                 .agg(F.sum("n_tokens").alias("fill"))
                 .agg(F.count(F.lit(1)).alias("n_seqs"),
                      F.sum("fill").alias("tokens")).collect()[0])
        elapsed = round(time.time() - t0, 2)
        waste = 1.0 - stats.tokens / (stats.n_seqs * C)
        print(json.dumps({
            "probe": "pack_greedy", "multiple": m, "docs": n_docs,
            "n_seqs": int(stats.n_seqs), "padding_waste": round(waste, 4),
            "seconds": elapsed}))

def dedupindex_probe(multiples: list) -> None:
    """Persisted-dedup-index payoff: a FIXED 500-doc batch checked
    against a corpus that multiplies. The live path re-shingles the
    whole corpus per batch (cost tracks corpus size); the indexed
    path reads the stored projections — it still scans them (narrow
    columns), but skips the tokenize/md5/minhash CPU, which is where
    the live path's time goes."""
    import tempfile
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import dedup as D
    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    batch = docs.where(F.col("doc_id") < 500)
    base = docs.where(F.col("doc_id") >= 500)
    for m in multiples:
        corpus = base
        for i in range(m - 1):
            corpus = corpus.unionByName(base.select(
                (F.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"),
                "text"))
        n_docs = corpus.count()
        t0 = time.time()
        live_rows = D.incremental_dedup(batch, corpus).count()
        live_s = round(time.time() - t0, 2)
        path = tempfile.mkdtemp(prefix=f"dedupidx-{m}-")
        D.write_dedup_index(corpus, path)   # ingest-time cost, not queried
        t0 = time.time()
        idx_rows = D.incremental_dedup_indexed(batch, spark, path).count()
        idx_s = round(time.time() - t0, 2)
        assert live_rows == idx_rows
        print(json.dumps({
            "probe": "incremental_dedup_indexed", "multiple": m,
            "corpus_docs": n_docs, "batch_docs": 500,
            "live_seconds": live_s, "indexed_seconds": idx_s,
            "speedup": round(live_s / idx_s, 2) if idx_s else None}))

def textindex_probe(multiples: list) -> None:
    """Inverted-index payoff: a fixed 3-term BM25 query as the corpus
    multiplies. The live path re-tokenizes and scores every document
    per query; the indexed path reads the query terms' posting-list
    directories — postings grow with the corpus too, but they are
    narrow (term, doc, tf) rows for THREE terms, not corpus text."""
    import tempfile
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import text as T
    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    # 'dup' is the synthetic corpus's ONE selective term (5% df; the
    # other 30 vocabulary tokens appear in ~77% of docs — stop words,
    # where posting lists are corpus-sized and no index can help);
    # both workloads are probed so the stop-word effect is on record
    for m in multiples:
        corpus = base
        for i in range(m - 1):
            corpus = corpus.unionByName(base.select(
                (F.col("doc_id") + (i + 1) * 10_000_000).alias("doc_id"),
                "text"))
        n_docs = corpus.count()
        path = tempfile.mkdtemp(prefix=f"textidx-{m}-")
        T.write_text_index(corpus, path)   # ingest-time cost
        for label, terms in (("selective", ["dup"]),
                             ("stopword", ["hash", "customer", "vector"])):
            t0 = time.time()
            live = T.bm25_search(corpus, terms, top_k=20).collect()
            live_s = round(time.time() - t0, 2)
            t0 = time.time()
            idx = T.bm25_search_indexed(spark, path, terms,
                                        top_k=20).collect()
            idx_s = round(time.time() - t0, 2)
            assert sorted((r.doc_id, r.score) for r in idx) == \
                sorted((r.doc_id, r.score) for r in live)
            print(json.dumps({
                "probe": "bm25_indexed", "terms": label, "multiple": m,
                "corpus_docs": n_docs, "live_seconds": live_s,
                "indexed_seconds": idx_s,
                "speedup": round(live_s / idx_s, 2) if idx_s else None}))




def indexcompact_probe(appends: list) -> None:
    """Small-file decay and its cure: a stored index accumulates one
    tiny ``__ingest_batch=N`` directory per streaming append, so a
    fixed query's scan cost starts tracking APPEND COUNT instead of
    data size — then one compaction folds the batches and restores
    build-time cost. Fixed sf0.1 corpus split into B equal ingest
    batches; the measured query is identical before and after the
    fold (asserted), so the delta is pure file-count overhead."""
    import os
    import tempfile
    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.operators import similarity as S
    from aggregation_duckdb_spark.operators import text as T
    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    emb = load_table(spark, "embeddings", SF_DIR)
    long_c = S.label_centroids_exact(emb)
    cents = (long_c.groupBy("centroid_id")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("pos", "mean_value"))),
                 lambda x: x["mean_value"]).alias("centroid")))
    queries = emb.where(F.col("vec_id") < 5)

    def nfiles(root):
        return sum(1 for _, _, fs_ in os.walk(root)
                   for f in fs_ if f.endswith(".parquet"))

    for b in appends:
        # --- text index: base write + (b-1) appends
        tx = tempfile.mkdtemp(prefix=f"tixc-{b}-")
        T.write_text_index(docs.where(F.col("doc_id") % b == 0), tx)
        for i in range(1, b):
            T.append_text_index(docs.where(F.col("doc_id") % b == i),
                                tx, batch_id=i)

        def bm25(path=tx):
            t0 = time.time()
            hits = T.bm25_search_indexed(spark, path, ["dup"],
                                         top_k=20).collect()
            return hits, round(time.time() - t0, 2)

        hits_pre, s_pre = bm25()
        t0 = time.time()
        T.compact_text_index(spark, tx)
        s_fold = round(time.time() - t0, 2)
        hits_post, s_post = bm25()
        assert sorted((r.doc_id, r.score) for r in hits_post) == \
            sorted((r.doc_id, r.score) for r in hits_pre)
        print(json.dumps({
            "probe": "indexcompact", "index": "text", "appends": b,
            "search_pre_s": s_pre, "compact_s": s_fold,
            "search_post_s": s_post,
            "files_post": nfiles(os.path.join(tx, "postings"))}),
            flush=True)

        # --- IVF index: same split, same query before/after the fold
        iv = tempfile.mkdtemp(prefix=f"ivfc-{b}-")
        S.write_ivf_index(emb.where(F.col("vec_id") % b == 0), cents, iv)
        for i in range(1, b):
            S.append_ivf_index(emb.where(F.col("vec_id") % b == i),
                               iv, batch_id=i)

        def topk(path=iv):
            t0 = time.time()
            rows = S.ivf_topk_indexed(spark, path, queries, k=10,
                                      n_probe=3).collect()
            return rows, round(time.time() - t0, 2)

        r_pre, s_pre = topk()
        t0 = time.time()
        S.compact_ivf_index(spark, iv)
        s_fold = round(time.time() - t0, 2)
        r_post, s_post = topk()
        key = lambda r: (r.query_id, r.rank, r.neighbor_id)  # noqa: E731
        assert sorted(map(key, r_post)) == sorted(map(key, r_pre))
        print(json.dumps({
            "probe": "indexcompact", "index": "ivf", "appends": b,
            "search_pre_s": s_pre, "compact_s": s_fold,
            "search_post_s": s_post,
            "files_post": nfiles(os.path.join(iv, "cells"))}),
            flush=True)


def drain_probe(backlogs: list) -> None:
    """Row-stream drain cost vs commit BACKLOG (round-13 item 2): the
    Python micro-batch source has no true Trigger.AvailableNow, so the
    old bounded drain paid one ~3s stream startup per 10 commits —
    O(backlog/10) startups. The auto drain (max_commits_per_batch=0 +
    chunked sink writes) must hold startups at 1 and write jobs at
    ~backlog/32: wall-clock should grow only with the real per-commit
    row work, not the startup floor. Bounded mode is timed at the
    smallest backlog for the floor comparison."""
    import shutil
    import tempfile

    from aggregation_duckdb_spark.sources import layout as L
    from aggregation_duckdb_spark.streaming import (read_table_stream,
                                                    run_table_stream)
    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    for i, b in enumerate(backlogs):
        root = tempfile.mkdtemp(prefix=f"drain-probe-{b}-")
        path = f"{root}/t"
        base = spark.range(0, 5000).select(
            F.col("id").alias("k"), (F.col("id") % 50).alias("a"),
            (F.col("id") % 37).alias("b"), F.col("id").alias("val"))
        L.write_zordered(base, path, "a", "b", bits=6, bucket_bits=3,
                         vacuum=False)
        t0 = time.time()
        for j in range(b):
            row = spark.range(j, j + 1).select(
                (F.col("id") + 100_000).alias("k"),
                (F.col("id") % 50).alias("a"),
                (F.col("id") % 37).alias("b"),
                F.col("id").alias("val"))
            L.append_zordered(row, path)
        build_s = time.time() - t0
        t0 = time.time()
        run_table_stream(spark, path, f"{root}/sink", f"{root}/ckpt")
        auto_s = time.time() - t0
        got = read_table_stream(spark, f"{root}/sink").count()
        assert got == 5000 + b, (got, b)
        out = {"probe": "stream_drain", "backlog_commits": b,
               "build_appends_seconds": round(build_s, 2),
               "auto_drain_seconds": round(auto_s, 2),
               "rows_landed": got}
        if i == 0:
            t0 = time.time()
            run_table_stream(spark, path, f"{root}/sink10",
                             f"{root}/ckpt10", max_commits_per_batch=10)
            out["bounded10_drain_seconds"] = round(time.time() - t0, 2)
            assert read_table_stream(spark,
                                     f"{root}/sink10").count() == got
        print(json.dumps(out))
        shutil.rmtree(root, ignore_errors=True)


def bucketbits_probe(bits_list: list) -> None:
    """bucket_bits sizing probe (round-13 item 6): the same 16x
    events volume laid out at 4/6/8 bucket bits — write cost, file
    counts, and selective box-read latency. What more buckets buy is
    a FLAT files-read fraction with finer pruning (at object-store
    scale, listing+footer I/O tracks files touched); what they cost
    locally is more, smaller files. Also reports what
    bucket_bits="auto" resolves to for this input."""
    import glob
    import os as _os
    import tempfile

    from aggregation_duckdb_spark.io import load_table
    from aggregation_duckdb_spark.sources import layout as L
    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    base = (load_table(spark, "events", SF_DIR)
            .select("event_id", "user_id", "value"))
    ev = base
    for i in range(15):
        ev = ev.unionByName(base.select(
            (F.col("event_id") + (i + 1) * 100_000_000).alias("event_id"),
            "user_id", "value"))
    ev = ev.localCheckpoint()
    n_rows = ev.count()
    box = (10, 60, 50, 200)
    for bb in bits_list:
        path = tempfile.mkdtemp(prefix=f"bb-probe-{bb}-")
        t0 = time.time()
        spec = L.write_zordered(ev, path, "user_id", "value",
                                bits=10, bucket_bits=bb,
                                files_per_bucket=max(1, 32 >> bb))
        write_s = time.time() - t0
        buckets = L.zbuckets_for_box(spec, *box)
        L.read_zordered(spark, path).count()       # warm listings
        pruned_df = L.read_zordered_box(spark, path, *box)
        ts, counts = [], set()
        for _ in range(3):
            t0 = time.time()
            counts.add(pruned_df.count())
            ts.append(time.time() - t0)
        allf = glob.glob(_os.path.join(path, L.DATA_DIR, "zbucket=*",
                                       "gen=*", "*.parquet"))
        chosen = [f for f in allf
                  if any(f"zbucket={b}/" in f for b in buckets)]
        print(json.dumps({
            "probe": "bucket_bits", "bucket_bits": bb, "rows": n_rows,
            "write_seconds": round(write_s, 2),
            "buckets_read": len(buckets),
            "buckets_total": 1 << spec["bucket_bits"],
            "files_read": len(chosen), "files_total": len(allf),
            "box_rows": counts.pop(),
            "box_read_seconds": round(min(ts), 2),
            "auto_resolves_to": L._auto_bucket_bits(ev)}))




def extgrowth_probe(multiples: list) -> None:
    """Growth curves for the four slowest extended entries (round-13
    item 7: dedup_prefix_pairs, pipeline_end_to_end,
    dedup_containment_pairs, text_countmin_heavyhitters): each has an
    equi-join plan pin but no measured curve past r05/r06 on current
    code. Runs the REAL matrix entries against a synthetic sf dir
    whose documents table is the sf0.1 corpus re-keyed m× (other
    tables symlinked), so the timed path is exactly the driver's."""
    import os as _os
    import shutil
    import tempfile

    from aggregation_duckdb_spark import matrix
    from aggregation_duckdb_spark.io import load_table

    spark = get_spark("scale-probe", extra_confs={"spark.ui.enabled": "false"})
    qs = matrix.queries()
    names = ["dedup_prefix_pairs", "dedup_containment_pairs",
             "text_countmin_heavyhitters", "pipeline_end_to_end"]
    base = load_table(spark, "documents", SF_DIR)
    for m in multiples:
        root = tempfile.mkdtemp(prefix=f"extgrowth-{m}-")
        for nm in _os.listdir(SF_DIR):
            if nm != "documents.parquet":
                _os.symlink(_os.path.join(SF_DIR, nm),
                            _os.path.join(root, nm))
        docs = base
        for i in range(m - 1):
            docs = docs.unionByName(base.select(
                (F.col("doc_id") + (i + 1) * 1_000_000_000)
                .alias("doc_id"), "text", "lang", "source", "n_chars"))
        (docs.coalesce(max(1, 2 * m)).write.mode("overwrite")
         .parquet(_os.path.join(root, "documents.parquet")))
        n = docs.count()
        out = {"probe": "ext_growth", "multiple": m, "doc_rows": n}
        for name in names:
            t0 = time.time()
            rows = qs[name](spark, root).count()
            out[name] = {"seconds": round(time.time() - t0, 2),
                         "rows": rows}
        print(json.dumps(out))
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--hierarchy":
        hierarchy_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 200_000)
    elif len(sys.argv) > 1 and sys.argv[1] == "--dedup":
        dedup_probe([int(a) for a in sys.argv[2:]] or [1, 4, 8])
    elif len(sys.argv) > 1 and sys.argv[1] == "--organicdedup":
        organic_dedup_probe([int(a) for a in sys.argv[2:]]
                            or [12_500, 25_000, 50_000])
    elif len(sys.argv) > 1 and sys.argv[1] == "--neardup":
        neardup_probe([int(a) for a in sys.argv[2:]] or [1, 8, 32])
    elif len(sys.argv) > 1 and sys.argv[1] == "--cc":
        cc_probe([int(a) for a in sys.argv[2:]] or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--rangejoin":
        rangejoin_probe([int(a) for a in sys.argv[2:]] or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--incremental":
        incremental_probe([int(a) for a in sys.argv[2:]] or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--spans":
        spans_probe([int(a) for a in sys.argv[2:]] or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--prefix":
        prefix_probe([int(a) for a in sys.argv[2:]] or [1, 4, 8])
    elif len(sys.argv) > 1 and sys.argv[1] == "--lines":
        global_lines_probe([int(a) for a in sys.argv[2:]] or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--curriculum":
        curriculum_probe([int(a) for a in sys.argv[2:]] or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--zupsert":
        zorder_upsert_probe([int(a) for a in sys.argv[2:]] or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--zcompact":
        zorder_compaction_probe([int(a) for a in sys.argv[2:]]
                                or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--zkeydelete":
        zorder_keydelete_probe([int(a) for a in sys.argv[2:]]
                               or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--zorder":
        zorder_probe([int(a) for a in sys.argv[2:]] or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--pack":
        pack_probe([int(a) for a in sys.argv[2:]] or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--dedupindex":
        dedupindex_probe([int(a) for a in sys.argv[2:]] or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--extgrowth":
        extgrowth_probe([int(a) for a in sys.argv[2:]] or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--drain":
        drain_probe([int(a) for a in sys.argv[2:]] or [10, 100, 1000])
    elif len(sys.argv) > 1 and sys.argv[1] == "--bucketbits":
        bucketbits_probe([int(a) for a in sys.argv[2:]] or [4, 6, 8])
    elif len(sys.argv) > 1 and sys.argv[1] == "--textindex":
        textindex_probe([int(a) for a in sys.argv[2:]] or [1, 4, 16])
    elif len(sys.argv) > 1 and sys.argv[1] == "--indexcompact":
        indexcompact_probe([int(a) for a in sys.argv[2:]] or [8, 32, 128])
    else:
        main()
