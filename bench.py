"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The headline set covers the flagship hierarchical aggregation (both
strategies), the big-fact scan aggregation, dedup at LSH scale,
similarity top-k, and event-time bucketing — the engine's
scale-critical paths.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "hier_agg_closure",
    "hier_agg_rollup",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q18_large_volume_customers",
    "q8_market_share",
    "q21_waiting_suppliers",
    "q_join_fact_dims",
    "q_window_analytics",
    "q_count_distinct",
    "dedup_minhash_lsh",
    "dedup_near_duplicates",
    "dedup_simhash",
    "text_stats",
    "sim_topk_bruteforce",
    "sim_embedding_neardup",
    "events_tumbling",
    "events_sessionize",
    "asof_join_events",
    "hier_distinct_twostage",
    "stream_tumbling",
]

# Round-4/5 operators tracked OUTSIDE the headline total (the headline
# is the round-over-round comparable; growing it would skew the ratio
# the driver gates on). Single timed run each, reported under
# "extended".
EXTENDED = [
    "dedup_cc_clusters",
    "text_tfidf_topterms",
    "pipeline_pack_sequences",
    "events_state_intervals",
    "pipeline_quantile_filter",
    "pipeline_end_to_end",
    # round 5:
    "dedup_containment_pairs",
    "pipeline_mixture_weights",
    "pipeline_rebalance",
    "text_countmin_heavyhitters",
    "events_value_bands",
    "events_session_overlap",
    "pipeline_chunk_overlap",
    "dedup_incremental",
    "pipeline_group_sample",
    "pipeline_bloom_decontaminate",
    "sim_semdedup_keepers",
    "events_funnel",
    "events_retention_cohorts",
    "q_multiformat_roundtrip",
    "q_partitioned_pruning",
    "q_variant_extract",
    "text_bpe_token_count",
    "dedup_duplicate_spans",
    "asof_nearest_events",
    "events_hourly_anomalies",
    "sim_ivf_topk_exact",
    "pipeline_leakage_free_split",
    "hier_agg_by_month",
    "dedup_prefix_pairs",
    "pipeline_corpus_report",
    "hier_agg_time",
    "events_transition_matrix",
    "pipeline_snapshot_diff",
    "events_dau_wau",
    "dedup_minhash_estimate",
    # round 6:
    "mm_phash_neardup",
    "pipeline_epoch_shuffle",
    "dedup_cluster_sizes",
    "text_ngram_novelty",
    "stream_dau",
    "text_token_vocab",
    "pipeline_leak_report",
    "dedup_global_lines",
    "text_line_stats",
    "events_topk_paths",
    "sim_knn_classify",
    "text_encode_ids",
    "text_bpe_encode",
    "text_dedup_doc_lines",
    "pipeline_curriculum_order",
    "q_zorder_pruning",
    "text_unigram_quality",
    "pipeline_dataset_hash",
    "stream_corpus_hash",
    "events_key_skew_report",
    "pipeline_bucket_fingerprints",
    "pipeline_pack_greedy",
    "text_normalize",
    "sim_ivf_indexed",
    "dedup_incremental_indexed",
    "text_bm25_search",
    "text_bm25_indexed",
    # round 7:
    "text_bm25_stopterm",
    "stream_zorder_ingest",
    "pipeline_mixture_order",
    "events_attribution",
    "sim_pq_indexed",
    "q_zorder_upsert",
    "stream_attribution",
    "q_zorder_timetravel",
    "q_zorder_zonemap",
    "q_zorder_delete",
    "events_rfm",
    # round 9:
    "q_zorder_delete_keys",
    "q_zorder_box3d",
    "sim_pq_indexed_exact",
    # round 10:
    "q_zorder_delete_upsert",
    "q_zorder_schema_evolution",
    # round 11: the pruning-machinery reads as tracked signals —
    # Bloom point lookup and restore/CDC snapshot reads
    "q_zorder_bloom_eq",
    "q_zorder_restore",
    "q_zorder_diff",
    "stream_change_feed",
    "q_zorder_merge",
    "q_zorder_clone",
    # round 12: the round-11 library verbs as tracked entries
    "q_zorder_cdf_write",
    "q_zorder_time_layout",
    "q_zorder_count",
    "q_zorder_maintain",
]

# Entries that build a DURABLE artifact (z-ordered table, ANN/BM25/
# dedup index) once per (application, sf) and serve every later call
# from it. One number conflates two different costs — the one-time
# build and the steady-state read — and the build noise buried the
# read signal in round-over-round comparisons (r8→r9 headline drift).
# These report {"build_s", "read_s"}: the FIRST run pays the build,
# the second run hits the warm artifact and is the pure read;
# build_s is their difference. read_s is the tracked regression
# signal (the ~0.2-0.3 s class).
DURABLE = {
    "q_zorder_pruning", "q_zorder_upsert", "q_zorder_timetravel",
    "q_zorder_zonemap", "q_zorder_delete", "q_zorder_delete_keys",
    "q_zorder_box3d", "q_zorder_delete_upsert",
    "q_zorder_schema_evolution", "sim_ivf_indexed", "sim_pq_indexed",
    "sim_pq_indexed_exact", "text_bm25_indexed",
    "dedup_incremental_indexed",
    "q_zorder_bloom_eq", "q_zorder_restore", "q_zorder_diff",
    "stream_change_feed", "q_zorder_merge", "q_zorder_clone",
    "q_zorder_cdf_write", "q_zorder_time_layout", "q_zorder_count",
    "q_zorder_maintain",
}


def _loadavg() -> list[float]:
    try:
        with open("/proc/loadavg") as f:
            return [float(x) for x in f.read().split()[:3]]
    except (OSError, ValueError):
        return []


def _cpu_ticks() -> dict[str, int]:
    """Aggregate CPU ticks from /proc/stat — ``steal`` is the one
    loadavg can NOT see: ticks the hypervisor ran someone else while
    this guest was runnable. A recording with steal_pct >> 0 is
    host-noise-inflated no matter how idle the guest looked."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        names = ("user", "nice", "system", "idle", "iowait", "irq",
                 "softirq", "steal")
        return {n: int(v) for n, v in zip(names, parts[1:9])}
    except (OSError, ValueError):
        return {}


def _wait_for_idle() -> float:
    """Two of the last three driver-recorded benches were inflated
    1.3-1.5x uniformly by co-resident load (pytest/oracle JVMs still
    draining, host-level steal) and needed manual idle re-runs to
    interpret. Wait — bounded — for the 1-minute loadavg to drop
    below SPARK_GRAFT_LOAD_MAX (default 0.5) before timing anything;
    returns seconds waited. The recorded loadavg fields make the
    artifact self-certifying either way."""
    limit = float(os.environ.get("SPARK_GRAFT_LOAD_MAX", "0.5"))
    budget = float(os.environ.get("SPARK_GRAFT_IDLE_WAIT", "300"))
    waited = 0.0
    while waited < budget:
        la = _loadavg()
        if not la or la[0] < limit:
            break
        print(f"# loadavg {la[0]} >= {limit}: waiting for an idle box "
              f"({int(waited)}/{int(budget)}s)", file=sys.stderr)
        time.sleep(15)
        waited += 15
    return waited


def main() -> None:
    from aggregation_duckdb_spark import matrix
    from aggregation_duckdb_spark.session import get_spark

    idle_wait_s = _wait_for_idle()
    load_before = _loadavg()
    ticks_before = _cpu_ticks()

    spark = get_spark("bench", master=f"local[{CPUS}]",
                      extra_confs={"spark.ui.enabled": "false"})
    qs = matrix.queries()

    # warmup: JVM/codegen startup plus one tiny end-to-end flagship run
    # (parquet reader init, broadcast machinery) so q1 measures the
    # engine, not first-touch initialization
    spark.range(1000).selectExpr("sum(id)").collect()
    try:
        from aggregation_duckdb_spark.flagship import flagship_closure_agg
        flagship_closure_agg(spark, "/root/testdata/sf0.001").count()
    except Exception as exc:  # warmup must never fail the bench
        print(f"# warmup skipped: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    split: dict[str, dict] = {}
    for name in HEADLINE:
        fn = qs[name]
        # median of 3: best-of-2 proved too noisy to distinguish a real
        # 1.5x change from run variance (r01 vs r02 swung 1.12x on
        # identical plans); the median discards one-off JIT/GC hiccups
        # in either direction. The [min, max] spread is emitted so a
        # round-over-round delta can be read against the run variance
        # it has to clear before it means anything.
        #
        # Each run additionally records its build/exec SPLIT (round
        # 16, additive): build_s = driver-side DataFrame construction
        # (py4j plan building, eager checkpoints, streaming drains),
        # exec_s = the count() action — the part that scales with
        # cores and data. The timed code path is UNCHANGED (the same
        # two statements, now clocked individually); the reported
        # split belongs to the run whose TOTAL is the median, so
        # queries[name] == build_s + exec_s of one real run. This is
        # what a low-core/high-core comparison should read: at sf0.1
        # most totals are fixed-overhead-dominated, and ratios on the
        # total mostly measure py4j, not the engine.
        runs, n = [], 0
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            t1 = time.time()
            n = df.count()  # materialize the full result
            t2 = time.time()
            runs.append((t2 - t0, t1 - t0, t2 - t1))
        med = sorted(runs)[1]
        timings[name] = round(med[0], 3)
        split[name] = {"build_s": round(med[1], 3),
                       "exec_s": round(med[2], 3)}
        spread[name] = [round(min(r[0] for r in runs), 3),
                        round(max(r[0] for r in runs), 3)]
        print(f"# {name}: {n} rows in {timings[name]}s "
              f"(build {split[name]['build_s']} + exec "
              f"{split[name]['exec_s']}; spread {spread[name][0]}-"
              f"{spread[name][1]})",
              file=sys.stderr)
        df = None
        gc.collect()  # see the extended loop note

    extended: dict[str, object] = {}
    for name in EXTENDED:
        if name not in qs:
            continue
        t0 = time.time()
        n = qs[name](spark, SF_DIR).count()
        first = time.time() - t0
        if name in DURABLE:
            t0 = time.time()
            qs[name](spark, SF_DIR).count()   # warm artifact: pure read
            read_s = time.time() - t0
            extended[name] = {"build_s": round(max(first - read_s, 0.0), 3),
                              "read_s": round(read_s, 3)}
            print(f"# extended {name}: {n} rows, build "
                  f"{extended[name]['build_s']}s + read "
                  f"{extended[name]['read_s']}s", file=sys.stderr)
        else:
            extended[name] = round(first, 3)
            print(f"# extended {name}: {n} rows in {extended[name]}s",
                  file=sys.stderr)
        # release this entry's materialized blocks before the next one:
        # localCheckpoint RDDs stay pinned in the block manager while
        # the Python-side DataFrame is referenced, and 40 entries of
        # accumulated blocks measurably inflate late entries at sf>=1
        # (driver-side GC is what lets Spark's ContextCleaner run)
        gc.collect()

    try:
        sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    total = round(sum(timings.values()), 3)
    # Load context makes the number self-certifying: a headline taken
    # at loadavg ~0 is comparable round-over-round; one taken under
    # co-resident load (or host steal) is flagged by its own artifact
    # instead of needing a manual idle re-run to interpret.
    load = {"loadavg_before": load_before, "loadavg_after": _loadavg(),
            "idle_wait_s": round(idle_wait_s, 1)}
    t1 = _cpu_ticks()
    if ticks_before and t1:
        d = {k: t1[k] - ticks_before[k]
             for k in t1 if k in ticks_before}
        # % of this run's non-idle CPU time the hypervisor gave to
        # someone else: idle and iowait ticks are excluded from the
        # denominator, else a partially-idle guest understates steal
        # (steal over total elapsed ticks, not over CPU actually used)
        busy = sum(v for k, v in d.items()
                   if k not in ("idle", "iowait")) or 1
        load["steal_pct"] = round(100.0 * d.get("steal", 0) / busy, 2)
        if load["steal_pct"] >= 5.0:       # BASELINE.md's steal rule,
            load["diagnostic_only"] = True  # enforced by the artifact
            load["diagnostic_reason"] = (
                f"hypervisor steal {load['steal_pct']}% >= 5% over "
                "the run: timings inflated by the host; headline not "
                "comparable round-over-round")
    # Self-labeling: a recording taken while OTHER work was running on
    # the box (post-run 1-min loadavg above the gate — this bench's
    # own executors have drained by then, so residual load is
    # co-resident) is NOT round-over-round comparable. Flag it in the
    # artifact itself so a driver row taken co-resident reads as
    # diagnostic, not as a regression (r10-r12 lesson).
    # Co-residency self-labeling. loadavg immediately after the run
    # mixes OUR OWN extended-phase load with any co-resident's (a
    # solo r14 run read 1-min 2.2 at the end — all ours), so judge it
    # only after a settle window: our executors are idle by then, so
    # our 1-min contribution decays by exp(-settle/60) (~0.22 at 90s
    # — a 2.2 end value settles under 0.5) while a co-resident's
    # steady load does not decay at all. Gate the SETTLED 1-min at
    # 1.0: solo runs land well under, the co-resident r12/r13 driver
    # rows (steady 3+) would stay well over.
    settle = float(os.environ.get("SPARK_GRAFT_POSTLOAD_SETTLE", "90"))
    gate = float(os.environ.get("SPARK_GRAFT_POSTLOAD_MAX", "1.0"))
    if settle > 0:
        import math
        time.sleep(settle)
        settled = _loadavg()
        load["loadavg_settled"] = settled
        # our own end-of-run 1-min load decays by exp(-settle/60)
        # while our executors sit idle; anything ABOVE that decay
        # bound is someone else's steady load (a heavy sf1 extended
        # phase ends at 1-min ~5, whose 90s residual ~1.1 must not
        # read as a co-resident)
        own_bound = (load["loadavg_after"][0]
                     * math.exp(-settle / 60.0)
                     if load["loadavg_after"] else 0.0)
        excess = round((settled[0] - own_bound) if settled else 0.0, 2)
        load["coresident_excess"] = excess
        if excess >= gate:
            load["diagnostic_only"] = True
            load["diagnostic_reason"] = (
                f"settled 1-min loadavg {settled[0]} exceeds the own-"
                f"load decay bound {round(own_bound, 2)} by {excess} "
                f">= {gate}: co-resident load during the recording; "
                "headline not comparable round-over-round")
    # Two JSON lines, detail first and the compact headline LAST: the
    # driver's bench artifact keeps only the tail of stdout, and the
    # extended map has grown past that window — the line that must
    # survive truncation is the round-over-round comparable.
    print(json.dumps({
        "metric": "headline_suite_seconds_detail",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_split": split,
        "spread": spread,
        "extended": extended,
        "sf": sf,
        **load,
    }))
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_split": split,
        "sf": sf,
        **load,
    }))


if __name__ == "__main__":
    main()
