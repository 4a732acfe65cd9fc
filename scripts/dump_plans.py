"""Dump formatted physical plans of the scale-critical entries to a
markdown artifact — the in-repo evidence that the plans ARE the shapes
the 100 TB design claims: broadcast joins on dim sides, pushed filters,
bucket equi-joins instead of nested loops, partition pruning.

Usage: python scripts/dump_plans.py [out.md] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = (sys.argv[2] if len(sys.argv) > 2
          else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))

#: entry → one-line claim the plan below must visibly support
ENTRIES = {
    "hier_agg_closure": (
        "facts never shuffle for the closure join — BroadcastHashJoin on "
        "both dim sides; the only exchanges are the final aggregate"),
    "events_value_bands": (
        "range join rewritten to an equi-join: BroadcastHashJoin on the "
        "bucket key, the lo/hi range check is a post-join Filter — no "
        "BroadcastNestedLoopJoin anywhere"),
    "dedup_near_duplicates": (
        "LSH candidates from the capped one-shuffle bucket path; verify "
        "joins are hash equi-joins on doc ids"),
    "dedup_incremental": (
        "corpus side streams, batch side broadcasts: every join against "
        "the existing corpus is a BroadcastHashJoin of the batch"),
    "q_partitioned_pruning": (
        "event_type=purchase lands in PartitionFilters (directory "
        "pruning), not a post-scan Filter"),
    "q6_revenue_forecast": (
        "pure scan-aggregate: every predicate in PushedFilters, "
        "ReadSchema holds only the referenced columns"),
    "dedup_prefix_pairs": (
        "exact set-similarity join: census, rarest-first sort, prefix "
        "equi-join, verify — hash exchanges only, no nested loop"),
    "events_dau_wau": (
        "7-day rolling distinct via map-side explode: two hash "
        "aggregates and one join on the day key — no day-range "
        "self-join anywhere"),
    "mm_phash_neardup": (
        "phash banding takes the capped one-shuffle path: hash "
        "aggregate on (band, val) with in-row pair generation — no "
        "self-join, no nested loop; hamming verify is a post-explode "
        "filter"),
    "pipeline_epoch_shuffle": (
        "global md5 order without a global sort: window partitioned "
        "by the hash-prefix shard, shard offsets joined back as a "
        "BroadcastHashJoin — no single-task whole-corpus sort"),
    "dedup_global_lines": (
        "the line census aggregates on the line value (narrow "
        "(doc_id, line) pairs), the text column only appears in the "
        "final doc_id equi-join; reconstruction is an in-row filter, "
        "no explode/re-sort of full text"),
    "events_topk_paths": (
        "the stream is cut to first_n events per user by a spillable "
        "row_number window BEFORE aggregating (bounded per-user "
        "arrays, skew-safe); the group-by reuses the window's "
        "partitioning, and the top-k cut is TakeOrderedAndProject — "
        "the rank window sees only the <= k survivors, never the "
        "path-count frame"),
    "sim_knn_classify": (
        "one BroadcastNestedLoopJoin only — the bounded query "
        "broadcast against the corpus scan; label attach and vote "
        "are hash aggregate / equi-join"),
    "text_line_stats": (
        "zero shuffle exchanges before the presentation orderBy — "
        "every repetition fraction is an in-row higher-order pass"),
    "text_dedup_doc_lines": (
        "the within-doc rewrite is a pure map: indexed higher-order "
        "filter in-row, zero shuffles before the presentation "
        "orderBy"),
    "pipeline_curriculum_order": (
        "global (key, id) rank with NO single-task data sort: the "
        "doc-sized window partitions by the range-bin shard "
        "(hashpartitioning(__shard)), shard offsets join back as a "
        "BroadcastHashJoin; min/max bounds are folded literals, so no "
        "nested-loop scalar attach either"),
    "q_zorder_pruning": (
        "the 2-D box read plans its live (zbucket, gen) list as "
        "PartitionFilters (directories pruned before listing; stale "
        "generations invisible by the same filter), with the exact "
        "box predicate in PushedFilters — never a full scan"),
    "text_unigram_quality": (
        "vocab and corpus total folded in as plan literals: the "
        "scoring pass is a pure projection — zero exchanges before "
        "the presentation orderBy"),
    "events_key_skew_report": (
        "two hash aggregates, both partial/final (map-side "
        "combinable): per-key counts, then scalars over the "
        "key-cardinality frame — row-sized data shuffles once, as "
        "narrow (key,count) pairs"),
    "pipeline_pack_greedy": (
        "the sequential fill state runs as ONE FlatMapGroupsInPandas "
        "over md5 buckets — a single shuffle of narrow (id, bucket, "
        "n_tokens) rows, text never moves; no joins at all"),
    "sim_ivf_indexed": (
        "the persisted-index read prunes to probed cells: "
        "centroid_id IN (...) in PartitionFilters with "
        "dynamicpruningexpression layered on top; corpus-side joins "
        "are broadcast-hash on the cell id"),
    "text_bm25_indexed": (
        "the inverted-index road reads only the query terms' "
        "posting-list directories — tbucket IN (...) in "
        "PartitionFilters; scoring joins are hash joins on the doc "
        "id, no corpus text scan anywhere"),
    "dedup_incremental_indexed": (
        "the corpus side is three narrow stored projections (hashes, "
        "shingles, buckets) — scans of those tables, never raw "
        "corpus text; every join against them broadcasts the batch "
        "side"),
    "text_bm25_stopterm": (
        "the stop-term guard: a query containing a stop-class term "
        "routes to the shared text fold — the plan scans documents "
        "(zero-shuffle projection + TakeOrdered), with NO posting "
        "directory read anywhere; the rare term's df came from a "
        "bounded pruned-bucket probe before the plan was built"),
    "pipeline_mixture_order": (
        "stride-scheduled mixture order refuses BOTH single-task "
        "sorts: per-source rank windows partition by (source, "
        "hash-prefix shard), the global vt rank by the range-bin "
        "shard; the only SinglePartition exchanges feed "
        "cumulative-offset windows over <= num_shards bookkeeping "
        "rows; offsets join back as broadcast hash joins"),
    "events_attribution": (
        "one spillable fill-forward window on the user key (last "
        "touch, IGNORE NULLS, unbounded-preceding frame) is the only "
        "event-stream exchange — no self-join, no as-of join; the "
        "channel rollup is a narrow map-side-combinable aggregate"),
    "sim_pq_indexed": (
        "the persisted-PQ serving path: stored codebooks build the "
        "per-query distance table (broadcast), the corpus-sized scan "
        "touches ONLY the stored 8-byte code rows, and full vectors "
        "appear solely in the bounded shortlist rerank joins"),
    "q_zorder_box3d": (
        "the 3-D box read plans its live (zbucket, gen) list as "
        "PartitionFilters exactly like the 2-D road — the k-D "
        "round-robin Morton planner bounds the candidate buckets "
        "driver-side, the exact range filters land in PushedFilters"),
    "q_zorder_delete_keys": (
        "tombstoned keys are hidden by ONE BroadcastHashJoin "
        "(left-anti) over the pruned box read — the key set "
        "broadcasts, the data side never reshuffles; no data rewrite "
        "appears in any read plan"),
    "q_zorder_delete_upsert": (
        "the delete->re-insert composition reads through the same "
        "live-(zbucket, gen) PartitionFilters; the consolidated "
        "remaining-tombstone set is one broadcast left-anti join — "
        "re-inserted keys cost nothing at read time"),
    "q_zorder_schema_evolution": (
        "mixed-generation read: still the manifest-driven "
        "live-(zbucket, gen) PartitionFilters — schema merge happens "
        "at footer level, the scan set is identical; old generations "
        "backfill the new column as null in the scan output"),
    "sim_pq_indexed_exact": (
        "the full-value-verified PQ road: codes pivot once on the id "
        "(one hash aggregate), the ADC fold is an in-row expression "
        "over the broadcast literal codebook (fixed order, no float "
        "hash-agg), rerank joins are hash joins on the bounded "
        "shortlist"),
    "q_zorder_bloom_eq": (
        "the Bloom point lookup scans ONLY the buckets the sharded "
        "sidecar could not exclude — live-(zbucket, gen) "
        "PartitionFilters over the pruned set, the equality predicate "
        "in PushedFilters; the sidecar probe itself read k bitmap "
        "rows before this plan was built, never the whole index"),
    "q_zorder_diff": (
        "row-level CDC is endpoint-proportional: two manifest-pruned "
        "snapshot scans joined on the key — hash/broadcast joins "
        "only, the fingerprint is an in-row md5(to_json(struct)) "
        "projection, no history walk and no nested loop"),
    "q_zorder_restore": (
        "a read after RESTORE plans exactly like any snapshot read — "
        "the restored manifest's live-(zbucket, gen) PartitionFilters; "
        "restoring moved METADATA only, so no rewritten data appears "
        "anywhere in the plan"),
    "q_zorder_merge": (
        "a read after conditional MERGE is an ordinary pruned snapshot "
        "scan — the clause evaluation happened once at write time over "
        "only the source-touched buckets; no merge machinery, no "
        "nested loop, survives in any read plan"),
    "q_zorder_clone": (
        "the mutated shallow clone's read unions per-root scans — "
        "foreign (source-root) generations and local diverged ones, "
        "each with live-(zbucket, gen) PartitionFilters under its own "
        "basePath; zero copied data anywhere"),
    "q_zorder_cdf_write": (
        "the feed read is a plain scan of the stored change-file "
        "partitions (_commit_version directory pruning) — NO snapshot "
        "endpoint scans, no keyed diff join anywhere: the writer "
        "already classified the rows"),
    "q_zorder_time_layout": (
        "the datetime box read prunes live-(zbucket, gen) directories "
        "via PartitionFilters exactly like an integer layout; the "
        "original timestamp range lands in PushedFilters on the "
        "surviving files"),
    "q_zorder_count": (
        "COUNT(*) on clean snapshots never scans data — the counts "
        "come from manifest arithmetic; only the delta batch "
        "contributes a (footer-counted) scan, so the plan is a "
        "one-row local relation"),
    "q_zorder_maintain": (
        "a read after maintenance is an ordinary pruned snapshot scan "
        "— the deltas are folded into live-(zbucket, gen) directories; "
        "no delta-batch unions survive in the plan"),
    "q_zorder_alter": (
        "a read through the column mapping is the SAME pruned snapshot "
        "scan plus a Project: renames are aliases, the dropped column "
        "never appears in ReadSchema (column pruning), the added "
        "column's generation-aware default is a when(gen IN ...) "
        "expression — no extra scan, join, or shuffle anywhere"),
    "stream_table_read": (
        "reading the drained row stream is a plain scan of the "
        "_commit_version-partitioned sink — snapshot and append "
        "batches landed once; no manifest walks or diff joins at "
        "read time"),
    "q_zorder_merge_sync": (
        "a read after a NOT-MATCHED-BY-SOURCE merge is an ordinary "
        "pruned snapshot scan — the sync rewrote only victim buckets; "
        "no residual join or delta union in the plan"),
    "q_zorder_generated": (
        "after the fold the generated column is MATERIALIZED: the "
        "read is a plain pruned scan with the column in ReadSchema — "
        "no per-row expression evaluation left in the plan"),
    "text_bpe_encode": (
        "real BPE encode is ONE Arrow-batched map pass over the scan: "
        "ArrowEvalPython present, zero Exchange operators, no join — "
        "the broadcast merge table lives in the UDF closure"),
    "q_zorder_purge": (
        "physical GDPR erasure's READ side: plain pruned table read "
        "(the purge work happened at build: tombstone -> victim-bucket "
        "fold -> eager vacuum -> raw residual sweep)"),
    "hier_agg_by_month": (
        "the customer attach goes through the SIZE-GATED broadcast "
        "hint (runtime.broadcast_if_small): BroadcastHashJoin at this "
        "scale, demoted to an AQE-chosen shuffled join past the gate "
        "instead of a forced multi-TB broadcast"),
    "q_zorder_recluster": (
        "the datetime box read on the NEW layout prunes "
        "live-(zbucket, gen) directories via PartitionFilters with "
        "the timestamp range in PushedFilters — the re-clustered "
        "table plans exactly like one created on those dims"),
    "q_forget_keys": (
        "one-call GDPR erasure's READ side: plain pruned table read — "
        "the orchestration (dedup/text/ivf/pq index purges, then the "
        "table purge, each raw-verified clean) happened at build, "
        "every side count- or file-byte-gated, no unconditional "
        "broadcasts"),
    "text_bpe_encode_batch": (
        "HF-parity BPE is the SAME zero-shuffle Arrow shape as the "
        "one-at-a-time spec: ArrowEvalPython present, zero Exchange "
        "operators, no join"),
    "text_bm25_appended": (
        "BM25 over the incrementally-grown index still plans term-"
        "bucket PartitionFilters — batch partitions nest under "
        "tbucket, so appends never widen a query's read set"),
}


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.md"
    from aggregation_duckdb_spark import matrix
    from aggregation_duckdb_spark.plans import physical_plan
    from aggregation_duckdb_spark.session import get_spark

    spark = get_spark("plan-dump", extra_confs={"spark.ui.enabled": "false"})
    qs = matrix.queries()
    title = os.path.splitext(os.path.basename(out_path))[0] \
        .replace("PLANS_r0", "round-").replace("PLANS", "audit")
    lines = [
        f"# Physical plans — {title} audit",
        "",
        f"`df.explain('formatted')` of the scale-critical entries at "
        f"{SF_DIR} (regenerate: `python scripts/dump_plans.py`). Each "
        "plan is preceded by the claim it must visibly support; the "
        "plan-shape pytest suite (tests/test_plans.py) pins the same "
        "properties against regressions.",
        "",
    ]
    for name, claim in ENTRIES.items():
        df = qs[name](spark, SF_DIR)
        plan = physical_plan(df, "formatted")
        lines += [f"## {name}", "", f"**Claim:** {claim}", "",
                  "```", plan.rstrip(), "```", ""]
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
