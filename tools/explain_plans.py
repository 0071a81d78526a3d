"""Dump physical plans for headline queries into PLANS.md and check
scale-posture invariants: pushed-down filters/pruned columns at the
scans, broadcast joins for dims, whole-stage codegen coverage, and no
Python (row-at-a-time) UDFs in hot paths.

Run: python tools/explain_plans.py [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# The plans worth reading: one per architectural family.
HEADLINE = [
    "q01_pricing_summary",      # scan-heavy agg: pushdown + codegen
    "q05_local_supplier",       # multi-join: broadcast dims
    "messages_resolved",        # F1/F4 windows: single-scan spine
    "messages_imputed",         # M-series: projection-only over spine
    "participants_view",        # G1 folds: one shuffle to participant grain
    "a3_theme_distributions",   # melt+agg: single shuffle
    "doc_minhash_pairs",        # LSH band join: no cross product
    "doc_jaccard_pairs",        # inverted-index blocking: no cross product
    "ann_topk_ivf",             # literal centroids: zero-shuffle assign
    "k7_advert_sync",           # set difference: anti join
    "r1_model_matrix",          # wide one-hot projection
    "ws_correction_fixpoint",   # M10/M11 state machine: projection-only
    "sessionize_events",        # lag->cumsum->group: participant-hashed
    "skew_salted_distinct",     # two-phase salted distinct
    "doc_containment_pairs",    # shared shingle cache + inverted index
    "events_asof_join",         # as-of via tagged union: window, no join
    "events_range_join",        # bucketed range join: equi-join, no NLJ
    "events_rollup",            # grouping sets: one Expand + one agg
    "events_funnel",            # chained windows: one exchange
    "doc_repetition",           # explode + two-level agg
    "doc_lang_confusion",       # explode + broadcast marker join + argmax
    "doc_top_terms",            # tf/df re-group + broadcast-back
    "seq_packing",              # pack placement: one window shuffle
    "doc_chunks",               # chunk plan: zero-shuffle explode
    "cdc_changeset",            # snapshot diff: one grouped agg, no join
    "dq_messages",              # expectations: one agg, stack-unpivoted
    "agg_state_merge",          # state maintenance: union + one combine
    "doc_cms_heavy_hitters",    # CMS: fixed cells, broadcast probe
    "doc_c4_clean",             # span df + hash-keyed back-join + reassembly
    "doc_bm25_topk",            # tf/df aggs + broadcast query/corpus dims
    "doc_bloom_contamination",  # bitmap build: one bit_or agg; broadcast probe
    "emb_kmeans",               # literal-centroid assign: zero-shuffle project
    "emb_semantic_neardup",     # cluster-blocked self-join, exact verify
    "doc_lm_score",             # bigram LM: explode + 2 hash joins + fold
    "doc_importance_weights",   # dual-model scoring in one exploded pass
    "doc_split_assign",         # exact split: one strata-keyed window
    "events_zorder_key",        # Morton key: pure codegen projection
    "orders_col_stats",         # one-agg ANALYZE: Expand for exact NDVs
    "events_anomaly_days",      # daily agg + trailing window, int-exact 2s
    "ann_recall_eval",          # metric joins over top-k results
    "doc_pmi_collocations",     # token+bigram aggs, rational PMI top-k
    "doc_curation_report",      # 3 doc_id-keyed left joins of components
    "doc_bm25_indexed",         # postings-index serve: broadcast semi-join
    "doc_classifier_margin",    # linear inference: zero-shuffle projection
    "doc_length_percentiles",   # percentile via broadcast HDR histogram
    "scd2_messages",            # SCD2: change-compress + intervals, 1 shuffle
    "doc_hybrid_rrf",           # RRF fusion: tiny top-k full-outer + re-rank
    "doc_batch_plan",           # length-bucketed batching: sharded windows
    "emb_quantize",             # int8 quantize: broadcast stats, projection
    "emb_gram",                 # PCA stats: one explode into d^2 cells
    "cust_linkage",             # FS linkage: blocked equi-join + projection
    "doc_bpe_tokens",           # BPE: final vocab explode+agg (fit upstream)
    "doc_bm25_incr",            # LSM index serve: deltas + broadcast tombstones
    "a4_kanon",                 # small-cell suppression over the A4 report
    "events_gapfill",           # dense axis: tiny sequence explode + window
    "events_json_props",        # from_json schema-on-read + rollup
    "events_pivot",             # explicit-list pivot: one hash agg
    "mm_phash_pairs",           # banded hamming join, pigeonhole-exact
    "q07_volume_shipping",      # 5-way star join: all dims broadcast
    "q15_top_supplier",         # correlated MAX as rank-1 window on agg
    "q17_small_quantity_revenue",  # per-part avg joined back, brand pushed
    "q18_large_orders",         # HAVING agg broadcast into orders probe
    "table_point_lookup",       # keyed get: single bucket path resolved
    "table_dv_delete",          # dv-resolved read: broadcast anti-join only
    "doc_dup_spans",            # sliding-gram dup coverage: 3 shuffles
    "r2_suff_stats",            # grouped cells = IRLS sufficient stats
    "q08_market_share",         # conditional agg over 6-way star
    "q13_customer_distribution",  # outer-join count + histogram regroup
    "table_value_index",        # secondary index: one-bucket value read
    "a1_mv_stream",             # two-level distinct MV read + recompute join
    "a2_mv_stream",             # same witness MV, per-participant rollup
    "a3_mv_stream",             # flat count MV: state scan IS the answer
    "a4_mv_stream",             # exploded distinct MV read + recompute join
    "k6_incremental",           # changed-participant recompute + batch join
    "a5_mv_stream",             # cross-tab count MV: state scan
    "a7_mv_stream",             # day-binned traffic MV: re-bin by retract+add
    "a8_mv_stream",             # exploded location count MV
    "a9_mv_stream",             # witness-set MV: live groups ARE the answer
    "a6_incremental",           # touched-group exact top-k re-rank
    "a1_mv_cascade",            # two maintained states anti-joined: consent cascade
    "a1_mv_tiered",             # MV over the MV's feed: COUNT(DISTINCT) flat
    "ann_topk_ivf_indexed",     # persisted IVF: probed-bucket read only
    "ann_topk_ivf_trained",     # trained quantizer served from the index
    "ann_ivf_stream",           # stream-maintained index read
    "participants_view_incr",   # G1 re-fold of touched participants only
    "messages_view_incr",       # G2 re-fold of touched participants only
    "participants_view_sync",   # maintained G1 view table: full-state read
    "messages_view_sync",       # maintained G2 view table: full-state read
    "a1_mv_cascade_labels",     # cascade w/ exists(labels) stop detection
    "ws_move_feed_mv",          # WS-move retract+add + previous_datasets
    "maintenance_fanout",       # one drain, 3 sinks: per-dataset rollups
    "e2e_incremental_run",      # capstone: 14 maintained artifacts checksummed
    "k2_incremental",           # maintained K2 export: zero-shuffle read
    "k3_incremental",           # maintained K3 matrix: zero-shuffle read
    "run_manifest",             # run-manifest table read
    "ann_retrain_swap",         # blue/green swap: both generations' recall
]


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> list[str]:
    notes = []
    scans = re.findall(r"Scan parquet[^\n]*", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if any(p.strip() for p in pushed):
        notes.append(f"pushed filters at scan: {sum(1 for p in pushed if p.strip())}/{len(scans)} scans")
    bcast = len(re.findall(r"BroadcastHashJoin", plan))
    smj = len(re.findall(r"SortMergeJoin", plan))
    shj = len(re.findall(r"ShuffledHashJoin", plan))
    if bcast or smj or shj:
        notes.append(f"joins: {bcast} broadcast, {smj} sort-merge, {shj} shuffled-hash")
    # Count DISTINCT operator ids: a cached (InMemoryRelation) subtree
    # prints once per reference but executes once — shared ids dedupe.
    exch = len(set(re.findall(r"(?<!Broadcast)Exchange \((\d+)\)", plan)))
    notes.append(f"shuffle exchanges: {exch}")
    n_imr = len(re.findall(r"InMemoryTableScan", plan))
    if n_imr:
        notes.append(f"cached-relation scans: {n_imr}")
    wsc = len(set(re.findall(r"\[codegen id : (\d+)\]", plan)))
    if wsc:
        notes.append(f"whole-stage codegen spans: {wsc}")
    if re.search(r"BatchEvalPython|PythonUDF", plan):
        notes.append("!! row-at-a-time Python UDF in plan")
    if re.search(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan):
        notes.append("arrow-batched python stage (expected only in multimodal)")
    if re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan):
        notes.append("note: nested-loop/cartesian present (ok only for tiny broadcast query sets)")
    return notes


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    from pyspark.sql import SparkSession

    from engagement_data_pipeline_spark.queries.registry import QUERIES

    spark = (SparkSession.builder.master("local[8]")
             .appName("explain")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.python.sql.dataFrameDebugging.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    out = ["# PLANS — physical plans of the headline queries",
           "",
           f"Generated by tools/explain_plans.py at {SF_DIR} (plan shape is",
           "sf-independent). One section per architectural family; the audit",
           "line summarizes scan pushdown, join strategies, shuffle count and",
           "codegen coverage. Full `.explain('formatted')` output follows.",
           ""]
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = plan_of(df)
        notes = audit(plan)
        out.append(f"## {name}")
        out.append("")
        for n in notes:
            out.append(f"- {n}")
        out.append("")
        out.append("```")
        # keep the structured operator tree, drop the verbose field dumps
        tree_end = plan.find("\n\n")
        out.append(plan[:tree_end] if tree_end > 0 else plan)
        out.append("```")
        out.append("")
        print(f"{name}: " + "; ".join(notes))

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
