"""Structural plan invariants for headline queries: the properties
PLANS.md audits by hand, pinned so a refactor cannot silently
reintroduce a slow shape. Explain-only — no query executes (the
fit-collecting queries are excluded on purpose). The MV/incremental
queries DO build their on-disk fixture (a one-time stream drain per
process, cached by fixture_dir) before the explain — the pinned plan
is the read side, which is the part that must stay cheap."""

import re

import pytest

SF = "/root/testdata/sf0.001"

#: query -> (max shuffle exchanges, cartesian/NLJ allowed?)
#: NLJ allowance = the deliberate one-row/broadcast-literal cross
#: joins (stats rows, query sets) — never a data-data product.
CASES = {
    "q01_pricing_summary": (2, False),
    "messages_resolved": (4, False),
    "doc_minhash_pairs": (8, False),
    "doc_jaccard_pairs": (8, False),
    "events_asof_join": (3, False),
    "events_range_join": (2, False),
    "events_attribution": (4, False),
    "events_gapfill": (4, False),
    "doc_batch_plan": (3, False),
    "emb_quantize": (2, True),
    "emb_gram": (2, False),
    "cust_linkage": (2, False),
    "doc_hybrid_rrf": (14, True),
    "scd2_messages": (4, False),
    "mm_phash_pairs": (4, False),
    "events_pivot": (3, False),
    "events_json_props": (2, False),
    # round 6 TPC-H additions: q07 = one wide shuffle (the groupBy;
    # every dim broadcast), q15 = supplier agg + rank window, q17 =
    # brand-filtered double pass + scalar agg, q18 = having-filtered
    # agg joined back + global top-100 sort
    "q07_volume_shipping": (1, False),
    # q08 = conditional agg over a 6-way star, one wide shuffle;
    # q13 = outer-join count + histogram re-group
    "q08_market_share": (2, False),
    "q13_customer_distribution": (3, False),
    "q15_top_supplier": (3, False),
    "q17_small_quantity_revenue": (3, False),
    "q18_large_orders": (4, False),
    # round 7: dup-gram agg + hot-hash join + per-doc window;
    # dv-resolved snapshot read = pure broadcast anti-join, NO shuffle
    "doc_dup_spans": (4, False),
    "table_dv_delete": (0, False),
    # round 10: stream-maintained MV reads joined against their batch
    # recompute (the proof harness doubles the plan; the maintained
    # side alone is 1-2 exchanges). a3's state IS the answer grain —
    # one exchange total even with the recompute join.
    "a1_mv_stream": (8, False),
    "a2_mv_stream": (8, False),
    "a3_mv_stream": (2, False),
    "a4_mv_stream": (4, False),
    "k6_incremental": (8, False),
    # flat count MVs: the state scan is the answer; one exchange even
    # joined against the batch recompute. a9's witness set adds the
    # recompute's distinct.
    "a5_mv_stream": (2, False),
    "a7_mv_stream": (2, False),
    "a8_mv_stream": (2, False),
    "a9_mv_stream": (3, False),
    # touched-group exact re-rank: feed scan + two rank windows +
    # the proof join against the batch top-k
    "a6_incremental": (8, False),
    # anti-join of two maintained states (stop set broadcasts) + the
    # per-dataset rollup, doubled by the proof recompute
    "a1_mv_cascade": (5, False),
    # tier-2 state IS the per-dataset answer: one scan + the proof
    # recompute's distinct
    "a1_mv_tiered": (2, False),
    # round 11: persisted IVF — probe cells resolved driver-side, the
    # scan reads only probed buckets; one exchange for the per-query
    # top-k. Same budget trained and stream-maintained.
    "ann_topk_ivf_indexed": (2, False),
    "ann_topk_ivf_trained": (2, False),
    "ann_ivf_stream": (2, False),
    # G1/G2 incremental re-fold: feed diff (full-outer per changed
    # bucket) + touched-set broadcast semi-join + the one
    # participant-grain fold shuffle; G2 doubles the branches (demog
    # fold + withdrawn window + RQA join)
    "participants_view_incr": (7, False),
    "messages_view_incr": (13, False),
    # cascade read over labels-array fixture: same shape as
    # a1_mv_cascade (stop set broadcasts)
    "a1_mv_cascade_labels": (5, False),
    # WS-move MV read joined against the (dataset, chain) recompute
    "ws_move_feed_mv": (2, False),
    # fan-out read: three maintained states (witness MV, slot MV,
    # secondary index) each rolled up per dataset (3 exchanges) +
    # one join exchange — never a source-table scan
    "maintenance_fanout": (4, False),
    # maintained G1/G2 views: dv-resolved table reads — broadcast
    # anti-join only, zero shuffles
    "participants_view_sync": (0, False),
    "messages_view_sync": (0, False),
    # round 12: maintained exports and the run manifest are plain
    # dv-resolved table reads — ZERO shuffles at read time; the whole
    # maintenance cost lives in the per-commit refreshes
    "k2_incremental": (0, False),
    "k3_incremental": (0, False),
    "run_manifest": (0, False),
    # the e2e capstone reads 16 maintained artifacts (incl. the text
    # index's resolved postings and the ANN cells) and reduces each
    # to one checksum row: mostly single-partition aggs + the A-series
    # read-time rollups (measured 27 — the two index members add
    # their checksum aggs; their reads are scan + broadcast anti-join,
    # zero data shuffles)
    "e2e_incremental_run": (27, False),
    # both generations' indexed top-k + retrieval evals against the
    # brute-force truth (whose query set enters as a broadcast-literal
    # cross — the allowed NLJ, never data-data)
    "ann_retrain_swap": (24, True),
}


def _plan(spark, name):
    from engagement_data_pipeline_spark.queries.registry import QUERIES

    df = QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(CASES))
def test_plan_shape(spark, name):
    max_exchanges, nlj_ok = CASES[name]
    plan = _plan(spark, name)
    # never a row-at-a-time Python UDF; the only Python stages in the
    # engine are the Arrow multimodal kernels
    assert "BatchEvalPython" not in plan
    if "ArrowEvalPython" in plan or "MapInPandas" in plan:
        assert name.startswith("mm_"), f"unexpected python stage in {name}"
    if not nlj_ok:
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
    n_exch = len(re.findall(r"\n[^\n]*\bExchange hashpartitioning", plan)) \
        + len(re.findall(r"\n[^\n]*\bExchange rangepartitioning", plan)) \
        + len(re.findall(r"\n[^\n]*\bExchange SinglePartition", plan))
    assert n_exch <= max_exchanges, (
        f"{name}: {n_exch} shuffle exchanges > budget {max_exchanges}")
