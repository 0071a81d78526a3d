"""Crash-resume of the REAL composed pipeline (not synthetic stages):
a run dies MID-STAGE after refreshing only one of the two column
views; re-invoking the same run_id resumes from the manifest, the
diverged view watermarks refresh independently, and the final
maintained states equal the batch recompute."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.analysis.runner import (
    read_run,
    run_incremental_pipeline,
)
from engagement_data_pipeline_spark.labels.views import (
    build_messages_view,
    build_participants_view,
    messages_by_column,
    participants_by_column,
    refresh_participants_view,
    refresh_views,
)
from engagement_data_pipeline_spark.queries import engagement
from engagement_data_pipeline_spark.queries.e2e_q import (
    _impute_tf,
    _RECODE,
    _RECODE_LABELS,
)
from engagement_data_pipeline_spark.streaming.ingest import (
    foreach_batch_upsert,
    read_merged_table,
    read_table_manifest,
)
from engagement_data_pipeline_spark.streaming.transform import (
    build_transform_table,
    refresh_transform_table,
)

SF = "/root/testdata/sf0.001"
CONFIG = engagement.CONFIG
#: small deterministic slice of the resolved corpus (~3%)
_SLICE = "CAST(substring(message_id, 5) AS BIGINT) % 37 = 0"


def _state(df):
    return {tuple(r) for r in df.select(*sorted(df.columns)).collect()}


def test_composed_run_resumes_mid_stage(spark, tmp_path):
    base = str(tmp_path)
    raw = os.path.join(base, "raw")
    imputed = os.path.join(base, "imputed")
    pview = os.path.join(base, "pview")
    mview = os.path.join(base, "mview")
    runs = os.path.join(base, "runs")

    res = (engagement._resolved(spark, SF)
           .where(_SLICE)
           .select("message_id", "participant_uuid", "dataset",
                   "timestamp", "text", "labels", "channel_operator",
                   "last_updated").localCheckpoint())
    merge = foreach_batch_upsert(raw, ["message_id"], n_buckets=4,
                                 bucket_cols=["participant_uuid"],
                                 txn_app_id="src", mode="latest_wins")
    merge(res, 1)

    def stage_imputed():
        if read_table_manifest(spark, imputed) is None:
            build_transform_table(spark, raw, imputed, _impute_tf,
                                  ["message_id"], n_buckets=4,
                                  bucket_cols=["participant_uuid"])
            return 1
        return refresh_transform_table(spark, raw, imputed, _impute_tf)

    def stage_views(crash: bool):
        def _go():
            if read_table_manifest(spark, pview) is None:
                build_participants_view(spark, imputed, pview, CONFIG,
                                        n_buckets=2)
                build_messages_view(spark, imputed, mview, CONFIG,
                                    n_buckets=2)
                return 1
            if crash:
                # die MID-STAGE: G1 refreshed, G2 not — the view
                # watermarks now DIVERGE
                refresh_participants_view(spark, imputed, pview, CONFIG)
                raise RuntimeError("crash after pview refresh")
            return refresh_views(spark, imputed, pview, mview,
                                 CONFIG)["messages"]
        return _go

    run_incremental_pipeline(spark, runs, "run1", [
        ("imputed", stage_imputed), ("views", stage_views(False))])

    # commit 2: recode + check the crashed-then-resumed sync
    merge(res.where(_RECODE).withColumn("labels",
                                        F.expr(_RECODE_LABELS)), 2)
    with pytest.raises(RuntimeError, match="crash after pview"):
        run_incremental_pipeline(spark, runs, "run2", [
            ("imputed", stage_imputed), ("views", stage_views(True))])
    state = read_run(spark, runs, "run2")
    assert state["imputed"] == ("done", 2)
    assert state["views"][0] == "started"

    # resume: imputed is skipped (already done), views re-runs whole —
    # pview's refresh no-ops on its watermark, mview catches up on its
    # own (diverged) window through refresh_views' independent path
    out = run_incremental_pipeline(spark, runs, "run2", [
        ("imputed", stage_imputed), ("views", stage_views(False))])
    assert out["imputed"] == 2
    assert read_run(spark, runs, "run2")["views"][0] == "done"

    # maintained states == batch recompute over the final raw state
    final = _impute_tf(read_merged_table(spark, raw))
    assert _state(read_merged_table(spark, pview)) == \
        _state(participants_by_column(final, CONFIG))
    assert _state(read_merged_table(spark, mview)) == \
        _state(messages_by_column(final, CONFIG))
