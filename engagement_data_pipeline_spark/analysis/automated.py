"""Automated analysis aggregations (SURVEY §2.7 A1-A9).

Reference: src/engagement_db_to_analysis/automated_analysis.py:65-171
(call sites into CoreDataModules' analysis functions). Inputs are the
column views produced by labels/views.py — exactly the reference shape
(the NGO's daily exports read the views, not raw messages).

All aggregations exclude withdrawn participants
(`consent_withdrawn = 'false'`), mirroring the reference's opt-in
filter. Distribution outputs are long-format (group, code, count)
rather than pivoted CSV matrices: relationally identical, SQL-oracle
friendly, and the pivot is a presentation detail of the CSV writer
(sinks.analysis_csv handles matrix rendering).

Scale: every function is a single groupBy over an already-built view —
one hash shuffle each, partial aggregation map-side, no Python in the
row path. The views themselves are one shuffle on participant_uuid, so
a full A1-A9 run over 100 TB is bounded by the view build, which would
be materialized once and shared.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..labels.config import (
    AnalysisConfig,
    CONTROL_CODES,
    DEMOGRAPHIC,
    RESEARCH_QUESTION_ANSWER,
)
from ..operators.topk import top_k_per_group

MICROS_PER_DAY = 86_400_000_000


def _consenting(view: DataFrame) -> DataFrame:
    return view.where(F.col("consent_withdrawn") == "false")


def engagement_counts(messages_view: DataFrame, config: AnalysisConfig) -> DataFrame:
    """A1: per RQA dataset (and 'total'): messages + distinct
    consenting participants (reference automated_analysis.py:65-69)."""
    mv = _consenting(messages_view)
    aggs = [F.count(F.lit(1)).alias("n_messages"),
            F.countDistinct("participant_uuid").alias("n_participants")]
    per_dataset = mv.groupBy("dataset").agg(*aggs)
    total = mv.agg(*aggs).select(F.lit("total").alias("dataset"),
                                 "n_messages", "n_participants")
    return per_dataset.unionByName(total)


def repeat_participations(messages_view: DataFrame, config: AnalysisConfig) -> DataFrame:
    """A2: distribution of episodes-participated per participant
    (reference automated_analysis.py:71-75)."""
    eps = (
        _consenting(messages_view)
        .groupBy("participant_uuid")
        .agg(F.countDistinct("dataset").alias("n_episodes"))
    )
    dist = eps.groupBy("n_episodes").agg(F.count(F.lit(1)).alias("n_participants"))
    total = F.sum("n_participants").over(Window.partitionBy())
    return dist.withColumn(
        "pct", F.col("n_participants") * F.lit(100.0) / total)


def theme_distributions(messages_view: DataFrame, config: AnalysisConfig,
                        breakdown_field: str = "gender_codes") -> DataFrame:
    """A3: per (RQA dataset, scheme, code, demog-breakdown) message
    counts (reference automated_analysis.py:77-81). Long format — the
    reference pivots the breakdown into columns at CSV-write time."""
    # Single-pass melt: each RQA row contributes one (scheme, code)
    # entry per coding config of ITS dataset — one scan + one shuffle
    # instead of a union of per-config re-aggregations.
    entries = F.array(*[
        F.when(F.col("dataset") == d.name,
               F.struct(F.lit(cc.scheme_id).alias("scheme"),
                        F.col(cc.coded_field).alias("code")))
        for d in config.datasets if d.dataset_type == RESEARCH_QUESTION_ANSWER
        for cc in d.coding_configs
    ])
    return (
        _consenting(messages_view)
        .select("dataset", F.col(breakdown_field).alias("breakdown"),
                F.explode(F.filter(entries, lambda x: x.isNotNull())).alias("e"))
        .groupBy("dataset", F.col("e.scheme").alias("scheme"),
                 F.col("e.code").alias("code"), "breakdown")
        .agg(F.count(F.lit(1)).alias("n_messages"))
    )


def demographic_distributions(participants_view: DataFrame,
                              config: AnalysisConfig) -> DataFrame:
    """A4: per (demog field, code) participant counts (reference
    automated_analysis.py:83-87). Folded code lists are ';'-joined in
    the view; each distinct code counts the participant once."""
    # Single-pass melt over all demog coded fields (vs N re-scans).
    entries = F.array(*[
        F.struct(F.lit(cc.coded_field).alias("field"),
                 F.split(F.col(cc.coded_field), ";").alias("codes"))
        for d in config.datasets if d.dataset_type == DEMOGRAPHIC
        for cc in d.coding_configs
    ])
    return (
        _consenting(participants_view)
        .select(F.explode(entries).alias("e"))
        .select(F.col("e.field").alias("field"), F.explode("e.codes").alias("code"))
        .groupBy("field", "code")
        .agg(F.count(F.lit(1)).alias("n_participants"))
    )


def cross_tabs(participants_view: DataFrame, field_a: str, field_b: str) -> DataFrame:
    """A5: contingency table of two coded fields (reference
    automated_analysis.py:89-100)."""
    return (
        _consenting(participants_view)
        .groupBy(F.col(field_a).alias("code_a"), F.col(field_b).alias("code_b"))
        .agg(F.count(F.lit(1)).alias("n_participants"))
    )


def sample_messages(messages_view: DataFrame, config: AnalysisConfig,
                    k: int = 100) -> DataFrame:
    """A6: up to `k` raw messages per (RQA dataset, scheme, code), in
    (timestamp, message_id) order (reference automated_analysis.py:102-106)."""
    # Single-pass melt (as in theme_distributions), then one rank
    # window; Spark's WindowGroupLimit caps each partition at k before
    # the final sort, so this stays cheap at scale.
    entries = F.array(*[
        F.when(F.col("dataset") == d.name,
               F.struct(F.lit(cc.scheme_id).alias("scheme"),
                        F.col(cc.coded_field).alias("code"),
                        F.col(d.raw_field).alias("text")))
        for d in config.datasets if d.dataset_type == RESEARCH_QUESTION_ANSWER
        for cc in d.coding_configs
    ])
    un = (
        _consenting(messages_view)
        .select("dataset", "timestamp_us", "message_id",
                F.explode(F.filter(entries, lambda x: x.isNotNull())).alias("e"))
        .select("dataset", F.col("e.scheme").alias("scheme"),
                F.col("e.code").alias("code"), "timestamp_us", "message_id",
                F.col("e.text").alias("text"))
    )
    return top_k_per_group(
        un, ["dataset", "scheme", "code"],
        [F.col("timestamp_us"), F.col("message_id")], k, rank_col="rank")


def traffic_analysis(messages_view: DataFrame, config: AnalysisConfig) -> DataFrame:
    """A7: message counts per (UTC day, dataset) (reference
    automated_analysis.py:108-116; fixed calendar windows)."""
    day = (F.expr(f"timestamp_us div {MICROS_PER_DAY}") * MICROS_PER_DAY).alias("day_us")
    return (
        _consenting(messages_view)
        .groupBy(day, "dataset")
        .agg(F.count(F.lit(1)).alias("n_messages"))
    )


def participation_map(participants_view: DataFrame, config: AnalysisConfig,
                      location_field: str = "location_codes") -> DataFrame:
    """A8: participants per location code — the map-data aggregation
    (reference automated_analysis.py:131-171; rendering out of scope)."""
    return (
        _consenting(participants_view)
        .select(F.explode(F.split(F.col(location_field), ";")).alias("location_code"))
        .groupBy("location_code")
        .agg(F.count(F.lit(1)).alias("n_participants"))
    )


def relevance_uuids(messages_view: DataFrame, config: AnalysisConfig) -> DataFrame:
    """A9: distinct consenting participants with ≥1 relevantly-coded
    RQA message (code not a control code; reference
    rapid_pro_advert_functions.py:72-107)."""
    mv = _consenting(messages_view)
    relevant: Column | None = None
    for d in config.datasets:
        if d.dataset_type != RESEARCH_QUESTION_ANSWER:
            continue
        for cc in d.coding_configs:
            c = (F.col("dataset") == d.name) & ~F.col(cc.coded_field).isin(CONTROL_CODES)
            relevant = c if relevant is None else (relevant | c)
    return mv.where(relevant).select("participant_uuid").distinct()
