"""S4/S5: Rapid Pro runs + contacts → engagement-DB messages.

Reference: src/rapid_pro_to_engagement_db/rapid_pro_to_engagement_db.py
:224-421 — per flow: incremental runs fetch (S4), contacts LUT refresh
(S5), URN normalisation (X1), uuid allow-list filter (F10),
de-identification (J2), per-flow value/time filter (F9), Message
construction, idempotent upsert (K1), tie-safe watermark (O3).

The live API fetch is out of scope (network); this module is the
schema adapter from the fetched shapes:

  runs(run_id, flow_id, contact_uuid, result_value, modified_on)
  contacts(contact_uuid, urn)                      — J1 dimension
  uuid_table(urn, participant_uuid)                — J2 dimension

Scale: contacts and the uuid table are dimensions — broadcast joins
(the reference holds them as Python dicts; the uuid table can be
large, in which case AQE falls back to a shuffle join — no hint is
forced). Every filter is a pushed-down predicate; the run decision
taxonomy (G6 sync stats) is a column, so stats are one groupBy.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaners import normalise_urn, operator_from_urn
from ..labels.schema import empty_labels


@dataclass(frozen=True)
class FlowConfig:
    flow_id: str
    dataset: str
    created_after: str       # inclusive ISO bound (F9)
    created_before: str      # exclusive ISO bound (F9)


def annotate_runs(runs: DataFrame, contacts: DataFrame, uuid_table: DataFrame,
                  flow_configs: list[FlowConfig],
                  prefix_operators: dict[str, str],
                  allow_list: DataFrame | None = None) -> DataFrame:
    """The full decision pipeline, keeping every run with a `decision`
    column (G6's taxonomy) instead of silently dropping:
      missing_contact | not_in_uuid_table | not_in_allow_list |
      empty_value | out_of_window | unknown_flow | added
    """
    c = contacts.select(
        "contact_uuid", normalise_urn(F.col("urn")).alias("__urn"))
    joined = runs.join(F.broadcast(c), "contact_uuid", "left")
    u = uuid_table.select(
        normalise_urn(F.col("urn")).alias("__urn"),
        F.col("participant_uuid").alias("__participant"))
    joined = joined.join(F.broadcast(u), "__urn", "left")
    if allow_list is not None:
        al = allow_list.select(
            F.col("participant_uuid").alias("__participant"),
            F.lit(True).alias("__allowed"))
        joined = joined.join(F.broadcast(al), "__participant", "left")
    else:
        joined = joined.withColumn("__allowed", F.lit(True))

    dataset = F.lit(None).cast("string")
    in_window = F.lit(False)
    known_flow = F.lit(False)
    for fc in flow_configs:
        is_flow = F.col("flow_id") == fc.flow_id
        dataset = F.when(is_flow, F.lit(fc.dataset)).otherwise(dataset)
        known_flow = known_flow | is_flow
        in_window = in_window | (
            is_flow
            & (F.col("modified_on") >= F.lit(fc.created_after).cast("timestamp"))
            & (F.col("modified_on") < F.lit(fc.created_before).cast("timestamp")))

    empty_value = F.col("result_value").isNull() | (F.col("result_value") == "")
    decision = (
        F.when(F.col("__urn").isNull(), F.lit("missing_contact"))
        .when(F.col("__participant").isNull(), F.lit("not_in_uuid_table"))
        .when(F.col("__allowed").isNull(), F.lit("not_in_allow_list"))
        .when(~known_flow, F.lit("unknown_flow"))
        .when(empty_value, F.lit("empty_value"))
        .when(~in_window, F.lit("out_of_window"))
        .otherwise(F.lit("added"))
    )
    return (
        joined.withColumn("dataset", dataset)
        .withColumn("decision", decision)
        .withColumn("channel_operator",
                    operator_from_urn(F.col("__urn"), prefix_operators))
    )


def runs_to_messages(runs: DataFrame, contacts: DataFrame,
                     uuid_table: DataFrame, flow_configs: list[FlowConfig],
                     prefix_operators: dict[str, str],
                     allow_list: DataFrame | None = None) -> DataFrame:
    """Message-schema rows for the runs that pass every gate; feed
    into K1 idempotent_upsert against the messages table."""
    ann = annotate_runs(runs, contacts, uuid_table, flow_configs,
                        prefix_operators, allow_list)
    origin_id = F.concat(F.lit("rapid_pro.flow_"), F.col("flow_id"),
                         F.lit(".run_"), F.col("run_id"))
    return ann.where(F.col("decision") == "added").select(
        F.concat(F.lit("msg-rp-"), F.col("run_id")).alias("message_id"),
        F.col("__participant").alias("participant_uuid"),
        F.col("result_value").alias("text"),
        F.col("modified_on").alias("timestamp"),
        F.lit("in").alias("direction"),
        "channel_operator",
        F.lit("live").alias("status"),
        "dataset",
        F.array().cast("array<string>").alias("previous_datasets"),
        empty_labels().alias("labels"),
        F.struct(origin_id.alias("origin_id"),
                 F.lit("rapid_pro").alias("origin_type")).alias("origin"),
        F.sha2(F.col("result_value"), 256).alias("coda_id"),
        F.col("modified_on").alias("last_updated"),
    )


def sync_stats(runs: DataFrame, contacts: DataFrame, uuid_table: DataFrame,
               flow_configs: list[FlowConfig],
               prefix_operators: dict[str, str],
               allow_list: DataFrame | None = None) -> DataFrame:
    """G6: mergeable event counters — one groupBy over the decision
    column (reference src/common/sync_stats.py:5-24)."""
    ann = annotate_runs(runs, contacts, uuid_table, flow_configs,
                        prefix_operators, allow_list)
    return ann.groupBy("flow_id", "decision").agg(
        F.count(F.lit(1)).alias("n"))
