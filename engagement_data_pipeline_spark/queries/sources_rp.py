"""Registry queries for the Rapid Pro ingest path (S4/S5/J1/J2/F9/F10
/X1/X3/G6) over deterministic fixtures derived from `events` in both
engines.

Fixture shape (generated identically in Spark and the oracle SQL):
  runs      — one per event; result_value NULL for user_id%13==5 (F9);
              flow per event_type, but flow_location is deliberately
              NOT configured (unknown_flow path).
  contacts  — per user; urn rotates tel / whatsapp / telegram#tag
              (X1 fodder); users with user_id%23==11 are missing
              (J1 missing-contact path).
  uuid_table— normalised urn → participant uuid; users with
              user_id%19==7 absent (J2 miss path).
  allow_list— participants with user_id%17!=3 (F10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.rapid_pro import FlowConfig, runs_to_messages, sync_stats
from ..tables import load
from ._helpers import apply_runtime_conf, micros

FLOW_CONFIGS = [
    FlowConfig("flow_gender", "gender", "2024-01-03 00:00:00", "2024-01-28 00:00:00"),
    FlowConfig("flow_age", "age", "2024-01-03 00:00:00", "2024-01-28 00:00:00"),
    FlowConfig("flow_s01e01", "s01e01", "2024-01-03 00:00:00", "2024-01-28 00:00:00"),
    FlowConfig("flow_s01e02", "s01e02", "2024-01-03 00:00:00", "2024-01-28 00:00:00"),
    # flow_location intentionally absent → unknown_flow
]

PREFIX_OPERATORS = {"2547": "safaricom"}


def _fixtures(spark: SparkSession, sf_dir: str):
    apply_runtime_conf(spark)
    ev = load(spark, sf_dir, "events")
    u = F.col("user_id").cast("string")
    flow = (
        F.when(F.col("event_type") == "signup", F.lit("flow_gender"))
        .when(F.col("event_type") == "click", F.lit("flow_age"))
        .when(F.col("event_type") == "view", F.lit("flow_location"))
        .when(F.col("event_type") == "purchase", F.lit("flow_s01e01"))
        .otherwise(F.lit("flow_s01e02"))
    )
    runs = ev.select(
        F.col("event_id").cast("string").alias("run_id"),
        flow.alias("flow_id"),
        F.concat(F.lit("contact-"), u).alias("contact_uuid"),
        F.when(F.col("user_id") % 13 == 5, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("reply "), (F.col("event_id") % 100).cast("string")))
        .alias("result_value"),
        F.col("ts").alias("modified_on"),
    )
    users = ev.select("user_id").distinct()
    uu = F.col("user_id").cast("string")
    contacts = users.where(F.col("user_id") % 23 != 11).select(
        F.concat(F.lit("contact-"), uu).alias("contact_uuid"),
        F.when(F.col("user_id") % 3 == 0, F.concat(F.lit("tel:+254700"), uu))
        .when(F.col("user_id") % 3 == 1, F.concat(F.lit("whatsapp:254700"), uu))
        .otherwise(F.concat(F.lit("telegram:1"), uu, F.lit("#u"), uu))
        .alias("urn"),
    )
    uuid_table = users.where(F.col("user_id") % 19 != 7).select(
        F.when(F.col("user_id") % 3 == 2, F.concat(F.lit("telegram:1"), uu))
        .otherwise(F.concat(F.lit("tel:+254700"), uu)).alias("urn"),
        F.concat(F.lit("avf-participant-uuid-"), uu).alias("participant_uuid"),
    )
    allow = users.where(F.col("user_id") % 17 != 3).select(
        F.concat(F.lit("avf-participant-uuid-"), uu).alias("participant_uuid"))
    return runs, contacts, uuid_table, allow


def s4_rapid_pro_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs, contacts, uuid_table, allow = _fixtures(spark, sf_dir)
    msgs = runs_to_messages(runs, contacts, uuid_table, FLOW_CONFIGS,
                            PREFIX_OPERATORS, allow)
    return msgs.select(
        "message_id", "participant_uuid", "text",
        micros("timestamp").alias("timestamp_us"),
        "dataset", "channel_operator",
        F.col("origin.origin_id").alias("origin_id"), "coda_id")


def g6_sync_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs, contacts, uuid_table, allow = _fixtures(spark, sf_dir)
    return sync_stats(runs, contacts, uuid_table, FLOW_CONFIGS,
                      PREFIX_OPERATORS, allow)


_FIXTURES_SQL = """
runs AS (
  SELECT CAST(event_id AS VARCHAR) AS run_id,
         CASE event_type WHEN 'signup' THEN 'flow_gender'
              WHEN 'click' THEN 'flow_age' WHEN 'view' THEN 'flow_location'
              WHEN 'purchase' THEN 'flow_s01e01' ELSE 'flow_s01e02' END AS flow_id,
         'contact-' || CAST(user_id AS VARCHAR) AS contact_uuid,
         CASE WHEN user_id % 13 = 5 THEN NULL
              ELSE 'reply ' || CAST(event_id % 100 AS VARCHAR) END AS result_value,
         ts AS modified_on
  FROM events
),
users AS (SELECT DISTINCT user_id, CAST(user_id AS VARCHAR) AS u FROM events),
contacts AS (
  SELECT 'contact-' || u AS contact_uuid,
         CASE user_id % 3 WHEN 0 THEN 'tel:+254700' || u
              WHEN 1 THEN 'whatsapp:254700' || u
              ELSE 'telegram:1' || u || '#u' || u END AS urn
  FROM users WHERE user_id % 23 <> 11
),
norm_contacts AS (
  SELECT contact_uuid,
         CASE WHEN starts_with(urn, 'whatsapp:')
              THEN 'tel:+' || string_split(urn, ':')[2]
              WHEN starts_with(urn, 'telegram:')
              THEN string_split(urn, '#')[1]
              ELSE urn END AS __urn
  FROM contacts
),
uuid_table AS (
  SELECT CASE WHEN user_id % 3 = 2 THEN 'telegram:1' || u
         ELSE 'tel:+254700' || u END AS __urn,
         'avf-participant-uuid-' || u AS participant_uuid
  FROM users WHERE user_id % 19 <> 7
),
allow_list AS (
  SELECT 'avf-participant-uuid-' || u AS participant_uuid
  FROM users WHERE user_id % 17 <> 3
),
annotated AS (
  SELECT r.*, c.__urn, ut.participant_uuid AS __participant,
         (al.participant_uuid IS NOT NULL) AS __allowed,
         CASE r.flow_id WHEN 'flow_gender' THEN 'gender'
              WHEN 'flow_age' THEN 'age' WHEN 'flow_s01e01' THEN 's01e01'
              WHEN 'flow_s01e02' THEN 's01e02' END AS dataset,
         r.flow_id IN ('flow_gender','flow_age','flow_s01e01','flow_s01e02')
             AS known_flow,
         (r.modified_on >= TIMESTAMP '2024-01-03 00:00:00'
          AND r.modified_on < TIMESTAMP '2024-01-28 00:00:00') AS in_window,
         (r.result_value IS NULL OR r.result_value = '') AS empty_value,
         CASE WHEN c.__urn IS NULL THEN NULL
              WHEN string_split(c.__urn, ':')[1] <> 'tel'
              THEN string_split(c.__urn, ':')[1]
              WHEN starts_with(c.__urn, 'tel:+2547') THEN 'safaricom'
              ELSE 'unknown' END AS channel_operator
  FROM runs r
  LEFT JOIN norm_contacts c USING (contact_uuid)
  LEFT JOIN uuid_table ut USING (__urn)
  LEFT JOIN allow_list al ON ut.participant_uuid = al.participant_uuid
),
decided AS (
  SELECT *,
    CASE WHEN __urn IS NULL THEN 'missing_contact'
         WHEN __participant IS NULL THEN 'not_in_uuid_table'
         WHEN NOT __allowed THEN 'not_in_allow_list'
         WHEN NOT known_flow THEN 'unknown_flow'
         WHEN empty_value THEN 'empty_value'
         WHEN NOT in_window THEN 'out_of_window'
         ELSE 'added' END AS decision
  FROM annotated
)
"""

S4_RAPID_PRO_INGEST_SQL = "WITH " + _FIXTURES_SQL + """
SELECT 'msg-rp-' || run_id AS message_id,
       __participant AS participant_uuid,
       result_value AS text,
       epoch_us(modified_on) AS timestamp_us,
       dataset, channel_operator,
       'rapid_pro.flow_' || flow_id || '.run_' || run_id AS origin_id,
       sha256(result_value) AS coda_id
FROM decided WHERE decision = 'added'
"""

G6_SYNC_STATS_SQL = "WITH " + _FIXTURES_SQL + """
SELECT flow_id, decision, COUNT(*) AS n FROM decided
GROUP BY flow_id, decision
"""
