"""Registry queries for the Telegram adapter (S7/F11) and membership
flags (S12/J4), over fixtures derived from `events` in both engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.adapters import membership_flags, telegram_messages_to_messages
from ..tables import load
from ._helpers import apply_runtime_conf, micros

TG_WINDOWS = [
    ("tg_s01e01", "2024-01-05 00:00:00", "2024-01-12 00:00:00"),
    ("tg_s01e02", "2024-01-12 00:00:00", "2024-01-19 00:00:00"),
]


def s7_telegram_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    ev = load(spark, sf_dir, "events")
    fixture = ev.select(
        F.col("event_id").alias("tg_message_id"),
        (F.col("user_id") % 10).alias("group_id"),
        F.when(F.col("user_id") % 11 == 4, F.lit(None).cast("long"))
        .otherwise(F.col("user_id")).alias("from_id"),
        F.when(F.col("user_id") % 7 == 2, F.lit("PeerChannel"))
        .otherwise(F.lit("PeerUser")).alias("peer_type"),
        F.concat(F.lit("tg reply "), (F.col("event_id") % 30).cast("string")).alias("text"),
        F.col("ts").alias("date"),
    )
    msgs = telegram_messages_to_messages(fixture, TG_WINDOWS)
    return msgs.select(
        "message_id", "participant_uuid", "text",
        micros("timestamp").alias("timestamp_us"),
        "dataset", F.col("origin.origin_id").alias("origin_id"))


S7_TELEGRAM_INGEST_SQL = """
WITH fixture AS (
  SELECT event_id AS tg_message_id, user_id % 10 AS group_id,
         CASE WHEN user_id % 11 = 4 THEN NULL ELSE user_id END AS from_id,
         CASE WHEN user_id % 7 = 2 THEN 'PeerChannel' ELSE 'PeerUser' END AS peer_type,
         'tg reply ' || CAST(event_id % 30 AS VARCHAR) AS text,
         ts AS date
  FROM events
),
kept AS (
  SELECT * FROM fixture
  WHERE from_id IS NOT NULL AND peer_type <> 'PeerChannel'
),
routed AS (
  SELECT *,
    CASE WHEN date >= TIMESTAMP '2024-01-05 00:00:00'
              AND date < TIMESTAMP '2024-01-12 00:00:00' THEN 'tg_s01e01'
         WHEN date >= TIMESTAMP '2024-01-12 00:00:00'
              AND date < TIMESTAMP '2024-01-19 00:00:00' THEN 'tg_s01e02'
         END AS dataset
  FROM kept
)
SELECT 'msg-tg-' || CAST(group_id AS VARCHAR) || '-' || CAST(tg_message_id AS VARCHAR) AS message_id,
       'avf-participant-uuid-tg-' || sha256(CAST(from_id AS VARCHAR)) AS participant_uuid,
       text, epoch_us(date) AS timestamp_us, dataset,
       'telegram.group_' || CAST(group_id AS VARCHAR) || '.message_' || CAST(tg_message_id AS VARCHAR) AS origin_id
FROM routed WHERE dataset IS NOT NULL
"""


def j4_membership_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S12/J4 over the participants view: flag membership in two
    uuid-set groups derived from the participant number."""
    from . import engagement

    pv = engagement.participants_view(spark, sf_dir)
    num = F.split(F.col("participant_uuid"), "-")[3].cast("long")
    base = pv.select("participant_uuid", "consent_withdrawn")
    groups = {
        "listening_group": base.where(num % 2 == 0).select("participant_uuid"),
        "advisory_group": base.where(num % 5 == 0).select("participant_uuid"),
    }
    return membership_flags(base, groups)


def _j4_sql() -> str:
    from . import engagement

    return f"""
WITH pv AS ({engagement.PARTICIPANTS_VIEW_SQL}),
base AS (
  SELECT participant_uuid, consent_withdrawn,
         CAST(string_split(participant_uuid, '-')[4] AS BIGINT) AS num
  FROM pv
)
SELECT participant_uuid, consent_withdrawn,
       (num % 2 = 0) AS listening_group,
       (num % 5 = 0) AS advisory_group
FROM base
"""


J4_MEMBERSHIP_FLAGS_SQL = _j4_sql()
