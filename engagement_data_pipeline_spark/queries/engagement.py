"""Engagement-pipeline spine queries (SURVEY §2.3/§2.5) with DuckDB
oracles over the same events parquet.

Each query runs the real nested-schema pipeline (synthetic messages →
operators) and projects scalar columns for the driver's hash compare;
the oracle re-derives a flattened mirror in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.spine import fetch_messages, filter_messages
from ..operators.folds import fold_concat
from ..sources.synthetic import RQA_DATASETS, latest_cte, synthetic_messages
from ._helpers import micros, t  # noqa: F401  (t applies runtime conf)
from ._helpers import apply_runtime_conf

TEST_PARTICIPANTS = ["avf-participant-uuid-0", "avf-participant-uuid-1"]
RQA_START = "2024-01-05 00:00:00"
RQA_END = "2024-01-25 00:00:00"


def _messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    return synthetic_messages(spark, sf_dir)


def messages_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 latest-snapshot dedup over the versioned messages table."""
    from ..operators.dedup import latest_snapshot

    latest = latest_snapshot(_messages(spark, sf_dir),
                             ["message_id"], ["last_updated", "message_id"])
    return latest.select(
        "message_id",
        "participant_uuid",
        "dataset",
        "status",
        F.get(F.col("previous_datasets"), 0).alias("previous_dataset"),
        F.get(F.col("labels"), 0)["code_id"].alias("label_code"),
        micros("last_updated").alias("last_updated_us"),
    )


MESSAGES_LATEST_SQL = "WITH " + latest_cte() + """
SELECT message_id, participant_uuid, dataset, status,
       previous_dataset, label_code,
       epoch_us(last_updated) AS last_updated_us
FROM latest
"""


def messages_resolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 + F4: full fetch stage (dedup then live/stale resolution)."""
    resolved = fetch_messages(_messages(spark, sf_dir))
    return resolved.select("message_id", "participant_uuid", "dataset", "status")


MESSAGES_RESOLVED_SQL = "WITH " + latest_cte() + """,
live AS (SELECT * FROM latest WHERE status = 'live'),
stale AS (SELECT * FROM latest WHERE status = 'stale')
SELECT message_id, participant_uuid, dataset, status FROM live
UNION ALL
SELECT s.message_id, s.participant_uuid, s.dataset, s.status
FROM stale s
WHERE NOT EXISTS (
  SELECT 1 FROM live l
  WHERE l.dataset = s.dataset AND l.participant_uuid = s.participant_uuid)
"""


def messages_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch + F5 RQA time-range (inclusive) + F6 test participants."""
    resolved = fetch_messages(_messages(spark, sf_dir))
    filtered = filter_messages(resolved, RQA_DATASETS, RQA_START, RQA_END,
                               TEST_PARTICIPANTS)
    return filtered.select(
        "message_id", "participant_uuid", "dataset",
        micros("timestamp").alias("timestamp_us"),
    )


MESSAGES_FILTERED_SQL = "WITH " + latest_cte() + """,
live AS (SELECT * FROM latest WHERE status = 'live'),
stale AS (SELECT * FROM latest WHERE status = 'stale'),
resolved AS (
  SELECT * FROM live
  UNION ALL
  SELECT s.* FROM stale s
  WHERE NOT EXISTS (
    SELECT 1 FROM live l
    WHERE l.dataset = s.dataset AND l.participant_uuid = s.participant_uuid)
)
SELECT message_id, participant_uuid, dataset,
       epoch_us(timestamp) AS timestamp_us
FROM resolved
WHERE (dataset NOT IN ('s01e01','s01e02')
       OR (timestamp >= TIMESTAMP '2024-01-05 00:00:00'
           AND timestamp <= TIMESTAMP '2024-01-25 00:00:00'))
  AND participant_uuid NOT IN ('avf-participant-uuid-0', 'avf-participant-uuid-1')
"""


def participants_fold_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 (text half): fold each participant's RQA messages per dataset
    into one '; '-joined string in (timestamp, message_id) order."""
    resolved = fetch_messages(_messages(spark, sf_dir))
    rqa = resolved.where(F.col("dataset").isin(RQA_DATASETS))
    return fold_concat(
        rqa, ["participant_uuid", "dataset"], "text",
        ["timestamp", "message_id"], sep="; ", out_col="folded_text",
        extra_aggs=[F.count(F.lit(1)).alias("n_messages")],
    )


PARTICIPANTS_FOLD_SQL = "WITH " + latest_cte() + """,
live AS (SELECT * FROM latest WHERE status = 'live'),
stale AS (SELECT * FROM latest WHERE status = 'stale'),
resolved AS (
  SELECT * FROM live
  UNION ALL
  SELECT s.* FROM stale s
  WHERE NOT EXISTS (
    SELECT 1 FROM live l
    WHERE l.dataset = s.dataset AND l.participant_uuid = s.participant_uuid)
)
SELECT participant_uuid, dataset,
       string_agg(text, '; ' ORDER BY timestamp, message_id) AS folded_text,
       COUNT(*) AS n_messages
FROM resolved
WHERE dataset IN ('s01e01','s01e02')
GROUP BY participant_uuid, dataset
"""
