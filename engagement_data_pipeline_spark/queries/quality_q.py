"""Registry query for the data-quality expectations operator
(operators/quality.py) over the versioned messages table.

The rule set mirrors the reference's inline validators — F3 origin
uniqueness, M13 value validation — plus range/pattern checks; the
text not-null rule is violated by design (the synthetic gender slot
user_id%4==3 has NULL text), so the report proves the counters count
rather than rubber-stamping zeros."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import quality as Q
from ..sources.synthetic import MESSAGES_CTE
from . import engagement
from ._helpers import micros

_TS_LO = 1_262_304_000_000_000  # 2010-01-01 UTC in micros
_TS_HI = 1_893_456_000_000_000  # 2030-01-01 UTC

_UUID_RE = "^avf-participant-uuid-[0-9]+$"


def dq_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    flat = engagement._messages(spark, sf_dir).select(
        "message_id", "participant_uuid", "status", "text",
        micros("last_updated").alias("last_updated_us"))
    report = Q.expect(flat, [
        Q.not_null("message_id", "participant_uuid"),
        Q.not_null("text"),                       # violated by design
        Q.accepted_values("status", ["live", "stale"]),
        Q.matches("participant_uuid", _UUID_RE),
        Q.in_range("last_updated_us", _TS_LO, _TS_HI),
        Q.unique("message_id", "last_updated_us"),
    ])
    return report.select("rule", "kind", "violations", "n_checked")


DQ_MESSAGES_SQL = "WITH " + MESSAGES_CTE + f""",
flat AS (
  SELECT message_id, participant_uuid, status, text,
         epoch_us(last_updated) AS last_updated_us
  FROM messages
),
row_rules AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN message_id IS NULL OR participant_uuid IS NULL
             THEN 1 ELSE 0 END) AS BIGINT) AS v_ids,
    CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_text,
    CAST(SUM(CASE WHEN status IS NULL OR status NOT IN ('live', 'stale')
             THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
    CAST(SUM(CASE WHEN participant_uuid IS NULL
                  OR NOT regexp_matches(participant_uuid, '{_UUID_RE}')
             THEN 1 ELSE 0 END) AS BIGINT) AS v_uuid,
    CAST(SUM(CASE WHEN last_updated_us IS NULL
                  OR last_updated_us < {_TS_LO}
                  OR last_updated_us > {_TS_HI}
             THEN 1 ELSE 0 END) AS BIGINT) AS v_range
  FROM flat
),
uniq AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c ELSE 0 END), 0) AS BIGINT)
           AS violations,
         CAST(COUNT(*) AS BIGINT) AS n_checked
  FROM (SELECT COUNT(*) AS c FROM flat
        GROUP BY message_id, last_updated_us)
)
SELECT 'not_null(message_id,participant_uuid)' AS rule,
       'not_null' AS kind, v_ids AS violations, n AS n_checked FROM row_rules
UNION ALL
SELECT 'not_null(text)', 'not_null', v_text, n FROM row_rules
UNION ALL
SELECT 'accepted_values(status)', 'accepted_values', v_status, n
FROM row_rules
UNION ALL
SELECT 'matches(participant_uuid)', 'matches', v_uuid, n FROM row_rules
UNION ALL
SELECT 'in_range(last_updated_us)', 'in_range', v_range, n FROM row_rules
UNION ALL
SELECT 'unique(message_id,last_updated_us)', 'unique', violations, n_checked
FROM uniq
"""
