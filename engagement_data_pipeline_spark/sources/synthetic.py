"""Deterministic synthetic engagement-DB `messages` table.

Derives a versioned messages table (full nested Message schema,
SURVEY §1.1) from the driver-generated `events` parquet, purely with
DataFrame expressions — no randomness, no driver-side loops — so the
same rows exist at every scale factor and the DuckDB oracle can
re-derive a flattened mirror with plain SQL (`MESSAGES_CTE`).

Mapping (all arithmetic on event_id/user_id so both engines agree):

* event_type → dataset: signup→gender, click→age, view→location
  (demographics); purchase→s01e01, error→s01e02 (RQA episodes).
* text: per-dataset deterministic answers; gender has a NULL slot
  (user_id%4==3) to exercise empty-text handling (M3/F8).
* status: stale when event_id%7==3 else live (F4 fodder).
* Versioning (F1 fodder): every message has a v1 snapshot at ts;
  messages with event_id%5==0 get a v2 snapshot at ts+1h with a
  re-coded label. v2 rows with event_id%20==0 in an RQA dataset are
  *moved* to the other episode (WS correction, M10): dataset swaps,
  previous_datasets records the old one, labels are cleared
  (reference lib.py:413-425).
* One initial label per un-moved snapshot: scheme `<dataset>_scheme`,
  code `code_<k>`, checked = event_id%3!=0.

Scale: this is a single narrow projection over the events scan plus a
filtered second projection union — no shuffle at all; Catalyst plans
it as two parallel scans of the same parquet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..labels.schema import LABELS_TYPE, make_label
from ..tables import load

RQA_DATASETS = ["s01e01", "s01e02"]
DEMOG_DATASETS = ["gender", "age", "location"]

_OPERATORS = ["telegram", "safaricom", "golis", "hormuud"]
_LOCATIONS = ["nairobi", "mombasa", "kisumu", "baidoa", "mogadishu"]
_GENDERS = ["male", "female", "man"]  # user_id%4==3 → NULL text


def _dataset0() -> Column:
    return (
        F.when(F.col("event_type") == "signup", F.lit("gender"))
        .when(F.col("event_type") == "click", F.lit("age"))
        .when(F.col("event_type") == "view", F.lit("location"))
        .when(F.col("event_type") == "purchase", F.lit("s01e01"))
        .otherwise(F.lit("s01e02"))
    )


def _pick(col: Column, values: list[str]) -> Column:
    expr = F.lit(values[-1])
    for i in range(len(values) - 2, -1, -1):
        expr = F.when(col == i, F.lit(values[i])).otherwise(expr)
    return expr


def _text() -> Column:
    u = F.col("user_id")
    return (
        F.when(
            F.col("dataset0") == "gender",
            F.when(u % 4 == 3, F.lit(None).cast("string")).otherwise(_pick(u % 4, _GENDERS)),
        )
        .when(F.col("dataset0") == "age", (F.lit(10) + u % 75).cast("string"))
        .when(F.col("dataset0") == "location", _pick(u % 5, _LOCATIONS))
        .otherwise(F.concat(F.lit("reply "), (F.col("event_id") % 100).cast("string")))
    )


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.withColumn("dataset0", _dataset0())
        .withColumn("message_id", F.concat(F.lit("msg-"), F.col("event_id").cast("string")))
        .withColumn("participant_uuid",
                    F.concat(F.lit("avf-participant-uuid-"), F.col("user_id").cast("string")))
        .withColumn("text", _text())
        .withColumn("status",
                    F.when(F.col("event_id") % 7 == 3, F.lit("stale")).otherwise(F.lit("live")))
        .withColumn("channel_operator", _pick(F.col("user_id") % 4, _OPERATORS))
    )


def _snapshot(df: DataFrame, version: int) -> DataFrame:
    """Project one snapshot (v1 = original, v2 = updated 1h later)."""
    eid = F.col("event_id")
    if version == 1:
        dataset = F.col("dataset0")
        prev = F.array().cast("array<string>")
        last_updated = F.col("ts")
        moved = F.lit(False)
        code = F.concat(F.lit("code_"), (eid % 7).cast("string"))
    else:
        moved = (eid % 20 == 0) & F.col("dataset0").isin(RQA_DATASETS)
        dataset = (
            F.when(moved & (F.col("dataset0") == "s01e01"), F.lit("s01e02"))
            .when(moved & (F.col("dataset0") == "s01e02"), F.lit("s01e01"))
            .otherwise(F.col("dataset0"))
        )
        prev = F.when(moved, F.array(F.col("dataset0"))).otherwise(F.array().cast("array<string>"))
        last_updated = F.col("ts") + F.expr("INTERVAL 1 HOUR")
        code = F.concat(F.lit("code_"), ((eid + 1) % 7).cast("string"))

    label = make_label(
        scheme_id=F.concat(F.col("dataset0"), F.lit("_scheme")),
        code_id=code,
        date_time_utc=last_updated,
        checked=(eid % 3) != 0,
        origin_id=F.concat(F.lit("label-origin-"), F.col("message_id")),
    )
    labels = F.when(moved, F.array().cast(LABELS_TYPE)).otherwise(F.array(label))

    return df.select(
        F.col("message_id"),
        F.col("participant_uuid"),
        F.col("text"),
        F.col("ts").alias("timestamp"),
        F.lit("in").alias("direction"),
        F.col("channel_operator"),
        F.col("status"),
        dataset.alias("dataset"),
        prev.alias("previous_datasets"),
        labels.alias("labels"),
        F.struct(
            F.concat(F.lit("rapid_pro:"), F.col("event_id").cast("string")).alias("origin_id"),
            F.lit("rapid_pro").alias("origin_type"),
        ).alias("origin"),
        F.sha2(F.col("text"), 256).alias("coda_id"),
        last_updated.alias("last_updated"),
    )


def synthetic_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned messages: v1 for every event, v2 for event_id%5==0."""
    base = _base(spark, sf_dir)
    v1 = _snapshot(base, 1)
    v2 = _snapshot(base.where(F.col("event_id") % 5 == 0), 2)
    return v1.unionByName(v2)


# ---------------------------------------------------------------------------
# DuckDB mirror: flattened versioned messages. Columns: message_id,
# participant_uuid, text, timestamp, channel_operator, status, dataset,
# previous_dataset (NULL unless moved), label_scheme, label_code,
# label_checked (NULL when labels cleared), coda_id, last_updated.
# ---------------------------------------------------------------------------
MESSAGES_CTE = """
enriched AS (
  SELECT
    'msg-' || CAST(event_id AS VARCHAR) AS message_id,
    'avf-participant-uuid-' || CAST(user_id AS VARCHAR) AS participant_uuid,
    CASE event_type WHEN 'signup' THEN 'gender' WHEN 'click' THEN 'age'
         WHEN 'view' THEN 'location' WHEN 'purchase' THEN 's01e01'
         ELSE 's01e02' END AS dataset0,
    ts, event_id, user_id,
    CASE WHEN event_id % 7 = 3 THEN 'stale' ELSE 'live' END AS status,
    CASE user_id % 4 WHEN 0 THEN 'telegram' WHEN 1 THEN 'safaricom'
         WHEN 2 THEN 'golis' ELSE 'hormuud' END AS channel_operator
  FROM events
),
with_text AS (
  SELECT *,
    CASE dataset0
      WHEN 'gender' THEN CASE user_id % 4 WHEN 0 THEN 'male' WHEN 1 THEN 'female'
                          WHEN 2 THEN 'man' ELSE NULL END
      WHEN 'age' THEN CAST(10 + user_id % 75 AS VARCHAR)
      WHEN 'location' THEN CASE user_id % 5 WHEN 0 THEN 'nairobi' WHEN 1 THEN 'mombasa'
                            WHEN 2 THEN 'kisumu' WHEN 3 THEN 'baidoa' ELSE 'mogadishu' END
      ELSE 'reply ' || CAST(event_id % 100 AS VARCHAR) END AS text
  FROM enriched
),
messages AS (
  SELECT message_id, participant_uuid, text, ts AS timestamp, channel_operator,
         status, dataset0 AS dataset, CAST(NULL AS VARCHAR) AS previous_dataset,
         dataset0 || '_scheme' AS label_scheme,
         'code_' || CAST(event_id % 7 AS VARCHAR) AS label_code,
         (event_id % 3) <> 0 AS label_checked,
         sha256(text) AS coda_id, ts AS last_updated,
         event_id, user_id
  FROM with_text
  UNION ALL
  SELECT message_id, participant_uuid, text, ts AS timestamp, channel_operator,
         status,
         CASE WHEN event_id % 20 = 0 AND dataset0 = 's01e01' THEN 's01e02'
              WHEN event_id % 20 = 0 AND dataset0 = 's01e02' THEN 's01e01'
              ELSE dataset0 END AS dataset,
         CASE WHEN event_id % 20 = 0 AND dataset0 IN ('s01e01','s01e02')
              THEN dataset0 ELSE NULL END AS previous_dataset,
         CASE WHEN event_id % 20 = 0 AND dataset0 IN ('s01e01','s01e02')
              THEN NULL ELSE dataset0 || '_scheme' END AS label_scheme,
         CASE WHEN event_id % 20 = 0 AND dataset0 IN ('s01e01','s01e02')
              THEN NULL ELSE 'code_' || CAST((event_id + 1) % 7 AS VARCHAR) END AS label_code,
         CASE WHEN event_id % 20 = 0 AND dataset0 IN ('s01e01','s01e02')
              THEN NULL ELSE (event_id % 3) <> 0 END AS label_checked,
         sha256(text) AS coda_id, ts + INTERVAL 1 HOUR AS last_updated,
         event_id, user_id
  FROM with_text
  WHERE event_id % 5 = 0
)
"""


def latest_cte() -> str:
    """SQL fragment: latest snapshot per message_id (F1 mirror)."""
    return MESSAGES_CTE + """,
latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY message_id
        ORDER BY last_updated DESC, message_id DESC) AS rn
    FROM messages
  ) WHERE rn = 1
)
"""
