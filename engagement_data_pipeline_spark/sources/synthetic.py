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
* Labels (newest-first):
  - demographic datasets: one label in `<ds>_scheme`; the age scheme's
    codes carry the age in the code id (`age_<n>`, n = 10+user_id%75)
    so M4 bucketing has a numeric source; checked = event_id%3!=0.
  - RQA datasets: two schemes like real coding configs —
    `<ds>_theme_scheme` (code `code_<k>`, or STOP when
    event_id%100==13 to feed the consent cascade; checked =
    event_id%3!=0) and `<ds>_sentiment_scheme` (code `scode_<k>`,
    checked = event_id%4!=0, 1 minute newer so it sorts first).
    Differing checked rules produce genuine all/mix/none cases for M1.
  - v2 snapshots shift code indices by +1 (a relabelling).

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
    # The deterministic label/struct construction downstream is the
    # CPU-heavy stage; a small source file arrives as one partition,
    # so spread it across the cores first (on a real cluster the scan
    # is already split into many input splits and this coalesces into
    # the existing parallelism).
    ev = ev.repartition(spark.sparkContext.defaultParallelism)
    # One select, not chained withColumn: each withColumn is a py4j
    # round-trip + plan copy, measurable on a plan this wide.
    base = ev.select(
        "*", _dataset0().alias("dataset0"),
        F.concat(F.lit("msg-"), F.col("event_id").cast("string")).alias("message_id"),
        F.concat(F.lit("avf-participant-uuid-"),
                 F.col("user_id").cast("string")).alias("participant_uuid"),
        F.when(F.col("event_id") % 7 == 3, F.lit("stale")).otherwise(F.lit("live"))
        .alias("status"),
        _pick(F.col("user_id") % 4, _OPERATORS).alias("channel_operator"),
    )
    return base.select("*", _text().alias("text"))


def _snapshot(df: DataFrame, version: int) -> DataFrame:
    """Project one snapshot (v1 = original, v2 = updated 1h later)."""
    eid = F.col("event_id")
    v = version - 1  # code-index shift for relabelled v2 snapshots
    if version == 1:
        dataset = F.col("dataset0")
        prev = F.array().cast("array<string>")
        last_updated = F.col("ts")
        moved = F.lit(False)
    else:
        moved = (eid % 20 == 0) & F.col("dataset0").isin(RQA_DATASETS)
        dataset = (
            F.when(moved & (F.col("dataset0") == "s01e01"), F.lit("s01e02"))
            .when(moved & (F.col("dataset0") == "s01e02"), F.lit("s01e01"))
            .otherwise(F.col("dataset0"))
        )
        prev = F.when(moved, F.array(F.col("dataset0"))).otherwise(F.array().cast("array<string>"))
        last_updated = F.col("ts") + F.expr("INTERVAL 1 HOUR")

    is_rqa = F.col("dataset0").isin(RQA_DATASETS)
    origin_id = F.concat(F.lit("label-origin-"), F.col("message_id"))

    demog_code = F.when(
        F.col("dataset0") == "age",
        F.concat(F.lit("age_"), (F.lit(10) + F.col("user_id") % 75).cast("string")),
    ).otherwise(F.concat(F.lit("code_"), ((eid + v) % 7).cast("string")))
    demog_label = make_label(
        scheme_id=F.concat(F.col("dataset0"), F.lit("_scheme")),
        code_id=demog_code,
        date_time_utc=last_updated,
        checked=(eid % 3) != 0,
        origin_id=origin_id,
    )

    theme_code = F.when(eid % 100 == 13, F.lit("STOP")).otherwise(
        F.concat(F.lit("code_"), ((eid + v) % 7).cast("string")))
    theme_label = make_label(
        scheme_id=F.concat(F.col("dataset0"), F.lit("_theme_scheme")),
        code_id=theme_code,
        date_time_utc=last_updated,
        checked=(eid % 3) != 0,
        origin_id=origin_id,
    )
    sentiment_label = make_label(
        scheme_id=F.concat(F.col("dataset0"), F.lit("_sentiment_scheme")),
        code_id=F.concat(F.lit("scode_"), ((eid + v) % 5).cast("string")),
        date_time_utc=last_updated + F.expr("INTERVAL 1 MINUTE"),
        checked=(eid % 4) != 0,
        origin_id=origin_id,
    )

    labels = (
        F.when(moved, F.array().cast(LABELS_TYPE))
        .when(is_rqa, F.array(sentiment_label, theme_label))  # newest-first
        .otherwise(F.array(demog_label))
    )

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
# previous_dataset (NULL unless moved), and the flattened labels:
#   label_scheme/label_code/label_checked       — demog label or RQA theme
#   label2_scheme/label2_code/label2_checked    — RQA sentiment (NULL else)
# (all NULL when the snapshot's labels were cleared by a move),
# plus coda_id, last_updated, event_id, user_id.
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
    dataset0 IN ('s01e01','s01e02') AS is_rqa,
    CASE dataset0
      WHEN 'gender' THEN CASE user_id % 4 WHEN 0 THEN 'male' WHEN 1 THEN 'female'
                          WHEN 2 THEN 'man' ELSE NULL END
      WHEN 'age' THEN CAST(10 + user_id % 75 AS VARCHAR)
      WHEN 'location' THEN CASE user_id % 5 WHEN 0 THEN 'nairobi' WHEN 1 THEN 'mombasa'
                            WHEN 2 THEN 'kisumu' WHEN 3 THEN 'baidoa' ELSE 'mogadishu' END
      ELSE 'reply ' || CAST(event_id % 100 AS VARCHAR) END AS text
  FROM enriched
),
versioned AS (
  SELECT *, 0 AS v, FALSE AS moved, ts AS last_updated FROM with_text
  UNION ALL
  SELECT *, 1 AS v,
         (event_id % 20 = 0 AND is_rqa) AS moved,
         ts + INTERVAL 1 HOUR AS last_updated
  FROM with_text WHERE event_id % 5 = 0
),
messages AS (
  SELECT message_id, participant_uuid, text, ts AS timestamp, channel_operator,
         status,
         CASE WHEN moved AND dataset0 = 's01e01' THEN 's01e02'
              WHEN moved AND dataset0 = 's01e02' THEN 's01e01'
              ELSE dataset0 END AS dataset,
         CASE WHEN moved THEN dataset0 ELSE NULL END AS previous_dataset,
         CASE WHEN moved THEN NULL
              WHEN is_rqa THEN dataset0 || '_theme_scheme'
              ELSE dataset0 || '_scheme' END AS label_scheme,
         CASE WHEN moved THEN NULL
              WHEN is_rqa THEN (CASE WHEN event_id % 100 = 13 THEN 'STOP'
                                ELSE 'code_' || CAST((event_id + v) % 7 AS VARCHAR) END)
              WHEN dataset0 = 'age' THEN 'age_' || CAST(10 + user_id % 75 AS VARCHAR)
              ELSE 'code_' || CAST((event_id + v) % 7 AS VARCHAR) END AS label_code,
         CASE WHEN moved THEN NULL ELSE (event_id % 3) <> 0 END AS label_checked,
         CASE WHEN moved OR NOT is_rqa THEN NULL
              ELSE dataset0 || '_sentiment_scheme' END AS label2_scheme,
         CASE WHEN moved OR NOT is_rqa THEN NULL
              ELSE 'scode_' || CAST((event_id + v) % 5 AS VARCHAR) END AS label2_code,
         CASE WHEN moved OR NOT is_rqa THEN NULL
              ELSE (event_id % 4) <> 0 END AS label2_checked,
         sha256(text) AS coda_id, last_updated,
         event_id, user_id
  FROM versioned
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
