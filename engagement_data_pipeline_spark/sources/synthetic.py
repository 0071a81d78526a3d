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

from pyspark.sql import DataFrame, SparkSession

from ..tables import load

RQA_DATASETS = ["s01e01", "s01e02"]
DEMOG_DATASETS = ["gender", "age", "location"]

_LABEL_SQL_TYPE = ("STRUCT<scheme_id: STRING, code_id: STRING, "
                   "date_time_utc: TIMESTAMP, checked: BOOLEAN, "
                   "origin_id: STRING>")


def _label_sql(scheme: str, code: str, when: str, checked: str) -> str:
    """One Label struct (labels/schema.py field order) as Spark SQL."""
    return (f"named_struct('scheme_id', {scheme}, 'code_id', {code}, "
            f"'date_time_utc', {when}, 'checked', {checked}, "
            f"'origin_id', concat('label-origin-', message_id))")


# The entire versioned-messages derivation as ONE SQL statement.
# Building this plan out of nested Column objects costs ~10s of
# driver-side py4j round-trips (thousands of JVM calls for the label
# structs alone); a single spark.sql() parse of the same logical plan
# costs milliseconds and produces the identical Catalyst tree. The
# DuckDB mirror below (MESSAGES_CTE) flattens the same derivation.
_SPARK_MESSAGES_SQL = f"""
WITH base AS (
  SELECT *,
    CASE event_type WHEN 'signup' THEN 'gender' WHEN 'click' THEN 'age'
         WHEN 'view' THEN 'location' WHEN 'purchase' THEN 's01e01'
         ELSE 's01e02' END AS dataset0,
    concat('msg-', CAST(event_id AS STRING)) AS message_id,
    concat('avf-participant-uuid-', CAST(user_id AS STRING))
      AS participant_uuid,
    CASE WHEN event_id % 7 = 3 THEN 'stale' ELSE 'live' END AS status,
    CASE user_id % 4 WHEN 0 THEN 'telegram' WHEN 1 THEN 'safaricom'
         WHEN 2 THEN 'golis' ELSE 'hormuud' END AS channel_operator
  FROM {{events}}
),
with_text AS (
  SELECT *,
    dataset0 IN ('s01e01', 's01e02') AS is_rqa,
    CASE dataset0
      WHEN 'gender' THEN CASE user_id % 4 WHEN 0 THEN 'male'
                          WHEN 1 THEN 'female' WHEN 2 THEN 'man'
                          ELSE NULL END
      WHEN 'age' THEN CAST(10 + user_id % 75 AS STRING)
      WHEN 'location' THEN CASE user_id % 5 WHEN 0 THEN 'nairobi'
                            WHEN 1 THEN 'mombasa' WHEN 2 THEN 'kisumu'
                            WHEN 3 THEN 'baidoa' ELSE 'mogadishu' END
      ELSE concat('reply ', CAST(event_id % 100 AS STRING)) END AS text
  FROM base
),
versioned AS (
  SELECT *, 0 AS v, FALSE AS moved, ts AS last_updated FROM with_text
  UNION ALL
  SELECT *, 1 AS v, (event_id % 20 = 0 AND is_rqa) AS moved,
         ts + INTERVAL 1 HOUR AS last_updated
  FROM with_text WHERE event_id % 5 = 0
)
SELECT
  message_id,
  participant_uuid,
  text,
  ts AS timestamp,
  'in' AS direction,
  channel_operator,
  status,
  CASE WHEN moved AND dataset0 = 's01e01' THEN 's01e02'
       WHEN moved AND dataset0 = 's01e02' THEN 's01e01'
       ELSE dataset0 END AS dataset,
  CASE WHEN moved THEN array(dataset0)
       ELSE CAST(array() AS ARRAY<STRING>) END AS previous_datasets,
  CASE WHEN moved THEN CAST(array() AS ARRAY<{_LABEL_SQL_TYPE}>)
       WHEN is_rqa THEN array(
         {_label_sql("concat(dataset0, '_sentiment_scheme')",
                     "concat('scode_', CAST((event_id + v) % 5 AS STRING))",
                     "last_updated + INTERVAL 1 MINUTE",
                     "(event_id % 4) != 0")},
         {_label_sql("concat(dataset0, '_theme_scheme')",
                     "CASE WHEN event_id % 100 = 13 THEN 'STOP' "
                     "ELSE concat('code_', CAST((event_id + v) % 7 AS STRING)) END",
                     "last_updated",
                     "(event_id % 3) != 0")})
       ELSE array(
         {_label_sql("concat(dataset0, '_scheme')",
                     "CASE WHEN dataset0 = 'age' "
                     "THEN concat('age_', CAST(10 + user_id % 75 AS STRING)) "
                     "ELSE concat('code_', CAST((event_id + v) % 7 AS STRING)) END",
                     "last_updated",
                     "(event_id % 3) != 0")})
  END AS labels,
  named_struct('origin_id', concat('rapid_pro:', CAST(event_id AS STRING)),
               'origin_type', 'rapid_pro') AS origin,
  sha2(text, 256) AS coda_id,
  last_updated
FROM versioned
"""


def synthetic_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned messages: v1 for every event, v2 for event_id%5==0
    (labels newest-first per labels/schema.py; moved v2 rows swap RQA
    dataset, record previous_datasets, and clear labels)."""
    ev = load(spark, sf_dir, "events")
    # The label/struct construction downstream is the CPU-heavy stage;
    # a small source file arrives as one partition, so spread it
    # across the cores first (a real cluster's scan already has many
    # input splits and passes through at its existing parallelism).
    ev = ev.repartition(spark.sparkContext.defaultParallelism)
    return spark.sql(_SPARK_MESSAGES_SQL, events=ev)


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
