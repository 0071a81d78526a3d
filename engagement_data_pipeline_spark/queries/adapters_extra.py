"""Registry queries for the remaining source adapters and the Coda
round-trip: S6 Facebook comments, S9 Google Forms, S10 KoboToolBox,
K5 db→coda add-message view (with F8), S11/J6 coda→db relabelling.

Fixtures derive from the `events` parquet with pure integer
arithmetic (same convention as queries/sources_adapters.py), so the
DuckDB oracle re-derives identical rows from the same file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..labels.schema import make_label
from ..sources.adapters import (
    coda_labels_to_messages,
    facebook_comments_to_messages,
    form_responses_to_messages,
    messages_to_coda_view,
)
from ..sources.synthetic import RQA_DATASETS, latest_cte
from ._helpers import micros
from .engagement import _messages

# --- S6 Facebook comments -------------------------------------------------

_FB_POSTS = [(p, "fb_s01e01" if p % 2 == 0 else "fb_s01e02") for p in range(6)]


def s6_facebook_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: comments ⋈ configured posts (posts 6/7 unconfigured →
    dropped), normalized to the Message schema."""
    from ..tables import load
    from ._helpers import apply_runtime_conf

    apply_runtime_conf(spark)
    events = load(spark, sf_dir, "events")
    comments = events.select(
        F.col("event_id").alias("comment_id"),
        (F.col("user_id") % 8).alias("post_id"),
        F.col("user_id").alias("from_id"),
        F.concat(F.lit("fb comment "), (F.col("event_id") % 40).cast("string"))
        .alias("message"),
        F.col("ts").alias("created_time"),
    )
    post_datasets = spark.createDataFrame(_FB_POSTS, "post_id long, dataset string")
    msgs = facebook_comments_to_messages(comments, post_datasets)
    return msgs.select(
        "message_id", "participant_uuid", "text",
        micros("timestamp").alias("timestamp_us"),
        "dataset", F.col("origin.origin_id").alias("origin_id"))


_FB_POSTS_VALUES = ", ".join(f"({p}, '{d}')" for p, d in _FB_POSTS)

S6_FACEBOOK_INGEST_SQL = f"""
WITH comments AS (
  SELECT event_id AS comment_id, user_id % 8 AS post_id, user_id AS from_id,
         'fb comment ' || CAST(event_id % 40 AS VARCHAR) AS message,
         ts AS created_time
  FROM events
),
post_datasets(post_id, dataset) AS (VALUES {_FB_POSTS_VALUES})
SELECT 'msg-fb-' || CAST(comment_id AS VARCHAR) AS message_id,
       'avf-participant-uuid-fb-' || sha256(CAST(from_id AS VARCHAR)) AS participant_uuid,
       message AS text, epoch_us(created_time) AS timestamp_us, dataset,
       'facebook.comment_' || CAST(comment_id AS VARCHAR) AS origin_id
FROM comments JOIN post_datasets USING (post_id)
"""


# --- S9/S10 form-shaped sources -------------------------------------------

_GF_QUESTIONS = [(0, "gf_gender"), (1, "gf_age"), (2, "gf_s01e01"), (3, "gf_s01e02")]
_KOBO_QUESTIONS = [(0, "kobo_consent"), (2, "kobo_s01e01"), (4, "kobo_s01e02")]


def _form_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import load
    from ._helpers import apply_runtime_conf

    apply_runtime_conf(spark)
    events = load(spark, sf_dir, "events")
    return events.select(
        F.col("event_id").alias("response_id"),
        (F.col("user_id") % 6).alias("question_id"),
        F.concat(F.lit("ans "), (F.col("event_id") % 25).cast("string")).alias("answer"),
        F.concat(F.lit("avf-participant-uuid-"), F.col("user_id").cast("string"))
        .alias("participant_uuid"),
        F.col("ts").alias("create_time"),
    )


def _form_ingest(spark: SparkSession, sf_dir: str,
                 mapping: list[tuple[int, str]], prefix: str) -> DataFrame:
    q = spark.createDataFrame(mapping, "question_id long, dataset string")
    msgs = form_responses_to_messages(_form_fixture(spark, sf_dir), q,
                                      origin_prefix=prefix)
    return msgs.select(
        "message_id", "participant_uuid", "text",
        micros("timestamp").alias("timestamp_us"),
        "dataset", F.col("origin.origin_id").alias("origin_id"))


def s9_google_form_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: form responses ⋈ question→dataset map (unmapped questions
    4/5 dropped)."""
    return _form_ingest(spark, sf_dir, _GF_QUESTIONS, "google_form")


def s10_kobo_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: same adapter shape as S9 with the kobo origin prefix and a
    sparser question map."""
    return _form_ingest(spark, sf_dir, _KOBO_QUESTIONS, "kobo")


def _form_sql(mapping: list[tuple[int, str]], prefix: str) -> str:
    values = ", ".join(f"({q}, '{d}')" for q, d in mapping)
    return f"""
WITH responses AS (
  SELECT event_id AS response_id, user_id % 6 AS question_id,
         'ans ' || CAST(event_id % 25 AS VARCHAR) AS answer,
         'avf-participant-uuid-' || CAST(user_id AS VARCHAR) AS participant_uuid,
         ts AS create_time
  FROM events
),
qmap(question_id, dataset) AS (VALUES {values})
SELECT 'msg-form-' || CAST(response_id AS VARCHAR) || '-' || CAST(question_id AS VARCHAR) AS message_id,
       participant_uuid, answer AS text, epoch_us(create_time) AS timestamp_us,
       dataset,
       '{prefix}.response_' || CAST(response_id AS VARCHAR)
         || '.question_' || CAST(question_id AS VARCHAR) AS origin_id
FROM responses JOIN qmap USING (question_id)
"""


S9_GOOGLE_FORM_INGEST_SQL = _form_sql(_GF_QUESTIONS, "google_form")
S10_KOBO_INGEST_SQL = _form_sql(_KOBO_QUESTIONS, "kobo")


# --- K5 db→coda add-message view (+F8) ------------------------------------

def k5_coda_add_messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K5+F8: latest snapshot per message → one row per distinct
    (dataset, coda_id) with non-empty text — the batch the reference
    adds to Coda one Firestore transaction at a time
    (engagement_db_to_coda.py:74-117)."""
    from ..operators.dedup import latest_snapshot

    latest = latest_snapshot(_messages(spark, sf_dir),
                             ["message_id"], ["last_updated", "message_id"])
    view = messages_to_coda_view(latest)
    return view.select(
        "dataset", "coda_id", "text", "message_id",
        F.size("labels").alias("n_labels"),
        micros("last_updated").alias("last_updated_us"))


K5_CODA_ADD_MESSAGES_SQL = "WITH " + latest_cte() + """
, non_empty AS (
  SELECT * FROM latest
  WHERE text IS NOT NULL AND len(trim(text)) > 0
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY dataset, coda_id
      ORDER BY last_updated DESC, message_id DESC) AS coda_rn
  FROM non_empty
)
SELECT dataset, coda_id, text, message_id,
       (CASE WHEN label_scheme IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN label2_scheme IS NOT NULL THEN 1 ELSE 0 END) AS n_labels,
       epoch_us(last_updated) AS last_updated_us
FROM ranked WHERE coda_rn = 1
"""


# --- S11/J6 coda→db relabelling -------------------------------------------

_CODA_TS = "2025-01-01 00:00:00"
_RQA_IN = "(" + ", ".join(f"'{d}'" for d in RQA_DATASETS) + ")"


def s11_coda_relabel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11+J6: a Coda labelling for half the (dataset, coda_id) space
    (first hex digit 0-7) lands on the live RQA messages; a newer Coda
    label replaces (prepends over) the message's labels
    (coda_to_engagement_db.py:47-83,126-174)."""
    from ..operators.dedup import latest_snapshot

    latest = latest_snapshot(_messages(spark, sf_dir),
                             ["message_id"], ["last_updated", "message_id"])
    msgs = latest.where(F.col("dataset").isin(RQA_DATASETS)
                        & (F.col("status") == "live"))
    coda_ts = F.lit(_CODA_TS).cast("timestamp")
    coda = (
        msgs.select("dataset", "coda_id").distinct()
        .where(F.substring("coda_id", 1, 1) <= "7")
        .select(
            "dataset", "coda_id",
            F.array(make_label(
                F.lit("coda_review_scheme"),
                F.concat(F.lit("coda_"), F.substring("coda_id", 1, 2)),
                coda_ts, F.lit(True),
                F.concat(F.lit("coda-label-"), F.col("coda_id")))).alias("labels"),
            coda_ts.alias("last_updated"))
    )
    out = coda_labels_to_messages(msgs, coda)
    return out.select(
        "message_id", "dataset", "coda_id",
        F.get(F.col("labels"), 0)["scheme_id"].alias("first_scheme"),
        F.get(F.col("labels"), 0)["code_id"].alias("first_code"),
        F.size("labels").alias("n_labels"),
        micros("last_updated").alias("last_updated_us"))


S11_CODA_RELABEL_SQL = "WITH " + latest_cte() + f"""
, live_rqa AS (
  SELECT * FROM latest
  WHERE dataset IN {_RQA_IN} AND status = 'live'
),
base AS (
  SELECT *,
         (CASE WHEN label2_scheme IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN label_scheme IS NOT NULL THEN 1 ELSE 0 END) AS old_n,
         substring(coda_id, 1, 1) <= '7' AS relabelled
  FROM live_rqa
)
SELECT message_id, dataset, coda_id,
       CASE WHEN relabelled THEN 'coda_review_scheme'
            ELSE COALESCE(label2_scheme, label_scheme) END AS first_scheme,
       CASE WHEN relabelled THEN 'coda_' || substring(coda_id, 1, 2)
            ELSE COALESCE(label2_code, label_code) END AS first_code,
       old_n + CASE WHEN relabelled THEN 1 ELSE 0 END AS n_labels,
       CASE WHEN relabelled THEN epoch_us(TIMESTAMP '{_CODA_TS}')
            ELSE epoch_us(last_updated) END AS last_updated_us
FROM base
"""
