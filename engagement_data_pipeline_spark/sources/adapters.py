"""Schema adapters for the remaining sources (SURVEY §2.1): Facebook
comments (S6), Telegram groups (S7), Google Forms (S9), KoboToolBox
(S10), Coda datasets (S11), membership CSVs (S12) — plus the joins
they imply (J4 membership flags, J6 coda⋈engagement) and the K5
db→coda add-message view.

The live API clients are out of scope (network); each adapter maps
the fetched table shape onto the Message schema with the same
filters/derivations the reference applies, so a fixture table (or a
connector-landed parquet) flows through the identical pipeline.
Everything is column expressions + broadcast-friendly joins.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaners import coda_id
from ..labels.schema import empty_labels


def _message_select(participant, text, ts, operator, dataset, origin_id,
                    origin_type: str, message_id):
    return [
        message_id.alias("message_id"),
        participant.alias("participant_uuid"),
        text.alias("text"),
        ts.alias("timestamp"),
        F.lit("in").alias("direction"),
        operator.alias("channel_operator"),
        F.lit("live").alias("status"),
        dataset.alias("dataset"),
        F.array().cast("array<string>").alias("previous_datasets"),
        empty_labels().alias("labels"),
        F.struct(origin_id.alias("origin_id"),
                 F.lit(origin_type).alias("origin_type")).alias("origin"),
        coda_id(text).alias("coda_id"),
        ts.alias("last_updated"),
    ]


def facebook_comments_to_messages(comments: DataFrame,
                                  post_datasets: DataFrame) -> DataFrame:
    """S6: comments(comment_id, post_id, from_id, message,
    created_time) ⋈ post_datasets(post_id, dataset) — comments on
    unconfigured posts drop (reference facebook_to_engagement_db.py:
    98-127; per-post created_time watermark handled by
    operators/incremental.py)."""
    joined = comments.join(F.broadcast(post_datasets), "post_id")
    return joined.select(*_message_select(
        participant=F.concat(F.lit("avf-participant-uuid-fb-"),
                             F.sha2(F.col("from_id").cast("string"), 256)),
        text=F.col("message"),
        ts=F.col("created_time"),
        operator=F.lit("facebook"),
        dataset=F.col("dataset"),
        origin_id=F.concat(F.lit("facebook.comment_"), F.col("comment_id").cast("string")),
        origin_type="facebook",
        message_id=F.concat(F.lit("msg-fb-"), F.col("comment_id").cast("string")),
    ))


def telegram_messages_to_messages(msgs: DataFrame,
                                  dataset_windows: Sequence[tuple[str, str, str]],
                                  ) -> DataFrame:
    """S7 + F11: msgs(tg_message_id, group_id, from_id, peer_type,
    text, date). Admin/broadcast posts (from_id NULL or a channel
    peer) drop (telegram_group_to_engagement_db.py:64-108); dataset
    windows are half-open [start, end) (:230-232); out-of-window rows
    drop."""
    kept = msgs.where(F.col("from_id").isNotNull()
                      & (F.col("peer_type") != "PeerChannel"))
    dataset = F.lit(None).cast("string")
    for name, start, end in dataset_windows:
        in_win = ((F.col("date") >= F.lit(start).cast("timestamp"))
                  & (F.col("date") < F.lit(end).cast("timestamp")))
        dataset = F.when(in_win, F.lit(name)).otherwise(dataset)
    routed = kept.withColumn("__dataset", dataset).where(F.col("__dataset").isNotNull())
    return routed.select(*_message_select(
        participant=F.concat(F.lit("avf-participant-uuid-tg-"),
                             F.sha2(F.col("from_id").cast("string"), 256)),
        text=F.col("text"),
        ts=F.col("date"),
        operator=F.lit("telegram"),
        dataset=F.col("__dataset"),
        origin_id=F.concat(F.lit("telegram.group_"), F.col("group_id").cast("string"),
                           F.lit(".message_"), F.col("tg_message_id").cast("string")),
        origin_type="telegram",
        message_id=F.concat(F.lit("msg-tg-"), F.col("group_id").cast("string"),
                            F.lit("-"), F.col("tg_message_id").cast("string")),
    ))


def form_responses_to_messages(responses: DataFrame,
                               question_datasets: DataFrame,
                               origin_prefix: str = "google_form",
                               ) -> DataFrame:
    """S9/S10: responses(response_id, question_id, answer,
    participant_uuid, create_time) ⋈ question_datasets(question_id,
    dataset) — the question→dataset mapping is the form-structure
    validation product (google_form_to_engagement_db.py:17-58);
    unmapped questions drop. KoboToolBox (S10) is the same shape with
    a different origin_prefix."""
    joined = responses.join(F.broadcast(question_datasets), "question_id")
    return joined.select(*_message_select(
        participant=F.col("participant_uuid"),
        text=F.col("answer"),
        ts=F.col("create_time"),
        operator=F.lit(origin_prefix),
        dataset=F.col("dataset"),
        origin_id=F.concat(F.lit(f"{origin_prefix}.response_"),
                           F.col("response_id").cast("string"),
                           F.lit(".question_"), F.col("question_id").cast("string")),
        origin_type=origin_prefix,
        message_id=F.concat(F.lit("msg-form-"), F.col("response_id").cast("string"),
                            F.lit("-"), F.col("question_id").cast("string")),
    ))


def coda_labels_to_messages(messages: DataFrame, coda_messages: DataFrame,
                            ) -> DataFrame:
    """S11 + J6: coda_messages(dataset, coda_id, labels, last_updated)
    joined on (dataset, coda_id); a newer Coda labelling replaces the
    message's labels (prepend keeps newest-first per-scheme
    resolution; reference coda_to_engagement_db.py:47-83,126-174)."""
    coda = coda_messages.select(
        "dataset", "coda_id",
        F.col("labels").alias("__coda_labels"),
        F.col("last_updated").alias("__coda_updated"))
    joined = messages.join(coda, ["dataset", "coda_id"], "left")
    newer = (F.col("__coda_updated").isNotNull()
             & (F.col("__coda_updated") > F.col("last_updated")))
    return (
        joined.withColumn(
            "labels",
            F.when(newer, F.concat(F.col("__coda_labels"), F.col("labels")))
            .otherwise(F.col("labels")))
        .withColumn(
            "last_updated",
            F.when(newer, F.col("__coda_updated")).otherwise(F.col("last_updated")))
        .drop("__coda_labels", "__coda_updated")
    )


def messages_to_coda_view(messages: DataFrame) -> DataFrame:
    """K5 + F8: the db→coda add-message view — one row per distinct
    (dataset, coda_id) with non-empty text, carrying the first
    message's text and labels (same-text messages share one Coda
    entry; engagement_db_to_coda.py:74-117)."""
    non_empty = messages.where(
        F.col("text").isNotNull() & (F.length(F.trim(F.col("text"))) > 0))
    from ..operators.dedup import latest_snapshot

    return latest_snapshot(
        non_empty.select("dataset", "coda_id", "text", "labels", "message_id",
                         "last_updated"),
        ["dataset", "coda_id"], ["last_updated", "message_id"])


def membership_flags(df: DataFrame, groups: Mapping[str, DataFrame],
                     on: str = "participant_uuid") -> DataFrame:
    """S12 + J4: one boolean column per membership group via broadcast
    left joins (membership_group.py:108-117)."""
    out = df
    for name, members in groups.items():
        m = members.select(F.col(on), F.lit(True).alias(f"__{name}"))
        out = (
            out.join(F.broadcast(m), on, "left")
            .withColumn(name, F.coalesce(F.col(f"__{name}"), F.lit(False)))
            .drop(f"__{name}")
        )
    return out
