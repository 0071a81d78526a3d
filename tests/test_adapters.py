"""Source-adapter tests: Facebook, Telegram, Forms, Coda sync (J6),
K5 coda view, membership flags (J4)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.labels.schema import MESSAGE_SCHEMA
from engagement_data_pipeline_spark.sources.adapters import (
    coda_labels_to_messages,
    facebook_comments_to_messages,
    form_responses_to_messages,
    membership_flags,
    messages_to_coda_view,
    telegram_messages_to_messages,
)

T0 = dt.datetime(2024, 1, 10)


def test_facebook_comments_drop_unconfigured_posts(spark):
    comments = spark.createDataFrame(
        [(1, "p1", 7, "nice", T0), (2, "p2", 8, "cool", T0)],
        "comment_id long, post_id string, from_id long, message string, created_time timestamp")
    posts = spark.createDataFrame([("p1", "s01e01")], "post_id string, dataset string")
    out = facebook_comments_to_messages(comments, posts).collect()
    assert len(out) == 1
    assert out[0].dataset == "s01e01"
    assert out[0].origin.origin_id == "facebook.comment_1"
    assert out[0].participant_uuid.startswith("avf-participant-uuid-fb-")


def test_telegram_drops_admin_and_routes_windows(spark):
    msgs = spark.createDataFrame(
        [(1, 5, 10, "PeerUser", "in w1", dt.datetime(2024, 1, 6)),
         (2, 5, None, "PeerUser", "admin", dt.datetime(2024, 1, 6)),
         (3, 5, 11, "PeerChannel", "broadcast", dt.datetime(2024, 1, 6)),
         (4, 5, 12, "PeerUser", "late", dt.datetime(2024, 3, 1))],
        "tg_message_id long, group_id long, from_id long, peer_type string, "
        "text string, date timestamp")
    out = telegram_messages_to_messages(
        msgs, [("w1", "2024-01-05 00:00:00", "2024-01-12 00:00:00")]).collect()
    assert [r.text for r in out] == ["in w1"]
    assert out[0].dataset == "w1"


def test_form_responses_join_question_mapping(spark):
    responses = spark.createDataFrame(
        [("r1", "q_age", "25", "avf-participant-uuid-1", T0),
         ("r1", "q_unmapped", "x", "avf-participant-uuid-1", T0)],
        "response_id string, question_id string, answer string, "
        "participant_uuid string, create_time timestamp")
    mapping = spark.createDataFrame([("q_age", "age")], "question_id string, dataset string")
    out = form_responses_to_messages(responses, mapping, origin_prefix="kobo").collect()
    assert len(out) == 1
    assert out[0].dataset == "age"
    assert out[0].origin.origin_type == "kobo"
    assert out[0].origin.origin_id == "kobo.response_r1.question_q_age"


def msg(mid, dataset, text, coda, labels, lu):
    return (mid, "p1", text, T0, "in", "op", "live", dataset,
            [], labels, ("o-" + mid, "t"), coda, lu)


def label(scheme, code, at=T0):
    return (scheme, code, at, True, "coda")


def test_coda_labels_replace_when_newer(spark):
    messages = spark.createDataFrame(
        [msg("m1", "age", "20", "sha1", [label("age_scheme", "old")], T0),
         msg("m2", "age", "21", "sha2", [label("age_scheme", "keep")], T0)],
        MESSAGE_SCHEMA)
    coda = spark.createDataFrame(
        [("age", "sha1", [label("age_scheme", "new", T0 + dt.timedelta(hours=2))],
          T0 + dt.timedelta(hours=2)),
         ("age", "sha2", [label("age_scheme", "stale")], T0 - dt.timedelta(hours=2))],
        "dataset string, coda_id string, labels array<struct<scheme_id:string,"
        "code_id:string,date_time_utc:timestamp,checked:boolean,origin_id:string>>, "
        "last_updated timestamp")
    out = {r.message_id: r for r in coda_labels_to_messages(messages, coda).collect()}
    assert out["m1"].labels[0].code_id == "new"          # newer Coda labels win
    assert out["m1"].last_updated == T0 + dt.timedelta(hours=2)
    assert out["m2"].labels[0].code_id == "keep"         # older Coda ignored
    assert out["m2"].last_updated == T0


def test_messages_to_coda_view_dedups_same_text(spark):
    messages = spark.createDataFrame(
        [msg("m1", "age", "20", "shaX", [], T0),
         msg("m2", "age", "20", "shaX", [], T0 + dt.timedelta(hours=1)),
         msg("m3", "age", "", "shaE", [], T0),      # F8: empty never syncs
         msg("m4", "age", None, None, [], T0)],
        MESSAGE_SCHEMA)
    out = messages_to_coda_view(messages).collect()
    assert len(out) == 1                      # one Coda entry per (dataset, coda_id)
    assert out[0].message_id == "m2"          # latest snapshot wins


def test_membership_flags(spark):
    df = spark.createDataFrame([("p1",), ("p2",)], "participant_uuid string")
    groups = {"listening": spark.createDataFrame([("p1",)], "participant_uuid string")}
    out = {r.participant_uuid: r.listening
           for r in membership_flags(df, groups).collect()}
    assert out == {"p1": True, "p2": False}
