"""Incrementality tests: tie-safe watermarks (O3), retraction replay
(S3/F2), WS-correction moves (M10/M11), streaming foreachBatch merge."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.labels.schema import MESSAGE_SCHEMA
from engagement_data_pipeline_spark.labels.ws_correction import (
    WS_SCHEME_ID,
    apply_ws_correction,
)
from engagement_data_pipeline_spark.operators.incremental import (
    incremental_fetch,
    load_watermarks,
    save_watermarks,
    tie_safe_watermark,
    truncate_incomplete_tie_group,
)

T = dt.datetime(2024, 1, 10)


def hours(n):
    return T + dt.timedelta(hours=n)


def msg(mid, dataset, status="live", lu=T, participant="p1", prev=(),
        labels=()):
    return (mid, participant, "txt", T, "in", "op", status, dataset,
            list(prev), list(labels), ("o-" + mid, "t"), "sha", lu)


def test_tie_safe_watermark_complete_batch(spark):
    df = spark.createDataFrame([(hours(1),), (hours(2),), (hours(2),)], "ts timestamp")
    assert tie_safe_watermark(df, "ts", complete=True) == hours(2)


def test_tie_safe_watermark_truncated_batch_excludes_max_tie_group(spark):
    df = spark.createDataFrame([(hours(1),), (hours(2),), (hours(2),)], "ts timestamp")
    # the hours(2) group may continue beyond the fetch → commit hours(1)
    assert tie_safe_watermark(df, "ts", complete=False) == hours(1)
    kept = truncate_incomplete_tie_group(df, "ts").collect()
    assert [r.ts for r in kept] == [hours(1)]


def test_tie_safe_watermark_empty_batch(spark):
    df = spark.createDataFrame([], "ts timestamp")
    assert tie_safe_watermark(df, "ts", complete=False) is None


def test_watermark_state_roundtrip(spark, tmp_path):
    path = str(tmp_path / "wm")
    assert load_watermarks(spark, path) == {}
    save_watermarks(spark, path, {"s01e01": hours(3)})
    assert load_watermarks(spark, path) == {"s01e01": hours(3)}


def test_incremental_fetch_replays_retraction(spark):
    """A message cached under dataset A that moved to B after the
    watermark must end up ONLY under B."""
    v1 = msg("m1", "A", lu=hours(0))
    v2 = msg("m1", "B", lu=hours(2), prev=["A"])
    other = msg("m2", "A", lu=hours(0))
    messages = spark.createDataFrame([v1, v2, other], MESSAGE_SCHEMA)
    cached = spark.createDataFrame([v1, other], MESSAGE_SCHEMA)
    out = incremental_fetch(messages, cached, ["A", "B"],
                            hours(1), hours(1))
    got = {(r.message_id, r.dataset) for r in out.collect()}
    assert got == {("m1", "B"), ("m2", "A")}


def test_incremental_fetch_keeps_message_moved_back_to_current(spark):
    """previous_datasets containing the current dataset must NOT
    retract a message whose dataset is (again) that dataset
    (get_messages_in_datasets.py:76-79)."""
    v1 = msg("m1", "A", lu=hours(0))
    v2 = msg("m1", "A", lu=hours(2), prev=["B"])  # went A→B→A historically? prev has B
    messages = spark.createDataFrame(
        [v1, v2, msg("m1x", "B", lu=hours(2), prev=["A"])], MESSAGE_SCHEMA)
    cached = spark.createDataFrame([v1], MESSAGE_SCHEMA)
    out = incremental_fetch(messages, cached, ["A", "B"], hours(1), hours(1))
    got = {(r.message_id, r.dataset) for r in out.collect()}
    assert ("m1", "A") in got


def label(scheme, code, checked=True):
    return (scheme, code, T, checked, "t")


def test_ws_correction_moves_message(spark):
    rows = [msg("m1", "age", labels=[label("age_scheme", "WS"),
                                     label(WS_SCHEME_ID, "ws_gender")]),
            msg("m2", "age", labels=[label("age_scheme", "age_20")])]
    df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
    out = {r.message_id: r for r in apply_ws_correction(
        df, ["age_scheme"], {"ws_gender": "gender"}).collect()}
    assert out["m1"].dataset == "gender"
    assert out["m1"].previous_datasets == ["age"]
    assert out["m1"].labels == []
    assert out["m2"].dataset == "age"          # untouched
    assert len(out["m2"].labels) == 1


def test_ws_correction_unchecked_does_not_move(spark):
    rows = [msg("m1", "age", labels=[label("age_scheme", "WS", checked=False),
                                     label(WS_SCHEME_ID, "ws_gender")])]
    df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
    out = apply_ws_correction(df, ["age_scheme"], {"ws_gender": "gender"}).collect()[0]
    assert out.dataset == "age"


def test_ws_unmapped_code_is_noop(spark):
    """A checked WS-scheme code with no mapped target dataset (the
    reference's 'right place unknown' refusal, lib.py:249-253) must
    leave the message untouched — not null the dataset or clear
    labels."""
    rows = [msg("m1", "age", labels=[label("age_scheme", "WS"),
                                     label(WS_SCHEME_ID, "ws_mystery")])]
    df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
    out = apply_ws_correction(df, ["age_scheme"], {"ws_gender": "gender"}).collect()[0]
    assert out.dataset == "age"
    assert out.previous_datasets == []
    assert len(out.labels) == 2


def test_ws_cycle_fix_resets_to_first_previous(spark):
    """Target already in previous_datasets → M11: reset to
    previous_datasets[0], empty the history."""
    rows = [msg("m1", "age", prev=["gender", "location"],
                labels=[label("age_scheme", "WS"),
                        label(WS_SCHEME_ID, "ws_gender")])]
    df = spark.createDataFrame(rows, MESSAGE_SCHEMA)
    out = apply_ws_correction(df, ["age_scheme"], {"ws_gender": "gender"}).collect()[0]
    assert out.dataset == "gender"             # previous_datasets[0]
    assert out.previous_datasets == []
    assert out.labels == []


def test_streaming_foreach_batch_merge_is_idempotent(spark, tmp_path):
    import time

    from engagement_data_pipeline_spark.streaming import (
        foreach_batch_upsert,
        stream_csv_source,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.csv").write_text(
        "Sender,Message,ReceivedOn\n"
        "avf-participant-uuid-1,hello,5/1/2024 10:30:00\n")
    table = str(tmp_path / "messages_table")
    ckpt1 = str(tmp_path / "ckpt1")

    def run(ckpt):
        stream = stream_csv_source(spark, str(landing))
        q = (stream.writeStream.trigger(availableNow=True)
             .option("checkpointLocation", ckpt)
             .foreachBatch(foreach_batch_upsert(table, ["Sender", "Message", "ReceivedOn"]))
             .start())
        q.awaitTermination(60)

    run(ckpt1)
    first = spark.read.parquet(table).collect()
    assert len(first) == 1
    # replay the SAME file from a fresh checkpoint → merge must no-op
    run(str(tmp_path / "ckpt2"))
    again = spark.read.parquet(table).collect()
    assert sorted(again) == sorted(first)
    # a new file arrives → only the new row is added
    (landing / "b.csv").write_text(
        "Sender,Message,ReceivedOn\n"
        "avf-participant-uuid-1,hello,5/1/2024 10:30:00\n"
        "avf-participant-uuid-2,world,6/1/2024 11:00:00\n")
    time.sleep(0.1)
    run(str(tmp_path / "ckpt3"))
    final = spark.read.parquet(table).collect()
    assert len(final) == 2


def test_bucketed_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The merge target is hash-partitioned on the origin key; a
    micro-batch must rewrite only the bucket partitions its keys land
    in — files in untouched buckets stay byte-for-byte in place."""
    import glob
    import os

    from engagement_data_pipeline_spark.streaming.ingest import (
        foreach_batch_upsert,
        origin_bucket,
        read_merged_table,
    )

    table = str(tmp_path / "t")
    merge = foreach_batch_upsert(table, ["k"], n_buckets=8)
    b1 = spark.createDataFrame([(f"k{i}", i) for i in range(40)],
                               "k string, v int")
    merge(b1, 0)

    def snapshot():
        return {p: os.path.getmtime(p)
                for p in glob.glob(f"{table}/bucket=*/*.parquet")}

    snap1 = snapshot()
    assert len({p.split("bucket=")[1].split("/")[0] for p in snap1}) > 1

    b2 = spark.createDataFrame([("k1", 999), ("brand-new", 7)],
                               "k string, v int")
    merge(b2, 1)
    touched = {r[0] for r in
               b2.withColumn("b", origin_bucket(["k"], 8)).select("b").collect()}
    snap2 = snapshot()
    untouched_checked = 0
    for path, mtime in snap1.items():
        bucket = int(path.split("bucket=")[1].split("/")[0])
        if bucket not in touched:
            assert snap2.get(path) == mtime, f"untouched bucket {bucket} rewritten"
            untouched_checked += 1
    assert untouched_checked > 0
    # replay semantics: existing k1 wins, the new key is inserted
    out = {r["k"]: r["v"] for r in read_merged_table(spark, table).collect()}
    assert out["k1"] == 1 and out["brand-new"] == 7 and len(out) == 41
