"""Stream-stream interval join (§2.12): bounded-state click→purchase
attribution, equal to the batch join over the same rows, with
watermark-expired left state never matching later arrivals."""

import pandas as pd
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.streaming.joins import \
    stream_interval_join

_T = pd.Timestamp


def _write(path, name, rows, cols):
    pd.DataFrame(rows, columns=cols).to_json(
        path / name, orient="records", lines=True, date_format="iso")


def _run_join(spark, clicks_dir, buys_dir, ckpt):
    clicks = (spark.readStream.schema("user_id long, click_ts timestamp")
              .json(str(clicks_dir)))
    buys = (spark.readStream.schema("user_id long, buy_ts timestamp")
            .json(str(buys_dir)))
    joined = stream_interval_join(
        clicks, buys, "user_id", "click_ts", "buy_ts",
        upper="interval 10 minutes", watermark="10 minutes")
    out = []
    q = (joined.select("user_id", "click_ts", "buy_ts").writeStream
         .foreachBatch(lambda df, _id: out.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", str(ckpt))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return {(r.user_id, r.click_ts.strftime("%H:%M"),
             r.buy_ts.strftime("%H:%M")) for r in out}


def test_stream_join_matches_batch_and_bounds_state(spark, tmp_path):
    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir(), buys_dir.mkdir()

    clicks = [(1, _T("2024-05-01 10:00:00")),
              (2, _T("2024-05-01 10:02:00")),
              (3, _T("2024-05-01 10:30:00"))]
    buys = [(1, _T("2024-05-01 10:05:00")),   # in window
            (1, _T("2024-05-01 10:20:00")),   # past +10m: no match
            (2, _T("2024-05-01 10:01:00")),   # before click: no match
            (3, _T("2024-05-01 10:39:00"))]   # in window
    _write(clicks_dir, "a.json", clicks, ["user_id", "click_ts"])
    _write(buys_dir, "a.json", buys, ["user_id", "buy_ts"])

    got = _run_join(spark, clicks_dir, buys_dir, tmp_path / "ck1")
    assert got == {(1, "10:00", "10:05"), (3, "10:30", "10:39")}

    # batch replay over the same rows gives the identical result
    bc = spark.createDataFrame([(u, t.to_pydatetime()) for u, t in clicks],
                               "user_id long, click_ts timestamp")
    bb = spark.createDataFrame([(u, t.to_pydatetime()) for u, t in buys],
                               "user_id long, buy_ts timestamp")
    batch = stream_interval_join(bc, bb, "user_id", "click_ts", "buy_ts",
                                 upper="interval 10 minutes")
    got_batch = {(r.user_id, r.click_ts.strftime("%H:%M"),
                  r.buy_ts.strftime("%H:%M"))
                 for r in batch.select("user_id", "click_ts",
                                       "buy_ts").collect()}
    assert got_batch == got


def test_stream_join_expired_state_never_matches(spark, tmp_path):
    clicks_dir = tmp_path / "clicks"
    buys_dir = tmp_path / "buys"
    clicks_dir.mkdir(), buys_dir.mkdir()

    # run 1: a 10:00 click; an 11:00 row on EACH side pushes both
    # watermarks ~50min past the click's join horizon (10:10), so its
    # state is evicted at the end of the run
    _write(clicks_dir, "a.json",
           [(1, _T("2024-05-01 10:00:00")), (9, _T("2024-05-01 11:00:00"))],
           ["user_id", "click_ts"])
    _write(buys_dir, "a.json", [(9, _T("2024-05-01 11:00:30"))],
           ["user_id", "buy_ts"])
    got1 = _run_join(spark, clicks_dir, buys_dir, tmp_path / "ck")
    assert got1 == {(9, "11:00", "11:00")}

    # run 2 (same checkpoint): a buy inside the 10:00 click's window
    # arrives LATE, behind the restored watermark — the click's state
    # is gone and the pair must NOT appear
    _write(buys_dir, "b.json", [(1, _T("2024-05-01 10:04:00")),
                                (9, _T("2024-05-01 12:00:00"))],
           ["user_id", "buy_ts"])
    got2 = _run_join(spark, clicks_dir, buys_dir, tmp_path / "ck")
    assert (1, "10:00", "10:04") not in got2


def test_dead_letter_queue_merge(spark, tmp_path):
    """DLQ posture for the streaming merge: the expectations gate
    splits each micro-batch; valid rows take the idempotent merge,
    invalid rows append to a dead-letter dir with their failure
    reasons — nothing is dropped, nothing fails the load."""
    from engagement_data_pipeline_spark.operators.quality import (
        matches, not_null, row_quarantine)
    from engagement_data_pipeline_spark.streaming.ingest import (
        foreach_batch_upsert, read_merged_table)

    table = str(tmp_path / "table")
    dlq = str(tmp_path / "dlq")
    rules = [not_null("origin", "text"),
             matches("origin", "^msg-[0-9]+$")]
    inner = foreach_batch_upsert(table, ["origin"], n_buckets=2)

    def gated(batch, batch_id):
        valid, bad = row_quarantine(batch, rules)
        (bad.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(dlq))
        inner(valid, batch_id)

    rows = [("msg-1", "hello"), ("msg-2", None),
            ("not!an!id", "x"), ("msg-3", "ok")]
    gated(spark.createDataFrame(rows, "origin string, text string"), 0)

    merged = {r.origin for r in read_merged_table(spark, table).collect()}
    assert merged == {"msg-1", "msg-3"}
    dead = {(r.origin, r.failed_rules)
            for r in spark.read.parquet(dlq).collect()}
    assert dead == {("msg-2", "not_null(origin,text)"),
                    ("not!an!id", "matches(origin)")}
