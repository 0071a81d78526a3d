"""Event-time windowed aggregation with a watermark (§2.12): late
data behind the checkpointed watermark is dropped, windows finalize
exactly once in append mode — the streaming analog of the reference's
timestamp-cache incremental fetches."""

import pandas as pd
from pyspark.sql import functions as F


def test_windowed_counts_drop_late_events(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write(name, rows):
        pd.DataFrame(rows, columns=["user_id", "ts"]).to_json(
            landing / name, orient="records", lines=True, date_format="iso")

    def run():
        stream = (spark.readStream.schema("user_id long, ts timestamp")
                  .json(str(landing)))
        counts = (stream.withWatermark("ts", "10 minutes")
                  .groupBy(F.window("ts", "10 minutes")).count())
        emitted = []
        q = (counts.writeStream
             .foreachBatch(lambda df, _id: emitted.extend(df.collect()))
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return {(r["window"]["start"].strftime("%H:%M"), r["count"])
                for r in emitted}

    t = pd.Timestamp
    # run 1: two events in [10:00,10:10), one in [10:10,10:20), and an
    # 11:00 event that pushes the watermark to 10:50 — both early
    # windows finalize
    write("a.json", [(1, t("2024-05-01 10:00:00")),
                     (2, t("2024-05-01 10:05:00")),
                     (1, t("2024-05-01 10:15:00")),
                     (3, t("2024-05-01 11:00:00"))])
    got1 = run()
    assert got1 == {("10:00", 2), ("10:10", 1)}

    # run 2 (same checkpoint → watermark 10:50 restored): a LATE
    # 10:05 event must be dropped — the already-finalized 10:00
    # window is NOT re-emitted or corrected — and a 12:00 event
    # finalizes the 11:00 window with count 1
    write("b.json", [(9, t("2024-05-01 10:05:00")),
                     (3, t("2024-05-01 12:00:00"))])
    got2 = run()
    assert got2 == {("11:00", 1)}


def test_dedup_within_watermark_drops_replayed_keys(spark, tmp_path):
    from engagement_data_pipeline_spark.streaming.ingest import (
        dedup_within_watermark,
    )
    landing = tmp_path / "dedup_landing"
    landing.mkdir()
    ckpt = str(tmp_path / "dedup_ckpt")

    def write(name, rows):
        pd.DataFrame(rows, columns=["origin_id", "ts"]).to_json(
            landing / name, orient="records", lines=True, date_format="iso")

    t = pd.Timestamp
    # m1 arrives twice in one batch (replay within the horizon) and m2
    # once; only one m1 row must survive.
    write("a.json", [("m1", t("2024-05-01 10:00:00")),
                     ("m1", t("2024-05-01 10:01:00")),
                     ("m2", t("2024-05-01 10:02:00"))])

    stream = (spark.readStream.schema("origin_id string, ts timestamp")
              .json(str(landing)))
    deduped = dedup_within_watermark(stream, ["origin_id"], "ts",
                                     delay="10 minutes")
    emitted = []
    q = (deduped.writeStream
         .foreachBatch(lambda df, _id: emitted.extend(df.collect()))
         .outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert sorted(r.origin_id for r in emitted) == ["m1", "m2"]
