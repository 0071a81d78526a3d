"""Streaming sessionization (applyInPandasWithState) must converge to
the batch operator's sessions when the same events are replayed
through availableNow micro-batches."""

import pandas as pd
from pyspark.sql import functions as F


def _mk_events():
    base = pd.Timestamp("2024-05-01 10:00:00")
    rows = []
    # user 1: two sessions (gap 45min between event 2 and 3), 3+2 events
    for m in (0, 5, 10):
        rows.append((1, base + pd.Timedelta(minutes=m)))
    for m in (55, 60):
        rows.append((1, base + pd.Timedelta(minutes=m)))
    # user 2: one long session of 4 events, 20min apart (≤ gap)
    for m in (0, 20, 40, 60):
        rows.append((2, base + pd.Timedelta(minutes=m)))
    # user 3: three single-event sessions
    for m in (0, 120, 240):
        rows.append((3, base + pd.Timedelta(minutes=m)))
    return rows


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    from engagement_data_pipeline_spark.operators.sessions import sessionize
    from engagement_data_pipeline_spark.streaming.sessions import (
        streaming_sessionize,
    )

    rows = _mk_events()
    events = spark.createDataFrame(
        [(u, ts.to_pydatetime()) for u, ts in rows],
        "user_id long, ts timestamp")

    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(events, "user_id", "ts", gap_minutes=30).collect()
    }

    # land the events as two files split mid-session (state must carry
    # open sessions across micro-batches), plus a far-future sentinel
    # per user so every real session is CLOSED by the end of replay
    landing = tmp_path / "landing"
    landing.mkdir()
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"]).sort_values("ts")
    mid = len(pdf) // 2
    pdf.iloc[:mid].to_json(landing / "a.json", orient="records",
                           lines=True, date_format="iso")
    flush = pd.DataFrame(
        [(u, pd.Timestamp("2030-01-01")) for u in pdf["user_id"].unique()],
        columns=["user_id", "ts"])
    pd.concat([pdf.iloc[mid:], flush]).to_json(
        landing / "b.json", orient="records", lines=True, date_format="iso")

    stream = (spark.readStream.schema("user_id long, ts timestamp")
              .option("maxFilesPerTrigger", 1).json(str(landing)))
    closed = streaming_sessionize(stream, "user_id", gap_minutes=30)
    q = (closed.writeStream.format("memory").queryName("sessions_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("sessions_out").collect()
    }
    assert got == batch
    # 2 + 1 + 3 sessions
    assert len(got) == 6


def test_transform_with_state_probe(spark, tmp_path):
    """Probe for Spark 4's transformWithStateInPandas (the successor
    of applyInPandasWithState): its Python driver worker imports
    google.protobuf, which this container does not ship, so the test
    auto-skips today and auto-upgrades the suite the moment the image
    gains protobuf (STATUS.md §2.12 documents the block). The body is
    a minimal per-user running count through a ValueState."""
    import pytest

    pytest.importorskip("google.protobuf")
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)
    from pyspark.sql.types import LongType, StructField, StructType

    class RunningCount(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState(
                "n", StructType([StructField("n", LongType())]))

        def handleInputRows(self, key, rows, timerValues):
            n = sum(len(pdf) for pdf in rows)
            prev = self._n.get()[0] if self._n.exists() else 0
            self._n.update((prev + n,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [prev + n]})

        def close(self) -> None:
            pass

    landing = tmp_path / "tws_landing"
    landing.mkdir()
    pd.DataFrame({"user_id": [1, 1, 2]}).to_json(
        landing / "a.json", orient="records", lines=True)
    stream = spark.readStream.schema("user_id long").json(str(landing))
    out = (stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningCount(),
        outputStructType="user_id long, n long",
        outputMode="Update", timeMode="None"))
    emitted = []
    q = (out.writeStream
         .foreachBatch(lambda df, _id: emitted.extend(df.collect()))
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert {(r.user_id, r.n) for r in emitted} == {(1, 2), (2, 1)}
