"""Unit tests for the temporal operators (as-of join, bounded range
join) on literal frames, pinning the edge semantics the registry
query can't isolate: ties, no-match NULLs, window boundaries, and
bucket-crossing pairs."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.operators.temporal import (
    asof_join,
    range_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00")),
         (2, 10, _ts("2024-01-01 10:05:00")),
         (3, 20, _ts("2024-01-01 09:00:00")),   # before any right row
         (4, 30, _ts("2024-01-01 12:00:00"))],  # key with no right rows
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 09:55:00"), "a"),
         (10, _ts("2024-01-01 10:00:00"), "b"),   # tie with left event 1
         (10, _ts("2024-01-01 10:01:00"), "c"),
         (20, _ts("2024-01-01 09:30:00"), "d")],
        "user_id long, rts timestamp, tag string")
    return left, right


def test_asof_join_picks_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["user_id"], left_ts="ts",
                    right_ts="rts", right_cols=["tag"])
    got = {r.event_id: r.tag for r in out.collect()}
    # event 1: tie at 10:00 matches (<= semantics); event 2 takes the
    # 10:01 row, not an earlier one; events 3 and 4 have no match.
    assert got == {1: "b", 2: "c", 3: None, 4: None}
    assert out.count() == left.count()


def test_asof_join_carries_matched_timestamp(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on=["user_id"], left_ts="ts",
                    right_ts="rts", right_cols=["tag"])
    row = {r.event_id: r for r in out.collect()}
    assert row[2].rts == _ts("2024-01-01 10:01:00")
    assert row[3].rts is None


def test_asof_join_preserves_extra_left_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left.withColumn("payload", F.col("event_id") * 2),
                    right, on=["user_id"], left_ts="ts",
                    right_ts="rts", right_cols=["tag"])
    assert {(r.event_id, r.payload) for r in out.collect()} == \
        {(1, 2), (2, 4), (3, 6), (4, 8)}


def test_range_join_inclusive_bounds_and_bucket_crossing(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:10:00"))],
        "purchase_id long, user_id long, pts timestamp")
    right = spark.createDataFrame(
        # deltas vs left: 600s (boundary, in), 599s (in, crosses the
        # bucket edge at 10:00), 0s (boundary, in), 601s (out),
        # -1s (future, out)
        [(100, 10, _ts("2024-01-01 10:00:00")),
         (101, 10, _ts("2024-01-01 10:00:01")),
         (102, 10, _ts("2024-01-01 10:10:00")),
         (103, 10, _ts("2024-01-01 09:59:59")),
         (104, 10, _ts("2024-01-01 10:10:01"))],
        "click_id long, user_id long, cts timestamp")
    out = range_join(left, right, on=["user_id"], left_ts="pts",
                     right_ts="cts", window_seconds=600)
    assert {r.click_id for r in out.collect()} == {100, 101, 102}


def test_range_join_respects_key(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:10:00"))],
        "purchase_id long, user_id long, pts timestamp")
    right = spark.createDataFrame(
        [(100, 99, _ts("2024-01-01 10:09:00"))],
        "click_id long, user_id long, cts timestamp")
    out = range_join(left, right, on=["user_id"], left_ts="pts",
                     right_ts="cts", window_seconds=600)
    assert out.count() == 0


def test_asof_join_matches_naive_quadratic_reference(spark):
    # Randomized cross-check: window-over-union implementation vs the
    # obvious per-row max(right_ts <= left_ts) definition.
    import random
    random.seed(11)
    base = 1_700_000_000
    left = [(i, random.randrange(3), base + random.randrange(0, 3600))
            for i in range(40)]
    right = [(100 + j, random.randrange(3), base + random.randrange(0, 3600))
             for j in range(40)]
    # unique (key, ts) on the right, as the contract requires
    seen, rdedup = set(), []
    for rid, k, ts in right:
        if (k, ts) not in seen:
            seen.add((k, ts))
            rdedup.append((rid, k, ts))

    ldf = spark.createDataFrame(
        [(i, k, datetime.fromtimestamp(ts)) for i, k, ts in left],
        "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(
        [(rid, k, datetime.fromtimestamp(ts)) for rid, k, ts in rdedup],
        "rid long, user_id long, rts timestamp")
    out = {r.event_id: r.rid for r in
           asof_join(ldf, rdf, on=["user_id"], left_ts="ts",
                     right_ts="rts", right_cols=["rid"]).collect()}

    for i, k, ts in left:
        matches = [(rts, rid) for rid, rk, rts in rdedup
                   if rk == k and rts <= ts]
        want = max(matches)[1] if matches else None
        assert out[i] == want, (i, k, ts, out[i], want)


def test_range_join_matches_naive_quadratic_reference(spark):
    import random
    random.seed(13)
    base = 1_700_000_000
    left = [(i, random.randrange(2), base + random.randrange(0, 4000))
            for i in range(30)]
    right = [(100 + j, random.randrange(2), base + random.randrange(0, 4000))
             for j in range(30)]
    win = 600
    ldf = spark.createDataFrame(
        [(i, k, datetime.fromtimestamp(ts)) for i, k, ts in left],
        "lid long, user_id long, lts timestamp")
    rdf = spark.createDataFrame(
        [(j, k, datetime.fromtimestamp(ts)) for j, k, ts in right],
        "rid long, user_id long, rts timestamp")
    got = {(r.lid, r.rid) for r in
           range_join(ldf, rdf, on=["user_id"], left_ts="lts",
                      right_ts="rts", window_seconds=win).collect()}
    want = {(i, j) for i, lk, lts in left for j, rk, rts in right
            if lk == rk and 0 <= lts - rts <= win}
    assert got == want


def test_anomaly_days_integer_boundary(spark, tmp_path):
    """A spike > 2 sigma over the trailing-week baseline flags; a flat
    series never does; the decision is the integer inequality, not a
    float compare."""
    import datetime as dt

    from engagement_data_pipeline_spark.queries.temporal_q import (
        events_anomaly_days)

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    for day in range(10):
        n = 100 if day < 9 else 250   # big spike on the last day
        for _ in range(n):
            rows.append((eid, eid % 7, base + dt.timedelta(days=day),
                         "visit", 1.0))
            eid += 1
    for day in range(10):             # a flat control series
        for _ in range(50):
            rows.append((eid, eid % 7, base + dt.timedelta(days=day),
                         "flat", 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double")
    path = str(tmp_path / "ev")
    df.write.parquet(path + "/events.parquet")
    out = events_anomaly_days(spark, path).collect()
    spikes = [r for r in out if r["is_anomaly"]]
    assert [(r["event_type"], r["n_events"]) for r in spikes] == [
        ("visit", 250)]
    flat = [r for r in out if r["event_type"] == "flat"]
    assert flat and all(not r["is_anomaly"] for r in flat)
    assert all(r["z"] is None for r in flat)  # zero variance baseline
