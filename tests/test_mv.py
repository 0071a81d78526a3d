"""Incremental materialized views (streaming/mv.py): refresh from the
change feed must equal a from-scratch recompute after any mix of
inserts, updates, rewrite deletes and dv deletes — including NULL sum
semantics and group disappearance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.streaming import ingest as ing
from engagement_data_pipeline_spark.streaming import mv as MV

GROUP = ["grp"]
METRICS = {"n_vals": ("val", "count"), "total": ("val", "sum")}


def _rows(spark, triples):
    return spark.createDataFrame(
        [(o, g, v) for o, g, v in triples],
        "origin string, grp string, val long")


def _recompute(spark, path):
    return {tuple(r) for r in
            (ing.read_merged_table(spark, path)
             .groupBy("grp")
             .agg(F.count("val").alias("n_vals"),
                  F.sum("val").alias("total"))).collect()}


def _mv(spark, mv_path):
    return {tuple(r) for r in
            MV.read_mv(spark, mv_path, METRICS)
            .select("grp", "n_vals", "total").collect()}


def test_mv_matches_recompute_through_mixed_workload(spark, tmp_path):
    path, mvp = str(tmp_path / "t"), str(tmp_path / "mv")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=4,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(_rows(spark, [("o1", "a", 10), ("o2", "a", 20),
                        ("o3", "b", 5), ("o4", "c", None)]), 1)
    MV.create_mv(spark, path, mvp, GROUP, METRICS, n_buckets=2)
    assert _mv(spark, mvp) == _recompute(spark, path)
    # c has one row with NULL val: count 0, sum NULL
    assert ("c", 0, None) in _mv(spark, mvp)

    # inserts + an update that MOVES o3 from b to... (groups are
    # payload here: an update changes val, group stays)
    merge(_rows(spark, [("o5", "b", 7), ("o2", "a", 25)]), 2)
    assert MV.refresh_mv(spark, path, mvp, GROUP, METRICS) is not None
    assert _mv(spark, mvp) == _recompute(spark, path)

    # dv delete (no data rewrite) + rewrite delete, one refresh
    ing.delete_origins(spark, path,
                       spark.createDataFrame([("o1",)], "origin string"),
                       strategy="dv")
    ing.delete_origins(spark, path,
                       spark.createDataFrame([("o3",)], "origin string"),
                       strategy="rewrite")
    MV.refresh_mv(spark, path, mvp, GROUP, METRICS)
    assert _mv(spark, mvp) == _recompute(spark, path)

    # already current: no-op
    assert MV.refresh_mv(spark, path, mvp, GROUP, METRICS) is None


def test_mv_group_disappears_and_sum_returns_to_null(spark, tmp_path):
    path, mvp = str(tmp_path / "t"), str(tmp_path / "mv")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(_rows(spark, [("o1", "a", 1), ("o2", "b", 2),
                        ("o3", "b", None)]), 1)
    MV.create_mv(spark, path, mvp, GROUP, METRICS, n_buckets=2)

    # delete group a's only row: the group must LEAVE the MV
    ing.delete_origins(spark, path,
                       spark.createDataFrame([("o1",)], "origin string"),
                       strategy="dv")
    MV.refresh_mv(spark, path, mvp, GROUP, METRICS)
    assert _mv(spark, mvp) == _recompute(spark, path)
    assert not any(g == "a" for g, *_ in _mv(spark, mvp))

    # delete b's only NON-NULL contributor: sum must read NULL again
    ing.delete_origins(spark, path,
                       spark.createDataFrame([("o2",)], "origin string"))
    MV.refresh_mv(spark, path, mvp, GROUP, METRICS)
    assert _mv(spark, mvp) == _recompute(spark, path)
    assert ("b", 0, None) in _mv(spark, mvp)


def test_mv_update_moves_value_between_groups(spark, tmp_path):
    """latest_wins update that changes the GROUP column: the old
    group's contribution must move wholesale to the new group."""
    path, mvp = str(tmp_path / "t"), str(tmp_path / "mv")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(_rows(spark, [("o1", "a", 10), ("o2", "b", 1)]), 1)
    MV.create_mv(spark, path, mvp, GROUP, METRICS, n_buckets=2)
    merge(_rows(spark, [("o1", "b", 10)]), 2)  # a -> b
    MV.refresh_mv(spark, path, mvp, GROUP, METRICS)
    assert _mv(spark, mvp) == _recompute(spark, path)
    got = dict((g, (n, t)) for g, n, t in _mv(spark, mvp))
    assert "a" not in got and got["b"] == (2, 11)


def test_mv_rejects_min_max_without_group_bucketing(spark, tmp_path):
    """min/max need group-local recompute, which needs the source
    bucketed on the group columns — a key-bucketed table must fail
    loudly at create."""
    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2)
    merge(_rows(spark, [("o1", "a", 1)]), 1)
    with pytest.raises(ValueError, match="bucketed on the group"):
        MV.create_mv(spark, path, str(tmp_path / "mv"),
                     GROUP, {"m": ("val", "max")})


def test_mv_min_max_group_local_recompute(spark, tmp_path):
    """With the source bucketed ON THE GROUP COLUMN, min/max maintain
    by recomputing only the affected groups: deleting a group's
    maximum must re-derive the next one, untouched groups never read."""
    path, mvp = str(tmp_path / "t"), str(tmp_path / "mv")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins",
                                     bucket_cols=["grp"])
    merge(_rows(spark, [("o1", "a", 10), ("o2", "a", 3),
                        ("o3", "b", 7), ("o4", "b", 9)]), 1)
    metrics = {"lo": ("val", "min"), "hi": ("val", "max"),
               "total": ("val", "sum")}
    MV.create_mv(spark, path, mvp, GROUP, metrics, n_buckets=2)

    def mv():
        return {tuple(r) for r in MV.read_mv(spark, mvp, metrics)
                .select("grp", "lo", "hi", "total").collect()}

    def recompute():
        return {tuple(r) for r in
                (ing.read_merged_table(spark, path).groupBy("grp")
                 .agg(F.min("val").alias("lo"), F.max("val").alias("hi"),
                      F.sum("val").alias("total"))).collect()}

    assert mv() == recompute() == {("a", 3, 10, 13), ("b", 7, 9, 16)}
    # delete group a's MAX (the un-invertible case) via dv — keys for
    # a grp-bucketed table must carry the bucket column
    ing.delete_origins(spark, path,
                       spark.createDataFrame([("o1", "a")],
                                             "origin string, grp string"),
                       strategy="dv")
    MV.refresh_mv(spark, path, mvp, GROUP, metrics)
    assert mv() == recompute() == {("a", 3, 3, 3), ("b", 7, 9, 16)}
    # update b's max upward, then delete the whole group
    merge(_rows(spark, [("o4", "b", 20)]), 2)
    MV.refresh_mv(spark, path, mvp, GROUP, metrics)
    assert mv() == recompute() == {("a", 3, 3, 3), ("b", 7, 20, 27)}
    ing.delete_origins(spark, path, spark.createDataFrame(
        [("o3", "b"), ("o4", "b")], "origin string, grp string"))
    MV.refresh_mv(spark, path, mvp, GROUP, metrics)
    assert mv() == recompute() == {("a", 3, 3, 3)}
    assert MV.refresh_mv(spark, path, mvp, GROUP, metrics) is None


def test_mv_stream_maintained(spark, tmp_path):
    """refresh_mv as the post-batch hook of a REAL stream: after the
    availableNow run drains, the MV equals the recompute — the
    composition a production deployment runs (ingest stream + MV
    maintenance actor)."""
    import os

    from engagement_data_pipeline_spark.streaming.ingest import (
        foreach_batch_upsert, stream_csv_source)

    landing = tmp_path / "landing"
    landing.mkdir()
    for fname, rows in (("a.csv", [("s1", "hello", "2024-01-01 00:00:00"),
                                   ("s2", "there", "2024-01-01 00:01:00")]),
                        ("b.csv", [("s1", "again", "2024-01-01 00:02:00"),
                                   ("s1", "hello", "2024-01-01 00:00:00")])):
        with open(landing / fname, "w") as f:
            f.write("Sender,Message,ReceivedOn\n")
            for s, m, t in rows:
                f.write(f"{s},{m},{t}\n")

    path = str(tmp_path / "t")
    mvp = str(tmp_path / "mv")

    def _tx(b):
        return b.select(
            F.concat_ws("|", "Sender", "Message", "ReceivedOn")
            .alias("origin"),
            F.col("Sender").alias("grp"),
            F.length("Message").cast("long").alias("val"))

    base = foreach_batch_upsert(path, ["origin"], transform=_tx,
                                n_buckets=2, txn_app_id="s")
    created = []

    def _merge_then_refresh(batch, batch_id):
        base(batch, batch_id)
        if not created:
            MV.create_mv(spark, path, mvp, GROUP, METRICS, n_buckets=2)
            created.append(True)
        else:
            MV.refresh_mv(spark, path, mvp, GROUP, METRICS)

    q = (stream_csv_source(spark, str(landing), max_files_per_trigger=1)
         .writeStream.foreachBatch(_merge_then_refresh)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    assert _mv(spark, mvp) == _recompute(spark, path)


def test_mv_after_schema_evolution_on_dv_bucket(spark, tmp_path):
    """A schema-evolving merge into a dv-carrying bucket: the dv
    anti-join keys on origin columns only, so evolution and deletion
    vectors compose; the MV refresh sees the evolved rows too."""
    path, mvp = str(tmp_path / "t"), str(tmp_path / "mv")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=1,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(_rows(spark, [("o1", "a", 1), ("o2", "a", 2)]), 1)
    MV.create_mv(spark, path, mvp, GROUP, METRICS, n_buckets=1)
    ing.delete_origins(spark, path,
                       spark.createDataFrame([("o1",)], "origin string"),
                       strategy="dv")
    # evolved batch adds a column; lands in the dv-carrying bucket
    merge(spark.createDataFrame([("o3", "a", 3, "x")],
                                "origin string, grp string, val long, "
                                "extra string"), 2)
    MV.refresh_mv(spark, path, mvp, GROUP, METRICS)
    assert _mv(spark, mvp) == _recompute(spark, path)
    got = dict((g, (n, t)) for g, n, t in _mv(spark, mvp))
    assert got["a"] == (2, 5)  # o1 gone, o2 + o3 live


def test_mv_random_op_sequence_matches_recompute(spark, tmp_path):
    """Model check for the MV: random interleavings of inserts,
    latest-wins updates, dv deletes and rewrite deletes, refreshing
    the view after every commit — the maintained state must equal a
    from-scratch recompute at every step (the delta fold never sees
    the table, so any missed old-payload subtraction or double-count
    shows up here)."""
    import random

    rng = random.Random(43)
    path, mvp = str(tmp_path / "t"), str(tmp_path / "mv")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=4,
                                     txn_app_id="src",
                                     mode="latest_wins")
    keys = [f"o{i}" for i in range(24)]
    groups = ["a", "b", "c", "d"]
    live: set[str] = set()
    batch_id = 0

    def _mk(n):
        ks = rng.sample(keys, n)
        return [(k, rng.choice(groups),
                 rng.choice([None, rng.randrange(100)])) for k in ks]

    merge(_rows(spark, _mk(8)), batch_id)
    live |= {k for k in keys}  # superset ok; only used to pick deletes
    MV.create_mv(spark, path, mvp, GROUP, METRICS, n_buckets=2)

    for step in range(8):
        batch_id += 1
        op = rng.choice(["upsert", "upsert", "dv_delete", "delete"])
        if op == "upsert":
            merge(_rows(spark, _mk(5)), batch_id)
        else:
            present = [r.origin for r in
                       ing.read_merged_table(spark, path)
                       .select("origin").collect()]
            if not present:
                continue
            dead = rng.sample(present, min(3, len(present)))
            ing.delete_origins(
                spark, path,
                spark.createDataFrame([(k,) for k in dead],
                                      "origin string"),
                strategy="dv" if op == "dv_delete" else "rewrite")
        MV.refresh_mv(spark, path, mvp, GROUP, METRICS)
        assert _mv(spark, mvp) == _recompute(spark, path), f"step {step}"


def test_mv_maintained_by_retract_stream(spark, tmp_path):
    """The push-based composition: subscribe to the table's retract
    stream (includeOld=true) and maintain the MV from the streamed
    batches alone — zero reads of the source table — then verify
    against the recompute."""
    import time

    from engagement_data_pipeline_spark.streaming.cdf_source import (
        MergeTableChangesDataSource)

    spark.dataSource.register(MergeTableChangesDataSource)
    path, mvp = str(tmp_path / "t"), str(tmp_path / "mv")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(_rows(spark, [("o1", "a", 10), ("o2", "b", 5),
                        ("o3", "b", None)]), 1)
    merge(_rows(spark, [("o1", "a", 11), ("o4", "c", 7)]), 2)
    ing.delete_origins(spark, path,
                       spark.createDataFrame([("o2",)], "origin string"),
                       strategy="dv")

    q = (spark.readStream.format("merge_table_changes")
         .option("path", path).option("includeOld", "true").load()
         .writeStream.foreachBatch(
             MV.mv_stream_sink(mvp, GROUP, METRICS))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
            time.sleep(0.2)
        assert _mv(spark, mvp) == _recompute(spark, path)
        # keep following: one more live commit
        merge(_rows(spark, [("o5", "a", 1)]), 3)
        deadline = time.time() + 90
        while time.time() < deadline:
            q.processAllAvailable()
            if not q.status["isDataAvailable"]:
                break
            time.sleep(0.2)
        assert _mv(spark, mvp) == _recompute(spark, path)
    finally:
        q.stop()
