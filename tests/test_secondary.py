"""Secondary value index over the merge table: feed-driven refresh
must equal rebuild-from-scratch, and value lookups must stay O(one
bucket) via partial-key bucketing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.streaming import ingest as ing
from engagement_data_pipeline_spark.streaming.secondary import (
    build_value_index, lookup_by_value, refresh_value_index)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "origin string, user string")


def _postings(spark, idx):
    return {(r.user, r.origin)
            for r in ing.read_merged_table(spark, idx).collect()}


def test_refresh_equals_rebuild(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    merge = ing.foreach_batch_upsert(src, ["origin"], n_buckets=4)
    merge(_batch(spark, [(f"m{i}", f"u{i % 3}") for i in range(9)]), 0)
    build_value_index(spark, src, idx, "user", n_buckets=4)
    assert _postings(spark, idx) == {(f"u{i % 3}", f"m{i}")
                                     for i in range(9)}

    # source evolves: new rows (one replayed key must not dup), then
    # a GDPR delete of two keys
    merge(_batch(spark, [("m0", "uX"),  # replay: existing-wins, no-op
                         ("m9", "u0"), ("m10", "u9")]), 1)
    ing.delete_origins(spark, src, spark.createDataFrame(
        [("m1",), ("m9",)], "origin string"))

    applied = refresh_value_index(spark, src, idx, "user")
    assert applied == ing.read_table_manifest(spark, src)["commit"]

    # feed-driven index == index rebuilt from the current snapshot
    idx2 = str(tmp_path / "idx2")
    build_value_index(spark, src, idx2, "user", n_buckets=4)
    assert _postings(spark, idx) == _postings(spark, idx2)
    # and the replayed m0 kept its ORIGINAL value posting
    assert ("u0", "m0") in _postings(spark, idx)
    assert ("uX", "m0") not in _postings(spark, idx)

    # already current: refresh is a no-op
    assert refresh_value_index(spark, src, idx, "user") is None


def test_value_lookup_single_bucket(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    merge = ing.foreach_batch_upsert(src, ["origin"], n_buckets=4)
    merge(_batch(spark, [(f"m{i}", f"u{i % 5}") for i in range(50)]), 0)
    build_value_index(spark, src, idx, "user", n_buckets=8)

    hit = lookup_by_value(spark, idx, "u2")
    assert {r.origin for r in hit.collect()} == {
        f"m{i}" for i in range(50) if i % 5 == 2}
    # ALL postings of one value share one bucket: single-directory scan
    files = {r[0] for r in hit.select(F.input_file_name()).collect()}
    dirs = {f.rsplit("/", 2)[-2] for f in files}
    assert len(dirs) == 1 and next(iter(dirs)).startswith("bucket=")

    # full-key lookup still works on the subset-bucketed table
    [row] = ing.lookup_origin(spark, idx, ["u2", "m2"]).collect()
    assert row.origin == "m2"


def test_bucket_on_carried_through_maintenance(spark, tmp_path):
    """compact/rebucket/clone must preserve partial-key bucketing —
    dropping `bucket_on` would silently re-bucket on the full key and
    break O(one bucket) value lookups."""
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    merge = ing.foreach_batch_upsert(src, ["origin"], n_buckets=2)
    merge(_batch(spark, [(f"m{i}", f"u{i % 4}") for i in range(20)]), 0)
    build_value_index(spark, src, idx, "user", n_buckets=4)

    ing.compact_table(spark, idx)
    ing.rebucket_table(spark, idx, 8)
    clone = str(tmp_path / "clone")
    ing.clone_table(spark, idx, clone)
    for path in (idx, clone):
        man = ing.read_table_manifest(spark, path)
        assert man["bucket_on"] == ["user"]
        hit = lookup_by_value(spark, path, "u1")
        assert {r.origin for r in hit.collect()} == {
            f"m{i}" for i in range(20) if i % 4 == 1}
        files = {r[0] for r in hit.select(F.input_file_name()).collect()}
        assert len({f.rsplit("/", 2)[-2] for f in files}) == 1


# --- latest-wins merge mode (MERGE WHEN MATCHED UPDATE) -------------------

def test_latest_wins_updates_and_cdf(spark, tmp_path):
    import pytest

    src = str(tmp_path / "src")
    # guard: updates without a replay watermark are rejected
    with pytest.raises(ValueError):
        ing.foreach_batch_upsert(src, ["origin"], mode="latest_wins")

    merge = ing.foreach_batch_upsert(src, ["origin"], n_buckets=4,
                                     mode="latest_wins", txn_app_id="s")
    merge(_batch(spark, [("m1", "u1"), ("m2", "u2")]), 0)
    merge(_batch(spark, [("m1", "u9"), ("m3", "u3")]), 1)
    rows = {r.origin: r.user
            for r in ing.read_merged_table(spark, src).collect()}
    assert rows == {"m1": "u9", "m2": "u2", "m3": "u3"}
    # the change feed reports the payload change as an update
    ch = {(r.origin, r.op): r.user
          for r in ing.table_changes(spark, src, 1, 2).collect()}
    assert ch == {("m1", "update"): "u9", ("m3", "insert"): "u3"}
    [upd] = [r for r in ing.table_changes(spark, src, 1, 2).collect()
             if r.op == "update"]
    assert upd.changed_cols == "user"
    # checkpoint replay of batch 1 must NOT clobber the newer payload
    merge(_batch(spark, [("m1", "u1")]), 0)
    assert {r.user for r in
            ing.lookup_origin(spark, src, ["m1"]).collect()} == {"u9"}


def test_index_follows_value_update(spark, tmp_path):
    """The previously-dead 'update' removal path: a latest-wins source
    changes a row's value; refresh must MOVE the posting (old value
    removed, new value added) and match a fresh rebuild."""
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    merge = ing.foreach_batch_upsert(src, ["origin"], n_buckets=4,
                                     mode="latest_wins", txn_app_id="s")
    merge(_batch(spark, [("m1", "u1"), ("m2", "u2"), ("m3", "u1")]), 0)
    build_value_index(spark, src, idx, "user", n_buckets=4)
    assert _postings(spark, idx) == {("u1", "m1"), ("u2", "m2"),
                                     ("u1", "m3")}
    merge(_batch(spark, [("m1", "u7")]), 1)  # value change
    refresh_value_index(spark, src, idx, "user")
    assert _postings(spark, idx) == {("u7", "m1"), ("u2", "m2"),
                                     ("u1", "m3")}
    idx2 = str(tmp_path / "idx2")
    build_value_index(spark, src, idx2, "user", n_buckets=4)
    assert _postings(spark, idx) == _postings(spark, idx2)


def test_stream_maintained_index(spark, tmp_path):
    """End-to-end: a live stream merges micro-batches into the table
    and refreshes the value index INSIDE the same foreachBatch — the
    index tracks the table commit-for-commit and ends equal to a
    fresh rebuild."""
    import pandas as pd

    from engagement_data_pipeline_spark.streaming.ingest import (
        stream_csv_source)

    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    landing = tmp_path / "landing"
    landing.mkdir()
    for part, keys in ((0, range(0, 6)), (1, range(4, 10))):  # overlap
        pd.DataFrame(
            [(f"m{k}", f"u{k % 3}", "x") for k in keys],
            columns=["Sender", "Message", "ReceivedOn"]).to_csv(
            landing / f"{part}.csv", index=False)

    merge = ing.foreach_batch_upsert(
        src, ["origin"], n_buckets=4, txn_app_id="s",
        transform=lambda b: b.select(
            F.col("Sender").alias("origin"),
            F.col("Message").alias("user")))

    def merge_and_index(batch, batch_id):
        merge(batch, batch_id)
        if ing.read_table_manifest(spark, idx) is None:
            build_value_index(spark, src, idx, "user", n_buckets=4)
        else:
            refresh_value_index(spark, src, idx, "user")

    q = (stream_csv_source(spark, str(landing), max_files_per_trigger=1)
         .writeStream.foreachBatch(merge_and_index)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    idx2 = str(tmp_path / "idx2")
    build_value_index(spark, src, idx2, "user", n_buckets=4)
    assert _postings(spark, idx) == _postings(spark, idx2)
    assert _postings(spark, idx) == {(f"u{k % 3}", f"m{k}")
                                     for k in range(10)}


def test_refresh_across_compaction(spark, tmp_path):
    """A compaction between refreshes rewrites every bucket without
    changing logical rows — the keyed change feed must see through it
    and the refresh must still equal a rebuild."""
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    merge = ing.foreach_batch_upsert(src, ["origin"], n_buckets=4)
    merge(_batch(spark, [(f"m{i}", f"u{i % 3}") for i in range(9)]), 0)
    build_value_index(spark, src, idx, "user", n_buckets=4)

    merge(_batch(spark, [("m9", "u0")]), 1)
    ing.compact_table(spark, src, vacuum=False)
    ing.delete_origins(spark, src, spark.createDataFrame(
        [("m2",)], "origin string"))
    refresh_value_index(spark, src, idx, "user")

    idx2 = str(tmp_path / "idx2")
    build_value_index(spark, src, idx2, "user", n_buckets=4)
    assert _postings(spark, idx) == _postings(spark, idx2)
    assert ("u2", "m2") not in _postings(spark, idx)
    assert ("u0", "m9") in _postings(spark, idx)
