"""Round-8 hardening: mv_stream_sink replay convergence, O(touched
groups) MV refresh, nested/timestamp payloads through the streaming
change feed, loud failure on vacuumed change windows, and monotone
stream offsets."""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.streaming import cdf_source as cdf
from engagement_data_pipeline_spark.streaming import ingest as ing
from engagement_data_pipeline_spark.streaming import mv as MV
from engagement_data_pipeline_spark.streaming.cdf_source import (
    MergeTableChangesDataSource)

GROUP = ["grp"]
METRICS = {"n_vals": ("val", "count"), "total": ("val", "sum")}


def _drain(q, seconds=90):
    deadline = time.time() + seconds
    while time.time() < deadline:
        q.processAllAvailable()
        if not q.status["isDataAvailable"]:
            return
        time.sleep(0.2)


def test_mv_stream_sink_replayed_batch_cannot_delete_groups(
        spark, tmp_path):
    """foreachBatch crash-replay of an already-folded batch: without
    the fold-level watermark guard, the delete step re-applies the
    delta against the POST-fold state and drives a live group's
    __mv_n to 0 — permanent wrong deletion. The replay must be a
    complete no-op."""
    mvp = str(tmp_path / "mv")
    fold = MV.mv_stream_sink(mvp, GROUP, METRICS)
    retract = ("grp string, val long, op string, changed_cols string, "
               "grp__old string, val__old long")
    b0 = spark.createDataFrame(
        [("a", 10, "insert", "", None, None),
         ("a", 20, "insert", "", None, None)], retract)
    fold(b0, 0)
    b1 = spark.createDataFrame(
        [(None, None, "delete", "", "a", 10)], retract)
    fold(b1, 1)
    want = {("a", 1, 20)}
    got = lambda: {tuple(r) for r in MV.read_mv(spark, mvp, METRICS)
                   .select("grp", "n_vals", "total").collect()}
    assert got() == want
    fold(b1, 1)  # crash-replay: same batch id, state already folded
    assert got() == want, "replayed delete corrupted the MV state"
    fold(b0, 0)  # much older replay: equally a no-op
    assert got() == want


def test_mv_refresh_rewrites_only_touched_buckets(spark, tmp_path,
                                                  monkeypatch):
    """The delta fold joins state in from the delta side, so a
    refresh touching one group must version-bump ONLY that group's
    MV bucket — the manifest is the witness. Forces the DISTRIBUTED
    fold (bounded deltas take the driver-side local fold since r14,
    whose state read is pyarrow-side — its equality twin lives in
    test_local_merge); this test pins the engine path's shape."""
    monkeypatch.setattr(MV, "_LOCAL_FOLD_MAX", 0)
    path, mvp = str(tmp_path / "t"), str(tmp_path / "mv")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    groups = [f"g{i}" for i in range(16)]
    merge(spark.createDataFrame(
        [(f"o{i}", g, i) for i, g in enumerate(groups)],
        "origin string, grp string, val long"), 1)
    MV.create_mv(spark, path, mvp, GROUP, METRICS, n_buckets=8)
    before = ing.read_table_manifest(spark, mvp)["buckets"]
    assert len(before) > 1, "fixture must spread groups over buckets"

    merge(spark.createDataFrame([("o0", "g0", 100)],
                                "origin string, grp string, val long"), 2)
    # spy on the state READ: the fold must scan only the delta's hit
    # buckets, never the whole MV state
    reads: list[list[int]] = []
    orig_rr = ing._read_resolved

    def _spy(spark_, table_path_, man_, only=None, **kw):
        if table_path_ == mvp:
            reads.append(sorted(only or []))
        return orig_rr(spark_, table_path_, man_, only=only, **kw)

    ing._read_resolved = _spy
    try:
        MV.refresh_mv(spark, path, mvp, GROUP, METRICS)
    finally:
        ing._read_resolved = orig_rr
    after = ing.read_table_manifest(spark, mvp)["buckets"]
    changed = {b for b in set(before) | set(after)
               if before.get(b) != after.get(b)}
    expect = {r[0] for r in
              spark.createDataFrame([("g0",)], "grp string")
              .select(ing.origin_bucket(["grp"], 8).alias("b"))
              .collect()}
    assert changed == expect, (
        f"refresh rewrote buckets {sorted(changed)}, expected only "
        f"{sorted(expect)} (g0's bucket)")
    assert sorted(expect) in reads, (
        f"state fold read buckets {reads}, expected a read of exactly "
        f"{sorted(expect)}")
    assert all(len(r) <= len(expect) for r in reads), (
        f"state fold scanned more than the hit buckets: {reads}")
    # and the fold is still correct
    got = {tuple(r) for r in MV.read_mv(spark, mvp, METRICS)
           .select("grp", "n_vals", "total").collect()}
    want = {tuple(r) for r in
            ing.read_merged_table(spark, path).groupBy("grp")
            .agg(F.count("val").alias("n"),
                 F.sum("val").alias("t")).collect()}
    assert got == want


def test_changes_stream_nested_and_timestamp_payload(spark, tmp_path):
    """The flagship messages shape — labels array<struct> plus a
    timestamp — through format('merge_table_changes'): nested schema
    inference, Arrow-batch emission, and the normalized nested diff
    (changed_cols flags labels only when the array actually
    changed)."""
    spark.dataSource.register(MergeTableChangesDataSource)
    path = str(tmp_path / "t")
    schema = ("origin string, ts timestamp, n long, "
              "labels array<struct<scheme:string,code:string>>")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(spark.createDataFrame(
        [("a", t0, 1, [("gender", "man")]),
         ("b", t0, 2, [("gender", "woman"), ("age", "25")])],
        schema), 1)

    got: list[tuple] = []

    def _sink(df, _bid):
        got.extend(
            (r.origin, r.op, r.changed_cols, r.ts, r.n,
             None if r.labels is None else [tuple(l) for l in r.labels],
             None if r.labels__old is None else
             [tuple(l) for l in r.labels__old])
            for r in df.collect())

    q = (spark.readStream.format("merge_table_changes")
         .option("path", path).option("includeOld", "true").load()
         .writeStream.foreachBatch(_sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        _drain(q)
        assert sorted(got) == [
            ("a", "insert", "", t0, 1, [("gender", "man")], None),
            ("b", "insert", "", t0, 2,
             [("gender", "woman"), ("age", "25")], None)]
        got.clear()
        # relabel a (nested change), touch b with IDENTICAL payload
        # (must not emit), insert c, dv-delete nothing yet
        merge(spark.createDataFrame(
            [("a", t0, 1, [("gender", "man"), ("zone", "z1")]),
             ("b", t0, 2, [("gender", "woman"), ("age", "25")]),
             ("c", t0, 3, [])], schema), 2)
        ing.delete_origins(spark, path,
                           spark.createDataFrame([("b",)],
                                                 "origin string"),
                           strategy="dv")
        _drain(q)
        assert sorted(got) == [
            ("a", "update", "labels", t0, 1,
             [("gender", "man"), ("zone", "z1")], [("gender", "man")]),
            ("b", "delete", "", None, None, None,
             [("gender", "woman"), ("age", "25")]),
            ("c", "insert", "", t0, 3, [], None)]
    finally:
        q.stop()


def test_changes_reader_raises_on_vacuumed_window(spark, tmp_path):
    """A manifest-referenced bucket directory that vacuum reclaimed
    must fail loudly (Delta-CDF-after-VACUUM semantics), never read
    empty — an empty old side would silently turn updates into
    inserts and swallow deletes."""
    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=1,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(spark.createDataFrame([("a", "1")],
                                "origin string, payload string"), 1)
    merge(spark.createDataFrame([("a", "2")],
                                "origin string, payload string"), 2)
    ing.vacuum_table(spark, path, keep_manifests=10)  # reclaims v1
    man1 = cdf._manifest(path, 1)
    man2 = cdf._manifest(path, 2)
    assert man1 is not None and man2 is not None
    with pytest.raises(RuntimeError, match="vacuum"):
        cdf._read_bucket(path, man1, 0, ["origin", "payload"])
    # the new side (latest commit) still reads fine
    assert len(cdf._read_bucket(path, man2, 0,
                                ["origin", "payload"])) == 1
    # a bucket the manifest never placed legitimately reads empty
    assert len(cdf._read_bucket(path, man2, 7,
                                ["origin", "payload"])) == 0


def test_latest_offset_never_regresses(spark, tmp_path, monkeypatch):
    """A transient listing failure (or pruned log) must not move the
    offset below what the engine already planned against."""
    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=1)
    merge(spark.createDataFrame([("a", "1")],
                                "origin string, payload string"), 1)
    merge(spark.createDataFrame([("b", "1")],
                                "origin string, payload string"), 2)
    r = cdf._ChangesReader(path, 0, ["origin", "payload"], None)
    assert r.latestOffset() == {"commit": 2}
    monkeypatch.setattr(cdf, "_latest_commit",
                        lambda p, floor=None: None)
    assert r.latestOffset() == {"commit": 2}, "offset regressed"
    monkeypatch.setattr(cdf, "_latest_commit", lambda p, floor=None: 1)
    assert r.latestOffset() == {"commit": 2}, "offset regressed"


def test_fs_path_resolves_schemes(tmp_path):
    """pyarrow.fs resolution: plain and file:// paths land on the
    local filesystem with the scheme stripped — the same helper
    routes object-store URIs, so the source is storage-agnostic."""
    from pyarrow import fs as pafs

    f1, p1 = cdf._fs_path(str(tmp_path))
    assert isinstance(f1, pafs.LocalFileSystem) and p1 == str(tmp_path)
    f2, p2 = cdf._fs_path(f"file://{tmp_path}")
    assert isinstance(f2, pafs.LocalFileSystem) and p2 == str(tmp_path)


def test_index_stream_sink_moves_and_replays(spark, tmp_path):
    """Push-based index maintenance from retract batches: a value
    move removes the old posting and adds the new; an unchanged-value
    update round-trips nothing; a crash-replay of an applied batch is
    a complete no-op (watermark guards remove + add together)."""
    from engagement_data_pipeline_spark.streaming.secondary import (
        index_stream_sink)

    idx = str(tmp_path / "idx")
    fold = index_stream_sink(idx, "val", ["origin"], n_buckets=4)
    # origin keys are join keys in the retract stream — present on
    # every op, never suffixed; only payload columns carry __old
    retract = ("origin string, val string, op string, "
               "changed_cols string, val__old string")
    fold(spark.createDataFrame(
        [("o1", "a", "insert", "", None),
         ("o2", "b", "insert", "", None)], retract), 0)

    def postings():
        return {tuple(r) for r in
                ing.read_merged_table(spark, idx)
                .select("val", "origin").collect()}

    assert postings() == {("a", "o1"), ("b", "o2")}
    # o1 moves a -> c; o2 updated but val unchanged (other column)
    b1 = spark.createDataFrame(
        [("o1", "c", "update", "val", "a"),
         ("o2", "b", "update", "other", "b")], retract)
    fold(b1, 1)
    assert postings() == {("c", "o1"), ("b", "o2")}
    fold(b1, 1)  # crash-replay: must not strip or duplicate postings
    assert postings() == {("c", "o1"), ("b", "o2")}
    # delete o2
    fold(spark.createDataFrame(
        [("o2", None, "delete", "", "b")], retract), 2)
    assert postings() == {("c", "o1")}


def test_max_commits_per_trigger_bounds_batches(spark, tmp_path):
    """maxCommitsPerTrigger=1 makes each source commit its own
    micro-batch even when the stream opens against a fully-built
    table — the rate-limiting knob for bounded catch-up work."""
    spark.dataSource.register(MergeTableChangesDataSource)
    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(spark.createDataFrame([("a", "1")],
                                "origin string, payload string"), 1)
    merge(spark.createDataFrame([("a", "2")],
                                "origin string, payload string"), 2)
    merge(spark.createDataFrame([("b", "1")],
                                "origin string, payload string"), 3)

    batches: list[set] = []

    def _sink(df, _bid):
        rows = {(r.origin, r.op, r.payload) for r in df.collect()}
        if rows:
            batches.append(rows)

    q = (spark.readStream.format("merge_table_changes")
         .option("path", path).option("startingCommit", "0")
         .option("maxCommitsPerTrigger", "1").load()
         .writeStream.foreachBatch(_sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        _drain(q)
    finally:
        q.stop()
    # one batch per commit, each the single-commit diff
    assert batches == [{("a", "insert", "1")},
                       {("a", "update", "2")},
                       {("b", "insert", "1")}]


def test_changes_stream_select_projects_and_prunes(spark, tmp_path):
    """`select` makes the stream the change feed OF THE PROJECTION:
    the schema carries only origin + selected payload (the parquet
    scan prunes to it), and a row whose only changes are outside the
    selection does not emit."""
    spark.dataSource.register(MergeTableChangesDataSource)
    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    wide = "origin string, a string, b string, c string, d long"
    merge(spark.createDataFrame(
        [("k1", "a1", "b1", "c1", 1), ("k2", "a2", "b2", "c2", 2)],
        wide), 1)
    # k1: only unselected columns change; k2: the selected one does
    merge(spark.createDataFrame(
        [("k1", "a1", "B1", "C1", 9), ("k2", "A2", "b2", "c2", 2)],
        wide), 2)

    got: list[tuple] = []
    cols_seen: list[list[str]] = []

    def _sink(df, _bid):
        cols_seen.append(df.columns)
        got.extend(tuple(r) for r in df.collect())

    q = (spark.readStream.format("merge_table_changes")
         .option("path", path).option("startingCommit", "1")
         .option("select", "a").option("includeOld", "true").load()
         .writeStream.foreachBatch(_sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        _drain(q)
    finally:
        q.stop()
    assert all(c == ["origin", "op", "changed_cols", "a", "a__old"]
               for c in cols_seen)
    assert sorted(got) == [("k2", "update", "a", "A2", "a2")]


def test_read_consistent_pins_base_to_mv_watermark(spark, tmp_path):
    """read_consistent pairs the MV with the base AS OF the source
    commit the MV reflects — commits landing after the last refresh
    must be invisible on BOTH sides, so detail==rollup always."""
    path, mvp = str(tmp_path / "t"), str(tmp_path / "mv")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(spark.createDataFrame(
        [("o1", "a", 10), ("o2", "b", 5)],
        "origin string, grp string, val long"), 1)
    MV.create_mv(spark, path, mvp, GROUP, METRICS, n_buckets=2)
    # un-refreshed commits: a new row AND a dv delete
    merge(spark.createDataFrame([("o3", "a", 7)],
                                "origin string, grp string, val long"), 2)
    ing.delete_origins(spark, path,
                       spark.createDataFrame([("o2",)], "origin string"),
                       strategy="dv")

    base, view = MV.read_consistent(spark, path, mvp, METRICS)
    want = {tuple(r) for r in
            base.groupBy("grp")
            .agg(F.count("val").alias("n_vals"),
                 F.sum("val").alias("total")).collect()}
    got = {tuple(r) for r in
           view.select("grp", "n_vals", "total").collect()}
    assert got == want == {("a", 1, 10), ("b", 1, 5)}
    # after refresh the pair advances together
    MV.refresh_mv(spark, path, mvp, GROUP, METRICS)
    base, view = MV.read_consistent(spark, path, mvp, METRICS)
    got = {tuple(r) for r in
           view.select("grp", "n_vals", "total").collect()}
    want = {tuple(r) for r in
            base.groupBy("grp")
            .agg(F.count("val").alias("n_vals"),
                 F.sum("val").alias("total")).collect()}
    assert got == want == {("a", 2, 17)}


def test_partitions_raise_when_start_manifest_pruned(spark, tmp_path):
    """A planned offset whose manifest the log pruning removed must
    fail loudly — falling back to man_from=None would silently replay
    the whole snapshot as inserts (the streaming analog of the batch
    reader's _manifest_at error)."""
    import os

    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=1,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(spark.createDataFrame([("a", "1")],
                                "origin string, payload string"), 1)
    merge(spark.createDataFrame([("a", "2")],
                                "origin string, payload string"), 2)
    r = cdf._ChangesReader(path, 1, ["origin", "payload"], None)
    assert len(r.partitions({"commit": 1}, {"commit": 2})) == 1
    os.remove(os.path.join(path, "_log", "00000001.json"))
    with pytest.raises(ValueError, match="pruned"):
        r.partitions({"commit": 1}, {"commit": 2})


def test_index_stream_fuzz_matches_rebuild(spark, tmp_path):
    """Model check for the push-based index: a random op history
    (latest-wins upserts that MOVE values, dv and rewrite deletes)
    streamed per-commit through index_stream_sink must yield exactly
    the postings a from-scratch rebuild shows after every drain."""
    import random

    from engagement_data_pipeline_spark.streaming.secondary import (
        index_stream_sink)

    rng = random.Random(29)
    spark.dataSource.register(MergeTableChangesDataSource)
    path, idx = str(tmp_path / "t"), str(tmp_path / "idx")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=4,
                                     txn_app_id="src",
                                     mode="latest_wins")
    keys = [f"o{i}" for i in range(16)]
    vals = ["u1", "u2", "u3", None]

    def _mk(n):
        return [(k, rng.choice(vals)) for k in rng.sample(keys, n)]

    merge(spark.createDataFrame(_mk(8), "origin string, val string"), 0)

    q = (spark.readStream.format("merge_table_changes")
         .option("path", path).option("includeOld", "true")
         .option("maxCommitsPerTrigger", "1").load()
         .writeStream.foreachBatch(
             index_stream_sink(idx, "val", ["origin"], n_buckets=4))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())

    def postings():
        return {tuple(r) for r in
                ing.read_merged_table(spark, idx)
                .select("val", "origin").collect()}

    def rebuilt():
        return {tuple(r) for r in
                ing.read_merged_table(spark, path)
                .where(F.col("val").isNotNull())
                .select("val", "origin").collect()}

    try:
        for step in range(6):
            op = rng.choice(["upsert", "upsert", "dv", "rewrite"])
            if op == "upsert":
                merge(spark.createDataFrame(
                    _mk(5), "origin string, val string"), step + 1)
            else:
                live = [r.origin for r in
                        ing.read_merged_table(spark, path)
                        .select("origin").collect()]
                if not live:
                    continue
                ing.delete_origins(
                    spark, path,
                    spark.createDataFrame(
                        [(k,) for k in rng.sample(live,
                                                  min(2, len(live)))],
                        "origin string"),
                    strategy=op if op == "dv" else "rewrite")
            _drain(q)
            assert postings() == rebuilt(), f"step {step}"
            if step == 3:
                # compacting the INDEX mid-stream must preserve its
                # txn watermark (compact carries txn) and its postings
                ing.compact_table(spark, idx, vacuum=False)
                assert postings() == rebuilt(), "compaction broke idx"
    finally:
        q.stop()


def test_timestamp_as_of_time_travel(spark, tmp_path):
    """TIMESTAMP AS OF: as_of_ms resolves to the newest commit at or
    before the asked wall-clock time via the manifests' ts_ms."""
    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(spark.createDataFrame([("a", "1")],
                                "origin string, payload string"), 1)
    ts1 = ing.read_table_manifest(spark, path)["ts_ms"]
    merge(spark.createDataFrame([("a", "2"), ("b", "1")],
                                "origin string, payload string"), 2)
    ts2 = ing.read_table_manifest(spark, path)["ts_ms"]

    def rows(**kw):
        return {tuple(r) for r in
                ing.read_table_at(spark, path, **kw).collect()}

    assert ing.commit_as_of(spark, path, ts1) == 1
    assert rows(as_of_ms=ts1) == {("a", "1")}
    assert rows(as_of_ms=ts2 + 10_000) == {("a", "2"), ("b", "1")}
    with pytest.raises(ValueError, match="at or before"):
        ing.commit_as_of(spark, path, ts1 - 10_000)
    with pytest.raises(ValueError, match="exactly one"):
        ing.read_table_at(spark, path)
    with pytest.raises(ValueError, match="exactly one"):
        ing.read_table_at(spark, path, commit=1, as_of_ms=ts1)


def test_text_index_stream_sink_matches_rebuild(spark, tmp_path):
    """Push-based LSM text-index maintenance from the retract stream:
    after draining insert / text-update / unrelated-update / dv-delete
    commits (one micro-batch each), the index's resolved postings and
    corpus stats must equal a from-scratch term_stats over the final
    corpus; an update that does not touch the text column must not
    churn the index."""
    from engagement_data_pipeline_spark.training import ranking as R

    spark.dataSource.register(MergeTableChangesDataSource)
    path, idx = str(tmp_path / "docs"), str(tmp_path / "idx")
    schema = "doc_id long, text string, meta string"
    merge = ing.foreach_batch_upsert(path, ["doc_id"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(spark.createDataFrame(
        [(1, "alpha beta gamma", "m"), (2, "beta beta delta", "m"),
         (3, "gamma alpha", "m"), (4, "epsilon", "m")], schema), 1)

    q = (spark.readStream.format("merge_table_changes")
         .option("path", path).option("includeOld", "true")
         .option("maxCommitsPerTrigger", "1").load()
         .writeStream.foreachBatch(
             R.text_index_stream_sink(idx, "text", "doc_id"))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        _drain(q)
        seqs_after_build = R._delta_seqs(spark, idx)
        # text update (2), meta-only update (3: text unchanged → no
        # churn), new doc (5)
        merge(spark.createDataFrame(
            [(2, "delta delta zeta", "m"), (3, "gamma alpha", "CHANGED"),
             (5, "beta epsilon", "m")], schema), 2)
        ing.delete_origins(spark, path,
                           spark.createDataFrame([(1,)], "doc_id long"),
                           strategy="dv")
        _drain(q)
    finally:
        q.stop()

    final = ing.read_merged_table(spark, path)
    want_tf = {tuple(r) for r in
               R.term_stats(final, "text", "doc_id")[0].collect()}
    got_tf = {tuple(r) for r in
              R._resolved_postings(spark, idx)
              .select("doc_id", "term", "tf", "dl").collect()}
    assert got_tf == want_tf
    st = R._index_stats(spark, idx).first()
    assert st["n_docs"] == final.count()
    assert seqs_after_build == []  # first batch bootstrapped the base


def test_text_index_sink_replay_and_compaction_watermark(spark, tmp_path):
    """update_text_index(txn_batch=...): a replayed batch id appends
    NOTHING (checked under the sequence claim), and the watermark
    survives compact_text_index — replay of a pre-compaction batch is
    still a no-op."""
    from engagement_data_pipeline_spark.training import ranking as R

    idx = str(tmp_path / "idx")
    fold = R.text_index_stream_sink(idx, "text", "doc_id")
    retract = ("doc_id long, text string, op string, "
               "changed_cols string, text__old string")
    fold(spark.createDataFrame(
        [(1, "alpha beta", "insert", "", None),
         (2, "beta gamma", "insert", "", None)], retract), 0)
    b1 = spark.createDataFrame(
        [(2, "gamma zeta", "update", "text", "beta gamma"),
         (3, "alpha", "insert", "", None)], retract)
    fold(b1, 1)
    seqs = R._delta_seqs(spark, idx)
    stats = R._index_stats(spark, idx).first()
    assert stats["n_docs"] == 3 and R._txn_of(stats) == 1
    fold(b1, 1)  # crash-replay: no new delta, stats unchanged
    assert R._delta_seqs(spark, idx) == seqs
    assert R._index_stats(spark, idx).first() == stats
    # watermark survives folding the deltas into the base
    R.compact_text_index(spark, idx)
    assert R._delta_seqs(spark, idx) == []
    assert R._txn_of(R._index_stats(spark, idx).first()) == 1
    fold(b1, 1)  # still a no-op post-compaction
    assert R._delta_seqs(spark, idx) == []
    got = {tuple(r) for r in
           R._resolved_postings(spark, idx)
           .select("doc_id", "term").collect()}
    assert got == {(1, "alpha"), (1, "beta"), (2, "gamma"),
                   (2, "zeta"), (3, "alpha")}


def test_key_only_table_streams_with_include_old(spark, tmp_path):
    """A key-only table (origin is the whole row) has NO payload
    columns: includeOld must not corrupt the DDL, inserts/deletes
    stream, and updates cannot exist (no payload to change)."""
    spark.dataSource.register(MergeTableChangesDataSource)
    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["k"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(spark.createDataFrame([("a",), ("b",)], "k string"), 1)
    ing.delete_origins(spark, path,
                       spark.createDataFrame([("a",)], "k string"),
                       strategy="dv")

    got: list[tuple] = []

    def _sink(df, _bid):
        assert df.columns == ["k", "op", "changed_cols"]
        got.extend((r.k, r.op) for r in df.collect())

    q = (spark.readStream.format("merge_table_changes")
         .option("path", path).option("includeOld", "true").load()
         .writeStream.foreachBatch(_sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        _drain(q)
    finally:
        q.stop()
    assert sorted(got) == [("b", "insert")]


def test_rate_limit_never_regresses_after_restart(spark, tmp_path):
    """Rate limiting advances from the ENGINE's position, never from
    the startingCommit option: on restart the engine replans the
    checkpointed window via partitions() before the first poll
    (behavior pinned end-to-end below), so limiting from the option
    would hand back an offset below the checkpoint, regressing the
    offset log and re-emitting applied windows under fresh batch
    ids."""
    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=1,
                                     txn_app_id="src",
                                     mode="latest_wins")
    for i in range(1, 6):
        merge(spark.createDataFrame([(f"k{i}", "v")],
                                    "origin string, payload string"), i)
    # fresh stream: first poll limits from startingCommit
    r = cdf._ChangesReader(path, 0, ["origin", "payload"], None, 2)
    assert r.latestOffset() == {"commit": 2}
    # restart: the engine replans the checkpointed window FIRST —
    # the subsequent poll must limit from there, never below it
    r2 = cdf._ChangesReader(path, 0, ["origin", "payload"], None, 2)
    r2.partitions({"commit": 2}, {"commit": 4})
    assert r2.latestOffset() == {"commit": 5}, "offset regressed"
    # commit() also reveals the position
    r3 = cdf._ChangesReader(path, 0, ["origin", "payload"], None, 2)
    r3.commit({"commit": 3})
    assert r3.latestOffset() == {"commit": 5}


def test_rate_limited_stream_survives_restart_without_duplicates(
        spark, tmp_path):
    """End-to-end restart pin: stop a maxCommitsPerTrigger stream,
    land more commits, restart on the SAME checkpoint — every change
    must arrive exactly once (an offset regression would re-emit
    already-applied windows under fresh batch ids)."""
    spark.dataSource.register(MergeTableChangesDataSource)
    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=1,
                                     txn_app_id="src",
                                     mode="latest_wins")
    for i in range(1, 4):
        merge(spark.createDataFrame([(f"k{i}", "v")],
                                    "origin string, payload string"), i)
    got: list[tuple] = []

    def _sink(df, _bid):
        got.extend((r.origin, r.op) for r in df.collect())

    def _run():
        q = (spark.readStream.format("merge_table_changes")
             .option("path", path)
             .option("maxCommitsPerTrigger", "1").load()
             .writeStream.foreachBatch(_sink)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .start())
        try:
            _drain(q)
        finally:
            q.stop()

    _run()
    assert sorted(got) == [(f"k{i}", "insert") for i in range(1, 4)]
    merge(spark.createDataFrame([("k4", "v")],
                                "origin string, payload string"), 4)
    merge(spark.createDataFrame([("k5", "v")],
                                "origin string, payload string"), 5)
    _run()  # restart on the same checkpoint
    assert sorted(got) == [(f"k{i}", "insert") for i in range(1, 6)], (
        "restart re-emitted or dropped windows")


def test_maintenance_paths_refuse_foreign_watermarks(spark, tmp_path):
    """Pull refreshers record SOURCE COMMITS; push sinks record STREAM
    BATCH ids. Mixing silently skips or double-applies windows, so
    each path must refuse an artifact owned by the other."""
    from engagement_data_pipeline_spark.streaming.secondary import (
        build_value_index, index_stream_sink, refresh_value_index)

    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(spark.createDataFrame([("o1", "a", 1)],
                                "origin string, grp string, val long"), 1)
    retract = ("origin string, grp string, val long, op string, "
               "changed_cols string, grp__old string, val__old long")
    b = spark.createDataFrame(
        [("o1", "a", 1, "insert", "", None, None)], retract)

    # refresh-owned MV refuses the sink...
    mvp1 = str(tmp_path / "mv1")
    MV.create_mv(spark, path, mvp1, GROUP, METRICS, n_buckets=2)
    with pytest.raises(ValueError, match="source-commit watermark"):
        MV.mv_stream_sink(mvp1, GROUP, METRICS)(b, 0)
    # ...and a sink-owned MV refuses refresh_mv AND read_consistent
    mvp2 = str(tmp_path / "mv2")
    MV.mv_stream_sink(mvp2, GROUP, METRICS)(b, 0)
    with pytest.raises(ValueError, match="stream batch id"):
        MV.refresh_mv(spark, path, mvp2, GROUP, METRICS)
    with pytest.raises(ValueError, match="no __mv_src watermark"):
        MV.read_consistent(spark, path, mvp2, METRICS)

    # same mutual exclusion for the value index
    idx1 = str(tmp_path / "idx1")
    build_value_index(spark, path, idx1, "grp", n_buckets=2)
    iretract = ("origin string, grp string, op string, "
                "changed_cols string, grp__old string")
    ib = spark.createDataFrame([("o1", "a", "insert", "", None)],
                               iretract)
    with pytest.raises(ValueError, match="source-commit watermark"):
        index_stream_sink(idx1, "grp", ["origin"])(ib, 0)
    idx2 = str(tmp_path / "idx2")
    index_stream_sink(idx2, "grp", ["origin"], n_buckets=2)(ib, 0)
    with pytest.raises(ValueError, match="stream batch id"):
        refresh_value_index(spark, path, idx2, "grp")


def test_mv_refresh_group_col_order_insensitive(spark, tmp_path):
    """Bucket hashing runs in the MANIFEST's bucket-column order —
    refreshing with the group columns in a different order than
    create_mv used must still slice the right state buckets (joins
    are name-based; xxhash64 is order-sensitive)."""
    path, mvp = str(tmp_path / "t"), str(tmp_path / "mv")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    rows = "origin string, a string, b string, val long"
    merge(spark.createDataFrame(
        [(f"o{i}", f"a{i % 4}", f"b{i % 3}", i) for i in range(24)],
        rows), 1)
    metrics = {"n": ("val", "count"), "t": ("val", "sum")}
    MV.create_mv(spark, path, mvp, ["a", "b"], metrics, n_buckets=8)
    merge(spark.createDataFrame([("o0", "a0", "b0", 100)], rows), 2)
    MV.refresh_mv(spark, path, mvp, ["b", "a"], metrics)  # reversed
    got = {tuple(r) for r in
           MV.read_mv(spark, mvp, metrics)
           .select("a", "b", "n", "t").collect()}
    want = {tuple(r) for r in
            ing.read_merged_table(spark, path).groupBy("a", "b")
            .agg(F.count("val").alias("n"),
                 F.sum("val").alias("t")).collect()}
    assert got == want


def test_text_sink_skips_textless_batches(spark, tmp_path):
    """A batch whose changes are all outside the text column appends
    NO delta segment (previously: one empty segment per batch,
    growing the LSM tail with pure watermark carriers)."""
    from engagement_data_pipeline_spark.training import ranking as R

    idx = str(tmp_path / "idx")
    fold = R.text_index_stream_sink(idx, "text", "doc_id")
    retract = ("doc_id long, text string, meta string, op string, "
               "changed_cols string, text__old string, meta__old string")
    fold(spark.createDataFrame(
        [(1, "alpha beta", "m", "insert", "", None, None)], retract), 0)
    assert R._delta_seqs(spark, idx) == []
    fold(spark.createDataFrame(
        [(1, "alpha beta", "M2", "update", "meta", "alpha beta", "m")],
        retract), 1)
    assert R._delta_seqs(spark, idx) == [], "textless batch churned"
    got = {tuple(r) for r in R._resolved_postings(spark, idx)
           .select("doc_id", "term").collect()}
    assert got == {(1, "alpha"), (1, "beta")}


def test_commit_as_of_skips_untimestamped_manifests(spark, tmp_path):
    """A manifest without ts_ms has an UNKNOWN creation time: it must
    never resolve a TIMESTAMP AS OF (treating it as time 0 would
    return data that may postdate the asked time)."""
    import json as _json
    import os

    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=1,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(spark.createDataFrame([("a", "1")],
                                "origin string, payload string"), 1)
    merge(spark.createDataFrame([("b", "1")],
                                "origin string, payload string"), 2)
    ts2 = ing.read_table_manifest(spark, path)["ts_ms"]
    # strip commit 1's timestamp (an older-format manifest)
    mp = os.path.join(path, "_log", "00000001.json")
    man = _json.load(open(mp))
    del man["ts_ms"]
    with open(mp, "w") as f:
        _json.dump(man, f)
    # Rewriting with plain open() leaves Hadoop LocalFS's checksum
    # sidecar stale; drop it so the (correctly) stricter commit_as_of
    # read path sees a clean file rather than a ChecksumException.
    crc = os.path.join(path, "_log", ".00000001.json.crc")
    if os.path.exists(crc):
        os.remove(crc)
    assert ing.commit_as_of(spark, path, ts2) == 2
    with pytest.raises(ValueError, match="provably"):
        ing.commit_as_of(spark, path, ts2 - 10_000)


def test_include_old_rejects_colliding_payload_name(spark, tmp_path):
    """A payload column literally named <x>__old would collide with
    x's retract column — schema() must fail loudly, not misroute."""
    spark.dataSource.register(MergeTableChangesDataSource)
    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["k"], n_buckets=1)
    merge(spark.createDataFrame([("a", "s", "old")],
                                "k string, status string, "
                                "status__old string"), 1)
    with pytest.raises(Exception, match="clashes"):
        (spark.readStream.format("merge_table_changes")
         .option("path", path).option("includeOld", "true").load())
