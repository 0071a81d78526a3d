"""Round-15 optimization internals.

Pins the semantics of this round's optimizations:
* the change feed's `ship` OUTPUT projection (batch reads): the diff
  still spans every payload column — emission and changed_cols are
  the full-width feed's — but only origin + op/changed + the listed
  columns (+ their __old twins) cross the Python→JVM boundary;
* `read_changes_local(..., ship=...)`: same contract driver-side;
* query-scoped cache release (session.scoped_cache /
  release_scoped_caches) drops registered caches and survives stopped
  sessions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _history(spark, path: str) -> None:
    """insert → payload-only update → group move → dv delete."""
    from engagement_data_pipeline_spark.streaming.ingest import (
        delete_origins, foreach_batch_upsert)

    m = foreach_batch_upsert(path, ["k"], n_buckets=2,
                             bucket_cols=["grp"],
                             txn_app_id="src", mode="latest_wins")
    df = spark.range(20).select(
        F.col("id").cast("string").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 3).cast("string")).alias("grp"),
        F.col("id").alias("v"),
        F.concat(F.lit("t"), F.col("id").cast("string")).alias("txt"))
    m(df, 1)
    # payload-only update: grp unchanged, v/txt changed — under `ship`
    # to grp this row MUST STILL EMIT (full-width diff decides)
    m(df.where("id = 7").withColumn("v", F.lit(700))
      .withColumn("txt", F.lit("seven")), 2)
    # group move: grp changes — grp__old must carry the pre-image
    m(df.where("id = 4").withColumn("grp", F.lit("gX")), 3)
    delete_origins(spark, path, df.where("id = 11").select("k", "grp"),
                   strategy="dv")


def _read(spark, path: str, **opts):
    from engagement_data_pipeline_spark.streaming.cdf_source import (
        MergeTableChangesDataSource)

    spark.dataSource.register(MergeTableChangesDataSource)
    r = (spark.read.format("merge_table_changes")
         .option("path", path)
         .option("fromCommit", "1"))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_ship_projection_keeps_full_width_diff(spark, tmp_path):
    path = str(tmp_path / "t")
    _history(spark, path)

    full = _read(spark, path, includeOld="true")
    shipped = _read(spark, path, includeOld="true", ship="grp")

    assert shipped.columns == ["k", "op", "changed_cols",
                               "grp", "grp__old"]
    f = {r["k"]: r for r in full.collect()}
    s = {r["k"]: r for r in shipped.collect()}
    # identical row set: the v-only update (k=7) emits under ship too
    assert sorted(s) == sorted(f) and "7" in s
    for k, r in s.items():
        assert (r["op"], r["changed_cols"]) == \
            (f[k]["op"], f[k]["changed_cols"])
        assert r["grp"] == f[k]["grp"]
        assert r["grp__old"] == f[k]["grp__old"]
    # changed_cols still reports the UNSHIPPED truly-changed columns
    assert set(s["7"]["changed_cols"].split(",")) == {"txt", "v"}
    assert s["7"]["op"] == "update"
    # the moved row's pre-image group survives the projection
    assert (s["4"]["grp"], s["4"]["grp__old"]) == ("gX", "g1")
    assert s["11"]["op"] == "delete"


def test_ship_unknown_column_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    _history(spark, path)
    with pytest.raises(Exception, match="ship"):
        _read(spark, path, ship="nope").collect()


def test_ship_rejected_for_streams(spark, tmp_path):
    # streamReader construction (not .load(), which only resolves the
    # schema) is where the engine binds the source to a stream — the
    # guard lives there.
    from engagement_data_pipeline_spark.streaming.cdf_source import (
        MergeTableChangesDataSource)

    path = str(tmp_path / "t")
    _history(spark, path)
    ds = MergeTableChangesDataSource(
        options={"path": path, "ship": "grp"})
    with pytest.raises(ValueError, match="batch-read option"):
        ds.streamReader(None)


def test_read_changes_local_ship_matches_distributed(spark, tmp_path):
    from engagement_data_pipeline_spark.streaming.cdf_source import (
        read_changes_local)

    path = str(tmp_path / "t")
    _history(spark, path)
    lc = read_changes_local(path, 1, 4, max_rows=4096, ship=["grp"])
    assert lc is not None
    assert lc.payload == ["grp"]
    dist = {r["k"]: r for r in
            _read(spark, path, includeOld="true", ship="grp").collect()}
    loc = {r["k"]: r for r in lc.rows}
    assert sorted(loc) == sorted(dist)
    for k, r in loc.items():
        assert r["op"] == dist[k]["op"]
        assert r["grp"] == dist[k]["grp"]
        assert r.get("grp__old") == dist[k]["grp__old"]
        assert r["changed_cols"] == dist[k]["changed_cols"]


def test_local_union_schema_sees_mixed_schema_dir(spark, tmp_path):
    """Hardening for the one-commit-per-dir invariant: a straggler
    file with an extra column inside ONE dir must contribute its
    column to the union (not be silently dropped), and an intra-dir
    type conflict must force the distributed-merge fallback."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engagement_data_pipeline_spark.streaming.ingest import (
        _local_union_schema)

    d = tmp_path / "mixed"
    d.mkdir()
    pq.write_table(pa.table({"x": pa.array([1, 2], pa.int64()),
                             "y": pa.array(["a", "b"])}),
                   str(d / "a.parquet"))
    pq.write_table(pa.table({"x": pa.array([3], pa.int64()),
                             "z": pa.array([1.5])}),
                   str(d / "b.parquet"))
    st = _local_union_schema([str(d)])
    assert st is not None and set(st.fieldNames()) == {"x", "y", "z"}
    # matches Spark's own mergeSchema union for the same dir
    merged = spark.read.option("mergeSchema", "true").parquet(str(d))
    assert set(merged.schema.fieldNames()) == set(st.fieldNames())
    assert {f.name: f.dataType for f in merged.schema.fields} == \
        {f.name: f.dataType for f in st.fields}

    c = tmp_path / "conflict"
    c.mkdir()
    pq.write_table(pa.table({"x": pa.array([1], pa.int64())}),
                   str(c / "a.parquet"))
    pq.write_table(pa.table({"x": pa.array(["s"])}),
                   str(c / "b.parquet"))
    assert _local_union_schema([str(c)]) is None


def test_scoped_cache_release(spark):
    from engagement_data_pipeline_spark import session as S

    df = S.scoped_cache(spark.range(10))
    df.count()
    assert df.storageLevel.useMemory
    S.release_scoped_caches()
    assert not S._SCOPED_CACHES
    assert not df.storageLevel.useMemory


def test_registry_wrapper_releases_previous_query_caches(spark):
    from engagement_data_pipeline_spark import session as S
    from engagement_data_pipeline_spark.queries.registry import (
        _released)

    held = S.scoped_cache(spark.range(5))
    held.count()
    assert held.storageLevel.useMemory

    ran = []
    fn = _released("x", lambda sp, sf: ran.append((sp, sf)))
    fn(spark, "/nowhere")
    assert ran == [(spark, "/nowhere")]
    assert not held.storageLevel.useMemory
