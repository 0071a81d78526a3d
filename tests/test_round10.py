"""Round-10 hardening: NULL-aware distinct-count MV reads, pinned
map-equality semantics in the change-feed diff kernel, and the K6
oracle's NULL-text no-op suppression."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.streaming import cdf_source as cdf
from engagement_data_pipeline_spark.streaming import ingest as ing
from engagement_data_pipeline_spark.streaming import mv as MV

RETRACT = ("grp string, val long, keep string, op string, "
           "changed_cols string, grp__old string, val__old long, "
           "keep__old string")


# --- read_mv_distinct: NULL distinct keys are not witnesses ---------------

def test_mv_distinct_null_key_not_a_witness(spark, tmp_path):
    """COUNT(DISTINCT x) ignores NULL x; the two-level read must not
    count a NULL-keyed inner group as a witness — but that group's
    rows exist, so its metric sums DO contribute (exactly SQL's
    COUNT(DISTINCT pid) vs COUNT(*) split over the same rows)."""
    mvp = str(tmp_path / "mv")
    metrics = {"n_msgs": ("val", "count")}
    fold = MV.mv_stream_sink(
        mvp, ["grp", "pid"], metrics,
        prepare=lambda df: df.select(
            F.col("keep").alias("pid"), "grp", "val"),
        source_cols=["grp", "val", "keep"])
    b0 = spark.createDataFrame(
        [("d1", 1, "p1", "insert", "", None, None, None),
         ("d1", 2, None, "insert", "", None, None, None),
         ("d1", 3, None, "insert", "", None, None, None),
         ("d2", 4, None, "insert", "", None, None, None)], RETRACT)
    fold(b0, 0)
    got = {tuple(r) for r in
           MV.read_mv_distinct(spark, mvp, ["grp"], metrics,
                               distinct_name="n_pids").collect()}
    # d1: 3 rows but only ONE non-NULL distinct pid; d2: rows exist
    # yet zero witnesses — the group must still appear with its sums.
    assert got == {("d1", 1, 3), ("d2", 0, 1)}


# --- two sinks, one stream: consistent pair reads + replay convergence ----

RETRACT1 = ("grp string, pid string, flag string, op string, "
            "changed_cols string, grp__old string, pid__old string, "
            "flag__old string")


def _pair_sinks(tmp_path):
    main = MV.mv_stream_sink(
        str(tmp_path / "main"), ["grp", "pid"], {},
        prepare=lambda df: df.select("grp", "pid"),
        source_cols=["grp", "pid"])
    stops = MV.mv_stream_sink(
        str(tmp_path / "stops"), ["pid"], {},
        prepare=lambda df: df.where(F.col("flag") == "true")
        .select("pid"),
        source_cols=["pid", "flag"])
    return main, stops


def _b(spark, rows):
    return spark.createDataFrame(
        [(g, p, f, "insert", "", None, None, None)
         for g, p, f in rows], RETRACT1)


def test_mv_pair_consistent_read_and_torn_pair_raises(spark, tmp_path):
    """Equal __mv_stream watermarks -> both states returned from the
    resolved manifests; a lagging sink (crash between the two folds)
    -> the pair read raises instead of mixing generations."""
    main, stops = _pair_sinks(tmp_path)
    b0 = _b(spark, [("d1", "p1", "false"), ("d1", "p2", "true")])
    main(b0, 0)
    stops(b0, 0)
    inner, stop = MV.read_mv_pair_consistent(
        spark, [str(tmp_path / "main"), str(tmp_path / "stops")],
        [{}, {}])
    assert {tuple(r) for r in inner.collect()} == {("d1", "p1"),
                                                   ("d1", "p2")}
    assert {r.pid for r in stop.collect()} == {"p2"}
    # batch 1 lands in main only — a reader must refuse the torn pair
    b1 = _b(spark, [("d2", "p3", "true")])
    main(b1, 1)
    with pytest.raises(RuntimeError, match="one stream batch"):
        MV.read_mv_pair_consistent(
            spark, [str(tmp_path / "main"), str(tmp_path / "stops")],
            [{}, {}], retries=2)


def test_mv_pair_crash_replay_converges(spark, tmp_path):
    """foreachBatch crash between the two folds, then the engine
    replays the batch: the already-applied sink skips via its
    watermark, the lagging sink applies — both states converge to the
    full application and the pair read succeeds."""
    main, stops = _pair_sinks(tmp_path)
    b0 = _b(spark, [("d1", "p1", "false"), ("d1", "p2", "true")])
    main(b0, 0)
    stops(b0, 0)
    b1 = _b(spark, [("d2", "p3", "true"), ("d2", "p4", "false")])
    main(b1, 1)  # crash here: stops never saw batch 1
    # engine replay of batch 1 hits BOTH sinks
    main(b1, 1)
    stops(b1, 1)
    inner, stop = MV.read_mv_pair_consistent(
        spark, [str(tmp_path / "main"), str(tmp_path / "stops")],
        [{}, {}])
    # main did NOT double-apply; stops caught up
    assert {tuple(r) for r in inner.collect()} == {
        ("d1", "p1"), ("d1", "p2"), ("d2", "p3"), ("d2", "p4")}
    assert {r.pid for r in stop.collect()} == {"p2", "p3"}


# --- incremental top-k: touched-group re-rank, bucket-sliced --------------

def test_top_k_incremental_bucket_sliced_and_promotes(spark, tmp_path):
    """Deleting a group's rank-1 row must PROMOTE its (k+1)-th row —
    the reason top-k is not retract-maintainable flat — and with the
    table clustered on the group column the exact re-rank must read
    ONLY the touched group's bucket (spied via _read_resolved)."""
    from engagement_data_pipeline_spark.operators.topk import (
        top_k_incremental)

    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["k"], n_buckets=8,
                                     bucket_cols=["grp"],
                                     txn_app_id="src",
                                     mode="latest_wins")
    rows = [(f"k{g}_{i}", f"g{g}", i, g * 10 + i)
            for g in range(4) for i in range(3)]
    merge(spark.createDataFrame(
        rows, "k string, grp string, ts long, seq long"), 1)
    # delete g3's rank-1 row (delete keys CARRY the bucket column)
    ing.delete_origins(spark, path,
                       spark.createDataFrame([("k3_0", "g3")],
                                             "k string, grp string"),
                       strategy="dv")
    reads: list[list[int]] = []
    orig_rr = ing._read_resolved

    def _spy(spark_, table_path_, man_, only=None, **kw):
        reads.append(sorted(only or []))
        return orig_rr(spark_, table_path_, man_, only=only, **kw)

    ing._read_resolved = _spy
    try:
        got = {(r.grp, r.rank, r.ts) for r in top_k_incremental(
            spark, path, 1, ["grp"], ["ts", "seq"], k=2,
            rank_col="rank").collect()}
    finally:
        ing._read_resolved = orig_rr
    # only the touched group, with its (k+1)-th row promoted to rank 2
    assert got == {("g3", 1, 1), ("g3", 2, 2)}
    expect = {r[0] for r in
              spark.createDataFrame([("g3",)], "grp string")
              .select(ing.origin_bucket(["grp"], 8).alias("b"))
              .collect()}
    assert any(set(r) == expect for r in reads if r), (
        f"re-rank read buckets {reads}, wanted a {sorted(expect)} read")


def test_top_k_incremental_noop_when_caught_up(spark, tmp_path):
    from engagement_data_pipeline_spark.operators.topk import (
        top_k_incremental)

    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["k"], n_buckets=2,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(spark.createDataFrame([("a", "g", 1, 1)],
                                "k string, grp string, ts long, "
                                "seq long"), 1)
    assert top_k_incremental(spark, path, 1, ["grp"], ["ts", "seq"],
                             k=2).count() == 0


# --- map equality: canonical (key-order-insensitive) in BOTH paths --------

MAP_T = pa.map_(pa.string(), pa.int64())

_mkey = st.sampled_from(["a", "b", "c"])
_mval = st.one_of(st.none(), st.integers(-3, 3))
_map = st.one_of(st.none(),
                 st.lists(st.tuples(_mkey, _mval), max_size=3))


def _assert_kernel_matches(pairs, typ):
    a = pa.array([p[0] for p in pairs], type=typ)
    b = pa.array([p[1] for p in pairs], type=typ)
    got = list(cdf._arrow_eq(a, b))
    want = [not x for x in cdf._neq(a.to_pandas(), b.to_pandas())]
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_map, _map), max_size=12))
def test_arrow_eq_matches_object_compare_maps(pairs):
    """Map columns route through the vectorized list branch after a
    stable key-sort; equality is CANONICAL (key-order-insensitive) in
    both the Arrow kernel and the object fallback — pin that they
    agree on every input, duplicate keys included (both sorts are
    stable, so dup-key entries keep input order in both paths)."""
    _assert_kernel_matches(pairs, MAP_T)


# --- retention-floor lease expiry -----------------------------------------

def _mk_table(spark, path, n_commits):
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=1,
                                     txn_app_id="src",
                                     mode="latest_wins")
    for i in range(1, n_commits + 1):
        merge(spark.createDataFrame([(f"o{i}", f"v{i}")],
                                    "origin string, payload string"), i)
    return merge


def _age_floor(path, name, seconds):
    import os
    import time
    fp = os.path.join(path, "_log", "_floors", f"{name}.json")
    old = time.time() - seconds
    os.utime(fp, (old, old))


def test_vacuum_floor_ttl_expires_abandoned_floor_only(spark, tmp_path):
    """A floor whose checkpoint was deleted without
    clear_retention_floor would pin vacuum forever (floors only ever
    advance). With floor_ttl_ms, the stale floor lease-expires — it
    is deleted and its window reclaims — while a FRESH floor keeps
    full protection, no ignore_floors sledgehammer needed."""
    path = str(tmp_path / "t")
    _mk_table(spark, path, 5)
    ing.set_retention_floor(spark, path, "abandoned", 1)
    ing.set_retention_floor(spark, path, "honest", 3)
    _age_floor(path, "abandoned", 3600)
    ages = ing.list_retention_floors(spark, path)
    assert ages["abandoned"]["age_ms"] > 3_000_000
    assert ages["honest"]["age_ms"] < 60_000
    ing.vacuum_table(spark, path, keep_manifests=1,
                     floor_ttl_ms=600_000)
    # the abandoned floor is gone (it cannot re-pin the next vacuum)
    assert set(ing.read_retention_floors(spark, path)) == {"honest"}
    # its window reclaimed; the honest floor's window survived
    assert cdf._manifest(path, 1) is None
    assert cdf._manifest(path, 2) is None
    assert cdf._manifest(path, 3) is not None
    assert cdf._manifest(path, 4) is not None


def test_vacuum_floor_ttl_keeps_stale_floor_at_head(spark, tmp_path):
    """A stale-mtime floor AT the head is a healthy caught-up
    consumer on an idle table (no batches -> no rewrites), not an
    abandoned one — it pins nothing beyond the latest manifest and
    must survive TTL vacuum so the stream is not stranded when the
    table resumes."""
    path = str(tmp_path / "t")
    _mk_table(spark, path, 3)
    ing.set_retention_floor(spark, path, "idle_ok", 3)
    _age_floor(path, "idle_ok", 3600)
    ing.vacuum_table(spark, path, keep_manifests=1,
                     floor_ttl_ms=600_000)
    assert ing.read_retention_floors(spark, path) == {"idle_ok": 3}


def test_vacuum_no_ttl_keeps_stale_floors(spark, tmp_path):
    """Default (floor_ttl_ms=None) preserves the round-9 contract:
    even an ancient floor pins its window until cleared."""
    path = str(tmp_path / "t")
    _mk_table(spark, path, 4)
    ing.set_retention_floor(spark, path, "s", 2)
    _age_floor(path, "s", 86_400)
    ing.vacuum_table(spark, path, keep_manifests=1)
    assert cdf._manifest(path, 2) is not None
    assert ing.read_retention_floors(spark, path) == {"s": 2}


def test_map_equality_is_canonical_in_both_paths():
    """{a:1, b:2} vs the same entries reordered is semantically the
    SAME map: a writer that does not preserve key order must not
    manufacture a change row (round-11 advisory). Both paths sort
    entries by key before comparing, so reordered-equal maps compare
    equal, genuinely different maps (changed value, extra key) do
    not, and null-vs-empty stays unequal."""
    a = pa.array([[("a", 1), ("b", 2)], [("a", 1), ("b", 2)],
                  [("a", 1), ("b", 2)], [("a", 1)], None],
                 type=MAP_T)
    b = pa.array([[("b", 2), ("a", 1)], [("a", 1), ("b", 2)],
                  [("b", 3), ("a", 1)], [("a", 1), ("b", 2)], []],
                 type=MAP_T)
    want = [True, True, False, False, False]
    assert list(cdf._arrow_eq(a, b)) == want
    assert list(cdf._neq(a.to_pandas(), b.to_pandas())) == \
        [not x for x in want]


MAP_NESTED_T = pa.map_(pa.string(), pa.list_(pa.int64()))

_mval_list = st.one_of(st.none(),
                       st.lists(st.integers(-2, 2), max_size=3))
_map_nested = st.one_of(st.none(),
                        st.lists(st.tuples(_mkey, _mval_list),
                                 max_size=3))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(_map_nested, _map_nested), max_size=10))
def test_arrow_eq_matches_object_compare_nested_maps(pairs):
    """map<string, list<int>>: the canonical key-sort composes with
    the recursive list kernel in the Arrow path and with recursive
    normalization in the object fallback — both paths must still
    agree on every input."""
    _assert_kernel_matches(pairs, MAP_NESTED_T)
