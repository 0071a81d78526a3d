"""Round-13 hardening: spread_narrow_scan's bin-packing width
estimate, and the runner's exclusive OCC run claim."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.analysis.runner import (
    ConcurrentRunError,
    read_run,
    run_incremental_pipeline,
)
from engagement_data_pipeline_spark.streaming.ingest import put_if_absent
from engagement_data_pipeline_spark.training.text import spread_narrow_scan


def _write_files(spark, path: str, n: int) -> None:
    (spark.range(400).withColumn("k", (F.col("id") % n).cast("int"))
     .repartition(n, "k").write.mode("overwrite").parquet(path))


# ---------------------------------------------------------------------------
# spread_narrow_scan: splits mirror Spark's small-file bin-packing
# ---------------------------------------------------------------------------

def test_spread_fires_on_many_tiny_files(spark, tmp_path):
    # 8 tiny files exceed defaultParallelism by COUNT, but Spark
    # bin-packs them into ~one scan task — the spread must fire
    p = str(tmp_path / "tiny")
    _write_files(spark, p, 8)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= spark.sparkContext.defaultParallelism
    out = spread_narrow_scan(df)
    assert out is not df
    assert (out.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)


def test_spread_passes_through_wide_input(spark, tmp_path):
    p = str(tmp_path / "wide")
    _write_files(spark, p, 8)
    df = spark.read.parquet(p)
    old_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes",
                              "4194304")
    try:
        # shrink the split size so the same files are genuinely wide
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
        spark.conf.set("spark.sql.files.openCostInBytes", "1k")
        assert spread_narrow_scan(df) is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_max)
        spark.conf.set("spark.sql.files.openCostInBytes", old_cost)


def test_spread_passes_through_single_huge_file(spark, tmp_path):
    # one file many times the split size is NOT narrow (it splits)
    p = str(tmp_path / "huge")
    _write_files(spark, p, 1)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) == 1
    old_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
        assert spread_narrow_scan(df) is df
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old_max)


# ---------------------------------------------------------------------------
# runner: exclusive run claim per run_id
# ---------------------------------------------------------------------------

def test_concurrent_same_run_id_refused(spark, tmp_path):
    manifest = str(tmp_path / "runs")
    started = threading.Event()
    release = threading.Event()
    errs: list[Exception] = []

    def slow_stage() -> int:
        started.set()
        assert release.wait(60)
        return 1

    def runner_a() -> None:
        try:
            run_incremental_pipeline(spark, manifest, "r1",
                                     [("s", slow_stage)])
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    t = threading.Thread(target=runner_a)
    t.start()
    try:
        assert started.wait(60)
        # the overlapping daily run: refused loudly, no interleaving
        with pytest.raises(ConcurrentRunError, match="r1"):
            run_incremental_pipeline(spark, manifest, "r1",
                                     [("s", lambda: 2)])
    finally:
        release.set()
        t.join(120)
    assert not errs
    assert read_run(spark, manifest, "r1")["s"] == ("done", 1)
    # claim released on completion: re-invoke is the done-run no-op
    assert run_incremental_pipeline(
        spark, manifest, "r1", [("s", lambda: 3)]) == {"s": 1}


def test_crashed_claim_blocks_until_lease_expiry(spark, tmp_path):
    manifest = str(tmp_path / "runs")
    # a hard-killed runner leaves its claim file behind
    assert put_if_absent(spark, f"{manifest}/_run_claims/r9.claim",
                         "deadbeef")
    with pytest.raises(ConcurrentRunError, match="lease"):
        run_incremental_pipeline(spark, manifest, "r9",
                                 [("s", lambda: 1)], claim_stale_s=3600)
    # after lease expiry exactly one resumer gets through
    assert run_incremental_pipeline(
        spark, manifest, "r9", [("s", lambda: 1)],
        claim_stale_s=0.0) == {"s": 1}


def test_failed_run_releases_claim(spark, tmp_path):
    manifest = str(tmp_path / "runs")

    def boom() -> int:
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        run_incremental_pipeline(spark, manifest, "rf", [("s", boom)])
    # in-process failure released the claim: immediate retry proceeds
    assert run_incremental_pipeline(
        spark, manifest, "rf", [("s", lambda: 7)]) == {"s": 7}


# ---------------------------------------------------------------------------
# fixture cache: content-keyed, self-invalidating
# ---------------------------------------------------------------------------

def test_fixture_cache_key_flips_on_source_change(tmp_path, monkeypatch):
    import tools.fixture_cache as fc

    monkeypatch.setenv("SPARK_GRAFT_FIXTURE_CACHE", str(tmp_path))
    root1 = fc.content_keyed_fixture_root()
    assert root1.startswith(str(tmp_path))
    # same source -> same key, dir kept
    assert fc.content_keyed_fixture_root() == root1

    # a source change flips the key; the old key is NOT pruned
    # immediately (it may belong to a live concurrent process) …
    real_key = fc._source_key
    monkeypatch.setattr(fc, "_source_key",
                        lambda root: "0" * 16)
    root2 = fc.content_keyed_fixture_root()
    assert root2 != root1
    import os
    assert os.path.exists(root1)  # within grace: survives
    # … but once idle past the grace period it is pruned
    old = 1.0  # epoch 1970 — idle far beyond any grace
    stamp = os.path.join(root1, fc._STAMP)
    os.utime(stamp, (old, old))
    os.utime(root1, (old, old))
    root2b = fc.content_keyed_fixture_root()
    assert root2b == root2
    assert not os.path.exists(root1)  # idle key pruned
    monkeypatch.setattr(fc, "_source_key", real_key)


def test_fixture_cache_respects_explicit_dir(tmp_path, monkeypatch):
    import tools.fixture_cache as fc

    monkeypatch.setenv("SPARK_GRAFT_FIXTURE_DIR", str(tmp_path / "pin"))
    assert fc.default_fixture_env() == str(tmp_path / "pin")


def test_usurped_claim_aborts_before_next_transition(spark, tmp_path):
    """A runner whose lease was expired by a usurper must abort at the
    next stage boundary (ConcurrentCommitError from claim.verify())
    instead of interleaving manifest transitions with the usurper."""
    import os

    from engagement_data_pipeline_spark.streaming.ingest import (
        ConcurrentCommitError)

    manifest = str(tmp_path / "runs")
    claim_path = f"{manifest}/_run_claims/ru.claim"

    def usurp() -> int:
        # simulate a lease expiry + takeover while stage 1 runs
        with open(claim_path, "w") as f:
            f.write("usurper")
        return 1

    done2 = []
    with pytest.raises(ConcurrentCommitError, match="usurped"):
        run_incremental_pipeline(spark, manifest, "ru", [
            ("s1", usurp),
            ("s2", lambda: done2.append(1) or 2)])
    # the victim is stopped by the post-refresh verify: s1 stays
    # 'started' (its stale watermark never overwrites the usurper's
    # manifest row) and s2 never runs
    assert not done2
    state = read_run(spark, manifest, "ru")
    assert state["s1"] == ("started", None)
    assert "s2" not in state
    # the usurper's claim was NOT deleted by the victim's release
    with open(claim_path) as f:
        assert f.read() == "usurper"
    os.remove(claim_path)


def test_bench_compare_prefers_spread_minima(tmp_path, capsys):
    """bench_compare must compare per-query MINIMA (queries_spread)
    when both artifacts carry them, and say so when one side falls
    back to best-run values."""
    import json
    import sys

    import tools.bench_compare as bc

    new = {"queries": {"a": 5.0, "b": 1.0},
           "queries_spread": {"a": [2.0, 5.0], "b": [1.0, 9.0]}}
    old = {"parsed": {"queries": {"a": 1.0, "b": 1.0},
                      "queries_spread": {"a": [1.0, 4.0],
                                         "b": [1.0, 2.0]}}}
    pn, po = tmp_path / "new.json", tmp_path / "old.json"
    pn.write_text(json.dumps(new))
    po.write_text(json.dumps(old))

    argv = sys.argv
    try:
        sys.argv = ["bench_compare.py", str(pn), str(po), "1.2"]
        bc.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    # a regressed 1.0 -> 2.0 via SPREAD minima (best-run would say 5x)
    assert "a: 1.00s -> 2.00s (2.0x)" in out
    assert "b:" not in out  # min flat even though max blew up
    assert "no queries_spread" not in out

    # old artifact without spreads -> fallback note printed
    po.write_text(json.dumps({"queries": {"a": 1.0}}))
    try:
        sys.argv = ["bench_compare.py", str(pn), str(po), "1.2"]
        bc.main()
    finally:
        sys.argv = argv
    assert "old artifact has no queries_spread" in \
        capsys.readouterr().out
