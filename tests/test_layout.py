"""Tests for the partitioned/sorted table layout (sinks/layout.py):
partition pruning and row-group skipping must be visible in the plan
and in the files actually read."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.sinks.layout import (
    files_read, prune_evidence, read_layout, write_partitioned)


def _events(spark, n=1000):
    return (spark.range(n)
            .select(F.col("id").alias("event_id"),
                    (F.col("id") % 7).alias("day"),
                    (F.col("id") % 53).alias("user_id"),
                    F.md5(F.col("id").cast("string")).alias("payload")))


def test_layout_one_file_per_partition(spark, tmp_path):
    path = str(tmp_path / "t1")
    write_partitioned(_events(spark), path, ["day"], ["user_id"])
    for d in range(7):
        files = [f for f in os.listdir(f"{path}/day={d}")
                 if f.endswith(".parquet")]
        assert len(files) == 1


def test_layout_partition_pruning_in_plan_and_files(spark, tmp_path):
    path = str(tmp_path / "t2")
    write_partitioned(_events(spark), path, ["day"], ["user_id"])
    scan = read_layout(spark, path).where(F.col("day") == 3)
    ev = prune_evidence(scan)
    assert "day" in ev["partition_filters"]
    # 7 day-partitions, one file each: the filtered scan must touch
    # exactly one file.
    assert files_read(scan) == 1
    assert files_read(read_layout(spark, path)) == 7
    assert scan.count() == _events(spark).where("day = 3").count()


def test_layout_pushed_filter_on_sort_key(spark, tmp_path):
    path = str(tmp_path / "t3")
    write_partitioned(_events(spark), path, ["day"], ["user_id"])
    scan = read_layout(spark, path).where(F.col("user_id") == 10)
    ev = prune_evidence(scan)
    assert "user_id" in ev["pushed_filters"]


def test_layout_rows_sorted_within_file(spark, tmp_path):
    path = str(tmp_path / "t4")
    write_partitioned(_events(spark), path, ["day"], ["user_id"])
    # Row order inside one partition's single file is the write-time
    # sort order — read it back without a shuffle and check.
    one = read_layout(spark, read_path := f"{path}/day=3")
    got = [r.user_id for r in one.collect()]
    assert got == sorted(got)


def test_layout_salted_split_bounds_partition_file_count(spark, tmp_path):
    path = str(tmp_path / "t5")
    write_partitioned(_events(spark, 5000), path, ["day"], ["user_id"],
                      max_files_per_partition=4)
    for d in range(7):
        files = [f for f in os.listdir(f"{path}/day={d}")
                 if f.endswith(".parquet")]
        assert 1 <= len(files) <= 4
    total = read_layout(spark, path).count()
    assert total == 5000


# --- Z-order ---------------------------------------------------------------

def test_zorder_key_interleaves_bits(spark):
    from engagement_data_pipeline_spark.sinks.layout import zorder_key
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0b101, 0b011)], "x long, y long").select(
        zorder_key(["x", "y"], bits=3).alias("z"))
    # x bits at even positions, y bits at odd: x=101,y=011 →
    # z = 1·2^0 + 1·2^1 + 0·2^2 + 1·2^3 + 1·2^4 + 0·2^5 = 0b011011
    assert df.first()["z"] == 0b011011


def test_zorder_key_bounds(spark):
    import pytest as _pytest

    from engagement_data_pipeline_spark.sinks.layout import zorder_key
    with _pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=32)  # 64 bits > 63


def test_zorder_layout_skips_files_on_both_dims(spark, tmp_path):
    """The point of Z-order vs linear sort: with footer min/max
    skipping, a filter on EITHER dimension touches a strict subset of
    a Z-ordered table's files, while the linear layout only skips on
    its leading sort column."""
    from pyspark.sql import functions as F

    from engagement_data_pipeline_spark.sinks.layout import (
        file_range_skip_evidence, write_zordered)

    n, bits, files = 4096, 6, 16
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        (F.floor(F.col("id") / 64)).cast("long").alias("y"),
        F.col("id").alias("payload"))

    zpath = str(tmp_path / "z")
    write_zordered(df, zpath, [F.col("x"), F.col("y")], files, bits=bits)
    lpath = str(tmp_path / "linear")
    (df.repartitionByRange(files, "x").sortWithinPartitions("x")
     .write.parquet(lpath))

    zx = file_range_skip_evidence(zpath, "x", 3, 4)
    zy = file_range_skip_evidence(zpath, "y", 3, 4)
    lx = file_range_skip_evidence(lpath, "x", 3, 4)
    ly = file_range_skip_evidence(lpath, "y", 3, 4)
    assert zx[1] == files and zy[1] == files
    # z-order skips on both dimensions…
    assert zx[0] <= files // 2 and zy[0] <= files // 2
    # …the linear layout only on its sort column
    assert lx[0] <= files // 2
    assert ly[0] == ly[1]
