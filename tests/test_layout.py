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
