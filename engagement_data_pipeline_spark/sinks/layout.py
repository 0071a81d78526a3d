"""Analytics-table layout: partitioned + sorted parquet so reads
prune partitions and skip row groups.

The reference archives full-table CSV/JSON snapshots to GCS and
re-reads everything on every run (`upload_archive_files.py:93-131`,
SURVEY §2.2 K8); at 100 TB the table layout IS the query plan: a scan
with a time filter must touch only the matching date directories
(partition pruning — Catalyst's PartitionFilters), and within a file
the parquet row-group min/max stats must let the reader skip pages
(achieved by sorting within partitions on the filter key).

`write_partitioned` encodes the two rules:

* partition by a LOW-cardinality derived key (e.g. event day) —
  one directory per value, so the number of partitions is bounded and
  planners prune by path without touching data;
* sort WITHIN each partition by the high-cardinality probe keys so
  each output file covers a narrow key range and min/max skipping
  works. `repartition(partition keys)` first, so every (partition,
  task) writes exactly one file instead of tasks × partitions
  fragments.

`prune_evidence` returns the pushed partition filters and data
filters of a scan over the layout — the machine-checkable form of
"this read only touched the partitions it needed" used by the tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(df: DataFrame, path: str,
                      partition_cols: Sequence[str],
                      sort_cols: Sequence[str],
                      max_files_per_partition: int = 1) -> None:
    """Write `df` as a partitioned, partition-sorted parquet table.

    The shuffle keys are the partition columns (plus an optional
    file-splitting salt when one partition's data exceeds a single
    task), and rows are sorted within each task by (partition, sort)
    keys, so every output file holds one partition's rows in sort
    order — bounded file counts AND tight row-group min/max ranges.
    """
    parts = [F.col(c) for c in partition_cols]
    if max_files_per_partition > 1:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in sort_cols]),
                      F.lit(max_files_per_partition))
        shuffled = df.repartition(*parts, salt)
    else:
        shuffled = df.repartition(*parts)
    (shuffled
     .sortWithinPartitions(*[F.col(c) for c in
                             list(partition_cols) + list(sort_cols)])
     .write.mode("overwrite").partitionBy(*partition_cols)
     .parquet(path))


def read_layout(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def prune_evidence(df: DataFrame) -> dict[str, str]:
    """Extract `PartitionFilters` and `PushedFilters` from the scan
    node of `df`'s executed plan — empty strings when absent. Lets a
    test assert 'this filter pruned at plan time' instead of trusting
    the docstring."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    def grab(label: str) -> str:
        m = re.search(rf"{label}: \[([^\]]*)\]", plan)
        return m.group(1) if m else ""
    return {"partition_filters": grab("PartitionFilters"),
            "pushed_filters": grab("PushedFilters")}


def files_read(df: DataFrame) -> int:
    """Execute `df`'s exact physical plan and return the scan's
    `numFiles` metric — how many files the pruned read actually
    touched (`DataFrame.inputFiles` lists the whole relation, filter
    or not, so it cannot witness pruning)."""
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    leaf = qe.executedPlan().collectLeaves().apply(0)
    return int(leaf.metrics().apply("numFiles").value())
