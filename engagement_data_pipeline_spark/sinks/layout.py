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


def zorder_key(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton (Z-order) key: bit-interleave `bits` low bits of each
    integer column into one bigint. Files sorted by this key cover a
    contiguous Z-range = a stack of small rectangles in the key space,
    so parquet min/max stats stay tight on EVERY interleaved dimension
    at once — a filter on any single dimension skips most files,
    which a linear sort can only offer for its leading column (the
    Delta OPTIMIZE ZORDER BY idea, here as a pure column expression).

    Callers pass already-bounded ints (e.g. ``user_id % 2**bits``, a
    day number); values above 2**bits wrap via their low bits, which
    preserves locality only within a wrap — bound the domain first.
    The expression is `len(cols) * bits` disjoint shifted bits summed
    together: whole-stage-codegen arithmetic, no UDF, and exactly
    mirrorable in SQL (& >> << are IEEE-free integer ops).
    """
    ndims = len(cols)
    if not (1 <= ndims * bits <= 63):
        raise ValueError("zorder_key needs 1 <= dims*bits <= 63")
    parts = []
    for d, c in enumerate(cols):
        x = (F.col(c) if isinstance(c, str) else c).cast("long")
        x = x.bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            bit = F.shiftright(x, i).bitwiseAND(F.lit(1))
            parts.append(F.shiftleft(bit, i * ndims + d))
    key = parts[0]
    for p in parts[1:]:
        key = key + p  # disjoint bit positions: + == |
    return key.cast("long")


def write_zordered(df: DataFrame, path: str,
                   zcols: Sequence[Column | str], n_files: int,
                   bits: int = 16) -> None:
    """Write `df` as `n_files` parquet files range-partitioned AND
    sorted by the Z-order key of `zcols` — multi-dimensional
    clustering for a table probed on several independent keys.
    `repartitionByRange` samples the key distribution, so files hold
    balanced row counts even when the key space is sparse. The key
    itself is not persisted: it is a pure function of the columns,
    recomputed at read time if ever needed."""
    key = zorder_key(zcols, bits)
    (df.withColumn("__zkey", key)
     .repartitionByRange(n_files, F.col("__zkey"))
     .sortWithinPartitions("__zkey")
     .drop("__zkey")
     .write.mode("overwrite").parquet(path))


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


def file_range_skip_evidence(path: str, column: str,
                             lo: int, hi: int) -> tuple[int, int]:
    """(files whose footer min/max intersects [lo, hi], total files) —
    read straight from the parquet footers with pyarrow. This is the
    machine-checkable form of "a reader with min/max skipping touches
    only k of n files for this predicate": engine-independent (any
    parquet reader sees the same footers), and unlike the scan-node
    `numFiles` metric it witnesses STATS tightness, which Spark only
    exploits per row-group (every file is still opened)."""
    import glob
    import os

    import pyarrow.parquet as pq

    touched = total = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        fmin = fmax = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema != column or col.statistics is None:
                    continue
                st = col.statistics
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
        total += 1
        if fmin is None or (fmax >= lo and fmin <= hi):
            touched += 1  # no stats → must read
    return touched, total


def files_read(df: DataFrame) -> int:
    """Execute `df`'s exact physical plan and return the scan's
    `numFiles` metric — how many files the pruned read actually
    touched (`DataFrame.inputFiles` lists the whole relation, filter
    or not, so it cannot witness pruning)."""
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    leaf = qe.executedPlan().collectLeaves().apply(0)
    return int(leaf.metrics().apply("numFiles").value())
