"""Exact distributed order statistics.

Spark's `percentile_approx` is the right tool at 100 TB, but its
sketch is engine-specific, so cross-engine verification (and any
consumer needing exact quantiles — SLA percentiles on bounded
groups, say) wants the exact nearest-rank statistic: the element at
1-based rank ceil(p*n) of the group's sorted values. Computed with
one window pass per group (rank + group size share the partition
spec, so one exchange) and a conditional aggregation — no collect,
no interpolation arithmetic that two engines could round differently.

Integer rank math only: ceil(p*n) with p = num/100 is computed as
floor((num*n + 99) / 100); the division is exact in double for any
realistic n (result is either an exact integer — representable, so
rounds to itself — or ≥ 0.01 away from one, far beyond 1 ulp).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(df: DataFrame, group_cols: Sequence[str],
                      value_col: str,
                      percents: Sequence[int] = (50, 95),
                      tiebreak_cols: Sequence[str] = ()) -> DataFrame:
    """One row per group: n, min, max, and the nearest-rank p-th
    percentile value for each p in `percents` (columns p{p}). Ties in
    `value_col` don't affect the selected value; `tiebreak_cols` only
    pin the row order for engines that care."""
    group_cols = list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(value_col, *tiebreak_cols)
    ranked = df.select(
        *group_cols, value_col,
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
        .alias("__n"))
    aggs = [
        F.max("__n").cast("long").alias("n"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    ]
    for p in percents:
        rank = F.floor((F.lit(int(p)) * F.col("__n") + 99) / F.lit(100))
        aggs.append(
            F.max(F.when(F.col("__rn") == rank, F.col(value_col)))
            .alias(f"p{int(p)}"))
    return ranked.groupBy(*group_cols).agg(*aggs)
