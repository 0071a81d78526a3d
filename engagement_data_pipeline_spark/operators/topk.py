"""Top-K per group (SURVEY §2.10 O5 / §2.7 A6).

Reference: automated_analysis.py:102-106 caps sample messages at 100
per code. Expressed as a rank window — one shuffle on the group key;
at scale Spark's WindowGroupLimit pushes the limit below the sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(df: DataFrame, group_cols: Sequence[str],
                    order_by: Sequence[Column], k: int,
                    rank_col: str | None = None) -> DataFrame:
    """Keep the top `k` rows per group under a *total* order
    (include a unique tiebreaker in `order_by` for determinism)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    out = df.withColumn("__rank", F.row_number().over(w)).where(F.col("__rank") <= k)
    if rank_col:
        return out.withColumnRenamed("__rank", rank_col)
    return out.drop("__rank")


def top_k_rows(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global deterministic top-k under a *total* order (include a
    unique tiebreaker). Plans as TakeOrderedAndProject: each partition
    keeps its local top-k, the driver merges — no full sort, no
    shuffle of the losing rows."""
    return df.orderBy(*order_by).limit(k)


def deterministic_group_sample(df: DataFrame, group_cols: Sequence[str],
                               key_col: str, k: int,
                               salt: str = "sample-v1") -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by md5 order of
    the salted key — a reproducible stand-in for per-group reservoir
    sampling (eval-set construction, per-source spot checks). One
    window pass; changing the salt redraws the sample, while adding
    rows to a group perturbs only the sample's boundary."""
    from pyspark.sql import Window
    from ..training.dedup import md5_long

    h = md5_long(F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    w = Window.partitionBy(*group_cols).orderBy(h, F.col(key_col))
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k).drop("__rn"))
