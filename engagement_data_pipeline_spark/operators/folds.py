"""Group-fold operators (SURVEY §2.5 G1/G3).

The reference folds all of a participant's messages into one row:
raw texts concatenated with "; " (FoldStrategies.concatenate,
column_view_conversion.py:228-232), operator sets joined with ";"
(column_view_conversion.py:263-288). In a distributed engine the fold
order must be made explicit to be deterministic, so these collect
(sort_key, value) structs and sort before joining — one shuffle, all
JVM-side (collect_list + array_sort + array_join, no Python UDFs).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fold_concat(df: DataFrame, group_cols: Sequence[str], value_col: str,
                sort_cols: Sequence[str], sep: str = "; ",
                out_col: str = "folded", extra_aggs: Sequence = ()) -> DataFrame:
    """Concatenate `value_col` per group in (sort_cols, value) order.

    `extra_aggs` lets callers compute sibling aggregates (counts,
    mins, …) in the same single shuffle instead of a second groupBy +
    join."""
    pair = F.struct(*[F.col(c) for c in sort_cols], F.col(value_col).alias("__v"))
    concat_agg = F.array_join(
        F.transform(F.array_sort(F.collect_list(pair)), lambda s: s["__v"]),
        sep,
    ).alias(out_col)
    return df.groupBy(*group_cols).agg(concat_agg, *extra_aggs)


def fold_distinct_concat(df: DataFrame, group_cols: Sequence[str],
                         value_col: str, sep: str = ";",
                         out_col: str = "folded") -> DataFrame:
    """G3: sorted distinct values per group, joined with `sep`."""
    return df.groupBy(*group_cols).agg(
        F.array_join(F.array_sort(F.collect_set(F.col(value_col))), sep).alias(out_col)
    )
