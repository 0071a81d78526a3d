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


def merge_label_lists(df: DataFrame, group_cols: Sequence[str],
                      labels_col: str = "labels",
                      out_col: str = "labels") -> DataFrame:
    """G1's label half — FoldStrategies.list_of_labels (reference
    column_view_conversion.py:244-251): merge every row's label list
    into one per group, keeping only the LATEST label per scheme
    (newest-first), ordered newest-first by (date_time_utc DESC,
    scheme_id) for determinism.

    One aggregation: flatten the per-row arrays, sort descending by
    time, then keep each scheme's first occurrence via an aggregate
    fold — all JVM-side higher-order functions, no UDAF object
    needed."""
    flat = F.flatten(F.collect_list(F.col(labels_col)))
    # sort newest-first: array_sort on (negated micros, scheme_id)
    keyed = F.transform(
        flat, lambda l: F.struct(
            (-F.unix_micros(l["date_time_utc"])).alias("neg_ts"),
            l["scheme_id"].alias("s"),
            l.alias("l")))
    newest_first = F.transform(F.array_sort(keyed), lambda x: x["l"])
    # keep first label per scheme
    merged = F.aggregate(
        newest_first,
        F.expr(f"CAST(array() AS {_labels_ddl()})"),
        lambda acc, l: F.when(
            F.exists(acc, lambda a: a["scheme_id"] == l["scheme_id"]), acc
        ).otherwise(F.concat(acc, F.array(l))),
    )
    return df.groupBy(*group_cols).agg(merged.alias(out_col))


def _labels_ddl() -> str:
    from ..labels.schema import LABELS_TYPE

    return LABELS_TYPE.simpleString()
