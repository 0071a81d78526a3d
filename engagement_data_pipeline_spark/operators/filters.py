"""Filter / routing operators (SURVEY §2.3).

Each is a declarative predicate or join, so Catalyst pushes what it
can into the parquet scan and plans anti/semi joins as broadcast when
one side is small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resolve_live_stale(df: DataFrame, status_col: str, live_value: str,
                       stale_value: str, partition_cols: Sequence[str]) -> DataFrame:
    """F4 live/stale resolution: keep every live row; keep stale rows
    only for partitions with no live row.

    Reference: src/common/get_messages_in_datasets.py:171-191 (keeps
    stale messages only for participants with no live message in the
    dataset). Expressed as a single window max — ONE pass over one
    shuffle of the input, where the naive split + anti-join form
    scans the (possibly 100 TB) input twice and shuffles both halves.
    """
    status = F.col(status_col)
    has_live = F.max((status == live_value).cast("int")).over(
        Window.partitionBy(*partition_cols))
    return (
        df.where(status.isin(live_value, stale_value))
        .withColumn("__has_live", has_live)
        .where((status == live_value) | (F.col("__has_live") == 0))
        .drop("__has_live")
    )


def time_range_filter(df: DataFrame, ts_col: str, gated_predicate: Column,
                      start, end, inclusive_end: bool = True) -> DataFrame:
    """F5 RQA time-range filter: rows matching `gated_predicate` must
    fall inside [start, end]; other rows pass through untouched.

    Reference: src/engagement_db_to_analysis/traced_data_filters.py:14-65
    (inclusive on both ends).
    """
    ts = F.col(ts_col)
    in_range = (ts >= start) & ((ts <= end) if inclusive_end else (ts < end))
    return df.where(~gated_predicate | in_range)


def exclude_values(df: DataFrame, col: str, values: Sequence) -> DataFrame:
    """F6 test-participant filter: drop rows whose `col` is in `values`.

    NULL `col` rows are kept — the reference's Python `not in` keeps
    None values (traced_data_filters.py:68-97), while a bare
    `~isin` predicate would evaluate NULL and silently drop them.
    """
    return df.where(~F.col(col).isin(list(values)) | F.col(col).isNull())


def allowlist_semi_join(df: DataFrame, allow: DataFrame,
                        on: Sequence[str]) -> DataFrame:
    """F10 allow-list filter as a left-semi join (broadcast when the
    allow-list is small). Reference:
    rapid_pro_to_engagement_db.py:245-250,325-342."""
    return df.join(allow, list(on), "left_semi")


def retraction_anti_join(df: DataFrame, retracted: DataFrame,
                         on: Sequence[str]) -> DataFrame:
    """F2 moved-message retraction: drop rows whose key appears in the
    retraction set. Reference: get_messages_in_datasets.py:76-99."""
    return df.join(retracted, list(on), "left_anti")


def timestamp_router(df: DataFrame, ts_col: str,
                     ranges: Sequence[tuple[str, str, str]],
                     out_col: str = "dataset") -> DataFrame:
    """F12 timestamp -> dataset router: assign the dataset whose
    [start, end) range covers the timestamp; drop rows matching none.

    Reference: src/csv_to_engagement_db/configuration.py:52-75 asserts
    non-overlap and drops unmatched rows. `ranges` is
    [(dataset, start_iso, end_iso), ...]; overlap is validated eagerly
    on the driver (config-sized, not data-sized).
    """
    parsed = sorted(ranges, key=lambda r: r[1])
    for (_, s1, e1), (_, s2, _) in zip(parsed, parsed[1:]):
        if s2 < e1:
            raise ValueError(f"overlapping ranges: {e1} > {s2}")
    ts = F.col(ts_col)
    expr = F.lit(None).cast("string")
    for name, start, end in reversed(parsed):
        expr = F.when((ts >= F.lit(start).cast("timestamp"))
                      & (ts < F.lit(end).cast("timestamp")), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr).where(F.col(out_col).isNotNull())
