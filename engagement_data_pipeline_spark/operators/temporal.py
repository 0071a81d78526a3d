"""Temporal joins Spark lacks as primitives: as-of join and bounded
range join.

The reference pipeline reasons about time with fixed configured ranges
(F5 `time_range_filter`) and incremental watermarks (O3); large-scale
engagement/training analytics additionally needs point-in-time
correlation — "the contact state as of this message", "all clicks
within 10 minutes before this purchase". Neither is a Spark builtin,
so both are re-expressed as scale-safe compositions:

- `asof_join` is ONE window pass over a tagged union — no join node at
  all. Both sides shuffle once on the match key, a running
  `last(ignorenulls)` carries the most recent right-side row forward,
  and left rows project it out. Wall-clock and shuffle volume are
  |L|+|R|, independent of time-skew, and there is no row blow-up (a
  join-then-filter as-of explodes on hot keys before filtering).
- `range_join` buckets time into fixed-width buckets and equi-joins on
  (key, bucket) for the covering buckets, then refines with the exact
  predicate. Candidate volume is bounded by rows-per-bucket, never the
  |L|x|R| product a raw inequality join plans as (BroadcastNestedLoop /
  cartesian). Bucket width = the window length, so each left row joins
  exactly 2 buckets.

Both keep every expression JVM-side (window + equi-join survive
whole-stage codegen; no Python touches the hot path).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              right_cols: Sequence[str]) -> DataFrame:
    """For every left row, attach the most recent right row with
    `right_ts <= left_ts` on the same `on` key (NULLs when none).

    `right` must be unique per (on, right_ts) — dedup first (e.g.
    latest_snapshot) or the carried columns are nondeterministic.
    Matches DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND
    l.ts >= r.ts` semantics, including ties (a right row exactly at
    `left_ts` matches: tag orders right before left within a ts).

    Output: all left columns, plus `right_ts` and `right_cols` from
    the matched right row.
    """
    on = list(on)
    carry = [right_ts, *right_cols]
    l_tagged = left.select(
        *on, F.col(left_ts), F.lit(1).alias(_TAG),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in carry],
        *[F.col(c) for c in left.columns if c not in {*on, left_ts}],
    )
    r_tagged = right.select(
        *on, F.col(right_ts).alias(left_ts), F.lit(0).alias(_TAG),
        *[F.col(c).alias(f"__r_{c}") for c in carry],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in {*on, left_ts}],
    )
    w = (Window.partitionBy(*on).orderBy(left_ts, _TAG)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = l_tagged.unionByName(r_tagged).select(
        "*",
        *[F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
          .alias(f"__m_{c}") for c in carry],
    )
    keep = [c for c in left.columns]
    return (carried.where(F.col(_TAG) == 1)
            .select(*keep,
                    *[F.col(f"__m_{c}").alias(c) for c in carry]))


def range_join(left: DataFrame, right: DataFrame, on: Sequence[str],
               left_ts: str, right_ts: str,
               window_seconds: int) -> DataFrame:
    """All (left, right) pairs on the same `on` key with
    `0 <= left_ts - right_ts <= window_seconds` ("right happened in
    the window before left").

    Scale shape: right rows land in bucket floor(ts/W); each left row
    probes its own bucket and the previous one (the window can span at
    most 2 buckets when W = window length). The join is a plain
    equi-join on (key, bucket) — hash-partitioned, AQE-skew-splittable
    — and the exact range predicate refines the bounded candidate set.
    """
    on = list(on)
    w_us = F.lit(int(window_seconds) * 1_000_000)
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    r_b = right.withColumn("__bucket", F.floor(r_us / w_us))
    l_b = left.withColumn(
        "__bucket", F.explode(F.array(F.floor(l_us / w_us),
                                      F.floor(l_us / w_us) - 1)))
    joined = l_b.join(r_b, [*on, "__bucket"])
    delta = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts))
    return (joined.where((delta >= 0) & (delta <= w_us))
            .drop("__bucket"))
