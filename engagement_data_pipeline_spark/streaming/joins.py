"""Stream-stream interval join — the streaming twin of the batch
`operators/temporal.range_join` (click→purchase attribution while
both sides are still arriving).

Structured Streaming keeps per-side state for a stream-stream join;
an unconstrained join's state grows forever. The interval form bounds
it the standard way (Spark SS docs, "inner joins with watermarking"):
both sides carry event-time watermarks AND the join condition bounds
the right timestamp to [left_ts + lower, left_ts + upper], so the
engine can evict left rows once the right watermark passes
left_ts + upper and right rows once the left watermark passes
right_ts - lower. State ≈ rows per watermark horizon, independent of
stream lifetime — the same bounded-state argument as
`dedup_within_watermark` (streaming/ingest.py).

The batch `range_join` is the replay/backfill path for the identical
semantics; the convergence test (tests/test_streaming_joins.py) runs
both over the same rows and asserts equal results — batch and
streaming must never drift, because a backfill rewrites what the
stream wrote.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(left: DataFrame, right: DataFrame,
                         key: str, left_ts: str, right_ts: str,
                         upper: str = "interval 10 minutes",
                         watermark: str = "10 minutes") -> DataFrame:
    """Inner join `right` rows to `left` rows with the same `key`
    where right_ts ∈ [left_ts, left_ts + upper]. Both inputs may be
    streaming (the state-bounded case), or either may be a static
    frame (Spark then plans a plain broadcast/shuffle join)."""
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = (right.withWatermark(right_ts, watermark)
          if right.isStreaming else right)
    cond = ((lw[key] == rw[key])
            & (rw[right_ts] >= lw[left_ts])
            & (rw[right_ts] <= lw[left_ts] + F.expr(upper)))
    # keep one unambiguous key column (they are equal by the join)
    return lw.join(rw, cond, "inner").drop(rw[key])
