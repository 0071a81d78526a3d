"""Registry query for batch sessionization (operators/sessions.py):
per-user activity sessions over the events table with a 30-minute
inactivity gap, hash-checked against the identical lag→cumsum→group
window pipeline in DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sessions import sessionize
from ._helpers import micros, t

_GAP_MIN = 30


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", order_cols=["event_id"],
                   gap_minutes=_GAP_MIN)
    return s.select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        F.col("n_events").cast("long").alias("n_events"),
        micros("session_start").alias("session_start_us"),
        micros("session_end").alias("session_end_us"),
    )


SESSIONIZE_EVENTS_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) > {_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts)) AS session_end_us
FROM numbered GROUP BY user_id, session_idx
"""


# --- native session_window parity -----------------------------------------

def sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME 30-minute-gap sessionization via Spark's built-in
    `session_window` aggregation (the streaming-capable native
    operator) instead of the custom lag→cumsum pipeline: per (user,
    session) event count and end-exclusive window bounds. The oracle
    re-derives the native operator's semantics — window end = last
    event + gap — with gaps-and-islands SQL, so a hash match pins
    that the custom sessionizer and the built-in agree on every
    boundary."""
    ev = t(spark, sf_dir, "events")
    return (ev.groupBy("user_id",
                       F.session_window("ts", f"{_GAP_MIN} minutes"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
            .select("user_id",
                    micros(F.col("session_window.start"))
                    .alias("win_start_us"),
                    micros(F.col("session_window.end")).alias("win_end_us"),
                    "n_events"))


SESSIONIZE_NATIVE_SQL = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR epoch(ts) - epoch(LAG(ts) OVER w) >= {_GAP_MIN * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
grouped AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id,
       epoch_us(MIN(ts)) AS win_start_us,
       epoch_us(MAX(ts) + INTERVAL {_GAP_MIN} MINUTE) AS win_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM grouped GROUP BY user_id, sid
"""
