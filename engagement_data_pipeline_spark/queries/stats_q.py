"""Registry query for exact order statistics (operators/stats.py):
per-event-type nearest-rank percentiles of the metric value — the
exact counterpart of the `percentile_approx` sketch a 100 TB run
would use (the operator docstring spells out the trade)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.stats import exact_percentiles
from ._helpers import t

_PS = (50, 95)


def events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return exact_percentiles(ev, ["event_type"], "value",
                             percents=_PS, tiebreak_cols=["event_id"])


EVENTS_PERCENTILES_SQL = f"""
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       MIN(value) AS min_value, MAX(value) AS max_value,
       MAX(CASE WHEN rn = floor((50 * n + 99) / 100)
                THEN value END) AS p50,
       MAX(CASE WHEN rn = floor((95 * n + 99) / 100)
                THEN value END) AS p95
FROM ranked GROUP BY event_type
"""
