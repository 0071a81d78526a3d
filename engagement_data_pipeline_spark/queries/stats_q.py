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


# --- HyperLogLog distinct sketch -----------------------------------------

from ..operators import stats as ST  # noqa: E402
from ..training.dedup import md5_long  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users, exact AND by a bit-replicable
    HyperLogLog sketch (operators/stats.py:hll_distinct): at 100 TB
    the exact countDistinct is the expensive path (full shuffle of
    the distinct keys) and the 64-register sketch is the cheap one;
    here both are emitted so the oracle pins the sketch's exact
    register arithmetic AND the estimate's error is visible."""
    ev = t(spark, sf_dir, "events")
    sketch = ST.hll_distinct(
        ev, ["event_type"],
        md5_long(F.col("user_id").cast("string")))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact"))
    return (sketch.join(exact, "event_type")
            .select("event_type", "n_exact", "n_registers",
                    "hll_estimate"))


def _hll_sql() -> str:
    wb = ST.HLL_W_BITS
    ladder = " ".join(
        f"WHEN w >= {1 << (wb - r)} THEN {r}" for r in range(1, wb + 1))
    h = "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
WITH hashed AS (
  SELECT event_type, user_id,
         {h} & {ST.HLL_M - 1} AS b,
         {h} >> {ST.HLL_P} AS w
  FROM events
),
terms AS (
  SELECT event_type, b,
         CASE {ladder} ELSE {wb + 1} END AS rho
  FROM hashed
),
regs AS (
  SELECT event_type, b,
         MIN(CAST(1 AS BIGINT) << ({ST.HLL_SHIFT} - rho)) AS m
  FROM terms GROUP BY event_type, b
),
sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_registers,
         CAST(SUM(m) + ({ST.HLL_M} - COUNT(*))
              * (CAST(1 AS BIGINT) << {ST.HLL_SHIFT}) AS BIGINT) AS s
  FROM regs GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT s.event_type, e.n_exact, s.n_registers,
       {ST.HLL_K!r} / CAST(s.s AS DOUBLE) AS hll_estimate
FROM sums s JOIN exact e ON s.event_type = e.event_type
"""


EVENTS_HLL_DISTINCT_SQL = _hll_sql()
