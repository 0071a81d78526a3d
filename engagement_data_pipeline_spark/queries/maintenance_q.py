"""Registry queries for incremental aggregate-state maintenance and
deterministic per-group sampling.

`agg_state_merge` is its own oracle-grade proof: the Spark side
maintains the rollup INCREMENTALLY (state from pre-cut versions, one
batch of post-cut versions folded in via merge_aggregate_state) while
the DuckDB oracle recomputes the same rollup from all history in one
pass — hash equality IS the merge-equals-recompute theorem on real
data (the incremental_replay pattern, applied to aggregates)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import aggregate_state, merge_aggregate_state
from ..operators.topk import deterministic_group_sample
from ..sources.synthetic import MESSAGES_CTE
from ..tables import load
from . import engagement
from ._helpers import apply_runtime_conf, micros

_METRICS = {
    "n_versions": ("message_id", "count"),
    "first_update_us": ("lu_us", "min"),
    "last_update_us": ("lu_us", "max"),
    "sum_text_chars": ("text_len", "sum"),
}


def agg_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    msgs = engagement._messages(spark, sf_dir).select(
        "message_id", "dataset", micros("last_updated").alias("lu_us"),
        F.coalesce(F.length("text"), F.lit(0)).cast("long")
        .alias("text_len"))
    lo, hi = msgs.agg(F.min("lu_us"), F.max("lu_us")).first()
    cut = (lo + hi) // 2
    state = aggregate_state(msgs.where(F.col("lu_us") <= cut),
                            ["dataset"], _METRICS)
    batch = aggregate_state(msgs.where(F.col("lu_us") > cut),
                            ["dataset"], _METRICS)
    merged = merge_aggregate_state(state, batch, ["dataset"], _METRICS)
    return merged.select("dataset", "n_versions", "first_update_us",
                         "last_update_us", "sum_text_chars")


# The oracle recomputes from ALL history — equality proves the merge.
AGG_STATE_MERGE_SQL = "WITH " + MESSAGES_CTE + """
SELECT dataset,
       CAST(COUNT(message_id) AS BIGINT) AS n_versions,
       MIN(epoch_us(last_updated)) AS first_update_us,
       MAX(epoch_us(last_updated)) AS last_update_us,
       CAST(SUM(COALESCE(length(text), 0)) AS BIGINT) AS sum_text_chars
FROM messages
GROUP BY dataset
"""


_SAMPLE_K = 5
_SAMPLE_SALT = "sample-v1"


def events_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample of events by salted-md5 order
    of event_id — reproducible eval-set / spot-check drawing."""
    apply_runtime_conf(spark)
    ev = load(spark, sf_dir, "events").select("event_type", "event_id")
    return deterministic_group_sample(ev, ["event_type"], "event_id",
                                     _SAMPLE_K, salt=_SAMPLE_SALT)


EVENTS_GROUP_SAMPLE_SQL = f"""
SELECT event_type, event_id FROM (
  SELECT event_type, event_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY CAST(('0x' || substr(md5('{_SAMPLE_SALT}:'
                     || CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT),
                    event_id) AS rn
  FROM events
) WHERE rn <= {_SAMPLE_K}
"""


# --- HLL sketch-state merge ------------------------------------------------

def hll_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-state maintenance proof: HLL registers built separately
    over two halves of events (event_id parity — a stand-in for two
    shards or two ingest increments), merged with hll_merge, then
    estimated. The oracle recomputes the sketch over ALL events in one
    pass — hash equality is sketch(A ∪ B) == merge(sketch(A),
    sketch(B)) on real data."""
    from ..operators.stats import (hll_estimate_from_registers, hll_merge,
                                   hll_registers)
    from ..training.dedup import md5_long

    ev = load(spark, sf_dir, "events")
    apply_runtime_conf(spark)
    h = md5_long(F.col("user_id").cast("string"))
    even = hll_registers(ev.where(F.col("event_id") % 2 == 0),
                         ["event_type"], h)
    odd = hll_registers(ev.where(F.col("event_id") % 2 == 1),
                        ["event_type"], h)
    merged = hll_merge(even, odd, ["event_type"])
    return hll_estimate_from_registers(merged, ["event_type"])


def _hll_state_merge_sql() -> str:
    from ..operators import stats as ST

    wb = ST.HLL_W_BITS
    ladder = " ".join(
        f"WHEN w >= {1 << (wb - r)} THEN {r}" for r in range(1, wb + 1))
    h = "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
WITH hashed AS (
  SELECT event_type,
         {h} & {ST.HLL_M - 1} AS b,
         {h} >> {ST.HLL_P} AS w
  FROM events
),
terms AS (
  SELECT event_type, b, CASE {ladder} ELSE {wb + 1} END AS rho FROM hashed
),
regs AS (
  SELECT event_type, b,
         MIN(CAST(1 AS BIGINT) << ({ST.HLL_SHIFT} - rho)) AS m
  FROM terms GROUP BY event_type, b
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_registers,
       {ST.HLL_K!r} / CAST(CAST(SUM(m) + ({ST.HLL_M} - COUNT(*))
             * (CAST(1 AS BIGINT) << {ST.HLL_SHIFT}) AS BIGINT) AS DOUBLE)
         AS hll_estimate
FROM regs GROUP BY event_type
"""


HLL_STATE_MERGE_SQL = _hll_state_merge_sql()
