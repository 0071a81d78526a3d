"""Registry query for one-pass column statistics
(operators/profile.py) over the orders table; the oracle is the
per-column UNION ALL a hand-written ANALYZE would run."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.profile import column_stats
from ..tables import load
from ._helpers import apply_runtime_conf

_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
         "o_orderpriority"]
_NUMERIC = {"o_orderkey", "o_custkey", "o_totalprice"}


def orders_col_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    return column_stats(load(spark, sf_dir, "orders"), _COLS)


def _stats_sql() -> str:
    parts = []
    for c in _COLS:
        mn = (f"CAST(MIN({c}) AS DOUBLE)" if c in _NUMERIC
              else "CAST(NULL AS DOUBLE)")
        mx = (f"CAST(MAX({c}) AS DOUBLE)" if c in _NUMERIC
              else "CAST(NULL AS DOUBLE)")
        parts.append(f"""
SELECT '{c}' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       {mn} AS min_value, {mx} AS max_value
FROM orders""")
    return " UNION ALL ".join(parts)


ORDERS_COL_STATS_SQL = _stats_sql()
