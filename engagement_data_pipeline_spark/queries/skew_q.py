"""Registry query demonstrating the skew kill-switch
(operators/skew.py) on a deliberately skewed key, hash-checked
against a plain COUNT(DISTINCT) oracle.

The fixture routes 80% of events onto one hot participant (the viral-
message shape: one sender dominating a dataset). A naive
COUNT(DISTINCT) groupBy concentrates that key's rows on a single
reducer; `salted_distinct_count` runs two shuffles — partial distinct
within (key, value-hash salt), then a sum merge — so no reducer ever
sees more than ~1/n_salts of the hot key. The result is identical,
which is exactly what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_distinct_count
from ..tables import load
from ._helpers import apply_runtime_conf

_HOT = "hot-participant"


def skew_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    ev = load(spark, sf_dir, "events")
    key = (F.when(F.col("event_id") % 5 != 4, F.lit(_HOT))
           .otherwise(F.concat(F.lit("avf-participant-uuid-"),
                               F.col("user_id").cast("string"))))
    msgs = ev.select(
        key.alias("participant"),
        F.concat(F.lit("reply "),
                 (F.col("event_id") % 100).cast("string")).alias("text"))
    return salted_distinct_count(msgs, ["participant"], "text",
                                 out_col="n_distinct_texts")


SKEW_SALTED_DISTINCT_SQL = f"""
WITH m AS (
  SELECT CASE WHEN event_id % 5 <> 4 THEN '{_HOT}'
              ELSE 'avf-participant-uuid-' || CAST(user_id AS VARCHAR) END
             AS participant,
         'reply ' || CAST(event_id % 100 AS VARCHAR) AS text
  FROM events
)
SELECT participant,
       CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct_texts
FROM m GROUP BY participant
"""
