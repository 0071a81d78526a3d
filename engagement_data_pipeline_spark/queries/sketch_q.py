"""Registry query for the count-min sketch (operators/stats.py):
heavy-hitter token frequencies estimated from a fixed d*w-cell sketch,
reported side-by-side with the exact counts so the oracle pins both
the sketch cells and the estimator, and the overestimate property
(estimate >= exact, tight for heavy hitters) is visible in the data."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.stats import CMS_DEPTH, CMS_WIDTH, cms_estimate, cms_sketch
from ..operators.topk import top_k_rows
from ..tables import load
from ..training.dedup import normalize_text
from ._helpers import apply_runtime_conf

_K = 50


def doc_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    docs = load(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(normalize_text(F.col("text")), " ")).alias("token"))
    exact = tokens.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"))
    top = top_k_rows(exact, [F.col("n_exact").desc(), F.col("token")], _K)
    sketch = cms_sketch(tokens, "token")
    est = cms_estimate(sketch, top.select("token"), "token")
    return (top.join(est, "token")
            .select("token", "n_exact", "cms_estimate"))


def _cms_sql() -> str:
    def pos(j: int, key: str) -> str:
        return (f"CAST(('0x' || substr(md5('cms{j}:' || {key}), 1, 15)) "
                f"AS BIGINT) % {CMS_WIDTH}")

    cells = "\nUNION ALL\n".join(
        f"SELECT {j} AS j, {pos(j, 'token')} AS pos, "
        f"CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY {pos(j, 'token')}"
        for j in range(CMS_DEPTH))
    probe = " ".join(
        f"WHEN {j} THEN {pos(j, 't.token')}" for j in range(CMS_DEPTH))
    return rf"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
tok AS (SELECT unnest(string_split(norm, ' ')) AS token FROM norm),
cells AS (
{cells}
),
exact AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_exact
          FROM tok GROUP BY token),
topk AS (SELECT token, n_exact FROM exact
         ORDER BY n_exact DESC, token LIMIT {_K})
SELECT t.token, t.n_exact, MIN(c.c) AS cms_estimate
FROM topk t JOIN cells c
  ON c.pos = (CASE c.j {probe} END)
GROUP BY t.token, t.n_exact
"""


DOC_CMS_HEAVY_HITTERS_SQL = _cms_sql()
