"""Registry query for PMI collocation extraction
(training/collocations.py); the oracle mirrors the rational score
with the identical operand order."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load
from ..training.collocations import pmi_collocations
from ._helpers import apply_runtime_conf

_MIN_COUNT = 5
_K = 50


def doc_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    return pmi_collocations(load(spark, sf_dir, "documents"),
                            min_count=_MIN_COUNT, k=_K)


DOC_PMI_COLLOCATIONS_SQL = rf"""
WITH norm AS (
  SELECT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
w AS (SELECT string_split(norm, ' ') AS w FROM norm),
toks AS (SELECT unnest(w) AS tok FROM w),
uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_w FROM toks GROUP BY tok),
tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tokens FROM toks),
pairs AS (
  SELECT w[i] AS w1, w[i+1] AS w2
  FROM w, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
pc AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM pairs GROUP BY w1, w2
),
tb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bigrams FROM pairs),
scored AS (
  SELECT p.w1, p.w2, p.n_pair,
         u1.n_w AS n_w1, u2.n_w AS n_w2,
         (CAST(p.n_pair AS DOUBLE) / CAST(tb.n_bigrams AS DOUBLE))
           / ((CAST(u1.n_w AS DOUBLE) / CAST(tn.n_tokens AS DOUBLE))
              * (CAST(u2.n_w AS DOUBLE) / CAST(tn.n_tokens AS DOUBLE)))
           AS pmi_ratio
  FROM pc p
  JOIN uni u1 ON p.w1 = u1.tok
  JOIN uni u2 ON p.w2 = u2.tok
  CROSS JOIN tn CROSS JOIN tb
  WHERE p.n_pair >= {_MIN_COUNT}
)
SELECT * FROM scored
ORDER BY pmi_ratio DESC, w1, w2 LIMIT {_K}
"""
