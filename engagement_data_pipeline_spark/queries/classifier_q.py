"""Registry query for linear-classifier inference
(training/classifier.py). Weights are a deterministic fixture (the
engine's job is inference, not training); the oracle mirrors the
hashing-trick bucket index and the position-ordered margin fold, with
weight literals emitted via repr() so both engines parse the exact
same doubles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from ..training.classifier import hashed_bigram_margin
from ._helpers import apply_runtime_conf

N_BUCKETS = 64
#: Deterministic pseudo-weights in [-1, 1] (Knuth multiplicative mix).
WEIGHTS = [(((i * 2654435761 + 12345) % 2001) - 1000) / 1000.0
           for i in range(N_BUCKETS)]


def doc_classifier_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    docs = load(spark, sf_dir, "documents")
    margin = hashed_bigram_margin(F.col("text"), WEIGHTS)
    return docs.select(
        "doc_id", margin.alias("margin"),
        (margin > F.lit(0.0)).alias("keep"))


def _classifier_sql() -> str:
    # 'e0' suffix: DuckDB lexes bare decimal literals as DECIMAL and
    # would sum in decimal arithmetic; scientific notation forces the
    # same IEEE doubles Spark's F.lit array carries.
    wlit = "[" + ", ".join(f"{w!r}e0" for w in WEIGHTS) + "]"
    md5l = "CAST(('0x' || substr(md5(bg), 1, 15)) AS BIGINT)"
    return rf"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
w AS (SELECT doc_id, string_split(norm, ' ') AS w FROM norm),
g AS (
  SELECT doc_id, i AS pos, w[i] || ' ' || w[i+1] AS bg
  FROM w, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
f AS (
  SELECT doc_id, pos,
         ({wlit})[CAST({md5l} % {N_BUCKETS} AS INT) + 1] AS wt
  FROM g
),
per AS (
  SELECT doc_id, list_sum(list(wt ORDER BY pos)) AS margin
  FROM f GROUP BY doc_id
)
SELECT n.doc_id, COALESCE(per.margin, 0.0) AS margin,
       COALESCE(per.margin, 0.0) > 0.0 AS keep
FROM norm n LEFT JOIN per ON n.doc_id = per.doc_id
"""


DOC_CLASSIFIER_MARGIN_SQL = _classifier_sql()
