"""Registry query for deterministic train/val/test assignment
(training/splits.py): exact per-source counts, salted-hash order. The
oracle mirrors the identical window + integer-boundary arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load
from ..training import splits as S
from ._helpers import apply_runtime_conf


def doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    return S.split_assign_exact(docs, strata_cols=("source",))


def _split_sql() -> str:
    cuts = []
    cum = 0
    for name, num in S.DEFAULT_SPLITS[:-1]:
        cum += num
        cuts.append(f"WHEN r < (n * {cum}) // {S.DEFAULT_DEN} "
                    f"THEN '{name}'")
    last = S.DEFAULT_SPLITS[-1][0]
    return f"""
WITH h AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5('split-v1|' || CAST(doc_id AS VARCHAR)),
                              1, 15)) AS BIGINT) AS u
  FROM documents
),
r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY u, doc_id) - 1 AS r,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM h
)
SELECT doc_id, source,
       CASE {' '.join(cuts)} ELSE '{last}' END AS split
FROM r
"""


DOC_SPLIT_ASSIGN_SQL = _split_sql()


def doc_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold CV assignment over the corpus (training/splits.py:
    kfold_assign) — hash-stable, zero-shuffle, leave-one-fold-out
    ready. The oracle recomputes every fold id from the shared md5
    idiom, so the hash match certifies the full assignment."""
    apply_runtime_conf(spark)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return S.kfold_assign(docs, 5)


DOC_KFOLD_ASSIGN_SQL = """
SELECT doc_id,
       CAST(CAST(('0x' || substr(md5('kfold-v1|' || CAST(doc_id AS VARCHAR)),
                  1, 15)) AS BIGINT) % 5 AS INTEGER) AS fold
FROM documents
"""
