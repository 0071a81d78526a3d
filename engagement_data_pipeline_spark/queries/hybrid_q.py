"""Hybrid retrieval: BM25 lexical ranking fused with embedding ANN
ranking by reciprocal-rank fusion (training/ranking.py:rrf_fuse).

The fixture's three named queries each carry a term list (the BM25
side, cleaning_q.BM25_QUERIES) and a query vector (the embedding of
the correspondingly-numbered vec_id; documents and embeddings share
the 0..n id space at every sf). The oracle re-runs both ranking
pipelines as nested CTEs — the exact SQL already certified for
`doc_bm25_topk` and `ann_topk_bruteforce` — and fuses them with the
same fixed-operand-order arithmetic, so a hash match certifies the
full hybrid stack end-to-end."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from ..training import ranking as R
from ..training import similarity as S
from ._helpers import apply_runtime_conf
from .cleaning_q import BM25_QUERIES, _bm25_sql
from .similarity import _cosine_sql

#: query name -> vec_id whose embedding is the query vector
HYBRID_VECS = {"q_merge": 0, "q_scan": 1, "q_spark": 2}
RRF_K0 = 60
HYBRID_K = 10


def doc_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    lex = R.bm25_topk(load(spark, sf_dir, "documents"), BM25_QUERIES,
                      k=HYBRID_K)
    sem = S.cosine_topk(load(spark, sf_dir, "embeddings"),
                        sorted(HYBRID_VECS.values()), HYBRID_K)
    mapping = None
    for qname, vid in sorted(HYBRID_VECS.items()):
        cond = F.col("query_id") == F.lit(vid)
        mapping = (F.when(cond, F.lit(qname)) if mapping is None
                   else mapping.when(cond, F.lit(qname)))
    sem = sem.select(mapping.alias("query_id"),
                     F.col("vec_id").cast("long").alias("doc_id"), "rank")
    return R.rrf_fuse([lex.select("query_id", "doc_id", "rank"), sem],
                      k0=RRF_K0, k=HYBRID_K)


def _hybrid_sql() -> str:
    vec_in = "(" + ", ".join(str(v) for v in sorted(HYBRID_VECS.values())) + ")"
    name_case = ("CASE query_id " + " ".join(
        f"WHEN {vid} THEN '{qn}'" for qn, vid in sorted(HYBRID_VECS.items()))
        + " END")
    rr = "COALESCE(CAST(1 AS DOUBLE) / CAST({k0} + {r} AS DOUBLE), CAST(0 AS DOUBLE))"
    return f"""
WITH lex AS ({_bm25_sql(k=HYBRID_K)}),
sem0 AS (
  WITH q AS (
    SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
    WHERE vec_id IN {vec_in}
  ),
  scored AS (
    SELECT q.query_id, e.vec_id,
           {_cosine_sql("e.embedding", "q.q_emb")} AS cosine
    FROM embeddings e, q WHERE e.vec_id <> q.query_id
  )
  SELECT * FROM (
    SELECT query_id, vec_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
  ) WHERE rank <= {HYBRID_K}
),
sem AS (
  SELECT {name_case} AS query_id, CAST(vec_id AS BIGINT) AS doc_id, rank
  FROM sem0
),
fused AS (
  SELECT COALESCE(l.query_id, s.query_id) AS query_id,
         COALESCE(l.doc_id, s.doc_id) AS doc_id,
         {rr.format(k0=RRF_K0, r="l.rank")}
         + {rr.format(k0=RRF_K0, r="s.rank")} AS rrf_score
  FROM lex l
  FULL OUTER JOIN sem s
    ON l.query_id = s.query_id AND l.doc_id = s.doc_id
)
SELECT * FROM (
  SELECT query_id, doc_id, rrf_score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY rrf_score DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= {HYBRID_K}
"""


DOC_HYBRID_RRF_SQL = _hybrid_sql()
