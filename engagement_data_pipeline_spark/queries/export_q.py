"""Training-export planning queries: epoch shard plan, target-mixture
rate solver, and fuzzy entity matching.

These are the steps between a cleaned corpus and trainer-ready shards
(SURVEY §2.2's export sinks generalized to pre-training scale):
decide each document's shard+position for an epoch, solve the
per-stratum sampling rates that hit a target language mixture, and
catch near-identical entities that exact keys miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.fuzzy import fuzzy_pairs_ed1
from ..training.sampling import SCALE, mixture_rate_plan
from ..training.sharding import shard_plan
from ..training.text import spread_narrow_scan
from ._helpers import t
from .training import _md5_long_sql

# --- epoch shard plan -----------------------------------------------------

_N_SHARDS = 8
_EPOCH = 1


def doc_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return (shard_plan(docs, _N_SHARDS, _EPOCH)
            .select("doc_id", "shuffle_key", "shard", "pos_in_shard"))


DOC_SHARD_PLAN_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         {_md5_long_sql("'epoch" + str(_EPOCH) + ":' || CAST(doc_id AS VARCHAR)")} AS h
  FROM documents
)
SELECT doc_id,
       h AS shuffle_key,
       CAST(h % {_N_SHARDS} AS INT) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY h % {_N_SHARDS}
                               ORDER BY h, doc_id) AS BIGINT) AS pos_in_shard
FROM keyed
"""

# --- target-mixture rate solver -------------------------------------------

# Target language shares as exact rationals (sum = 1). zh is the
# scarcest stratum relative to its share, so it binds the budget.
_MIX_TARGETS = {"en": (1, 2), "de": (1, 10), "es": (1, 10),
                "fr": (1, 10), "zh": (1, 5)}
_MIX_PLAN_SALT = "mixplan-v1"


def doc_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    return mixture_rate_plan(docs, _MIX_TARGETS, stratify_col="lang",
                             salt=_MIX_PLAN_SALT)


def _mixture_plan_sql() -> str:
    values = ", ".join(f"('{v}', {n}, {d})"
                       for v, (n, d) in sorted(_MIX_TARGETS.items()))
    h = _md5_long_sql(f"'{_MIX_PLAN_SALT}:' || CAST(doc_id AS VARCHAR)")
    return f"""
WITH targets(lang, target_num, target_den) AS (VALUES {values}),
counts AS (
  SELECT lang, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY lang
),
plan AS (
  SELECT c.lang, c.n_docs, t.target_num, t.target_den,
         MIN(CAST(FLOOR((c.n_docs::DECIMAL(38,0) * t.target_den::DECIMAL(38,0))
                        / t.target_num::DECIMAL(38,0)) AS BIGINT)) OVER () AS budget_total
  FROM counts c JOIN targets t USING (lang)
),
thr AS (
  SELECT *, CAST(FLOOR((target_num::DECIMAL(38,0) * budget_total::DECIMAL(38,0)
                        * {SCALE}::DECIMAL(38,0))
                       / (target_den::DECIMAL(38,0) * n_docs::DECIMAL(38,0)))
                 AS BIGINT) AS thr
  FROM plan
),
kept AS (
  SELECT d.lang, COUNT(*)::BIGINT AS n_kept
  FROM documents d JOIN thr ON d.lang = thr.lang
  WHERE {h} % {SCALE} < thr.thr
  GROUP BY d.lang
)
SELECT thr.lang AS stratum, thr.n_docs, thr.target_num, thr.target_den,
       thr.budget_total, thr.thr,
       COALESCE(kept.n_kept, 0)::BIGINT AS n_kept
FROM thr LEFT JOIN kept ON thr.lang = kept.lang
"""


DOC_MIXTURE_PLAN_SQL = _mixture_plan_sql()

# --- fuzzy entity matching ------------------------------------------------


def cust_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = spread_narrow_scan(
        t(spark, sf_dir, "customer").select("c_custkey", "c_name"))
    return fuzzy_pairs_ed1(cust, "c_custkey", "c_name")


# The oracle verifies against the O(n²) ground truth (length-banded to
# keep DuckDB's cross product sane): hash-matching it proves the
# deletion-neighborhood blocking really has 100% recall on this data.
CUST_FUZZY_MATCH_SQL = """
SELECT a.c_custkey AS left_key, b.c_custkey AS right_key,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND abs(length(a.c_name) - length(b.c_name)) <= 1
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""
