"""Registry query for bigram language-model domain scoring
(training/lm.py) with an exact DuckDB oracle mirroring the same
add-one arithmetic and position-ordered probability fold."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load
from ..training import lm as LM
from ._helpers import apply_runtime_conf

#: Target domain for the fit: the English slice of the corpus (CCNet
#: fits its LM on trusted in-language text and scores the whole crawl).
TARGET_LANG = "en"

_MD5_LONG = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    docs = load(spark, sf_dir, "documents")
    target = docs.where(docs["lang"] == TARGET_LANG)
    return LM.bigram_lm_score(target, docs)


def _lm_sql() -> str:
    bg_h = _MD5_LONG.format(x="bg")
    w1_of_bg_h = _MD5_LONG.format(x="string_split(bg, ' ')[1]")
    return rf"""WITH
tgt AS (
  SELECT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents WHERE lang = '{TARGET_LANG}'
),
tw AS (SELECT string_split(norm, ' ') AS w FROM tgt),
tex AS (
  SELECT w[i] || ' ' || w[i+1] AS bg
  FROM tw, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
cb AS (
  SELECT {bg_h} AS bg_h, {w1_of_bg_h} AS w1_h,
         CAST(COUNT(*) AS BIGINT) AS n_bg
  FROM tex GROUP BY 1, 2
),
cp AS (SELECT w1_h, CAST(SUM(n_bg) AS BIGINT) AS n_prefix
       FROM cb GROUP BY w1_h),
vocab AS (
  SELECT CAST(COUNT(DISTINCT wu) AS BIGINT) AS vocab_n
  FROM (SELECT unnest(w) AS wu FROM tw)
),
n AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
sw AS (SELECT doc_id, string_split(norm, ' ') AS w FROM n),
sex AS (
  SELECT doc_id, i AS pos,
         w[i] || ' ' || w[i+1] AS bg, w[i] AS w1
  FROM sw, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
sexh AS (
  SELECT doc_id, pos, {bg_h} AS bg_h, {_MD5_LONG.format(x='w1')} AS w1_h
  FROM sex
),
j AS (
  SELECT s.doc_id, s.pos,
         CAST(COALESCE(cb.n_bg, 0) + 1 AS DOUBLE)
           / CAST(COALESCE(cp.n_prefix, 0) + v.vocab_n AS DOUBLE) AS p,
         cb.n_bg IS NOT NULL AS seen
  FROM sexh s
  LEFT JOIN cb ON s.bg_h = cb.bg_h
  LEFT JOIN cp ON s.w1_h = cp.w1_h
  CROSS JOIN vocab v
),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(CASE WHEN seen THEN 1 ELSE 0 END) AS BIGINT) AS n_seen,
         list_sum(list(p ORDER BY pos)) AS sum_p
  FROM j GROUP BY doc_id
)
SELECT n.doc_id,
       COALESCE(per.n_bigrams, 0) AS n_bigrams,
       COALESCE(per.n_seen, 0) AS n_seen,
       COALESCE(per.sum_p, 0.0) AS sum_p,
       CASE WHEN per.n_bigrams > 0
            THEN per.sum_p / CAST(per.n_bigrams AS DOUBLE)
            ELSE 0.0 END AS mean_p
FROM n LEFT JOIN per ON n.doc_id = per.doc_id
"""


DOC_LM_SCORE_SQL = _lm_sql()


# --- DSIR-style importance weights ----------------------------------------

def doc_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance = likelihood ratio of each doc under the en-slice
    model vs the whole-corpus model (training/lm.py:importance_weights
    — the DSIR selection weight)."""
    apply_runtime_conf(spark)
    docs = load(spark, sf_dir, "documents")
    target = docs.where(docs["lang"] == TARGET_LANG)
    return LM.importance_weights(target, docs)


def _importance_sql() -> str:
    bg_h = _MD5_LONG.format(x="bg")
    w1_of_bg_h = _MD5_LONG.format(x="string_split(bg, ' ')[1]")

    def model(alias: str, where: str) -> str:
        return f"""
{alias}n AS (
  SELECT regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
  FROM documents{where}
),
{alias}w AS (SELECT string_split(norm, ' ') AS w FROM {alias}n),
{alias}ex AS (
  SELECT w[i] || ' ' || w[i+1] AS bg
  FROM {alias}w, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
{alias}cb AS (
  SELECT {bg_h} AS bg_h, {w1_of_bg_h} AS w1_h,
         CAST(COUNT(*) AS BIGINT) AS n_bg
  FROM {alias}ex GROUP BY 1, 2
),
{alias}cp AS (SELECT w1_h, CAST(SUM(n_bg) AS BIGINT) AS n_prefix
              FROM {alias}cb GROUP BY w1_h),
{alias}v AS (
  SELECT CAST(COUNT(DISTINCT wu) AS BIGINT) AS vocab_n
  FROM (SELECT unnest(w) AS wu FROM {alias}w)
)"""

    return rf"""WITH {model('t', f" WHERE lang = '{TARGET_LANG}'")[1:]},
{model('r', '')[1:]},
n AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
sw AS (SELECT doc_id, string_split(norm, ' ') AS w FROM n),
sex AS (
  SELECT doc_id, i AS pos, w[i] || ' ' || w[i+1] AS bg, w[i] AS w1
  FROM sw, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
sexh AS (
  SELECT doc_id, pos, {bg_h} AS bg_h, {_MD5_LONG.format(x='w1')} AS w1_h
  FROM sex
),
j AS (
  SELECT s.doc_id, s.pos,
         CAST(COALESCE(tcb.n_bg, 0) + 1 AS DOUBLE)
           / CAST(COALESCE(tcp.n_prefix, 0) + tv.vocab_n AS DOUBLE) AS pt,
         CAST(COALESCE(rcb.n_bg, 0) + 1 AS DOUBLE)
           / CAST(COALESCE(rcp.n_prefix, 0) + rv.vocab_n AS DOUBLE) AS pr
  FROM sexh s
  LEFT JOIN tcb ON s.bg_h = tcb.bg_h
  LEFT JOIN tcp ON s.w1_h = tcp.w1_h
  LEFT JOIN rcb ON s.bg_h = rcb.bg_h
  LEFT JOIN rcp ON s.w1_h = rcp.w1_h
  CROSS JOIN tv CROSS JOIN rv
),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         list_sum(list(pt ORDER BY pos)) AS sum_p_target,
         list_sum(list(pr ORDER BY pos)) AS sum_p_raw
  FROM j GROUP BY doc_id
)
SELECT n.doc_id,
       COALESCE(per.n_bigrams, 0) AS n_bigrams,
       COALESCE(per.sum_p_target, 0.0) AS sum_p_target,
       COALESCE(per.sum_p_raw, 0.0) AS sum_p_raw,
       CASE WHEN per.n_bigrams IS NULL OR per.sum_p_raw = 0 THEN 1.0
            ELSE per.sum_p_target / per.sum_p_raw END AS importance
FROM n LEFT JOIN per ON n.doc_id = per.doc_id
"""


DOC_IMPORTANCE_WEIGHTS_SQL = _importance_sql()
