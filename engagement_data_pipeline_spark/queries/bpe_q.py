r"""Registry query for the BPE tokenizer fit (training/bpe.py).

The oracle re-runs the ENTIRE iterative fit in pure SQL, one chained
CTE block per merge round, over the row-based (word, pos, sym) form:
pair counts via LEAD, argmax via ORDER BY cnt DESC, l, r LIMIT 1 as
scalar subqueries, and the greedy leftmost-non-overlapping merge via
gaps-and-islands parity (marks at consecutive positions — only
possible when left == right — keep odd offsets within each run, and
the row after a kept mark is consumed). Spark applies the same rule
as a sequential array fold; the final tokenized frequency table
hash-matching across the two mechanisms is the proof that the fold
implements canonical BPE semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load
from ..training.bpe import bpe_fit, bpe_token_counts
from ._helpers import apply_runtime_conf

N_MERGES = 8


def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit 8 BPE merges on the documents corpus (one corpus pass + 8
    vocabulary-sized rounds) and return the resulting token frequency
    table — certifying both the learned merge sequence and its
    application."""
    apply_runtime_conf(spark)
    merges, vocab = bpe_fit(load(spark, sf_dir, "documents"), N_MERGES)
    return bpe_token_counts(vocab)


def _round(k: int, prev: str) -> str:
    b = f"b{k}"
    return f"""
p{k} AS MATERIALIZED (
  SELECT l, r, SUM(wc) AS cnt FROM (
    SELECT wc, sym AS l,
           LEAD(sym) OVER (PARTITION BY word ORDER BY pos) AS r
    FROM {prev}
  ) WHERE r IS NOT NULL GROUP BY l, r
),
{b} AS MATERIALIZED (SELECT l, r FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1),
m{k} AS (
  SELECT word, wc, pos, sym,
         COALESCE(sym = (SELECT l FROM {b})
                  AND LEAD(sym) OVER (PARTITION BY word ORDER BY pos)
                      = (SELECT r FROM {b}), FALSE) AS mk
  FROM {prev}
),
g{k} AS (
  SELECT *, CASE WHEN mk THEN pos - ROW_NUMBER() OVER (
      PARTITION BY word, mk ORDER BY pos) END AS run
  FROM m{k}
),
k{k} AS (
  SELECT *, mk AND (ROW_NUMBER() OVER (
      PARTITION BY word, run ORDER BY pos) % 2 = 1) AS keep
  FROM g{k}
),
w{k} AS MATERIALIZED (
  SELECT word, wc,
         ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS pos,
         CASE WHEN keep THEN sym || (SELECT r FROM {b}) ELSE sym END AS sym
  FROM (SELECT *, COALESCE(LAG(keep) OVER (
            PARTITION BY word ORDER BY pos), FALSE) AS prev_keep
        FROM k{k})
  WHERE NOT prev_keep
)"""


def _bpe_sql(n_merges: int = N_MERGES) -> str:
    rounds = ",".join(_round(k, f"w{k - 1}" if k else "w0")
                      for k in range(1, n_merges + 1))
    return rf"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
words AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS wc FROM (
    SELECT unnest(string_split(norm, ' ')) AS word FROM norm
  ) WHERE len(word) > 0 GROUP BY word
),
w0a AS (
  SELECT word, wc, unnest(generate_series(1, len(word))) AS pos FROM words
),
w0 AS MATERIALIZED (
  SELECT word, wc, pos, substr(word, pos, 1) AS sym FROM w0a
  UNION ALL
  SELECT word, wc, len(word) + 1 AS pos, '</w>' AS sym FROM words
),
{rounds}
SELECT sym AS token, CAST(SUM(wc) AS BIGINT) AS total_count
FROM w{n_merges} GROUP BY sym
"""


DOC_BPE_TOKENS_SQL = _bpe_sql()


# NOTE: MATERIALIZED is load-bearing, not an optimization nicety —
# each round references its predecessor twice (pair counts + merge
# application), so inlined CTEs re-evaluate the whole prefix 2^N
# times (observed: "Too many open files" from re-opened parquet
# scans at N=8).
