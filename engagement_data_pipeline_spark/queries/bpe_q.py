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

#: (applicationId, sf_dir) -> (merges, vocab): the fit is consumed by
#: both bpe queries; like the engagement-spine plan cache, memoizing
#: per session avoids paying the 8 collect rounds twice per bench run
_FIT_CACHE: dict[tuple[str, str], tuple[list, object]] = {}


def _fit(spark: SparkSession, sf_dir: str):
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _FIT_CACHE.get(key)
    if got is None:
        got = bpe_fit(load(spark, sf_dir, "documents"), N_MERGES)
        _FIT_CACHE[key] = got
    return got


def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit 8 BPE merges on the documents corpus (one corpus pass + 8
    vocabulary-sized rounds) and return the resulting token frequency
    table — certifying both the learned merge sequence and its
    application."""
    apply_runtime_conf(spark)
    merges, vocab = _fit(spark, sf_dir)
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


# --- model-ready token ids -------------------------------------------------

def doc_bpe_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document with the fitted tokenizer and emit token
    IDS (vocabulary ranked by frequency desc, token asc — the
    conventional id assignment): (doc_id, n_tokens, ids) with ids
    comma-joined. Spark encodes via the zero-shuffle fold chain
    (`bpe_encode`) with the id map as a plan literal (a BPE vocab is
    alphabet + n_merges entries — always literal-sized); the oracle
    re-derives each document's segmentation from the fitted SYMBOL
    TABLE (word → per-position syms) instead, so the hash match
    proves encode-by-fold == the fit's own segmentation, doc by doc."""
    from pyspark.sql import functions as F

    from ..training.bpe import bpe_encode, bpe_token_counts

    apply_runtime_conf(spark)
    docs = load(spark, sf_dir, "documents")
    merges, vocab = _fit(spark, sf_dir)
    counts = bpe_token_counts(vocab).collect()
    ranked = sorted(counts, key=lambda r: (-r.total_count, r.token))
    ids = {r.token: i for i, r in enumerate(ranked)}
    id_map = F.create_map(*[F.lit(x) for kv in ids.items() for x in kv])
    enc = bpe_encode(docs, merges)
    return enc.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.array_join(
            F.transform(F.col("tokens"),
                        lambda tk: F.element_at(id_map, tk).cast("string")),
            ",").alias("ids"))


def _bpe_ids_sql(n_merges: int = N_MERGES) -> str:
    base = _bpe_sql(n_merges)
    # reuse the fit CTEs: strip the final token-count SELECT
    cte_block = base[:base.rindex("SELECT sym AS token")]
    return cte_block + f""",
counts AS (
  SELECT sym, SUM(wc) AS total_count FROM w{n_merges} GROUP BY sym
),
ids AS (
  SELECT sym, ROW_NUMBER() OVER (ORDER BY total_count DESC, sym) - 1 AS id
  FROM counts
),
dw0 AS (
  SELECT doc_id, string_split(norm, ' ') AS ws FROM norm
),
dw1 AS (
  SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS wpos FROM dw0
),
dw AS (
  SELECT doc_id, wpos, ws[wpos] AS word FROM dw1 WHERE len(ws[wpos]) > 0
),
toks AS (
  SELECT d.doc_id, d.wpos, s.pos, i.id
  FROM dw d JOIN w{n_merges} s USING (word) JOIN ids i ON s.sym = i.sym
),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         array_to_string(list(CAST(id AS VARCHAR) ORDER BY wpos, pos), ',')
           AS ids
  FROM toks GROUP BY doc_id
)
SELECT n.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
       COALESCE(a.ids, '') AS ids
FROM norm n LEFT JOIN agg a ON n.doc_id = a.doc_id
"""


DOC_BPE_IDS_SQL = _bpe_ids_sql()
