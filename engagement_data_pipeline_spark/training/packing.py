"""Sequence packing and document chunking: the plan-level operators
that turn a curated corpus into model-ready inputs.

- `pack_plan` — concat-and-chunk packing (the standard pretraining
  recipe): documents are deterministically sharded, concatenated in a
  total order within each shard, and the token stream is cut every
  `budget` tokens. The placement of every document is a closed-form
  function of one windowed cumulative sum, so the whole plan is ONE
  shuffle (the per-shard window) regardless of corpus size, and shards
  scale the window parallelism — no single sort of the full corpus.

- `chunk_plan` — overlapping token windows per document (the RAG /
  long-context eval shape): chunk i covers token offsets
  [i*stride, i*stride + chunk). Pure per-row explode — zero shuffles,
  linear output in corpus size, embarrassingly parallel.

Both emit plans over token OFFSETS plus content hashes rather than
materialised token arrays: at 100 TB the tokenised payload writer
consumes the plan, it doesn't carry it through every exchange.

Determinism note: shard assignment uses the repo's single cross-engine
hash idiom (training/dedup.py:md5_long), and in-shard order is doc_id
— both reproducible bit-for-bit in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import md5_long, normalize_text

#: Defaults sized for the synthetic docs (10-99 words); production
#: values are budget=seq_len (2k-8k), shards≈cluster cores.
PACK_BUDGET = 256
PACK_SHARDS = 8
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


def pack_plan(docs: DataFrame, budget: int = PACK_BUDGET,
              n_shards: int = PACK_SHARDS,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document placement in the packed token stream:
    (doc_id, shard, n_tokens, start_offset, seq_first, seq_last).

    A document whose span crosses a budget boundary straddles
    sequences (seq_last > seq_first) — concat-and-chunk semantics; the
    no-straddle variant is a post-filter on this plan, not a new one.
    """
    ntok = F.size(F.split(normalize_text(F.col(text_col)), " ")) \
        .cast("long")
    shard = F.pmod(md5_long(F.col(id_col).cast("string")),
                   F.lit(n_shards)).cast("long")
    base = docs.select(F.col(id_col).alias("doc_id"),
                       shard.alias("shard"), ntok.alias("n_tokens"))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("n_tokens").over(w)
    out = base.select(
        "doc_id", "shard", "n_tokens",
        (cum - F.col("n_tokens")).alias("start_offset"),
        cum.alias("__cum"))
    # integer `div` keeps the boundary math exact (no double rounding)
    return out.select(
        "doc_id", "shard", "n_tokens", "start_offset",
        F.expr(f"start_offset div {budget}").alias("seq_first"),
        F.expr(f"(__cum - 1) div {budget}").alias("seq_last"))


def pack_plan_sql(budget: int = PACK_BUDGET,
                  n_shards: int = PACK_SHARDS) -> str:
    """DuckDB mirror of `pack_plan` over the `documents` view."""
    return rf"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
tok AS (
  SELECT doc_id,
         CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % {n_shards} AS shard
  FROM norm
),
cum AS (
  SELECT *, SUM(n_tokens) OVER (
      PARTITION BY shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM tok
)
SELECT doc_id, shard, n_tokens,
       CAST(c - n_tokens AS BIGINT) AS start_offset,
       CAST((c - n_tokens) // {budget} AS BIGINT) AS seq_first,
       CAST((c - 1) // {budget} AS BIGINT) AS seq_last
FROM cum
"""


def chunk_plan(docs: DataFrame, chunk: int = CHUNK_TOKENS,
               stride: int = CHUNK_STRIDE,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Overlapping token-window chunks per document:
    (doc_id, chunk_idx, tok_start, tok_end, n_chunk_tokens, chunk_md5).

    chunk_md5 hashes the space-joined token slice — the downstream
    embedding/index stage's content key, and the value the oracle
    recomputes to pin slicing semantics exactly. Requires
    stride <= chunk (windows must tile the document)."""
    if stride > chunk:
        raise ValueError(f"stride {stride} > chunk {chunk} leaves gaps")
    w = F.split(normalize_text(F.col(text_col)), " ")
    n = F.size(w).cast("long")
    n_chunks = (F.lit(1) + F.ceil(
        F.greatest(n - chunk, F.lit(0)).cast("double") / stride)
        .cast("long"))
    base = docs.select(F.col(id_col).alias("doc_id"), w.alias("__w"),
                       n.alias("__n"), n_chunks.alias("__k"))
    idx = F.explode(F.sequence(F.lit(0).cast("long"),
                               F.col("__k") - 1)).alias("chunk_idx")
    ex = base.select("doc_id", "__w", "__n", idx)
    tok_start = F.col("chunk_idx") * stride
    tok_end = F.least(tok_start + chunk, F.col("__n"))
    piece = F.array_join(
        F.slice(F.col("__w"), (tok_start + 1).cast("int"),
                (tok_end - tok_start).cast("int")), " ")
    return ex.select(
        "doc_id", F.col("chunk_idx").cast("int").alias("chunk_idx"),
        tok_start.alias("tok_start"), tok_end.alias("tok_end"),
        (tok_end - tok_start).alias("n_chunk_tokens"),
        F.md5(piece).alias("chunk_md5"))


def chunk_plan_sql(chunk: int = CHUNK_TOKENS,
                   stride: int = CHUNK_STRIDE) -> str:
    """DuckDB mirror of `chunk_plan` over the `documents` view."""
    return rf"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
w AS (
  SELECT doc_id, string_split(norm, ' ') AS w,
         CAST(len(string_split(norm, ' ')) AS BIGINT) AS n
  FROM norm
),
k AS (
  SELECT *, 1 + CAST(CEIL(CAST(greatest(n - {chunk}, 0) AS DOUBLE)
                          / {stride}) AS BIGINT) AS n_chunks
  FROM w
),
ex AS (
  SELECT doc_id, w, n, unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
  FROM k
)
SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST(chunk_idx * {stride} AS BIGINT) AS tok_start,
       CAST(least(chunk_idx * {stride} + {chunk}, n) AS BIGINT) AS tok_end,
       CAST(least(chunk_idx * {stride} + {chunk}, n)
            - chunk_idx * {stride} AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(
         list_slice(w, chunk_idx * {stride} + 1,
                    least(chunk_idx * {stride} + {chunk}, n)), ' '))
         AS chunk_md5
FROM ex
"""
