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


#: Inference-batching defaults, sized for the synthetic docs; serving
#: values are caps like (512, 1024, 2048, 4096) and batch_size per
#: accelerator memory.
BATCH_CAPS = (32, 64, 128)
BATCH_SIZE = 8
BATCH_SHARDS = 4


def batch_plan(docs: DataFrame, caps: tuple[int, ...] = BATCH_CAPS,
               batch_size: int = BATCH_SIZE, n_shards: int = BATCH_SHARDS,
               text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length-bucketed inference batching: assign every document to a
    fixed-shape batch (bucket_cap, shard, batch_id) and report each
    batch's padding waste — the serving-side sibling of `pack_plan`
    (batch inference over a 100 TB corpus dies on padding if short and
    long sequences share a batch; bucketing by length cap bounds the
    waste to cap - longest-real-length per row).

    * bucket_cap = smallest configured cap >= n_tokens (docs longer
      than the largest cap are truncated to it: n_tokens_eff).
    * shard = md5-hash partition inside a bucket, so batch numbering
      needs no global sequence: each (cap, shard) windows
      independently — parallelism = |caps| x n_shards, and any shard's
      batches can be re-planned without touching the rest. The cost is
      <= one ragged tail batch per (cap, shard) instead of per cap.
    * within a shard, docs order by (n_tokens_eff DESC, doc_id) —
      deterministic, and near-homogeneous batches if the runner pads
      dynamically instead of to the cap.

    Returns batch-grain rows (bucket_cap, shard, batch_id, n_docs,
    sum_tokens, padding_waste) — all integer arithmetic, so the plan
    is bit-reproducible cross-engine. ONE shuffle (the per-(cap,shard)
    window), then a subset-regroup aggregation on the same keys.
    """
    from .dedup import md5_long

    ntok = F.size(F.split(normalize_text(F.col(text_col)), " ")).cast("long")
    cap_expr = None
    for cap in sorted(caps):
        cond = F.col("n_tokens") <= F.lit(cap)
        cap_expr = (F.when(cond, F.lit(cap)) if cap_expr is None
                    else cap_expr.when(cond, F.lit(cap)))
    cap_expr = cap_expr.otherwise(F.lit(max(caps))).cast("long")
    base = (docs.select(F.col(id_col).alias("doc_id"),
                        ntok.alias("n_tokens"))
            .select("doc_id", "n_tokens", cap_expr.alias("bucket_cap"))
            .select("doc_id", "bucket_cap",
                    F.least(F.col("n_tokens"),
                            F.col("bucket_cap")).alias("n_tokens_eff"),
                    F.pmod(md5_long(F.concat(F.lit("batch:"),
                                             F.col("doc_id").cast("string"))),
                           F.lit(n_shards)).cast("long").alias("shard")))
    w = Window.partitionBy("bucket_cap", "shard").orderBy(
        F.col("n_tokens_eff").desc(), F.col("doc_id"))
    placed = base.select(
        "bucket_cap", "shard", "n_tokens_eff",
        F.row_number().over(w).alias("rn")
    ).select("bucket_cap", "shard", "n_tokens_eff",
             # integer `div`: exact batch numbering, no double rounding
             F.expr(f"(rn - 1) div {int(batch_size)}").cast("long")
             .alias("batch_id"))
    return (placed.groupBy("bucket_cap", "shard", "batch_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tokens_eff").cast("long").alias("sum_tokens"))
            .select("bucket_cap", "shard", "batch_id", "n_docs", "sum_tokens",
                    (F.col("bucket_cap") * F.col("n_docs")
                     - F.col("sum_tokens")).alias("padding_waste")))


def batch_plan_sql(caps: tuple[int, ...] = BATCH_CAPS,
                   batch_size: int = BATCH_SIZE,
                   n_shards: int = BATCH_SHARDS) -> str:
    """DuckDB mirror of `batch_plan` over the `documents` view."""
    cap_case = "CASE " + " ".join(
        f"WHEN n_tokens <= {c} THEN {c}" for c in sorted(caps)
    ) + f" ELSE {max(caps)} END"
    return rf"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
  FROM documents
),
tok AS (
  SELECT doc_id,
         CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens,
         CAST(('0x' || substr(md5('batch:' || CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % {n_shards} AS shard
  FROM norm
),
capped AS (
  SELECT doc_id, shard,
         CAST({cap_case} AS BIGINT) AS bucket_cap,
         CAST(LEAST(n_tokens, {max(caps)}) AS BIGINT) AS n_tokens_eff
  FROM tok
),
placed AS (
  SELECT bucket_cap, shard, n_tokens_eff,
         CAST((ROW_NUMBER() OVER (
             PARTITION BY bucket_cap, shard
             ORDER BY n_tokens_eff DESC, doc_id) - 1) // {batch_size}
           AS BIGINT) AS batch_id
  FROM capped
)
SELECT bucket_cap, shard, batch_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens_eff) AS BIGINT) AS sum_tokens,
       CAST(bucket_cap * COUNT(*) - SUM(n_tokens_eff) AS BIGINT)
         AS padding_waste
FROM placed GROUP BY bucket_cap, shard, batch_id
"""
