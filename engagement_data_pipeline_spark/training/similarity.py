"""Similarity search over an embedding column (array<float>).

Two strategies:

* `cosine_topk` — brute force: the (small) query set is broadcast
  against the full embedding table; one scan computes all cosines,
  one rank window takes top-k per query. Exact; cost O(n·|Q|·d).
  This is the baseline and the verifier for the bucketed variant.
* `cosine_topk_lsh` — random-hyperplane LSH: each vector gets an
  nbits-bit signature (sign of the dot product with nbits
  deterministic pseudo-random integer hyperplanes derived from md5),
  and queries only compare against vectors in their own bucket. Cost
  O(n·nbits·d) signatures + bucket-local scoring — the scale path
  when |Q| is large: the candidate join shuffles on the bucket key
  instead of broadcasting every query against every row.

All arithmetic is float→double element casts followed by a
sequential left-to-right fold (F.aggregate), which DuckDB's
list_sum/list_transform reproduces bit-identically — verified on the
real testdata — so both operators have exact value-hash oracles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.topk import top_k_per_group

LSH_BITS = 8
HYPERPLANE_MOD = 2001
HYPERPLANE_SHIFT = 1000


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, query_ids: Sequence[int], k: int = 10,
                id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors, scan
    once, rank per query. Returns (query_id, vec_id, cosine, rank)."""
    q = (
        embeddings.where(F.col(id_col).isin(list(query_ids)))
        .select(F.col(id_col).alias("query_id"), F.col(emb_col).alias("q_emb"))
    )
    scored = (
        embeddings.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("query_id"))
        .select("query_id", F.col(id_col).alias("vec_id"),
                cosine(F.col(emb_col), F.col("q_emb")).alias("cosine"))
    )
    return top_k_per_group(scored, ["query_id"],
                           [F.col("cosine").desc(), F.col("vec_id")], k,
                           rank_col="rank")


def _hyperplane(bit: int, dim: Column) -> Column:
    """Deterministic pseudo-random integer coefficient for (bit, dim):
    md5-derived value in [-1000, 1000]."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.lit(f"hp{bit}:"), dim.cast("string"))), 1, 15),
        16, 10).cast("long")
    return (h % HYPERPLANE_MOD - HYPERPLANE_SHIFT).cast("double")


def lsh_bucket(emb: Column, nbits: int = LSH_BITS) -> Column:
    """Hyperplane-sign signature: bit j = 1 iff Σ_i c_{j,i}·v_i > 0."""
    bucket = F.lit(0).cast("long")
    for j in range(nbits):
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.sequence(F.lit(1), F.size(emb)),
                lambda x, i: x.cast("double") * _hyperplane(j, i),
            ),
            F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(proj > 0, F.lit(2 ** j)).otherwise(F.lit(0)).cast("long")
    return bucket


def cosine_topk_lsh(embeddings: DataFrame, query_ids: Sequence[int],
                    k: int = 10, nbits: int = LSH_BITS,
                    id_col: str = "vec_id", emb_col: str = "embedding") -> DataFrame:
    """Bucketed ANN: score only within the query's LSH bucket. The
    candidate join is an equi-join on the bucket key — at scale this
    shuffles each side once instead of broadcasting all queries
    everywhere. Approximate: recall vs `cosine_topk` depends on nbits
    (tested in tests/test_similarity.py)."""
    bucketed = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).alias("emb"),
        lsh_bucket(F.col(emb_col), nbits).alias("bucket"))
    q = (
        bucketed.where(F.col("vec_id").isin(list(query_ids)))
        .select(F.col("vec_id").alias("query_id"),
                F.col("emb").alias("q_emb"), "bucket")
    )
    scored = (
        bucketed.join(F.broadcast(q), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine(F.col("emb"), F.col("q_emb")).alias("cosine"))
    )
    return top_k_per_group(scored, ["query_id"],
                           [F.col("cosine").desc(), F.col("vec_id")], k,
                           rank_col="rank")
