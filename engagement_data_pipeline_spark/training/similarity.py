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


def hard_negatives(embeddings: DataFrame, query_ids: Sequence[int],
                   k: int = 10, id_col: str = "vec_id",
                   emb_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """HARD-NEGATIVE mining for contrastive training (DPR, Karpukhin
    et al. 2020; SimCSE): random in-batch negatives are easy — the
    informative negatives are each anchor's NEAREST neighbors carrying
    a DIFFERENT label. Broadcast the anchors, scan once, keep per
    anchor the k most-similar differently-labeled vectors. Returns
    (query_id, anchor_label, vec_id, neg_label, cosine, rank).

    Same shape as `cosine_topk` (one broadcast + one scan + per-anchor
    top-k, TakeOrderedAndProject — never a global sort); for
    corpus-wide mining (every doc an anchor) swap the broadcast for
    the LSH/IVF bucket equi-join of `cosine_topk_lsh` — the label
    filter composes unchanged."""
    q = (embeddings.where(F.col(id_col).isin(list(query_ids)))
         .select(F.col(id_col).alias("query_id"),
                 F.col(emb_col).alias("q_emb"),
                 F.col(label_col).alias("anchor_label")))
    scored = (
        embeddings.crossJoin(F.broadcast(q))
        .where(F.col(label_col) != F.col("anchor_label"))
        .select("query_id", "anchor_label",
                F.col(id_col).alias("vec_id"),
                F.col(label_col).alias("neg_label"),
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


def _hyperplane_py(bit: int, dim: int) -> float:
    """Python mirror of _hyperplane — same md5-derived integer, so a
    plan-time coefficient literal equals the runtime-hashed column."""
    import hashlib

    h = int(hashlib.md5(f"hp{bit}:{dim}".encode()).hexdigest()[:15], 16)
    return float(h % HYPERPLANE_MOD - HYPERPLANE_SHIFT)


def lsh_bucket(emb: Column, nbits: int = LSH_BITS,
               dim: int | None = None) -> Column:
    """Hyperplane-sign signature: bit j = 1 iff Σ_i c_{j,i}·v_i > 0.

    When the embedding dimension is known at plan time (`dim`), the
    coefficient matrix is embedded as literals — no per-row md5 work
    (nbits·dim hashes per row otherwise). Products and the sequential
    fold order are identical in both paths, so the resulting buckets
    (and the SQL oracle) agree exactly. A vector whose length differs
    from `dim` fails the task loudly (zip_with would otherwise
    null-pad and silently send every row to bucket 0)."""
    bucket = F.lit(0).cast("long")
    for j in range(nbits):
        if dim is not None:
            coeffs = F.lit([_hyperplane_py(j, i)
                            for i in range(1, dim + 1)]).cast("array<double>")
            prods = F.zip_with(emb, coeffs,
                               lambda x, c: x.cast("double") * c)
        else:
            prods = F.zip_with(
                emb,
                F.sequence(F.lit(1), F.size(emb)),
                lambda x, i: x.cast("double") * _hyperplane(j, i),
            )
        proj = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(proj > 0, F.lit(2 ** j)).otherwise(F.lit(0)).cast("long")
    if dim is not None:
        bucket = F.when(F.size(emb) == dim, bucket).otherwise(F.raise_error(
            F.concat(F.lit(f"lsh_bucket: embedding length != dim={dim}: "),
                     F.size(emb).cast("string"))).cast("long"))
    return bucket


def cosine_topk_lsh(embeddings: DataFrame, query_ids: Sequence[int],
                    k: int = 10, nbits: int = LSH_BITS,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    dim: int | None = None) -> DataFrame:
    """Bucketed ANN: score only within the query's LSH bucket. The
    candidate join is an equi-join on the bucket key — at scale this
    shuffles each side once instead of broadcasting all queries
    everywhere. Approximate: recall vs `cosine_topk` depends on nbits
    (tested in tests/test_similarity.py)."""
    bucketed = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).alias("emb"),
        lsh_bucket(F.col(emb_col), nbits, dim=dim).alias("bucket"))
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


# --- IVF-flat -------------------------------------------------------------

IVF_CENTROID_IDS = tuple(range(0, 112, 7))   # 16 spread seed vectors
IVF_NPROBE = 4


def _nearest_cells(emb: Column, cents: list[tuple[int, list[float], float]],
                   n: int) -> Column:
    """The ids of the `n` nearest centroids (cosine DESC, cid ASC).

    The whole centroid table enters the plan as three literal arrays
    (matrix, norms, negated ids) — single Literal nodes regardless of
    C, so both the driver-side expression build and codegen stay
    O(1) in centroid count — and one `transform` over centroid
    indices computes every cosine with the same sequential fold as
    `cosine` (bit-identical to the DuckDB mirror). The per-vector
    norm is folded once and shared. Pure projection: no join, no
    shuffle."""
    vnorm = _norm(emb)
    cmat = F.lit([cvec for _, cvec, _ in cents])
    cnorms = F.lit([cn for _, _, cn in cents])
    cneg = F.lit([float(-cid) for cid, _, _ in cents])

    def cell_struct(i: Column) -> Column:
        dot = F.aggregate(
            F.zip_with(emb, F.get(cmat, i), lambda x, c: x.cast("double") * c),
            F.lit(0.0), lambda acc, x: acc + x)
        return F.struct((dot / (vnorm * F.get(cnorms, i))).alias("c"),
                        F.get(cneg, i).alias("n"))

    ranked = F.reverse(F.array_sort(
        F.transform(F.sequence(F.lit(0), F.lit(len(cents) - 1)), cell_struct)))
    return F.transform(F.slice(ranked, 1, n),
                       lambda s: (-s["n"]).cast("long"))


def seed_centroids_ivf(embeddings: DataFrame,
                       centroid_ids: Sequence[int] = IVF_CENTROID_IDS,
                       id_col: str = "vec_id", emb_col: str = "embedding"
                       ) -> list[tuple[int, list[float], float]]:
    """The deterministic seed centroid table [(cid, vector, norm)]:
    fixed vector ids, centroid id == the seed's vec_id (the convention
    `ANN_TOPK_IVF_SQL` mirrors). Norms use the same sequential fold as
    `_norm`, so a plan-time literal equals the runtime column."""
    import math

    cent_rows = (
        embeddings.where(F.col(id_col).isin(list(centroid_ids)))
        .select(F.col(id_col), F.col(emb_col)).collect())
    cents = []
    for r in sorted(cent_rows, key=lambda r: r[0]):
        cvec = [float(x) for x in r[1]]
        norm = math.sqrt(_fold_sq(cvec))
        cents.append((int(r[0]), cvec, norm))
    return cents


def cosine_topk_ivf(embeddings: DataFrame, query_ids: Sequence[int],
                    k: int = 10, centroid_ids: Sequence[int] = IVF_CENTROID_IDS,
                    n_probe: int = IVF_NPROBE,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    cents: Sequence[tuple[int, list[float], float]] | None = None,
                    ) -> DataFrame:
    """IVF-flat ANN: a driver-side centroid table (the coarse
    quantizer — deterministic seed vectors by default, or a TRAINED
    table from `clustering.kmeans_fit` via `cents`), each vector
    assigned to its nearest centroid's cell as a zero-shuffle
    projection, each query probing its `n_probe` nearest cells. The
    candidate join shuffles on the cell key; cost ≈ n·C assignment
    dots + (n·n_probe/C)·|Q| scoring dots — the standard IVF trade
    against brute force's n·|Q|.

    For REPEATED queries the assignment pass should be paid once, not
    per call — `ann_index.build_ann_index` persists it as a merge
    table bucketed on the cell and `ann_index.ann_topk_indexed` reads
    only the probed cells' buckets.

    Recall vs `cosine_topk` is tested in tests/test_similarity.py;
    exactness of the arithmetic (not of recall) is oracle-checked via
    the same sequential-fold convention as the other ANN operators."""
    if cents is None:
        cents = seed_centroids_ivf(embeddings, centroid_ids, id_col, emb_col)
    else:
        cents = list(cents)

    # The assignment projection is CPU-heavy (C cosine folds per row);
    # spread a small single-file scan across all cores first — on a
    # real cluster the scan is already split.
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    embeddings = embeddings.repartition(par)
    assigned = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(emb_col).alias("emb"),
        F.get(_nearest_cells(F.col(emb_col), cents, 1), 0).alias("cell"))
    q = (
        embeddings.where(F.col(id_col).isin(list(query_ids)))
        .select(F.col(id_col).alias("query_id"),
                F.col(emb_col).alias("q_emb"),
                F.explode(_nearest_cells(F.col(emb_col), cents, n_probe))
                .alias("cell"))
    )
    scored = (
        assigned.join(F.broadcast(q), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                cosine(F.col("emb"), F.col("q_emb")).alias("cosine"))
    )
    return top_k_per_group(scored, ["query_id"],
                           [F.col("cosine").desc(), F.col("vec_id")], k,
                           rank_col="rank")


def _fold_sq(xs: list[float]) -> float:
    """Sequential left fold of x*x — same association order as _norm
    and the DuckDB list_transform/list_sum mirror."""
    acc = 0.0
    for x in xs:
        acc = acc + x * x
    return acc


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float = 0.9,
                             nbits: int = LSH_BITS,
                             id_col: str = "vec_id",
                             emb_col: str = "embedding",
                             dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the brief's fifth dedup
    mode): candidate pairs are generated within LSH buckets (id_a <
    id_b — never an all-pairs product), then verified by exact cosine
    ≥ threshold. Same hyperplane family as `cosine_topk_lsh`; at scale
    the bucket self-join shuffles each side once on the bucket key and
    bucket sizes are tuned via nbits ≈ log2(n / target_bucket)."""
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    # Cached: the self-join references this frame on both sides and
    # Catalyst duplicates the subtree — the hyperplane projection
    # (nbits dot products per row) would run twice. Same
    # materialized-signatures idiom as _shingled/minhash.
    from ..session import scoped_cache

    bucketed = scoped_cache(embeddings.repartition(par).select(
        F.col(id_col).alias("id"), F.col(emb_col).alias("emb"),
        lsh_bucket(F.col(emb_col), nbits, dim=dim).alias("bucket")))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                cosine(F.col("a.emb"), F.col("b.emb")).alias("cosine"))
        .where(F.col("cosine") >= F.lit(threshold))
    )


def retrieval_eval(approx: DataFrame, exact: DataFrame) -> DataFrame:
    """Retrieval-quality metrics of an ANN result against brute-force
    ground truth — the eval harness run after any index/nbits change.

    Both inputs are (query_id, vec_id, rank) top-k tables. Returns one
    row per query: n_hits (approx ∩ truth), recall_at_k (n_hits / k,
    k taken per query from the TRUTH's row count so a truncated
    approximate list is penalized, not hidden) and rr (reciprocal
    rank of the TRUE nearest neighbor inside the approx list; 0.0
    when missed). Shape: two semi-join-sized hash joins keyed on
    (query_id, vec_id) + one per-query aggregation — the metric cost
    is O(|results|), independent of corpus size."""
    # Both inputs are top-k-sized (O(|queries|*k) rows) but expensive
    # to produce (a brute-force or index scan over the corpus), and
    # each is consumed 2-3 times below — without a cache the metric
    # plan re-runs the whole ranker per consumer (measured: the
    # brute-force truth subtree appeared 6x in ann_recall_eval's
    # plan). CacheManager dedups by logical plan, so a truth frame
    # shared by several retrieval_eval calls materializes once per
    # session.
    from ..session import scoped_cache

    a = scoped_cache(approx.select("query_id", "vec_id", "rank"))
    e = scoped_cache(exact.select("query_id", "vec_id", "rank"))
    t = e.select("query_id", "vec_id")
    top1 = (e.where(F.col("rank") == 1)
            .select("query_id", F.col("vec_id").alias("best_vec")))
    hits = a.join(t, ["query_id", "vec_id"], "left_semi")
    n_hits = hits.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hits"))
    k_per_q = t.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("k"))
    rr = (a.join(top1, "query_id")
          .where(F.col("vec_id") == F.col("best_vec"))
          .groupBy("query_id")
          .agg((F.lit(1.0) / F.min("rank").cast("double")).alias("rr")))
    return (k_per_q.join(n_hits, "query_id", "left")
            .join(rr, "query_id", "left")
            .select("query_id",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    (F.coalesce("n_hits", F.lit(0)).cast("double")
                     / F.col("k").cast("double")).alias("recall_at_k"),
                    F.coalesce("rr", F.lit(0.0)).alias("rr")))
