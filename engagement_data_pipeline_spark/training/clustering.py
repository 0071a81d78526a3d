"""K-means (Lloyd's) over an embedding column, and semantic near-dup
blocking on the fitted clusters.

The missing piece between the fixed-seed IVF coarse quantizer
(`similarity.cosine_topk_ivf`) and a *trained* one: a few Lloyd
iterations that move the centroids to the data. Used two ways:

* `kmeans_fit` + `kmeans_assign` — train the centroid table, assign
  every vector to a cluster (zero-shuffle projection, the IVF cell
  assignment with learned cells).
* `semantic_neardup_pairs` — SemDeDup-style semantic deduplication:
  candidate pairs are generated only WITHIN a cluster and verified by
  exact cosine, so the pair generation never goes quadratic in the
  corpus (same blocking idea as LSH bucketing in
  `similarity.embedding_near_dup_pairs`, but with data-adaptive
  blocks).

Scale shape (100 TB): the centroid table is k×d doubles — driver/
broadcast state by design, exactly like any IVF index (k ≤ a few
thousand even at web scale). Each Lloyd iteration is ONE zero-shuffle
assignment projection + ONE hash aggregation keyed (cluster, dim)
whose output is k·d rows regardless of corpus size — the classic
sufficient-statistics formulation, so iterations never re-shuffle the
corpus. Component sums are micro-quantized to exact integers
(floor(x·1e6), the same cross-engine-exact convention as
`emb_label_stats`) BEFORE the parallel sum, so partial-aggregation
order cannot perturb the fitted centroids and the whole iterative fit
stays bit-reproducible — including against a pure-SQL oracle.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _fold_sq, _norm

MICRO = 1_000_000

#: 8 spread seed vector ids (same family as IVF_CENTROID_IDS).
KMEANS_SEED_IDS = tuple(range(0, 56, 7))
KMEANS_ITERS = 2


def _ranked_cells(emb: Column,
                  cents: Sequence[tuple[int, list[float], float]]) -> Column:
    """Array of struct(c=cosine, n=-cid) sorted best-first (cosine
    DESC, cid ASC) — the `_nearest_cells` ranking with the cosine kept
    so callers can report assignment quality. Centroids enter the plan
    as three literal arrays; one transform computes every cosine with
    the sequential fold both engines share."""
    vnorm = _norm(emb)
    cmat = F.lit([cvec for _, cvec, _ in cents])
    cnorms = F.lit([cn for _, _, cn in cents])
    cneg = F.lit([float(-cid) for cid, _, _ in cents])

    def cell(i: Column) -> Column:
        dot = F.aggregate(
            F.zip_with(emb, F.get(cmat, i), lambda x, c: x.cast("double") * c),
            F.lit(0.0), lambda acc, x: acc + x)
        return F.struct((dot / (vnorm * F.get(cnorms, i))).alias("c"),
                        F.get(cneg, i).alias("n"))

    return F.reverse(F.array_sort(
        F.transform(F.sequence(F.lit(0), F.lit(len(cents) - 1)), cell)))


def kmeans_assign(embeddings: DataFrame,
                  cents: Sequence[tuple[int, list[float], float]],
                  id_col: str = "vec_id",
                  emb_col: str = "embedding") -> DataFrame:
    """(vec_id, cluster, cosine): each vector's nearest centroid by
    cosine (ties → lowest cluster id). Pure projection — no shuffle.
    The scan is spread first (same as `cosine_topk_ivf`): the
    assignment is CPU-heavy and a small single-file scan would
    otherwise run it on one task; on a real cluster the scan is
    already split."""
    from .text import spread_narrow_scan

    embeddings = spread_narrow_scan(embeddings)
    best = F.get(_ranked_cells(F.col(emb_col), cents), 0)
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        (-best["n"]).cast("long").alias("cluster"),
        best["c"].alias("cosine"))


def _seed_centroids(embeddings: DataFrame, seed_ids: Sequence[int],
                    id_col: str, emb_col: str
                    ) -> list[tuple[int, list[float], float]]:
    rows = (embeddings.where(F.col(id_col).isin(list(seed_ids)))
            .select(id_col, emb_col).collect())
    cents = []
    for cid, r in enumerate(sorted(rows, key=lambda r: r[0])):
        cvec = [float(x) for x in r[1]]
        cents.append((cid, cvec, math.sqrt(_fold_sq(cvec))))
    return cents


def kmeans_fit(embeddings: DataFrame,
               seed_ids: Sequence[int] = KMEANS_SEED_IDS,
               iters: int = KMEANS_ITERS,
               id_col: str = "vec_id", emb_col: str = "embedding"
               ) -> list[tuple[int, list[float], float]]:
    """Lloyd's algorithm: centroids seeded from fixed vector ids
    (deterministic — the k-means++ analog for reproducible fits),
    then `iters` rounds of assign + recompute. Returns the centroid
    table [(cluster, vector, norm)].

    Per round the corpus is touched exactly once: a zero-shuffle
    assignment projection feeding one (cluster, dim)-keyed hash
    aggregation of micro-quantized component sums; only the k·d
    sufficient statistics reach the driver. A cluster that loses all
    members keeps its previous centroid (documented Lloyd edge case)."""
    from .text import spread_narrow_scan

    cents = _seed_centroids(embeddings, seed_ids, id_col, emb_col)
    k = len(cents)
    embeddings = spread_narrow_scan(embeddings)  # no-op if already wide
    for _ in range(iters):
        best = F.get(_ranked_cells(F.col(emb_col), cents), 0)
        # Two-step select: a generator (posexplode) in the same select
        # as the lambda-built struct access makes Spark's generator
        # rewrite drop the struct's field names (FIELD_NOT_FOUND).
        assigned = embeddings.select(
            (-best["n"]).cast("long").alias("cluster"),
            F.col(emb_col).alias("__e"))
        stats = (assigned.select(
            "cluster", F.posexplode("__e").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum(F.floor(F.col("x").cast("double")
                               * F.lit(float(MICRO))).cast("long"))
                 .cast("long").alias("s"))
            .collect())
        by_cluster: dict[int, dict[int, tuple[int, int]]] = {}
        for r in stats:
            by_cluster.setdefault(r["cluster"], {})[r["dim"]] = (r["n"], r["s"])
        new_cents = []
        for cid in range(k):
            dims = by_cluster.get(cid)
            if not dims:
                new_cents.append(cents[cid])  # empty cluster: keep
                continue
            cvec = [dims[d][1] / (dims[d][0] * float(MICRO))
                    for d in sorted(dims)]
            new_cents.append((cid, cvec, math.sqrt(_fold_sq(cvec))))
        cents = new_cents
    return cents


def semantic_neardup_pairs(embeddings: DataFrame,
                           cents: Sequence[tuple[int, list[float], float]],
                           threshold: float = 0.92,
                           id_col: str = "vec_id",
                           emb_col: str = "embedding") -> DataFrame:
    """SemDeDup-style near-duplicate pairs: candidates only within a
    fitted cluster (id_a < id_b), verified by exact cosine >=
    threshold. The self-join shuffles each side once on the cluster
    key; cluster sizes are the blocking knob (grow k to shrink
    blocks). Returns (id_a, id_b, cluster, cosine)."""
    from .similarity import cosine

    from .text import spread_narrow_scan

    embeddings = spread_narrow_scan(embeddings)  # parallel assign+probe
    best = F.get(_ranked_cells(F.col(emb_col), cents), 0)
    # Cached: the self-join duplicates the subtree on both sides and
    # the cluster assignment (k cosine folds per row) would run twice.
    from ..session import scoped_cache

    assigned = scoped_cache(embeddings.select(
        F.col(id_col).alias("id"), F.col(emb_col).alias("emb"),
        (-best["n"]).cast("long").alias("cluster")))
    a, b = assigned.alias("a"), assigned.alias("b")
    return (a.join(b, (F.col("a.cluster") == F.col("b.cluster"))
                   & (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.col("a.cluster").alias("cluster"),
                    cosine(F.col("a.emb"), F.col("b.emb")).alias("cosine"))
            .where(F.col("cosine") >= F.lit(threshold)))
