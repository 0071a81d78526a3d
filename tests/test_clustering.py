"""Unit tests for k-means clustering and semantic near-dup blocking
(training/clustering.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.training.clustering import (
    kmeans_assign, kmeans_fit, semantic_neardup_pairs)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _two_blob_fixture(spark):
    """Two tight blobs around (1,0) and (0,1), plus the seeds."""
    rows = []
    for i in range(10):
        rows.append((i, [1.0, 0.01 * i]))          # blob A
        rows.append((100 + i, [0.01 * i, 1.0]))    # blob B
    return _emb(spark, rows)


def test_kmeans_separates_two_blobs(spark):
    emb = _two_blob_fixture(spark)
    cents = kmeans_fit(emb, seed_ids=(0, 100), iters=2)
    assigned = kmeans_assign(emb, cents).collect()
    by_cluster = {}
    for r in assigned:
        by_cluster.setdefault(r.cluster, set()).add(r.vec_id)
    assert len(by_cluster) == 2
    blobs = sorted(by_cluster.values(), key=min)
    assert blobs[0] == set(range(10))
    assert blobs[1] == set(range(100, 110))


def test_kmeans_centroid_moves_to_blob_mean(spark):
    emb = _two_blob_fixture(spark)
    cents = kmeans_fit(emb, seed_ids=(0, 100), iters=2)
    # Blob A mean ≈ (1.0, 0.045): centroid 0 should be near it, and
    # not equal to the raw seed (0th vec = [1.0, 0.0]).
    c0 = cents[0][1]
    assert abs(c0[0] - 1.0) < 1e-6
    assert abs(c0[1] - 0.045) < 1e-3
    assert c0[1] != 0.0


def test_kmeans_empty_cluster_keeps_seed(spark):
    # Seed 2 is an outlier that immediately loses every vector
    # (everything sits on blob A); its centroid must survive as-is.
    rows = [(i, [1.0, 0.001 * i]) for i in range(10)]
    rows.append((99, [-1.0, -1.0]))
    emb = _emb(spark, rows)
    cents = kmeans_fit(emb, seed_ids=(0, 99), iters=2)
    # cluster 1 keeps exactly one member (the outlier itself) or, if
    # it empties, its previous centroid — either way the centroid
    # stays in the outlier's half-space.
    assert cents[1][1][0] < 0


def test_kmeans_assignment_cosine_is_max(spark):
    emb = _two_blob_fixture(spark)
    cents = kmeans_fit(emb, seed_ids=(0, 100), iters=1)
    rows = kmeans_assign(emb, cents).collect()
    for r in rows:
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9


def test_semantic_neardup_within_cluster_only(spark):
    emb = _two_blob_fixture(spark)
    cents = kmeans_fit(emb, seed_ids=(0, 100), iters=2)
    pairs = semantic_neardup_pairs(emb, cents, threshold=0.99).collect()
    assert pairs, "tight blobs must produce near-dup pairs"
    assigned = {r.vec_id: r.cluster
                for r in kmeans_assign(emb, cents).collect()}
    for p in pairs:
        assert p.id_a < p.id_b
        assert assigned[p.id_a] == assigned[p.id_b] == p.cluster
        assert p.cosine >= 0.99


def test_semantic_neardup_threshold_monotone(spark):
    emb = _two_blob_fixture(spark)
    cents = kmeans_fit(emb, seed_ids=(0, 100), iters=2)
    lo = semantic_neardup_pairs(emb, cents, threshold=0.9).count()
    hi = semantic_neardup_pairs(emb, cents, threshold=0.999).count()
    assert hi <= lo
