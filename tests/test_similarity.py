"""Similarity-search tests: exactness of brute force, recall of the
LSH-bucketed variant, on the real sf0.001 embeddings."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.tables import load
from engagement_data_pipeline_spark.training.similarity import (
    cosine,
    cosine_topk,
    cosine_topk_lsh,
)

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    if not os.path.exists(f"{SF_DIR}/embeddings.parquet"):
        pytest.skip("testdata not available")
    return load(spark, SF_DIR, "embeddings").cache()


def test_cosine_self_similarity_is_one(spark, emb):
    row = emb.limit(1).select(
        cosine(F.col("embedding"), F.col("embedding")).alias("c")).collect()
    assert abs(row[0].c - 1.0) < 1e-12


def test_bruteforce_topk_shape_and_order(spark, emb):
    out = cosine_topk(emb, [0, 1], k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1}
    for rows in by_q.values():
        assert len(rows) == 5
        sims = [r.cosine for r in sorted(rows, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)
        assert all(r.vec_id != r.query_id for r in rows)


def test_lsh_results_are_subset_quality(spark, emb):
    """Every LSH hit must appear in the brute-force ranking with the
    same cosine (LSH never invents similarity), and recall@10 over the
    sampled queries should be usable."""
    qs = [0, 1, 2, 3, 4]
    exact = {(r.query_id, r.vec_id): r.cosine
             for r in cosine_topk(emb, qs, k=10).collect()}
    approx = cosine_topk_lsh(emb, qs, k=10, nbits=2).collect()
    hits = 0
    for r in approx:
        if (r.query_id, r.vec_id) in exact:
            assert exact[(r.query_id, r.vec_id)] == r.cosine
            hits += 1
    recall = hits / len(exact)
    assert recall >= 0.3, f"recall@10 too low: {recall}"


def test_ivf_results_match_bruteforce_cosines_and_recall(spark, emb):
    """IVF candidates carry exact cosines (the index only prunes), and
    probing 4/16 cells keeps recall@10 usable on the real data."""
    from engagement_data_pipeline_spark.training.similarity import cosine_topk_ivf

    qs = [0, 1, 2, 3, 4]
    exact = {(r.query_id, r.vec_id): r.cosine
             for r in cosine_topk(emb, qs, k=10).collect()}
    approx = cosine_topk_ivf(emb, qs, k=10).collect()
    hits = 0
    for r in approx:
        if (r.query_id, r.vec_id) in exact:
            assert exact[(r.query_id, r.vec_id)] == r.cosine
            hits += 1
    recall = hits / len(exact)
    assert recall >= 0.3, f"recall@10 too low: {recall}"


def test_lsh_bucket_literal_path_matches_runtime_hashing(spark):
    """lsh_bucket(dim=d) (plan-time coefficient literals) must equal
    lsh_bucket() (per-row md5 hashing) on real vectors, and raise on a
    dimension mismatch instead of silently bucketing to 0."""
    import pytest
    from pyspark.sql import functions as F

    from engagement_data_pipeline_spark.training.similarity import lsh_bucket

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    both = emb.select(
        lsh_bucket(F.col("embedding"), 4).alias("runtime"),
        lsh_bucket(F.col("embedding"), 4, dim=64).alias("literal"))
    assert both.where(F.col("runtime") != F.col("literal")).count() == 0

    with pytest.raises(Exception, match="embedding length"):
        emb.select(lsh_bucket(F.col("embedding"), 4, dim=32)).collect()


def test_retrieval_eval_metrics(spark):
    from engagement_data_pipeline_spark.training.similarity import (
        retrieval_eval)

    exact = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2), (2, 22, 3)],
        "query_id long, vec_id long, rank long")
    # q1: approx finds 2 of 3, true best at rank 2 -> rr 0.5
    # q2: approx finds none -> recall 0, rr 0
    approx = spark.createDataFrame(
        [(1, 99, 1), (1, 10, 2), (1, 12, 3),
         (2, 98, 1), (2, 97, 2), (2, 96, 3)],
        "query_id long, vec_id long, rank long")
    out = {r["query_id"]: r for r in
           retrieval_eval(approx, exact).collect()}
    assert out[1]["n_hits"] == 2 and out[1]["recall_at_k"] == 2 / 3
    assert out[1]["rr"] == 0.5
    assert out[2]["n_hits"] == 0 and out[2]["recall_at_k"] == 0.0
    assert out[2]["rr"] == 0.0
