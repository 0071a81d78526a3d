"""Deterministic split assignment (training/splits.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.training.splits import (
    split_assign_exact, split_assign_hash)


def _docs(spark, n, src="a"):
    return spark.createDataFrame(
        [(i, src, f"g{i % 5}") for i in range(n)],
        "doc_id long, source string, grp string")


def test_exact_counts_per_stratum(spark):
    df = _docs(spark, 97, "a").union(_docs(spark, 40, "b"))
    out = (split_assign_exact(df, strata_cols=("source",))
           .groupBy("source", "split").count().collect())
    got = {(r["source"], r["split"]): r["count"] for r in out}
    for src, n in (("a", 97), ("b", 40)):
        b1, b2 = (n * 18) // 20, (n * 19) // 20
        assert got[(src, "train")] == b1
        assert got.get((src, "val"), 0) == b2 - b1
        assert got.get((src, "test"), 0) == n - b2


def test_exact_deterministic_under_partitioning(spark):
    df = _docs(spark, 200)
    a = sorted(split_assign_exact(df).collect())
    b = sorted(split_assign_exact(df.repartition(7)).collect())
    assert a == b


def test_hash_split_stability_under_growth(spark):
    """The hash variant's guarantee: adding documents never moves an
    existing document's split."""
    small = split_assign_hash(_docs(spark, 100))
    big = split_assign_hash(_docs(spark, 1000))
    sm = {r["doc_id"]: r["split"] for r in small.collect()}
    bg = {r["doc_id"]: r["split"] for r in big.collect()}
    assert all(bg[k] == v for k, v in sm.items())


def test_hash_split_group_cohesion(spark):
    out = split_assign_hash(_docs(spark, 500), group_col="grp")
    per_group = (out.groupBy("grp")
                 .agg(F.count_distinct("split").alias("k")).collect())
    assert all(r["k"] == 1 for r in per_group)


def test_hash_split_fractions_approximate(spark):
    out = split_assign_hash(_docs(spark, 5000))
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert abs(counts["train"] / 5000 - 0.9) < 0.03
    assert set(counts) == {"train", "val", "test"}


def test_bad_weights_raise(spark):
    with pytest.raises(ValueError):
        split_assign_hash(_docs(spark, 10), splits=(("a", 1), ("b", 1)),
                          den=3)
    with pytest.raises(ValueError):
        split_assign_exact(_docs(spark, 10), splits=(("a", -1), ("b", 21)),
                           den=20)


def test_group_exact_split_cohesive_and_exact(spark):
    from engagement_data_pipeline_spark.training.splits import (
        split_assign_exact_groups)

    df = _docs(spark, 500)  # 5 groups of 100 rows
    out = split_assign_exact_groups(df, "grp")
    per_group = (out.groupBy("grp")
                 .agg(F.count_distinct("split").alias("k")).collect())
    assert all(r["k"] == 1 for r in per_group)
    # exact counts at GROUP granularity: 5 groups -> 4/0/1 split
    gsplits = {r["grp"]: r["split"] for r in
               out.select("grp", "split").distinct().collect()}
    from collections import Counter
    c = Counter(gsplits.values())
    assert c["train"] == (5 * 18) // 20 and c["test"] == 5 - (5 * 19) // 20
    assert len(out.collect()) == 500


def test_kfold_assign_stable_and_balanced(spark):
    import pytest

    from engagement_data_pipeline_spark.training.splits import kfold_assign

    docs = spark.createDataFrame([(i,) for i in range(500)],
                                 "doc_id long")
    folds = {r.doc_id: r.fold for r in kfold_assign(docs, 5).collect()}
    assert set(folds.values()) == {0, 1, 2, 3, 4}
    # roughly balanced (hash-uniform): each fold within 2x of ideal
    from collections import Counter
    counts = Counter(folds.values())
    assert all(50 <= c <= 200 for c in counts.values())
    # hash-stable: growing the corpus never moves an existing row
    grown = spark.createDataFrame([(i,) for i in range(800)],
                                  "doc_id long")
    folds2 = {r.doc_id: r.fold
              for r in kfold_assign(grown, 5).collect()}
    assert all(folds2[k] == v for k, v in folds.items())
    with pytest.raises(ValueError):
        kfold_assign(docs, 1)
