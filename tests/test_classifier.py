"""Linear classifier inference (training/classifier.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.training.classifier import (
    hashed_bigram_margin)


def _bucket(bigram: str, n: int) -> int:
    return int(hashlib.md5(bigram.encode()).hexdigest()[:15], 16) % n


def test_margin_matches_hand_fold(spark):
    weights = [0.5, -0.25, 1.0, -1.0]
    text = "a b c"
    expect = 0.0
    for bg in ["a b", "b c"]:
        expect += weights[_bucket(bg, 4)]
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = df.select(hashed_bigram_margin(
        F.col("text"), weights).alias("m")).first()["m"]
    assert got == expect


def test_margin_short_doc_is_bias(spark):
    df = spark.createDataFrame([(1, "solo"), (2, "")],
                               "doc_id long, text string")
    out = df.select(hashed_bigram_margin(
        F.col("text"), [1.0, 2.0], bias=0.75).alias("m")).collect()
    assert [r["m"] for r in out] == [0.75, 0.75]


def test_margin_rejects_empty_weights(spark):
    import pytest
    with pytest.raises(ValueError):
        hashed_bigram_margin(F.lit("x"), [])
