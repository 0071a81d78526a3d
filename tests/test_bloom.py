"""Unit tests for the Bloom-filter membership sketch
(operators/stats.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.operators.stats import (
    BLOOM_WORD_BITS, bloom_merge, bloom_probe, bloom_sketch)


def _keys(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


def test_bloom_no_false_negatives(spark):
    inserted = [f"key-{i}" for i in range(200)]
    sketch = bloom_sketch(_keys(spark, inserted), "key")
    hits = {r.key: r.bloom_hit
            for r in bloom_probe(sketch, _keys(spark, inserted),
                                 "key").collect()}
    assert all(hits[k] for k in inserted)


def test_bloom_unseen_keys_mostly_negative(spark):
    sketch = bloom_sketch(_keys(spark, [f"in-{i}" for i in range(100)]),
                          "key")
    probes = [f"out-{i}" for i in range(500)]
    hits = bloom_probe(sketch, _keys(spark, probes), "key")
    n_pos = hits.where("bloom_hit").count()
    # 100 keys * 4 hashes into 2^18 bits → fpr ≈ 4e-11; even one
    # positive would signal broken hashing rather than bad luck.
    assert n_pos == 0


def test_bloom_probe_empty_sketch_all_negative(spark):
    empty = bloom_sketch(_keys(spark, []), "key")
    hits = bloom_probe(empty, _keys(spark, ["a", "b"]), "key")
    assert hits.where("bloom_hit").count() == 0
    assert hits.count() == 2


def test_bloom_merge_equals_union_sketch(spark):
    a = [f"a-{i}" for i in range(80)]
    b = [f"b-{i}" for i in range(80)]
    merged = bloom_merge([bloom_sketch(_keys(spark, a), "key"),
                          bloom_sketch(_keys(spark, b), "key")])
    full = bloom_sketch(_keys(spark, a + b), "key")
    diff = (merged.withColumnRenamed("bits", "m")
            .join(full.withColumnRenamed("bits", "f"), "word", "full")
            .where(F.coalesce(F.col("m"), F.lit(-1))
                   != F.coalesce(F.col("f"), F.lit(-1))))
    assert diff.count() == 0


def test_bloom_masks_are_valid_word_bits(spark):
    sketch = bloom_sketch(_keys(spark, [f"k-{i}" for i in range(50)]), "key")
    rows = sketch.collect()
    assert rows, "sketch should have words"
    for r in rows:
        assert 0 < r.bits < (1 << BLOOM_WORD_BITS)
