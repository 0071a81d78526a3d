"""Hypothesis properties for the round-4 operators (splits, z-order,
LM scoring)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(max_examples=12, deadline=None,
               suppress_health_check=list(HealthCheck))


def _zorder_py(vals, bits):
    z = 0
    for d, v in enumerate(vals):
        v &= (1 << bits) - 1
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + d)
    return z


@SET
@given(st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                min_size=1, max_size=20))
def test_zorder_key_matches_reference_bit_interleave(spark, pairs):
    from pyspark.sql import functions as F

    from engagement_data_pipeline_spark.sinks.layout import zorder_key

    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pairs)],
        "i long, x long, y long")
    out = {r["i"]: r["z"] for r in df.select(
        "i", zorder_key(["x", "y"], bits=8).alias("z")).collect()}
    for i, (x, y) in enumerate(pairs):
        assert out[i] == _zorder_py([x, y], 8)


@SET
@given(st.lists(st.sampled_from(["alpha", "beta", "gamma"]),
                min_size=1, max_size=40),
       st.integers(1, 5))
def test_exact_split_counts_always_exact(spark, strata, parts):
    from engagement_data_pipeline_spark.training.splits import (
        split_assign_exact)

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strata)],
        "doc_id long, source string").repartition(parts)
    out = split_assign_exact(df, strata_cols=("source",)).collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r["split"])
    for src, splits in per.items():
        n = len(splits)
        b1, b2 = (n * 18) // 20, (n * 19) // 20
        assert splits.count("train") == b1
        assert splits.count("val") == b2 - b1
        assert splits.count("test") == n - b2


@SET
@given(st.lists(st.text(alphabet="abc ", min_size=0, max_size=30),
                min_size=1, max_size=10))
def test_lm_score_bounds(spark, texts):
    """Every add-one probability lies in (0, 1], so 0 <= sum_p <=
    n_bigrams and 0 <= mean_p <= 1 for any corpus, including
    degenerate whitespace-only texts."""
    from engagement_data_pipeline_spark.training.lm import bigram_lm_score

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    for r in bigram_lm_score(docs, docs).collect():
        assert 0.0 <= r["sum_p"] <= r["n_bigrams"] + 1e-9
        assert 0.0 <= r["mean_p"] <= 1.0
        assert r["n_seen"] <= r["n_bigrams"]
