"""Bigram LM domain scoring (training/lm.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.training import lm as LMI
from engagement_data_pipeline_spark.training.lm import (
    bigram_lm_score, bigram_model)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_model_counts_and_vocab(spark):
    target = _docs(spark, [(1, "a b a b"), (2, "a b c")])
    bigrams, prefixes, consts = bigram_model(target)
    # bigrams: a-b ×3, b-a ×1, b-c ×1  → 3 distinct, total 5
    bg = bigrams.agg(F.count("*").alias("k"), F.sum("n_bg").alias("n")).first()
    assert (bg["k"], bg["n"]) == (3, 5)
    # prefixes: a· = 3, b· = 2
    pf = {r["n_prefix"] for r in prefixes.collect()}
    assert pf == {3, 2}
    assert consts.first()["vocab_n"] == 3


def test_score_matches_hand_computation(spark):
    target = _docs(spark, [(1, "a b a b"), (2, "a b c")])
    scored = bigram_lm_score(target, _docs(spark, [(10, "a b c")]))
    row = scored.first()
    # V=3; p(b|a) = (3+1)/(3+3); p(c|b) = (1+1)/(2+3)
    expect = [4 / 6, 2 / 5]
    assert row["n_bigrams"] == 2 and row["n_seen"] == 2
    assert math.isclose(row["sum_p"], sum(expect), rel_tol=0, abs_tol=0)
    assert math.isclose(row["mean_p"], sum(expect) / 2, rel_tol=0, abs_tol=0)


def test_unseen_bigrams_smoothed_not_zero(spark):
    target = _docs(spark, [(1, "a b")])
    scored = bigram_lm_score(target, _docs(spark, [(10, "x y")]))
    row = scored.first()
    # V=2; unseen prefix → p = (0+1)/(0+2)
    assert row["n_seen"] == 0
    assert row["sum_p"] == 0.5 and row["mean_p"] == 0.5


def test_short_and_empty_docs_score_zero(spark):
    target = _docs(spark, [(1, "a b")])
    scored = bigram_lm_score(
        target, _docs(spark, [(10, "solo"), (11, "")])).collect()
    for row in scored:
        assert row["n_bigrams"] == 0 and row["sum_p"] == 0.0
        assert row["mean_p"] == 0.0


def test_in_domain_scores_above_out_of_domain(spark):
    """The point of the operator: docs resembling the target corpus
    outscore alien text under the target LM."""
    target = _docs(spark, [(i, "the cat sat on the mat") for i in range(5)])
    scored = {r["doc_id"]: r["mean_p"] for r in bigram_lm_score(
        target, _docs(spark, [(100, "the cat sat on the mat"),
                              (101, "völlig andere wörter hier")])).collect()}
    assert scored[100] > scored[101]


def test_broadcast_model_same_result(spark):
    target = _docs(spark, [(1, "a b c a b"), (2, "b c d")])
    probe = _docs(spark, [(10, "a b c"), (11, "d a")])
    plain = bigram_lm_score(target, probe).orderBy("doc_id").collect()
    bcast = bigram_lm_score(target, probe,
                            broadcast_model=True).orderBy("doc_id").collect()
    assert plain == bcast


def test_importance_weights_favor_target_like_docs(spark):
    target = _docs(spark, [(1, "the cat sat on the mat"),
                           (2, "the dog sat on the rug")])
    raw = _docs(spark, [(3, "alpha beta gamma delta"),
                        (4, "beta gamma delta epsilon")] +
                [(i, "filler words here now") for i in range(10, 20)])
    probe = _docs(spark, [(100, "the cat sat on the mat"),
                          (101, "alpha beta gamma delta")])
    out = {r["doc_id"]: r["importance"]
           for r in LMI.importance_weights(target, raw, probe).collect()}
    assert out[100] > 1.0 > out[101]


def test_importance_matches_two_single_model_scores(spark):
    """The one-pass dual join must equal the ratio of two independent
    single-model scores."""
    target = _docs(spark, [(1, "a b c a b")])
    raw = _docs(spark, [(2, "c d e"), (3, "a c d")])
    probe = _docs(spark, [(9, "a b d"), (10, "zz yy")])
    dual = {r["doc_id"]: r for r in LMI.importance_weights(
        target, raw, probe).collect()}
    st = {r["doc_id"]: r["sum_p"] for r in bigram_lm_score(
        target, probe).collect()}
    sr = {r["doc_id"]: r["sum_p"] for r in bigram_lm_score(
        raw, probe).collect()}
    for d in (9, 10):
        assert dual[d]["sum_p_target"] == st[d]
        assert dual[d]["sum_p_raw"] == sr[d]
        assert dual[d]["importance"] == st[d] / sr[d]


def test_importance_no_bigrams_is_neutral(spark):
    target = _docs(spark, [(1, "a b")])
    raw = _docs(spark, [(2, "c d")])
    out = LMI.importance_weights(target, raw,
                                 _docs(spark, [(9, "solo")])).first()
    assert out["n_bigrams"] == 0 and out["importance"] == 1.0
