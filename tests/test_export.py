"""Tests for the training-export planners: epoch shard plan,
target-mixture rate solver, and the ed≤1 fuzzy join."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.operators.fuzzy import fuzzy_pairs_ed1
from engagement_data_pipeline_spark.training.sampling import (
    SCALE, mixture_rate_plan)
from engagement_data_pipeline_spark.training.sharding import shard_plan


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"))


# --- shard plan -----------------------------------------------------------

def test_shard_plan_partitions_corpus(spark):
    plan = shard_plan(_docs(spark), n_shards=4, epoch=1).cache()
    rows = plan.collect()
    assert len(rows) == 200
    assert sorted(r.doc_id for r in rows) == list(range(200))
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.shard < 4
        by_shard.setdefault(r.shard, []).append(r)
    # positions are contiguous 1..k per shard, ordered by shuffle key
    for members in by_shard.values():
        members.sort(key=lambda r: r.pos_in_shard)
        assert [r.pos_in_shard for r in members] == list(
            range(1, len(members) + 1))
        keys = [(r.shuffle_key, r.doc_id) for r in members]
        assert keys == sorted(keys)
    plan.unpersist()


def test_shard_plan_epochs_permute(spark):
    docs = _docs(spark)
    e1 = {r.doc_id: (r.shard, r.pos_in_shard)
          for r in shard_plan(docs, 4, epoch=1).collect()}
    e2 = {r.doc_id: (r.shard, r.pos_in_shard)
          for r in shard_plan(docs, 4, epoch=2).collect()}
    moved = sum(1 for d in e1 if e1[d] != e2[d])
    assert moved > 150  # a different epoch reshuffles nearly everything


def test_shard_plan_deterministic(spark):
    docs = _docs(spark)
    a = sorted(map(tuple, shard_plan(docs, 4, 1).collect()))
    b = sorted(map(tuple, shard_plan(docs, 4, 1).collect()))
    assert a == b


# --- mixture rate plan ----------------------------------------------------

def _strat_docs(spark):
    # en:60, de:30, zh:10
    rows = ([(i, "en") for i in range(60)]
            + [(100 + i, "de") for i in range(30)]
            + [(200 + i, "zh") for i in range(10)])
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_mixture_plan_budget_binds_on_scarcest(spark):
    targets = {"en": (1, 2), "de": (1, 4), "zh": (1, 4)}
    plan = {r.stratum: r for r in mixture_rate_plan(
        _strat_docs(spark), targets, stratify_col="lang").collect()}
    # budgets: en 60*2=120, de 30*4=120, zh 10*4=40 -> zh binds at 40
    assert {r.budget_total for r in plan.values()} == {40}
    # zh must keep everything: thr == SCALE
    assert plan["zh"].thr == SCALE
    assert plan["zh"].n_kept == 10
    # en thr = floor(1*40*SCALE / (2*60)) = SCALE/3
    assert plan["en"].thr == 40 * SCALE // 120
    for r in plan.values():
        assert 0 <= r.n_kept <= r.n_docs


def test_mixture_plan_kept_matches_threshold_rule(spark):
    from engagement_data_pipeline_spark.training.sampling import (
        deterministic_sample)
    docs = _strat_docs(spark)
    targets = {"en": (1, 2), "de": (1, 4), "zh": (1, 4)}
    plan = {r.stratum: r for r in mixture_rate_plan(
        docs, targets, stratify_col="lang").collect()}
    rates = {s: plan[s].thr / SCALE for s in plan}
    resampled = deterministic_sample(
        docs, 0.0, stratify_col="lang", rates=rates)
    got = {r.lang: r.n for r in resampled.groupBy("lang")
           .agg(F.count("*").alias("n")).collect()}
    for s, r in plan.items():
        assert got.get(s, 0) == r.n_kept


# --- fuzzy ed<=1 join -----------------------------------------------------

def _brute_ed1(values):
    def lev(a, b):
        # tiny exact DP, fine for fixture strings
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    out = set()
    for (ka, sa), (kb, sb) in itertools.combinations(values, 2):
        lo, hi = min(ka, kb), max(ka, kb)
        d = lev(sa, sb)
        if d <= 1:
            out.add((lo, hi, d))
    return out


def test_fuzzy_pairs_match_bruteforce(spark):
    values = [
        (1, "alice"), (2, "alicia"), (3, "alce"),   # del/ins chains
        (4, "alife"), (5, "bob"), (6, "bobb"), (7, "rob"),
        (8, "carol"), (9, "carol"),                  # identical -> dist 0
        (10, "craol"), (11, ""), (12, "a"),
    ]
    df = spark.createDataFrame(values, "k long, s string")
    got = {(r.left_key, r.right_key, r.dist)
           for r in fuzzy_pairs_ed1(df, "k", "s").collect()}
    assert got == _brute_ed1(values)


def test_fuzzy_pairs_excludes_distance_two(spark):
    df = spark.createDataFrame(
        [(1, "kitten"), (2, "sitten"), (3, "sittin")], "k long, s string")
    got = {(r.left_key, r.right_key) for r in
           fuzzy_pairs_ed1(df, "k", "s").collect()}
    # kitten~sitten (sub), sitten~sittin (sub); kitten~sittin is ed 2
    assert got == {(1, 2), (2, 3)}
