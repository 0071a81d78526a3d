"""Incremental aggregate-state maintenance (operators/incremental.py)
and deterministic group sampling (operators/topk.py)."""

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.operators.incremental import (
    aggregate_state, merge_aggregate_state)
from engagement_data_pipeline_spark.operators.topk import (
    deterministic_group_sample)

METRICS = {
    "n": ("k", "count"),
    "total": ("v", "sum"),
    "lo": ("v", "min"),
    "hi": ("v", "max"),
}


def _rows(spark, rows):
    return spark.createDataFrame(rows, "g string, k string, v long")


def _collect(df):
    return {r.g: (r.n, r.total, r.lo, r.hi)
            for r in df.collect()}


def test_merge_equals_full_recompute_and_is_associative(spark):
    a = _rows(spark, [("x", "a", 1), ("x", "b", 5), ("y", "c", 2)])
    b = _rows(spark, [("x", "d", 3), ("z", "e", 7)])
    c = _rows(spark, [("y", "f", 9), ("z", "g", 0)])
    full = aggregate_state(a.union(b).union(c), ["g"], METRICS)
    st = lambda d: aggregate_state(d, ["g"], METRICS)
    m = lambda s1, s2: merge_aggregate_state(s1, s2, ["g"], METRICS)
    left = m(m(st(a), st(b)), st(c))
    right = m(st(a), m(st(b), st(c)))
    assert _collect(left) == _collect(right) == _collect(full)
    assert _collect(full)["x"] == (3, 9, 1, 5)


def test_merge_with_empty_batch_is_identity(spark):
    a = _rows(spark, [("x", "a", 1), ("y", "b", 2)])
    empty = _rows(spark, [])
    merged = merge_aggregate_state(
        aggregate_state(a, ["g"], METRICS),
        aggregate_state(empty, ["g"], METRICS), ["g"], METRICS)
    assert _collect(merged) == _collect(aggregate_state(a, ["g"], METRICS))


def test_group_sample_exact_k_and_reproducible(spark):
    df = spark.createDataFrame(
        [("g%d" % (i % 3), i) for i in range(300)], "g string, id long")
    s1 = deterministic_group_sample(df, ["g"], "id", 7)
    s2 = deterministic_group_sample(df, ["g"], "id", 7)
    rows1 = sorted((r.g, r.id) for r in s1.collect())
    assert rows1 == sorted((r.g, r.id) for r in s2.collect())
    per_g = {}
    for g, _ in rows1:
        per_g[g] = per_g.get(g, 0) + 1
    assert per_g == {"g0": 7, "g1": 7, "g2": 7}
    # different salt draws a different sample
    s3 = deterministic_group_sample(df, ["g"], "id", 7, salt="other")
    assert rows1 != sorted((r.g, r.id) for r in s3.collect())


def test_group_sample_small_group_returns_whole_group(spark):
    df = spark.createDataFrame([("g", 1), ("g", 2)], "g string, id long")
    assert deterministic_group_sample(df, ["g"], "id", 10).count() == 2


def test_hll_merge_idempotent_and_commutative(spark):
    from engagement_data_pipeline_spark.operators.stats import (
        hll_estimate_from_registers, hll_merge, hll_registers)
    from engagement_data_pipeline_spark.training.dedup import md5_long

    df = spark.createDataFrame([("g", i % 37) for i in range(200)],
                               "g string, v long")
    h = md5_long(F.col("v").cast("string"))
    regs = hll_registers(df, ["g"], h)
    est = lambda r: hll_estimate_from_registers(r, ["g"]).collect()[0]
    base = est(regs)
    # self-merge is identity; merge order does not matter
    assert est(hll_merge(regs, regs, ["g"])) == base
    a = hll_registers(df.where(F.col("v") % 2 == 0), ["g"], h)
    b = hll_registers(df.where(F.col("v") % 2 == 1), ["g"], h)
    assert est(hll_merge(a, b, ["g"])) == est(hll_merge(b, a, ["g"])) == base
