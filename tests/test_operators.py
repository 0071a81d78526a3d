"""Unit tests for the generic relational operators on literal frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.operators.dedup import (
    assert_unique,
    duplicate_keys,
    idempotent_upsert,
    latest_snapshot,
)
from engagement_data_pipeline_spark.operators.filters import (
    allowlist_semi_join,
    exclude_values,
    resolve_live_stale,
    retraction_anti_join,
    time_range_filter,
    timestamp_router,
)
from engagement_data_pipeline_spark.operators.folds import (
    fold_concat,
    fold_distinct_concat,
)
from engagement_data_pipeline_spark.operators.topk import top_k_per_group


def test_latest_snapshot_keeps_newest_per_key(spark):
    df = spark.createDataFrame(
        [("m1", 1, "old"), ("m1", 3, "new"), ("m1", 2, "mid"), ("m2", 1, "only")],
        "id string, v int, val string")
    out = latest_snapshot(df, ["id"], ["v"])
    assert {(r.id, r.val) for r in out.collect()} == {("m1", "new"), ("m2", "only")}


def test_latest_snapshot_tiebreaker_is_deterministic(spark):
    df = spark.createDataFrame(
        [("m1", 1, "a"), ("m1", 1, "b")], "id string, v int, t string")
    out = latest_snapshot(df, ["id"], ["v", "t"])  # t desc breaks the tie
    assert [r.t for r in out.collect()] == ["b"]


def test_duplicate_keys_and_assert_unique(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",)], "origin_id string")
    dupes = duplicate_keys(df, ["origin_id"]).collect()
    assert [(r.origin_id, r.n) for r in dupes] == [("a", 2)]
    with pytest.raises(AssertionError):
        assert_unique(df, ["origin_id"])
    assert_unique(df.where(F.col("origin_id") == "b"), ["origin_id"])


def test_idempotent_upsert_existing_wins_and_is_idempotent(spark):
    existing = spark.createDataFrame([("o1", "kept")], "origin_id string, val string")
    incoming = spark.createDataFrame(
        [("o1", "ignored"), ("o2", "new"), ("o2", "new")],
        "origin_id string, val string")
    once = idempotent_upsert(existing, incoming, ["origin_id"])
    assert {(r.origin_id, r.val) for r in once.collect()} == {("o1", "kept"), ("o2", "new")}
    twice = idempotent_upsert(once, incoming, ["origin_id"])
    assert sorted(twice.collect()) == sorted(once.collect())


def test_resolve_live_stale(spark):
    df = spark.createDataFrame(
        [
            ("d1", "p1", "live", "a"),
            ("d1", "p1", "stale", "dropped"),   # p1 has a live row in d1
            ("d1", "p2", "stale", "kept"),      # p2 has none
            ("d2", "p1", "stale", "kept-d2"),   # p1 has none in d2
        ],
        "dataset string, participant string, status string, val string")
    out = resolve_live_stale(df, "status", "live", "stale", ["dataset", "participant"])
    assert {r.val for r in out.collect()} == {"a", "kept", "kept-d2"}


def test_time_range_filter_gates_only_matching_rows(spark):
    df = spark.createDataFrame(
        [("rqa", 5), ("rqa", 15), ("other", 99)], "kind string, ts int")
    out = time_range_filter(df, "ts", F.col("kind") == "rqa", 0, 10)
    assert {(r.kind, r.ts) for r in out.collect()} == {("rqa", 5), ("other", 99)}
    half_open = time_range_filter(df, "ts", F.col("kind") == "rqa", 5, 15,
                                  inclusive_end=False)
    assert {r.ts for r in half_open.collect()} == {5, 99}


def test_exclude_values(spark):
    df = spark.createDataFrame([("p1",), ("p2",)], "p string")
    assert [r.p for r in exclude_values(df, "p", ["p1"]).collect()] == ["p2"]


def test_allowlist_and_retraction_joins(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    keys = spark.createDataFrame([("a",)], "k string")
    assert [r.k for r in allowlist_semi_join(df, keys, ["k"]).collect()] == ["a"]
    assert [r.k for r in retraction_anti_join(df, keys, ["k"]).collect()] == ["b"]


def test_timestamp_router_routes_and_drops(spark):
    df = spark.createDataFrame(
        [("2024-01-02 00:00:00",), ("2024-02-02 00:00:00",), ("2030-01-01 00:00:00",)],
        "ts string").select(F.col("ts").cast("timestamp"))
    out = timestamp_router(
        df, "ts",
        [("jan", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
         ("feb", "2024-02-01 00:00:00", "2024-03-01 00:00:00")])
    assert sorted(r.dataset for r in out.collect()) == ["feb", "jan"]


def test_timestamp_router_rejects_overlap(spark):
    df = spark.createDataFrame([("2024-01-02 00:00:00",)], "ts string")
    with pytest.raises(ValueError):
        timestamp_router(df, "ts",
                         [("a", "2024-01-01", "2024-03-01"),
                          ("b", "2024-02-01", "2024-04-01")])


def test_fold_concat_orders_by_sort_cols(spark):
    df = spark.createDataFrame(
        [("p1", 2, "second"), ("p1", 1, "first"), ("p2", 1, "solo")],
        "p string, ord int, txt string")
    out = fold_concat(df, ["p"], "txt", ["ord"], sep="; ", out_col="f")
    got = {r.p: r.f for r in out.collect()}
    assert got == {"p1": "first; second", "p2": "solo"}


def test_fold_distinct_concat_sorts_and_dedups(spark):
    df = spark.createDataFrame(
        [("p1", "b"), ("p1", "a"), ("p1", "b")], "p string, v string")
    out = fold_distinct_concat(df, ["p"], "v", sep=";", out_col="f")
    assert out.collect()[0].f == "a;b"


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g1", i) for i in range(5)] + [("g2", 0)], "g string, v int")
    out = top_k_per_group(df, ["g"], [F.col("v")], 2, rank_col="rank")
    got = sorted((r.g, r.v, r.rank) for r in out.collect())
    assert got == [("g1", 0, 1), ("g1", 1, 2), ("g2", 0, 1)]


def test_merge_label_lists_latest_per_scheme(spark):
    import datetime as dt

    from engagement_data_pipeline_spark.operators.folds import merge_label_lists

    t0 = dt.datetime(2024, 1, 10)
    t1 = t0 + dt.timedelta(hours=1)

    def lab(scheme, code, at):
        return (scheme, code, at, True, "t")

    df = spark.createDataFrame(
        [("p1", [lab("a", "old_a", t0), lab("b", "only_b", t0)]),
         ("p1", [lab("a", "new_a", t1)]),
         ("p2", [lab("a", "p2_a", t0)])],
        "participant string, labels array<struct<scheme_id:string,"
        "code_id:string,date_time_utc:timestamp,checked:boolean,origin_id:string>>")
    out = {r.participant: r.labels for r in
           merge_label_lists(df, ["participant"]).collect()}
    assert [(l.scheme_id, l.code_id) for l in out["p1"]] == \
        [("a", "new_a"), ("b", "only_b")]   # latest per scheme, newest-first
    assert [(l.scheme_id, l.code_id) for l in out["p2"]] == [("a", "p2_a")]


def test_trace_append_only_history(spark):
    from engagement_data_pipeline_spark.operators.trace import (
        append_trace,
        init_trace,
        trace_path,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df = init_trace(df, "fetch")
    df = append_trace(df, "only_a", F.col("v") == "a")
    df = append_trace(df, "all")
    got = {r.id: r.path for r in
           df.select("id", trace_path().alias("path")).collect()}
    assert got == {1: "fetch;only_a;all", 2: "fetch;all"}


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F

    from engagement_data_pipeline_spark.operators.skew import salted_join

    # 1000 rows of one hot key + a tail, joined to a small dim
    skewed = spark.range(1100).select(
        F.when(F.col("id") < 1000, "hot").otherwise(F.col("id").cast("string"))
        .alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame(
        [("hot", "H"), ("1050", "T")], "k string, label string")
    got = salted_join(skewed, dim, ["k"], n_salts=8).collect()
    want = skewed.join(dim, ["k"]).collect()
    assert sorted((r.k, r.v, r.label) for r in got) == \
        sorted((r.k, r.v, r.label) for r in want)
    assert len(got) == 1001


def test_salted_distinct_count(spark):
    from pyspark.sql import functions as F

    from engagement_data_pipeline_spark.operators.skew import (
        salted_distinct_count,
    )

    df = spark.range(5000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 700).alias("v"))
    got = {r.g: r.n_distinct for r in
           salted_distinct_count(df, ["g"], "v").collect()}
    want = {r.g: r.n for r in
            df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()}
    assert got == want


def test_exact_percentiles_nearest_rank(spark):
    from engagement_data_pipeline_spark.operators.stats import exact_percentiles
    rows = [("a", float(v)) for v in range(1, 11)] + [("b", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: r for r in
           exact_percentiles(df, ["g"], "v", percents=(50, 90, 100)).collect()}
    # n=10: p50 -> rank ceil(5.0)=5 -> 5.0; p90 -> rank 9 -> 9.0;
    # p100 -> rank 10 -> 10.0 (== max).
    assert (out["a"].n, out["a"].p50, out["a"].p90, out["a"].p100) == (10, 5.0, 9.0, 10.0)
    assert (out["a"].min_value, out["a"].max_value) == (1.0, 10.0)
    # singleton group: every percentile is the one value
    assert (out["b"].n, out["b"].p50, out["b"].p100) == (1, 7.0, 7.0)


def test_hll_distinct_estimates_within_expected_error(spark):
    from pyspark.sql import functions as F
    from engagement_data_pipeline_spark.operators.stats import hll_distinct, HLL_M
    from engagement_data_pipeline_spark.training.dedup import md5_long
    # two groups with known cardinalities 500 and 2000; m=64 registers
    # -> relative error ~1.04/sqrt(64) = 13%; assert within 3 sigma
    rows = [("a", i) for i in range(500)] + [("b", i) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r.g: r for r in
           hll_distinct(df, ["g"], md5_long(F.col("v").cast("string"))).collect()}
    for g, true_n in (("a", 500), ("b", 2000)):
        est = out[g].hll_estimate
        assert abs(est - true_n) / true_n < 3 * 1.04 / (HLL_M ** 0.5), (g, est)
    assert out["b"].n_registers <= HLL_M
