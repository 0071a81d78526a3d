"""Count-min sketch properties (operators/stats.py): fixed cell
count, never undercounts, exact under no-collision headroom, and
tight for a heavy hitter even under forced collisions."""

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.operators.stats import (cms_estimate,
                                                            cms_sketch)


def _tokens(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "token string")


def test_sketch_has_fixed_cells_and_conserves_mass(spark):
    df = _tokens(spark, {f"w{i}": i + 1 for i in range(30)})
    sk = cms_sketch(df, "token", depth=3, width=8).collect()
    assert len(sk) <= 3 * 8
    # every depth row saw every increment exactly once
    per_j = {}
    for r in sk:
        per_j[r.j] = per_j.get(r.j, 0) + r.c
    assert per_j == {0: 465, 1: 465, 2: 465}


def test_estimates_never_undercount_and_heavy_hitter_is_tight(spark):
    counts = {f"tail{i}": 1 for i in range(64)}
    counts["hot"] = 1000
    df = _tokens(spark, counts)
    keys = df.select("token").distinct()
    # width 4 << 65 keys: collisions guaranteed in every row
    sk = cms_sketch(df, "token", depth=4, width=4)
    est = {r.token: r.cms_estimate
           for r in cms_estimate(sk, keys, "token",
                                 depth=4, width=4).collect()}
    for k, n in counts.items():
        assert est[k] >= n, (k, est[k], n)
    # the heavy hitter's relative error is bounded by the tail mass
    assert est["hot"] <= 1000 + 64


def test_no_collisions_means_exact(spark):
    counts = {"a": 5, "b": 2, "c": 9}
    df = _tokens(spark, counts)
    sk = cms_sketch(df, "token", depth=4, width=256)
    est = {r.token: r.cms_estimate
           for r in cms_estimate(sk, df.select("token").distinct(),
                                 "token", depth=4, width=256).collect()}
    assert est == counts


def test_out_of_corpus_probe_estimates_zero(spark):
    """A probed key the sketched corpus never saw must surface with
    its guaranteed >=0 estimate (0 when its cells are all absent from
    the sparse sketch), not silently vanish from the output."""
    df = _tokens(spark, {"a": 5, "b": 2})
    sk = cms_sketch(df, "token", depth=4, width=256)
    probes = spark.createDataFrame(
        [("a",), ("never-seen",)], "token string")
    est = {r.token: r.cms_estimate
           for r in cms_estimate(sk, probes, "token",
                                 depth=4, width=256).collect()}
    assert est == {"a": 5, "never-seen": 0}


def test_hdr_bucket_exact_cells(spark):
    """Pinned bucket ids: e*k + sub with e = floor(log2 x) and linear
    sub-buckets — pure integer/exponent arithmetic."""
    from engagement_data_pipeline_spark.operators.stats import hdr_bucket

    df = spark.createDataFrame(
        [(1,), (2,), (3,), (16,), (17,), (31,), (1023,)], "x long")
    got = {r.x: r.b for r in
           df.select("x", hdr_bucket("x").alias("b")).collect()}
    # x=1: e=0,sub=0 → 0 ; x=3: e=1,sub=floor(1/2*16)=8 → 24
    # x=17: e=4,sub=1 → 65 ; x=31: e=4,sub=15 → 79
    assert got == {1: 0, 2: 16, 3: 24, 16: 64, 17: 65, 31: 79, 1023: 159}


def test_hdr_quantiles_error_bound_and_merge(spark):
    """The quantile estimate is the containing bucket's lower edge:
    est <= exact < est * (k+1)/k for every q. Merging per-half
    sketches equals sketching the whole corpus cell-for-cell."""
    from engagement_data_pipeline_spark.operators.stats import (
        HDR_K,
        hdr_merge,
        hdr_quantiles,
        hdr_sketch,
    )

    values = [((i * 2654435761) % 9973) + 1 for i in range(2000)]
    df = spark.createDataFrame([("g", v, i) for i, v in enumerate(values)],
                               "g string, v long, i long")
    sk = hdr_sketch(df, ["g"], "v")
    qs = (0.5, 0.9, 0.99)
    got = {r.q: r.est for r in hdr_quantiles(sk, ["g"], qs).collect()}
    s = sorted(values)
    for q in qs:
        exact = s[int(q * (len(s) - 1))]
        assert got[q] <= exact < got[q] * (HDR_K + 1) / HDR_K, (q, got[q], exact)

    halves = [df.where(F.col("i") % 2 == 0), df.where(F.col("i") % 2 == 1)]
    merged = hdr_merge([hdr_sketch(h, ["g"], "v") for h in halves], ["g"])
    assert sorted(merged.collect()) == sorted(sk.collect())


def test_hdr_percentile_assign_orders_and_bounds(spark):
    """Percentiles are monotone in the value, bounded in [0,1), and a
    row's pct_below + its bucket mass accounts for all rows at or
    below its bucket."""
    from engagement_data_pipeline_spark.operators.stats import (
        hdr_percentile_assign, hdr_sketch)

    df = spark.range(1, 1001).selectExpr("id AS doc_id",
                                         "id * 3 AS metric")
    sk = hdr_sketch(df, [], "metric")
    out = hdr_percentile_assign(df, sk, "metric").collect()
    by_val = sorted(out, key=lambda r: r["metric"])
    last = -1.0
    for r in by_val:
        assert 0.0 <= r["pct_below"] < 1.0
        assert r["pct_below"] >= last
        last = r["pct_below"]
        assert r["pct_below"] + r["pct_bucket_mass"] <= 1.0 + 1e-12
    # sub-domain rows pin to 0.0
    zero = spark.createDataFrame([(1, 0)], "doc_id long, metric long")
    z = hdr_percentile_assign(zero, sk, "metric").first()
    assert z["pct_below"] == 0.0 and z["pct_bucket_mass"] == 0.0
