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
