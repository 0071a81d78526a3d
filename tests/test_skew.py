"""Skew kill-switch: prove the salted join actually spreads a hot
key's rows across reducers (deterministic partition-size assertion —
wall-clock deltas are printed, not asserted, because this host's
timing variance would make them flaky)."""

import time

from pyspark.sql import functions as F


def _max_partition_rows(df) -> int:
    sizes = (df.withColumn("__p", F.spark_partition_id())
             .groupBy("__p").count().collect())
    return max(r["count"] for r in sizes)


def test_salted_join_spreads_hot_key(spark):
    from engagement_data_pipeline_spark.operators.skew import salted_join

    n, n_salts = 40_000, 16
    conf = spark.conf
    saved = {k: conf.get(k) for k in
             ("spark.sql.autoBroadcastJoinThreshold",
              "spark.sql.adaptive.enabled",
              "spark.sql.shuffle.partitions")}
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    # enough reducers that distinct (key, salt) pairs rarely collide —
    # with very few partitions the salts all land in one reducer and
    # the spread is invisible
    conf.set("spark.sql.shuffle.partitions", "64")
    try:
        skewed = spark.range(n).select(
            F.when(F.col("id") % 10 < 8, F.lit("hot"))
            .otherwise(F.col("id").cast("string")).alias("k"),
            F.col("id").alias("v"))
        dim = (spark.range(n).select(
            F.col("id").cast("string").alias("k"))
            .union(spark.createDataFrame([("hot",)], "k string"))
            .withColumn("w", F.length("k")))

        t0 = time.monotonic()
        plain = skewed.join(dim, ["k"])
        plain_max = _max_partition_rows(plain)
        t_plain = time.monotonic() - t0

        t0 = time.monotonic()
        salted = salted_join(skewed, dim, ["k"], n_salts=n_salts)
        salted_max = _max_partition_rows(salted)
        t_salted = time.monotonic() - t0

        # The hot key holds 80% of rows: plain lands them on ONE
        # reducer; salting must spread them over ~n_salts reducers.
        assert plain_max >= int(0.8 * n)
        assert salted_max * 2 <= plain_max, (
            f"salting did not spread the hot key: {salted_max} vs {plain_max}")
        # same join result
        assert salted.count() == plain.count()
        print(f"hot-key max reducer rows: plain={plain_max} "
              f"salted={salted_max}; wall plain={t_plain:.2f}s "
              f"salted={t_salted:.2f}s")
    finally:
        for k, v in saved.items():
            conf.set(k, v)
