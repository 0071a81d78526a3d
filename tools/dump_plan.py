"""Dump full `.explain("formatted")` output for named queries into
plans/<tag>/<query>_<suffix>.txt — the before/after evidence files the
optimization rounds commit.

Usage: python tools/dump_plan.py --tag r14 --suffix before q1 q2 ...
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from tools.fixture_cache import default_fixture_env

    default_fixture_env()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[8]")
             .appName("dump-plan")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.python.sql.dataFrameDebugging.enabled",
                     "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from engagement_data_pipeline_spark.queries.registry import QUERIES

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(root, exist_ok=True)
    for name in args.names:
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(root, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
