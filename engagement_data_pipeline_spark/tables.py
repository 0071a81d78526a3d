"""Testdata / warehouse table access.

All demo queries read the driver-generated synthetic parquet tables
(TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings. Reads are plain `spark.read.parquet`
scans so Catalyst can push filters and prune columns into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Memo of the (immutable) per-table DataFrames, keyed by
#: applicationId so a stopped session's plans are never handed out
#: (same idiom as queries/engagement.py's _PLAN_CACHE). This is PLAN
#: reuse only — every action still computes from the parquet files;
#: it saves the ~100 ms `spark.read.parquet` pays per call for footer
#: schema inference + file listing, which the bench's 188 queries
#: would otherwise pay a few hundred times per run.
_LOAD_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _LOAD_CACHE.get(key)
    if df is None:
        df = _load(spark, sf_dir, name)
        _LOAD_CACHE[key] = df
    return df


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table. Filters applied by callers are pushed
    into this parquet scan by Catalyst (check: PushedFilters in
    `.explain("formatted")`).

    Timestamp normalization: generated parquet has varied across
    driver versions — TIMESTAMP(NANOS) (read as bigint via
    spark.sql.legacy.parquet.nanosAsLong, floor-divided to micros
    exactly as DuckDB truncates nanos→micros) and plain
    timestamp[us] with no timezone, which Spark 4 reads as
    TIMESTAMP_NTZ. Engine code assumes session-timezone TIMESTAMP
    (UTC per session.py), so NTZ columns are cast: with a UTC
    session the wall-clock reinterpretation is the identity, and
    DuckDB's epoch_us treats naive timestamps as UTC the same way."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # integer `div`, not `/`: epoch-nanos (~1.7e18) overflows double
        # precision and would round the microsecond.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [f.name for f in df.schema.fields
           if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
