"""Streaming ingest: readStream over a landing directory →
Message-schema normalisation → foreachBatch idempotent merge.

The reference runs its syncs as daily batch jobs with hand-rolled
watermark caches (SURVEY §2.12); Structured Streaming gives the same
incremental semantics natively: the checkpoint replaces the timestamp
cache (exactly-once per micro-batch), and the origin-id keyed merge
inside foreachBatch replaces the per-message lookup-before-write
(rapid_pro_to_engagement_db.py:175-221) — late or replayed files
cannot double-insert.

At scale: the landing dir is object storage; maxFilesPerTrigger
bounds micro-batch size. The target table is hash-partitioned on
``bucket = pmod(xxhash64(origin), n_buckets)`` so each micro-batch
rewrites ONLY the bucket partitions its keys land in (dynamic
partition overwrite) — I/O per batch is O(touched buckets), not
O(table). On a transactional format (Delta/Iceberg) the same merge is
`MERGE INTO ... WHEN NOT MATCHED INSERT` and the bucketing becomes
the table's clustering key.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import idempotent_upsert

CSV_LANDING_SCHEMA = "Sender string, Message string, ReceivedOn string"

#: Partition column added to merge targets; a pure function of the
#: origin key, so a row's bucket never changes across batches.
BUCKET_COL = "bucket"


def origin_bucket(origin_cols: Sequence[str], n_buckets: int):
    """Stable bucket id for an origin key: pmod(xxhash64, n)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in origin_cols]),
                  F.lit(n_buckets)).cast("int")


def stream_csv_source(spark: SparkSession, landing_dir: str,
                      max_files_per_trigger: int | None = None) -> DataFrame:
    """readStream over recovery-CSV files landing in a directory."""
    reader = (
        spark.readStream.schema(CSV_LANDING_SCHEMA)
        .option("header", True)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.csv(landing_dir)


def read_merged_table(spark: SparkSession, table_path: str) -> DataFrame:
    """Read a merge target written by `foreach_batch_upsert`, hiding
    the internal bucket partition column."""
    return spark.read.parquet(table_path).drop(BUCKET_COL)


def dedup_within_watermark(stream: DataFrame, key_cols: Sequence[str],
                           ts_col: str, delay: str = "10 minutes") -> DataFrame:
    """Streaming F1/K1 twin: drop duplicate origin keys arriving
    within the watermark horizon, state bounded by the delay.

    `dropDuplicatesWithinWatermark` keeps per-key state only until the
    watermark passes (unlike plain dropDuplicates, whose state grows
    without bound on an infinite key space) — the right semantics for
    at-least-once sources that can replay a message within minutes,
    with the downstream foreachBatch merge still catching replays
    beyond the horizon. State store size ≈ keys-per-delay-window,
    independent of stream lifetime.
    """
    return (stream.withWatermark(ts_col, delay)
            .dropDuplicatesWithinWatermark(list(key_cols)))


def foreach_batch_upsert(table_path: str, origin_cols: Sequence[str],
                         transform: Callable[[DataFrame], DataFrame] | None = None,
                         n_buckets: int = 16,
                         ) -> Callable[[DataFrame, int], None]:
    """A foreachBatch function: normalise the micro-batch (optional
    `transform`), then merge into the bucket-partitioned parquet table
    keyed on the origin columns — existing rows win, so replays are
    no-ops.

    Only the bucket partitions containing batch keys are rewritten
    (dynamic partition overwrite); untouched buckets' files are left
    in place. The merged frame is localCheckpoint-ed before the write
    so the overwrite never re-reads files it is about to replace —
    an executor loss mid-write cannot recompute lineage from deleted
    source files.
    """
    def _merge(batch: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch = transform(batch)
        spark = batch.sparkSession
        batch = batch.withColumn(BUCKET_COL,
                                 origin_bucket(origin_cols, n_buckets))
        try:
            existing = spark.read.parquet(table_path)
        except Exception:
            (batch.write.mode("overwrite")
             .partitionBy(BUCKET_COL).parquet(table_path))
            return
        # Buckets present in this batch — bounded by n_buckets, so the
        # collect is O(n_buckets) regardless of table size.
        hit = sorted(r[0] for r in
                     batch.select(BUCKET_COL).distinct().collect())
        touched = existing.where(F.col(BUCKET_COL).isin(hit))
        merged = idempotent_upsert(touched, batch, origin_cols)
        # One output file per bucket (instead of shuffle-partitions ×
        # buckets small files), then materialize before overwriting:
        # the checkpoint truncates lineage so the write cannot lazily
        # re-read the partitions it deletes.
        merged = merged.repartition(len(hit) or 1, F.col(BUCKET_COL))
        merged = merged.localCheckpoint(eager=True)
        (merged.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(BUCKET_COL).parquet(table_path))
    return _merge
