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
bounds micro-batch size; the merge is one anti-join shuffle per
batch on the origin key (Delta MERGE when a transactional table
format is available).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import idempotent_upsert

CSV_LANDING_SCHEMA = "Sender string, Message string, ReceivedOn string"


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


def foreach_batch_upsert(table_path: str, origin_cols: Sequence[str],
                         transform: Callable[[DataFrame], DataFrame] | None = None,
                         ) -> Callable[[DataFrame, int], None]:
    """A foreachBatch function: normalise the micro-batch (optional
    `transform`), then merge into the parquet table keyed on the
    origin columns — existing rows win, so replays are no-ops."""
    def _merge(batch: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch = transform(batch)
        spark = batch.sparkSession
        try:
            existing = spark.read.parquet(table_path)
        except Exception:
            batch.write.mode("overwrite").parquet(table_path)
            return
        merged = idempotent_upsert(existing, batch, origin_cols)
        # Parquet has no transactional MERGE; stage-then-swap keeps the
        # write atomic enough for tests. On Delta/Iceberg this whole
        # function is `MERGE INTO ... WHEN NOT MATCHED INSERT`.
        staged = merged.cache()
        staged.count()
        staged.write.mode("overwrite").parquet(table_path)
        staged.unpersist()
    return _merge
