"""S8: recovery-CSV ingest to the Message schema.

Reference: src/csv_to_engagement_db/csv_to_engagement_db.py —
columns `Sender, Message, ReceivedOn`; ReceivedOn is parsed by trying
six datetime formats (:22-41), localised to the source timezone, and
the message is routed to the dataset whose [start, end) window covers
the timestamp (F12, configuration.py:52-75); unroutable rows are
dropped. The origin_id is derived from the row content (the reference
uses file-URL + row index; content-hash keeps it deterministic under
re-ordering), and re-ingest is idempotent via K1's origin-keyed
upsert, replacing the reference's whole-file SHA guard (:178-184).

Everything is column expressions over `spark.read.csv` — the
multi-format parse is a coalesce of try_to_timestamp calls, not a
Python loop per row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cleaners import coda_id, parse_multiformat_timestamp
from ..labels.schema import empty_labels
from ..operators.filters import timestamp_router


def read_recovery_csv(spark, path: str) -> DataFrame:
    return spark.read.option("header", True).csv(path)


def csv_to_messages(csv_df: DataFrame,
                    dataset_ranges: Sequence[tuple[str, str, str]],
                    utc_offset_hours: int = 3,
                    origin_prefix: str = "csv") -> DataFrame:
    """Normalise `Sender, Message, ReceivedOn` rows to Message-schema
    rows. `dataset_ranges` = [(dataset, start_iso, end_iso)) in UTC;
    `utc_offset_hours` is the source timezone's fixed offset (the
    reference localises with a tz name; Nairobi is a constant +3)."""
    local_ts = parse_multiformat_timestamp(F.col("ReceivedOn"))
    utc_ts = local_ts - F.expr(f"INTERVAL {utc_offset_hours} HOURS")
    origin_id = F.concat(
        F.lit(f"{origin_prefix}:"),
        F.sha2(F.concat_ws("|", F.col("Sender"), F.col("Message"),
                           F.col("ReceivedOn")), 256))
    base = csv_df.select(
        F.col("Sender").alias("participant_uuid"),
        F.col("Message").alias("text"),
        utc_ts.alias("timestamp"),
        origin_id.alias("__origin_id"),
    ).where(F.col("timestamp").isNotNull())
    routed = timestamp_router(base, "timestamp", dataset_ranges)
    origin_id = F.col("__origin_id")
    return routed.select(
        F.concat(F.lit("msg-"), origin_id).alias("message_id"),
        "participant_uuid",
        "text",
        "timestamp",
        F.lit("in").alias("direction"),
        F.lit(None).cast("string").alias("channel_operator"),
        F.lit("live").alias("status"),
        "dataset",
        F.array().cast("array<string>").alias("previous_datasets"),
        empty_labels().alias("labels"),
        F.struct(origin_id.alias("origin_id"),
                 F.lit("recovery_csv").alias("origin_type")).alias("origin"),
        coda_id(F.col("text")).alias("coda_id"),
        F.col("timestamp").alias("last_updated"),
    )
