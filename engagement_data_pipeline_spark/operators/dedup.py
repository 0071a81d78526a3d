"""Deduplication operators.

Reference semantics (SURVEY §2.3):
  F1  latest-snapshot dedup — keep the newest version of each message
      (reference: src/common/get_messages_in_datasets.py:10-27, which
      sorts descending by last_updated and keeps the first per
      message_id).
  F3  origin-id uniqueness assert
      (reference: src/common/get_messages_in_datasets.py:157-169).
  K1  idempotent upsert keyed on origin_id (reference:
      src/rapid_pro_to_engagement_db/rapid_pro_to_engagement_db.py:175-221
      does a point lookup per message; set-based MERGE semantics here).

Scale notes: all three are single hash-shuffle operators on their key.
At 100 TB, partition the fact table by `dataset` and bucket by the
dedup key so repeated runs reuse the layout; AQE handles skewed keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(df: DataFrame, key_cols: Sequence[str],
                    order_cols: Sequence[str]) -> DataFrame:
    """Keep the latest version per key (F1).

    `order_cols` are sorted DESC; include a unique tiebreaker column
    last (the reference relies on Python stable sort; a distributed
    engine must make the order total to be deterministic).
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_keys(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Keys occurring more than once, with their counts (F3).

    The reference raises on any duplicate origin_id; callers can
    `.isEmpty()`-check this and raise, keeping the check a single
    aggregate instead of a per-row RPC.
    """
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def assert_unique(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Raise AssertionError if any key repeats (F3 hard-fail form)."""
    dupes = duplicate_keys(df, key_cols).limit(1).collect()
    if dupes:
        raise AssertionError(f"duplicate keys found for {key_cols}: {dupes[0]}")
    return df


def idempotent_upsert(existing: DataFrame, incoming: DataFrame,
                      origin_cols: Sequence[str],
                      order_cols: Sequence[str] | None = None) -> DataFrame:
    """Set-based equivalent of the reference's lookup-before-write (K1):
    insert an incoming row only if no existing row shares its origin
    key. Existing rows always win; incoming duplicates collapse to one
    deterministic representative — the max row under `order_cols`
    (default: every non-key column, so the pick is a total order and
    repeated runs insert identical rows; dropDuplicates would be
    partition-order dependent).

    On a Delta/Iceberg warehouse this is `MERGE ... WHEN NOT MATCHED
    INSERT`; the pure-DataFrame form is anti-join + union, one shuffle
    on the origin key.
    """
    if order_cols is None:
        order_cols = [c for c in incoming.columns if c not in set(origin_cols)]
    deduped = (latest_snapshot(incoming, origin_cols, order_cols)
               if order_cols else incoming.dropDuplicates(list(origin_cols)))
    new_rows = deduped.join(
        existing.select(*origin_cols).distinct(), list(origin_cols), "left_anti"
    )
    return existing.unionByName(new_rows)


def upsert_latest(existing: DataFrame, incoming: DataFrame,
                  origin_cols: Sequence[str],
                  order_cols: Sequence[str] | None = None) -> DataFrame:
    """MERGE WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT: the
    incoming batch's rows REPLACE existing rows sharing their origin
    key (the Delta upsert the reference's contact-field writeback K6
    does per-document). Incoming duplicates collapse to the same
    deterministic representative as `idempotent_upsert`. Safe under
    replay ONLY together with txn watermarks — without them a
    replayed old batch would clobber newer payloads, which is why the
    merge path requires txn_app_id for this mode. Same plan shape:
    anti-join + union, one shuffle on the origin key."""
    if order_cols is None:
        order_cols = [c for c in incoming.columns if c not in set(origin_cols)]
    deduped = (latest_snapshot(incoming, origin_cols, order_cols)
               if order_cols else incoming.dropDuplicates(list(origin_cols)))
    kept = existing.join(
        deduped.select(*origin_cols).distinct(), list(origin_cols),
        "left_anti")
    return kept.unionByName(deduped)
