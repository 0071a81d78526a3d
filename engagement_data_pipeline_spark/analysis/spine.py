"""The analysis-pipeline spine: fetch and filter stages.

Mirrors reference src/common/get_messages_in_datasets.py (fetch:
latest-snapshot dedup F1 + live/stale resolution F4) and
src/engagement_db_to_analysis/traced_data_filters.py (F5 time range,
F6 test participants). Every stage is a pure DataFrame transform; the
whole spine is two narrow projections + one window + one anti-join —
no Python in the row path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import latest_snapshot
from ..operators.filters import resolve_live_stale


def fetch_messages(messages: DataFrame) -> DataFrame:
    """F1 + F4: keep the newest snapshot of each message, then keep
    stale messages only for participants with no live message in that
    dataset (reference get_messages_in_datasets.py:10-27,171-191)."""
    latest = latest_snapshot(messages, ["message_id"], ["last_updated", "message_id"])
    return resolve_live_stale(latest, "status", "live", "stale",
                              ["dataset", "participant_uuid"])


def filter_messages(messages: DataFrame, rqa_datasets: Sequence[str],
                    start_iso: str, end_iso: str,
                    test_participants: Sequence[str]) -> DataFrame:
    """F5 (inclusive RQA time range; non-RQA passes through) + F6
    (drop test participants everywhere). Reference
    traced_data_filters.py:14-97."""
    ts = F.col("timestamp")
    is_rqa = F.col("dataset").isin(list(rqa_datasets))
    in_range = (ts >= F.lit(start_iso).cast("timestamp")) & (ts <= F.lit(end_iso).cast("timestamp"))
    return (
        messages.where(~is_rqa | in_range)
        .where(~F.col("participant_uuid").isin(list(test_participants)))
    )
