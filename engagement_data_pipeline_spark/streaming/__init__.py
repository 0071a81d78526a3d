"""Structured Streaming wrappers for the ingest path (SURVEY §2.12)."""

from .drain import drain_changes, fan_out
from .ingest import foreach_batch_upsert, stream_csv_source

__all__ = ["drain_changes", "fan_out", "foreach_batch_upsert",
           "stream_csv_source"]
