"""Structured Streaming wrappers for the ingest path (SURVEY §2.12)."""

from .ingest import foreach_batch_upsert, stream_csv_source

__all__ = ["foreach_batch_upsert", "stream_csv_source"]
