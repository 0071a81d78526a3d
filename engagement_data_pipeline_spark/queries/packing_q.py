"""Registry queries for sequence packing and document chunking
(training/packing.py), each with an exact DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..tables import load
from ..training.packing import (batch_plan_sql, chunk_plan, chunk_plan_sql,
                                pack_plan, pack_plan_sql)
from ._helpers import apply_runtime_conf


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    return load(spark, sf_dir, "documents")


def seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing placement for the whole corpus: one
    per-shard window cumulative sum; every (doc → shard, offset,
    sequence span) is closed-form from it."""
    return pack_plan(_docs(spark, sf_dir))


SEQ_PACKING_SQL = pack_plan_sql()


def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunk plan (RAG shape): zero-shuffle
    explode; chunk_md5 pins the exact slice content cross-engine."""
    return chunk_plan(_docs(spark, sf_dir))


DOC_CHUNKS_SQL = chunk_plan_sql()


def doc_batch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed inference batching with per-batch padding-waste
    accounting: one window per (cap, shard) + a subset regroup — the
    serving-side twin of seq_packing (training/packing.py:batch_plan)."""
    from ..training.packing import batch_plan

    return batch_plan(_docs(spark, sf_dir))


DOC_BATCH_PLAN_SQL = batch_plan_sql()
