"""End-to-end curation disposition: the whole selection pipeline
(quality gate -> near-dup dedup decision -> split assignment) applied
to every document, with the reason a doc was dropped.

This is the "what actually ships to the trainer, and why" report — a
composition of three independently oracle-checked operators into one
frame. Gate order is documented policy: quality first, duplicates
second, split last; the dedup decision is computed corpus-wide (as
real pipelines do — MinHash clusters don't re-form after the quality
gate), so a duplicate whose representative was itself quality-dropped
still reports 'dropped_duplicate'.

Shape at scale: three left joins of the doc scan against the (much
smaller) component outputs, all keyed on doc_id — the expensive work
lives in the component plans, each already audited in PLANS.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from . import splits_q, training
from ._helpers import apply_runtime_conf


def doc_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    q = (training.doc_quality_corpus(spark, sf_dir)
         .select("doc_id", F.lit(True).alias("q_pass")))
    sv = (training.doc_dedup_corpus(spark, sf_dir)
          .select("doc_id", F.lit(True).alias("dd_keep")))
    sp = splits_q.doc_split_assign(spark, sf_dir).select("doc_id", "split")
    out = (docs.join(q, "doc_id", "left").join(sv, "doc_id", "left")
           .join(sp, "doc_id", "left"))
    disposition = (
        F.when(F.col("q_pass").isNull(), F.lit("dropped_quality"))
        .when(F.col("dd_keep").isNull(), F.lit("dropped_duplicate"))
        .otherwise(F.lit("kept")))
    return out.select(
        "doc_id", "source", disposition.alias("disposition"),
        F.when(F.col("q_pass").isNotNull() & F.col("dd_keep").isNotNull(),
               F.col("split")).alias("split"))


DOC_CURATION_REPORT_SQL = f"""
WITH q AS (SELECT doc_id FROM ({training.DOC_QUALITY_CORPUS_SQL})),
sv AS (SELECT doc_id FROM ({training.DOC_DEDUP_CORPUS_SQL})),
sp AS (SELECT doc_id, split FROM ({splits_q.DOC_SPLIT_ASSIGN_SQL}))
SELECT d.doc_id, d.source,
       CASE WHEN q.doc_id IS NULL THEN 'dropped_quality'
            WHEN sv.doc_id IS NULL THEN 'dropped_duplicate'
            ELSE 'kept' END AS disposition,
       CASE WHEN q.doc_id IS NOT NULL AND sv.doc_id IS NOT NULL
            THEN sp.split END AS split
FROM documents d
LEFT JOIN q ON d.doc_id = q.doc_id
LEFT JOIN sv ON d.doc_id = sv.doc_id
LEFT JOIN sp ON d.doc_id = sp.doc_id
"""
