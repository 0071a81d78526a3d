"""Top-level corpus-curation pipeline: the training-data analog of
`analysis/pipeline.py:generate_analysis_files` — ONE call takes a raw
documents frame to a training-ready corpus plus a full audit trail.

Stage order (each an already-oracle-certified operator; this module
only composes and materializes):

1. quality gate     — `text.quality_filter` envelope
2. PII scrub        — `text.scrub_pii` (counts + redacted text)
3. exact dedup      — sha256(normalized) group representatives
4. near-dup dedup   — MinHash-LSH pairs → large-star/small-star
                      connected components → cluster representatives
5. decontamination  — optional probe frame; docs sharing >= k shingles
                      with any probe are dropped
6. split assignment — hash-stable train/val/test
7. outputs          — curated corpus (partitioned by split), per-doc
                      disposition report (EVERY input row accounted
                      for, with its drop reason), summary stats

Execution shape at 100 TB: every stage is the operator's documented
scale plan; the expensive intermediates (scrubbed corpus, drop sets)
are materialized once — to parquet stage tables under `out_dir`
(production) — and each later stage reads the materialization. Drop
sets are tiny relative to the corpus, so the final assembly is
anti-joins against small frames, never a second corpus pass per
stage.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as D
from . import text as T
from .splits import DEFAULT_SPLITS, split_assign_hash


@dataclass
class CurationRun:
    """Handles to everything the run produced."""
    corpus: DataFrame      # curated rows: doc_id, text (scrubbed), split, ...
    report: DataFrame      # every input doc_id -> disposition (+ split)
    stats: DataFrame       # disposition -> n_docs, n_chars


def curate_corpus(docs: DataFrame, out_dir: str | None = None,
                  *, text_col: str = "text", id_col: str = "doc_id",
                  min_words: int = 5, min_mean_word_len: float = 2.0,
                  near_dup_threshold: float = 0.5,
                  probes: DataFrame | None = None,
                  min_shared_shingles: int = 3,
                  splits=DEFAULT_SPLITS) -> CurationRun:
    """Run the full curation pass. With `out_dir`, the scrubbed
    corpus and the report land as parquet (corpus partitioned by
    split for downstream pruning); without, frames stay lazy/cached
    for tests and interactive use."""
    passthrough = [c for c in docs.columns if c not in (id_col, text_col)]

    # 1-2. quality gate, then scrub the survivors (scrub cost is only
    # paid for rows that can still reach the corpus)
    kept_q = T.quality_filter(docs, text_col=text_col, id_col=id_col,
                              min_words=min_words,
                              min_mean_word_len=min_mean_word_len)
    pii = T.scrub_pii(F.col(text_col))
    scrubbed = kept_q.select(
        F.col(id_col), *passthrough,
        pii["redacted"].alias(text_col),
        (pii["n_emails"] + pii["n_urls"] + pii["n_phones"])
        .alias("n_pii_redactions"))
    if out_dir:
        p = os.path.join(out_dir, "stage_scrubbed")
        scrubbed.write.mode("overwrite").parquet(p)
        scrubbed = docs.sparkSession.read.parquet(p)
    else:
        scrubbed = scrubbed.cache()

    # 3. exact dedup: drop every non-representative of a sha group
    shas = scrubbed.select(
        F.col(id_col),
        F.sha2(D.normalize_text(F.col(text_col)), 256).alias("__sha"))
    reps = shas.groupBy("__sha").agg(F.min(id_col).alias("__rep"))
    drop_exact = (shas.join(reps, "__sha")
                  .where(F.col(id_col) != F.col("__rep"))
                  .select(id_col))

    # 4. near-dup dedup on the exact-deduped survivors (log^2-round
    # star contraction — the deep-chain-safe path)
    survivors = scrubbed.join(drop_exact, id_col, "left_anti")
    pairs = D.minhash_near_dup_pairs(survivors, text_col=text_col,
                                     id_col=id_col,
                                     threshold=near_dup_threshold)
    clusters = D.near_dup_clusters_star(pairs)
    drop_near = (clusters.where(F.col("doc_id") != F.col("cluster_rep"))
                 .select(F.col("doc_id").alias(id_col)))

    # 5. optional decontamination against the probe/eval set
    if probes is not None:
        tr = D._shingled(survivors.join(drop_near, id_col, "left_anti"),
                         text_col, id_col)
        pr = D._shingled(probes, text_col, id_col)
        tr_post = tr.select(F.col("id").alias("t_id"),
                            F.explode("h").alias("hh")).distinct()
        pr_post = pr.select(F.explode("h").alias("hh")).distinct()
        drop_cont = (tr_post.join(F.broadcast(pr_post), "hh")
                     .groupBy("t_id")
                     .agg(F.count(F.lit(1)).alias("n_shared"))
                     .where(F.col("n_shared") >= min_shared_shingles)
                     .select(F.col("t_id").alias(id_col)))
    else:
        drop_cont = scrubbed.select(id_col).limit(0)

    # 6-7. split + assemble. Drop sets are tiny: anti-joins, then the
    # report LEFT-joins them back so every input row is accounted for.
    curated = (scrubbed
               .join(drop_exact, id_col, "left_anti")
               .join(drop_near, id_col, "left_anti")
               .join(drop_cont, id_col, "left_anti"))
    curated = split_assign_hash(curated, splits=splits, id_col=id_col)

    tag = lambda df, name: df.select(  # noqa: E731
        F.col(id_col), F.lit(name).alias("__r"))
    reasons = (tag(docs.select(id_col)
                   .join(kept_q.select(id_col), id_col, "left_anti"),
                   "dropped_quality")
               .unionByName(tag(drop_exact, "dropped_exact_duplicate"))
               .unionByName(tag(drop_near, "dropped_near_duplicate"))
               .unionByName(tag(drop_cont, "dropped_contaminated")))
    report = (docs.select(id_col)
              .join(reasons, id_col, "left")
              .join(curated.select(id_col, "split"), id_col, "left")
              .select(id_col,
                      F.coalesce(F.col("__r"), F.lit("kept"))
                      .alias("disposition"),
                      "split"))
    stats = (docs.select(F.col(id_col), F.length(text_col).alias("__len"))
             .join(report.select(id_col, "disposition"), id_col)
             .groupBy("disposition")
             .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                  F.sum("__len").cast("long").alias("n_chars")))

    if out_dir:
        (curated.write.mode("overwrite").partitionBy("split")
         .parquet(os.path.join(out_dir, "corpus")))
        report.write.mode("overwrite").parquet(
            os.path.join(out_dir, "report"))
    return CurationRun(corpus=curated, report=report, stats=stats)
