"""Corpus-level text cleaning: C4-style duplicate-span (boilerplate)
removal.

The C4 pipeline (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning", §2.2) removes any three-sentence span that occurs
more than once in the corpus — boilerplate (cookie banners, footers,
license headers) repeats verbatim across many pages while genuine
content does not. The reference pipeline has the same concern at
message granularity (its dedup is per-message origin-id,
`src/rapid_pro_to_engagement_db/rapid_pro_to_engagement_db.py:186-190`);
at pre-training scale the unit is a span *within* a document.

This implementation segments each normalized document into
non-overlapping fixed-width word windows (the corpus here is
normalized single-line text, so word windows stand in for C4's
sentence triples), counts in how many distinct documents each span
occurs, and removes spans above a document-frequency threshold,
reassembling the surviving text in order.

Shape at scale (100 TB): one explode (docs → spans), one hash
aggregation keyed by span hash (map-side combinable, the df count),
one equi-join of spans against their corpus df (shuffle on the
64-bit span hash, never the span text), one per-doc re-aggregation.
No driver-side state: the boilerplate set is never collected. When
the span-df table is known to be small (high threshold), the join
side can be broadcast instead — pass ``broadcast_threshold`` to
switch; the default keeps the plan size-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long, normalize_text
from .text import spread_narrow_scan

#: Span width in words. C4 uses three sentences; on one-line
#: normalized corpora a fixed word window is the deterministic analog.
SPAN_WORDS = 8
#: A span present in more than this many distinct docs is boilerplate.
MAX_SPAN_DOCS = 2


def doc_spans(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id",
              span_words: int = SPAN_WORDS) -> DataFrame:
    """Explode each document into non-overlapping `span_words`-word
    spans: (doc_id, span_idx, span, span_h). The trailing short
    remainder is kept as its own span so cleaned text reassembles
    losslessly. Pure projection + explode — no shuffle."""
    norm = normalize_text(F.col(text_col))
    words = F.split(norm, " ")
    n_spans = F.ceil(F.size(words) / F.lit(span_words)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), F.greatest(n_spans - 1, F.lit(0))),
        lambda i: F.concat_ws(
            " ", F.slice(words, i * span_words + 1, span_words)),
    )
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.posexplode(spans).alias("span_idx", "span"))
            .select("doc_id", F.col("span_idx").cast("long").alias("span_idx"),
                    "span", md5_long(F.col("span")).alias("span_h")))


def boilerplate_clean(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      span_words: int = SPAN_WORDS,
                      max_span_docs: int = MAX_SPAN_DOCS) -> DataFrame:
    """Remove corpus-duplicate spans from every document.

    Returns one row per input document:
    (doc_id, n_spans, n_removed, clean_n_words, clean_md5) — the
    cleaned text is re-assembled from surviving spans in original
    order; the md5 pins its exact bytes without shipping long strings
    through the result.

    Spans are compared via their 60-bit md5 hash (`md5_long`): the df
    aggregation and the back-join shuffle fixed-width longs, not span
    text. Span-hash collisions conflate two spans' df counts — at
    2^60 that is the standard fingerprint-dedup trade (same as
    MinHash banding in `dedup.py`).
    """
    spans = doc_spans(spread_narrow_scan(docs), text_col, id_col,
                      span_words)
    df_counts = (spans.groupBy("span_h")
                 .agg(F.count_distinct("doc_id").alias("span_docs")))
    flagged = (
        spans.join(df_counts, "span_h")
        .withColumn("is_boiler", F.col("span_docs") > F.lit(max_span_docs))
    )
    kept = F.array_sort(F.collect_list(
        F.when(~F.col("is_boiler"),
               F.struct("span_idx", "span"))))
    agg = (flagged.groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_spans"),
                F.sum(F.col("is_boiler").cast("long"))
                .cast("long").alias("n_removed"),
                kept.alias("__kept")))
    clean_text = F.concat_ws(
        " ", F.transform(F.col("__kept"), lambda s: s["span"]))
    return agg.select(
        "doc_id", "n_spans", "n_removed",
        F.when(F.size("__kept") > 0, F.size(F.split(clean_text, " ")))
        .otherwise(F.lit(0)).cast("long").alias("clean_n_words"),
        F.md5(clean_text).alias("clean_md5"))


#: Sliding-gram width for cross-document duplicated-span coverage.
DUP_GRAM_WORDS = 8


def dup_span_stats(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   k: int = DUP_GRAM_WORDS) -> DataFrame:
    """Per-document CROSS-CORPUS duplicated-span coverage — the
    ExactSubstr dedup signal (Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better") re-expressed at sliding
    k-gram granularity: a suffix array over 100 TB is a single-machine
    structure, but every duplicated substring of length >= k contains
    a duplicated k-gram, so k-gram blocking finds the same spans with
    distributed primitives.

    Returns one row per document:
    (doc_id, n_words, n_grams, n_dup_grams, dup_tokens, dup_frac)
    where a gram is "dup" iff it occurs in >= 2 DISTINCT documents
    (within-doc repetition is `doc_repetition`'s signal, not this
    one), `dup_tokens` is the exact size of the union of the
    duplicated grams' [pos, pos+k) intervals, and `dup_frac` =
    dup_tokens / n_words — the filter/trim knob.

    Shape at scale: one explode to (doc_id, pos, gram_hash) — the
    hashes are computed INSIDE the array expression so each word is
    touched k times, never O(n^2); the duplicate-gram set comes from
    one map-side-combinable count-distinct keyed by the 60-bit hash;
    the back-join ships hashes, not text; coverage is one window pass
    per doc over its duplicated positions only (fixed-length
    intervals sorted by pos: each new interval adds min(gap, k)
    tokens, no interval materialization). Nothing is collected."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    base = (spread_narrow_scan(docs)
            .select(F.col(id_col).alias("doc_id"),
                    words.alias("words"))
            .select("doc_id", F.size("words").alias("n_words"), "words"))
    grams = F.transform(
        F.sequence(F.lit(0), F.col("n_words") - k),
        lambda i: F.struct(
            i.cast("long").alias("pos"),
            md5_long(F.concat_ws(" ", F.slice("words", i + 1, F.lit(k))))
            .alias("h")))
    pos = (base.where(F.col("n_words") >= k)
           .select("doc_id", F.explode(grams).alias("g"))
           .select("doc_id", F.col("g.pos").alias("pos"),
                   F.col("g.h").alias("h")))
    hot = (pos.groupBy("h")
           .agg(F.count_distinct("doc_id").alias("gdocs"))
           .where(F.col("gdocs") >= 2)
           .select("h"))
    dup = pos.join(hot, "h")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    delta = F.col("pos") - F.lag("pos").over(w)
    inc = F.when(delta.isNull(), F.lit(k)).otherwise(
        F.least(delta, F.lit(k)))
    cov = (dup.withColumn("__inc", inc)
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_dup_grams"),
                F.sum("__inc").cast("long").alias("dup_tokens")))
    return (base.select("doc_id", "n_words")
            .join(cov, "doc_id", "left")
            .select(
                "doc_id",
                F.col("n_words").cast("long").alias("n_words"),
                F.greatest(F.col("n_words") - F.lit(k - 1), F.lit(0))
                .cast("long").alias("n_grams"),
                F.coalesce("n_dup_grams", F.lit(0)).cast("long")
                .alias("n_dup_grams"),
                F.coalesce("dup_tokens", F.lit(0)).cast("long")
                .alias("dup_tokens"),
                (F.coalesce("dup_tokens", F.lit(0)).cast("double")
                 / F.col("n_words").cast("double")).alias("dup_frac")))
