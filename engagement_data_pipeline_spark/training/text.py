"""Text analysis operators: token counting, quality scoring,
language-ID, document fingerprinting.

All pure column expressions (whole-stage codegen, no shuffle, no
Python), so they cost one scan even at 100 TB and can be fused with
any downstream aggregation. Ratios are double divisions of exact
integers computed in a fixed operand order, giving bit-identical
results in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text


def _size_bytes(conf_val: str) -> int:
    """Parse a Spark byte-size conf string ('134217728', '134217728b',
    '128m', '1g') to bytes."""
    import re

    m = re.fullmatch(r"(\d+)\s*([kmgt]?)b?",
                     conf_val.strip().lower())
    if m is None:
        return 128 * 1024 * 1024
    mult = {"": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30,
            "t": 1 << 40}[m.group(2)]
    return int(m.group(1)) * mult


def spread_narrow_scan(df: DataFrame) -> DataFrame:
    """Repartition ONLY when the input scan is narrower than the
    cluster has slots. A single small parquet file scans as one task,
    which serializes any compute-heavy projection that follows (the
    explode/regex stages here) onto one core; a genuinely wide input
    (the 100 TB case) already exceeds the slot count and passes
    through untouched — no shuffle is ever added to big data.

    Width is estimated from the scan's file list (`inputFiles`), never
    the RDD API (`df.rdd` forces plan analysis through the RDD
    conversion path), mirroring Spark's own bin-packing: splits =
    ceil(Σ(size + openCostInBytes) / maxPartitionBytes) over the file
    list (FilePartition packs many small files into one task, so 32
    tiny files are ONE narrow task, not 32 wide ones; a single huge
    file splits into many scan partitions, so it is NOT narrow).
    Remote files that can't be stat-ed locally count maxPartitionBytes
    each — conservative for remote tiny files, exact everywhere else.
    Frames with no file lineage (post-shuffle) are already
    `spark.sql.shuffle.partitions` wide and pass through."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files:
        return df
    max_bytes = _size_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes",
                       str(128 * 1024 * 1024)))
    open_cost = _size_bytes(
        spark.conf.get("spark.sql.files.openCostInBytes",
                       str(4 * 1024 * 1024)))
    total = 0
    for f in files:
        if f.startswith("file:"):
            import os
            from urllib.parse import urlparse
            try:
                size = os.path.getsize(urlparse(f).path)
            except OSError:
                size = 0
            total += size + open_cost
        else:
            total += max_bytes  # un-stat-able: assume a full split
        if total >= target * max_bytes:
            return df
    splits = max(1, -(-total // max_bytes))
    if splits >= target:
        return df
    return df.repartition(target)

# A small english-ish stopword list for quality scoring (the reference
# pipeline's quality heuristics are length/ratio based; SURVEY brief
# asks for length/punct/stopword ratios).
STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# Marker words per language for the n-gram voting heuristic. Voting is
# deterministic: score per language = number of marker hits; argmax
# with lexicographic tie-break; 'und' when no marker hits at all.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "with"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "es"],
    "fr": ["le", "la", "les", "est", "et"],
    "zh": ["的", "是", "了", "在", "和"],
}

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
TOKEN_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9 ]"


def token_counts(text: Column) -> dict[str, Column]:
    """Whitespace tokens and BPE-ish regex tokens of normalized text."""
    norm = normalize_text(text)
    return {
        "n_ws_tokens": F.size(F.split(norm, " ")).cast("long"),
        "n_bpe_tokens": F.regexp_count(norm, F.lit(TOKEN_PATTERN)).cast("long"),
    }


def quality_metrics(text: Column) -> dict[str, Column]:
    """Deterministic quality signals: char/word counts, mean word
    length, punctuation ratio, stopword ratio."""
    norm = normalize_text(text)
    words = F.split(norm, " ")
    n_chars = F.length(norm).cast("long")
    n_words = F.size(words).cast("long")
    sum_word_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    n_punct = (n_chars - F.length(F.regexp_replace(norm, r"[^a-z0-9 ]", ""))).cast("long")
    n_stop = F.size(F.filter(words, lambda w: w.isin(STOPWORDS))).cast("long")
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": sum_word_len.cast("double") / n_words.cast("double"),
        "punct_ratio": n_punct.cast("double") / n_chars.cast("double"),
        "stopword_ratio": n_stop.cast("double") / n_words.cast("double"),
    }


def language_id(text: Column) -> Column:
    """Marker-word voting language ID as a pure column expression.
    Deterministic argmax: highest hit count wins, ties broken by
    language code order, zero hits → 'und'.

    Fine for a handful of plan-literal languages inside a wide
    projection (document_profile); for corpus-level evaluation or a
    marker lexicon that outgrows plan literals use `language_id_frame`,
    which is one pass over words joined to a broadcast marker table
    instead of |langs| array scans per row."""
    norm = normalize_text(text)
    words = F.split(norm, " ")
    best_lang = F.lit("und")
    best_score = F.lit(0).cast("long")
    for lang in sorted(LANG_MARKERS):
        score = F.size(F.filter(words, lambda w: w.isin(LANG_MARKERS[lang]))).cast("long")
        take = score > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, score).otherwise(best_score)
    return best_lang


def language_id_frame(docs: DataFrame, text_col: str = "text",
                      key_cols: tuple[str, ...] = ("doc_id",),
                      markers: dict[str, list[str]] | None = None) -> DataFrame:
    """DataFrame-level language ID: `key_cols` + `lang_guess`, same
    semantics as `language_id` (occurrence-count voting, lexicographic
    tie-break, 'und' on zero hits).

    Shape at scale: ONE pass over words — explode, broadcast-hash-join
    against a (marker → lang) dimension, then a two-level count/argmax
    aggregation. Cost is independent of the number of languages, and
    the marker table is data (broadcastable at any lexicon size), not
    a plan literal. Map-side combine collapses the exploded rows to
    ≤|langs|+1 rows per doc before the shuffle, so shuffle volume is
    O(n_docs · n_langs) regardless of document length. A marker shared
    by several languages ("la" in es and fr) joins to one row per
    language, crediting each — identical to the per-language filters.
    """
    markers = LANG_MARKERS if markers is None else markers
    spark = docs.sparkSession
    langs = sorted(markers)
    # Smaller language code → larger rank, so max(struct(n, rank, ...))
    # breaks count ties toward the lexicographically first language.
    rows = [(m, lang, len(langs) - i)
            for i, lang in enumerate(langs) for m in markers[lang]]
    mdf = spark.createDataFrame(rows, "marker string, mlang string, mrank int")

    words = F.split(normalize_text(F.col(text_col)), " ")
    exploded = docs.select(*key_cols, F.explode(words).alias("word"))
    joined = exploded.join(F.broadcast(mdf),
                           exploded["word"] == mdf["marker"], "left")
    # count("mlang") skips NULLs: non-marker words group under mlang
    # NULL with n=0, keeping zero-hit docs alive without a join-back.
    per_lang = (joined.groupBy(*key_cols, "mlang", "mrank")
                .agg(F.count("mlang").cast("long").alias("n")))
    best = F.max(F.when(F.col("mlang").isNotNull(),
                        F.struct(F.col("n"), F.col("mrank"),
                                 F.col("mlang").alias("mlang"))))
    return (per_lang.groupBy(*key_cols)
            .agg(F.coalesce(best.getField("mlang"), F.lit("und"))
                 .alias("lang_guess")))


def fingerprint(text: Column, char_ngram: int = 8) -> Column:
    """Document fingerprint: md5 hashes of character 8-grams, mod-16
    sampled (hashes ending in '0'), sorted distinct. Two documents
    sharing content share fingerprint hashes — a compact sketch for
    containment checks (the rolling-hash fingerprint family)."""
    norm = normalize_text(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (char_ngram - 1), F.lit(1))),
        lambda i: F.md5(norm.substr(i, F.lit(char_ngram))),
    )
    sampled = F.filter(grams, lambda h: h.endswith("0"))
    return F.array_sort(F.array_distinct(sampled))


def quality_filter(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words: int = 5, max_words: int = 100_000,
                   max_punct_ratio: float = 0.2,
                   min_mean_word_len: float = 2.0,
                   max_mean_word_len: float = 12.0) -> DataFrame:
    """The quality DECISION applied (the C4-style gate built from
    `quality_metrics`): keep docs inside the length / punctuation /
    word-shape envelope. Pure filter over one projection — composes
    with the scan at any scale, and the thresholds are plain columns
    so Catalyst folds them into the same stage as the metrics."""
    m = quality_metrics(F.col(text_col))
    keep = (
        (m["n_words"] >= min_words) & (m["n_words"] <= max_words)
        & (m["punct_ratio"] <= max_punct_ratio)
        & (m["mean_word_len"] >= min_mean_word_len)
        & (m["mean_word_len"] <= max_mean_word_len)
    )
    return docs.where(keep)


# PII patterns kept to syntax identical under Java regex and DuckDB's
# RE2: plain classes, no lookaround, no backrefs.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_URL = r"https?://[^ ]+"
PII_PHONE = r"\+[0-9]{7,15}"


def scrub_pii(text: Column) -> dict[str, Column]:
    """Count and redact emails / URLs / phone numbers from normalized
    text (Gopher/C4-style pre-training scrub; the reference pipeline
    has the same concern with participant phone numbers, which it
    de-identifies to uuids — SURVEY §1 data model). Counts first, then
    a fixed redaction order (urls, then emails, then phones) so both
    engines see identical intermediate strings. Pure projection."""
    norm = normalize_text(text)
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(norm, PII_URL, "<URL>"),
            PII_EMAIL, "<EMAIL>"),
        PII_PHONE, "<PHONE>")
    return {
        "n_urls": F.regexp_count(norm, F.lit(PII_URL)).cast("long"),
        "n_emails": F.regexp_count(norm, F.lit(PII_EMAIL)).cast("long"),
        "n_phones": F.regexp_count(norm, F.lit(PII_PHONE)).cast("long"),
        "redacted": redacted,
        "clean_md5": F.md5(redacted),
        "clean_len": F.length(redacted).cast("long"),
    }


def repetition_profile(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition signals (the Gopher repetition
    filters): duplicate word-bigram fraction and most-frequent-bigram
    fraction. Shape at scale: one explode + two hash aggregations,
    both keyed by (doc_id[, bigram]) — perfectly distributable, the
    second agg is a subset re-group of the first so AQE plans no extra
    exchange. Docs with < 2 words report zero bigrams."""
    docs = spread_narrow_scan(docs)
    norm = normalize_text(F.col(text_col))
    words = F.split(norm, " ")
    bigrams = F.when(
        F.size(words) >= 2,
        F.transform(F.sequence(F.lit(0), F.size(words) - 2),
                    lambda i: F.concat_ws(" ", F.element_at(words, i + 1),
                                          F.element_at(words, i + 2))),
    ).otherwise(F.array().cast("array<string>"))
    per_gram = (docs.select(F.col(id_col).alias("doc_id"),
                            F.explode_outer(bigrams).alias("bigram"))
                .groupBy("doc_id", "bigram")
                .agg(F.count(F.lit(1)).alias("n")))
    n_bigrams = F.sum(F.when(F.col("bigram").isNotNull(), F.col("n"))
                      .otherwise(F.lit(0))).cast("long")
    n_distinct = F.count("bigram").cast("long")  # count skips the NULL row
    top = F.max(F.when(F.col("bigram").isNotNull(), F.col("n"))).cast("long")
    return (per_gram.groupBy("doc_id")
            .agg(n_bigrams.alias("n_bigrams"),
                 n_distinct.alias("n_distinct_bigrams"),
                 F.coalesce(top, F.lit(0)).alias("top_bigram_n"))
            .select(
                "doc_id", "n_bigrams", "n_distinct_bigrams",
                F.when(F.col("n_bigrams") > 0,
                       (F.col("n_bigrams") - F.col("n_distinct_bigrams"))
                       .cast("double") / F.col("n_bigrams").cast("double"))
                .otherwise(F.lit(0.0)).alias("dup_bigram_ratio"),
                F.when(F.col("n_bigrams") > 0,
                       F.col("top_bigram_n").cast("double")
                       / F.col("n_bigrams").cast("double"))
                .otherwise(F.lit(0.0)).alias("top_bigram_ratio")))


def document_profile(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """One row per doc with all text-analysis columns — a single
    projection over the scan."""
    t = F.col(text_col)
    cols = {**token_counts(t), **quality_metrics(t)}
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(name) for name, c in cols.items()],
        language_id(t).alias("lang_guess"),
    )
