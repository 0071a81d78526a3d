"""Count-based bigram language-model scoring for domain filtering.

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") filters crawl text by perplexity under
a language model trained on a trusted target domain; docs that look
like the domain score high, boilerplate and junk score low. The
reference pipeline has the analogous concern of routing messages by
how they match expected response patterns (auto-coding,
src/engagement_db_to_analysis — SURVEY §2.6); at pre-training scale
the unit is the whole document and the model is a corpus-level LM.

This module fits an add-one-smoothed bigram model on a TARGET corpus
and scores any corpus under it:

    p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)

with c(w1 w2) the bigram's occurrence count in the target corpus,
c(w1 ·) the prefix's total bigram occurrences, and V the target
vocabulary size. A document's score is the arithmetic mean of its
bigram probabilities (plus the raw position-ordered sum), with the
count of in-model bigrams (`n_seen`) as the out-of-domain signal.

Cross-engine exactness (the driver hash-compares against DuckDB):
every probability is one double division of exact integers, and the
per-doc sum folds those doubles in POSITION order via an array fold —
a parallel SUM() would reorder the adds (same trade as the BM25
rational-idf score fold, training/ranking.py). The classical
geometric-mean / log-space perplexity is monotone in neither of these
by itself, but ``ln`` is not bit-stable across engines; `mean_p` and
`n_seen` order documents the same way in practice and are exact.

Shape at scale (100 TB corpus, smaller target domain):
* fit = one explode over the target corpus + one hash aggregation
  keyed by the 60-bit bigram hash (map-side combinable); the prefix
  table is a subset re-group of the bigram table (AQE chains it
  without an extra exchange); V is one distinct-count word pass.
* score = one explode over the scored corpus + two equi-joins keyed
  on 60-bit hashes (never the bigram text) + one per-doc
  re-aggregation. Both joins shuffle on well-spread hash keys; when
  the target domain is small its count tables fit a broadcast — pass
  ``broadcast_model=True`` to pin that (the default lets AQE decide
  from runtime sizes).
* nothing is ever collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long, normalize_text
from .text import spread_narrow_scan


def _bigram_structs(text_col: str):
    """Array of (pos, bg_h, w1_h) structs — one per word bigram of the
    normalized text, position 1-based; empty below two words."""
    words = F.split(normalize_text(F.col(text_col)), " ")
    return F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.struct(
                i.alias("pos"),
                md5_long(F.concat_ws(
                    " ", F.element_at(words, i),
                    F.element_at(words, i + 1))).alias("bg_h"),
                md5_long(F.element_at(words, i)).alias("w1_h"))),
    ).otherwise(F.array().cast(
        "array<struct<pos:int,bg_h:bigint,w1_h:bigint>>"))


def bigram_model(target_docs: DataFrame,
                 text_col: str = "text") -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fit the add-one bigram model on the target corpus.

    Returns ``(bigrams, prefixes, consts)``:
    * bigrams  — (bg_h, n_bg): corpus occurrence count per bigram hash
    * prefixes — (w1_h, n_prefix): total bigram occurrences per prefix
      (a subset re-group of `bigrams`' pre-aggregation)
    * consts   — single row (vocab_n): distinct-word vocabulary size
    """
    target_docs = spread_narrow_scan(target_docs)
    ex = target_docs.select(
        F.explode(_bigram_structs(text_col)).alias("s"))
    pre = (ex.groupBy(F.col("s.bg_h").alias("bg_h"),
                      F.col("s.w1_h").alias("w1_h"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_bg")))
    bigrams = pre.select("bg_h", "n_bg")
    prefixes = (pre.groupBy("w1_h")
                .agg(F.sum("n_bg").cast("long").alias("n_prefix")))
    words = F.split(normalize_text(F.col(text_col)), " ")
    consts = (target_docs.select(F.explode(words).alias("w"))
              .agg(F.count_distinct("w").cast("long").alias("vocab_n")))
    return bigrams, prefixes, consts


def importance_weights(target_docs: DataFrame, raw_docs: DataFrame,
                       score_docs: DataFrame | None = None,
                       text_col: str = "text", id_col: str = "doc_id",
                       broadcast_model: bool = False) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): weight each
    document by how much more likely its text is under the TARGET
    domain's model than under the RAW corpus's model, then sample
    proportionally to shift the mixture toward the domain.

    Scores `score_docs` (default: the raw corpus itself) under BOTH
    add-one bigram models in ONE pass: the scored corpus is exploded
    once and joined to the two count tables side by side — the
    marginal cost over a single-model score is two extra hash joins,
    not a second explode/fold pipeline. Returns
    (doc_id, n_bigrams, sum_p_target, sum_p_raw, importance) with
    importance = sum_p_target / sum_p_raw (an exact single division of
    the two position-ordered fold sums; the log-domain ratio is
    monotone in it for fixed doc length, and ``ln`` is not bit-stable
    across engines — same trade as `bigram_lm_score`). Docs with no
    bigrams get importance 1.0 (no evidence either way).
    """
    if score_docs is None:
        score_docs = raw_docs
    bg_t, cp_t, v_t = bigram_model(target_docs, text_col)
    bg_r, cp_r, v_r = bigram_model(raw_docs, text_col)
    bg_t = bg_t.withColumnRenamed("n_bg", "n_bg_t")
    cp_t = cp_t.withColumnRenamed("n_prefix", "n_prefix_t")
    bg_r = bg_r.withColumnRenamed("n_bg", "n_bg_r")
    cp_r = cp_r.withColumnRenamed("n_prefix", "n_prefix_r")
    consts = (v_t.withColumnRenamed("vocab_n", "vocab_t")
              .crossJoin(v_r.withColumnRenamed("vocab_n", "vocab_r")))
    if broadcast_model:
        bg_t, cp_t = F.broadcast(bg_t), F.broadcast(cp_t)
        bg_r, cp_r = F.broadcast(bg_r), F.broadcast(cp_r)

    ex = (spread_narrow_scan(score_docs)
          .select(F.col(id_col).alias("doc_id"),
                  F.explode(_bigram_structs(text_col)).alias("s"))
          .select("doc_id", "s.pos", "s.bg_h", "s.w1_h"))
    joined = (ex.join(bg_t, "bg_h", "left").join(cp_t, "w1_h", "left")
              .join(bg_r, "bg_h", "left").join(cp_r, "w1_h", "left")
              .crossJoin(F.broadcast(consts)))

    def p(nbg: str, npre: str, vocab: str):
        return ((F.coalesce(F.col(nbg), F.lit(0)) + F.lit(1)).cast("double")
                / (F.coalesce(F.col(npre), F.lit(0))
                   + F.col(vocab)).cast("double"))

    per = (joined.select(
        "doc_id", "pos",
        p("n_bg_t", "n_prefix_t", "vocab_t").alias("pt"),
        p("n_bg_r", "n_prefix_r", "vocab_r").alias("pr"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
             F.array_sort(F.collect_list(F.struct("pos", "pt", "pr")))
             .alias("ps")))
    per = per.select(
        "doc_id", "n_bigrams",
        F.aggregate(F.col("ps"), F.lit(0.0),
                    lambda acc, s: acc + s["pt"]).alias("sum_p_target"),
        F.aggregate(F.col("ps"), F.lit(0.0),
                    lambda acc, s: acc + s["pr"]).alias("sum_p_raw"))
    ids = score_docs.select(F.col(id_col).alias("doc_id"))
    return (ids.join(per, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.coalesce("sum_p_target", F.lit(0.0))
                    .alias("sum_p_target"),
                    F.coalesce("sum_p_raw", F.lit(0.0)).alias("sum_p_raw"),
                    F.when(F.col("n_bigrams").isNull() | (F.col("sum_p_raw") == 0),
                           F.lit(1.0))
                    .otherwise(F.col("sum_p_target") / F.col("sum_p_raw"))
                    .alias("importance")))


def bigram_lm_score(target_docs: DataFrame, score_docs: DataFrame,
                    text_col: str = "text", id_col: str = "doc_id",
                    broadcast_model: bool = False) -> DataFrame:
    """Score every document of `score_docs` under the bigram model fit
    on `target_docs`.

    Returns one row per scored doc:
    (doc_id, n_bigrams, n_seen, sum_p, mean_p) where `n_seen` counts
    bigrams observed in the target corpus, `sum_p` is the
    position-ordered fold of add-one probabilities and `mean_p` is
    sum_p / n_bigrams (0.0 for docs with fewer than two words).
    """
    bigrams, prefixes, consts = bigram_model(target_docs, text_col)
    if broadcast_model:
        bigrams, prefixes = F.broadcast(bigrams), F.broadcast(prefixes)

    ex = (spread_narrow_scan(score_docs)
          .select(F.col(id_col).alias("doc_id"),
                  F.explode(_bigram_structs(text_col)).alias("s"))
          .select("doc_id", "s.pos", "s.bg_h", "s.w1_h"))
    joined = (ex.join(bigrams, "bg_h", "left")
              .join(prefixes, "w1_h", "left")
              .crossJoin(F.broadcast(consts)))
    p = ((F.coalesce(F.col("n_bg"), F.lit(0)) + F.lit(1)).cast("double")
         / (F.coalesce(F.col("n_prefix"), F.lit(0))
            + F.col("vocab_n")).cast("double"))
    per = (joined.select("doc_id", "pos", p.alias("p"),
                         F.col("n_bg").isNotNull().alias("seen"))
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                F.sum(F.when(F.col("seen"), 1).otherwise(0))
                .cast("long").alias("n_seen"),
                F.array_sort(F.collect_list(F.struct("pos", "p")))
                .alias("ps")))
    per = per.select(
        "doc_id", "n_bigrams", "n_seen",
        F.aggregate(F.col("ps"), F.lit(0.0),
                    lambda acc, s: acc + s["p"]).alias("sum_p"))
    ids = score_docs.select(F.col(id_col).alias("doc_id"))
    return (ids.join(per, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    F.coalesce("n_seen", F.lit(0)).alias("n_seen"),
                    F.coalesce("sum_p", F.lit(0.0)).alias("sum_p"),
                    F.when(F.col("n_bigrams") > 0,
                           F.col("sum_p") / F.col("n_bigrams")
                           .cast("double"))
                    .otherwise(F.lit(0.0)).alias("mean_p")))
