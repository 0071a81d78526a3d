"""PMI collocation extraction: the adjacent word pairs most
associated beyond chance — the classic corpus-linguistics tool for
tokenizer-merge audits (which pairs deserve a single token) and
phrase mining.

Score is the PMI's argument as an exact rational surrogate,
    ratio = (c(xy)/B) / ((c(x)/N) · (c(y)/N)),
computed with a FIXED operand order of IEEE divisions/multiplies of
exact integers so both engines agree bitwise; ``log`` of it (the
textbook PMI) is monotone in it and not bit-stable across engines —
the same trade as the BM25 rational idf. Numerators are never
multiplied out (c·N² would overflow int64 on a 10^13-token corpus);
each factor is normalized into double first, where magnitude is not a
correctness concern.

Shape at scale: ONE corpus pass — each doc explodes its unigrams (as
(w, NULL)) and its adjacent pairs into a single gram stream, counted
by one hash aggregation with map-side combine. The counts frame
(vocabulary-sized, orders of magnitude smaller than the corpus) is
cached and serves all four derivations: unigram counts, bigram
counts, and both scalar totals (n_tokens = Σ n_w, n_bigrams =
Σ n_pair — second-level aggregations over the counts, not extra
corpus scans). Then a two-key join of the bigram counts against the
unigram counts (shuffles on word keys; pass
``broadcast_unigrams=True`` when the vocabulary fits), scalar totals
broadcast, and a TakeOrderedAndProject top-k — no window over the
full vocabulary.

(The previous shape tokenized the corpus FOUR times — unigram agg,
token total, bigram agg, bigram total are four separate subtrees and
Spark does not merge them; measured 2.6x slower at sf0.1.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.topk import top_k_rows
from .dedup import normalize_text
from .text import spread_narrow_scan


def pmi_collocations(docs: DataFrame, text_col: str = "text",
                     min_count: int = 5, k: int = 50,
                     broadcast_unigrams: bool = False) -> DataFrame:
    """Top-k adjacent-pair collocations by the rational PMI surrogate.
    Returns (w1, w2, n_pair, n_w1, n_w2, pmi_ratio), ties broken by
    (w1, w2)."""
    docs = spread_narrow_scan(docs)
    words = F.split(normalize_text(F.col(text_col)), " ")

    pair_t = "array<struct<w1:string,w2:string>>"
    unis = F.transform(words, lambda w: F.struct(
        w.alias("w1"), F.lit(None).cast("string").alias("w2")))
    bigs = F.when(
        F.size(words) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(words) - 1),
                    lambda i: F.struct(
                        F.element_at(words, i).alias("w1"),
                        F.element_at(words, i + 1).alias("w2"))),
    ).otherwise(F.array().cast(pair_t))
    grams = (docs.select(F.explode(F.concat(unis, bigs)).alias("g"))
             .select("g.w1", "g.w2"))
    # one tokenize + one shuffle for BOTH grains; cached because four
    # derivations below consume it (cache != result reuse across
    # calls: each call builds a fresh lineage, materialized inside the
    # caller's own action)
    from ..session import scoped_cache

    counts = scoped_cache(grams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n")))

    uni = counts.where(F.col("w2").isNull()).select(
        F.col("w1").alias("w"), F.col("n").alias("n_w"))
    pair_counts = counts.where(F.col("w2").isNotNull()).select(
        "w1", "w2", F.col("n").alias("n_pair"))
    # grand totals are exact second-level sums of the counts — no
    # extra corpus scan, and Σ preserves the original semantics
    # (n_tokens counts every token incl. duplicates)
    totals_n = uni.agg(F.sum("n_w").alias("n_tokens"))
    totals_b = pair_counts.agg(F.sum("n_pair").alias("n_bigrams"))

    u1 = uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2"))
    if broadcast_unigrams:
        u1, u2 = F.broadcast(u1), F.broadcast(u2)
    scored = (pair_counts.where(F.col("n_pair") >= min_count)
              .join(u1, "w1").join(u2, "w2")
              .crossJoin(F.broadcast(totals_n))
              .crossJoin(F.broadcast(totals_b)))
    ratio = ((F.col("n_pair").cast("double")
              / F.col("n_bigrams").cast("double"))
             / ((F.col("n_w1").cast("double")
                 / F.col("n_tokens").cast("double"))
                * (F.col("n_w2").cast("double")
                   / F.col("n_tokens").cast("double"))))
    scored = scored.select("w1", "w2", "n_pair", "n_w1", "n_w2",
                           ratio.alias("pmi_ratio"))
    return top_k_rows(scored, [F.col("pmi_ratio").desc(),
                               F.col("w1"), F.col("w2")], k)
