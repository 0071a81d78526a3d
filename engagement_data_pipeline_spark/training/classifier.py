"""Linear text-classifier INFERENCE as a pure column projection —
the fastText-style quality/safety scorer every curation stack runs
over its corpus (hashed n-gram bag → linear margin).

Training happens offline (any library); what the 100 TB engine must
do well is *inference*: score every document with a fixed weight
vector without a UDF, a shuffle, or a model server. Here the hashed
bigram features fold directly into a margin inside whole-stage
codegen: feature index = 60-bit md5 of the bigram mod `n_buckets`
(the hashing trick), margin = bias + Σ weight[index] folded in
POSITION order (the engine-wide deterministic-sum idiom). The margin
is monotone in the sigmoid probability; ``exp`` is not bit-stable
across engines, so the probability stays out of the oracle-checked
surface (same trade as BM25's rational idf).

Scale shape: zero shuffles, zero joins — the weight vector enters the
plan as a literal array (fine to ~100k buckets; past that, broadcast
a (bucket → weight) table and reuse the `language_id_frame`
join-and-aggregate shape instead).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dedup import normalize_text


def hashed_bigram_margin(text: Column, weights: Sequence[float],
                         bias: float = 0.0) -> Column:
    """Linear margin over hashed-bigram features of the normalized
    text. `weights[i]` is the weight of feature bucket i; the bucket
    of a bigram is md5_long(bigram) mod len(weights). Documents with
    fewer than two words score exactly `bias`."""
    n = len(weights)
    if n < 1:
        raise ValueError("weights must be non-empty")
    words = F.split(normalize_text(text), " ")
    wlit = F.lit([float(w) for w in weights])
    grams = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.get(
                wlit,
                F.pmod(
                    F.conv(F.substring(
                        F.md5(F.concat_ws(
                            " ", F.element_at(words, i),
                            F.element_at(words, i + 1))), 1, 15),
                        16, 10).cast("long"),
                    F.lit(n)).cast("int"))),
    ).otherwise(F.array().cast("array<double>"))
    return F.aggregate(grams, F.lit(float(bias)),
                       lambda acc, w: acc + w)
