"""Probabilistic record linkage (Fellegi–Sunter) with blocked
candidate generation.

The reference links records only by exact identifier (urn↔uuid maps,
SURVEY §2.4 J2); real-world participant/CRM data needs probabilistic
linkage: block plausible candidate pairs cheaply, compare fields with
per-field error models, and classify pairs by the product of
likelihood ratios (Fellegi & Sunter 1969).

Spark shape at 100 TB:
* Blocking is an equi-join on caller-supplied block keys — never a
  cross join; block-key cardinality is the scale knob exactly like
  LSH bands (training/dedup.py). Skewed blocks fall out of AQE or the
  salted-join helper (operators/skew.py).
* Field comparison + scoring is a pure projection on the joined rows.
* The score is the PRODUCT of per-field likelihood ratios
  (m/u on agreement, (1-m)/(1-u) on disagreement), multiplied in
  declared field order — multiplication is IEEE-exact and, unlike the
  classical log-weight sum, needs no transcendental, so scores are
  bit-reproducible cross-engine (the same rational-surrogate trade as
  BM25's idf, training/ranking.py). log2 of the score is the textbook
  weight when a human wants one.

`comparators` maps field -> Column predicate over the prefixed
columns (l_<field> / r_<field>); `mu` maps field -> (m, u).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fs_link(left: DataFrame, right: DataFrame,
            block_cols: Sequence[str],
            comparators: Mapping[str, Callable[[], Column]],
            mu: Mapping[str, tuple[float, float]],
            match_threshold: float,
            possible_threshold: float) -> DataFrame:
    """Candidate pairs with per-field agreement flags, the
    likelihood-ratio score, and the three-way decision
    ('match' / 'possible' / 'non_match').

    Every non-block column of `left`/`right` is carried prefixed
    l_/r_; comparators read those prefixed columns. m = P(agree |
    same entity), u = P(agree | different entities); both thresholds
    compare against the ratio product directly.
    """
    lp = left.select(*block_cols,
                     *[F.col(c).alias(f"l_{c}") for c in left.columns
                       if c not in block_cols])
    rp = right.select(*block_cols,
                      *[F.col(c).alias(f"r_{c}") for c in right.columns
                        if c not in block_cols])
    cand = lp.join(rp, list(block_cols))

    agree_cols = {f: comparators[f]() for f in comparators}
    score = None
    for f in comparators:  # declared order == multiplication order
        m, u = mu[f]
        ratio = F.when(F.col(f"agree_{f}"),
                       F.lit(m / u)).otherwise(F.lit((1.0 - m) / (1.0 - u)))
        score = ratio if score is None else score * ratio
    out = cand.select("*", *[c.alias(f"agree_{f}")
                             for f, c in agree_cols.items()])
    out = out.withColumn("score", score)
    decision = (F.when(F.col("score") >= F.lit(match_threshold),
                       F.lit("match"))
                .when(F.col("score") >= F.lit(possible_threshold),
                      F.lit("possible"))
                .otherwise(F.lit("non_match")))
    return out.withColumn("decision", decision)
