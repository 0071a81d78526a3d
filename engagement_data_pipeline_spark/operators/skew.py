"""Skew mitigation (brief §"Optimize for scale").

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
on by default in `session.py`) handles sort-merge skew at runtime;
these helpers cover the cases AQE can't re-plan:

* `salted_join` — explicit salting for a shuffled equi-join where one
  key dominates (e.g. a single viral message's participant, or the
  'NR' code): the skewed side gets a deterministic salt in
  [0, n_salts), the small side is replicated once per salt, and the
  join key becomes (key, salt) — the hot key's rows spread over
  n_salts reducers instead of one.
* `salted_distinct_count` — two-phase distinct count per key for
  skewed keys: partial distinct within (key, salt), then merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt(df: DataFrame, n_salts: int, salt_col: str):
    """Deterministic row salt: hash of the whole row spreads a hot
    key's rows evenly without RNG (re-runs produce identical plans)."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_join(skewed: DataFrame, other: DataFrame, on: Sequence[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join `skewed` ⋈ `other` on `on`, with the skewed side's
    hot keys spread over `n_salts` reducers. `other` is replicated
    n_salts× (keep it the smaller input). Output columns match a
    plain `skewed.join(other, on, how)`."""
    salt_col = "__salt"
    s = skewed.withColumn(salt_col, _salt(skewed, n_salts, salt_col))
    o = other.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return s.join(o, [*on, salt_col], how).drop(salt_col)


def salted_distinct_count(df: DataFrame, key_cols: Sequence[str],
                          value_col: str, n_salts: int = 16,
                          out_col: str = "n_distinct") -> DataFrame:
    """COUNT(DISTINCT value) per key in two shuffles, neither of which
    concentrates a hot key on one reducer: distinct over (key, salt,
    value) — the salt is the value's own hash, so duplicates of one
    value land together — then sum of partial distinct counts."""
    salt = F.pmod(F.hash(F.col(value_col)), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(*key_cols, F.col(value_col), salt)
        .distinct()
        .groupBy(*key_cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return (partial.groupBy(*key_cols)
            .agg(F.sum("__partial").cast("long").alias(out_col)))
