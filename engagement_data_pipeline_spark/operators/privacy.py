"""Small-cell suppression (k-anonymity) for published aggregates.

The reference publishes demographic/theme distribution CSVs straight
from the analysis views (SURVEY §2.7 A3-A5); cells with very few
participants re-identify people when crossed with public knowledge —
the standard statistical-disclosure-control fix is k-anonymity-style
small-cell suppression before release. Pairs with
`streaming/ingest.delete_origins`: delete handles the stored data,
suppression handles the published aggregates.

Pure set algebra on the ALREADY-AGGREGATED frame (two filters + one
re-aggregation of the suppressed slice + a union), so its cost is the
size of the report, not the corpus. Rules:

* rows with count >= k publish unchanged;
* rows with count < k fold into ONE rollup row per coarse group
  (label = `suppressed_label`) carrying their summed count — totals
  stay reconcilable without exposing any small cell;
* if the rollup itself sums below k it would still disclose (e.g. a
  single cell of 1), so its count is published as NULL ("nonzero,
  fewer than k") — the conventional footnote form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPPRESSED = "__suppressed__"


def suppress_small_groups(dist: DataFrame, group_cols: Sequence[str],
                          label_col: str, count_col: str, k: int,
                          suppressed_label: str = SUPPRESSED) -> DataFrame:
    """k-anonymize a (group_cols..., label_col, count_col) report.

    A NULL count cannot certify `>= k`, so such a row routes into the
    suppressed rollup (contributing 0 to its total) instead of
    silently vanishing from both branches — every input cell is
    accounted for in the published report."""
    cnt = F.coalesce(F.col(count_col), F.lit(0))
    big = dist.where(cnt >= k)
    rollup = (dist.where(cnt < k)
              .groupBy(*group_cols)
              .agg(F.sum(count_col).cast("long").alias("__total"))
              .select(*group_cols,
                      F.lit(suppressed_label).alias(label_col),
                      F.when(F.col("__total") >= k, F.col("__total"))
                      .alias(count_col)))
    return big.select(*group_cols, label_col, count_col).unionByName(rollup)
