"""Deterministic corpus sampling — the mixture-weights step of a
training-data pipeline (down-sample over-represented sources,
up-weight scarce ones) as a pure, reproducible filter.

Keep decision: md5_long(salt || key) % SCALE < threshold, where the
threshold is a per-stratum integer computed driver-side. Properties
that matter at 100 TB:

* zero shuffle — a scan-fused filter, composable with any downstream
  op;
* reproducible — same salt ⇒ same sample on every run/cluster, and
  documents keep/drop decisions are independent (no global state);
* monotone — raising a stratum's rate only ADDS documents (the kept
  set at rate r is a subset of the kept set at r' > r), so mixture
  re-tuning doesn't churn the corpus.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import md5_long

SCALE = 1_000_000


def sample_hash(key: Column, salt: str) -> Column:
    """The uniform [0, SCALE) hash a key's keep decision tests
    against."""
    return md5_long(F.concat(F.lit(salt + ":"), key.cast("string"))) % SCALE


def deterministic_sample(docs: DataFrame, rate: float,
                         key_col: str = "doc_id", salt: str = "mix-v1",
                         stratify_col: str | None = None,
                         rates: Mapping[str, float] | None = None) -> DataFrame:
    """Keep a reproducible `rate` fraction of rows (per-stratum
    overrides via `rates` on `stratify_col`). Thresholds are exact
    integers fixed at plan time, so the oracle mirrors them
    literally."""
    thr: Column = F.lit(int(rate * SCALE))
    if rates:
        if stratify_col is None:
            raise ValueError("rates requires stratify_col")
        for value, r in sorted(rates.items()):
            thr = (F.when(F.col(stratify_col) == value,
                          F.lit(int(r * SCALE))).otherwise(thr))
    return docs.where(sample_hash(F.col(key_col), salt) < thr)


def mixture_rate_plan(docs: DataFrame,
                      targets: Mapping[str, tuple[int, int]],
                      stratify_col: str = "source",
                      key_col: str = "doc_id",
                      salt: str = "mix-v1") -> DataFrame:
    """Solve for the per-stratum keep-rates that make the sampled
    corpus match a TARGET MIXTURE, then measure what those rates keep.

    `targets` maps stratum value → exact rational share (num, den),
    e.g. {"web": (1, 2), "books": (1, 4), "code": (1, 4)}. The output
    corpus is the largest T such that every stratum can supply its
    share from what it has: T = min_s floor(n_s · den_s / num_s) —
    the scarcest stratum binds, every other stratum down-samples to
    proportion. Each stratum's hash threshold is then
    floor(num_s · T · SCALE / (den_s · n_s)), plugged into the same
    md5-threshold keep rule as `deterministic_sample`, so re-planning
    with a bigger T only ADDS documents (monotone).

    Entirely in-plan: one count aggregation over the corpus (tiny
    result, one row per stratum), a broadcast join of targets, an
    unpartitioned window min over those few rows for T, then one
    broadcast-join + filter pass over the corpus to count what the
    thresholds actually keep. Nothing is collected to the driver; the
    threshold arithmetic runs in DECIMAL(38,0), exact far past
    100 TB row counts (overflow would need n_s · T · SCALE > 10^38).

    Returns one row per targeted stratum:
    (stratum, n_docs, target_num, target_den, budget_total, thr,
    n_kept).
    """
    rows = [(v, int(n), int(d)) for v, (n, d) in sorted(targets.items())]
    spark = docs.sparkSession
    tdf = spark.createDataFrame(
        rows, f"{stratify_col} string, target_num int, target_den int")
    counts = (docs.groupBy(stratify_col)
              .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
    dec = "decimal(38,0)"
    joined = counts.join(F.broadcast(tdf), stratify_col)
    budget = F.floor(
        (F.col("n_docs").cast(dec) * F.col("target_den").cast(dec))
        / F.col("target_num").cast(dec)).cast("long")
    plan = (joined.withColumn("stratum_budget", budget)
            .withColumn("budget_total",
                        F.min("stratum_budget").over(Window.partitionBy()))
            .withColumn("thr", F.floor(
                (F.col("target_num").cast(dec)
                 * F.col("budget_total").cast(dec) * F.lit(SCALE).cast(dec))
                / (F.col("target_den").cast(dec)
                   * F.col("n_docs").cast(dec))).cast("long")))
    kept = (docs
            .join(F.broadcast(plan.select(stratify_col, "thr")), stratify_col)
            .where(sample_hash(F.col(key_col), salt) < F.col("thr"))
            .groupBy(stratify_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_kept")))
    return (plan.join(kept, stratify_col, "left")
            .select(F.col(stratify_col).alias("stratum"), "n_docs",
                    "target_num", "target_den", "budget_total", "thr",
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept")))

