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
