"""Message-grain label imputation (SURVEY §2.6 M1/M3/M4).

Reference: src/engagement_db_to_analysis/code_imputation_functions.py —
application order fixed at :545-552 (NR/CE → WS-CE → NC → age-category
→ locations). Every rule here is a pure rewrite of the nested `labels`
array using built-in higher-order functions (filter/transform/get), so
the whole suite runs JVM-side in one projection — no shuffle, no
Python in the row path, safe at any scale.

Semantics implemented (per message, over the schemes configured for
its dataset):

M1 (:60-136)  — all latest labels checked → untouched; mix of
  checked/unchecked → clear + one CODING_ERROR label per scheme; none
  checked (incl. no labels at all) → clear + one NOT_REVIEWED label
  per scheme.
M3 (:229-262) — empty/null text → clear + one NOT_CODED label per
  scheme (runs after M1, overriding its result).
M4 (:265-339) — if the age scheme's latest label is a Normal code
  (`age_<n>`), prepend an age-category label bucketing n into the
  configured inclusive ranges; control codes were already propagated
  to the age_category scheme by M1/M3.

Divergence note: imputed labels here carry checked=True and a
deterministic date_time_utc (the message's last_updated) rather than
wall-clock now(), keeping re-runs byte-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .config import (
    AGE_BUCKETS,
    AnalysisConfig,
    CODING_ERROR,
    DatasetConfig,
    NOT_CODED,
    NOT_REVIEWED,
)
from .schema import LABELS_TYPE, make_label


def latest_label(labels: Column, scheme_id: str) -> Column:
    """Latest label under a scheme: labels are newest-first, so it's
    the first element whose scheme matches (F.get → NULL if none)."""
    return F.get(F.filter(labels, lambda l: l["scheme_id"] == scheme_id), 0)


def latest_label_code(labels: Column, scheme_id: str) -> Column:
    return latest_label(labels, scheme_id)["code_id"]


def _imputed_label(scheme_id: str, code: Column, rule: str) -> Column:
    return make_label(
        scheme_id=F.lit(scheme_id),
        code_id=code,
        date_time_utc=F.col("last_updated"),
        checked=F.lit(True),
        origin_id=F.lit(f"imputation:{rule}"),
    )


def _control_array(schemes: list[str], code: str, rule: str) -> Column:
    return F.array(*[_imputed_label(s, F.lit(code), rule) for s in schemes]).cast(LABELS_TYPE)


def _age_bucket_code(n: Column) -> Column:
    expr = F.lit(None).cast("string")
    for lo, hi, code in reversed(AGE_BUCKETS):
        expr = F.when((n >= lo) & (n <= hi), F.lit(code)).otherwise(expr)
    return expr


def _impute_for_dataset(ds: DatasetConfig) -> Column:
    """Imputed labels array for one dataset's scheme list."""
    labels = F.col("labels")
    schemes = ds.scheme_ids

    latest = [latest_label(labels, s) for s in schemes]
    has_checked = None
    has_unchecked = None
    for lab in latest:
        c = lab.isNotNull() & lab["checked"]
        u = lab.isNotNull() & ~lab["checked"]
        has_checked = c if has_checked is None else (has_checked | c)
        has_unchecked = u if has_unchecked is None else (has_unchecked | u)

    # M1
    m1 = (
        F.when(has_checked & ~has_unchecked, labels)
        .when(has_checked & has_unchecked, _control_array(schemes, CODING_ERROR, "m1_ce"))
        .otherwise(_control_array(schemes, NOT_REVIEWED, "m1_nr"))
    )

    # M3 (post-M1 override)
    text_empty = F.col("text").isNull() | (F.col("text") == "")
    m3 = F.when(text_empty, _control_array(schemes, NOT_CODED, "m3_nc")).otherwise(m1)

    # M4: age-category from the age scheme's Normal code
    for cc in ds.coding_configs:
        if cc.age_category_source is None:
            continue
        src_code = latest_label_code(F.col("labels"), cc.age_category_source)
        age_n = F.regexp_extract(src_code, r"^age_(\d+)$", 1)
        normal_checked = has_checked & ~has_unchecked & ~text_empty & (age_n != "")
        cat_label = _imputed_label(
            cc.scheme_id, _age_bucket_code(age_n.try_cast("int")), "m4_age_category")
        m3 = F.when(normal_checked, F.concat(F.array(cat_label), m3)).otherwise(m3)
    return m3


def impute_message_grain(df: DataFrame, config: AnalysisConfig) -> DataFrame:
    """Apply M1 → M3 → M4 to every message, per its dataset's config."""
    expr = None
    for ds in config.datasets:
        branch = _impute_for_dataset(ds)
        cond = F.col("dataset") == ds.name
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return df.withColumn("labels", expr.otherwise(F.col("labels")))
