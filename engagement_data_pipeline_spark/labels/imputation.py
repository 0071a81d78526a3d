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
M2 (:161-226) — a checked WS code in a normal scheme XOR a checked
  label in the WS-Correct-Dataset scheme → clear + CE per scheme
  (both present is the M10 move path, neither is fine). Applied to
  M1's output: a WS code only survives M1 in the all-checked case,
  while the WS-scheme label (not a configured scheme) always
  survives — the XOR below encodes exactly that sequencing.
M3 (:229-262) — empty/null text → clear + one NOT_CODED label per
  scheme (runs after M1/M2, overriding their result).
M4 (:265-339) — if the age scheme's latest label is a Normal code
  (`age_<n>`), prepend an age-category label bucketing n into the
  configured inclusive ranges; control codes were already propagated
  to the age_category scheme by M1/M3.
M5 (:342-524) — location hierarchy: a Normal code in the location
  scheme derives one label per configured level scheme via the
  broadcast hierarchy mapping (ward→constituency→county shape);
  control codes were already propagated by M1-M3.

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
    WS,
)
from .schema import LABELS_TYPE, make_label

# The special "WS – Correct Dataset" scheme (SURVEY §1.3); its label
# survives M1 because it is not one of the dataset's configured
# schemes (reference ws_correct_dataset_code_scheme parameter).
WS_CORRECT_DATASET_SCHEME = "ws_correct_dataset_scheme"


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
    all_checked = has_checked & ~has_unchecked
    m1 = (
        F.when(all_checked, labels)
        .when(has_checked & has_unchecked, _control_array(schemes, CODING_ERROR, "m1_ce"))
        .otherwise(_control_array(schemes, NOT_REVIEWED, "m1_nr"))
    )

    # M2: WS XOR against M1's output — a WS code in a normal scheme
    # only survives M1 when all labels were checked; the WS-scheme
    # label always survives (it is not a configured scheme).
    ws_in_normal = F.lit(False)
    for lab in latest:
        ws_in_normal = ws_in_normal | (
            lab.isNotNull() & lab["checked"] & (lab["code_id"] == WS))
    ws_in_normal = all_checked & ws_in_normal
    ws_lab = latest_label(labels, WS_CORRECT_DATASET_SCHEME)
    in_ws_scheme = ws_lab.isNotNull() & ws_lab["checked"]
    m2 = F.when(ws_in_normal != in_ws_scheme,
                _control_array(schemes, CODING_ERROR, "m2_ws_ce")).otherwise(m1)

    # M3 (post-M1/M2 override)
    text_empty = F.col("text").isNull() | (F.col("text") == "")
    m3 = F.when(text_empty, _control_array(schemes, NOT_CODED, "m3_nc")).otherwise(m2)

    # M4: age-category from the age scheme's Normal code
    out = m3
    for cc in ds.coding_configs:
        if cc.age_category_source is None:
            continue
        src_code = latest_label_code(F.col("labels"), cc.age_category_source)
        age_n = F.regexp_extract(src_code, r"^age_(\d+)$", 1)
        normal_checked = all_checked & ~text_empty & (age_n != "")
        cat_label = _imputed_label(
            cc.scheme_id, _age_bucket_code(age_n.try_cast("int")), "m4_age_category")
        out = F.when(normal_checked, F.concat(F.array(cat_label), out)).otherwise(out)

    # M5: location-level schemes from the location scheme's Normal
    # code via the broadcast hierarchy mapping
    for cc in ds.coding_configs:
        if cc.location_source is None:
            continue
        src_code = latest_label_code(F.col("labels"), cc.location_source)
        level_code = F.lit(None).cast("string")
        for src, dst in cc.location_map:
            level_code = F.when(src_code == src, F.lit(dst)).otherwise(level_code)
        normal_checked = all_checked & ~text_empty & level_code.isNotNull()
        lvl_label = _imputed_label(cc.scheme_id, level_code, "m5_location")
        out = F.when(normal_checked, F.concat(F.array(lvl_label), out)).otherwise(out)
    return out


def impute_zone_from_operator(df: DataFrame, zone_scheme: str,
                              operator_to_zone: dict[str, str],
                              dataset: str | None = None) -> DataFrame:
    """M9 (reference :758-841): when the zone scheme's latest label is
    NOT_CODED, re-derive the zone from the message's channel operator
    (telco coverage implies the zone). The derived label is prepended,
    so newest-first "latest per scheme" resolution picks it up."""
    labels = F.col("labels")
    latest = latest_label(labels, zone_scheme)
    zone = F.lit(None).cast("string")
    for op, z in operator_to_zone.items():
        zone = F.when(F.col("channel_operator") == op, F.lit(z)).otherwise(zone)
    cond = (latest.isNotNull() & (latest["code_id"] == NOT_CODED)
            & zone.isNotNull())
    if dataset is not None:
        cond = cond & (F.col("dataset") == dataset)
    derived = make_label(
        scheme_id=F.lit(zone_scheme), code_id=zone,
        date_time_utc=F.col("last_updated"), checked=F.lit(True),
        origin_id=F.lit("imputation:m9_zone_from_operator"))
    return df.withColumn(
        "labels",
        F.when(cond, F.concat(F.array(derived), labels)).otherwise(labels))


def impute_message_grain(df: DataFrame, config: AnalysisConfig) -> DataFrame:
    """Apply M1 → M3 → M4 to every message, per its dataset's config."""
    expr = None
    for ds in config.datasets:
        branch = _impute_for_dataset(ds)
        cond = F.col("dataset") == ds.name
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    return df.withColumn("labels", expr.otherwise(F.col("labels")))
