"""Registry queries for the regression pipeline: R1 model matrix
(exact SQL oracle) and R2 logistic-regression coefficients (rows-only
— the iterative LBFGS fit is not SQL-expressible)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..analysis.regression import (
    build_model_matrix,
    logistic_regression_report,
    multiple_imputation_report,
)
from ..labels.config import CONTROL_CODES
from . import engagement

THEME_SCHEMES = {
    "s01e01_theme_codes": [f"code_{i}" for i in range(7)],
    "s01e02_theme_codes": [f"code_{i}" for i in range(7)],
}
DEMOG_FIELDS = ["gender_codes", "age_category_codes"]

_CONTROL_IN = "(" + ", ".join(f"'{c}'" for c in CONTROL_CODES) + ")"


def r1_model_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    pv = engagement.participants_view(spark, sf_dir)
    return build_model_matrix(pv, engagement.CONFIG, THEME_SCHEMES, DEMOG_FIELDS)


def _r1_sql() -> str:
    cols = ["participant_uuid"]
    for coded_field, codes in THEME_SCHEMES.items():
        stem = coded_field.removesuffix("_codes")
        for code in codes:
            cols.append(
                f"CASE WHEN list_contains(string_split({coded_field}, ';'), '{code}') "
                f"THEN 1 ELSE 0 END AS {stem}_{code}")
    keeps = []
    for field in DEMOG_FIELDS:
        stem = field.removesuffix("_codes")
        normals = f"list_filter(string_split({field}, ';'), c -> c NOT IN {_CONTROL_IN})"
        keeps.append(f"len({normals}) <= 1")
        cols.append(f"COALESCE({normals}[1], 'missing') AS {stem}")
    return (f"WITH pv AS ({engagement.PARTICIPANTS_VIEW_SQL})\n"
            f"SELECT {', '.join(cols)} FROM pv "
            f"WHERE consent_withdrawn = 'false' AND {' AND '.join(keeps)}")


R1_MODEL_MATRIX_SQL = _r1_sql()


def r2_logistic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check: coefficients of theme code_0 in s01e01 on the
    demog categoricals (report-shaped output, like the reference's
    text report). Certified by `r2_suff_stats` (hash-matched oracle
    over the grouped sufficient statistics this fit consumes) —
    linkage pinned in registry.ROWS_ONLY_CERTIFIED_BY."""
    mm = r1_model_matrix(spark, sf_dir)
    return logistic_regression_report(
        mm, "s01e01_theme_code_0",
        [f.removesuffix("_codes") for f in DEMOG_FIELDS])


def r3_mice_pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 (rows-only): MICE-lite pooled coefficients — m=3 hash-seeded
    deterministic imputations of 'missing' demog cells, one IRLS fit
    each, coefficients pooled by mean (Rubin point estimate). The
    iterative fits are not SQL-expressible; the driver records a
    rows-only check (reference: multiple_imputation_regression_analysis.py
    m=20 via R mice — same shape, deterministic draws instead of RNG).
    Certified by `r3_missing_profile` (hash-matched oracle over the
    missingness profile + category pools the deterministic draws use)
    — linkage pinned in registry.ROWS_ONLY_CERTIFIED_BY."""
    mm = r1_model_matrix(spark, sf_dir)
    return multiple_imputation_report(
        mm, "s01e01_theme_code_0",
        [f.removesuffix("_codes") for f in DEMOG_FIELDS], m=3)


def r2_suff_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped sufficient statistics R2's IRLS fit consumes: one
    row per (demog..., theme-label) cell with its count. Regressors
    are all categorical one-hots, so these cells fully determine
    X'WX / X'y at every IRLS iteration — a green hash here certifies
    the entire DISTRIBUTED part of `r2_logistic_regression` (the
    remaining driver-side Newton loop is pure numpy over these same
    cells, pinned separately by golden tests), even though the fit
    itself stays rows-only."""
    from pyspark.sql import functions as F

    mm = r1_model_matrix(spark, sf_dir)
    demogs = [f.removesuffix("_codes") for f in DEMOG_FIELDS]
    return (mm.groupBy(*demogs, "s01e01_theme_code_0")
            .agg(F.count(F.lit(1)).cast("long").alias("n_cell")))


R2_SUFF_STATS_SQL = f"""
WITH mm AS ({R1_MODEL_MATRIX_SQL})
SELECT gender, age_category, s01e01_theme_code_0,
       CAST(COUNT(*) AS BIGINT) AS n_cell
FROM mm GROUP BY gender, age_category, s01e01_theme_code_0
"""


def r3_missing_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed input of R3's imputation, hash-certified: per
    demog column, how many cells are 'missing' vs observed and the
    exact observed-category pool the deterministic draws sample from
    (sorted, comma-joined — the cross-engine array form). The fill
    itself uses Spark's Murmur3 hash and stays rows-only inside
    `r3_mice_pooled`; this pins everything upstream of the draw. One
    melt + one grouped pass over the R1 matrix."""
    from pyspark.sql import functions as F

    mm = r1_model_matrix(spark, sf_dir)
    demogs = [f.removesuffix("_codes") for f in DEMOG_FIELDS]
    melted = mm.select(F.explode(F.array(
        *[F.struct(F.lit(c).alias("field"), F.col(c).alias("value"))
          for c in demogs])).alias("x")).select("x.*")
    obs = F.when(F.col("value") != "missing", F.col("value"))
    return (melted.groupBy("field").agg(
        F.sum((F.col("value") == "missing").cast("long"))
        .alias("n_missing"),
        F.sum((F.col("value") != "missing").cast("long"))
        .alias("n_observed"),
        F.count_distinct(obs).cast("long").alias("n_categories"),
        F.array_join(F.array_sort(F.collect_set(obs)), ",")
        .alias("observed_categories")))


R3_MISSING_PROFILE_SQL = f"""
WITH mm AS MATERIALIZED ({R1_MODEL_MATRIX_SQL}),
melted AS (
  SELECT 'gender' AS field, gender AS value FROM mm
  UNION ALL
  SELECT 'age_category' AS field, age_category AS value FROM mm
)
SELECT field,
  CAST(SUM(CASE WHEN value = 'missing' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_missing,
  CAST(SUM(CASE WHEN value <> 'missing' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_observed,
  CAST(COUNT(DISTINCT CASE WHEN value <> 'missing' THEN value END)
    AS BIGINT) AS n_categories,
  COALESCE(array_to_string(
    list(DISTINCT value ORDER BY value)
      FILTER (WHERE value <> 'missing'), ','), '') AS observed_categories
FROM melted GROUP BY field
"""
