"""Regression analysis (SURVEY §2.8 R1-R4).

Reference: src/engagement_db_to_analysis/regression_analysis/ —
R1 data_conversion.py:10-117 (model matrix: consenting+relevant rows,
RQA normal codes one-hot as {dataset}_{code} ∈ {0,1}, demogs as a
single categorical with an ≤1-normal-code assertion), R2
complete_case_regression_analysis.py:25-74 (per-theme logistic
regression, coefficient report), R3 multiple imputation, R4 factor
conversion.

The reference shells into R (arm::bayesglm / mice); numeric parity
with R is explicitly out of scope (the outputs are human-read text
reports). Here R2 uses spark.ml LogisticRegression (deterministic
LBFGS), R3 is a deterministic multiple-imputation loop (mode
imputation + hash-jittered category draws, m configurable), R4 is
plain pandas conversion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..labels.config import AnalysisConfig, CONTROL_CODES, DEMOGRAPHIC, RESEARCH_QUESTION_ANSWER


def _is_control(code: Column) -> Column:
    return code.isin(CONTROL_CODES)


def build_model_matrix(participants_view: DataFrame, config: AnalysisConfig,
                       theme_schemes: dict[str, list[str]],
                       demog_fields: list[str]) -> DataFrame:
    """R1: per consenting participant — one 0/1 column per
    (RQA coded field, normal code) plus each demog field as a single
    categorical (rows with ≥2 normal demog codes are dropped, the
    relational form of the reference's assertion)."""
    pv = participants_view.where(F.col("consent_withdrawn") == "false")
    cols: list[Column] = [F.col("participant_uuid")]
    for coded_field, codes in theme_schemes.items():
        arr = F.split(F.col(coded_field), ";")
        for code in codes:
            cols.append(
                F.when(F.array_contains(arr, code), F.lit(1)).otherwise(F.lit(0))
                .alias(f"{coded_field.removesuffix('_codes')}_{code}"))
    keep = F.lit(True)
    for field in demog_fields:
        arr = F.split(F.col(field), ";")
        normals = F.filter(arr, lambda c: ~_is_control(c))
        keep = keep & (F.size(normals) <= 1)
        cols.append(
            F.coalesce(F.get(normals, 0), F.lit("missing"))
            .alias(field.removesuffix("_codes")))
    return pv.where(keep).select(*cols)


def logistic_regression_report(model_matrix: DataFrame, theme_col: str,
                               demog_cols: list[str]) -> DataFrame:
    """R2: logistic regression of one one-hot theme column on
    categorical demogs (one-hot encoded); returns a (feature,
    coefficient) DataFrame. Deterministic given fixed input; numeric
    parity with the reference's bayesglm is out of scope.

    Scale design: the regressors are all categorical, so the
    sufficient statistics are the grouped counts per (demog...,
    label) cell — one Spark aggregation collapses any input size to
    at most prod(cardinalities) rows, which are fit driver-side with
    a deterministic ridge-penalised IRLS (Newton) loop. This replaces
    an iterative spark.ml LBFGS whose every iteration re-walked the
    full lineage; at 100 TB the aggregation is the only distributed
    work and it map-side combines."""
    grouped = (model_matrix
               .groupBy(*demog_cols, theme_col)
               .agg(F.count(F.lit(1)).alias("n"))
               .collect())
    return _fit_grouped_cells(model_matrix.sparkSession, grouped,
                              theme_col, demog_cols)


def _fit_grouped_cells(spark, grouped, theme_col: str,
                       demog_cols: list[str]) -> DataFrame:
    """The driver-side ridge-IRLS fit over collected sufficient-
    statistic cells — split out so `multiple_imputation_report` can
    collect all m imputations' cells in ONE aggregation and fit each
    subset without a per-imputation Spark job."""
    import numpy as np

    # Fix the cell order before any float accumulates: collect() order
    # follows shuffle partitioning, and the IRLS mat-vecs sum over
    # rows, so an environment with different partition counts would
    # otherwise round differently. Sorted cells make the fitted
    # coefficients bit-identical everywhere (pinned by golden tests).
    grouped = sorted(grouped,
                     key=lambda r: tuple(str(r[c])
                                         for c in [*demog_cols, theme_col]))
    # one-hot layout: per column, alphabetical categories minus the
    # last (dropLast baseline); constant columns carry no information
    cats = {c: sorted({r[c] for r in grouped}) for c in demog_cols}
    active = [c for c in demog_cols if len(cats[c]) >= 2]
    feature_names = [f"{c}={v}" for c in active for v in cats[c][:-1]]
    slot = {}
    off = 1  # slot 0 = intercept
    for c in active:
        for v in cats[c][:-1]:
            slot[(c, v)] = off
            off += 1
    p = off
    X = np.zeros((len(grouped), p))
    X[:, 0] = 1.0
    y = np.empty(len(grouped))
    n = np.empty(len(grouped))
    for i, r in enumerate(grouped):
        for c in active:
            j = slot.get((c, r[c]))
            if j is not None:
                X[i, j] = 1.0
        y[i] = float(r[theme_col])
        n[i] = float(r["n"])
    # ridge-IRLS: penalty on non-intercept weights only
    lam = 0.01 * n.sum()
    mask = np.ones(p)
    mask[0] = 0.0
    w = np.zeros(p)
    for _ in range(50):
        eta = np.clip(X @ w, -30, 30)
        mu = 1.0 / (1.0 + np.exp(-eta))
        grad = X.T @ (n * (y - mu)) - lam * mask * w
        s = n * mu * (1.0 - mu)
        H = (X.T * s) @ X + np.diag(lam * mask + 1e-9)
        delta = np.linalg.solve(H, grad)
        w += delta
        if np.max(np.abs(delta)) < 1e-10:
            break
    rows = [("(intercept)", float(w[0]))] + [
        (name, float(wi)) for name, wi in zip(feature_names, w[1:])
    ]
    return spark.createDataFrame(
        rows, "feature string, coefficient double")


def multiple_imputation_report(model_matrix: DataFrame, theme_col: str,
                               demog_cols: list[str], m: int = 5) -> DataFrame:
    """R3 (MICE-lite): m deterministic imputations of 'missing' demog
    cells — each draw picks a category by hashing (participant, round)
    against the observed category list — then one regression per
    imputed set, coefficients pooled by mean (Rubin's rules' point
    estimate). Deterministic: no RNG, hash-based draws."""
    # The matrix feeds one observed-categories aggregation plus the
    # fused cells aggregation; without a cache each job re-derives its
    # full lineage (participants_view upward). Everything downstream
    # collects eagerly inside this function, so the cache's lifetime
    # is exactly this call.
    spark = model_matrix.sparkSession
    model_matrix = model_matrix.cache()
    # All category sets in ONE job instead of one distinct per column.
    sets = model_matrix.agg(
        *[F.collect_set(c).alias(c) for c in demog_cols]).collect()[0]
    observed = {c: [v for v in sets[c] if v != "missing"] or ["missing"]
                for c in demog_cols}
    # ONE fused sufficient-statistics pass for all m imputations: each
    # row explodes into its m imputed variants (the per-draw fill only
    # depends on hash(participant, i, column), identical whether i is
    # a literal or the exploded column), grouped by (draw, demogs,
    # label) — was m separate aggregation jobs, each re-scanning the
    # cached matrix. The per-draw IRLS fits stay driver-side and
    # consume each draw's sorted cell subset exactly as before.
    df = model_matrix.withColumn(
        "__i", F.explode(F.array(*[F.lit(i) for i in range(m)])))
    for c in demog_cols:
        cats = sorted(observed[c])
        bucket = F.abs(F.hash(F.col("participant_uuid"), F.col("__i"),
                              F.lit(c))) % len(cats)
        fill = F.lit(cats[0])
        for j, cat in enumerate(cats):
            fill = F.when(bucket == j, F.lit(cat)).otherwise(fill)
        df = df.withColumn(c, F.when(F.col(c) == "missing", fill)
                           .otherwise(F.col(c)))
    cells = (df.groupBy("__i", *demog_cols, theme_col)
             .agg(F.count(F.lit(1)).alias("n"))
             .collect())
    model_matrix.unpersist()
    reports = []
    for i in range(m):
        reports.append(_fit_grouped_cells(
            spark, [r for r in cells if r["__i"] == i],
            theme_col, demog_cols))
    un = reports[0]
    for r in reports[1:]:
        un = un.unionByName(r)
    return un.groupBy("feature").agg(
        F.avg("coefficient").alias("pooled_coefficient"),
        F.count(F.lit(1)).alias("m"))


def to_factor_frame(df: DataFrame):
    """R4: the reference stringifies every value into R FactorVectors
    (r_utils.py:7-41); the pandas analog is string-typed categoricals
    with None preserved."""
    pdf = df.toPandas()
    for c in pdf.columns:
        pdf[c] = pdf[c].map(lambda v: None if v is None else str(v)).astype("category")
    return pdf
