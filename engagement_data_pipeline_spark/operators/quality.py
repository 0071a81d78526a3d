"""Data-quality expectations: declarative rules evaluated in ONE pass.

The reference hard-fails on individual invariants inline — duplicate
origin_ids (F3, engagement_db scans), labels referencing unknown
schemes/codes (M13, validate_labels) — each as its own scan. This
operator generalizes both: a rule set is compiled into a single
aggregation over one scan of the table (every rule is a SUM of a 0/1
indicator, so the whole report is map-side combinable and costs one
reduce of |rules| longs regardless of table size). Uniqueness rules
need their own grouped pass (count>1 per key), automatically unioned
in; with bucketed/pre-partitioned tables that pass is exchange-free.

Output: one row per rule — (rule, kind, violations, n_checked) — the
shape a pipeline gate consumes ('fail the run if any violations > 0',
reference F3 semantics) and a warehouse stores for drift dashboards.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Rule:
    """One expectation: `name`, `kind`, and a violation indicator."""

    def __init__(self, name: str, kind: str, violated: Column | None,
                 key_cols: Sequence[str] | None = None):
        self.name = name
        self.kind = kind
        self.violated = violated
        self.key_cols = list(key_cols or [])


def not_null(*cols: str) -> Rule:
    cond = None
    for c in cols:
        n = F.col(c).isNull()
        cond = n if cond is None else cond | n
    return Rule(f"not_null({','.join(cols)})", "not_null", cond)


def accepted_values(col: str, values: Sequence[str],
                    allow_null: bool = False) -> Rule:
    bad = ~F.col(col).isin(list(values))
    if allow_null:
        bad = F.col(col).isNotNull() & bad
    else:
        bad = F.col(col).isNull() | bad
    return Rule(f"accepted_values({col})", "accepted_values", bad)


def in_range(col: str, lo, hi) -> Rule:
    c = F.col(col)
    return Rule(f"in_range({col})", "in_range",
                c.isNull() | (c < lo) | (c > hi))


def matches(col: str, pattern: str) -> Rule:
    c = F.col(col)
    return Rule(f"matches({col})", "matches",
                c.isNull() | ~c.rlike(pattern))


def unique(*key_cols: str) -> Rule:
    """Every key combination occurs at most once (reference F3)."""
    return Rule(f"unique({','.join(key_cols)})", "unique", None,
                key_cols=key_cols)


def _violated(rule: Rule) -> Column:
    """Fail-closed violation predicate: a rule whose Column evaluates
    to NULL (three-valued logic on a custom rule like `col < 0` over a
    NULL) counts as VIOLATED, not silently valid — a gate that cannot
    evaluate a rule must not certify the row. The built-in rule
    constructors are already null-safe, so this only changes the
    posture for caller-supplied raw Columns."""
    return F.coalesce(rule.violated, F.lit(True))


def expect(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate all rules: one scan for the row-local rules plus one
    grouped pass per distinct uniqueness key set. NULL rule
    predicates count as violations (see `_violated`)."""
    if not rules:
        raise ValueError("expect() needs at least one rule")
    row_rules = [r for r in rules if r.violated is not None]
    uniq_rules = [r for r in rules if r.violated is None]

    parts = []
    if row_rules:
        aggs = [F.coalesce(F.sum(_violated(r).cast("long")), F.lit(0))
                .alias(f"v_{i}") for i, r in enumerate(row_rules)]
        aggs.append(F.count(F.lit(1)).alias("__n"))
        one = df.agg(*aggs)
        # Unpivot the single aggregate row into one row per rule with
        # stack() — a projection, NOT a union of N legs: a union would
        # re-execute the aggregate (and re-scan the table) once per
        # rule, which is exactly the per-rule-scan cost this operator
        # exists to avoid.
        cells = ", ".join(
            "'{n}', '{k}', v_{i}".format(
                n=r.name.replace("'", "''"), k=r.kind, i=i)
            for i, r in enumerate(row_rules))
        parts.append(one.select(
            F.expr(f"stack({len(row_rules)}, {cells}) "
                   "AS (rule, kind, violations)"),
            F.col("__n").alias("n_checked")))

    for r in uniq_rules:
        per_key = df.groupBy(*r.key_cols).agg(
            F.count(F.lit(1)).alias("__c"))
        parts.append(per_key.agg(
            F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(F.lit(0)))
            .cast("long").alias("violations"),
            F.count(F.lit(1)).alias("n_checked"))
            .select(F.lit(r.name).alias("rule"), F.lit(r.kind).alias("kind"),
                    F.coalesce(F.col("violations"), F.lit(0))
                    .alias("violations"),
                    F.col("n_checked")))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def assert_expectations(df: DataFrame, rules: Sequence[Rule]) -> None:
    """Hard-fail form (reference F3/M13 semantics): raise listing every
    violated rule; one job, not one per rule."""
    bad = [(r.rule, r.violations)
           for r in expect(df, rules).collect() if r.violations > 0]
    if bad:
        raise AssertionError(
            "expectations violated: "
            + "; ".join(f"{n} ({v} rows)" for n, v in bad))


def row_quarantine(df: DataFrame, rules: Sequence[Rule]
                   ) -> tuple[DataFrame, DataFrame]:
    """Split rows into (valid, quarantined) on the ROW-LOCAL rules —
    the dead-letter-queue gate in front of a merge/sink: bad rows are
    diverted with a `failed_rules` column (comma-joined rule names)
    instead of failing the load or silently vanishing. One projection,
    zero shuffle; uniqueness rules are table-level and stay with
    `expect`/`assert_expectations`. A rule predicate that evaluates
    to NULL quarantines the row (fail-closed, see `_violated`) — it
    must not slip through the gate as valid."""
    row_rules = [r for r in rules if r.violated is not None]
    if not row_rules:
        raise ValueError("row_quarantine needs at least one row-local rule")
    failed = F.concat_ws(",", *[
        F.when(_violated(r), F.lit(r.name)) for r in row_rules])
    flagged = df.withColumn("failed_rules", failed)
    valid = flagged.where(F.col("failed_rules") == "").drop("failed_rules")
    return valid, flagged.where(F.col("failed_rules") != "")
