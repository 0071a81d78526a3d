"""Data-quality expectations (operators/quality.py): every rule kind
counts precisely, the hard-fail form raises with all violated rules,
and the row-local report is a single aggregation."""

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.operators import quality as Q

ROWS = [
    ("a", "live", 5, "ok"),
    ("b", "live", 25, None),       # null text
    ("c", "weird", 5, "ok"),       # bad status
    (None, "stale", -1, "ok"),     # null id, out-of-range
    ("a", "live", 5, "ok"),        # duplicate id
]
SCHEMA = "id string, status string, v long, text string"


def _report(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    rep = Q.expect(df, [
        Q.not_null("id"),
        Q.not_null("text"),
        Q.accepted_values("status", ["live", "stale"]),
        Q.in_range("v", 0, 10),
        Q.matches("id", "^[a-z]$"),
        Q.unique("id"),
    ])
    return {r.rule: (r.violations, r.n_checked) for r in rep.collect()}


def test_rule_counts(spark):
    got = _report(spark)
    assert got["not_null(id)"] == (1, 5)
    assert got["not_null(text)"] == (1, 5)
    assert got["accepted_values(status)"] == (1, 5)
    # -1 out of range AND 25 out of range
    assert got["in_range(v)"] == (2, 5)
    # null id fails matches too (null is not a match)
    assert got["matches(id)"] == (1, 5)
    # duplicate key 'a' contributes its full count (2 rows), checked
    # over 4 distinct keys
    assert got["unique(id)"] == (2, 4)


def test_assert_expectations_raises_listing_rules(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(AssertionError) as e:
        Q.assert_expectations(df, [Q.not_null("id"), Q.unique("id")])
    assert "not_null(id)" in str(e.value) and "unique(id)" in str(e.value)


def test_assert_passes_on_clean_table(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "id string, v long")
    Q.assert_expectations(df, [Q.not_null("id", "v"), Q.unique("id"),
                               Q.in_range("v", 0, 10)])


def test_row_rules_are_one_aggregation(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    rep = Q.expect(df, [Q.not_null("id"), Q.in_range("v", 0, 10),
                        Q.accepted_values("status", ["live", "stale"])])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    # one scan feeding one global aggregate, fanned out to rule rows
    assert plan.count("Scan ") <= 1 or "ReusedExchange" in plan, plan


def test_expect_empty_rule_list_is_an_error(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="at least one rule"):
        Q.expect(df, [])


# --- column_stats (operators/profile.py) ----------------------------------

def test_column_stats_one_pass_values(spark):
    from engagement_data_pipeline_spark.operators.profile import column_stats

    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", None), (3, None, 8.0), (3, "b", 8.0)],
        "k long, s string, v double")
    out = {r["column"]: r for r in column_stats(df).collect()}
    assert out["k"]["n_rows"] == 4 and out["k"]["n_nulls"] == 0
    assert out["k"]["n_distinct"] == 3
    assert (out["k"]["min_value"], out["k"]["max_value"]) == (1.0, 3.0)
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_value"] is None  # non-numeric: no min/max
    assert out["v"]["n_nulls"] == 1
    assert (out["v"]["min_value"], out["v"]["max_value"]) == (2.0, 8.0)


def test_column_stats_approx_close(spark):
    from engagement_data_pipeline_spark.operators.profile import column_stats

    df = spark.range(5000).selectExpr("id", "id % 97 AS m")
    out = {r["column"]: r for r in
           column_stats(df, approx=True).collect()}
    assert abs(out["id"]["n_distinct"] - 5000) / 5000 < 0.15  # rsd=0.05, 3 sigma
    assert abs(out["m"]["n_distinct"] - 97) / 97 < 0.15
