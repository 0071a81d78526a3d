"""CDC snapshot-diff semantics (operators/cdc.py): all three ops,
null-safe column comparison, unchanged-row suppression, and the
single-scan versioned form's equivalence to the generic join form."""

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.operators.cdc import (snapshot_diff,
                                                          versioned_changeset)

SCHEMA = "k string, a string, b long"


def _diff(spark, old, new):
    o = spark.createDataFrame(old, SCHEMA)
    n = spark.createDataFrame(new, SCHEMA)
    return {r.k: (r.op, r.changed_cols)
            for r in snapshot_diff(o, n, ["k"], ["a", "b"]).collect()}


def test_insert_update_delete_and_suppression(spark):
    got = _diff(
        spark,
        [("same", "x", 1), ("upd", "x", 1), ("gone", "x", 1)],
        [("same", "x", 1), ("upd", "y", 1), ("new", "x", 1)])
    assert got == {
        "upd": ("update", "a"),
        "gone": ("delete", ""),
        "new": ("insert", ""),
    }  # "same" suppressed


def test_null_transitions_are_updates(spark):
    got = _diff(
        spark,
        [("to_null", "x", 1), ("from_null", None, 1), ("both_null", None, 1)],
        [("to_null", None, 1), ("from_null", "x", 1), ("both_null", None, 1)])
    assert got == {
        "to_null": ("update", "a"),
        "from_null": ("update", "a"),
    }  # NULL == NULL is not a change


def test_multi_column_change_lists_all_in_order(spark):
    got = _diff(spark, [("k1", "x", 1)], [("k1", "y", 2)])
    assert got == {"k1": ("update", "a,b")}


def test_empty_old_snapshot_is_all_inserts(spark):
    got = _diff(spark, [], [("k1", "x", 1), ("k2", "y", 2)])
    assert got == {"k1": ("insert", ""), "k2": ("insert", "")}


VERSIONED = [
    # (k, a, b, ts): k1 updated after cut, k2 unchanged re-version,
    # k3 inserted after cut, k4 untouched since before cut
    ("k1", "x", 1, 10), ("k1", "y", 1, 30),
    ("k2", "x", 1, 10), ("k2", "x", 1, 30),
    ("k3", "z", 9, 30),
    ("k4", "w", 2, 10),
]
CUT = 20


def test_versioned_changeset_matches_generic_join_form(spark):
    df = spark.createDataFrame(VERSIONED, "k string, a string, b long, ts long")
    latest = lambda d: d.withColumn(
        "__rn", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.partitionBy("k").orderBy(F.col("ts").desc()))) \
        .where("__rn = 1").drop("__rn", "ts")
    generic = snapshot_diff(latest(df.where(F.col("ts") <= CUT)),
                            latest(df), ["k"], ["a", "b"])
    single = versioned_changeset(df, ["k"], "ts", F.lit(CUT), ["a", "b"])
    g = {r.k: (r.op, r.changed_cols) for r in generic.collect()}
    s = {r.k: (r.op, r.changed_cols) for r in single.collect()}
    assert g == s == {"k1": ("update", "a"), "k3": ("insert", "")}


def test_versioned_changeset_is_one_shuffle(spark):
    df = spark.createDataFrame(VERSIONED, "k string, a string, b long, ts long")
    plan = versioned_changeset(df, ["k"], "ts", F.lit(CUT), ["a", "b"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
