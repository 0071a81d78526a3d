"""CDC snapshot-diff semantics (operators/cdc.py): all three ops,
null-safe column comparison, and unchanged-row suppression."""

from engagement_data_pipeline_spark.operators.cdc import snapshot_diff

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
