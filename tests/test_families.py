"""Family checksum mechanics: the one-row-per-member fingerprint must
actually discriminate — value changes, null-vs-empty, row drops — and
must refuse schema drift loudly (queries/families.py)."""

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.queries.families import (
    CHECKSUM_MOD, family_query, member_checksum)

SPEC = [("k", "string"), ("v", "bigint"), ("r", "double"),
        ("ok", "boolean")]


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long, r double, ok boolean")


def _ck(spark, rows):
    out = member_checksum(_df(spark, rows), "m", SPEC).collect()[0]
    assert out.member == "m"
    return out.n_rows, out.checksum


def test_checksum_is_order_insensitive(spark):
    a = [("a", 1, 0.5, True), ("b", 2, 1.5, False)]
    assert _ck(spark, a) == _ck(spark, list(reversed(a)))


def test_checksum_detects_value_change(spark):
    base = [("a", 1, 0.5, True), ("b", 2, 1.5, False)]
    n0, c0 = _ck(spark, base)
    n1, c1 = _ck(spark, [("a", 1, 0.5, True), ("b", 2, 1.5, True)])
    assert n0 == n1 == 2 and c0 != c1
    # a change below the 1e-6 double quantum is intentionally invisible
    n2, c2 = _ck(spark, [("a", 1, 0.5 + 1e-9, True), ("b", 2, 1.5, False)])
    assert c2 == c0
    # ... and one at the quantum is visible
    n3, c3 = _ck(spark, [("a", 1, 0.500001, True), ("b", 2, 1.5, False)])
    assert c3 != c0


def test_null_and_empty_string_are_distinct(spark):
    n0, c0 = _ck(spark, [("", 1, 0.5, True)])
    n1, c1 = _ck(spark, [(None, 1, 0.5, True)])
    assert n0 == n1 == 1 and c0 != c1


def test_empty_result_checksums_to_zero(spark):
    n, c = _ck(spark, [])
    assert (n, c) == (0, 0)


def test_checksum_stays_in_bigint_range(spark):
    n, c = _ck(spark, [(str(i), i, float(i), i % 2 == 0)
                       for i in range(500)])
    assert n == 500 and 0 <= c < CHECKSUM_MOD


def test_schema_drift_raises(spark):
    df = _df(spark, [("a", 1, 0.5, True)]).withColumnRenamed("v", "vv")
    with pytest.raises(ValueError, match="schema drifted"):
        member_checksum(df, "m", SPEC)


def test_family_query_unions_all_members(spark, tmp_path):
    def q1(s, d):
        return _df(s, [("a", 1, 0.5, True)])

    def q2(s, d):
        return _df(s, [("b", 2, 1.5, False), ("c", 3, 2.5, True)])

    fam = family_query({"one": (q1, SPEC), "two": (q2, SPEC)})
    rows = {r.member: r for r in fam(spark, str(tmp_path)).collect()}
    assert set(rows) == {"one", "two"}
    assert rows["one"].n_rows == 1 and rows["two"].n_rows == 2


def test_every_oracle_backed_tail_query_is_family_covered():
    """Registry hygiene, automated: the driver records only the first
    50 registry rows, so every oracle-backed query past position 50
    MUST be a member of one of the three checksum families (or the
    driver has no evidence for it). This test turns the by-hand rule
    in registry.py's header into a failing build."""
    from engagement_data_pipeline_spark.queries import family_defs, registry

    names = list(registry.QUERIES)
    tail = set(names[50:])
    oracle_backed_tail = {n for n in tail if n in registry.ORACLES}
    covered = (set(family_defs._EVENTS_MEMBERS)
               | set(family_defs._TRAINING_MEMBERS)
               | set(family_defs._SIMILARITY_MM_MEMBERS))
    missing = oracle_backed_tail - covered
    assert not missing, (
        f"oracle-backed tail queries outside every family: {sorted(missing)}")
    # families must not reference queries that left the registry
    stale = covered - set(names)
    assert not stale, f"family members missing from registry: {sorted(stale)}"
    # and the head must contain the three family rows themselves
    assert {"family_events", "family_training",
            "family_similarity_mm"} <= set(names[:50])
