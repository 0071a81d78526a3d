"""Randomized cross-checks for the round-3 operators: the Spark
implementation vs a naive in-Python reference over arbitrary
generated inputs (the as-of/range-join cross-check pattern).

Examples are small — the value is shrinkable counterexamples over odd
shapes (single-version keys, exact-boundary cuts, empty groups,
one-token docs), not volume."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.operators.cdc import versioned_changeset
from engagement_data_pipeline_spark.operators.incremental import (
    aggregate_state, merge_aggregate_state)
from engagement_data_pipeline_spark.training.packing import pack_plan

SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, ts, a, b): few keys/timestamps so multi-version histories and
# boundary cuts are common. ts unique per key is enforced in the test.
versions_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 9),
              st.sampled_from(["x", "y", None]), st.integers(0, 2)),
    min_size=1, max_size=20)


def _naive_changeset(rows, cut):
    per_key: dict = {}
    for k, ts, a, b in rows:
        per_key.setdefault(k, {})[ts] = (a, b)
    out = {}
    for k, versions in per_key.items():
        new = versions[max(versions)]
        old_ts = [t for t in versions if t <= cut]
        if not old_ts:
            out[k] = ("insert", "")
            continue
        old = versions[max(old_ts)]
        changed = ",".join(c for c, o, n in
                           (("a", old[0], new[0]), ("b", old[1], new[1]))
                           if o != n)
        if changed:
            out[k] = ("update", changed)
    return out


@given(rows=versions_st, cut=st.integers(-1, 10))
@SETTINGS
def test_versioned_changeset_matches_naive(spark, rows, cut):
    # one version per (key, ts) — the operator's documented contract
    dedup = {(k, ts): (k, ts, a, b) for k, ts, a, b in rows}
    rows = list(dedup.values())
    df = spark.createDataFrame(rows, "k long, ts long, a string, b long")
    got = {r.k: (r.op, r.changed_cols)
           for r in versioned_changeset(df, ["k"], "ts", F.lit(cut),
                                        ["a", "b"]).collect()}
    assert got == _naive_changeset(rows, cut)


docs_st = st.lists(st.integers(min_value=1, max_value=40),
                   min_size=1, max_size=30)


@given(n_tokens=docs_st, budget=st.sampled_from([8, 16, 64]))
@SETTINGS
def test_pack_plan_matches_naive_packing(spark, n_tokens, budget):
    docs = spark.createDataFrame(
        [(i, "w " * n) for i, n in enumerate(n_tokens)],
        "doc_id long, text string")
    plan = {r.doc_id: r for r in
            pack_plan(docs, budget=budget, n_shards=2).collect()}
    # naive: group docs by the plan's own shard (hash is impl detail),
    # order by doc_id, run the cumulative placement in python
    shards: dict = {}
    for i, n in enumerate(n_tokens):
        shards.setdefault(plan[i].shard, []).append((i, n))
    for shard, members in shards.items():
        cum = 0
        for i, n in sorted(members):
            r = plan[i]
            assert r.n_tokens == n
            assert r.start_offset == cum
            assert r.seq_first == cum // budget
            assert r.seq_last == (cum + n - 1) // budget
            cum += n


groups_st = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-5, 5)),
    min_size=0, max_size=30)

_METRICS = {"n": ("v", "count"), "s": ("v", "sum"),
            "lo": ("v", "min"), "hi": ("v", "max")}


@given(batches=st.lists(groups_st, min_size=1, max_size=4))
@SETTINGS
def test_state_merge_equals_recompute_for_any_batching(spark, batches):
    dfs = [spark.createDataFrame(b, "g long, v long") for b in batches]
    all_rows = [r for b in batches for r in b]
    full = spark.createDataFrame(all_rows or [], "g long, v long")
    state = aggregate_state(dfs[0], ["g"], _METRICS)
    for d in dfs[1:]:
        state = merge_aggregate_state(
            state, aggregate_state(d, ["g"], _METRICS), ["g"], _METRICS)
    expect = {r.g: (r.n, r.s, r.lo, r.hi)
              for r in aggregate_state(full, ["g"], _METRICS).collect()}
    got = {r.g: (r.n, r.s, r.lo, r.hi) for r in state.collect()}
    assert got == expect
