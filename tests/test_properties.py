"""Property-based tests (hypothesis) for the core operators.

Each property drives an operator with arbitrary generated rows and
checks an invariant a reference-driven example test can't pin down as
strongly: determinism under permutation/partitioning, per-key maxima,
and candidate-generation guarantees of the LSH pipeline.

Examples are kept small (each one runs real Spark jobs) — the point
is shrinkable counterexamples over odd shapes (ties, NULLs, empty
groups), not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.operators.dedup import (
    idempotent_upsert,
    latest_snapshot,
)
from engagement_data_pipeline_spark.operators.filters import exclude_values
from engagement_data_pipeline_spark.training.dedup import (
    minhash_near_dup_pairs,
    word_shingles,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_T0 = dt.datetime(2024, 1, 1)

# (key, version, payload) rows: few distinct keys/versions so ties and
# duplicates are common.
rows_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # key
        st.integers(min_value=0, max_value=5),   # version offset (hours)
        st.integers(min_value=0, max_value=99),  # payload
    ),
    min_size=1,
    max_size=25,
)


def _frame(spark, rows):
    data = [
        (f"k{k}", _T0 + dt.timedelta(hours=v), f"p{p}")
        for k, v, p in rows
    ]
    return spark.createDataFrame(
        data, "message_id string, last_updated timestamp, payload string")


@SETTINGS
@given(rows=rows_st)
def test_latest_snapshot_is_per_key_max_and_permutation_invariant(spark, rows):
    df = _frame(spark, rows)
    out = latest_snapshot(df, ["message_id"],
                          ["last_updated", "payload"]).collect()

    # one row per key, and it is the (last_updated, payload)-max row
    expect = {}
    for k, v, p in rows:
        key = f"k{k}"
        cand = (_T0 + dt.timedelta(hours=v), f"p{p}")
        if key not in expect or cand > expect[key]:
            expect[key] = cand
    got = {r.message_id: (r.last_updated, r.payload) for r in out}
    assert got == expect

    # permutation + partitioning invariance (determinism)
    out2 = latest_snapshot(
        _frame(spark, rows[::-1]).repartition(3), ["message_id"],
        ["last_updated", "payload"]).collect()
    assert sorted(map(tuple, out2)) == sorted(map(tuple, out))


@SETTINGS
@given(existing=rows_st, incoming=rows_st)
def test_idempotent_upsert_is_idempotent_and_existing_wins(
        spark, existing, incoming):
    ex = _frame(spark, existing).withColumn(
        "origin_id", F.col("message_id"))
    inc = _frame(spark, incoming).withColumn(
        "origin_id", F.col("message_id"))
    ex = latest_snapshot(ex, ["origin_id"], ["last_updated", "payload"])

    once = idempotent_upsert(ex, inc, ["origin_id"])
    twice = idempotent_upsert(once, inc, ["origin_id"])
    r_once = sorted(map(tuple, once.collect()))
    assert r_once == sorted(map(tuple, twice.collect()))

    # every existing row survives untouched; no origin_id duplicated
    surviving = {r.origin_id: tuple(r) for r in once.collect()}
    for r in ex.collect():
        assert surviving[r.origin_id] == tuple(r)
    assert len(surviving) == once.count()


@SETTINGS
@given(
    vals=st.lists(st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
                  min_size=1, max_size=15),
    banned=st.lists(st.sampled_from(["a", "b", "c"]), max_size=3),
)
def test_exclude_values_drops_only_listed_and_keeps_nulls(spark, vals, banned):
    df = spark.createDataFrame([(v,) for v in vals], "col string")
    got = sorted(r.col or "<null>"
                 for r in exclude_values(df, "col", banned).collect())
    want = sorted((v or "<null>") for v in vals if v not in banned)
    assert got == want


# Documents: small vocabulary so near-duplicates actually occur.
doc_st = st.lists(
    st.lists(st.sampled_from(["red", "green", "blue", "dog", "cat"]),
             min_size=1, max_size=8).map(" ".join),
    min_size=2,
    max_size=8,
)


@SETTINGS
@given(texts=doc_st)
def test_minhash_identical_texts_always_pair(spark, texts):
    """Exact duplicates have identical signatures, so every band
    collides: LSH must emit every identical-text pair with jaccard 1,
    and never emit a pair whose true jaccard is below threshold."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in minhash_near_dup_pairs(docs, threshold=0.5).collect()}

    shingles = {
        r.doc_id: set(r.sh) for r in docs.select(
            "doc_id", word_shingles(F.col("text")).alias("sh")).collect()
    }
    for (a, b), j in pairs.items():
        true_j = (len(shingles[a] & shingles[b])
                  / len(shingles[a] | shingles[b]))
        assert abs(j - true_j) < 1e-9
        assert true_j >= 0.5

    norm = [" ".join(t.split()).lower() for t in texts]
    for i in range(len(norm)):
        for j in range(i + 1, len(norm)):
            if norm[i] == norm[j]:
                assert pairs.get((i, j)) == 1.0


@SETTINGS
@given(
    hours=st.lists(st.integers(min_value=0, max_value=4),
                   min_size=0, max_size=12),
)
def test_tie_safe_watermark_partial_batches_never_overcommit(spark, hours):
    """For a possibly-truncated batch, the committed watermark must be
    strictly below the batch max (its tie group may continue beyond
    the fetch), and truncate_incomplete_tie_group must keep exactly
    the rows at or below that watermark."""
    from engagement_data_pipeline_spark.operators.incremental import (
        tie_safe_watermark,
        truncate_incomplete_tie_group,
    )

    data = [(i, _T0 + dt.timedelta(hours=h)) for i, h in enumerate(hours)]
    df = spark.createDataFrame(data, "id long, ts timestamp") if data else \
        spark.createDataFrame([], "id long, ts timestamp")

    w = tie_safe_watermark(df, "ts", complete=False)
    kept = truncate_incomplete_tie_group(df, "ts").collect()

    if not hours or len(set(hours)) == 1:
        # empty batch, or every row in one tie group: nothing commits
        assert w is None
        assert kept == []
    else:
        mx = _T0 + dt.timedelta(hours=max(hours))
        assert w < mx
        assert w == _T0 + dt.timedelta(hours=max(h for h in hours
                                                 if h != max(hours)))
        assert all(r.ts <= w for r in kept)
        assert len(kept) == sum(1 for h in hours if h != max(hours))

    # complete batches commit the exact max
    wc = tie_safe_watermark(df, "ts", complete=True)
    assert wc == (max((_T0 + dt.timedelta(hours=h) for h in hours),
                      default=None))


@SETTINGS
@given(
    minute_offsets=st.lists(
        st.tuples(st.integers(min_value=1, max_value=3),      # user
                  st.integers(min_value=0, max_value=600)),   # minute
        min_size=0, max_size=25),
)
def test_sessionize_partitions_events_and_respects_gap(spark, minute_offsets):
    """Sessions partition a user's events exactly (counts sum to n),
    every intra-session step is <= the gap, and consecutive sessions
    of one user are separated by more than the gap."""
    from engagement_data_pipeline_spark.operators.sessions import sessionize

    gap_min = 30
    data = [(u, _T0 + dt.timedelta(minutes=m)) for u, m in minute_offsets]
    df = (spark.createDataFrame(data, "user_id long, ts timestamp")
          if data else spark.createDataFrame([], "user_id long, ts timestamp"))

    out = sessionize(df, "user_id", "ts", gap_minutes=gap_min).collect()

    # partition: per-user event counts add up
    per_user = {}
    for u, m in minute_offsets:
        per_user.setdefault(u, []).append(m)
    got_counts = {}
    for r in out:
        got_counts[r["user_id"]] = got_counts.get(r["user_id"], 0) + r["n_events"]
    assert got_counts == {u: len(ms) for u, ms in per_user.items()}

    # session boundaries follow the gap rule exactly: recompute the
    # expected session starts per user from sorted minutes
    for u, ms in per_user.items():
        ms = sorted(ms)
        expected_sessions = []
        for m in ms:
            if expected_sessions and m - expected_sessions[-1][-1] <= gap_min:
                expected_sessions[-1].append(m)
            else:
                expected_sessions.append([m])
        got = sorted(
            ((r["session_start"], r["session_end"], r["n_events"])
             for r in out if r["user_id"] == u))
        want = sorted(
            ((_T0 + dt.timedelta(minutes=s[0]),
              _T0 + dt.timedelta(minutes=s[-1]), len(s))
             for s in expected_sessions))
        assert got == want
