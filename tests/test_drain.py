"""`streaming/drain.py:drain_changes` — the engine's bounded
AvailableNow-semantics catch-up over the change feed.

Spark's `trigger(availableNow=True)` cannot give these guarantees for
a Python data source (PythonMicroBatchStream lacks
SupportsTriggerAvailableNow; the engine falls back to ONE batch and
stops — verified against Spark 4.1), so the drain is driver-bounded:
head commit recorded on entry, stop decided by offset arithmetic on
the last completed batch, per-commit batching preserved.
"""

from __future__ import annotations

import pytest

from engagement_data_pipeline_spark.streaming import ingest as ing
from engagement_data_pipeline_spark.streaming.drain import drain_changes


def _merge(spark, path, n_buckets=2):
    return ing.foreach_batch_upsert(path, ["origin"], n_buckets=n_buckets,
                                    txn_app_id="src", mode="latest_wins")


def _row(spark, origin, payload):
    return spark.createDataFrame([(origin, payload)],
                                 "origin string, payload string")


def test_drain_processes_every_commit_per_batch(spark, tmp_path):
    """5 commits on entry -> 5 micro-batches (per-commit retractions
    preserved, unlike the availableNow fallback's single collapsed
    batch), and the returned head is the table's head."""
    path = str(tmp_path / "t")
    merge = _merge(spark, path)
    for i in range(1, 6):
        merge(_row(spark, f"o{i}", f"v{i}"), i)

    batches: list[tuple[int, int]] = []
    head = drain_changes(
        spark, path, lambda df, eid: batches.append((eid, df.count())))
    assert head == 5
    assert len(batches) == 5
    assert all(n == 1 for _, n in batches)


def test_drain_resumes_from_checkpoint(spark, tmp_path):
    """A stable checkpoint makes consecutive drains incremental: the
    second call delivers ONLY the commits that landed after the
    first, the third (nothing new) delivers no batches at all and
    still returns the head."""
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    merge = _merge(spark, path)
    merge(_row(spark, "a", "1"), 1)
    merge(_row(spark, "b", "1"), 2)

    seen: list[list[str]] = []

    def sink(df, _eid):
        seen.append(sorted(r.origin for r in df.collect()))

    assert drain_changes(spark, path, sink, checkpoint=ckpt) == 2
    assert seen == [["a"], ["b"]]

    seen.clear()
    merge(_row(spark, "c", "1"), 3)
    assert drain_changes(spark, path, sink, checkpoint=ckpt) == 3
    assert seen == [["c"]]

    seen.clear()
    assert drain_changes(spark, path, sink, checkpoint=ckpt) == 3
    assert seen == []


def test_drain_empty_table_returns_zero(spark, tmp_path):
    """No commits -> nothing to drain; no stream is even started."""
    calls = []
    assert drain_changes(spark, str(tmp_path / "missing"),
                         lambda df, eid: calls.append(eid)) == 0
    assert calls == []


def test_drain_unbatched_mode_collapses_inserts(spark, tmp_path):
    """max_commits_per_trigger=None lets the source batch freely —
    a pure-insert backlog may arrive in fewer batches, but the drain
    still reaches the head and delivers every row exactly once."""
    path = str(tmp_path / "t")
    merge = _merge(spark, path)
    for i in range(1, 5):
        merge(_row(spark, f"o{i}", "v"), i)

    rows: list[str] = []
    head = drain_changes(
        spark, path,
        lambda df, eid: rows.extend(r.origin for r in df.collect()),
        max_commits_per_trigger=None)
    assert head == 4
    assert sorted(rows) == ["o1", "o2", "o3", "o4"]


def test_drain_options_passthrough_starting_commit(spark, tmp_path):
    """`options={"startingCommit": N}` skips the prefix — the drain
    subscribes mid-history exactly like a raw reader would."""
    path = str(tmp_path / "t")
    merge = _merge(spark, path)
    for i in range(1, 4):
        merge(_row(spark, f"o{i}", "v"), i)

    rows: list[str] = []
    drain_changes(spark, path,
                  lambda df, eid: rows.extend(r.origin
                                              for r in df.collect()),
                  options={"startingCommit": "2"})
    assert sorted(rows) == ["o3"]


def test_drain_timeout_is_loud(spark, tmp_path, monkeypatch):
    """If the head cannot be reached in time the drain raises —
    never a silent partial catch-up. Forced by recording a head the
    feed can never reach."""
    path = str(tmp_path / "t")
    _merge(spark, path)(_row(spark, "a", "1"), 1)
    monkeypatch.setattr(
        "engagement_data_pipeline_spark.streaming.drain._latest_commit",
        lambda p, floor=None: 99)
    with pytest.raises(TimeoutError, match="commit 1 but not head 99"):
        drain_changes(spark, path, lambda df, eid: df.count(),
                      timeout_s=3)
