"""Sequence-packing and chunk-plan invariants (training/packing.py):
token conservation, gapless sequence coverage, straddle math, and
chunk tiling."""

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.training.packing import (chunk_plan,
                                                             pack_plan)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


WORDS = ["alpha beta gamma delta " * k for k in (1, 3, 7, 2, 5, 11, 4, 6)]


def test_pack_conserves_tokens_and_is_gapless(spark):
    docs = _docs(spark, WORDS * 4)
    plan = pack_plan(docs, budget=16, n_shards=3).collect()
    by_shard = {}
    for r in plan:
        by_shard.setdefault(r.shard, []).append(r)
    assert sum(len(v) for v in by_shard.values()) == 32
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        # offsets are exactly the running sum: no token lost or repeated
        cum = 0
        for r in rows:
            assert r.start_offset == cum
            cum += r.n_tokens
        # every sequence index up to the last is covered by some doc
        covered = set()
        for r in rows:
            assert r.seq_first <= r.seq_last
            covered.update(range(r.seq_first, r.seq_last + 1))
        assert covered == set(range(max(covered) + 1))


def test_pack_straddle_boundaries(spark):
    # one shard, doc_ids in order: 10 + 10 tokens, budget 16 -> the
    # second doc straddles sequences 0 and 1
    docs = _docs(spark, ["w " * 10, "w " * 10])
    plan = {r.doc_id: r for r in
            pack_plan(docs, budget=16, n_shards=1).collect()}
    assert (plan[0].seq_first, plan[0].seq_last) == (0, 0)
    assert (plan[1].seq_first, plan[1].seq_last) == (0, 1)


def test_chunks_tile_documents(spark):
    docs = _docs(spark, ["w " * n for n in (5, 64, 65, 112, 200)])
    rows = chunk_plan(docs, chunk=64, stride=48).collect()
    n_tokens = {i: n for i, n in enumerate((5, 64, 65, 112, 200))}
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        n = n_tokens[doc_id]
        assert chunks[0].tok_start == 0
        assert chunks[-1].tok_end == n
        for c in chunks:
            assert c.tok_start == c.chunk_idx * 48
            assert c.n_chunk_tokens == c.tok_end - c.tok_start > 0
        # consecutive chunks overlap by chunk - stride (= 16)
        for a, b in zip(chunks, chunks[1:]):
            assert b.tok_start == a.tok_start + 48 < a.tok_end


def test_short_doc_gets_single_full_chunk(spark):
    rows = chunk_plan(_docs(spark, ["one two three"]),
                      chunk=64, stride=48).collect()
    assert len(rows) == 1
    assert (rows[0].tok_start, rows[0].tok_end) == (0, 3)


def test_gappy_stride_rejected(spark):
    with pytest.raises(ValueError, match="leaves gaps"):
        chunk_plan(_docs(spark, ["x"]), chunk=16, stride=32)


def test_pack_plan_has_one_shuffle(spark):
    plan = pack_plan(_docs(spark, WORDS))._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
