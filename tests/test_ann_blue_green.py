"""Blue/green ANN index generations (atomic quantizer retrain/swap)
and dv-churn compaction on the cells table."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.streaming import ingest as ing
from engagement_data_pipeline_spark.training import ann_index as AI

DIM = 8
N = 240


def _emb(spark, n=N, flip=0):
    """Deterministic embeddings; `flip` perturbs values (re-embedding)."""
    return spark.range(n).select(
        F.col("id").cast("string").alias("vec_id"),
        F.expr(f"transform(sequence(1, {DIM}), i -> "
               f"cast(pmod(xxhash64(id, i, {flip}), 1000) / 500.0 - 1.0 "
               "as float))").alias("embedding"))


def _cents(spark, ids):
    from engagement_data_pipeline_spark.training.similarity import (
        seed_centroids_ivf,
    )

    return seed_centroids_ivf(
        _emb(spark).withColumn("vec_id", F.col("vec_id").cast("long")),
        list(ids))


def _src(spark, path):
    merge = ing.foreach_batch_upsert(path, ["vec_id"], n_buckets=4,
                                     txn_app_id="src",
                                     mode="latest_wins")
    merge(_emb(spark), 1)
    return merge


def _queries(spark):
    return (_emb(spark).where(F.col("vec_id").isin(["1", "2", "3"]))
            .select(F.col("vec_id").cast("long").alias("query_id"),
                    F.col("embedding").alias("q_emb")))


def _topk(spark, idx_path):
    return sorted(tuple(r) for r in AI.ann_topk_indexed(
        spark, idx_path, _queries(spark), k=5, n_probe=2).collect())


def test_blue_green_swap_is_atomic_and_generational(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    root = os.path.join(str(tmp_path), "root")
    _src(spark, src)
    cents_a = _cents(spark, range(0, 16, 4))
    cents_b = _cents(spark, range(2, 18, 4))

    gen1 = AI.init_ann_index(spark, src, root, cents_a)
    assert AI.live_index_path(spark, root) == gen1
    with pytest.raises(ValueError, match="once"):
        AI.init_ann_index(spark, src, root, cents_a)
    before = _topk(spark, AI.live_index_path(spark, root))

    gen2 = AI.retrain_ann_index(spark, src, root, cents_b)
    # pointer flipped atomically; the OLD generation stays readable
    # and still answers under its own quantizer (an in-flight reader
    # that resolved the pointer pre-flip sees exactly one generation)
    assert AI.live_index_path(spark, root) == gen2 != gen1
    assert _topk(spark, gen1) == before
    live_after = _topk(spark, AI.live_index_path(spark, root))
    # IVF is approximate: different quantizers probe different cells,
    # so the result SETS may differ (ann_retrain_swap quantifies the
    # recall change) — but both generations answer every query fully
    assert ({t[0] for t in live_after} == {t[0] for t in before}
            == {1, 2, 3})
    # each generation serves its own quantizer, never the other's
    assert AI._cents_equal(AI.load_centroids(spark, gen1),
                           [tuple(c) for c in cents_a])
    assert AI._cents_equal(AI.load_centroids(spark, gen2),
                           [tuple(c) for c in cents_b])

    removed = AI.prune_generations(spark, root)
    assert removed == ["gen-000001"]
    assert _topk(spark, AI.live_index_path(spark, root)) == live_after


def test_retrain_skips_orphan_of_crashed_retrain(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    root = os.path.join(str(tmp_path), "root")
    _src(spark, src)
    cents = _cents(spark, range(0, 16, 4))
    AI.init_ann_index(spark, src, root, cents)
    # simulate a retrain that crashed BEFORE its pointer flip: a
    # half-built gen-000002 exists, the pointer still names gen 1
    AI.build_ann_index_from_table(spark, src,
                                  os.path.join(root, "gen-000002"),
                                  cents)
    assert AI.live_index_path(spark, root).endswith("gen-000001")
    gen3 = AI.retrain_ann_index(spark, src, root,
                                _cents(spark, range(2, 18, 4)))
    assert gen3.endswith("gen-000003")  # orphan skipped, never reused
    assert AI.live_index_path(spark, root) == gen3
    # prune drops BOTH the superseded gen 1 and the orphan gen 2
    assert AI.prune_generations(spark, root) == ["gen-000001",
                                                 "gen-000002"]


def test_corrupt_pointer_is_loud(spark, tmp_path):
    """A malformed _live pointer must raise everywhere — treating it
    as 'no index' would let init overwrite a live index's pointer."""
    src = os.path.join(str(tmp_path), "src")
    root = os.path.join(str(tmp_path), "root")
    _src(spark, src)
    cents = _cents(spark, range(0, 16, 4))
    AI.init_ann_index(spark, src, root, cents)
    with open(os.path.join(root, "_live"), "w") as f:
        f.write("garbage")
    for call in (lambda: AI.live_index_path(spark, root),
                 lambda: AI.init_ann_index(spark, src, root, cents),
                 lambda: AI.retrain_ann_index(spark, src, root, cents),
                 lambda: AI.prune_generations(spark, root)):
        with pytest.raises(ValueError, match="corrupt"):
            call()


def test_retrain_requires_init(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    _src(spark, src)
    with pytest.raises(ValueError, match="init_ann_index"):
        AI.retrain_ann_index(spark, src,
                             os.path.join(str(tmp_path), "root"),
                             _cents(spark, range(0, 16, 4)))


def test_churn_dv_accumulation_and_compaction(spark, tmp_path):
    """Sustained update-heavy churn: refreshes accumulate dv
    tombstones in the cells table; compaction materializes them and
    the query answer stays identical to a from-scratch rebuild."""
    src = os.path.join(str(tmp_path), "src")
    root = os.path.join(str(tmp_path), "idx")
    merge = _src(spark, src)
    cents = _cents(spark, range(0, 16, 4))
    AI.build_ann_index_from_table(spark, src, root, cents)
    cells = f"{root}/{AI.CELLS_DIR}"
    for i in range(2, 5):  # 3 update commits, ~N/3 rows each
        upd = (_emb(spark, flip=i)
               .where(F.col("vec_id").cast("long") % 3 == i % 3))
        merge(upd, i)
        assert AI.refresh_ann_index(spark, src, root) is not None
    # a delete-heavy commit: removals with no additions landing in
    # their buckets stay as merge-on-read dv tombstones
    ing.delete_origins(spark, src,
                       _emb(spark).where(
                           F.col("vec_id").cast("long") % 7 == 1)
                       .select("vec_id"), strategy="dv")
    assert AI.refresh_ann_index(spark, src, root) is not None
    man = ing.read_table_manifest(spark, cells)
    dv_before = sum(ing._dv_rows(man).values())
    assert dv_before > 0  # churn left merge-on-read tombstones
    answer_churned = _topk(spark, root)
    ing.compact_table(spark, cells)
    man2 = ing.read_table_manifest(spark, cells)
    assert sum(ing._dv_rows(man2).values()) == 0  # dv materialized
    assert _topk(spark, root) == answer_churned
    # == a from-scratch rebuild over the final corpus state
    rebuilt = os.path.join(str(tmp_path), "rebuilt")
    AI.build_ann_index_from_table(spark, src, rebuilt, cents)
    assert _topk(spark, rebuilt) == answer_churned
