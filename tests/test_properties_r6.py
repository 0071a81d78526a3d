"""Round-6 property tests: latest-wins merge laws and a model-based
random-op sequence over the versioned table in latest_wins mode."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.streaming import ingest as ing


def _df(spark, rows):
    return spark.createDataFrame(rows, "origin string, payload string")


def test_upsert_latest_sequential_equals_last_writer(spark):
    """Folding batches through upsert_latest one at a time must equal
    'last writer per key' over the whole sequence."""
    from engagement_data_pipeline_spark.operators.dedup import upsert_latest

    rng = random.Random(7)
    keys = [f"k{i}" for i in range(12)]
    batches = [[(rng.choice(keys), f"b{b}_{i}") for i in range(6)]
               for b in range(5)]
    state = _df(spark, [])
    model: dict[str, str] = {}
    for rows in batches:
        state = upsert_latest(state, _df(spark, rows), ["origin"])
        # the model applies the same deterministic within-batch pick
        # (max payload per key) then overwrites
        per_key: dict[str, str] = {}
        for k, v in rows:
            per_key[k] = max(v, per_key.get(k, v))
        model.update(per_key)
    got = {r.origin: r.payload for r in state.collect()}
    assert got == model


def test_random_op_sequence_latest_wins_model(spark, tmp_path):
    """Random merges (latest_wins), deletes, compactions and retained
    vacuums against a plain dict model: after every op the table's
    visible state equals the model."""
    path = str(tmp_path / "t")
    merge = ing.foreach_batch_upsert(path, ["origin"], n_buckets=4,
                                     mode="latest_wins", txn_app_id="m")
    rng = random.Random(42)
    keys = [f"k{i}" for i in range(10)]
    model: dict[str, str] = {}
    batch_id = 0
    for step in range(14):
        op = rng.choice(["merge", "merge", "merge", "delete",
                         "compact", "vacuum"])
        if op == "merge" or not model:
            rows = [(rng.choice(keys), f"v{step}_{i}") for i in range(4)]
            merge(_df(spark, rows), batch_id)
            batch_id += 1
            per_key: dict[str, str] = {}
            for k, v in rows:
                per_key[k] = max(v, per_key.get(k, v))
            model.update(per_key)
        elif op == "delete":
            victims = rng.sample(sorted(model), max(1, len(model) // 3))
            ing.delete_origins(spark, path, _df(
                spark, [(k, "x") for k in victims]).select("origin"))
            for k in victims:
                model.pop(k, None)
        elif op == "compact":
            ing.compact_table(spark, path, vacuum=False)
        else:
            ing.vacuum_table(spark, path, keep_manifests=2,
                             retain_ms=3600 * 1000)
        got = {r.origin: r.payload
               for r in ing.read_merged_table(spark, path).collect()}
        assert got == model, f"diverged after step {step} ({op})"
    # the retained manifests' commits still time-travel correctly
    man = ing.read_table_manifest(spark, path)
    assert man["commit"] >= batch_id
