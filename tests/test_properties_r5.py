"""Hypothesis properties for the round-5 operators (SCD2, hamming
band join, quantization, batch planning)."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(max_examples=10, deadline=None,
               suppress_health_check=list(HealthCheck))


def _scd2_py(rows):
    """Reference SCD2: per key, compress consecutive equal states,
    emit [from, to) intervals."""
    out = {}
    by_key = {}
    for k, t, s in sorted(rows):
        by_key.setdefault(k, []).append((t, s))
    for k, hist in by_key.items():
        ivs = []
        for t, s in hist:
            if not ivs or ivs[-1][2] != s:
                ivs.append([t, None, s])
        for a, b in zip(ivs, ivs[1:]):
            a[1] = b[0]
        out[k] = [(f, to, s, to is None) for f, to, s in ivs]
    return out


@SET
@given(st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),
              st.integers(0, 50),
              st.sampled_from([None, "x", "y"])),
    min_size=1, max_size=25, unique_by=lambda r: (r[0], r[1])))
def test_scd2_matches_python_reference(spark, rows):
    from engagement_data_pipeline_spark.operators.cdc import \
        scd2_from_versions

    df = spark.createDataFrame(rows, "k string, t long, s string")
    got = {}
    for r in scd2_from_versions(df, ["k"], "t", ["s"]).collect():
        got.setdefault(r.k, []).append(
            (r.valid_from, r.valid_to, r.s, r.is_current))
    for k in got:
        got[k].sort(key=lambda iv: iv[0])
    assert got == _scd2_py(rows)


@SET
@given(st.lists(st.integers(0, (1 << 63) - 1),
                min_size=2, max_size=25, unique=True),
       st.integers(0, 2))
def test_hamming_pairs_equal_brute_force(spark, hashes, max_dist):
    from engagement_data_pipeline_spark.training.dedup import hamming_pairs

    df = spark.createDataFrame(list(enumerate(hashes)), "id long, h long")
    got = {(r.id_a, r.id_b, r.dist)
           for r in hamming_pairs(df, "id", "h",
                                  max_dist=max_dist).collect()}
    want = {(a, b, bin(ha ^ hb).count("1"))
            for (a, ha), (b, hb) in
            itertools.combinations(enumerate(hashes), 2)
            if bin(ha ^ hb).count("1") <= max_dist}
    assert got == want


@SET
@given(st.lists(st.lists(
    st.floats(-50, 50, allow_nan=False, width=32),
    min_size=3, max_size=3), min_size=2, max_size=20))
def test_quantize_roundtrip_bound(spark, vecs):
    from engagement_data_pipeline_spark.training.quantize import (
        dequant_error, quantize_fit)

    df = spark.createDataFrame(list(enumerate(vecs)),
                               "vec_id long, embedding array<float>")
    stats = quantize_fit(df, 3)
    mn, mx = stats.first()
    bound = max((b - a) / 510 for a, b in zip(mn, mx)) + 1e-9
    for r in dequant_error(df, stats, 3).collect():
        assert all(0 <= c <= 255 for c in r.codes)
        assert r.max_abs_err <= bound


@SET
@given(st.lists(st.integers(1, 300), min_size=1, max_size=60),
       st.integers(1, 7))
def test_batch_plan_partitions_every_doc_once(spark, lengths, batch_size):
    from engagement_data_pipeline_spark.training.packing import batch_plan

    docs = spark.createDataFrame(
        [(i, "w " * n) for i, n in enumerate(lengths)],
        "doc_id long, text string")
    out = batch_plan(docs, caps=(16, 64, 256), batch_size=batch_size,
                     n_shards=2).collect()
    assert sum(r.n_docs for r in out) == len(lengths)
    for r in out:
        assert 1 <= r.n_docs <= batch_size
        assert 0 <= r.padding_waste == r.bucket_cap * r.n_docs - r.sum_tokens
