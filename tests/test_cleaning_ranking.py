"""Unit tests for C4-style boilerplate-span removal and BM25 ranking
(training/cleaning.py, training/ranking.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.training.cleaning import (
    boilerplate_clean, doc_spans)
from engagement_data_pipeline_spark.training.ranking import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BOILER = "cookie notice accept all terms of service apply"


def test_doc_spans_lossless_segmentation(spark):
    docs = _docs(spark, [(1, "a b c d e f g h i j"), (2, "x"), (3, "")])
    spans = {(r.doc_id, r.span_idx): r.span
             for r in doc_spans(docs, span_words=4).collect()}
    assert spans[(1, 0)] == "a b c d"
    assert spans[(1, 1)] == "e f g h"
    assert spans[(1, 2)] == "i j"          # short remainder kept
    assert spans[(2, 0)] == "x"
    assert spans[(3, 0)] == ""             # empty doc → one empty span


def test_boilerplate_clean_removes_corpus_duplicates(spark):
    unique = ["alpha beta gamma delta epsilon zeta eta theta",
              "one two three four five six seven eight",
              "red green blue yellow purple orange pink grey"]
    rows = [(i, f"{BOILER} {u}") for i, u in enumerate(unique)]
    out = {r.doc_id: r for r in
           boilerplate_clean(_docs(spark, rows), span_words=8,
                             max_span_docs=2).collect()}
    # The boilerplate span appears in 3 docs (> 2): removed everywhere;
    # each doc keeps its unique 8 words.
    for i in range(3):
        assert out[i].n_spans == 2
        assert out[i].n_removed == 1
        assert out[i].clean_n_words == 8
    # Cleaned text is exactly the unique tail: md5 must match.
    import hashlib
    assert out[0].clean_md5 == hashlib.md5(unique[0].encode()).hexdigest()


def test_boilerplate_clean_below_threshold_keeps_everything(spark):
    rows = [(1, f"{BOILER} alpha beta"), (2, f"{BOILER} gamma delta")]
    out = boilerplate_clean(_docs(spark, rows), span_words=8,
                            max_span_docs=2)
    assert out.agg(F.sum("n_removed")).collect()[0][0] == 0


def test_boilerplate_clean_fully_boilerplate_doc(spark):
    rows = [(i, BOILER) for i in range(4)]
    out = {r.doc_id: r for r in
           boilerplate_clean(_docs(spark, rows), span_words=8,
                             max_span_docs=2).collect()}
    import hashlib
    for i in range(4):
        assert out[i].n_removed == 1
        assert out[i].clean_n_words == 0
        assert out[i].clean_md5 == hashlib.md5(b"").hexdigest()


def _bm25_fixture(spark):
    return _docs(spark, [
        (1, "spark table spark table spark"),
        (2, "spark filter scan row merge"),
        (3, "table scan scan scan batch window"),
        (4, "merge batch merge batch value key"),
        (5, "value key row column group sort"),
    ])


def test_bm25_ranks_term_frequency(spark):
    out = bm25_topk(_bm25_fixture(spark), {"q": ["spark"]}, k=3).collect()
    assert [r.doc_id for r in out] == [1, 2]   # doc 1 has tf=3
    assert out[0].score > out[1].score
    assert [r.rank for r in out] == [1, 2]


def test_bm25_rare_term_outweighs_common(spark):
    # "sort" df=1, "spark" df=2 → for equal tf, rarer term scores higher.
    out = {r.query_id: r for r in
           bm25_topk(_bm25_fixture(spark),
                     {"qa": ["sort"], "qb": ["spark"]}, k=1).collect()}
    assert out["qa"].score > out["qb"].score


def test_bm25_log_idf_variant_same_ranking(spark):
    docs = _bm25_fixture(spark)
    q = {"q": ["scan"], "r": ["merge"]}
    rational = bm25_topk(docs, q, k=5).collect()
    logged = bm25_topk(docs, q, k=5, log_idf=True).collect()
    order_r = [(r.query_id, r.rank, r.doc_id) for r in rational]
    order_l = [(r.query_id, r.rank, r.doc_id) for r in logged]
    assert sorted(order_r) == sorted(order_l)
    for r in logged:
        assert math.isfinite(r.score)


def test_bm25_multi_term_sums_per_term_weights(spark):
    docs = _bm25_fixture(spark)
    single_a = {(r.doc_id): r.score
                for r in bm25_topk(docs, {"q": ["merge"]}, k=5).collect()}
    single_b = {(r.doc_id): r.score
                for r in bm25_topk(docs, {"q": ["batch"]}, k=5).collect()}
    both = {(r.doc_id): r.score
            for r in bm25_topk(docs, {"q": ["batch", "merge"]},
                               k=5).collect()}
    for doc_id, s in both.items():
        expect = single_a.get(doc_id, 0.0) + single_b.get(doc_id, 0.0)
        assert abs(s - expect) < 1e-12


# --- PMI collocations -----------------------------------------------------

def test_pmi_prefers_exclusive_pairs(spark):
    """A pair that always co-occurs outranks a pair of independently
    frequent words."""
    from engagement_data_pipeline_spark.training.collocations import (
        pmi_collocations)

    rows = [(i, "hong kong is big and big and busy") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pmi_collocations(docs, min_count=5, k=5).collect()
    top = (out[0]["w1"], out[0]["w2"])
    assert top == ("hong", "kong")
    scores = {(r["w1"], r["w2"]): r["pmi_ratio"] for r in out}
    assert scores[("hong", "kong")] > scores.get(("and", "big"), 0.0)


def test_pmi_min_count_filters(spark):
    from engagement_data_pipeline_spark.training.collocations import (
        pmi_collocations)

    docs = spark.createDataFrame(
        [(1, "rare pair here"), (2, "other words")],
        "doc_id long, text string")
    assert pmi_collocations(docs, min_count=2, k=10).count() == 0


def test_indexed_bm25_equals_direct(spark, tmp_path):
    from engagement_data_pipeline_spark.training.ranking import (
        bm25_topk, bm25_topk_indexed, build_text_index)

    docs = spark.createDataFrame(
        [(1, "spark shuffles data across the cluster"),
         (2, "the cluster runs spark jobs"),
         (3, "ducks swim on the pond"),
         (4, "spark spark spark everywhere")],
        "doc_id long, text string")
    queries = {"q1": ["spark", "cluster"], "q2": ["pond"]}
    direct = bm25_topk(docs, queries, k=3).orderBy(
        "query_id", "rank").collect()
    path = str(tmp_path / "idx")
    build_text_index(docs, path, n_term_buckets=4)
    indexed = bm25_topk_indexed(spark, path, queries, k=3).orderBy(
        "query_id", "rank").collect()
    assert direct == indexed
