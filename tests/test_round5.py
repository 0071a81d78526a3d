"""Round-5 operators: GDPR delete on the versioned merge table, SCD
Type-2 build, RRF hybrid fusion, length-bucketed batch planning, and
int8 embedding quantization."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from engagement_data_pipeline_spark.operators.cdc import scd2_from_versions
from engagement_data_pipeline_spark.streaming.ingest import (
    delete_origins, foreach_batch_upsert, read_merged_table, read_table_at,
    table_changes, vacuum_table)
from engagement_data_pipeline_spark.training.packing import batch_plan
from engagement_data_pipeline_spark.training.quantize import (
    dequant_error, quantize_codes, quantize_fit)
from engagement_data_pipeline_spark.training.ranking import rrf_fuse


# --- delete_origins -------------------------------------------------------

def _mk_table(spark, tmp_path, rows, n_buckets=4):
    table = str(tmp_path / "table")
    merge = foreach_batch_upsert(table, ["origin"], n_buckets=n_buckets)
    merge(spark.createDataFrame(rows, "origin string, payload string"), 0)
    return table


def _files(table):
    return {p: os.path.getmtime(p) for p in
            glob.glob(f"{table}/v*/bucket=*/*.parquet")}


def test_delete_removes_only_named_keys(spark, tmp_path):
    rows = [(f"k{i}", f"p{i}") for i in range(20)]
    table = _mk_table(spark, tmp_path, rows)
    keys = spark.createDataFrame([("k3",), ("k7",), ("missing",)],
                                 "origin string")
    commit = delete_origins(spark, table, keys)
    assert commit == 2
    left = {r.origin for r in read_merged_table(spark, table).collect()}
    assert left == {f"k{i}" for i in range(20)} - {"k3", "k7"}


def test_delete_leaves_untouched_buckets_byte_identical(spark, tmp_path):
    rows = [(f"k{i}", f"p{i}") for i in range(40)]
    table = _mk_table(spark, tmp_path, rows, n_buckets=8)
    before = _files(table)
    keys = spark.createDataFrame([("k0",)], "origin string")
    delete_origins(spark, table, keys)
    after = _files(table)
    # every pre-delete file still exists unmodified (immutability);
    # the delete only ADDED a new version dir for the one hit bucket
    assert set(before) <= set(after)
    assert all(after[p] == before[p] for p in before)
    new_dirs = {p.split("/bucket=")[0] for p in set(after) - set(before)}
    assert len(new_dirs) == 1


def test_delete_drops_fully_emptied_bucket_from_manifest(spark, tmp_path):
    from engagement_data_pipeline_spark.streaming.ingest import (
        origin_bucket, read_table_manifest)

    rows = [(f"k{i}", f"p{i}") for i in range(30)]
    table = _mk_table(spark, tmp_path, rows)
    df = spark.createDataFrame(rows, "origin string, payload string")
    target = (df.select("origin",
                        origin_bucket(["origin"], 4).alias("b"))
              .where(F.col("b") == 2))
    n_in_bucket = target.count()
    assert n_in_bucket > 0
    delete_origins(spark, table, target.select("origin"))
    man = read_table_manifest(spark, table)
    assert 2 not in man["buckets"]
    assert read_merged_table(spark, table).count() == 30 - n_in_bucket


def test_delete_feeds_cdc_and_time_travel_then_vacuum_erases(spark, tmp_path):
    rows = [(f"k{i}", f"p{i}") for i in range(10)]
    table = _mk_table(spark, tmp_path, rows)
    keys = spark.createDataFrame([("k1",), ("k2",)], "origin string")
    delete_origins(spark, table, keys)
    feed = table_changes(spark, table, from_commit=1, to_commit=2)
    got = {(r.origin, r.op) for r in feed.collect()}
    assert got == {("k1", "delete"), ("k2", "delete")}
    # pre-delete commit still readable (retention trade)...
    assert read_table_at(spark, table, 1).count() == 10
    # ...until vacuum, which is the physical-erasure step
    vacuum_table(spark, table, keep_manifests=1)
    with pytest.raises(Exception):
        read_table_at(spark, table, 1).collect()


def test_delete_requires_existing_table(spark, tmp_path):
    keys = spark.createDataFrame([("k",)], "origin string")
    with pytest.raises(ValueError):
        delete_origins(spark, str(tmp_path / "nope"), keys)


# --- SCD Type-2 -----------------------------------------------------------

_V = "k string, t long, s string"


def test_scd2_compresses_and_tiles(spark):
    rows = [
        ("a", 1, "x"), ("a", 2, "x"), ("a", 3, "y"), ("a", 4, "y"),
        ("a", 5, "x"),
        ("b", 10, None), ("b", 11, None), ("b", 12, "z"),
        ("c", 7, "only"),
    ]
    out = scd2_from_versions(spark.createDataFrame(rows, _V),
                             ["k"], "t", ["s"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.k, []).append(
            (r.valid_from, r.valid_to, r.s, r.is_current))
    assert by_key["a"] == [(1, 3, "x", False), (3, 5, "y", False),
                           (5, None, "x", True)]
    # NULL == NULL must compress (null-safe compare)
    assert by_key["b"] == [(10, 12, None, False), (12, None, "z", True)]
    assert by_key["c"] == [(7, None, "only", True)]
    # exactly one current row per key; intervals half-open + gapless
    for ivs in by_key.values():
        assert sum(1 for iv in ivs if iv[3]) == 1
        for (f1, t1, _, _), (f2, _, _, _) in zip(ivs, ivs[1:]):
            assert t1 == f2


def test_scd2_multi_state_columns(spark):
    rows = [("a", 1, "x", 1), ("a", 2, "x", 2), ("a", 3, "x", 2)]
    out = scd2_from_versions(
        spark.createDataFrame(rows, "k string, t long, s string, v long"),
        ["k"], "t", ["s", "v"]).collect()
    assert [(r.valid_from, r.valid_to) for r in
            sorted(out, key=lambda r: r.valid_from)] == [(1, 2), (2, None)]


# --- RRF fusion -----------------------------------------------------------

_RANK = "query_id string, doc_id long, rank int"


def test_rrf_scores_and_single_list_docs(spark):
    lex = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], _RANK)
    sem = spark.createDataFrame(
        [("q", 2, 1), ("q", 3, 2)], _RANK)
    out = {r.doc_id: (r.rrf_score, r.rank)
           for r in rrf_fuse([lex, sem], k0=60).collect()}
    assert out[2][0] == pytest.approx(1 / 62 + 1 / 61)
    assert out[1][0] == pytest.approx(1 / 61)
    assert out[3][0] == pytest.approx(1 / 62)
    # doc in both lists outranks docs in one
    assert out[2][1] == 1
    # tie (docs 1 and 3 differ) -> strict order by score then id
    assert out[1][1] == 2 and out[3][1] == 3


def test_rrf_k_truncates(spark):
    lex = spark.createDataFrame(
        [("q", d, r) for r, d in enumerate([5, 6, 7], 1)], _RANK)
    out = rrf_fuse([lex], k0=60, k=2).collect()
    assert len(out) == 2


# --- batch_plan -----------------------------------------------------------

def test_batch_plan_invariants(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (3 + (i * 7) % 200)) for i in range(300)],
        "doc_id long, text string")
    out = batch_plan(docs, caps=(8, 32, 128), batch_size=4,
                     n_shards=2).collect()
    # every doc lands in exactly one batch
    assert sum(r.n_docs for r in out) == 300
    for r in out:
        assert r.n_docs <= 4
        assert r.padding_waste == r.bucket_cap * r.n_docs - r.sum_tokens
        assert r.padding_waste >= 0
        assert r.bucket_cap in (8, 32, 128)
    # at most one ragged batch per (cap, shard)
    ragged = {}
    for r in out:
        if r.n_docs < 4:
            ragged[(r.bucket_cap, r.shard)] = \
                ragged.get((r.bucket_cap, r.shard), 0) + 1
    assert all(v == 1 for v in ragged.values())


def test_batch_plan_truncates_over_cap(spark):
    docs = spark.createDataFrame([(1, "w " * 500)],
                                 "doc_id long, text string")
    [r] = batch_plan(docs, caps=(8, 16), batch_size=4, n_shards=1).collect()
    assert r.bucket_cap == 16 and r.sum_tokens == 16 and r.padding_waste == 0


# --- int8 quantization ----------------------------------------------------

def _emb(spark):
    rows = [(i, [float(i % 7) - 3.0, float(i) / 10.0, 5.0])
            for i in range(50)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_quantize_codes_in_range_and_constant_dim(spark):
    emb = _emb(spark)
    stats = quantize_fit(emb, 3)
    out = quantize_codes(emb, stats, 3).collect()
    for r in out:
        assert all(0 <= c <= 255 for c in r.codes)
        assert r.codes[2] == 0  # constant dimension -> code 0, not NaN
    # monotone: larger value -> larger-or-equal code in that dim
    by_id = {r.vec_id: r.codes for r in out}
    assert by_id[40][1] >= by_id[10][1]


def test_dequant_error_bound(spark):
    emb = _emb(spark)
    stats = quantize_fit(emb, 3)
    mn, mx = stats.first()
    spans = [b - a for a, b in zip(mn, mx)]
    bound = max(s / 510 for s in spans) + 1e-9
    for r in dequant_error(emb, stats, 3).collect():
        assert r.max_abs_err <= bound


# --- PCA on exact sufficient statistics -----------------------------------

def _pca_corpus(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    base = rng.randn(120, 3) @ np.diag([5.0, 1.0, 0.1])
    rows = [(i, [float(x) for x in base[i]]) for i in range(120)]
    return (spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
            base.astype("float32").astype("float64"))


def test_pca_fit_matches_numpy_and_is_partition_invariant(spark):
    import numpy as np
    from engagement_data_pipeline_spark.training.pca import (PCA_MICRO,
                                                             pca_fit)

    emb, x = _pca_corpus(spark)
    model = pca_fit(emb, 3, 2)
    # numpy reference on the same quantized values
    q = np.floor(x * PCA_MICRO)
    cov = np.cov(q, rowvar=False) / PCA_MICRO ** 2
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    assert model["explained_variance"] == pytest.approx(evals[:2].tolist())
    assert (model["explained_variance"][0]
            > model["explained_variance"][1])
    comps = np.array(model["components"])
    assert np.allclose(comps @ comps.T, np.eye(2), atol=1e-9)
    # exact partition invariance: integer statistics cannot drift
    model2 = pca_fit(emb.repartition(7), 3, 2)
    assert model2 == model


def test_pca_project_centers_and_projects(spark):
    import numpy as np
    from engagement_data_pipeline_spark.training.pca import (pca_fit,
                                                             pca_project)

    emb, x = _pca_corpus(spark)
    model = pca_fit(emb, 3, 2)
    got = {r.vec_id: r.scores for r in pca_project(emb, model).collect()}
    w = np.array(model["components"])
    mean = np.array(model["mean"])
    for i in range(0, 120, 17):
        ref = w @ (x[i] - mean)
        assert got[i] == pytest.approx(ref.tolist(), abs=1e-6)
    # projected scores are near-uncorrelated with variance ~ eigvals
    s = np.array([got[i] for i in range(120)])
    pcov = np.cov(s, rowvar=False)
    assert abs(pcov[0, 1]) < 1e-2


# --- Fellegi-Sunter linkage ----------------------------------------------

def test_fs_link_scores_and_decisions(spark):
    from engagement_data_pipeline_spark.operators.linkage import fs_link

    left = spark.createDataFrame(
        [("b1", 1, "alice", "NY"), ("b1", 2, "bob", "LA")],
        "blk string, id long, name string, city string")
    right = spark.createDataFrame(
        [("b1", 10, "alice", "NY"), ("b1", 20, "carol", "SF")],
        "blk string, id long, name string, city string")
    mu = {"name": (0.9, 0.1), "city": (0.8, 0.2)}
    out = fs_link(left, right, ["blk"],
                  {"name": lambda: F.col("l_name") == F.col("r_name"),
                   "city": lambda: F.col("l_city") == F.col("r_city")},
                  mu, match_threshold=30.0, possible_threshold=1.0)
    got = {(r.l_id, r.r_id): (r.score, r.decision) for r in out.collect()}
    assert len(got) == 4  # full block product
    assert got[(1, 10)][0] == pytest.approx(9.0 * 4.0)
    assert got[(1, 10)][1] == "match"
    assert got[(2, 20)][1] == "non_match"
    # both-fields-disagree pairs share the same (lowest) score
    s_low = (1 - 0.9) / (1 - 0.1) * ((1 - 0.8) / (1 - 0.2))
    assert got[(2, 10)][0] == pytest.approx(s_low)
    assert got[(1, 20)][0] == pytest.approx(s_low)


def test_cust_linkage_separates_true_pairs_from_decoys(spark):
    from engagement_data_pipeline_spark.queries.linkage_q import cust_linkage

    # sf0.01: decoys need id pairs 1000 apart in one nation
    out = cust_linkage(spark, "/root/testdata/sf0.01").collect()
    true_pairs = [r for r in out if r.clean_key == r.dirty_key]
    decoys = [r for r in out if r.clean_key != r.dirty_key]
    assert true_pairs and decoys
    # every true pair agrees on the ed<=1 name (the injected typo is
    # ed 1); decoys MAY too (ids 1000 apart differ by one digit) —
    # balance is what separates them, and no decoy crosses 'match'
    assert all(r.agree_name for r in true_pairs)
    assert not any(r.agree_balance for r in decoys)
    assert not any(r.decision == "match" for r in decoys)
    # a typo'd name alone cannot demote a true pair below 'possible'
    assert all(r.decision in ("match", "possible") for r in true_pairs)
    # decisions are monotone in score
    lo = min(r.score for r in true_pairs if r.decision == "match")
    assert all(r.score < lo for r in out if r.decision != "match")


# --- BPE tokenizer fit ----------------------------------------------------

def _bpe_docs(spark, corpus):
    return spark.createDataFrame([(1, corpus)], "doc_id long, text string")


def test_bpe_learns_canonical_merges(spark):
    from engagement_data_pipeline_spark.training.bpe import bpe_fit

    corpus = ("low " * 5 + "lower " * 2 + "newest " * 6
              + "widest " * 3).strip()
    merges, _ = bpe_fit(_bpe_docs(spark, corpus), 5)
    got = [(m["left"], m["right"]) for m in merges]
    # the Sennrich et al. worked example (with </w> markers)
    assert got == [("e", "s"), ("es", "t"), ("est", "</w>"),
                   ("l", "o"), ("lo", "w")]
    assert merges[0]["pair_count"] == 9  # 6x newest + 3x widest


def test_bpe_greedy_overlap_is_leftmost_nonoverlapping(spark):
    from engagement_data_pipeline_spark.training.bpe import (bpe_encode,
                                                             bpe_fit)

    merges, _ = bpe_fit(_bpe_docs(spark, "aaaa aaaa aaa"), 1)
    assert (merges[0]["left"], merges[0]["right"]) == ("a", "a")
    [r] = bpe_encode(_bpe_docs(spark, "aaaaa"), merges).collect()
    # 5 a's -> aa aa a (never aa a aa or overlapping merges)
    assert r.tokens == ["aa", "aa", "a", "</w>"]


def test_bpe_encode_conserves_text(spark):
    from engagement_data_pipeline_spark.training.bpe import (END_OF_WORD,
                                                             bpe_encode,
                                                             bpe_fit)

    corpus = "the quick brown fox the quick fox"
    merges, _ = bpe_fit(_bpe_docs(spark, corpus), 6)
    [r] = bpe_encode(_bpe_docs(spark, corpus), merges).collect()
    joined = "".join(t for t in r.tokens)
    assert joined.replace(END_OF_WORD, " ").strip() == corpus
    # more merges -> never more tokens
    merges2, _ = bpe_fit(_bpe_docs(spark, corpus), 2)
    [r2] = bpe_encode(_bpe_docs(spark, corpus), merges2).collect()
    assert len(r.tokens) <= len(r2.tokens)


# --- k-anonymity suppression ----------------------------------------------

def test_suppress_small_groups(spark):
    from engagement_data_pipeline_spark.operators.privacy import (
        SUPPRESSED, suppress_small_groups)

    dist = spark.createDataFrame(
        [("f1", "a", 10), ("f1", "b", 2), ("f1", "c", 4),
         ("f2", "x", 7), ("f2", "y", 1),
         ("f3", "z", 2)],
        "field string, code string, n long")
    out = suppress_small_groups(dist, ["field"], "code", "n", 5).collect()
    by = {(r.field, r.code): r.n for r in out}
    assert by[("f1", "a")] == 10 and by[("f2", "x")] == 7
    # f1 small cells (2+4=6 >= k) publish as a rollup with the total
    assert by[("f1", SUPPRESSED)] == 6
    # f2/f3 rollups are below k -> count withheld (NULL), row present
    assert by[("f2", SUPPRESSED)] is None
    assert by[("f3", SUPPRESSED)] is None
    # no published non-rollup cell is ever below k
    assert all(n >= 5 for (f, c), n in by.items() if c != SUPPRESSED)
    # totals reconcile where the rollup is published
    assert sum(n for (f, c), n in by.items() if f == "f1") == 16


# --- incremental BM25 index maintenance -----------------------------------

def _score_map(df):
    return {(r.query_id, r.doc_id): r.score for r in df.collect()}


def test_incremental_index_equals_rebuild_and_survives_compaction(
        spark, tmp_path):
    from engagement_data_pipeline_spark.training.ranking import (
        bm25_topk, bm25_topk_indexed, build_text_index,
        compact_text_index, update_text_index)

    docs = [(1, "spark merges tables"), (2, "duck reads fast"),
            (3, "spark scans fast"), (4, "merge batch spark")]
    d = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string")
    queries = {"q": ["spark", "fast"]}
    idx = str(tmp_path / "idx")

    build_text_index(d(docs[:2]), idx)
    # delta 1: insert docs 3-4; delta 2: update doc 1, delete doc 2
    update_text_index(spark, idx, new_docs=d(docs[2:]), removed_docs=None)
    new1 = (1, "spark merges fast tables")
    update_text_index(spark, idx, new_docs=d([new1]),
                      removed_docs=d([docs[0], docs[1]]))

    final = [new1, docs[2], docs[3]]
    want = _score_map(bm25_topk(d(final), queries))
    got = _score_map(bm25_topk_indexed(spark, idx, queries))
    assert got == want  # bit-identical scores, not approx

    compact_text_index(spark, idx)
    import glob
    assert not glob.glob(f"{idx}/deltas/*")
    assert _score_map(bm25_topk_indexed(spark, idx, queries)) == want


def test_incremental_index_delete_only_delta(spark, tmp_path):
    from engagement_data_pipeline_spark.training.ranking import (
        bm25_topk, bm25_topk_indexed, build_text_index, update_text_index)

    rows = [(i, f"doc number {i} spark") for i in range(6)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    idx = str(tmp_path / "idx2")
    build_text_index(d, idx)
    update_text_index(spark, idx, new_docs=None,
                      removed_docs=d.where("doc_id >= 4"))
    queries = {"q": ["spark"]}
    want = _score_map(bm25_topk(d.where("doc_id < 4"), queries))
    assert _score_map(bm25_topk_indexed(spark, idx, queries)) == want


# --- perceptual hash + hamming band join ----------------------------------

def test_hamming_pairs_exact_vs_brute_force(spark):
    import itertools
    import random

    from engagement_data_pipeline_spark.training.dedup import hamming_pairs

    rng = random.Random(11)
    rows = [(i, rng.getrandbits(63)) for i in range(80)]
    # plant near-dups: flip <=3 bits of row 0's hash
    rows += [(100 + k, rows[0][1] ^ (1 << (5 * k + 1)) ^ (k and 1 << 50))
             for k in range(3)]
    df = spark.createDataFrame(rows, "id long, h long")
    got = {(r.id_a, r.id_b, r.dist)
           for r in hamming_pairs(df, "id", "h", max_dist=3).collect()}
    want = {(a, b, bin(ha ^ hb).count("1"))
            for (a, ha), (b, hb) in itertools.combinations(rows, 2)
            if bin(ha ^ hb).count("1") <= 3}
    assert got == want  # pigeonhole: banding loses nothing
    assert want  # the planted near-dups are actually found

    import pytest as _pytest
    with _pytest.raises(ValueError):
        hamming_pairs(df, "id", "h", max_dist=4, n_bands=4)


def test_phash_kernel_is_locality_sensitive(spark):
    from engagement_data_pipeline_spark.training.multimodal import (
        perceptual_hash_bytes)

    base = bytes([97, 122] * 32)
    tweaked = bytearray(base)
    tweaked[10] = 122  # flip one sampled byte upward
    far = bytes([122, 97] * 32)
    h0 = perceptual_hash_bytes(base)
    h1 = perceptual_hash_bytes(bytes(tweaked))
    h2 = perceptual_hash_bytes(far)
    assert bin(h0 ^ h1).count("1") <= 2
    assert bin(h0 ^ h2).count("1") > 20
    assert 0 <= h0 < (1 << 63)
    assert perceptual_hash_bytes(b"") == 0


# --- schema drift + corrupt-record ingest ---------------------------------

def test_schema_drift_report(spark):
    from engagement_data_pipeline_spark.operators.profile import schema_drift

    old = spark.createDataFrame([], "a int, b string, c double")
    new = spark.createDataFrame([], "a long, b string, d boolean")
    got = {d["column"]: d["change"] for d in schema_drift(old, new)}
    assert got == {"a": "type_changed", "d": "added", "c": "removed"}
    assert schema_drift(old, old) == []


def test_csv_permissive_corrupt_records(spark, tmp_path):
    # PERMISSIVE ingest posture: malformed rows land in the rescue
    # column instead of failing the 100 TB load or silently vanishing
    p = tmp_path / "in.csv"
    p.write_text("sender,amount\nalice,3\nbob,notanumber\ncarol,5\n")
    df = (spark.read.schema(
            "sender string, amount int, _corrupt_record string")
          .option("header", True)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .csv(str(p))).cache()
    ok = df.where("_corrupt_record IS NULL")
    bad = df.where("_corrupt_record IS NOT NULL")
    assert {r.sender for r in ok.collect()} == {"alice", "carol"}
    assert [r._corrupt_record for r in bad.collect()] == ["bob,notanumber"]


# --- columnar format round-trips ------------------------------------------

def test_orc_roundtrip_preserves_nested_types(spark, tmp_path):
    # ORC is the second built-in columnar format Spark ships; the
    # engine's tables must survive it with nested labels intact
    rows = [(1, ["a", "b"], {"scheme": "s1", "checked": True}),
            (2, [], {"scheme": None, "checked": False})]
    df = spark.createDataFrame(
        rows, "id long, tags array<string>, "
              "label struct<scheme: string, checked: boolean>")
    path = str(tmp_path / "orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == df.schema
    assert sorted([r.asDict() for r in back.collect()],
                  key=lambda d: d["id"]) == \
        sorted([r.asDict() for r in df.collect()], key=lambda d: d["id"])
    # predicate pushdown reaches the ORC scan too
    plan = back.where("id = 1")._jdf.queryExecution().executedPlan().toString()
    assert "orc" in plan.lower()


# --- table history --------------------------------------------------------

def test_table_history_reports_ops_and_write_amplification(spark, tmp_path):
    from engagement_data_pipeline_spark.streaming.ingest import (
        compact_table, table_history)

    rows = [(f"k{i}", f"p{i}") for i in range(20)]
    table = _mk_table(spark, tmp_path, rows)          # commit 1: merge
    keys = spark.createDataFrame([("k3",)], "origin string")
    delete_origins(spark, table, keys)                # commit 2: delete
    compact_table(spark, table, vacuum=False)         # commit 3: compact
    hist = table_history(spark, table).collect()
    assert [(r.commit, r.op) for r in hist] == \
        [(3, "compact"), (2, "delete"), (1, "merge")]
    # compaction touches every bucket; the delete only the key's one
    assert hist[0].n_buckets_touched == hist[0].n_buckets_total
    assert hist[1].n_buckets_touched == 1
    assert all(r.ts_ms is not None for r in hist)


# --- shallow clone --------------------------------------------------------

def test_clone_is_zero_copy_and_diverges_copy_on_write(spark, tmp_path):
    from engagement_data_pipeline_spark.streaming.ingest import (
        clone_table, compact_table, read_merged_table, table_history,
        vacuum_table)

    rows = [(f"k{i}", f"p{i}") for i in range(20)]
    src = _mk_table(spark, tmp_path, rows)
    dst = str(tmp_path / "clone")
    clone_table(spark, src, dst)

    # zero data copied: the clone holds ONLY its manifest
    assert not glob.glob(f"{dst}/v*"), "clone must not copy data"
    assert {r.origin for r in read_merged_table(spark, dst).collect()} == \
        {f"k{i}" for i in range(20)}
    assert table_history(spark, dst).first().op == "clone"

    # copy-on-write divergence: delete on the clone...
    keys = spark.createDataFrame([("k1",)], "origin string")
    delete_origins(spark, dst, keys)
    assert {r.origin for r in read_merged_table(spark, dst).collect()} == \
        {f"k{i}" for i in range(20)} - {"k1"}
    # ...never touches the source
    assert {r.origin for r in read_merged_table(spark, src).collect()} == \
        {f"k{i}" for i in range(20)}
    # the clone now holds exactly its one rewritten bucket locally
    assert len(glob.glob(f"{dst}/v*")) == 1

    # vacuum on the clone is safe for the source; compaction then
    # materializes the clone fully local
    vacuum_table(spark, dst, keep_manifests=1)
    assert read_merged_table(spark, src).count() == 20
    compact_table(spark, dst)
    from engagement_data_pipeline_spark.streaming.ingest import \
        read_table_manifest
    assert "bases" not in read_table_manifest(spark, dst)
    assert read_merged_table(spark, dst).count() == 19


# --- one-call curation pipeline -------------------------------------------

def test_curate_corpus_end_to_end(spark, tmp_path):
    from engagement_data_pipeline_spark.training.pipeline import \
        curate_corpus

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n0 = base.count()
    # inject: an exact duplicate of doc 0, a short junk doc, and use
    # doc 1's text as an eval probe (decontamination must drop doc 1)
    d0 = base.where("doc_id = 0").first()
    extra = spark.createDataFrame(
        [(100000, d0.text, d0.lang, d0.source, d0.n_chars),
         (100001, "x y", d0.lang, d0.source, 3)],
        base.schema)
    docs = base.unionByName(extra)
    probes = spark.createDataFrame(
        [(1, base.where("doc_id = 1").first().text)],
        "doc_id long, text string")

    out = str(tmp_path / "curated")
    run = curate_corpus(docs, out, min_words=5, probes=probes)
    rep = {r.doc_id: (r.disposition, r.split)
           for r in run.report.collect()}
    assert len(rep) == n0 + 2  # every input row accounted for
    assert rep[100001][0] == "dropped_quality"
    # the injected exact dup loses to the lower original id
    assert rep[100000][0] in ("dropped_exact_duplicate",
                              "dropped_near_duplicate")
    assert rep[0][0] == "kept"
    assert rep[1][0] == "dropped_contaminated"
    # kept rows have splits; dropped rows don't
    assert all((d == "kept") == (s is not None)
               for d, s in rep.values())

    # written corpus is split-partitioned, text is the scrubbed text
    corpus = spark.read.parquet(f"{out}/corpus")
    assert set(corpus.columns) >= {"doc_id", "text", "split",
                                   "n_pii_redactions"}
    assert corpus.count() == sum(1 for d, _ in rep.values() if d == "kept")
    import glob as g
    assert g.glob(f"{out}/corpus/split=*")

    # stats reconcile with the report
    stats = {r.disposition: r.n_docs for r in run.stats.collect()}
    from collections import Counter
    assert stats == dict(Counter(d for d, _ in rep.values()))


# --- transactional replay skip --------------------------------------------

def test_txn_tracking_skips_replays_and_protects_deletes(spark, tmp_path):
    from engagement_data_pipeline_spark.streaming.ingest import (
        read_table_manifest, table_history)

    table = str(tmp_path / "table")
    merge = foreach_batch_upsert(table, ["origin"], n_buckets=2,
                                 txn_app_id="stream-A")
    d = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "origin string, payload string")
    merge(d([("k1", "p1"), ("k2", "p2")]), 0)
    merge(d([("k3", "p3")]), 1)
    assert read_table_manifest(spark, table)["commit"] == 2

    # replaying batch 1 after a checkpoint restart: NO new commit
    merge(d([("k3", "p3")]), 1)
    assert read_table_manifest(spark, table)["commit"] == 2

    # delete k1, then replay batch 0 (which inserted it): the txn
    # watermark must keep the replay from resurrecting the row
    delete_origins(spark, table,
                   spark.createDataFrame([("k1",)], "origin string"))
    merge(d([("k1", "p1"), ("k2", "p2")]), 0)
    left = {r.origin for r in read_merged_table(spark, table).collect()}
    assert left == {"k2", "k3"}

    # a NEW batch id still applies, and history shows no extra commits
    merge(d([("k4", "p4")]), 2)
    assert {r.origin
            for r in read_merged_table(spark, table).collect()} == \
        {"k2", "k3", "k4"}
    assert [r.op for r in table_history(spark, table).collect()] == \
        ["merge", "delete", "merge", "merge"]


def test_clone_refuses_existing_destination(spark, tmp_path):
    from engagement_data_pipeline_spark.streaming.ingest import clone_table

    src = _mk_table(spark, tmp_path, [("k1", "p1")])
    dst = _mk_table(spark, tmp_path / "other", [("k2", "p2")])
    with pytest.raises(ValueError):
        clone_table(spark, src, dst)


# --- model-based merge-table check ----------------------------------------

def test_merge_table_random_op_sequences_match_dict_model(spark, tmp_path):
    """Random interleavings of merge / delete / compact / rebucket
    against a plain-dict model: after every operation the committed
    table must equal the model exactly (existing-wins upserts,
    physical deletes). Catches cross-op interactions no single-op
    test sees — manifest bases, emptied buckets, txn carry-through."""
    import random

    from engagement_data_pipeline_spark.streaming.ingest import (
        compact_table, rebucket_table)

    rng = random.Random(29)
    table = str(tmp_path / "model")
    merge = foreach_batch_upsert(table, ["origin"], n_buckets=4,
                                 txn_app_id="model")
    model: dict[str, str] = {}
    batch_id = 0
    keys = [f"k{i}" for i in range(30)]

    def check():
        got = {(r.origin, r.payload)
               for r in read_merged_table(spark, table).collect()}
        assert got == set(model.items())

    for step in range(14):
        op = rng.choice(["merge", "merge", "merge", "delete",
                         "compact", "rebucket"])
        if op == "merge" or not model:
            rows = [(k, f"v{step}") for k in rng.sample(keys, 6)]
            merge(spark.createDataFrame(
                rows, "origin string, payload string"), batch_id)
            batch_id += 1
            for k, v in rows:
                model.setdefault(k, v)  # existing-wins
        elif op == "delete":
            del_keys = rng.sample(sorted(model), min(4, len(model)))
            delete_origins(spark, table, spark.createDataFrame(
                [(k,) for k in del_keys], "origin string"))
            for k in del_keys:
                model.pop(k)
        elif op == "compact":
            compact_table(spark, table)
        else:
            rebucket_table(spark, table, rng.choice([2, 4, 8]))
        check()


# --- CDF -> incremental index composition ---------------------------------

def test_change_feed_drives_index_maintenance(spark, tmp_path):
    """The intended production wiring: the versioned merge table's
    change feed is the ONLY input the LSM text index needs — inserts
    come from the feed's new payloads, and removed docs' old text
    comes from the pre-change snapshot via time travel (O(changed
    buckets) there). After each refresh, index-served BM25 must equal
    direct scoring of the table's current state."""
    from engagement_data_pipeline_spark.streaming.ingest import (
        read_table_at, table_changes)
    from engagement_data_pipeline_spark.training.ranking import (
        bm25_topk, bm25_topk_indexed, build_text_index, update_text_index)

    table = str(tmp_path / "docs")
    idx = str(tmp_path / "idx")
    merge = foreach_batch_upsert(table, ["origin"], n_buckets=2)
    d = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "origin string, doc_id long, text string")
    queries = {"q": ["spark", "merge"]}

    merge(d([("a", 1, "spark merges tables"),
             ("b", 2, "ducks read fast")]), 0)
    build_text_index(read_merged_table(spark, table), idx)

    # commit 2: one new doc + one replayed (must not re-index)
    merge(d([("b", 2, "ducks read fast"),
             ("c", 3, "merge spark batches")]), 1)
    inserts = (table_changes(spark, table, 1, 2)
               .where("op = 'insert'").select("doc_id", "text"))
    update_text_index(spark, idx, new_docs=inserts, removed_docs=None)

    # commit 3: GDPR delete of doc a; old text via time travel
    delete_origins(spark, table,
                   spark.createDataFrame([("a",)], "origin string"))
    deletes = table_changes(spark, table, 2, 3).where("op = 'delete'")
    old = (read_table_at(spark, table, 2)
           .join(deletes.select("origin"), "origin")
           .select("doc_id", "text"))
    update_text_index(spark, idx, new_docs=None, removed_docs=old)

    want = _score_map(bm25_topk(
        read_merged_table(spark, table).select("doc_id", "text"), queries))
    got = _score_map(bm25_topk_indexed(spark, idx, queries))
    assert got == want and 1 not in {doc for _, doc in got}


# --- closing-query properties ---------------------------------------------

def test_attribution_conserves_purchase_cents(spark):
    from engagement_data_pipeline_spark.queries.temporal_q import (
        _RANGE_WINDOW_S, events_attribution)
    from engagement_data_pipeline_spark.tables import load

    sf = "/root/testdata/sf0.001"
    out = events_attribution(spark, sf).collect()
    ev = load(spark, sf, "events")
    # recompute the credited total independently: purchases with >= 1
    # click in-window contribute their full cents, nothing else
    purchases = ev.where("event_type = 'purchase'").select(
        F.col("event_id").alias("pid"), F.col("user_id").alias("u"),
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    clicks = ev.where("event_type = 'click'").select(
        F.col("user_id").alias("u"), F.col("ts").alias("cts"))
    touched = (purchases.join(
        clicks, (purchases.u == clicks.u)
        & (F.unix_micros("pts") - F.unix_micros("cts") >= 0)
        & (F.unix_micros("pts") - F.unix_micros("cts")
           <= _RANGE_WINDOW_S * 1_000_000))
        .select("pid", "cents").distinct())
    want = touched.agg(F.sum("cents")).first()[0] or 0
    assert sum(r.credited_cents for r in out) == want


def test_user_growth_is_monotone_and_totals(spark):
    from engagement_data_pipeline_spark.queries.temporal_q import (
        events_user_growth)
    from engagement_data_pipeline_spark.tables import load

    sf = "/root/testdata/sf0.001"
    rows = sorted(events_user_growth(spark, sf).collect(),
                  key=lambda r: r.day_us)
    totals = [r.total_users for r in rows]
    assert totals == sorted(totals)
    assert totals[-1] == sum(r.new_users for r in rows)
    n_users = (load(spark, sf, "events")
               .select("user_id").distinct().count())
    assert totals[-1] == n_users


def test_clone_change_feed_starts_at_clone_point(spark, tmp_path):
    from engagement_data_pipeline_spark.streaming.ingest import (
        clone_table, read_table_manifest, table_changes)

    src = _mk_table(spark, tmp_path, [(f"k{i}", "p") for i in range(8)])
    dst = str(tmp_path / "clone")
    clone_table(spark, src, dst)
    base_commit = read_table_manifest(spark, dst)["commit"]

    merge = foreach_batch_upsert(dst, ["origin"])
    merge(spark.createDataFrame([("new1", "q"), ("k0", "q")],
                                "origin string, payload string"), 0)
    # feed across the clone's own history: exactly the genuinely new
    # key (k0 replays through existing-wins and must not appear)
    feed = table_changes(spark, dst, base_commit)
    assert {(r.origin, r.op) for r in feed.collect()} == {("new1", "insert")}
    # history BEFORE the clone point belongs to the source, not the
    # clone: asking the clone for it is an explicit error
    with pytest.raises(Exception):
        table_changes(spark, dst, base_commit - 1).collect()


def test_clone_carries_txn_watermarks(spark, tmp_path):
    from engagement_data_pipeline_spark.streaming.ingest import clone_table

    src = str(tmp_path / "src")
    merge = foreach_batch_upsert(src, ["origin"], n_buckets=2,
                                 txn_app_id="app")
    d = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "origin string, payload string")
    merge(d([("k1", "p")]), 0)
    merge(d([("k2", "p")]), 1)

    dst = str(tmp_path / "dst")
    clone_table(spark, src, dst)
    # a stream resuming against the CLONE with the same checkpoint
    # must not re-apply batches the source already applied...
    cmerge = foreach_batch_upsert(dst, ["origin"], txn_app_id="app")
    cmerge(d([("k1", "p")]), 1)  # replay: skipped
    assert read_merged_table(spark, dst).count() == 2
    # ...but genuinely new batches land
    cmerge(d([("k3", "p")]), 2)
    assert {r.origin for r in read_merged_table(spark, dst).collect()} == \
        {"k1", "k2", "k3"}


def test_misc_guards_and_small_contracts(spark):
    import pytest as _pt

    from engagement_data_pipeline_spark.operators.quality import (
        row_quarantine, unique)
    from engagement_data_pipeline_spark.streaming.ingest import (
        suggest_n_buckets)
    from engagement_data_pipeline_spark.training.ranking import rrf_fuse

    # bucket sizing: the docstring's anchor points hold
    assert suggest_n_buckets(100 * 2**40) == 262144
    assert suggest_n_buckets(2**30) == 2
    assert suggest_n_buckets(0) == 1

    # table-level rules alone cannot gate rows
    df = spark.createDataFrame([("a",)], "k string")
    with _pt.raises(ValueError):
        row_quarantine(df, [unique("k")])

    # three-way fusion sums all three reciprocal ranks
    r = lambda d: spark.createDataFrame(  # noqa: E731
        [("q", d, 1)], "query_id string, doc_id long, rank int")
    [row] = rrf_fuse([r(1), r(1), r(1)], k0=60).collect()
    assert row.rrf_score == 3 * (1.0 / 61)
