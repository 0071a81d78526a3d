"""Training-data operator tests: dedup family + text analysis."""

from __future__ import annotations

from pyspark.sql import functions as F

from engagement_data_pipeline_spark.training.dedup import (
    exact_dedup_groups,
    minhash_near_dup_pairs,
    simhash,
    word_shingles,
)
from engagement_data_pipeline_spark.training.text import (
    document_profile,
    fingerprint,
)

BASE = ("spark shuffles data between stages when a wide dependency "
        "requires repartitioning by key across the cluster nodes")
NEAR = BASE.replace("cluster", "compute")  # one word differs
FAR = "completely different text about cats and dogs and birds"


def docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_word_shingles_short_text_fallback(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    got = df.select(word_shingles(F.col("text")).alias("s")).collect()[0].s
    assert got == ["a b"]


def test_exact_dedup_groups_normalizes(spark):
    df = docs(spark, ["Hello  World", "hello world", "other"])
    out = exact_dedup_groups(df).collect()
    by_n = {r.n_docs: r for r in out}
    assert len(out) == 2
    assert by_n[2].representative_id == 0  # min doc_id, deterministic


def test_minhash_finds_planted_near_dup(spark):
    df = docs(spark, [BASE, NEAR, FAR])
    pairs = minhash_near_dup_pairs(df, threshold=0.5).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(0, 1)]
    assert pairs[0].jaccard > 0.6


def test_minhash_identical_docs_jaccard_one(spark):
    df = docs(spark, [BASE, BASE])
    pairs = minhash_near_dup_pairs(df, threshold=0.5).collect()
    assert len(pairs) == 1 and pairs[0].jaccard == 1.0


def test_simhash_close_for_near_dups(spark):
    out = {r.doc_id: r.simhash for r in simhash(docs(spark, [BASE, BASE, FAR])).collect()}
    assert out[0] == out[1]
    assert 0 <= out[0] < 2 ** 16
    assert out[0] != out[2]


def test_fingerprint_shares_hashes_for_shared_content(spark):
    df = docs(spark, [BASE, NEAR, FAR])
    fps = {r.doc_id: set(r.fp) for r in
           df.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()}
    overlap_near = len(fps[0] & fps[1])
    overlap_far = len(fps[0] & fps[2])
    assert overlap_near > overlap_far


def test_document_profile_metrics(spark):
    df = docs(spark, ["the cat, the hat!"])
    r = document_profile(df).collect()[0]
    assert r.n_ws_tokens == 4
    assert r.n_words == 4
    assert r.n_chars == 17
    # tokens: the / cat / , / the / hat / !
    assert r.n_bpe_tokens == 6
    assert r.punct_ratio == 2.0 / 17.0
    assert r.stopword_ratio == 0.5  # 'the' twice out of 4 words
    assert r.lang_guess == "en"


def test_document_profile_langid_votes(spark):
    df = docs(spark, ["der hund und die katze ist da",
                      "xyzzy plugh"])
    out = {r.doc_id: r.lang_guess for r in document_profile(df).collect()}
    assert out[0] == "de"
    assert out[1] == "und"  # no marker hits


def test_language_id_frame_matches_column_impl(spark):
    """The broadcast-join frame impl and the column expression must
    agree everywhere: clear winner, shared marker ('la' credits both
    es and fr), count tie (lexicographic tie-break), zero hits, and
    empty text."""
    from engagement_data_pipeline_spark.training.text import (
        language_id,
        language_id_frame,
    )

    texts = [
        "der hund und die katze ist da",       # de
        "la casa es que los gatos",            # es beats fr despite 'la'
        "le chat est la",                      # fr
        "the cat is la la",                    # tie en=2 (the,is) vs es/fr 'la'×2 → 'es' < 'fr'? argmax decides
        "xyzzy plugh",                         # und
        "",                                    # und
        "und und und the the",                 # de=3 beats en=2
    ]
    df = docs(spark, texts)
    col_out = {r.doc_id: r.guess for r in
               df.select("doc_id", language_id(F.col("text")).alias("guess")).collect()}
    frame_out = {r.doc_id: r.lang_guess for r in
                 language_id_frame(df).collect()}
    assert frame_out == col_out
    assert col_out[0] == "de" and col_out[4] == "und" and col_out[5] == "und"
    assert col_out[6] == "de"


def test_ngram_jaccard_pairs_matches_brute_force(spark):
    """With a permissive doc-freq cap, inverted-index blocking finds
    exactly the brute-force pair set, with exact Jaccard values."""
    from itertools import combinations

    from engagement_data_pipeline_spark.training.dedup import (
        ngram_jaccard_pairs,
        word_shingles,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over a lazy dog",    # near-dup of 0
        "pack my box with five dozen liquor jugs",
        "the quick brown fox jumps over the lazy dog",  # exact dup of 0
        "completely unrelated text about spark engines",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")

    got = {(r.id_a, r.id_b): r.jaccard
           for r in ngram_jaccard_pairs(docs, threshold=0.5,
                                        max_doc_freq=100).collect()}

    sh = {r.doc_id: set(r.sh) for r in docs.select(
        "doc_id", word_shingles(F.col("text")).alias("sh")).collect()}
    want = {}
    for a, b in combinations(sorted(sh), 2):
        j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        if j >= 0.5:
            want[(a, b)] = j
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
    assert got[(0, 3)] == 1.0


def test_ngram_jaccard_stop_gram_cap_blocks_boilerplate(spark):
    """Shingles above the doc-freq cap generate no candidates: two
    docs overlapping ONLY in a ubiquitous boilerplate phrase are not
    paired when the cap excludes that phrase's shingles."""
    from engagement_data_pipeline_spark.training.dedup import (
        ngram_jaccard_pairs,
    )

    boiler = "all rights reserved worldwide"
    docs = spark.createDataFrame(
        [(i, f"unique text number {i} is here {boiler}") for i in range(6)],
        "doc_id long, text string")
    # every shingle containing the boilerplate occurs in all 6 docs
    got = ngram_jaccard_pairs(docs, threshold=0.1, max_doc_freq=3).collect()
    assert got == []


def test_near_dup_clusters_transitive_chain(spark):
    """A-B and B-C pairs (without A-C) must still cluster A,B,C
    together with the min id as representative."""
    from engagement_data_pipeline_spark.training.dedup import (
        near_dup_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long")
    got = {r.doc_id: (r.cluster_rep, r.cluster_size)
           for r in near_dup_clusters(pairs).collect()}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3), 7: (7, 2), 9: (7, 2)}


def test_dedup_operators_accept_empty_input(spark):
    """Empty docs / empty pair graphs flow through without errors."""
    from engagement_data_pipeline_spark.training.dedup import (
        exact_dedup_groups,
        near_dup_clusters,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup_groups(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert near_dup_clusters(pairs).count() == 0


def test_near_dup_clusters_raises_on_iteration_exhaustion(spark):
    """A chain deeper than the iteration budget must raise rather than
    silently return split clusters."""
    import pytest

    from engagement_data_pipeline_spark.training.dedup import (
        near_dup_clusters,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_clusters(chain, max_iterations=2)
    # the same chain converges with an adequate budget
    ok = near_dup_clusters(chain, max_iterations=15)
    assert {r.cluster_rep for r in ok.collect()} == {0}


def test_clustering_rounds_scale_shape(spark):
    """The scale claim behind near_dup_clusters_star (SCALING.md,
    measured at 5000 nodes by tools/clustering_scale.py): label
    propagation converges in exactly diameter rounds — LINEAR in chain
    depth — while star contraction's round count is ~log^2(n) and
    essentially flat as the depth quadruples. Both must agree on the
    clustering."""
    from engagement_data_pipeline_spark.training.dedup import (
        near_dup_clusters,
        near_dup_clusters_star,
    )

    rounds = {}
    for depth in (6, 24):
        # 4 chains per depth: ids c*1000+k, so diameter == depth-1
        pairs = spark.createDataFrame(
            [(c * 1000 + k, c * 1000 + k + 1)
             for c in range(4) for k in range(depth - 1)],
            "id_a long, id_b long")
        sp, ss = {}, {}
        plain = sorted((r.doc_id, r.cluster_rep, r.cluster_size)
                       for r in near_dup_clusters(
                           pairs, max_iterations=depth + 2,
                           stats=sp).collect())
        star = sorted((r.doc_id, r.cluster_rep, r.cluster_size)
                      for r in near_dup_clusters_star(
                          pairs, stats=ss).collect())
        assert plain == star and len(plain) == 4 * depth
        rounds[depth] = (sp["rounds"], ss["rounds"])

    # plain: one hop per round → rounds == depth (last hop + fixpoint
    # check); 4x the depth costs 4x the rounds
    assert rounds[6][0] == 6 and rounds[24][0] == 24
    # star: flat, small, and far below the diameter at depth 24
    assert rounds[24][1] <= 8
    assert rounds[24][1] - rounds[6][1] <= 2


def test_jaccard_stop_gram_recall_trade(spark):
    """Pins the documented blocking trade (training/dedup.py): a pair
    whose every shared shingle is a stop-gram (df > max_doc_freq) is
    INTENTIONALLY excluded, and raising the cap above the shingle's
    document frequency recovers it — so a refactor can't silently
    change the recall semantics."""
    from engagement_data_pipeline_spark.training.dedup import (
        ngram_jaccard_pairs,
    )

    boiler = "common boiler plate legal footer text"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(8)]
        + [(100, "something entirely different content here"),
           (101, "another unrelated piece of writing now")],
        "doc_id long, text string")

    # every shingle of the identical docs appears in 8 docs > cap 5:
    # all their (jaccard=1.0) pairs are blocked away
    assert ngram_jaccard_pairs(docs, max_doc_freq=5).count() == 0
    # cap >= df recovers all C(8,2)=28 pairs
    recovered = ngram_jaccard_pairs(docs, max_doc_freq=8)
    rows = recovered.collect()
    assert len(rows) == 28
    assert all(r.jaccard == 1.0 for r in rows)


def test_containment_catches_excerpt_that_jaccard_misses(spark):
    """A short doc pasted inside a much longer one: fingerprint
    containment ~1.0 while symmetric Jaccard stays below a 0.5
    threshold — the asymmetric operator's reason to exist."""
    from engagement_data_pipeline_spark.training.dedup import (
        fingerprint_containment_pairs,
        ngram_jaccard_pairs,
    )

    core = ("the quick brown fox jumps over the lazy dog near the "
            "quiet river bank every single morning without fail")
    filler = " ".join(f"filler{i} word{i} extra{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, core), (2, core + " " + filler)],
        "doc_id long, text string")

    # sample_mod=2: the docs are tiny, so keep ~half the shingle
    # hashes rather than 1/16
    got = fingerprint_containment_pairs(docs, threshold=0.8, min_fp=3,
                                        sample_mod=2)
    rows = got.collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    assert rows[0].containment >= 0.8
    # the symmetric jaccard pipeline does NOT pair them at 0.5
    assert ngram_jaccard_pairs(docs, threshold=0.5).count() == 0


def test_deterministic_sample_monotone_and_reproducible(spark):
    """The sampling contract: same salt => identical sample on re-run,
    and raising the rate only ADDS documents (no churn when mixture
    weights are re-tuned)."""
    from pyspark.sql import functions as F

    from engagement_data_pipeline_spark.training.sampling import (
        deterministic_sample,
    )

    docs = spark.range(2000).select(F.col("id").alias("doc_id"))
    kept_30 = {r.doc_id for r in
               deterministic_sample(docs, 0.3).collect()}
    kept_30_again = {r.doc_id for r in
                     deterministic_sample(docs, 0.3).collect()}
    kept_60 = {r.doc_id for r in
               deterministic_sample(docs, 0.6).collect()}
    assert kept_30 == kept_30_again
    assert kept_30 < kept_60
    # rates land near their targets (hash uniformity)
    assert abs(len(kept_30) / 2000 - 0.3) < 0.05
    assert abs(len(kept_60) / 2000 - 0.6) < 0.05
    # a different salt produces a different (but equally sized-ish) draw
    other = {r.doc_id for r in
             deterministic_sample(docs, 0.3, salt="mix-v2").collect()}
    assert other != kept_30


def test_repetition_profile_detects_duplicate_bigrams(spark):
    from engagement_data_pipeline_spark.training.text import repetition_profile
    docs = spark.createDataFrame(
        [(1, "a b a b a b"),     # bigrams: ab ba ab ba ab -> 5 total, 2 distinct
         (2, "x y z"),          # 2 bigrams, both unique
         (3, "solo"),           # < 2 words -> zero bigrams
         (4, "")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_profile(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert (got[1].n_bigrams, got[1].n_distinct_bigrams) == (5, 2)
    assert got[1].dup_bigram_ratio == (5 - 2) / 5
    assert got[1].top_bigram_ratio == 3 / 5
    assert (got[2].dup_bigram_ratio, got[2].top_bigram_ratio) == (0.0, 0.5)
    assert (got[3].n_bigrams, got[3].dup_bigram_ratio) == (0, 0.0)


def test_scrub_pii_counts_and_redacts(spark):
    from engagement_data_pipeline_spark.training.text import scrub_pii
    df = spark.createDataFrame(
        [(1, "Mail a@b.org or c.d@e.co, see https://x.io/p now call +254700123456"),
         (2, "no pii here")],
        "doc_id long, text string")
    cols = scrub_pii(F.col("text"))
    out = {r.doc_id: r for r in
           df.select("doc_id", *[c.alias(n) for n, c in cols.items()]).collect()}
    assert (out[1].n_emails, out[1].n_urls, out[1].n_phones) == (2, 1, 1)
    assert (out[2].n_emails, out[2].n_urls, out[2].n_phones) == (0, 0, 0)
    redacted = df.where("doc_id = 1").select(
        F.regexp_replace(F.regexp_replace(F.regexp_replace(
            F.lower("text"), r"https?://[^ ]+", "<URL>"),
            r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
            r"\+[0-9]{7,15}", "<PHONE>").alias("t")).collect()[0].t
    assert "<EMAIL>" in redacted and "<URL>" in redacted and "<PHONE>" in redacted


def test_star_contraction_matches_label_propagation(spark):
    import random
    from engagement_data_pipeline_spark.training.dedup import (
        near_dup_clusters,
        near_dup_clusters_star,
    )
    random.seed(7)
    pairs = [(random.randrange(50), random.randrange(50)) for _ in range(40)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    assert sorted(map(tuple, near_dup_clusters(df).collect())) == \
        sorted(map(tuple, near_dup_clusters_star(df).collect()))


def test_star_contraction_converges_on_deep_chain(spark):
    # A 64-node path needs 63 label-propagation rounds but only a few
    # star rounds — the property that makes it the 100 TB variant.
    from engagement_data_pipeline_spark.training.dedup import (
        near_dup_clusters_star,
    )
    chain = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    out = near_dup_clusters_star(df, max_iterations=8).collect()
    assert len(out) == 64
    assert all(r.cluster_rep == 0 and r.cluster_size == 64 for r in out)


def test_curation_report_dispositions_are_consistent(spark):
    """The end-to-end report must agree with its component operators
    on the real testdata: every doc gets exactly one disposition, kept
    docs carry a split, dropped docs don't."""
    from engagement_data_pipeline_spark.queries import curation_q, training

    sf = "/root/testdata/sf0.001"
    rep = curation_q.doc_curation_report(spark, sf).collect()
    q_ids = {r["doc_id"]
             for r in training.doc_quality_corpus(spark, sf).collect()}
    assert len(rep) == len({r["doc_id"] for r in rep})
    for r in rep:
        if r["disposition"] == "dropped_quality":
            assert r["doc_id"] not in q_ids and r["split"] is None
        elif r["disposition"] == "dropped_duplicate":
            assert r["doc_id"] in q_ids and r["split"] is None
        else:
            assert r["disposition"] == "kept"
            assert r["split"] in {"train", "val", "test"}


def test_solve_lsh_params_s_curve_rule():
    from engagement_data_pipeline_spark.training.dedup import (
        NUM_HASHES, solve_lsh_params)

    b, r = solve_lsh_params(0.5, NUM_HASHES)
    assert b * r == NUM_HASHES
    assert (1.0 / b) ** (1.0 / r) == min(
        ((1.0 / bb) ** (bb / NUM_HASHES) for bb in range(1, NUM_HASHES + 1)
         if NUM_HASHES % bb == 0),
        key=lambda x: abs(x - 0.5))
    # higher thresholds want fewer bands (stricter buckets)
    assert solve_lsh_params(0.9, NUM_HASHES)[0] <= b
    # the shipped BANDS=4 banding sits ABOVE the solver's 0.5 pick on
    # purpose (precision-leaning; exact-Jaccard verify restores
    # recall) — the solver documents the trade rather than hiding it
    assert solve_lsh_params(0.63, NUM_HASHES) == (4, 3)
    import pytest
    with pytest.raises(ValueError):
        solve_lsh_params(0.0)
