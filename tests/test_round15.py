"""Round-15 optimization internals: the candidate-pair upper-bound
prefilter must be invisible in results (it may only drop pairs the
exact verify would discard), and the fuzzy join's narrowed cache must
leave pair results unchanged."""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_jaccard_prefilter_equals_unfiltered_verify(spark):
    """ngram_jaccard_pairs (with the __c + min(stop) upper-bound
    prefilter) must equal the plain candidates→verify pipeline on a
    corpus WITH stop-grams (df cap binding), near-dups, and
    borderline pairs."""
    from engagement_data_pipeline_spark.training.dedup import (
        _bucket_pairs, _shingled, _verify_pairs, ngram_jaccard_pairs)

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(1, base),
            (2, base + " iota"),                      # near-dup of 1
            (3, "alpha beta gamma completely different tail here now"),
            (4, "unrelated words entirely separate content block"),
            (5, base)]                                # exact dup of 1
    # boilerplate shared by everyone -> stop-grams under a low df cap
    rows = [(i, t + " common boiler plate suffix") for i, t in rows]
    docs = _docs(spark, rows)

    for thr, cap in ((0.5, 3), (0.3, 2), (0.8, 100)):
        got = sorted(
            tuple(r) for r in ngram_jaccard_pairs(
                docs, threshold=thr, max_doc_freq=cap).collect())
        sh = _shingled(docs, "text", "doc_id")
        shh = sh.select("id",
                        F.array_distinct(F.col("h")).alias("shingles"))
        posting = shh.select("id", F.explode("shingles").alias("shingle"))
        rare = (posting.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df"))
                .where(F.col("df") <= cap))
        blocked = posting.join(rare.select("shingle"), "shingle")
        want = sorted(
            tuple(r) for r in _verify_pairs(
                shh, _bucket_pairs(blocked, "shingle"), thr).collect())
        assert got == want, (thr, cap, got, want)


def test_containment_prefilter_equals_unfiltered_verify(spark):
    from engagement_data_pipeline_spark.training.dedup import (
        fingerprint_containment_pairs)

    # quote/superset relation: doc 2 contains doc 1's text verbatim
    long_tail = " ".join(f"w{i}" for i in range(40))
    rows = [(1, long_tail),
            (2, long_tail + " plus extra framing text around the quote"),
            (3, " ".join(f"q{i}" for i in range(40)))]
    docs = _docs(spark, rows)
    got = {(r.id_a, r.id_b): r.containment
           for r in fingerprint_containment_pairs(
               docs, threshold=0.5, min_fp=1, sample_mod=2).collect()}
    # the quoted doc must be found, the unrelated one must not
    assert (1, 2) in got and got[(1, 2)] >= 0.5
    assert all(3 not in k for k in got)


def test_fuzzy_pairs_narrow_cache_matches_bruteforce(spark):
    from engagement_data_pipeline_spark.operators.fuzzy import (
        fuzzy_pairs_ed1)

    rows = [(1, "jamal"), (2, "jamaal"), (3, "jmal"), (4, "kamal"),
            (5, "xavier"), (6, "jamal")]
    df = spark.createDataFrame(rows, "k long, s string")
    got = {(r.left_key, r.right_key): r.dist
           for r in fuzzy_pairs_ed1(df, "k", "s").collect()}
    import itertools

    def lev(a, b):
        import numpy as np
        d = np.zeros((len(a) + 1, len(b) + 1), dtype=int)
        d[:, 0] = range(len(a) + 1)
        d[0, :] = range(len(b) + 1)
        for i in range(1, len(a) + 1):
            for j in range(1, len(b) + 1):
                d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                              d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
        return int(d[len(a), len(b)])

    want = {(a[0], b[0]): lev(a[1], b[1])
            for a, b in itertools.combinations(rows, 2)
            if lev(a[1], b[1]) <= 1}
    assert got == want and (1, 6) in got and got[(1, 6)] == 0
