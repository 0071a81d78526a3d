"""Document deduplication: exact, MinHash-LSH (banded), SimHash.

The scale story (the whole point of these operators):

* Exact dedup is a hash aggregation on sha256(normalized text) — one
  shuffle, arbitrarily parallel, no memory hotspots unless one text
  value dominates (then AQE skew handling splits it).
* MinHash-LSH NEVER materializes all pairs. Each doc computes a
  k-hash signature over its word-3-gram shingle set (k independent
  md5 min-hashes), the signature is cut into b bands of r rows, and
  docs join only within (band_index, band_key) buckets. For docs with
  Jaccard j, P(candidate) = 1-(1-j^r)^b — with k=12, b=4, r=3 the
  curve crosses 50% near j≈0.6. Candidate pairs are then verified
  with the true shingle Jaccard. Cost: O(n·k) signature work + a
  shuffle on band keys + bucket-local pairing.
* SimHash computes one 16-bit signature per doc from per-word hash
  bit votes — pure projection, no shuffle at all; grouping equal
  signatures afterwards is one aggregation.

All hashing is md5-hex (byte-identical in DuckDB), so each operator
has an exact oracle (see queries/training.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

NUM_HASHES = 12
BANDS = 4
ROWS_PER_BAND = 3
SHINGLE_WORDS = 3
SIMHASH_BITS = 16


def normalize_text(col: Column) -> Column:
    """Lowercase, trim, collapse whitespace — the canonical text for
    all dedup operators."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def word_shingles(text: Column, n: int = SHINGLE_WORDS) -> Column:
    """Distinct word n-grams of the normalized text; texts shorter
    than n words contribute their whole text as one shingle.

    Built by zip_with-folding n shifted slices of the word array
    rather than transform(sequence(...)) + element_at: the slices
    avoid materializing an index array and the per-element
    bounds-checked lookups, ~4x faster on long documents."""
    w = F.split(normalize_text(text), " ")
    m = F.size(w) - (n - 1)
    grams = F.slice(w, 1, m)
    for j in range(1, n):
        grams = F.zip_with(grams, F.slice(w, j + 1, m),
                           lambda a, b: F.concat_ws(" ", a, b))
    return F.array_distinct(
        F.when(F.size(w) >= n, grams).otherwise(F.array(normalize_text(text))))


# Universal-hash permutation parameters: sig_i = min over shingles of
# (A_i * h + B_i) mod P, where h is the shingle's md5-derived integer
# reduced mod P. One md5 per shingle total (not per hash function) —
# 12× less hashing than md5-per-seed, and exactly mirrorable in SQL.
MERSENNE_P = 2147483647  # 2^31 - 1


def _perm_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (A, B) pairs derived from a fixed integer mix —
    no RNG, so Spark and the oracle agree by construction."""
    params = []
    for i in range(k):
        a = (1_103_515_245 * (i + 1) + 12_345) % MERSENNE_P
        b = (214_013 * (i + 7) + 2_531_011) % MERSENNE_P
        params.append((a or 1, b))
    return params


def md5_long(col: Column) -> Column:
    """String → 60-bit integer via the first 15 hex chars of md5 — THE
    cross-engine hashing idiom (DuckDB mirror:
    CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)). Every operator
    that hashes text uses this one helper so the two engines cannot
    drift at a single call site."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def shingle_hashes(shingles: Column) -> Column:
    """md5-derived integer in [0, P) per shingle — computed once."""
    return F.transform(shingles, lambda s: md5_long(s) % MERSENNE_P)


def minhash_signature(shingles: Column, k: int = NUM_HASHES) -> Column:
    h = shingle_hashes(shingles)
    return F.array(*[
        F.array_min(F.transform(h, lambda x: (F.lit(a) * x + F.lit(b)) % MERSENNE_P))
        for a, b in _perm_params(k)
    ])


def exact_dedup_groups(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by sha256 of normalized text; the
    representative is the min id (deterministic, unlike
    dropDuplicates). Returns (text_sha, n_docs, representative_id)."""
    return (
        docs.select(F.sha2(normalize_text(F.col(text_col)), 256).alias("text_sha"),
                    F.col(id_col))
        .groupBy("text_sha")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.min(id_col).alias("representative_id"))
    )


def _shingled(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, shingles, h) spread across the cores and cached: the
    shingle sets and their 60-bit md5 ints feed signatures, postings
    AND the verify joins (production: a materialized signatures
    table). Hashing happens once here; Spark's CacheManager dedups
    the cache by logical plan, so every dedup operator over the same
    docs frame shares one materialization per session."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    return docs.repartition(par).select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col)).alias("shingles"),
    ).select(
        "id", "shingles",
        F.transform("shingles", md5_long).alias("h"),
    ).cache()


def _bucket_pairs(blocked: DataFrame, key_col: str,
                  id_col: str = "id") -> DataFrame:
    """Distinct candidate (id_a < id_b) pairs from a blocked posting
    list — the i<j combinations of each bucket's id set, generated by
    ONE grouped aggregation instead of a posting self-join. The
    self-join form duplicated the whole posting/rare subtree on both
    sides (explode and stop-key aggregation each ran twice, Catalyst
    does not merge them); here the bucket's sorted id list is
    collected once and expanded with array combinators. Memory-safe
    by construction: callers filter buckets to df <= max_doc_freq
    BEFORE this step, so a collected list never exceeds the stop-key
    cap (the unbounded hot keys died in the `rare` filter, which
    still uses a streaming count aggregation)."""
    return _bucket_pairs_counted(blocked, key_col, id_col).select(
        "id_a", "id_b")


def _bucket_pairs_counted(blocked: DataFrame, key_col: str,
                          id_col: str = "id") -> DataFrame:
    """`_bucket_pairs` with the cross-bucket dedup done as a count:
    (id_a, id_b, __c) where __c = number of blocking keys the pair
    shares — the same shuffle the plain `.distinct()` pays, but the
    count is the pair's EXACT shared-rare-key intersection size, which
    the verify prefilters below turn into an upper bound that drops
    almost every candidate before any payload (shingle array) moves
    (guide §8: decide with small rows)."""
    grouped = blocked.groupBy(key_col).agg(
        F.array_sort(F.array_distinct(F.collect_list(id_col))).alias("ids"))
    pairs = F.flatten(F.transform(
        F.col("ids"),
        lambda a, i: F.transform(
            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
            lambda b: F.struct(a.alias("id_a"), b.alias("id_b")))))
    return (grouped.select(F.explode(pairs).alias("p"))
            .groupBy(F.col("p.id_a").alias("id_a"),
                     F.col("p.id_b").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("__c")))


def _pair_bound_inputs(blocked: DataFrame, sets: DataFrame,
                       set_col: str) -> tuple[DataFrame, DataFrame]:
    """Per-doc (n = |set|, s = non-rare a.k.a. stop members = n − rare
    members) aliased for the two sides of a candidate pair. Tiny rows
    (id + two ints) — the decision tables of the verify prefilter."""
    nr = blocked.groupBy("id").agg(F.count(F.lit(1)).alias("__nr"))
    sizes = (sets.select("id", F.size(set_col).alias("__n"))
             .join(nr, "id", "left").na.fill({"__nr": 0})
             .select("id", "__n", (F.col("__n") - F.col("__nr"))
                     .alias("__s")))
    a = sizes.select(F.col("id").alias("id_a"), F.col("__n").alias("__na"),
                     F.col("__s").alias("__sa"))
    b = sizes.select(F.col("id").alias("id_b"), F.col("__n").alias("__nb"),
                     F.col("__s").alias("__sb"))
    return a, b


#: Shared upper bound on a candidate pair's true intersection size:
#: the pair shares exactly __c rare (blocked) keys, and can share at
#: most min(stop_a, stop_b) of the keys the df-cap excluded from
#: blocking. Any metric monotone in the intersection is bounded by
#: substituting this for I; rounding is monotone, so a pair passing
#: the exact verify ALWAYS passes the bound — the prefilter can only
#: drop true negatives (pinned by test).
def _ub_inter() -> Column:
    return F.col("__c") + F.least(F.col("__sa"), F.col("__sb"))


def _verify_pairs(sh: DataFrame, candidates: DataFrame,
                  threshold: float) -> DataFrame:
    """Exact shingle-Jaccard verification of candidate (id_a, id_b)
    pairs against the shingle sets."""
    a = sh.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        candidates.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b",
                (inter.cast("double") / union.cast("double")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_near_dup_pairs(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           threshold: float = 0.5) -> DataFrame:
    """Banded MinHash-LSH near-duplicate detection.

    Pipeline: shingle → signature → explode into b band keys →
    self-join per (band, key) bucket (a < b) → distinct candidate
    pairs → verify true shingle Jaccard ≥ threshold.

    Returns (id_a, id_b, jaccard). The only shuffles are the band-key
    join and the two id-keyed verify joins — never an all-pairs
    product.
    """
    sh = _shingled(docs, text_col, id_col)
    # The band self-join references this frame on both sides and
    # Catalyst duplicates the subtree — without the cache the MinHash
    # signature pass (the corpus-scale hashing work) runs twice. The
    # banded keys are (id, band, key) rows, n_bands per doc — the
    # materialized signature table a production pipeline would keep.
    from ..session import scoped_cache

    bands = scoped_cache(_band_keys(_signatures(sh)))

    left = bands.alias("x")
    right = bands.alias("y")
    candidates = (
        left.join(right, (F.col("x.band") == F.col("y.band"))
                  & (F.col("x.key") == F.col("y.key"))
                  & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )

    return _verify_pairs(sh, candidates, threshold)


def simhash(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over distinct words: each word's md5-derived
    integer votes ±1 per bit position; the signature bit is 1 iff the
    vote sum is positive. Pure projection — zero shuffles."""
    w = F.array_distinct(F.split(normalize_text(F.col(text_col)), " "))
    h = F.transform(w, md5_long)

    # One fold over the words computes the ones-count of every bit
    # position at once (acc is a `bits`-long counter array) instead of
    # `bits` independent re-walks of the array. ±1 vote sum > 0 ⟺
    # 2·ones > n — exact integer math either way, so the oracle's
    # per-bit formulation agrees bit-for-bit.
    ones = F.aggregate(
        h,
        F.array_repeat(F.lit(0).cast("long"), bits),
        lambda acc, x: F.zip_with(
            acc,
            F.array(*[F.shiftright(x, b).bitwiseAND(F.lit(1)).cast("long")
                      for b in range(bits)]),
            lambda a, v: a + v),
    )
    n = F.size(h).cast("long")
    powers = F.lit([1 << b for b in range(bits)]).cast("array<long>")
    sig = F.aggregate(
        F.zip_with(ones, powers,
                   lambda c, p: F.when(c * 2 > n, p)
                   .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return docs.select(F.col(id_col).alias("doc_id"), sig.alias("simhash"))


def ngram_jaccard_pairs(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", threshold: float = 0.5,
                        max_doc_freq: int = 100) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via an inverted
    shingle index — the non-probabilistic sibling of MinHash-LSH.

    Pipeline: shingle → explode into a posting list → drop
    "stop-grams" (shingles appearing in more than `max_doc_freq`
    docs, which generate quadratic candidates while carrying no
    dedup signal) → self-join postings per shingle (id_a < id_b) →
    distinct candidate pairs → exact Jaccard verify ≥ threshold.

    Never an all-pairs product: candidates are bounded by
    sum over rare shingles of df² ≤ max_doc_freq · |postings|. A
    qualifying pair is missed only if *every* shared shingle occurs
    in more than `max_doc_freq` documents — at threshold ≥ 0.5 real
    near-dups share many grams, and boilerplate-only overlap is
    exactly the case blocking is meant to ignore.

    Returns (id_a, id_b, jaccard).
    """
    sh = _shingled(docs, text_col, id_col)
    # 60-bit md5 ints (precomputed in _shingled's cache) instead of
    # shingle strings for the posting list and the verify sets:
    # ~2-3x smaller shuffle and integer (not string) array
    # intersection. Collisions are negligible at 60 bits, and the
    # oracle applies the identical hash, so the two engines agree
    # exactly by construction either way.
    shh = sh.select("id", F.array_distinct(F.col("h")).alias("shingles"))

    posting = shh.select("id", F.explode("shingles").alias("shingle"))
    rare = posting.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df")).where(F.col("df") <= max_doc_freq)
    blocked = posting.join(rare.select("shingle"), "shingle")

    # Upper-bound prefilter before the array-shipping verify (guide
    # §3.2/§8): J = I/U with U = na+nb−I is monotone in I, and
    # I ≤ __c + min(stop_a, stop_b), so
    # J ≤ ub/(na+nb−ub). Candidates are Σ df² ≈ max_doc_freq·|postings|
    # rows while survivors are the handful of true near-dups; dropping
    # the rest here means the shingle arrays are joined to survivor
    # pairs only (sf0.1: 1.13M candidates → 256 survivors, full query
    # 4.0 → 2.1 s; result equality pinned by the oracle and tests).
    cand = _bucket_pairs_counted(blocked, "shingle")
    a, b = _pair_bound_inputs(blocked, shh, "shingles")
    ub = _ub_inter()
    pre = (cand.join(a, "id_a").join(b, "id_b")
           .where((ub.cast("double")
                   / (F.col("__na") + F.col("__nb") - ub).cast("double"))
                  >= threshold)
           .select("id_a", "id_b"))

    return _verify_pairs(shh, pre, threshold)


def fingerprint_containment_pairs(docs: DataFrame, text_col: str = "text",
                                  id_col: str = "doc_id",
                                  threshold: float = 0.5,
                                  min_fp: int = 5,
                                  max_doc_freq: int = 100,
                                  sample_mod: int = 16) -> DataFrame:
    """Asymmetric near-duplication: pairs where the smaller sampled
    fingerprint is mostly contained in the larger one —
    |fp_a ∩ fp_b| / min(|fp_a|, |fp_b|) ≥ threshold. Catches
    quote/excerpt/superset relationships that symmetric Jaccard
    misses (a doc pasted inside a longer one scores low Jaccard but
    high containment).

    The fingerprint is a content-defined 1/`sample_mod` sample of the
    word-shingle hash set (h % sample_mod == 0) — robust to
    insertions (unlike stride sampling) and FREE at scale: it reuses
    `_shingled`'s cached 60-bit hashes, so minhash, jaccard and
    containment all ride the same single hashing pass over the
    corpus. (The char-8-gram sketch in `training.text.fingerprint`
    serves per-doc sketch export; hashing every char position again
    here would cost more than the joins it feeds.)

    Same scale discipline as ngram_jaccard_pairs: inverted index over
    the sampled hashes, stop-hash cap `max_doc_freq`, bucket-local
    candidate pairing — never an all-pairs product. Docs with fewer
    than `min_fp` sampled hashes are excluded (a sparse sample of a
    tiny doc carries no signal).

    Returns (id_a, id_b, containment).
    """
    sh = _shingled(docs, text_col, id_col)
    fp = sh.select(
        "id",
        F.array_sort(F.array_distinct(
            F.filter("h", lambda x: x % sample_mod == 0))).alias("fp"),
    ).where(F.size("fp") >= min_fp)

    posting = fp.select("id", F.explode("fp").alias("h"))
    rare = (posting.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") <= max_doc_freq))
    blocked = posting.join(rare.select("h"), "h")
    # NO upper-bound prefilter here, deliberately (unlike
    # ngram_jaccard_pairs): the 1/sample_mod fingerprint sampling
    # already keeps postings — and so candidates — small, and a
    # measured A/B showed the extra bound aggregations cost more than
    # the array-verify they save (interleaved same-session at sf0.1:
    # 0.84 s plain vs 1.40 s prefiltered).
    candidates = _bucket_pairs(blocked, "h")
    a, b = fp.alias("a"), fp.alias("b")
    inter = F.size(F.array_intersect(F.col("a.fp"), F.col("b.fp")))
    containment = (inter.cast("double")
                   / F.least(F.size("a.fp"), F.size("b.fp")).cast("double"))
    return (
        candidates.join(a, F.col("id_a") == F.col("a.id"))
        .join(b, F.col("id_b") == F.col("b.id"))
        .select("id_a", "id_b", containment.alias("containment"))
        .where(F.col("containment") >= threshold)
    )


def near_dup_clusters(pairs: DataFrame, id_a: str = "id_a",
                      id_b: str = "id_b",
                      max_iterations: int = 20,
                      stats: dict | None = None) -> DataFrame:
    """Connected components over the near-duplicate pair graph: the
    step that turns pairwise matches into dedup decisions (cluster →
    keep the representative, drop the rest).

    Iterative min-label propagation (Pregel-style): every node starts
    labelled with itself; each round every node takes the min label
    among itself and its neighbours; fixpoint after O(diameter)
    rounds. Each round is one shuffle (join + groupBy); the driver
    only checks the scalar "any label changed?" count — no row data
    is collected. Near-dup graph diameters are tiny (chains of
    near-identical docs), so this converges in a handful of rounds;
    `max_iterations` bounds pathological chains. (At extreme scale,
    swap in the large-star/small-star variant — same contract.)

    Returns (doc_id, cluster_rep, cluster_size) for every doc that
    appears in at least one pair, cluster_rep = min doc id of its
    component.
    """
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().cache()

    # Each round references `labels` twice (as the fold input and via
    # neigh_min), so chaining rounds lazily doubles the logical plan
    # per iteration — exponential analysis cost. localCheckpoint
    # (eager) truncates the lineage to the materialized result each
    # round, the standard shape for iterative DataFrame algorithms.
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .select("node", F.col("node").alias("label"))
              .localCheckpoint(eager=True))

    converged = False
    for round_no in range(1, max_iterations + 1):
        if stats is not None:
            stats["rounds"] = round_no
        neigh_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src").agg(F.min("label").alias("neighbour_label"))
        )
        # Carry the previous label through the same frame so the
        # fixpoint check is a filter on the materialized result, not a
        # second self-join per round.
        stepped = (
            labels.join(neigh_min, labels.node == neigh_min.src, "left")
            .select(
                "node",
                F.col("label").alias("prev_label"),
                F.least(
                    F.col("label"),
                    F.coalesce("neighbour_label", "label")).alias("label"),
            ).localCheckpoint(eager=True)
        )
        n_changed = stepped.where(
            F.col("label") != F.col("prev_label")).count()
        labels = stepped.select("node", "label")
        if n_changed == 0:
            converged = True
            break

    if not converged:
        # One propagation hop per round: exhausting the budget means a
        # component's diameter exceeds max_iterations and the labels
        # are NOT final — returning them silently would report one
        # component as several. (For graphs that legitimately deep,
        # use the large-star/small-star contraction variant.)
        raise RuntimeError(
            f"near_dup_clusters did not converge in {max_iterations} "
            "rounds; a component's diameter exceeds the iteration "
            "budget — raise max_iterations")

    # Every consumer of the edges cache ran inside the loop (the final
    # labels are a materialized localCheckpoint, not a lineage over
    # edges), so the cache can be released here instead of occupying
    # executor storage for the rest of the session.
    edges.unpersist(blocking=False)
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(F.col("node").alias("doc_id"),
                F.col("label").alias("cluster_rep"),
                "cluster_size")
    )


def near_dup_clusters_star(pairs: DataFrame, id_a: str = "id_a",
                           id_b: str = "id_b",
                           max_iterations: int = 25,
                           stats: dict | None = None) -> DataFrame:
    """Connected components by alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond") — the scale path `near_dup_clusters` names: label
    propagation needs O(diameter) rounds, star contraction provably
    O(log^2 n), so deep chain components (serial near-identical
    revisions) finish in a handful of shuffles either way.

    Same contract as `near_dup_clusters`: (doc_id, cluster_rep,
    cluster_size) for every doc in >= 1 pair, rep = min id of the
    component; the two are property-tested equivalent.

    Each half-round is one groupBy + one join, both keyed on the same
    node column (AQE coalesces; no row data ever reaches the driver —
    the convergence check collects two exact scalars). Lineage is
    localCheckpoint-truncated per round like every iterative operator
    here.
    """
    edges = (pairs.select(F.least(F.col(id_a), F.col(id_b)).alias("u"),
                          F.greatest(F.col(id_a), F.col(id_b)).alias("v"))
             .where(F.col("u") != F.col("v"))
             .distinct().localCheckpoint(eager=True))

    def _signature(e: DataFrame) -> tuple:
        # Exact fixpoint witness: edge count + decimal-exact hash sum.
        # The edge set under star rounds is monotone toward the star
        # forest, and (count, sum) collision would need two distinct
        # monotone states with identical exact sums — sum is over
        # xxhash64 in DECIMAL(38,0), no overflow, no float.
        row = e.select(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                       F.lit(0).cast("decimal(38,0)")).alias("s")).collect()[0]
        return (row["n"], row["s"])

    def _large_star(e: DataFrame) -> DataFrame:
        # Symmetrize; for each node, attach every LARGER neighbour to
        # the minimum of the closed neighbourhood.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u")
                .agg(F.min("v").alias("mn"))
                .select("u", F.least("u", "mn").alias("m")))
        out = (sym.join(mins, "u")
               .where(F.col("v") > F.col("u"))
               .select(F.least(F.col("v"), F.col("m")).alias("u"),
                       F.greatest(F.col("v"), F.col("m")).alias("v")))
        return out.where(F.col("u") != F.col("v")).distinct()

    def _small_star(e: DataFrame) -> DataFrame:
        # Orient larger-first (u > v); for each node, link all smaller
        # neighbours (and itself) to the smallest of them.
        ori = e.select(F.greatest("u", "v").alias("u"),
                       F.least("u", "v").alias("v"))
        mins = ori.groupBy("u").agg(F.min("v").alias("m"))
        relink = (ori.join(mins, "u")
                  .select(F.col("v").alias("a"), F.col("m").alias("b")))
        selfl = mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
        out = (relink.union(selfl)
               .select(F.least("a", "b").alias("u"),
                       F.greatest("a", "b").alias("v")))
        return out.where(F.col("u") != F.col("v")).distinct()

    sig = _signature(edges)
    converged = False
    for round_no in range(1, max_iterations + 1):
        if stats is not None:
            stats["rounds"] = round_no
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        new_sig = _signature(edges)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"near_dup_clusters_star did not converge in {max_iterations} "
            "rounds — raise max_iterations")

    # Fixpoint edge set is a star forest: v -> root (u = root since
    # u < v and every node links its component minimum).
    members = edges.select(F.col("v").alias("doc_id"),
                           F.col("u").alias("cluster_rep"))
    roots = (edges.select(F.col("u").alias("doc_id"))
             .distinct()
             .select("doc_id", F.col("doc_id").alias("cluster_rep")))
    labels = members.union(roots)
    sizes = (labels.groupBy("cluster_rep")
             .agg(F.count(F.lit(1)).alias("cluster_size")))
    return labels.join(sizes, "cluster_rep").select(
        "doc_id", "cluster_rep", "cluster_size")


def _band_keys(sig: DataFrame) -> DataFrame:
    """(id, band, key) LSH bucket keys from a (id, sig) signature
    frame — band keys are a pure function of the signature values, so
    keys computed from different frames with the same perm params
    collide exactly when the banded signatures agree."""
    return sig.select(
        "id",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(
                    "|", *[F.col("sig")[b * ROWS_PER_BAND + r].cast("string")
                           for r in range(ROWS_PER_BAND)])).alias("key"),
            )
            for b in range(BANDS)
        ])).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _signatures(sh: DataFrame) -> DataFrame:
    """(id, sig) MinHash signatures from a shingled frame."""
    hp = F.transform(F.col("h"), lambda x: x % MERSENNE_P)
    return sh.select("id", F.array(*[
        F.array_min(F.transform(hp, lambda x: (F.lit(a) * x + F.lit(b)) % MERSENNE_P))
        for a, b in _perm_params(NUM_HASHES)
    ]).alias("sig"))


def minhash_incremental_matches(corpus: DataFrame, batch: DataFrame,
                                text_col: str = "text",
                                id_col: str = "doc_id",
                                threshold: float = 0.5) -> DataFrame:
    """Incremental dedup: match a NEW batch of documents against an
    EXISTING corpus — the admission check a production ingest runs on
    every crawl increment, where re-pairing the whole corpus against
    itself (minhash_near_dup_pairs) would be O(corpus) per batch
    instead of O(batch).

    Same banded-LSH shape as the self-join variant, but the bucket
    join is batch-bands ⋈ corpus-bands: shuffle volume is
    |batch bands| + the corpus bucket sides they touch. In production
    the corpus band table is a materialized, bucket-partitioned
    artifact (append each admitted batch), so an increment never
    re-shingles the corpus.

    Returns (batch_id, corpus_id, jaccard) for every verified match
    ≥ threshold. Batch-internal duplicates are out of scope — dedup
    the batch with minhash_near_dup_pairs first.
    """
    shc = _shingled(corpus, text_col, id_col)
    shb = _shingled(batch, text_col, id_col)
    bc = _band_keys(_signatures(shc))
    bb = _band_keys(_signatures(shb))
    candidates = (
        bb.alias("x").join(bc.alias("y"),
                           (F.col("x.band") == F.col("y.band"))
                           & (F.col("x.key") == F.col("y.key")))
        .select(F.col("x.id").alias("batch_id"),
                F.col("y.id").alias("corpus_id"))
        .distinct()
    )
    a = shb.select(F.col("id").alias("batch_id"),
                   F.col("shingles").alias("sh_a"))
    b = shc.select(F.col("id").alias("corpus_id"),
                   F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        candidates.join(a, "batch_id").join(b, "corpus_id")
        .select("batch_id", "corpus_id",
                (inter.cast("double") / union.cast("double")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def solve_lsh_params(threshold: float, n_hashes: int = NUM_HASHES
                     ) -> tuple[int, int]:
    """(bands, rows) for a target Jaccard threshold: among the
    divisor pairs b·r = n_hashes, pick the banding whose S-curve
    inflection (1/b)^(1/r) sits closest to the threshold — the
    standard MMDS §3.4.3 tuning rule, so operators size BANDS from
    the dedup policy instead of guessing. Deterministic ties break
    toward more bands (higher recall at the threshold)."""
    if not (0.0 < threshold < 1.0):
        raise ValueError("threshold must be in (0, 1)")
    best = None
    for b in range(1, n_hashes + 1):
        if n_hashes % b:
            continue
        r = n_hashes // b
        inflection = (1.0 / b) ** (1.0 / r)
        key = (abs(inflection - threshold), -b)
        if best is None or key < best[0]:
            best = (key, (b, r))
    return best[1]


def hamming_pairs(hashed: DataFrame, id_col: str, hash_col: str,
                  max_dist: int = 3, n_bands: int = 4,
                  bits: int = 64) -> DataFrame:
    """All pairs whose `hash_col` values differ in <= `max_dist` bits
    (id_a < id_b) — EXACT when max_dist < n_bands, by pigeonhole: a
    pair differing in fewer bits than there are bands must agree
    exactly on at least one band, so banding loses nothing (the same
    guarantee shape as `fuzzy_pairs_ed1`'s deletion neighborhoods;
    the brute-force O(n^2) scan IS the oracle). Candidates join only
    within (band_idx, band_bits) buckets; the verify is one
    bit_count(xor) per candidate. The hamming sibling of the MinHash
    band join, for SimHash / perceptual-hash columns."""
    if max_dist >= n_bands:
        raise ValueError(
            f"max_dist {max_dist} >= n_bands {n_bands}: banding would "
            "miss pairs (pigeonhole guarantee needs max_dist < n_bands)")
    band_bits = bits // n_bands
    mask = (1 << band_bits) - 1
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.shiftrightunsigned(F.col("h"), i * band_bits)
                 .bitwiseAND(F.lit(mask)).alias("key"))
        for i in range(n_bands)])
    # The band self-join references `hashed` on both sides, and
    # Catalyst duplicates the upstream subtree — for perceptual
    # hashes that upstream is the Arrow image-decode kernel, which
    # would run TWICE. Cache the narrow (id, hash) projection (two
    # fixed-width columns per row — fingerprint-sized at any corpus
    # scale) so the expensive hashing pass materializes once.
    from ..session import scoped_cache

    hashed = scoped_cache(hashed.select(F.col(id_col).alias("id"),
                                        F.col(hash_col).alias("h")))
    keyed = (hashed.select("id", "h", F.explode(bands).alias("b"))
             .select("id", "h", F.col("b.band").alias("band"),
                     F.col("b.key").alias("key")))
    left = keyed
    right = (keyed.withColumnRenamed("id", "id_b")
             .withColumnRenamed("h", "h_b"))
    cand = (left.join(right, ["band", "key"])
            .where(F.col("id") < F.col("id_b"))
            .select(F.col("id").alias("id_a"), F.col("id_b"),
                    F.col("h"), F.col("h_b"))
            .distinct())
    dist = F.bit_count(F.col("h").bitwiseXOR(F.col("h_b")))
    return (cand.select("id_a", "id_b", dist.cast("int").alias("dist"))
            .where(F.col("dist") <= max_dist))
