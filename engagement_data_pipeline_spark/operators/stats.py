"""Exact distributed order statistics.

Spark's `percentile_approx` is the right tool at 100 TB, but its
sketch is engine-specific, so cross-engine verification (and any
consumer needing exact quantiles — SLA percentiles on bounded
groups, say) wants the exact nearest-rank statistic: the element at
1-based rank ceil(p*n) of the group's sorted values. Computed with
one window pass per group (rank + group size share the partition
spec, so one exchange) and a conditional aggregation — no collect,
no interpolation arithmetic that two engines could round differently.

Integer rank math only: ceil(p*n) with p = num/100 is computed as
floor((num*n + 99) / 100); the division is exact in double for any
realistic n (result is either an exact integer — representable, so
rounds to itself — or ≥ 0.01 away from one, far beyond 1 ulp).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_percentiles(df: DataFrame, group_cols: Sequence[str],
                      value_col: str,
                      percents: Sequence[int] = (50, 95),
                      tiebreak_cols: Sequence[str] = ()) -> DataFrame:
    """One row per group: n, min, max, and the nearest-rank p-th
    percentile value for each p in `percents` (columns p{p}). Ties in
    `value_col` don't affect the selected value; `tiebreak_cols` only
    pin the row order for engines that care."""
    group_cols = list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy(value_col, *tiebreak_cols)
    ranked = df.select(
        *group_cols, value_col,
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
        .alias("__n"))
    aggs = [
        F.max("__n").cast("long").alias("n"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    ]
    for p in percents:
        rank = F.floor((F.lit(int(p)) * F.col("__n") + 99) / F.lit(100))
        aggs.append(
            F.max(F.when(F.col("__rn") == rank, F.col(value_col)))
            .alias(f"p{int(p)}"))
    return ranked.groupBy(*group_cols).agg(*aggs)


# --- HyperLogLog -----------------------------------------------------------

HLL_P = 6                      # 2^6 = 64 registers
HLL_M = 1 << HLL_P
HLL_W_BITS = 60 - HLL_P        # md5_long yields 60-bit hashes
# raw HLL estimator constant alpha_m * m^2, times 2^HLL_SHIFT because
# registers are summed as exact integers 2^(HLL_SHIFT - M_j) (every
# term and the sum fit a BIGINT exactly, so Spark's parallel partial
# aggregation cannot perturb the float result — only ONE double
# division happens, from identical exact operands in both engines).
HLL_SHIFT = HLL_W_BITS + 1     # >= max rho, so terms stay integral
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_K = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_SHIFT)


def hll_terms(hash_col: Column) -> tuple[Column, Column]:
    """(bucket, scaled_register_term) for one 60-bit hash: bucket =
    low HLL_P bits, rho = 1-based position of the highest set bit of
    the remaining HLL_W_BITS (HLL_W_BITS+1 when zero), term =
    2^(HLL_SHIFT - rho). The rho ladder is a pure integer-comparison
    CASE chain — no log2/float bit tricks that two engines could
    round differently."""
    bucket = hash_col.bitwiseAND(F.lit(HLL_M - 1))
    w = F.shiftright(hash_col, HLL_P)
    # chained whens evaluate in insertion order, so the ladder starts
    # at the largest threshold (rho = 1) and falls through to the
    # w == 0 term; the ladder emits the shifted term directly — every
    # branch is a BIGINT literal
    expr = None
    for r in range(1, HLL_W_BITS + 1):
        cond = w >= F.lit(1 << (HLL_W_BITS - r))
        val = F.lit(1 << (HLL_SHIFT - r)).cast("long")
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    term = expr.otherwise(
        F.lit(1 << (HLL_SHIFT - HLL_W_BITS - 1)).cast("long"))
    return bucket, term


def hll_registers(df: DataFrame, group_cols: Sequence[str],
                  hash_col: Column) -> DataFrame:
    """Per-group HLL register table (group, __b, __m): at most HLL_M
    rows per group regardless of input size — the persistable,
    MERGEABLE sketch state (register = MAX rho seen in the bucket =
    MIN shifted term)."""
    group_cols = list(group_cols)
    bucket, term = hll_terms(hash_col)
    return (df.select(*group_cols, bucket.alias("__b"), term.alias("__t"))
            .groupBy(*group_cols, "__b")
            .agg(F.min("__t").alias("__m")))


def hll_merge(a: DataFrame, b: DataFrame,
              group_cols: Sequence[str]) -> DataFrame:
    """Merge two register tables: union + per-register MIN — HLL's
    defining property (sketch(A ∪ B) == merge(sketch(A), sketch(B))),
    which is what makes the sketch maintainable incrementally and
    shard-parallel: O(registers) per refresh, never a rescan."""
    return (a.unionByName(b)
            .groupBy(*group_cols, "__b")
            .agg(F.min("__m").alias("__m")))


def hll_estimate_from_registers(regs: DataFrame,
                                group_cols: Sequence[str]) -> DataFrame:
    """(group, n_registers, hll_estimate) from a register table (raw
    estimator — ln() correction is not bit-stable across engines)."""
    group_cols = list(group_cols)
    zero_term = F.lit(1 << HLL_SHIFT).cast("long")
    return (regs.groupBy(*group_cols)
            .agg(F.count(F.lit(1)).cast("long").alias("n_registers"),
                 (F.sum("__m")
                  + (F.lit(HLL_M) - F.count(F.lit(1))) * zero_term)
                 .cast("long").alias("__s"))
            .select(*group_cols, "n_registers",
                    (F.lit(HLL_K) / F.col("__s").cast("double"))
                    .alias("hll_estimate")))


def hll_distinct(df: DataFrame, group_cols: Sequence[str],
                 hash_col: Column) -> DataFrame:
    """Per-group HyperLogLog distinct estimate. `hash_col` must be a
    60-bit deterministic hash (training.dedup.md5_long). Two hash
    aggregations; sketch size 64 registers per group regardless of
    input size. Returns (*group_cols, n_registers, hll_estimate)."""
    return hll_estimate_from_registers(
        hll_registers(df, group_cols, hash_col), group_cols)


# --- Count-min sketch ------------------------------------------------------

# Depth×width sized for the synthetic corpus (500-50k docs); at 100 TB
# widen w (error ~ 2N/w) — the sketch stays d*w cells regardless of
# input size, which is the entire point.
CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_pos(key, j: int, width: int):
    from ..training.dedup import md5_long
    return md5_long(F.concat(F.lit(f"cms{j}:"), key)) % width


def cms_sketch(df: DataFrame, key_col: str,
               depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Count-min sketch of key frequencies: exactly depth*width cells
    (j, pos, c) from ONE aggregation with map-side combine — the
    mergeable fixed-size summary that answers heavy-hitter queries
    over a corpus too large to exactly count per key. Deterministic
    (md5-derived row hashes), so two engines build identical cells."""
    rows = F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _cms_pos(F.col(key_col), j, width).alias("pos"))
        for j in range(depth)])).alias("cell")
    return (df.select(rows)
            .groupBy(F.col("cell.j").alias("j"),
                     F.col("cell.pos").alias("pos"))
            .agg(F.count(F.lit(1)).cast("long").alias("c")))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Point-estimate each key against a sketch: min over the key's
    depth cells. The sketch is depth*width rows — always broadcast —
    so estimation is a zero-shuffle map over the key set. Guarantees
    estimate >= true count (the operator never undercounts): the
    sketch stores only non-zero cells, so a probed cell absent from it
    counts as 0 (left join + coalesce) and a key never seen by the
    sketched corpus estimates to exactly 0 instead of vanishing."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     _cms_pos(F.col(key_col), j, width).alias("pos"))
            for j in range(depth)])).alias("cell"))
    return (probes
            .join(F.broadcast(sketch),
                  (probes.cell.j == sketch.j) & (probes.cell.pos == sketch.pos),
                  "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long")))
                 .alias("cms_estimate")))


# --- HDR-histogram quantile sketch ----------------------------------------

# Relative-error knob: values inside one power of two are split into
# HDR_K linear sub-buckets, so a quantile read off the bucket's lower
# edge is within 1/HDR_K of the true value. 16 sub-buckets → ≤6.25%,
# and at most 63*HDR_K cells per group regardless of input size.
HDR_K = 16


def hdr_bucket(value, k: int = HDR_K):
    """Bucket id for a positive integer metric: e*k + sub, where
    e = floor(log2(x)) and sub linearly splits [2^e, 2^(e+1)).

    Pure int64 arithmetic — floor(log2(x)) is length(bin(x)) - 1 and
    the sub-bucket is an integer division — so Spark and any SQL
    oracle agree bit-for-bit (a float-log bucket boundary, as in
    DDSketch's gamma^i, would not survive two engines' libm)."""
    assert k & (k - 1) == 0, "k must be a power of two (exactness)"
    x = F.col(value).cast("long") if isinstance(value, str) else value.cast("long")
    e = (F.length(F.bin(x)) - 1).cast("int")
    # 2^e via pow: exact for every power of two a long can hold (both
    # engines' pow returns representable integer results exactly).
    p2 = F.pow(F.lit(2.0), e.cast("double")).cast("long")
    # (x-p2)/p2*k is pure exponent arithmetic (divisor and k are
    # powers of two), hence bit-exact for metrics below 2^53 — the
    # stated domain; beyond that a sub-bucket edge could round.
    sub = F.floor((x - p2).cast("double") / p2.cast("double") * k)
    return (e * k + sub).cast("int")


def hdr_sketch(df: DataFrame, group_cols: Sequence[str], value_col: str,
               k: int = HDR_K) -> DataFrame:
    """Mergeable quantile sketch: (group..., bucket, c) from ONE
    hash aggregation with map-side combine. Rows with value < 1 are
    out of the sketch's positive domain and excluded (count them
    separately if the metric can be zero). The fixed cell bound makes
    the sketch broadcastable and cheap to store per partition/day for
    later merging — the quantile analog of the HLL register frame."""
    x = F.col(value_col).cast("long")
    return (df.where(x >= 1)
            .select(*group_cols, hdr_bucket(x, k).alias("bucket"))
            .groupBy(*group_cols, "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("c")))


def hdr_merge(sketches: Sequence[DataFrame],
              group_cols: Sequence[str]) -> DataFrame:
    """Merge sketches by summing per-cell counts — associative and
    commutative, so partial sketches from any partitioning of the data
    (days, sources, incremental batches) combine into exactly the
    sketch of the union; `hdr_state_merge` pins merge == recompute."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.groupBy(*group_cols, "bucket")
            .agg(F.sum("c").cast("long").alias("c")))


def hdr_quantiles(sketch: DataFrame, group_cols: Sequence[str],
                  qs: Sequence[float], k: int = HDR_K) -> DataFrame:
    """Per-group quantile estimates from a sketch: for each q, the
    lower edge of the first bucket whose cumulative count reaches rank
    floor(q*(n-1)) + 1. One window pass over the (bounded) sketch plus
    a literal-array explode — never touches the original data.
    Estimates are exact doubles of exact integers (2^e * (1 + sub/k)
    with one fixed-order division), so two engines agree bitwise."""
    group_cols = list(group_cols)
    w = Window.partitionBy(*group_cols).orderBy("bucket")
    cum = sketch.select(
        *group_cols, "bucket",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy(*group_cols)).alias("n"))
    expanded = cum.select(
        "*", F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"))
    rank = F.floor(F.col("q") * (F.col("n") - 1).cast("double")) + 1
    picked = (expanded.groupBy(*group_cols, "q")
              .agg(F.max("n").cast("long").alias("n"),
                   F.min(F.when(F.col("cum") >= rank, F.col("bucket")))
                   .alias("bucket")))
    e = F.floor(F.col("bucket") / k).cast("int")
    sub = F.col("bucket") % k
    est = (F.pow(F.lit(2.0), e.cast("double"))
           * (F.lit(1.0) + sub.cast("double") / F.lit(float(k))))
    return picked.select(*group_cols, "q", "n", est.alias("est"))


# --- Bloom filter ---------------------------------------------------------

# Bits sized for the synthetic corpora (sf0.01: ~21k distinct shingle
# keys -> ~0.6% false-positive rate at 4 hashes). At 100 TB size m at
# ~10 bits/key for ~1% fpr — the sketch stays m/32 rows (one BIGINT
# word per row) regardless of corpus size, and build/merge/probe cost
# is unchanged. Bits-per-word is 32 so a set bit is always a positive
# BIGINT (no sign games two engines could disagree on).
BLOOM_HASHES = 4
BLOOM_BITS = 1 << 18
BLOOM_WORD_BITS = 32


def _bloom_pos(key: Column, j: int, m: int) -> Column:
    from ..training.dedup import md5_long
    return md5_long(F.concat(F.lit(f"bf{j}:"), key)) % m


def _bloom_cells(key: Column, n_hashes: int, m: int) -> Column:
    """array of (word, bit-mask) cells for one key — a pure projection."""
    cells = []
    for j in range(n_hashes):
        pos = _bloom_pos(key, j, m)
        # 2^bit via pow: exact for bit <= 31 (shiftleft needs a
        # literal shift amount; pow of two is IEEE-exact here).
        cells.append(F.struct(
            (pos / BLOOM_WORD_BITS).cast("long").alias("word"),
            F.pow(F.lit(2.0), (pos % BLOOM_WORD_BITS).cast("double"))
            .cast("long").alias("mask")))
    return F.array(*cells)


def bloom_sketch(df: DataFrame, key_col: str,
                 n_hashes: int = BLOOM_HASHES,
                 m: int = BLOOM_BITS) -> DataFrame:
    """Bloom-filter membership sketch of a key column: at most m/32
    rows (word, bits) from ONE hash aggregation with map-side combine
    (bit_or is associative+commutative, so partial aggregation is
    exact). Deterministic md5-derived positions — two engines build
    identical words, so the sketch itself is oracle-checkable, not
    just its error bound. Zero rows for zero input; absent words mean
    all-zero bits."""
    return (df.select(F.explode(_bloom_cells(F.col(key_col), n_hashes, m))
                      .alias("cell"))
            .groupBy(F.col("cell.word").alias("word"))
            .agg(F.bit_or(F.col("cell.mask")).cast("long").alias("bits")))


def bloom_merge(sketches: Sequence[DataFrame]) -> DataFrame:
    """OR-merge partial sketches: union + per-word bit_or — Bloom's
    defining property (sketch(A ∪ B) == merge(sketch(A), sketch(B))),
    so shards/batches sketch independently and combine in O(words)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (out.groupBy("word")
            .agg(F.bit_or("bits").cast("long").alias("bits")))


def bloom_probe(sketch: DataFrame, keys: DataFrame, key_col: str,
                n_hashes: int = BLOOM_HASHES,
                m: int = BLOOM_BITS) -> DataFrame:
    """Membership probe: key maybe-present iff ALL its bits are set.
    The sketch is ≤ m/32 rows — broadcast — so probing is a
    zero-shuffle map over the key set. Never a false negative (every
    inserted key's bits are set by construction); false positives at
    the designed rate. Returns (key_col, bloom_hit boolean)."""
    probes = keys.select(
        F.col(key_col),
        F.explode(_bloom_cells(F.col(key_col), n_hashes, m)).alias("cell"))
    hit = ((F.coalesce(F.col("bits"), F.lit(0).cast("long"))
            .bitwiseAND(F.col("cell.mask"))) != 0).cast("int")
    return (probes
            .join(F.broadcast(sketch), probes.cell.word == sketch.word,
                  "left")
            .groupBy(key_col)
            .agg((F.min(hit) == 1).alias("bloom_hit")))


def hdr_percentile_assign(df: DataFrame, sketch: DataFrame,
                          value_col: str,
                          k: int = HDR_K) -> DataFrame:
    """Assign every row its percentile WITHOUT a global sort: join the
    row's HDR bucket against the broadcast cumulative histogram and
    report the strictly-below fraction (and its bucket's mass, so
    callers see the resolution). The 100 TB way to quantile-normalize
    a signal — a window over the corpus sorts everything; this is one
    zero-skew broadcast join against ≤63k cells, exact to bucket
    resolution (≤1/k relative error on the value axis, the sketch's
    own bound). Rows below the sketch domain (< 1) get percentile 0.0.

    Output: df columns + `pct_below` (double in [0,1)) +
    `pct_bucket_mass` (fraction of rows sharing the bucket).
    Exactness: both fractions are single divisions of exact integer
    counts from the (corpus-wide) sketch — bit-identical cross-engine.
    """
    from pyspark.sql import Window

    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1)
    cum = (sketch.select("bucket", "c")
           .withColumn("below", F.coalesce(F.sum("c").over(w),
                                           F.lit(0)).cast("long"))
           .crossJoin(F.broadcast(
               sketch.agg(F.sum("c").cast("long").alias("total")))))
    x = F.col(value_col).cast("long")
    bucketed = df.withColumn(
        "__b", F.when(x >= 1, hdr_bucket(x, k)).otherwise(F.lit(-1)))
    joined = bucketed.join(
        F.broadcast(cum.withColumnRenamed("bucket", "__b")), "__b", "left")
    return (joined
            .withColumn("pct_below",
                        F.when(F.col("__b") < 0, F.lit(0.0))
                        .otherwise(F.col("below").cast("double")
                                   / F.col("total").cast("double")))
            .withColumn("pct_bucket_mass",
                        F.when(F.col("__b") < 0, F.lit(0.0))
                        .otherwise(F.col("c").cast("double")
                                   / F.col("total").cast("double")))
            .drop("__b", "c", "below", "total"))
