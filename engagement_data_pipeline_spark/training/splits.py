"""Deterministic train/validation/test split assignment.

The last step before a corpus ships to a trainer: every document gets
exactly one split label, reproducibly, with no leakage. Two variants
with different guarantees (both deterministic given the salt, both
oracle-mirrorable integer arithmetic — no RNG state anywhere):

* `split_assign_hash` — zero-shuffle projection. A doc's 60-bit md5
  point is compared against fixed rational thresholds of the 60-bit
  space. Fractions hold in expectation; the property bought is
  STABILITY — a document's split never changes when the corpus grows,
  so yesterday's test set is still disjoint from tomorrow's train
  run (the fleet-wide convention for held-out sets). `group_col`
  hashes a grouping key instead of the id, sending every row of a
  group (all messages of one participant, all chunks of one doc) to
  the same split — the leakage guard group k-fold exists for.
* `split_assign_exact` — exact per-stratum counts: rank rows within
  each stratum by salted hash and cut at integer boundaries
  floor(n·cum_num/den). ONE window shuffle keyed by the strata
  columns; counts are exact at any scale, but assignments are only
  stable for a fixed corpus snapshot.

Reference analog: the pipeline's deterministic uuid-keyed splits of
participants into advert audiences (sync_back.advert_sync_batch,
SURVEY §2.2 K7) — same salted-hash idea, generalized to n-way
stratified splits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_long

#: (name, numerator) split weights over a common denominator.
DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (
    ("train", 18), ("val", 1), ("test", 1))
DEFAULT_DEN = 20
HASH_SPACE = 1 << 60  # md5_long range


def _check(splits: Sequence[tuple[str, int]], den: int) -> None:
    if den <= 0 or any(num <= 0 for _, num in splits):
        raise ValueError("split weights must be positive")
    if sum(num for _, num in splits) != den:
        raise ValueError("split numerators must sum to the denominator")


def split_assign_hash(docs: DataFrame,
                      splits: Sequence[tuple[str, int]] = DEFAULT_SPLITS,
                      den: int = DEFAULT_DEN,
                      id_col: str = "doc_id",
                      group_col: str | None = None,
                      salt: str = "split-v1") -> DataFrame:
    """Append a `split` column via fixed hash thresholds — stable,
    zero-shuffle, group-cohesive when `group_col` is given."""
    _check(splits, den)
    key = F.col(group_col if group_col is not None else id_col)
    u = md5_long(F.concat_ws("|", F.lit(salt), key.cast("string")))
    cum = 0
    expr = None
    for name, num in splits[:-1]:
        cum += num
        thr = (HASH_SPACE * cum) // den  # exact python int, plan literal
        branch = (F.when(u < F.lit(thr), F.lit(name)) if expr is None
                  else expr.when(u < F.lit(thr), F.lit(name)))
        expr = branch
    last = splits[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return docs.withColumn("split", split)


def split_assign_exact(docs: DataFrame,
                       splits: Sequence[tuple[str, int]] = DEFAULT_SPLITS,
                       den: int = DEFAULT_DEN,
                       id_col: str = "doc_id",
                       strata_cols: Sequence[str] = (),
                       salt: str = "split-v1") -> DataFrame:
    """Append a `split` column with EXACT integer counts per stratum:
    rank by salted hash (id tiebreak — total order, so ties cannot
    straddle a boundary nondeterministically) and cut at
    floor(n·cum/den). Row i of a stratum of n rows gets split s where
    boundary(s-1) <= i < boundary(s); the last split takes the
    rounding tail."""
    _check(splits, den)
    u = md5_long(F.concat_ws("|", F.lit(salt),
                             F.col(id_col).cast("string")))
    w = Window.partitionBy(*[F.col(c) for c in strata_cols])
    r = F.row_number().over(w.orderBy(u.asc(), F.col(id_col).asc())) - 1
    n = F.count(F.lit(1)).over(w)
    out = docs.withColumn("__r", r).withColumn("__n", n)
    cum = 0
    expr = None
    for name, num in splits[:-1]:
        cum += num
        bound = F.expr(f"(__n * {cum}) div {den}")
        branch = (F.when(F.col("__r") < bound, F.lit(name))
                  if expr is None
                  else expr.when(F.col("__r") < bound, F.lit(name)))
        expr = branch
    last = splits[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return out.withColumn("split", split).drop("__r", "__n")


def split_assign_exact_groups(docs: DataFrame, group_col: str,
                              splits: Sequence[tuple[str, int]] = DEFAULT_SPLITS,
                              den: int = DEFAULT_DEN,
                              strata_cols: Sequence[str] = (),
                              salt: str = "split-v1") -> DataFrame:
    """Exact-count + leakage-guarded: assign whole GROUPS (all rows of
    a participant/source document share one split) with exact integer
    counts at group granularity — the combination neither base variant
    offers (hash = cohesive but approximate; exact = precise but
    row-grained). One distinct over (strata, group) + the strata-keyed
    window of `split_assign_exact` + one join back keyed on the group
    — all shuffles on the group/strata keys."""
    keys = [*strata_cols, group_col]
    groups = docs.select(*keys).distinct()
    assigned = split_assign_exact(groups, splits, den, id_col=group_col,
                                  strata_cols=strata_cols, salt=salt)
    return docs.join(assigned.select(*keys, "split"), keys)


def kfold_assign(docs: DataFrame, k: int, key_col: str = "doc_id",
                 salt: str = "kfold-v1",
                 fold_col: str = "fold") -> DataFrame:
    """Deterministic k-fold cross-validation assignment: fold =
    md5_long(salt|key) mod k. Hash-stable like `split_assign_hash`
    (a grown corpus never moves an existing row to another fold, so
    fold models stay comparable across refreshes), zero-shuffle (a
    pure projection), and cross-engine exact via the md5 idiom.
    Train fold i's model on `fold != i`, evaluate on `fold == i`."""
    if k <= 1:
        raise ValueError("k-fold needs k >= 2")
    u = md5_long(F.concat_ws("|", F.lit(salt),
                             F.col(key_col).cast("string")))
    return docs.withColumn(fold_col, F.pmod(u, F.lit(k)).cast("int"))
