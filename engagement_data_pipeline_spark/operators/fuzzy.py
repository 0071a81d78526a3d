"""Fuzzy (edit-distance) self-join via SymSpell deletion
neighborhoods — entity resolution without the O(n²) cross product.

The reference de-duplicates participants by exact urn/uuid equality
(SURVEY §2.3 F3; `src/rapid_pro_to_engagement_db/rapid_pro_to_engagement_db.py:186-190`
looks up each message by exact origin-id); real contact data also
needs NEAR-matches — names or handles that differ by one typo. The
classic scalable construction (Garbe's SymSpell) turns "edit distance
≤ 1" into an EQUI-join:

    keys(s) = {s} ∪ {s with one character deleted}

Two strings within edit distance 1 ALWAYS share a key:
  * substitution at position i  → both sides' delete-at-i keys equal;
  * insertion/deletion of a char → the longer side's delete-at-i key
    equals the shorter string itself.
So blocking recall is exactly 100% — unlike q-gram blocking there is
no recall trade to document — and the verify step (one `levenshtein`
call per candidate pair) only DISCARDS false candidates, including
any md5 key collisions. Candidates are joined on the 60-bit hash of
each key, so the shuffle moves fixed-width longs, never strings.

Shape at scale: |s|+1 keys per row (explode), one equi-join on the
key hash, distinct on the (left,right) pair, one levenshtein verify.
For a 100 TB corpus of short entity strings this is O(n·len) join
input — the cross product never exists. Skewed keys (a deletion
shared by thousands of entities) are real duplicates' neighborhoods;
cap explosion with a df guard only if a key's fan-out is hostile
(same knob as `training/dedup.py`'s stop-gram cap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..training.dedup import md5_long


def deletion_keys(col):
    """{s} ∪ one-char-deletions(s), as an array column."""
    c = F.col(col) if isinstance(col, str) else col
    dels = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1))),
        lambda i: F.concat(c.substr(F.lit(1), i - 1),
                           c.substr(i + 1, F.length(c))),
    )
    return F.array_distinct(F.concat(F.array(c), dels))


def fuzzy_pairs_ed1(df: DataFrame, key_col: str, text_col: str) -> DataFrame:
    """All pairs (left_key < right_key) whose `text_col` values are
    within edit distance 1, with the distance. Exact: the deletion
    neighborhood guarantees every qualifying pair becomes a candidate,
    and the levenshtein verify removes everything else. `key_col`
    must identify rows uniquely (it is the pair key of the result)."""
    keyed = df.select(F.col(key_col).alias("k"), F.col(text_col).alias("s"))
    # Cached NARROW: the self-join references the exploded neighborhood
    # on both sides and Catalyst duplicates the subtree — the deletion
    # explode + md5 pass would run twice without the cache. Only
    # (key, key-hash) is cached: the exploded frame holds |s|+1 rows
    # per entity, so carrying the text would duplicate the whole
    # corpus ~avg_len times in executor storage (guide §8 "decide with
    # small rows"); the candidate decision needs only hashes, and the
    # texts re-attach from the un-exploded input for the
    # candidate-sized verify.
    from ..session import scoped_cache

    exploded = scoped_cache(keyed.select(
        "k", F.explode(deletion_keys(F.col("s"))).alias("v")
    ).select("k", md5_long(F.col("v")).alias("vh")))
    right = exploded.select(F.col("k").alias("rk"),
                            F.col("vh").alias("rvh"))
    cand = (exploded.join(right, (exploded["vh"] == right["rvh"])
                          & (exploded["k"] < right["rk"]))
            .select(F.col("k").alias("left_key"),
                    F.col("rk").alias("right_key"))
            .distinct())
    lt = keyed.select(F.col("k").alias("left_key"),
                      F.col("s").alias("left_s"))
    rt = keyed.select(F.col("k").alias("right_key"),
                      F.col("s").alias("right_s"))
    return (cand.join(lt, "left_key").join(rt, "right_key")
            .withColumn("dist", F.levenshtein("left_s", "right_s").cast("int"))
            .where(F.col("dist") <= 1)
            .select("left_key", "right_key", "dist"))
