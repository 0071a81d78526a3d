"""CDC snapshot diff: the changeset between two states of a keyed
table.

The reference syncs each source into the engagement DB by comparing
what it fetched against what the DB already holds, one message at a
time (SURVEY §2.12; rapid_pro_to_engagement_db.py:175-221 does a
lookup-before-write per message). At warehouse scale the same
semantics is a set operation: FULL OUTER JOIN the old and new
snapshots on the key and classify every row as insert / update /
delete, with per-column change detection driving partial updates
downstream. One shuffle on the key (or zero with co-bucketed
snapshots); AQE handles key skew.

`snapshot_diff` is the engine-side building block; callers feed any
two frames with a common key. Comparison is null-safe (NULL -> value,
value -> NULL, and value change all count as updates)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame,
                  key_cols: Sequence[str],
                  compare_cols: Sequence[str]) -> DataFrame:
    """Changeset rows: key columns + `op` ('insert'|'update'|'delete')
    + `changed_cols` (comma-joined compare columns whose value
    differs null-safely; '' for insert/delete). Unchanged rows are
    dropped — at scale the changeset is tiny relative to the
    snapshots, so everything downstream is cheap."""
    o = old.select(*key_cols, *compare_cols)
    n = new.select(*key_cols, *compare_cols)
    for c in list(key_cols) + list(compare_cols):
        o = o.withColumnRenamed(c, f"__o_{c}")
        n = n.withColumnRenamed(c, f"__n_{c}")
    cond = None
    for k in key_cols:
        eq = F.col(f"__o_{k}") == F.col(f"__n_{k}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")

    in_old = F.col(f"__o_{key_cols[0]}").isNotNull()
    in_new = F.col(f"__n_{key_cols[0]}").isNotNull()
    # concat_ws skips NULL args, so unchanged columns vanish from the
    # list; order is the caller's compare_cols order.
    changed = F.concat_ws(",", *[
        F.when(~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c))
        for c in compare_cols])
    op = (F.when(~in_old, F.lit("insert"))
          .when(~in_new, F.lit("delete"))
          .otherwise(F.lit("update")))
    keys = [F.coalesce(F.col(f"__o_{k}"), F.col(f"__n_{k}")).alias(k)
            for k in key_cols]
    return (j.select(*keys, op.alias("op"),
                     F.when(in_old & in_new, changed)
                     .otherwise(F.lit("")).alias("changed_cols"))
            .where((F.col("op") != "update") | (F.col("changed_cols") != "")))


def versioned_changeset(versioned: DataFrame, key_cols: Sequence[str],
                        ts_col: str, cut,
                        compare_cols: Sequence[str]) -> DataFrame:
    """The same changeset when BOTH snapshots derive from one
    versioned table: old = latest version at or before `cut`, new =
    latest overall.

    `snapshot_diff` on two windowed snapshots of the same table costs
    two window shuffles plus a full-outer-join shuffle; here one
    grouped aggregation computes both states per key (max_by overall,
    max_by filtered to <= cut) and diffs them in-row — ONE shuffle
    with map-side partial aggregation, which is the difference between
    feasible and not at 100 TB. Requires `ts_col` to be unique per key
    (version timestamps); deletes need tombstone versions, which an
    append-only table doesn't have, so `op` here is insert/update
    only."""
    ts = F.col(ts_col)
    state = F.struct(*[F.col(c) for c in compare_cols])
    g = versioned.groupBy(*key_cols).agg(
        F.max_by(F.when(ts <= cut, state), F.when(ts <= cut, ts))
        .alias("__old"),
        F.max_by(state, ts).alias("__new"))
    in_old = F.col("__old").isNotNull()
    changed = F.concat_ws(",", *[
        F.when(~F.col(f"__old.{c}").eqNullSafe(F.col(f"__new.{c}")),
               F.lit(c))
        for c in compare_cols])
    return (g.select(
                *key_cols,
                F.when(~in_old, F.lit("insert")).otherwise(F.lit("update"))
                .alias("op"),
                F.when(in_old, changed).otherwise(F.lit(""))
                .alias("changed_cols"))
            .where((F.col("op") != "update") | (F.col("changed_cols") != "")))


def scd2_from_versions(versioned: DataFrame, key_cols: Sequence[str],
                       ts_col: str,
                       state_cols: Sequence[str]) -> DataFrame:
    """Slowly-changing-dimension Type 2 build from a versioned
    history: one row per (key, distinct consecutive state) with
    `valid_from` / `valid_to` / `is_current` — the warehouse shape for
    "what did this message look like on date X" questions the
    reference answers by re-reading old Firestore exports (SURVEY
    §2.1 S1's full-table snapshots).

    Two steps, ONE shuffle on the key:
    1. Change compression — consecutive versions whose `state_cols`
       all match null-safely collapse into the earlier row (a
       re-snapshot without a change must not open a new validity
       interval).
    2. Interval assembly — `valid_to` = next surviving row's
       `valid_from` (half-open intervals, so `valid_from <= t <
       valid_to` partitions time exactly); the last row per key is
       `is_current` with NULL `valid_to`.

    Both windows share the same partitioning, so the second pays no
    extra exchange. Ties on `ts_col` are broken by the key columns for
    determinism; a true duplicate (same key + ts) should be resolved
    upstream by F1 `latest_snapshot`.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(k) for k in key_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.row_number().over(w) == 1
    for c in state_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    # Window expressions can't sit in WHERE: project the flag, filter.
    compressed = (versioned.withColumn("__scd2_open", changed)
                  .where(F.col("__scd2_open")).drop("__scd2_open"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    valid_to = F.lead(ts_col).over(w2)
    return compressed.select(
        *key_cols, *state_cols,
        F.col(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().alias("is_current"))
