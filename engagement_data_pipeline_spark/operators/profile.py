"""ANALYZE-style column statistics in one table pass.

The statistics a cost-based optimizer (or a data steward) wants per
column — row count, null count, exact distinct count, numeric
min/max — computed for EVERY requested column in a single scan +
single aggregation, then unpivoted to one row per column. The
reference's metrics sync computes per-dataset counts one query at a
time (src/engagement_db_coda_sync — SURVEY §2.5 G6); this is the
engine-level generalization, and the same shape Spark's own
``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` produces (here
as a composable DataFrame, not a catalog side effect).

Shape at scale: ONE aggregation over the scan. Multiple exact
count_distincts expand the input (one Expand pass, same machinery as
the rollup operator) — the honest cost of exact NDVs; callers who can
tolerate ±2% at 100 TB pass ``approx=True`` for
approx_count_distinct (HLL-based, no Expand). Numeric min/max are
exported as doubles (ints below 2^53 convert exactly and identically
in both engines; strings/timestamps report NULL — cross-engine string
formatting is not bit-stable, the same trade as _helpers.micros).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def column_stats(df: DataFrame, cols: Sequence[str] | None = None,
                 approx: bool = False) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_value, max_value) —
    one row per requested column, one aggregation over `df`."""
    cols = list(df.columns) if cols is None else list(cols)
    numeric = {f.name for f in df.schema.fields
               if isinstance(f.dataType, NumericType)}
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).cast("long")
                    .alias(f"__nulls_{c}"))
        nd = (F.approx_count_distinct(c) if approx
              else F.count_distinct(F.col(c)))
        aggs.append(nd.cast("long").alias(f"__nd_{c}"))
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    rows = []
    for c in cols:
        mn = (F.col(f"__min_{c}") if c in numeric
              else F.lit(None).cast("double"))
        mx = (F.col(f"__max_{c}") if c in numeric
              else F.lit(None).cast("double"))
        rows.append(F.struct(
            F.lit(c).alias("column"), F.col("__n").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            mn.alias("min_value"), mx.alias("max_value")))
    return (wide.select(F.explode(F.array(*rows)).alias("s"))
            .select("s.column", "s.n_rows", "s.n_nulls", "s.n_distinct",
                    "s.min_value", "s.max_value"))


def schema_drift(old, new) -> list[dict]:
    """Column-level drift between two schemas (StructType or
    DataFrame): added / removed / type_changed / nullability_changed,
    in new-schema column order then removed columns. Pure metadata —
    no jobs run — which is what a contract check in front of a 100 TB
    write should cost; pair with `operators/quality.expect` for the
    value-level rules and `streaming/ingest.foreach_batch_upsert`'s
    union-schema evolution for the apply side."""
    os_ = old.schema if hasattr(old, "schema") else old
    ns = new.schema if hasattr(new, "schema") else new
    of = {f.name: f for f in os_.fields}
    nf = {f.name: f for f in ns.fields}
    drift = []
    for name, f in nf.items():
        o = of.get(name)
        if o is None:
            drift.append({"column": name, "change": "added",
                          "old_type": None,
                          "new_type": f.dataType.simpleString()})
        elif o.dataType != f.dataType:
            drift.append({"column": name, "change": "type_changed",
                          "old_type": o.dataType.simpleString(),
                          "new_type": f.dataType.simpleString()})
        elif o.nullable != f.nullable:
            drift.append({"column": name, "change": "nullability_changed",
                          "old_type": o.dataType.simpleString(),
                          "new_type": f.dataType.simpleString()})
    for name, o in of.items():
        if name not in nf:
            drift.append({"column": name, "change": "removed",
                          "old_type": o.dataType.simpleString(),
                          "new_type": None})
    return drift
