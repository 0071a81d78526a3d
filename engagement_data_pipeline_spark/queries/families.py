"""Family checksum queries: one registry row that hash-verifies MANY
member queries.

Why: CORRECTNESS_r02.json recorded exactly the first 50 entries of the
registry the driver ran (the 4 entries at positions 50-53 of that
snapshot are precisely the 4 with no row), so a registry larger than
50 silently loses driver evidence for its tail. Each family query
computes, per member, an order-insensitive result checksum —
``(member, n_rows, checksum)`` — with the SAME canonicalisation in
Spark and in the DuckDB oracle, so one green family row certifies
row-count + value equality for every member, wherever the member's own
row lands relative to the cap.

This is also a first-class pipeline operator in its own right:
result-set fingerprinting is how a 100 TB curation pipeline regression-
tests itself between releases (recompute the per-table checksum, diff
against the manifest) without shipping the tables anywhere.

Canonicalisation (engine-neutral by construction):
- columns sorted by name, joined with chr(31);
- NULL -> chr(1)||'N' sentinel (concat_ws would otherwise silently
  drop NULLs — both engines skip NULL args);
- string as-is; int/bigint via decimal cast; boolean via int cast;
- double -> CAST(ROUND(x * 1e6) AS BIGINT): both engines round half
  away from zero, and the scaled integer sidesteps float-to-string
  formatting divergence (Spark '1.0E-7' vs DuckDB '1e-07');
- row hash = first 15 hex chars of md5 as a 60-bit int (the repo's
  one cross-engine hash idiom, training/dedup.py:md5_long);
- checksum = SUM(row_hash) % MOD, summed in decimal/HUGEINT so a
  100 TB row count cannot overflow, reduced to bigint.

At scale each member checksum is a single map-side-combinable
aggregation over the member's plan — no extra shuffle beyond the
member's own.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Largest prime below 1e18: keeps SUM % MOD inside a BIGINT in both
#: engines while leaving 60 collision-free bits per row hash.
CHECKSUM_MOD = 999999999999999989

_NULL = "\x01N"
_SEP = "\x1f"

# chr()-built fragments for the DuckDB side (no control chars inline
# in the generated SQL).
_NULL_SQL = "(chr(1) || 'N')"
_SEP_SQL = "chr(31)"


def _canon_col(col: Column, dtype: str) -> Column:
    """Engine-neutral canonical string for one cell (Spark side)."""
    if dtype == "double":
        col = F.round(col * F.lit(1000000.0)).cast("bigint")
    elif dtype == "boolean":
        col = col.cast("int")
    elif dtype not in ("string",):
        # int/bigint (and any future decimal) render identically
        col = col.cast("string")
    return F.coalesce(col.cast("string"), F.lit(_NULL))


def _canon_sql(col: str, dtype: str) -> str:
    """The same canonical cell for the DuckDB oracle."""
    q = '"' + col + '"'
    if dtype == "double":
        expr = f"CAST(CAST(ROUND({q} * 1000000) AS BIGINT) AS VARCHAR)"
    elif dtype == "boolean":
        expr = f"CAST(CAST({q} AS INTEGER) AS VARCHAR)"
    else:
        expr = f"CAST({q} AS VARCHAR)"
    return f"COALESCE({expr}, {_NULL_SQL})"


def member_checksum(df: DataFrame, name: str,
                    schema_spec: Sequence[tuple[str, str]]) -> DataFrame:
    """(member, n_rows, checksum) for one member result.

    `schema_spec` is the authored (column, dtype) list the oracle SQL
    was generated from; the live DataFrame must match it exactly, so
    schema drift fails loudly here instead of as a silent hash
    mismatch.
    """
    actual = sorted((f.name, f.dataType.simpleString())
                    for f in df.schema.fields)
    expected = sorted((c, t) for c, t in schema_spec)
    if actual != expected:
        raise ValueError(
            f"family member {name}: schema drifted from authored spec; "
            f"expected {expected}, got {actual}")
    cols = [_canon_col(F.col(c), t) for c, t in expected]
    row = F.concat_ws(_SEP, *cols)
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("decimal(38,0)")
    return (df.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                (F.sum(h) % F.lit(CHECKSUM_MOD)).cast("long").alias("__ck"))
            .select(F.lit(name).alias("member"),
                    F.col("n_rows"),
                    F.coalesce(F.col("__ck"), F.lit(0)).alias("checksum")))


def member_checksum_sql(name: str, member_sql: str,
                        schema_spec: Sequence[tuple[str, str]]) -> str:
    expected = sorted((c, t) for c, t in schema_spec)
    cells = ", ".join(_canon_sql(c, t) for c, t in expected)
    row = f"concat_ws({_SEP_SQL}, {cells})"
    h = f"CAST(('0x' || substr(md5({row}), 1, 15)) AS BIGINT)"
    return f"""
SELECT '{name}' AS member,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(CAST({h} AS HUGEINT)) % {CHECKSUM_MOD}, 0)
            AS BIGINT) AS checksum
FROM ({member_sql}) "__member_{name}"
"""


def family_query(members: Mapping[str, tuple[
        Callable[[SparkSession, str], DataFrame],
        Sequence[tuple[str, str]]]]) -> Callable[[SparkSession, str],
                                                 DataFrame]:
    """Build a (spark, sf_dir) -> DataFrame over all member checksums.

    The result is a union of tiny single-row aggregations; each leg
    rides the member's own (often cached) plan.
    """
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        parts = [member_checksum(fn(spark, sf_dir), name, spec)
                 for name, (fn, spec) in members.items()]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        return out
    return run


def family_sql(members: Mapping[str, tuple[str,
               Sequence[tuple[str, str]]]]) -> str:
    return "\nUNION ALL\n".join(
        member_checksum_sql(name, sql, spec)
        for name, (sql, spec) in members.items())
