"""TracedData-style provenance (SURVEY §1.4): an append-only history
column recording which pipeline stages touched (or mutated) each row.

The reference wraps every row in `TracedData` and each mutation calls
`.append_data(values, Metadata(user, call_location, timestamp))`
(reference traced_data_filters.py:58, column_view_conversion.py:
253-260). The relational analog is a `trace` array<struct> column:
stages append an entry — unconditionally for pass-through stages,
conditionally (only for the rows they actually changed) for mutators,
which is exactly what append_data semantics give in the reference.

Scale: the trace is data-parallel column math (concat of a literal
struct), no shuffle, no UDF; at 100 TB the column costs what any
array column costs and prunes away when unused.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACE_COL = "trace"

_TRACE_DDL = "array<struct<stage:string,user:string>>"


def _entry(stage: str, user: str) -> Column:
    return F.struct(F.lit(stage).alias("stage"), F.lit(user).alias("user"))


def init_trace(df: DataFrame, stage: str, user: str = "pipeline",
               trace_col: str = TRACE_COL) -> DataFrame:
    """Start the history: every row gets its first entry."""
    return df.withColumn(trace_col, F.array(_entry(stage, user)))


def append_trace(df: DataFrame, stage: str, condition: Column | None = None,
                 user: str = "pipeline", trace_col: str = TRACE_COL) -> DataFrame:
    """Append one entry — to every row, or (like the reference's
    append_data inside an imputation function) only to the rows the
    stage changed, via `condition`."""
    appended = F.concat(F.col(trace_col), F.array(_entry(stage, user)))
    if condition is None:
        return df.withColumn(trace_col, appended)
    return df.withColumn(
        trace_col, F.when(condition, appended).otherwise(F.col(trace_col)))


def trace_path(trace_col: str = TRACE_COL, sep: str = ";") -> Column:
    """The history as a readable path string (JSONL-export friendly,
    and hash-comparable in the oracle gate)."""
    return F.concat_ws(sep, F.transform(F.col(trace_col), lambda e: e["stage"]))
