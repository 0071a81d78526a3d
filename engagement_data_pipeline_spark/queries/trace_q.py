"""Registry query for TracedData-style provenance (SURVEY §1.4):
run the fetch→filter spine with an append-only trace column, then
append exactly one imputation-outcome entry per message (the entry an
M1/M3 mutation would log via append_data). The oracle re-derives the
same path from the flattened flags, so the provenance mechanics are
value-hash checked end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.trace import append_trace, init_trace, trace_path
from .engagement import _FILTERED_CTE, _filtered


def traced_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _filtered(spark, sf_dir)
    labels = F.col("labels")
    text_empty = F.col("text").isNull() | (F.col("text") == "")
    has_checked = F.exists(labels, lambda l: l["checked"])
    has_unchecked = F.exists(labels, lambda l: ~l["checked"])

    df = init_trace(df, "fetch")
    df = append_trace(df, "filter")
    # Mutually exclusive M1/M3 outcomes — conditional appends, as the
    # reference's imputation functions only touch the rows they change.
    df = append_trace(df, "impute:nc", text_empty)
    df = append_trace(df, "impute:ce",
                      ~text_empty & has_checked & has_unchecked)
    df = append_trace(df, "impute:nr", ~text_empty & ~has_checked)
    df = append_trace(df, "impute:coded",
                      ~text_empty & has_checked & ~has_unchecked)
    return df.select(
        "message_id", "dataset",
        trace_path().alias("trace_path"),
        F.size("trace").alias("n_trace"))


TRACED_PROVENANCE_SQL = "WITH " + _FILTERED_CTE + """
SELECT message_id, dataset,
       'fetch;filter;' || CASE
         WHEN (text IS NULL OR text = '') THEN 'impute:nc'
         WHEN (label_checked IS TRUE OR label2_checked IS TRUE)
              AND (label_checked IS FALSE OR label2_checked IS FALSE)
           THEN 'impute:ce'
         WHEN NOT (label_checked IS TRUE OR label2_checked IS TRUE)
           THEN 'impute:nr'
         ELSE 'impute:coded'
       END AS trace_path,
       3 AS n_trace
FROM filtered
"""
