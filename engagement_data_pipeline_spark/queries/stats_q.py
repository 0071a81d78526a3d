"""Registry query for exact order statistics (operators/stats.py):
per-event-type nearest-rank percentiles of the metric value — the
exact counterpart of the `percentile_approx` sketch a 100 TB run
would use (the operator docstring spells out the trade)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.stats import exact_percentiles
from ._helpers import t

_PS = (50, 95)


def events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    return exact_percentiles(ev, ["event_type"], "value",
                             percents=_PS, tiebreak_cols=["event_id"])


EVENTS_PERCENTILES_SQL = f"""
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       MIN(value) AS min_value, MAX(value) AS max_value,
       MAX(CASE WHEN rn = floor((50 * n + 99) / 100)
                THEN value END) AS p50,
       MAX(CASE WHEN rn = floor((95 * n + 99) / 100)
                THEN value END) AS p95
FROM ranked GROUP BY event_type
"""


# --- HyperLogLog distinct sketch -----------------------------------------

from ..operators import stats as ST  # noqa: E402
from ..training.dedup import md5_long  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users, exact AND by a bit-replicable
    HyperLogLog sketch (operators/stats.py:hll_distinct): at 100 TB
    the exact countDistinct is the expensive path (full shuffle of
    the distinct keys) and the 64-register sketch is the cheap one;
    here both are emitted so the oracle pins the sketch's exact
    register arithmetic AND the estimate's error is visible."""
    ev = t(spark, sf_dir, "events")
    sketch = ST.hll_distinct(
        ev, ["event_type"],
        md5_long(F.col("user_id").cast("string")))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact"))
    return (sketch.join(exact, "event_type")
            .select("event_type", "n_exact", "n_registers",
                    "hll_estimate"))


def _hll_sql() -> str:
    wb = ST.HLL_W_BITS
    ladder = " ".join(
        f"WHEN w >= {1 << (wb - r)} THEN {r}" for r in range(1, wb + 1))
    h = "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
WITH hashed AS (
  SELECT event_type, user_id,
         {h} & {ST.HLL_M - 1} AS b,
         {h} >> {ST.HLL_P} AS w
  FROM events
),
terms AS (
  SELECT event_type, b,
         CASE {ladder} ELSE {wb + 1} END AS rho
  FROM hashed
),
regs AS (
  SELECT event_type, b,
         MIN(CAST(1 AS BIGINT) << ({ST.HLL_SHIFT} - rho)) AS m
  FROM terms GROUP BY event_type, b
),
sums AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_registers,
         CAST(SUM(m) + ({ST.HLL_M} - COUNT(*))
              * (CAST(1 AS BIGINT) << {ST.HLL_SHIFT}) AS BIGINT) AS s
  FROM regs GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM events GROUP BY event_type
)
SELECT s.event_type, e.n_exact, s.n_registers,
       {ST.HLL_K!r} / CAST(s.s AS DOUBLE) AS hll_estimate
FROM sums s JOIN exact e ON s.event_type = e.event_type
"""


EVENTS_HLL_DISTINCT_SQL = _hll_sql()


# --- HDR-histogram quantile sketch ----------------------------------------

_HDR_QS = (0.5, 0.9, 0.99)


def doc_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document-length quantiles read from the mergeable
    HDR sketch (operators/stats.py:hdr_sketch): the bounded-size,
    integer-exact quantile summary a 100 TB curation run stores per
    partition and merges at read time, instead of re-sorting the
    corpus. Estimates carry a proven ≤1/HDR_K relative error."""
    docs = t(spark, sf_dir, "documents")
    sk = ST.hdr_sketch(docs, ["source"], "n_chars")
    return ST.hdr_quantiles(sk, ["source"], _HDR_QS)


def hdr_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge == recompute, oracle-proven: sketch the corpus in two
    independent halves, merge the sketches, and emit the merged
    quantiles next to the full-recompute quantiles — the hash-checked
    witness that the sketch state is safely maintainable
    incrementally (the quantile analog of hll_state_merge)."""
    docs = t(spark, sf_dir, "documents")
    half_a = docs.where(F.col("doc_id") % 2 == 0)
    half_b = docs.where(F.col("doc_id") % 2 == 1)
    merged = ST.hdr_merge(
        [ST.hdr_sketch(half_a, ["source"], "n_chars"),
         ST.hdr_sketch(half_b, ["source"], "n_chars")], ["source"])
    qm = (ST.hdr_quantiles(merged, ["source"], _HDR_QS)
          .withColumnRenamed("est", "est_merged"))
    qf = (ST.hdr_quantiles(ST.hdr_sketch(docs, ["source"], "n_chars"),
                           ["source"], _HDR_QS)
          .select("source", "q", F.col("est").alias("est_full")))
    return qm.join(qf, ["source", "q"]).select(
        "source", "q", "n", "est_merged", "est_full")


def _hdr_cells_sql(where: str = "") -> str:
    k = ST.HDR_K
    return f"""
  SELECT source,
         CAST((length(bin(n_chars)) - 1) * {k}
              + floor((n_chars - pow(2, length(bin(n_chars)) - 1))
                      / pow(2, length(bin(n_chars)) - 1) * {k}) AS INT)
             AS bucket
  FROM documents WHERE n_chars >= 1{where}
"""


def _hdr_quantile_sql(sketch_cte: str, est_name: str = "est") -> str:
    k = ST.HDR_K
    qs = ", ".join(f"CAST({q} AS DOUBLE)" for q in _HDR_QS)
    return f"""
cum_{est_name} AS (
  SELECT source, bucket,
         SUM(c) OVER (PARTITION BY source ORDER BY bucket) AS cum,
         SUM(c) OVER (PARTITION BY source) AS n
  FROM {sketch_cte}
),
picked_{est_name} AS (
  SELECT source, q, CAST(MAX(n) AS BIGINT) AS n,
         MIN(CASE WHEN cum >= floor(q * (n - 1)) + 1
                  THEN bucket END) AS bucket
  FROM cum_{est_name} CROSS JOIN (SELECT unnest([{qs}]) AS q) qs
  GROUP BY source, q
),
q_{est_name} AS (
  SELECT source, q, n,
         pow(2, floor(bucket / {k}))
           * (1.0 + CAST(bucket % {k} AS DOUBLE) / {float(k)}) AS {est_name}
  FROM picked_{est_name}
)"""


DOC_HDR_QUANTILES_SQL = f"""
WITH cells AS ({_hdr_cells_sql()}),
sk AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS c
       FROM cells GROUP BY source, bucket),
{_hdr_quantile_sql('sk')[1:]}
SELECT source, q, n, est FROM q_est
"""

HDR_STATE_MERGE_SQL = f"""
WITH cells_a AS ({_hdr_cells_sql(" AND doc_id % 2 = 0")}),
cells_b AS ({_hdr_cells_sql(" AND doc_id % 2 = 1")}),
sk_a AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS c
         FROM cells_a GROUP BY source, bucket),
sk_b AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS c
         FROM cells_b GROUP BY source, bucket),
sk_merged AS (
  SELECT source, bucket, CAST(SUM(c) AS BIGINT) AS c
  FROM (SELECT * FROM sk_a UNION ALL SELECT * FROM sk_b)
  GROUP BY source, bucket),
cells_full AS ({_hdr_cells_sql()}),
sk_full AS (SELECT source, bucket, CAST(COUNT(*) AS BIGINT) AS c
            FROM cells_full GROUP BY source, bucket),
{_hdr_quantile_sql('sk_merged', 'est_merged')[1:]},
{_hdr_quantile_sql('sk_full', 'est_full')[1:]}
SELECT m.source, m.q, m.n, m.est_merged, f.est_full
FROM q_est_merged m JOIN q_est_full f
  ON m.source = f.source AND m.q = f.q
"""


# --- sketch-driven percentile normalization --------------------------------

def doc_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's length percentile WITHOUT a corpus sort:
    bucket join against the broadcast cumulative HDR histogram
    (operators/stats.py:hdr_percentile_assign) — the way a 100 TB run
    quantile-normalizes a quality signal."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sk = ST.hdr_sketch(docs, [], "n_chars")
    return ST.hdr_percentile_assign(docs, sk, "n_chars")


DOC_LENGTH_PERCENTILES_SQL = f"""
WITH b AS (
  SELECT doc_id, n_chars,
         CAST((length(bin(n_chars)) - 1) * {ST.HDR_K}
              + floor((n_chars - pow(2, length(bin(n_chars)) - 1))
                      / pow(2, length(bin(n_chars)) - 1) * {ST.HDR_K})
              AS INT) AS bucket
  FROM documents WHERE n_chars >= 1
),
sk AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY bucket),
cum AS (
  SELECT bucket, c,
         CAST(COALESCE(SUM(c) OVER (ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS below,
         CAST(SUM(c) OVER () AS BIGINT) AS total
  FROM sk
)
SELECT d.doc_id, d.n_chars,
       CASE WHEN b.bucket IS NULL THEN 0.0
            ELSE CAST(cum.below AS DOUBLE) / CAST(cum.total AS DOUBLE)
            END AS pct_below,
       CASE WHEN b.bucket IS NULL THEN 0.0
            ELSE CAST(cum.c AS DOUBLE) / CAST(cum.total AS DOUBLE)
            END AS pct_bucket_mass
FROM documents d
LEFT JOIN b ON d.doc_id = b.doc_id
LEFT JOIN cum ON b.bucket = cum.bucket
"""
