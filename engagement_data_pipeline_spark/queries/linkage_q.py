"""Registry query for Fellegi–Sunter record linkage
(operators/linkage.py): link the clean customer table against a
deterministically-dirtied copy of itself.

The dirty copy is derived in-plan (and re-derived identically by the
oracle): every 4th customer's name loses the 'u' (an ed-1 typo that
keeps the digits — and so the block key — intact), every 5th
account balance drifts within the comparator tolerance, every 3rd
beyond it, every 7th market segment is corrupted. Blocking is
(nation, last-3-digits-of-name): true pairs always share a block,
and id pairs 1000 apart in the same nation land together as decoys
that must classify below the true pairs.

Likelihood ratios are computed once in Python and injected into BOTH
plans via repr() — the same literal-pinning idiom as BM25's k1/b —
so the product score is bit-identical cross-engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.linkage import fs_link
from ..tables import load
from ._helpers import apply_runtime_conf

#: field -> (m, u): P(agree | match), P(agree | non-match)
MU = {
    "name": (0.95, 0.005),
    "segment": (0.9, 0.25),
    "balance": (0.9, 0.05),
}
MATCH_T = 100.0
POSSIBLE_T = 1.0
BAL_TOL = 0.01


def _dirty(cust: DataFrame) -> DataFrame:
    key = F.col("c_custkey")
    name = F.when(key % 4 == 0,
                  F.concat(F.lit("Cstomer#"),
                           F.expr("substring(c_name, 10)"))
                  ).otherwise(F.col("c_name"))
    bal = (F.when(key % 3 == 0, F.col("c_acctbal") + F.lit(25.0))
           .when(key % 5 == 0, F.col("c_acctbal") + F.lit(0.005))
           .otherwise(F.col("c_acctbal")))
    seg = F.when(key % 7 == 0,
                 F.lit("ERROR")).otherwise(F.col("c_mktsegment"))
    return cust.select(key.alias("c_custkey"), name.alias("c_name"),
                       seg.alias("c_mktsegment"), bal.alias("c_acctbal"),
                       F.col("c_nationkey"))


def cust_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_conf(spark)
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal", "c_nationkey")
    prep = lambda df: df.withColumn(  # noqa: E731
        "blk", F.concat(F.col("c_nationkey").cast("string"), F.lit(":"),
                        F.expr("right(c_name, 3)")))
    comparators = {
        "name": lambda: F.levenshtein("l_c_name", "r_c_name") <= 1,
        "segment": lambda: F.col("l_c_mktsegment") == F.col("r_c_mktsegment"),
        "balance": lambda: F.abs(F.col("l_c_acctbal")
                                 - F.col("r_c_acctbal")) < F.lit(BAL_TOL),
    }
    out = fs_link(prep(cust), prep(_dirty(cust)), ["blk"],
                  comparators, MU, MATCH_T, POSSIBLE_T)
    return out.select(
        F.col("l_c_custkey").alias("clean_key"),
        F.col("r_c_custkey").alias("dirty_key"),
        "agree_name", "agree_segment", "agree_balance",
        "score", "decision")


def _ratio(f: str, agree: bool) -> str:
    # CAST(.. AS DOUBLE): a bare numeric literal is DECIMAL to DuckDB
    # and the decimal product overflows scale 38; the string parse is
    # correctly rounded to the same IEEE double Spark's lit() holds.
    m, u = MU[f]
    v = m / u if agree else (1.0 - m) / (1.0 - u)
    return f"CAST({v!r} AS DOUBLE)"


CUST_LINKAGE_SQL = f"""
WITH clean AS (
  SELECT c_custkey, c_name, c_mktsegment, c_acctbal, c_nationkey,
         CAST(c_nationkey AS VARCHAR) || ':' || right(c_name, 3) AS blk
  FROM customer
),
dirty AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 4 = 0
              THEN 'Cstomer#' || substr(c_name, 10) ELSE c_name END AS c_name,
         CASE WHEN c_custkey % 7 = 0
              THEN 'ERROR' ELSE c_mktsegment END AS c_mktsegment,
         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 25.0
              WHEN c_custkey % 5 = 0 THEN c_acctbal + 0.005
              ELSE c_acctbal END AS c_acctbal,
         c_nationkey
  FROM customer
),
dirty_b AS (
  SELECT *, CAST(c_nationkey AS VARCHAR) || ':' || right(c_name, 3) AS blk
  FROM dirty
),
cand AS (
  SELECT l.c_custkey AS clean_key, r.c_custkey AS dirty_key,
         levenshtein(l.c_name, r.c_name) <= 1 AS agree_name,
         l.c_mktsegment = r.c_mktsegment AS agree_segment,
         abs(l.c_acctbal - r.c_acctbal) < {BAL_TOL} AS agree_balance
  FROM clean l JOIN dirty_b r USING (blk)
),
scored AS (
  SELECT *,
         (CASE WHEN agree_name THEN {_ratio("name", True)}
               ELSE {_ratio("name", False)} END
          * CASE WHEN agree_segment THEN {_ratio("segment", True)}
                 ELSE {_ratio("segment", False)} END)
         * CASE WHEN agree_balance THEN {_ratio("balance", True)}
                ELSE {_ratio("balance", False)} END AS score
  FROM cand
)
SELECT clean_key, dirty_key, agree_name, agree_segment, agree_balance,
       score,
       CASE WHEN score >= CAST({MATCH_T!r} AS DOUBLE) THEN 'match'
            WHEN score >= CAST({POSSIBLE_T!r} AS DOUBLE) THEN 'possible'
            ELSE 'non_match' END AS decision
FROM scored
"""
