"""TPC-H-style headline queries over the synthetic star schema.

These exercise the scan → filter → join → aggregate core at bench
scale. All plans are declarative: filters push into the parquet scan,
small dimensions broadcast, aggregation is partially applied map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._helpers import (MONEY, MONEY_NARROW, decimal_to_double, dsum,
                       micros, money, t)


def _disc_price(ext="l_extendedprice", disc="l_discount"):
    """ext*(1-disc) as exact decimal(37,8)."""
    return money(ext) * (F.lit(1).cast(MONEY) - money(disc))


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: pricing summary report (scan + 8-agg groupBy)."""
    li = t(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    charge = _disc_price().cast(MONEY_NARROW) * (
        F.lit(1).cast(MONEY_NARROW) + F.col("l_tax").cast(MONEY_NARROW)
    )
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            decimal_to_double(F.sum(_disc_price())).alias("sum_disc_price"),
            decimal_to_double(F.sum(charge)).alias("sum_charge"),
            F.round(decimal_to_double(F.sum(money("l_quantity"))) / cnt.cast("double"), 6).alias("avg_qty"),
            F.round(decimal_to_double(F.sum(money("l_extendedprice"))) / cnt.cast("double"), 6).alias("avg_price"),
            F.round(decimal_to_double(F.sum(money("l_discount"))) / cnt.cast("double"), 6).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) + CAST(l_tax AS DECIMAL(18,6)))) AS VARCHAR) AS DOUBLE) AS sum_charge,
  ROUND(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_qty,
  ROUND(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_price,
  ROUND(CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: top-10 orders by revenue for one segment.

    customer is broadcast (small dim); the orders⋈lineitem join is the
    only shuffle; top-k has a total order (revenue desc, orderkey)."""
    cust = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_disc_price()).alias("__rev"))
        .orderBy(F.col("__rev").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            F.col("l_orderkey").alias("o_orderkey"),
            decimal_to_double(F.col("__rev")).alias("revenue"),
            micros("o_orderdate").alias("o_orderdate_us"),
        )
    )


Q03_SQL = """
SELECT l_orderkey AS o_orderkey,
       CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
       epoch_us(o_orderdate) AS o_orderdate_us
FROM (
  SELECT l.l_orderkey, o.o_orderdate,
         SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
    AND l.l_shipdate > TIMESTAMP '1998-01-01'
  GROUP BY l.l_orderkey, o.o_orderdate
)
ORDER BY rev DESC, l_orderkey
LIMIT 10
"""


def q05_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: revenue by customer nation within one region.

    nation/region broadcast explicitly; the customer-side dim join is
    left to AQE so a 100× customer table can fall back to a shuffle
    join instead of forcing a driver-OOM broadcast."""
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
    nation = t(spark, sf_dir, "nation")
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dims, orders.o_custkey == dims.c_custkey)
        .groupBy("n_name")
        .agg(decimal_to_double(F.sum(_disc_price())).alias("revenue"),
             F.count(F.lit(1)).alias("n_items"))
    )


Q05_SQL = """
SELECT n.n_name,
  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS VARCHAR) AS DOUBLE) AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AFRICA'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n.n_name
"""


def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecasting revenue change — the pure
    filter-pushdown showcase: every predicate (date range, discount
    band, quantity cap) reaches the parquet scan, then ONE scalar
    aggregate; revenue in exact DECIMAL exported through the digit
    string."""
    li = t(spark, sf_dir, "lineitem")
    return (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
        .agg(decimal_to_double(
            F.sum(money("l_extendedprice") * money("l_discount")))
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items")))


Q06_SQL = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                     * CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR)
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter — fact-fact join (orders x lineitem, shuffle on orderkey)
    with the customer/nation dimensions broadcast, then a grouped
    decimal aggregation and a deterministic top-k."""
    from ..operators.topk import top_k_rows

    li = (t(spark, sf_dir, "lineitem")
          .where(F.col("l_returnflag") == "R"))
    orders = (t(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= F.lit("1996-01-01")
                      .cast("timestamp"))
                     & (F.col("o_orderdate") < F.lit("1996-04-01")
                        .cast("timestamp"))))
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    rev = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
           .join(F.broadcast(cust),
                 F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(nation),
                 F.col("c_nationkey") == F.col("n_nationkey"))
           .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
           .agg(decimal_to_double(F.sum(_disc_price()))
                .alias("revenue")))
    return top_k_rows(rev, [F.col("revenue").desc(), F.col("c_custkey")],
                      20)


Q10_SQL = """
SELECT c_custkey, c_name, n_name, c_acctbal,
       CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                     * (CAST(1 AS DECIMAL(18,4))
                        - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotion-type revenue share for one month —
    lineitem x part with the part dimension BROADCAST, revenue split
    by p_type in exact decimals, and the final percentage as the
    ratio of two digit-string-exported doubles (the one
    engine-defined float op). Closes coverage of the last otherwise
    unused base table."""
    li = (t(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= F.lit("1996-03-01")
                  .cast("timestamp"))
                 & (F.col("l_shipdate") < F.lit("1996-04-01")
                    .cast("timestamp"))))
    part = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part),
                F.col("l_partkey") == F.col("p_partkey"))
    agg = j.agg(
        decimal_to_double(F.sum(F.when(F.col("p_type") == "PROMO",
                                       _disc_price())
                                .otherwise(F.lit(0).cast(MONEY))))
        .alias("promo_revenue"),
        decimal_to_double(F.sum(_disc_price())).alias("total_revenue"))
    return agg.select(
        "promo_revenue", "total_revenue",
        (F.lit(100.0) * F.col("promo_revenue")
         / F.col("total_revenue")).alias("promo_pct"))


Q14_SQL = """
WITH agg AS (
  SELECT
    CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice AS DECIMAL(18,4))
                       * (CAST(1 AS DECIMAL(18,4))
                          - CAST(l_discount AS DECIMAL(18,4)))
                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS VARCHAR) AS DOUBLE)
      AS promo_revenue,
    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                  * (CAST(1 AS DECIMAL(18,4))
                     - CAST(l_discount AS DECIMAL(18,4)))) AS VARCHAR)
         AS DOUBLE) AS total_revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
)
SELECT promo_revenue, total_revenue,
       CAST(100 AS DOUBLE) * promo_revenue / total_revenue AS promo_pct
FROM agg
"""


def cust_balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer account-balance distribution placement: decile
    (NTILE), percent_rank and cume_dist per customer over the total
    order (balance, custkey) — the ranked-window surface the engine
    had not yet exercised. One global sort window; at scale this is
    the one legitimate range-partitioned global sort (Spark plans
    rangepartitioning), and the deterministic tie-break makes every
    function value exact cross-engine."""
    from pyspark.sql import Window

    cust = t(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal"), F.col("c_custkey"))
    return cust.select(
        "c_custkey",
        F.col("c_acctbal"),
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"))


CUST_BALANCE_DECILES_SQL = """
SELECT c_custkey, c_acctbal,
       NTILE(10) OVER w AS decile,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume
FROM customer
WINDOW w AS (ORDER BY c_acctbal, c_custkey)
"""
