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


def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style: shipping volume between two nations by year.

    Both nation dims broadcast (25 rows); supplier and customer joins
    are left to AQE (broadcast at bench scale, shuffle at 100 TB);
    the lineitem⋈orders join is the one unavoidable wide shuffle. The
    disjunctive nation pair filter applies AFTER the dim joins on the
    already-tiny joined columns."""
    n1 = (t(spark, sf_dir, "nation")
          .select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation")))
    n2 = (t(spark, sf_dir, "nation")
          .select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation")))
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
    pair = (((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("c_nk"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(decimal_to_double(F.sum(_disc_price())).alias("revenue"))
    )


Q07_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
            * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4))))
            AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style: supplier(s) with the maximum revenue in a
    quarter. The correlated `= (SELECT MAX(...))` becomes a rank-1
    window over the already-aggregated per-supplier revenue (exact
    DECIMAL comparison, so ties are exact and ALL max suppliers
    return, like the spec). One lineitem shuffle; supplier joins the
    |suppliers|-sized aggregate, not the fact table."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp")))
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(F.sum(_disc_price()).alias("__rev")))
    top = (rev.withColumn(
        "__rnk", F.rank().over(Window.orderBy(F.col("__rev").desc())))
        .where(F.col("__rnk") == 1))
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (top.join(F.broadcast(supp),
                     top.supplier_no == supp.s_suppkey)
            .select("s_suppkey", "s_name",
                    decimal_to_double(F.col("__rev")).alias("total_revenue"))
            .orderBy("s_suppkey"))


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))
           AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       CAST(CAST(r.total_rev AS VARCHAR) AS DOUBLE) AS total_revenue
FROM rev r JOIN supplier s ON r.supplier_no = s.s_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s.s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style: weekly-equivalent revenue lost to
    small-quantity orders of one brand. The correlated per-part
    average-quantity subquery becomes one grouped aggregate joined
    back to the (brand-filtered) fact rows — computed over ALL
    lineitems of those parts, as the spec's subquery is, with the
    brand filter pushed into the part scan and broadcast into both
    lineitem passes. The 0.2·avg threshold compares doubles derived
    from identical exact sums in both engines."""
    part = (t(spark, sf_dir, "part")
            .where(F.col("p_brand") == "Brand#3")
            .select("p_partkey"))
    li = (t(spark, sf_dir, "lineitem")
          .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")))
    avg_q = (li.groupBy("l_partkey")
             .agg((decimal_to_double(F.sum(money("l_quantity")))
                   / F.count(F.lit(1)).cast("double")).alias("__avg_qty")))
    small = (li.join(F.broadcast(avg_q), "l_partkey")
             .where(F.col("l_quantity").cast("double")
                    < F.lit(0.2) * F.col("__avg_qty")))
    return small.agg(
        F.round(decimal_to_double(F.sum(money("l_extendedprice")))
                / F.lit(7.0), 6).alias("avg_yearly"))


Q17_SQL = """
WITH br AS MATERIALIZED (
  SELECT l.l_partkey, l.l_quantity, l.l_extendedprice
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = 'Brand#3'
),
avgq AS (
  SELECT l_partkey,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR)
              AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
  FROM br GROUP BY l_partkey
)
SELECT ROUND(CAST(CAST(SUM(CAST(br.l_extendedprice AS DECIMAL(18,4)))
             AS VARCHAR) AS DOUBLE) / 7.0, 6) AS avg_yearly
FROM br JOIN avgq ON br.l_partkey = avgq.l_partkey
WHERE CAST(br.l_quantity AS DOUBLE) < 0.2 * avgq.avg_qty
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: top-100 largest-volume orders. The HAVING
    subquery is a plain grouped filter on the lineitem aggregate; the
    surviving ~0.5% of orderkeys then join orders+customer (the
    aggregate side is small, so AQE broadcasts it into the orders
    probe instead of shuffling the fact table again). Total order:
    (o_totalprice desc, o_orderkey) — deterministic top-100."""
    li = t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(money("l_quantity")).alias("__qty"))
           .where(F.col("__qty") > F.lit(150).cast(MONEY)))
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey",
                micros("o_orderdate").alias("o_orderdate_us"),
                F.col("o_totalprice").cast("double").alias("o_totalprice"),
                decimal_to_double(F.col("__qty")).alias("sum_qty"))
    )


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > CAST(150 AS DECIMAL(18,4))
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       epoch_us(o.o_orderdate) AS o_orderdate_us,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(CAST(big.qty AS VARCHAR) AS DOUBLE) AS sum_qty
FROM orders o
JOIN big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: one supplier nation's share of a region's
    ECONOMY-part revenue, by order year. Six-way star join — every
    dimension broadcasts, lineitem⋈orders is the single wide shuffle —
    then a conditional aggregation (share = national / total). Both
    sums are exact decimals exported through strings, and the share
    divides those identical doubles, so the ratio is bit-stable
    cross-engine."""
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
    cust_n = (nation.join(F.broadcast(region),
                          nation.n_regionkey == region.r_regionkey)
              .select(F.col("n_nationkey").alias("c_nk")))
    supp_n = nation.select(F.col("n_nationkey").alias("s_nk"),
                           F.col("n_name").alias("supp_nation"))
    part = (t(spark, sf_dir, "part")
            .where(F.col("p_type") == "ECONOMY").select("p_partkey"))
    orders = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    li = t(spark, sf_dir, "lineitem")
    nat = F.when(F.col("supp_nation") == "NATION_3", _disc_price()) \
        .otherwise(F.lit(0).cast(MONEY))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(t(spark, sf_dir, "customer").select("c_custkey",
                                                  "c_nationkey"),
              orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(cust_n), F.col("c_nationkey") == F.col("c_nk"))
        .join(t(spark, sf_dir, "supplier").select("s_suppkey",
                                                  "s_nationkey"),
              li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(supp_n), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(decimal_to_double(F.sum(nat)).alias("nation_revenue"),
             decimal_to_double(F.sum(_disc_price())).alias("total_revenue"))
        .select("o_year", "nation_revenue", "total_revenue",
                F.round(F.col("nation_revenue")
                        / F.col("total_revenue"), 6).alias("mkt_share"))
    )


Q08_SQL = """
WITH base AS (
  SELECT year(o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,4))
           * (CAST(1 AS DECIMAL(18,4))
              - CAST(l.l_discount AS DECIMAL(18,4))) AS vol,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE r.r_name = 'AFRICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate < TIMESTAMP '1997-01-01'
)
SELECT CAST(o_year AS INTEGER) AS o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                          ELSE CAST(0 AS DECIMAL(18,4)) END)
            AS VARCHAR) AS DOUBLE) AS nation_revenue,
       CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE) AS total_revenue,
       ROUND(CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                                ELSE CAST(0 AS DECIMAL(18,4)) END)
                  AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE), 6) AS mkt_share
FROM base GROUP BY o_year
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style: distribution of customers by order count,
    INCLUDING zero-order customers — the left-outer aggregate
    histogram (count(o_orderkey) counts only matches, so empty
    customers land in the c_count=0 bin). Two shuffles: the outer
    join's per-customer count, then the tiny histogram re-group."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = (t(spark, sf_dir, "orders")
              .where(F.col("o_orderpriority") != "1-URGENT")
              .select("o_orderkey", "o_custkey"))
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey,
                          "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count(F.lit(1)).alias("custdist")))


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                     AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style: revenue under a disjunction of
    (brand, quantity-range) conjunctions — the OR-of-ANDs predicate
    that exercises join-condition pushdown: the brand disjuncts
    prune the part scan (PushedFilters shows the Or), the broadcast
    join carries p_brand, and the mixed row filter evaluates inside
    whole-stage codegen. One scalar aggregate, no shuffle beyond it."""
    part = (t(spark, sf_dir, "part")
            .where(F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
            .select("p_partkey", "p_brand"))
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (qty >= 1) & (qty <= 11))
        | ((F.col("p_brand") == "Brand#2") & (qty >= 10) & (qty <= 20))
        | ((F.col("p_brand") == "Brand#3") & (qty >= 20) & (qty <= 30)))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .where(cond)
            .agg(decimal_to_double(F.sum(_disc_price())).alias("revenue"),
                 F.count(F.lit(1)).alias("n_items")))


Q19_SQL = """
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
            * (CAST(1 AS DECIMAL(18,4))
               - CAST(l.l_discount AS DECIMAL(18,4)))) AS VARCHAR)
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30)
"""
