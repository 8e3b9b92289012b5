"""TPC-H-shaped analytic inventory (adapted to the driver's column subset):
Q4 (exists), Q13 (outer-join distribution), Q14 (conditional revenue share),
Q18 (having-filtered large orders).  These stress the join+agg planner paths
a warehouse engine lives on; dims broadcast, facts shuffle once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstream_spark.builder import StreamBuilder


# Q4-shaped: priority counts for orders having a "late" lineitem (EXISTS)
def q_order_priority_exists(spark: SparkSession, sf: str) -> DataFrame:
    """One orders pass: carry o_orderpriority THROUGH the late-detection
    join and dedup on (orderkey, priority) — the r8 shape scanned and
    shuffled orders twice (join for the date compare, then a semi-join
    back just to recover the priority).  At 100 TB that is one full
    orders scan + exchange saved for identical semantics (priority is
    functionally dependent on orderkey, so the distinct is the EXISTS)."""
    b = StreamBuilder(spark)
    orders = b.stream(f"{sf}/orders.parquet").to_df() \
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = b.stream(f"{sf}/lineitem.parquet").to_df() \
        .select("l_orderkey", "l_shipdate")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .filter(F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .select("o_orderkey", "o_orderpriority").distinct()
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count")))


SQL_ORDER_PRIORITY_EXISTS = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# Q13-shaped: distribution of customers by order count (zero included)
def q_customer_distribution(spark: SparkSession, sf: str) -> DataFrame:
    b = StreamBuilder(spark)
    cust = b.table(f"{sf}/customer.parquet").to_df()
    orders = b.stream(f"{sf}/orders.parquet").to_df()
    per_cust = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


SQL_CUSTOMER_DISTRIBUTION = """
SELECT c_count, count(*) AS custdist FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY c_count
"""


# Q14-shaped: promo revenue share per month
def q_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    b = StreamBuilder(spark)
    li = b.stream(f"{sf}/lineitem.parquet").to_df()
    part = b.table(f"{sf}/part.parquet").to_df()
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy(F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"))
            .agg(F.round(F.sum(promo), 2).alias("promo_revenue"),
                 F.round(F.sum(rev), 2).alias("total_revenue")))


SQL_PROMO_REVENUE = """
SELECT date_trunc('month', l_shipdate) AS ship_month,
       round(sum(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END), 2)
         AS promo_revenue,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1
"""


# Q18-shaped: large-volume orders (HAVING on a join aggregate)
def q_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    b = StreamBuilder(spark)
    li = b.stream(f"{sf}/lineitem.parquet").to_df()
    orders = b.stream(f"{sf}/orders.parquet").to_df()
    cust = b.table(f"{sf}/customer.parquet").to_df()
    big = (li.groupBy("l_orderkey")
           .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
           .filter(F.col("total_qty") > 300))
    return (big.join(orders, big.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                    F.round("o_totalprice", 2).alias("o_totalprice"), "total_qty"))


SQL_LARGE_ORDERS = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY l_orderkey HAVING round(sum(l_quantity), 2) > 300) b
JOIN orders ON b.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


TPCH_INVENTORY: dict[str, tuple] = {
    "tpch_q4_priority_exists": (q_order_priority_exists, SQL_ORDER_PRIORITY_EXISTS),
    "tpch_q13_customer_distribution": (q_customer_distribution, SQL_CUSTOMER_DISTRIBUTION),
    "tpch_q14_promo_revenue": (q_promo_revenue, SQL_PROMO_REVENUE),
    "tpch_q18_large_orders": (q_large_orders, SQL_LARGE_ORDERS),
}
