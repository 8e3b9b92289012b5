"""Remaining TPC-H query shapes (Q2,3,5,7,8,9,10,11,12,15,16,17,19,20,21,22),
adapted to the driver's column subset (no partsupp table, no
commitdate/receiptdate/shipmode/phone/container columns — each adaptation
keeps the original query's plan shape: the joins, the correlation pattern,
and the aggregation structure are the TPC-H ones).

Completes the warehouse surface next to inventory_tpch.py (Q4/Q13/Q14/Q18)
and inventory.py's Q1/Q6 analogs (agg_pricing_summary / agg_revenue_delta).

Scale notes (100 TB): nation/region/supplier/part are dimensions —
broadcast; lineitem/orders are facts — one shuffle each on their join key;
customer joins are left to AQE (broadcast at low SF, shuffle at scale).
Correlated scalar subqueries become window functions or tiny-aggregate
cross-joins (the scalar side is 1 row — broadcast by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kstream_spark.builder import StreamBuilder


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return StreamBuilder(spark).table(f"{sf}/{name}.parquet").to_df()


def _ts(lit: str):
    return F.lit(lit).cast("timestamp")


def _rev():
    # revenue expression; built lazily (F.col needs an active SparkContext)
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# Q2-shaped: cheapest part per type. The reference Q2's correlated min over
# partsupp becomes a per-type min — same correlated-scalar plan shape; Spark
# expresses it as a window min (one shuffle by p_type, no self-join).
def q2_min_cost_part(spark: SparkSession, sf: str) -> DataFrame:
    part = _t(spark, sf, "part")
    w = W.partitionBy("p_type")
    return (part.withColumn("min_price", F.min("p_retailprice").over(w))
            .filter(F.col("p_retailprice") == F.col("min_price"))
            .select("p_partkey", "p_name", "p_type", "p_retailprice"))


SQL_Q2 = """
SELECT p_partkey, p_name, p_type, p_retailprice
FROM part p1
WHERE p_retailprice = (SELECT min(p_retailprice) FROM part p2
                       WHERE p2.p_type = p1.p_type)
"""


# Q3: shipping priority — top 10 high-revenue not-yet-shipped orders.
def q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf, "orders").filter(F.col("o_orderdate") < _ts("1998-06-01"))
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > _ts("1998-06-01"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
            .limit(10)
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority"))


SQL_Q3 = """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01'
  AND l_shipdate > TIMESTAMP '1998-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# Q5: local supplier volume — same-nation customer/supplier pairs in ASIA.
def q5_local_supplier_volume(spark: SparkSession, sf: str) -> DataFrame:
    region = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    supp = _t(spark, sf, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    orders = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01")))
    cust = _t(spark, sf, "customer")
    li = _t(spark, sf, "lineitem")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(cust, (orders.o_custkey == cust.c_custkey)
                  & (cust.c_nationkey == supp.s_nationkey))
            .groupBy("n_name")
            .agg(F.round(F.sum(_rev()), 2).alias("revenue")))


SQL_Q5 = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


# Q7: volume shipping between two nations by direction and year.
def q7_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    nation = _t(spark, sf, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"),
                       F.col("n_name").alias("cust_nation"))
    supp = _t(spark, sf, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    cust = _t(spark, sf, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31")))
    pair = (((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(F.round(F.sum(_rev()), 2).alias("revenue")))


SQL_Q7 = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
GROUP BY supp_nation, cust_nation, l_year
"""


# Q8: NATION_0 suppliers' market share in AMERICA for STANDARD parts.
def q8_market_share(spark: SparkSession, sf: str) -> DataFrame:
    region = _t(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    n1 = _t(spark, sf, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")) \
        .select(F.col("n_nationkey").alias("cn_key"))
    n2 = _t(spark, sf, "nation").select(F.col("n_nationkey").alias("sn_key"),
                                        F.col("n_name").alias("nation"))
    cust = _t(spark, sf, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
    supp = _t(spark, sf, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
    part = _t(spark, sf, "part").filter(F.col("p_type") == "STANDARD")
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    vol = _rev()
    share = F.sum(F.when(F.col("nation") == "NATION_0", vol).otherwise(F.lit(0.0))) \
        / F.sum(vol)
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(F.round(share, 6).alias("mkt_share")))


SQL_Q8 = """
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_0' THEN volume ELSE 0.0 END)
             / sum(volume), 6) AS mkt_share
FROM (SELECT year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'STANDARD')
GROUP BY o_year
"""


# Q9: product-type profit by supplier nation and year; supply cost modeled
# as 10% of retail price per unit (no partsupp table in the driver schema).
def q9_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    part = _t(spark, sf, "part").filter(F.col("p_name").like("%e%"))
    supp = _t(spark, sf, "supplier")
    nation = _t(spark, sf, "nation")
    # o_year computed on the BUILD side: 1.5M evaluations instead of one
    # per joined lineitem row, and the broadcast payload prunes to two
    # longs (the plan is all-broadcast at bench scale — AQE's 64MB
    # threshold — and degrades to a shuffle join on orderkey at cluster
    # scale, where the early projection prunes the exchange instead)
    orders = _t(spark, sf, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year"))
    li = _t(spark, sf, "lineitem")
    amount = _rev() - F.col("p_retailprice") * 0.1 * F.col("l_quantity")
    # sum in exact decimal: double sums are order-dependent in the last ulp
    # and one group lands on a .xx5 rounding boundary (Spark HALF_UP vs
    # DuckDB binary-double rounding disagree there); decimal accumulation is
    # exact and order-independent, so round+cast is engine-stable
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(F.col("n_name").alias("nation"), "o_year")
            .agg(F.round(F.sum(amount.cast("decimal(18,6)")), 2)
                 .cast("double").alias("sum_profit")))


SQL_Q9 = """
SELECT nation, o_year,
       CAST(round(sum(CAST(amount AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_profit
FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
             l_extendedprice * (1 - l_discount)
               - p_retailprice * 0.1 * l_quantity AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%e%')
GROUP BY nation, o_year
"""


# Q10: returned-item revenue per customer, top 20.
def q10_returned_items(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer")
    nation = _t(spark, sf, "nation")
    orders = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01")))
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20)
            .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name"))


SQL_Q10 = """
SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# Q11: per-part shipped value of one nation's suppliers vs a scalar
# threshold (0.1% of the nation total) — HAVING against a scalar subquery.
def _q11_value(spark: SparkSession, sf: str) -> DataFrame:
    supp = _t(spark, sf, "supplier")
    nation = _t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
    li = _t(spark, sf, "lineitem")
    return (li.join(F.broadcast(
                supp.join(F.broadcast(nation),
                          supp.s_nationkey == nation.n_nationkey)),
            li.l_suppkey == F.col("s_suppkey")))


def q11_important_stock(spark: SparkSession, sf: str) -> DataFrame:
    base = _q11_value(spark, sf)
    per_part = base.groupBy("l_partkey").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("value"))
    threshold = base.agg(
        F.round(F.sum("l_extendedprice") * 0.001, 2).alias("thr"))
    return (per_part.join(F.broadcast(threshold))
            .filter(F.col("value") > F.col("thr"))
            .select("l_partkey", "value"))


SQL_Q11 = """
SELECT l_partkey, round(sum(l_extendedprice), 2) AS value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
GROUP BY l_partkey
HAVING round(sum(l_extendedprice), 2) >
       (SELECT round(sum(l_extendedprice) * 0.001, 2)
        FROM lineitem, supplier, nation
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_3')
"""


# Q12: late-shipment counts by line status x priority class (no shipmode).
def q12_late_shipments(spark: SparkSession, sf: str) -> DataFrame:
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01")))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .filter(F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
            .groupBy("l_linestatus")
            .agg(F.count(F.when(high, 1)).alias("high_line_count"),
                 F.count(F.when(~high, 1)).alias("low_line_count")))


SQL_Q12 = """
SELECT l_linestatus,
       count(*) FILTER (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS high_line_count,
       count(*) FILTER (o_orderpriority NOT IN ('1-URGENT', '2-HIGH')) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""


# Q15: top supplier by quarterly revenue (max over an aggregated view).
def q15_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01")))
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(_rev()), 2).alias("total_revenue"))
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = _t(spark, sf, "supplier")
    return (revenue.join(F.broadcast(top))
            .filter(F.col("total_revenue") == F.col("max_rev"))
            .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue"))


SQL_Q15 = """
WITH revenue AS (SELECT l_suppkey AS supplier_no,
                        round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
                 FROM lineitem
                 WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate < TIMESTAMP '1997-04-01'
                 GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# Q16: distinct-supplier counts per (brand, type, size) via the lineitem
# bridge, excluding negative-balance suppliers (no partsupp/comment).
def q16_parts_supplier(spark: SparkSession, sf: str) -> DataFrame:
    part = _t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    bad_supp = _t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0.0) \
        .select("s_suppkey")
    li = _t(spark, sf, "lineitem")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(bad_supp),
                  li.l_suppkey == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


SQL_Q16 = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#4' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""


# Q17: small-quantity-order revenue — correlated per-part average becomes a
# per-part aggregate joined back to the fact (no decorrelation needed).
def q17_small_quantity(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part").filter(
        (F.col("p_brand") == "Brand#4") & (F.col("p_size") < 10))
    # per-part avg over the FULL lineitem (matches the correlated subquery);
    # quantities are integer-valued doubles, so sum/avg are order-exact and
    # the 0.2*avg comparison is engine-stable without rounding
    per_part = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        F.avg("l_quantity").alias("avg_qty"))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(per_part, li.l_partkey == F.col("ap_key"))
            .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")))


SQL_Q17 = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#4' AND p_size < 10
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


# Q19: disjunctive brand/size/quantity predicates — the OR-of-ANDs shape
# Catalyst pushes through the broadcast join as a single filter.
def q19_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part")
    cases = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30)))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .filter(cases)
            .agg(F.round(F.sum(_rev()), 2).alias("revenue")))


SQL_Q19 = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


# Q20: suppliers who shipped >50 units of any PROMO part in 1997, in
# regions 0-1 — the nested-IN shape becomes a semi-join chain.
def q20_promo_suppliers(spark: SparkSession, sf: str) -> DataFrame:
    part = _t(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01")))
    heavy = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
             .groupBy("l_suppkey", "l_partkey")
             .agg(F.sum("l_quantity").alias("qty"))
             .filter(F.col("qty") > 50)
             .select("l_suppkey").distinct())
    nation = _t(spark, sf, "nation").filter(F.col("n_regionkey").isin(0, 1))
    supp = _t(spark, sf, "supplier")
    return (supp.join(F.broadcast(nation),
                      supp.s_nationkey == nation.n_nationkey)
            .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name",
                    F.round("s_acctbal", 2).alias("s_acctbal")))


SQL_Q20 = """
SELECT s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier, nation
WHERE s_suppkey IN (SELECT l_suppkey
                    FROM lineitem JOIN part ON l_partkey = p_partkey
                    WHERE p_type = 'PROMO'
                      AND l_shipdate >= TIMESTAMP '1997-01-01'
                      AND l_shipdate < TIMESTAMP '1998-01-01'
                    GROUP BY l_suppkey, l_partkey
                    HAVING sum(l_quantity) > 50)
  AND s_nationkey = n_nationkey AND n_regionkey IN (0, 1)
"""


# Q21: suppliers who were the ONLY late shipper on a multi-supplier
# finalized order.  EXISTS/NOT EXISTS become per-order aggregates: distinct
# supplier count > 1 and distinct late-supplier count == 1.
def q21_waiting_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Single-scan shape: instead of two lineitem passes (countDistinct
    supplier + late-pair distinct), reduce the fact table once to distinct
    (orderkey, suppkey, max_shipdate) pairs, join orders onto the already
    ~4x-smaller pair set, then cascade to per-order totals.  At 100 TB this
    halves fact-table scan volume, drops the two-phase countDistinct, and
    the orders join touches pairs, not raw lineitem rows."""
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders") \
        .select("o_orderkey", "o_orderdate", "o_orderstatus")
    # reduce the fact table BEFORE any join: distinct (order, supplier)
    # pairs with max shipdate — map-side combine makes this shuffle narrow;
    # a pair is late iff its LATEST shipment is late
    pair = li.groupBy("l_orderkey", "l_suppkey") \
        .agg(F.max("l_shipdate").alias("_max_ship"))
    pair_late = (
        pair.join(orders, pair.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey",
                F.when((F.col("o_orderstatus") == "F")
                       & (F.col("_max_ship")
                          > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
                       1).otherwise(0).alias("is_late")))
    # per-order supplier/late counts as a WINDOW over the pair relation —
    # the r8 shape aggregated to per_order and JOINED BACK, which costs an
    # extra exchange + join over the same key the window sorts on anyway
    from pyspark.sql import Window as W
    w = W.partitionBy("l_orderkey")
    supp = _t(spark, sf, "supplier")
    return (pair_late
            .withColumn("n_supp", F.count(F.lit(1)).over(w))
            .withColumn("n_late", F.sum("is_late").over(w))
            .filter((F.col("is_late") == 1) & (F.col("n_supp") > 1)
                    & (F.col("n_late") == 1))
            .join(F.broadcast(supp),
                  pair_late.l_suppkey == supp.s_suppkey)
            .groupBy("s_name").agg(F.count("*").alias("numwait"))
            .orderBy(F.desc("numwait"), F.asc("s_name"))
            .limit(10))


SQL_Q21 = """
WITH per_order AS (
  SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp
  FROM lineitem GROUP BY l_orderkey),
late AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
late_counts AS (
  SELECT l_orderkey, count(*) AS n_late FROM late GROUP BY l_orderkey)
SELECT s_name, count(*) AS numwait
FROM late
JOIN per_order USING (l_orderkey)
JOIN late_counts USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
WHERE per_order.n_supp > 1 AND late_counts.n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


# Q22: dormant high-balance customers by nation (no phone column; dormant =
# no orders since 2000-01-01).  Scalar avg broadcasts; anti-join replaces
# NOT EXISTS.
def q22_dormant_customers(spark: SparkSession, sf: str) -> DataFrame:
    cust = _t(spark, sf, "customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal"))
    recent = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-01-01")) \
        .select("o_custkey").distinct()
    return (cust.join(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("avg_bal"))
            .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal")))


SQL_Q22 = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


TPCH_FULL_INVENTORY: dict[str, tuple] = {
    "tpch_q2_min_cost_part": (q2_min_cost_part, SQL_Q2),
    "tpch_q3_shipping_priority": (q3_shipping_priority, SQL_Q3),
    "tpch_q5_local_supplier_volume": (q5_local_supplier_volume, SQL_Q5),
    "tpch_q7_volume_shipping": (q7_volume_shipping, SQL_Q7),
    "tpch_q8_market_share": (q8_market_share, SQL_Q8),
    "tpch_q9_product_profit": (q9_product_profit, SQL_Q9),
    "tpch_q10_returned_items": (q10_returned_items, SQL_Q10),
    "tpch_q11_important_stock": (q11_important_stock, SQL_Q11),
    "tpch_q12_late_shipments": (q12_late_shipments, SQL_Q12),
    "tpch_q15_top_supplier": (q15_top_supplier, SQL_Q15),
    "tpch_q16_parts_supplier": (q16_parts_supplier, SQL_Q16),
    "tpch_q17_small_quantity": (q17_small_quantity, SQL_Q17),
    "tpch_q19_disjunctive_revenue": (q19_disjunctive_revenue, SQL_Q19),
    "tpch_q20_promo_suppliers": (q20_promo_suppliers, SQL_Q20),
    "tpch_q21_waiting_supplier": (q21_waiting_supplier, SQL_Q21),
    "tpch_q22_dormant_customers": (q22_dormant_customers, SQL_Q22),
}
