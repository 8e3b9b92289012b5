"""SQL-function coverage inventory: window functions, distinct aggregation,
percentiles, string/date scalar functions — the scalar/analytic surface the
reference delegates entirely to user Go closures (SURVEY §2.6), exposed here
as first-class engine capability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kstream_spark.builder import StreamBuilder


def _ev(spark: SparkSession, sf: str) -> DataFrame:
    return StreamBuilder(spark).stream(f"{sf}/events.parquet").to_df()


# lag/lead analytics
def q_wf_lag_lead(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return _ev(spark, sf).select(
        "event_id", "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
    )


SQL_WF_LAG_LEAD = """
SELECT event_id, user_id,
       lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
FROM events
"""


# running (cumulative) aggregation
def q_wf_running_sum(spark: SparkSession, sf: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id") \
        .rowsBetween(W.unboundedPreceding, 0)
    return _ev(spark, sf).select(
        "event_id", "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


SQL_WF_RUNNING_SUM = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_value
FROM events
"""


# distinct aggregation
def q_agg_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return (_ev(spark, sf).groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("n_users"),
                 F.count("*").alias("n_events")))


SQL_AGG_DISTINCT = """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
"""


# exact percentiles (linear interpolation in both engines)
def q_agg_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    return (_ev(spark, sf).groupBy("event_type")
            .agg(F.round(F.percentile("value", 0.5), 4).alias("p50"),
                 F.round(F.percentile("value", 0.95), 4).alias("p95"),
                 F.round(F.min("value"), 2).alias("vmin"),
                 F.round(F.max("value"), 2).alias("vmax")))


SQL_AGG_PERCENTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(min(value), 2) AS vmin, round(max(value), 2) AS vmax
FROM events GROUP BY event_type
"""


# scalar string functions
def q_string_functions(spark: SparkSession, sf: str) -> DataFrame:
    c = StreamBuilder(spark).table(f"{sf}/customer.parquet").to_df()
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
    )


SQL_STRING_FUNCTIONS = """
SELECT c_custkey,
       upper(c_name) AS name_upper,
       substring(c_name, 1, 8) AS name_prefix,
       CAST(length(c_name) AS BIGINT) AS name_len,
       replace(c_name, 'Customer', 'Cust') AS name_short,
       lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
       concat_ws('|', c_mktsegment, c_name) AS tagged
FROM customer
"""


# scalar date/time functions
def q_date_functions(spark: SparkSession, sf: str) -> DataFrame:
    return _ev(spark, sf).select(
        "event_id",
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.date_trunc("day", F.col("ts")).alias("day_start"),
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus"),
    )


SQL_DATE_FUNCTIONS = """
SELECT event_id,
       CAST(year(ts) AS BIGINT) AS y, CAST(month(ts) AS BIGINT) AS m,
       CAST(day(ts) AS BIGINT) AS d, CAST(hour(ts) AS BIGINT) AS h,
       date_trunc('day', ts) AS day_start,
       ts + INTERVAL 90 MINUTE AS ts_plus
FROM events
"""


# TPC-H Q6-like single-row filter aggregate
def q_revenue_delta(spark: SparkSession, sf: str) -> DataFrame:
    li = StreamBuilder(spark).stream(f"{sf}/lineitem.parquet").to_df()
    return (li.filter((F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                 .alias("revenue_delta"),
                 F.count("*").alias("n")))


SQL_REVENUE_DELTA = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
       count(*) AS n
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


SQL_INVENTORY: dict[str, tuple] = {
    "wf_lag_lead": (q_wf_lag_lead, SQL_WF_LAG_LEAD),
    "wf_running_sum": (q_wf_running_sum, SQL_WF_RUNNING_SUM),
    "agg_distinct_users": (q_agg_distinct, SQL_AGG_DISTINCT),
    "agg_percentiles": (q_agg_percentiles, SQL_AGG_PERCENTILES),
    "fn_string": (q_string_functions, SQL_STRING_FUNCTIONS),
    "fn_date": (q_date_functions, SQL_DATE_FUNCTIONS),
    "agg_revenue_delta": (q_revenue_delta, SQL_REVENUE_DELTA),
}


# Pivot (conditional-aggregation equivalence in the oracle)
def q_pivot(spark: SparkSession, sf: str) -> DataFrame:
    types = ["click", "error", "purchase", "signup", "view"]
    return (_ev(spark, sf).groupBy("user_id")
            .pivot("event_type", types)
            .agg(F.count(F.lit(1)))
            .na.fill(0, types))


SQL_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY user_id
"""


# Unpivot / melt
def q_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    c = StreamBuilder(spark).table(f"{sf}/customer.parquet").to_df()
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))"
        " AS (metric, val)")


SQL_UNPIVOT = """
SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
UNION ALL
SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
"""


# Scalar subquery: customers above the average account balance
def q_scalar_subquery(spark: SparkSession, sf: str) -> DataFrame:
    spark_df = StreamBuilder(spark).table(f"{sf}/customer.parquet").to_df()
    spark_df.createOrReplaceTempView("customer_v")
    return spark.sql("""
        SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
        FROM customer_v
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v)
    """)


SQL_SCALAR_SUBQUERY = """
SELECT c_custkey, round(c_acctbal, 2) AS c_acctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
"""


# Null-handling battery
def q_null_handling(spark: SparkSession, sf: str) -> DataFrame:
    c = StreamBuilder(spark).table(f"{sf}/customer.parquet").to_df()
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")),
                   F.lit("(default)")).alias("seg_or_default"),
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
         .alias("nonneg_bal"),
        (F.col("c_acctbal") < 0).cast("boolean").alias("in_debt"),
    )


SQL_NULL_HANDLING = """
SELECT c_custkey,
       coalesce(nullif(c_mktsegment, 'BUILDING'), '(default)') AS seg_or_default,
       CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS nonneg_bal,
       c_acctbal < 0 AS in_debt
FROM customer
"""


SQL_INVENTORY.update({
    "agg_pivot": (q_pivot, SQL_PIVOT),
    "fn_unpivot": (q_unpivot, SQL_UNPIVOT),
    "fn_scalar_subquery": (q_scalar_subquery, SQL_SCALAR_SUBQUERY),
    "fn_null_handling": (q_null_handling, SQL_NULL_HANDLING),
})


def q_wf_rolling_7d(spark: SparkSession, sf: str) -> DataFrame:
    """Time-RANGE rolling window: per-user 7-day trailing event sum+count.
    rangeBetween over epoch seconds (Spark range frames are numeric; Spark
    unix_timestamp TRUNCATES subseconds, so the oracle floors epoch()).
    Sum+count rather than avg: values carry 2 decimals, so the rolling sum
    is an exact 2dp decimal and round(.,2) never sits on a half-way
    boundary — avg of 2 values does on half of all odd-hundredth sums,
    where Spark HALF_UP and DuckDB binary rounding disagree."""
    sec = F.unix_timestamp("ts")
    w = (W.partitionBy("user_id").orderBy(sec)
         .rangeBetween(-7 * 86400, 0))
    return _ev(spark, sf).select(
        "event_id", "user_id",
        F.round(F.sum("value").over(w), 2).alias("sum_7d"),
        F.count("*").over(w).alias("n_7d"))


SQL_WF_ROLLING_7D = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                              RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2)
         AS sum_7d,
       count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS n_7d
FROM events
"""


SQL_INVENTORY["wf_rolling_7d"] = (q_wf_rolling_7d, SQL_WF_ROLLING_7D)
