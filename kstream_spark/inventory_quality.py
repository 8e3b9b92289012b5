"""Data-quality + SCD2 inventory (operators/quality.py, operators/scd.py).

Parity notes: every metric is an integer count (no float boundaries);
SCD2 intervals compare raw timestamps; change detection is null-safe
equality on strings (IS DISTINCT FROM in DuckDB)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kstream_spark.builder import StreamBuilder
from kstream_spark.operators import quality as Q
from kstream_spark.operators.scd import (scd2_apply, scd2_history,
                                         scd2_lookup)


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return StreamBuilder(spark).table(f"{sf}/{name}.parquet",
                                      name=name).to_df()


PROFILE_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]


def q_dq_profile(spark: SparkSession, sf: str) -> DataFrame:
    """One-pass column profile of orders (quality.profile)."""
    return Q.profile(_t(spark, sf, "orders"), PROFILE_COLS)


SQL_DQ_PROFILE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM orders"""
    for c in PROFILE_COLS)


RULES_SQL = {
    "qty_not_positive": "l_quantity <= 0",
    "price_negative": "l_extendedprice < 0",
    "discount_out_of_range": "l_discount < 0 OR l_discount > 1",
    "shipdate_null": "l_shipdate IS NULL",
    "returnflag_invalid": "l_returnflag NOT IN ('A', 'N', 'R')",
}


def q_dq_violations(spark: SparkSession, sf: str) -> DataFrame:
    """Single-pass rule-violation report over lineitem (quality.check)."""
    li = _t(spark, sf, "lineitem")
    rules = {
        "qty_not_positive": F.col("l_quantity") <= 0,
        "price_negative": F.col("l_extendedprice") < 0,
        "discount_out_of_range": (F.col("l_discount") < 0)
        | (F.col("l_discount") > 1),
        "shipdate_null": F.col("l_shipdate").isNull(),
        "returnflag_invalid": ~F.col("l_returnflag").isin("A", "N", "R"),
    }
    return Q.check(li, rules)


SQL_DQ_VIOLATIONS = "\nUNION ALL\n".join(
    f"""SELECT '{name}' AS rule,
       CAST(sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations FROM lineitem"""
    for name, cond in RULES_SQL.items())


def q_dq_orphans(spark: SparkSession, sf: str) -> DataFrame:
    """Referential audit: lineitem rows with no parent order + customer
    rows with no nation (quality.orphans), as counts."""
    li_orphans = Q.orphans(_t(spark, sf, "lineitem"), "l_orderkey",
                           _t(spark, sf, "orders"), "o_orderkey")
    cust_orphans = Q.orphans(_t(spark, sf, "customer"), "c_nationkey",
                             _t(spark, sf, "nation"), "n_nationkey")
    a = li_orphans.agg(F.count(F.lit(1)).alias("n")) \
        .select(F.lit("lineitem_without_order").alias("relation"), "n")
    b = cust_orphans.agg(F.count(F.lit(1)).alias("n")) \
        .select(F.lit("customer_without_nation").alias("relation"), "n")
    return a.unionByName(b)


SQL_DQ_ORPHANS = """
SELECT 'lineitem_without_order' AS relation, count(*) AS n
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'customer_without_nation' AS relation, count(*) AS n
FROM customer WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation)
"""


def q_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    """SCD2 validity intervals of each user's event_type state
    (operators/scd.scd2_history)."""
    ev = _t(spark, sf, "events")
    return scd2_history(ev, "user_id", ["event_type"], "ts",
                        id_col="event_id")


SQL_SCD2_HISTORY = """
WITH o AS (SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type,
             lag(ts) OVER w AS prev_ts
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
runs AS (SELECT user_id, event_type, ts, event_id
         FROM o
         WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_type)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS valid_to,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         AS is_current
FROM runs
"""


def q_dq_drift_psi(spark: SparkSession, sf: str) -> DataFrame:
    """Population-stability drift between the first and second half of
    the events month (day <= 15 vs day > 15), per event_type, over
    power-of-two value buckets (quality.drift_psi).  The bucketizer is
    bit-length of floor(value) — exact integer arithmetic, no libm floor
    at boundaries — and each PSI contribution is a rounded integer micro
    term from Laplace-smoothed exact-integer ratios."""
    ev = _t(spark, sf, "events")
    ref = ev.filter(F.dayofmonth("ts") <= 15)
    cur = ev.filter(F.dayofmonth("ts") > 15)
    bucket = (F.length(F.bin(F.floor("value").cast("long"))) - 1) \
        .cast("long")
    return Q.drift_psi(ref, cur, bucket, group_cols=["event_type"],
                       n_buckets=10)


SQL_DQ_DRIFT_PSI = """
WITH b AS (SELECT event_type,
                  CAST(length(bin(CAST(floor(value) AS BIGINT))) - 1
                       AS BIGINT) AS bucket,
                  CASE WHEN day(ts) <= 15 THEN 'r' ELSE 'c' END AS period
           FROM events),
cr AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS count_ref
       FROM b WHERE period = 'r' GROUP BY 1, 2),
cc AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS count_cur
       FROM b WHERE period = 'c' GROUP BY 1, 2),
tr AS (SELECT event_type, sum(count_ref) AS nr FROM cr GROUP BY 1),
tc AS (SELECT event_type, sum(count_cur) AS nc FROM cc GROUP BY 1),
j AS (SELECT coalesce(cr.event_type, cc.event_type) AS event_type,
             coalesce(cr.bucket, cc.bucket) AS bucket,
             coalesce(count_ref, 0) AS count_ref,
             coalesce(count_cur, 0) AS count_cur
      FROM cr FULL OUTER JOIN cc
        ON cr.event_type = cc.event_type AND cr.bucket = cc.bucket)
SELECT j.event_type, bucket, count_ref, count_cur,
       CAST(round(((count_cur + 1) / (coalesce(nc, 0) + 10)
                   - (count_ref + 1) / (coalesce(nr, 0) + 10))
                  * ln(((count_cur + 1) / (coalesce(nc, 0) + 10))
                       / ((count_ref + 1) / (coalesce(nr, 0) + 10)))
                  * 1e6, 0) AS BIGINT) AS psi_micro
FROM j LEFT JOIN tr ON j.event_type = tr.event_type
       LEFT JOIN tc ON j.event_type = tc.event_type
"""


def q_scd2_incremental(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental SCD2 merge (operators/scd.scd2_apply): a snapshot built
    from the first 20 days + the later days applied as a change batch.
    The ORACLE is the plain full-log derivation — hash equality IS the
    incremental == batch invariant."""
    ev = _t(spark, sf, "events")
    snap = scd2_history(ev.filter(F.dayofmonth("ts") <= 20), "user_id",
                        ["event_type"], "ts", id_col="event_id")
    changes = ev.filter(F.dayofmonth("ts") > 20)
    return scd2_apply(snap, changes, "user_id", ["event_type"], "ts",
                      id_col="event_id")


def q_scd2_asof(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time dimension read (operators/scd.scd2_lookup): every
    user's state as of Jan 15 — the query a training-data join runs to
    attach dimension attributes AS THEY WERE when the fact happened."""
    ev = _t(spark, sf, "events")
    hist = scd2_history(ev, "user_id", ["event_type"], "ts",
                        id_col="event_id")
    return scd2_lookup(hist, "user_id", "2024-01-15 00:00:00") \
        .select("user_id", "event_type", "valid_from")


SQL_SCD2_ASOF = f"""
WITH h AS ({SQL_SCD2_HISTORY})
SELECT user_id, event_type, valid_from
FROM h
WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
"""


QUALITY_INVENTORY: dict[str, tuple] = {
    "dq_profile": (q_dq_profile, SQL_DQ_PROFILE),
    "dq_violations": (q_dq_violations, SQL_DQ_VIOLATIONS),
    "dq_orphans": (q_dq_orphans, SQL_DQ_ORPHANS),
    "scd2_history": (q_scd2_history, SQL_SCD2_HISTORY),
    "dq_drift_psi": (q_dq_drift_psi, SQL_DQ_DRIFT_PSI),
    "scd2_incremental": (q_scd2_incremental, SQL_SCD2_HISTORY),
    "scd2_asof": (q_scd2_asof, SQL_SCD2_ASOF),
}


def q_dq_key_skew(spark: SparkSession, sf: str) -> DataFrame:
    """Join-key skew profile of events.user_id (quality.key_skew): the
    top-10 heaviest keys with exact-integer ppm shares next to the
    table totals — the operational pre-check that feeds
    util.skew_join's hot_keys argument."""
    return Q.key_skew(_t(spark, sf, "events"), "user_id", top_n=10)


SQL_DQ_KEY_SKEW = """
WITH c AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS cnt
           FROM events GROUP BY user_id),
t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys FROM c),
top AS (SELECT key, cnt,
               CAST(row_number() OVER (ORDER BY cnt DESC, key) AS BIGINT)
               AS rank
        FROM c ORDER BY cnt DESC, key LIMIT 10)
SELECT key, cnt, (2000000 * cnt + n_rows) // (2 * n_rows) AS share_ppm,
       rank, n_rows, n_keys
FROM top, t
"""

QUALITY_INVENTORY["dq_key_skew"] = (q_dq_key_skew, SQL_DQ_KEY_SKEW)


# ingestion-volume anomaly gate: daily event counts vs the PREVIOUS day's
# trailing EWMA (operators/behavior.ewma composed over the count series) —
# the feed-health alarm a corpus pipeline runs before trusting a new drop.
# The day key is exact; the flag compares against python-float literal
# weight tables shared verbatim with the oracle (no cross-engine pow).
def q_dq_volume_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window as W
    from kstream_spark.operators.behavior import ewma
    ev = StreamBuilder(spark).stream(f"{sf}/events.parquet",
                                     name="events").to_df()
    daily = (ev.groupBy(F.date_trunc("day", "ts").alias("day"))
             .agg(F.count("*").cast("long").alias("n_events"))
             .withColumn("_k", F.lit(1)))
    sm = ewma(daily, "_k", ["day"], "n_events", alpha=0.5, window=7)
    w = W.partitionBy("_k").orderBy("day")
    out = (sm.withColumn("baseline", F.lag("ewma").over(w))
           .select(F.date_format("day", "yyyy-MM-dd").alias("day"),
                   "n_events",
                   F.round(F.coalesce(F.col("baseline"),
                                      F.col("n_events").cast("double")), 6)
                   .alias("baseline"))
           .withColumn("ratio_x1m",
                       F.floor(F.col("n_events") * 1000000.0
                               / F.col("baseline")).cast("long"))
           .withColumn("anomaly",
                       (F.col("ratio_x1m") > 3000000)
                       | (F.col("ratio_x1m") * 3 < 1000000)))
    return out.orderBy("day")


def _volume_anomaly_sql(alpha: float = 0.5, window: int = 7) -> str:
    w = [alpha * (1 - alpha) ** o for o in range(window)]
    norm = [sum(w[: s + 1]) for s in range(window)]
    wl = "[" + ", ".join(repr(x) for x in w) + "]"
    nl = "[" + ", ".join(repr(x) for x in norm) + "]"
    return f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1),
sm AS (
  SELECT day, n_events,
    list(CAST(n_events AS DOUBLE)) OVER (
      ORDER BY day ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
      AS arr
  FROM daily),
ew AS (
  SELECT day, n_events,
    round(list_sum(list_transform(range(1, len(arr) + 1),
                                  j -> arr[j] * {wl}[len(arr) - j + 1]))
          / {nl}[len(arr)], 6) AS ewma
  FROM sm),
base AS (
  SELECT day, n_events,
    round(coalesce(lag(ewma) OVER (ORDER BY day),
                   CAST(n_events AS DOUBLE)), 6) AS baseline
  FROM ew)
SELECT strftime(day, '%Y-%m-%d') AS day, n_events, baseline,
       CAST(floor(n_events * 1000000.0 / baseline) AS BIGINT) AS ratio_x1m,
       (floor(n_events * 1000000.0 / baseline) > 3000000
        OR floor(n_events * 1000000.0 / baseline) * 3 < 1000000) AS anomaly
FROM base ORDER BY day
"""


QUALITY_INVENTORY["dq_volume_anomaly"] = (q_dq_volume_anomaly,
                                          _volume_anomaly_sql())
