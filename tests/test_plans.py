"""Plan-shape guards: the scale properties (pushdown, pruning, broadcast,
shuffle counts) asserted so a regression fails in CI."""

import pyspark.sql.functions as F

from kstream_spark import StreamBuilder
from kstream_spark.plans import inspect as P

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_and_pruning(spark):
    b = StreamBuilder(spark)
    df = (b.stream(f"{SF}/events.parquet")
          .filter(F.col("event_type") == "purchase")
          .select("event_id", "event_type").to_df())
    P.assert_filter_pushed(df, "EqualTo(event_type,purchase)")
    P.assert_column_pruned(df, "props")


def test_lookup_join_broadcasts_no_shuffle_of_fact(spark):
    b = StreamBuilder(spark)
    # snapshot dim: zero shuffles anywhere
    cust = b.global_table(f"{SF}/customer.parquet", key="c_custkey", sync=False,
                          snapshot=True)
    df = b.stream(f"{SF}/events.parquet") \
        .join_global_table(cust, on="user_id", how="left").to_df()
    P.assert_broadcast(df, 1)
    P.assert_no_sort_merge_join(df)
    assert P.shuffle_count(df) == 0

    # changelog dim: compaction costs exactly ONE shuffle of the (small)
    # dimension side; the fact side still never shuffles
    cust2 = b.global_table(f"{SF}/customer.parquet", key="c_custkey", sync=False)
    df2 = b.stream(f"{SF}/events.parquet") \
        .join_global_table(cust2, on="user_id", how="left").to_df()
    P.assert_broadcast(df2, 1)
    assert P.shuffle_count(df2) == 1


def test_star_join_all_broadcast(spark):
    from kstream_spark.inventory import q_star_join
    df = q_star_join(spark, SF)
    P.assert_broadcast(df, 3)
    P.assert_no_sort_merge_join(df)
    assert P.shuffle_count(df) == 0


def test_compaction_single_shuffle(spark):
    # latest-by-key must be ONE hash aggregation (partial + final), not a
    # window-sort: exactly one shuffle exchange
    from kstream_spark.inventory import q_versioned_upsert
    df = q_versioned_upsert(spark, SF)
    P.assert_max_shuffles(df, 1)


def test_pricing_summary_single_shuffle(spark):
    from kstream_spark.inventory import q_pricing_summary
    df = q_pricing_summary(spark, SF)
    P.assert_max_shuffles(df, 1)
    P.assert_filter_pushed(df, "l_shipdate")
