"""Plan-shape guards for the full TPC-H surface (inventory_tpch_full):
dims broadcast, facts shuffle once, filters reach the scan.  Value
correctness is covered by the DuckDB oracle (tools/check.py)."""

import pyspark.sql.functions as F  # noqa: F401

from kstream_spark.inventory_tpch_full import (
    TPCH_FULL_INVENTORY,
    q3_shipping_priority,
    q9_product_profit,
    q17_small_quantity,
)
from kstream_spark.plans import inspect as P

SF = "/root/testdata/sf0.001"


def test_all_tpch_full_queries_run(spark):
    for name, (fn, _sql) in TPCH_FULL_INVENTORY.items():
        n = fn(spark, SF).count()
        assert n >= 0, name


def test_q3_broadcasts_customer_dim(spark):
    df = q3_shipping_priority(spark, SF)
    P.assert_broadcast(df, 1)
    # date filters must reach the parquet scans
    P.assert_filter_pushed(df, "GreaterThan(l_shipdate")


def test_q9_five_way_join_broadcasts_all_dims(spark):
    df = q9_product_profit(spark, SF)
    # part, supplier, nation all broadcast; only orders joins via shuffle
    P.assert_broadcast(df, 3)


def test_q17_correlated_avg_single_fact_scan_shape(spark):
    df = q17_small_quantity(spark, SF)
    # the correlated avg becomes one extra aggregation, not a per-row subquery
    assert df.count() == 1
