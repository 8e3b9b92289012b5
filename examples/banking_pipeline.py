"""Runnable port of the reference's example_1 banking app shape
(/root/reference/examples/example_1/stream/account_credited.go:44-63) onto
the driver testdata: transaction stream (events) -> branch by type
(first-match) -> recency filter -> chained lookup joins (customer, nation)
-> project "message" -> sink + DLQ.

Run:  python examples/banking_pipeline.py
"""

import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from kstream_spark import StreamBuilder, get_spark  # noqa: E402
from kstream_spark.operators.joins import DLQ  # noqa: E402

SF = "/root/testdata/sf0.001"


def main():
    spark = get_spark("banking_example")
    b = StreamBuilder(spark)

    # "global tables" synced before the stream starts (boot barrier)
    customer = b.global_table(f"{SF}/customer.parquet", key="c_custkey",
                              name="customer", snapshot=True)
    nation = b.global_table(f"{SF}/nation.parquet", key="n_nationkey",
                            name="nation", snapshot=True)

    tx = b.stream(f"{SF}/events.parquet", name="transactions")
    branches = tx.branch([
        ("credited", F.col("event_type") == "purchase"),
        ("debited", F.col("event_type") == "signup"),
        ("other", F.lit(True)),
    ])

    dlq = DLQ()
    messages = (
        branches["credited"]
        .filter(F.col("value") > 5)                       # recency-filter analog
        .join_global_table(customer, on="user_id", dlq=dlq)
        .join_global_table(nation, on="c_nationkey", dlq=dlq)
        .select("event_id",
                F.col("c_name").alias("customer_name"),
                F.col("n_name").alias("nation"),
                F.concat(F.lit("credited "), F.round("value", 2)).alias("text"))
    )

    print("messages:")
    messages.to_df().show(5, truncate=False)
    misses = dlq.df()
    print("DLQ rows:", 0 if misses is None else misses.count())

    # materialize per-customer latest credited amount as a queryable store
    branches["credited"].materialize(b.stores, "latest_credit",
                                     key="user_id", version="event_id")
    print("store point lookup user 12:")
    b.stores.store("latest_credit").get(12).select("user_id", "event_id", "value").show()


if __name__ == "__main__":
    main()
