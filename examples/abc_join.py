"""Runnable port of the reference's example_2 app shape
(/root/reference/examples/example_2/stream/a.go:17-104): one common topic
carrying three event types -> branch 3 ways -> A⋈B on key -> AB⋈C on key.

Run:  python examples/abc_join.py
"""

import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from kstream_spark import StreamBuilder, get_spark  # noqa: E402


def main():
    spark = get_spark("abc_example")
    b = StreamBuilder(spark)

    # the common "abc topic": purchase/signup/error events keyed by user
    abc = b.stream("/root/testdata/sf0.001/events.parquet", name="abc")
    br = abc.branch([
        ("a", F.col("event_type") == "purchase"),
        ("b", F.col("event_type") == "signup"),
        ("c", F.col("event_type") == "error"),
    ])

    ab = br["a"].join_stream(
        br["b"], on="user_id", within=("12 hours", "12 hours"), ts_col="ts",
        select=[F.col("l.user_id").alias("user_id"),
                F.col("l.event_id").alias("a_id"),
                F.col("r.event_id").alias("b_id"),
                F.col("l.ts").alias("ts")])
    abc_joined = ab.join_stream(
        br["c"], on="user_id", within=("12 hours", "12 hours"), ts_col="ts",
        select=[F.col("l.user_id").alias("user_id"), F.col("l.a_id").alias("a_id"),
                F.col("l.b_id").alias("b_id"), F.col("r.event_id").alias("c_id")])

    print("ABC joins (purchase+signup+error for one user within 12h):")
    abc_joined.to_df().show(10)
    print("total:", abc_joined.to_df().count())


if __name__ == "__main__":
    main()
