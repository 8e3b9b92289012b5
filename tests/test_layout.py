"""Sessionization (behavior.sessionize) and Z-order layout (layout.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from kstream_spark.operators import behavior as B
from kstream_spark.operators.layout import cluster_by_zorder, zorder_key


def test_sessionize_gap_splits(spark):
    rows = [
        (1, 10, datetime(2024, 1, 1, 10, 0)),
        (2, 10, datetime(2024, 1, 1, 10, 20)),   # 20 min -> same session
        (3, 10, datetime(2024, 1, 1, 11, 0)),    # 40 min -> new session
        (4, 20, datetime(2024, 1, 1, 10, 0)),    # other user -> own session
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["event_id"]: (r["session_n"], r["is_session_start"]) for r in
           B.sessionize(df, "user_id", "ts", "30 minutes",
                        id_col="event_id").collect()}
    assert out == {1: (1, 1), 2: (1, 0), 3: (2, 1), 4: (1, 1)}


def test_sessionize_boundary_is_strict(spark):
    # exactly 30 minutes apart: NOT a new session (> gap, not >=)
    rows = [(1, 1, datetime(2024, 1, 1, 10, 0)),
            (2, 1, datetime(2024, 1, 1, 10, 30))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = B.sessionize(df, "user_id", "ts", "30 minutes", id_col="event_id")
    assert out.agg(F.max("session_n")).first()[0] == 1


def test_zorder_key_known_interleave(spark):
    df = spark.createDataFrame([(3, 1), (0, 0), (65535, 65535)], "a long, b long")
    out = df.select(zorder_key(F.col("a"), F.col("b"), bits=16).alias("z")) \
        .collect()
    zs = sorted(r["z"] for r in out)
    # a=3 -> bits at 1,3 = 10; b=1 -> bit 0 = 1 -> 11
    assert zs[0] == 0
    assert zs[1] == 11
    assert zs[2] == (1 << 32) - 1  # all 32 bits set


def test_cluster_by_zorder_tightens_bounding_boxes(spark):
    # 64x64 grid; clustered into 16 ranges -> per-partition (a,b) bounding
    # boxes must be far smaller than the full domain
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    parts = (cluster_by_zorder(df, "a", "b", num_files=16, bits=6)
             .withColumn("pid", F.spark_partition_id())
             .groupBy("pid")
             .agg((F.max("a") - F.min("a")).alias("da"),
                  (F.max("b") - F.min("b")).alias("db"),
                  F.count(F.lit(1)).alias("n"))
             .collect())
    assert sum(p["n"] for p in parts) == 64 * 64
    avg_area = sum((p["da"] + 1) * (p["db"] + 1) for p in parts) / len(parts)
    # random assignment would give ~64*64 per partition; z-order keeps
    # boxes near 64*64/16 = 256
    assert avg_area < 64 * 64 / 2
