"""TWS-vs-legacy A/B for session_stream (VERDICT r13 #4): the r13 round
added a Spark-4 transformWithStateInPandas arm auto-selected when
available, and STREAM_BENCH_r13 showed sessionize 124k -> 95k rec/s.
This drives the EXACT bench_sessionize shape with ``impl=`` forced both
ways, alternating, min-of-N, in one session — if the TWS arm is the
cost, auto-selection must be gated.

Usage: python tools/ab_sessionize_r14.py [num_records] [rounds]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def run_once(spark, impl: str, n: int) -> float:
    import pyspark.sql.functions as F

    from kstream_spark.streaming.core import read_stream_parquet
    from kstream_spark.streaming.state import session_stream
    tmp = tempfile.mkdtemp(prefix=f"ab_sess_{impl}_")
    src = f"{tmp}/sin"
    (spark.range(n)
     .select(F.col("id").alias("uuid"), (F.col("id") % 10_000).alias("k"),
             (F.col("id") % 997).cast("double").alias("v"),
             F.timestamp_seconds(F.col("id") % 100_000).alias("ts"))
     .repartition(8).write.parquet(src))
    ev = (read_stream_parquet(spark, src)
          .select((F.col("uuid") % 10_000).alias("user_id"), F.col("ts"))
          .withWatermark("ts", "1 hour"))
    sess = session_stream(ev, "user_id", "ts", gap="30 minutes", impl=impl)
    t0 = time.time()
    q = (sess.writeStream.format("noop").outputMode("append")
         .option("checkpointLocation", f"{tmp}/sck").start())
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    dt = time.time() - t0
    shutil.rmtree(tmp, ignore_errors=True)
    return dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from kstream_spark import get_spark
    from kstream_spark.streaming.state import tws_available
    spark = get_spark(app_name="ab_sessionize")
    print("tws_available:", tws_available(spark))
    # warm both arms once untimed
    for impl in ("legacy", "tws"):
        run_once(spark, impl, 50_000)
    for r in range(rounds):
        for impl in ("legacy", "tws"):
            dt = run_once(spark, impl, n)
            print(f"round{r} {impl}: {dt:.2f}s = {round(n / dt):,} rec/s")


if __name__ == "__main__":
    main()
