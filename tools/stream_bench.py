"""Streaming throughput microbench — the comparison point for the
reference's headline claim (50,000 msg/s at 2-5 ms latency with
micro-batching, /root/reference/README.md:13-15).

Drives the full streaming path: file-stream source -> filter/transform ->
version-gated store materialization (foreachBatch merge), measuring
end-to-end records/second across micro-batches.

Usage: python tools/stream_bench.py [num_records]
Prints one JSON line {"metric": "streaming_records_per_sec", ...}.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000

    import pyspark.sql.functions as F

    from kstream_spark import StreamBuilder, get_spark
    from kstream_spark.streaming import core as SC

    spark = get_spark(app_name="kstream_spark_stream_bench")
    b = StreamBuilder(spark)

    with tempfile.TemporaryDirectory() as tmp:
        src = f"{tmp}/in"
        # seed the "topic": n records across several files (micro-batches)
        (spark.range(n)
         .select(F.col("id").alias("uuid"), (F.col("id") % 10_000).alias("k"),
                 (F.col("id") % 997).cast("double").alias("v"),
                 F.timestamp_seconds(F.col("id") % 100_000).alias("ts"))
         .repartition(8).write.parquet(src))

        stream = (SC.read_stream_parquet(spark, src)
                  .filter(F.col("v") >= 0)
                  .withColumn("v2", F.col("v") * 2))
        t0 = time.time()
        q = SC.materialize_stream(stream, b.stores, "bench_store", key="k",
                                  version="uuid",
                                  checkpoint_dir=f"{tmp}/ck")
        q.processAllAvailable()
        batch_ms = [p["durationMs"]["triggerExecution"]
                    for p in q.recentProgress
                    if "addBatch" in (p["durationMs"] or {})]
        q.stop()
        q.awaitTermination(30)
        dt = time.time() - t0
        keys = b.stores.store("bench_store").get_all().count()

    print(json.dumps({
        "metric": "streaming_records_per_sec",
        "value": round(n / dt),
        "unit": "records/sec",
        "records": n,
        "seconds": round(dt, 2),
        "micro_batch_latency_ms": batch_ms,
        "distinct_keys_materialized": keys,
        "baseline_reference_msgs_per_sec": 50_000,
        "baseline_reference_latency_ms": "2-5 (per-record; micro-batch here)",
    }))


if __name__ == "__main__":
    main()
