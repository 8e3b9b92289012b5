"""Streaming throughput microbench — the comparison point for the
reference's headline claim (50,000 msg/s at 2-5 ms latency with
micro-batching, /root/reference/README.md:13-15).

Drives FOUR full streaming pipeline shapes end-to-end and reports
records/second for each:

  materialize — file-stream source -> filter/transform -> version-gated
      store materialization (foreachBatch merge); the reference's
      hot path (consume -> process -> materialized view).
  windowed_agg — watermarked tumbling-window aggregation (count/sum/
      approx-distinct per key-group), the built-in stateful shape with
      no Python in the loop.
  stream_join — unbounded-buffer stateful stream-stream join
      (applyInPandasWithState; reference side_joiner.go semantics),
      the heaviest per-key state shape.
  sessionize  — event-time gap sessionization with timeouts
      (applyInPandasWithState, EventTimeTimeout), the
      watermark-driven state shape.

Usage: python tools/stream_bench.py [num_records]
Prints one JSON line {"metric": "streaming_records_per_sec", ...} whose
value is the materialize (hot-path) number; per-shape results under
"shapes".
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def _seed(spark, path: str, n: int, files: int = 8) -> None:
    import pyspark.sql.functions as F
    (spark.range(n)
     .select(F.col("id").alias("uuid"), (F.col("id") % 10_000).alias("k"),
             (F.col("id") % 997).cast("double").alias("v"),
             F.timestamp_seconds(F.col("id") % 100_000).alias("ts"))
     .repartition(files).write.parquet(path))


def bench_materialize(spark, b, tmp: str, n: int) -> dict:
    import pyspark.sql.functions as F
    from kstream_spark.streaming import core as SC
    src = f"{tmp}/in"
    _seed(spark, src, n)
    stream = (SC.read_stream_parquet(spark, src)
              .filter(F.col("v") >= 0)
              .withColumn("v2", F.col("v") * 2))
    t0 = time.time()
    q = SC.materialize_stream(stream, b.stores, "bench_store", key="k",
                              version="uuid", checkpoint_dir=f"{tmp}/ck")
    q.processAllAvailable()
    batch_ms = [p["durationMs"]["triggerExecution"] for p in q.recentProgress
                if "addBatch" in (p["durationMs"] or {})]
    q.stop()
    q.awaitTermination(30)
    dt = time.time() - t0
    keys = b.stores.store("bench_store").get_all().count()
    return {"records_per_sec": round(n / dt), "records": n,
            "seconds": round(dt, 2), "micro_batch_latency_ms": batch_ms,
            "distinct_keys_materialized": keys}


def bench_stream_join(spark, tmp: str, n: int,
                      buckets: int | None = None) -> dict:
    """Both sides stream; per-key buffers in keyed state.  Keys are wide
    (n/5 distinct) so per-key buffers stay small — the throughput number
    measures state machinery, not a deliberate cross-product blowup.
    ``buckets`` benches the bucketed-state production arm (per-bucket
    state groups, per-key buffers inside — the high-cardinality dial)."""
    import pyspark.sql.functions as F
    from kstream_spark.streaming.core import read_stream_parquet
    from kstream_spark.streaming.join import stateful_stream_join
    tag = "b" if buckets else "k"
    src = f"{tmp}/jin_{tag}"
    _seed(spark, src, n)
    base = read_stream_parquet(spark, src).withColumn(
        "k5", (F.col("uuid") % (n // 5)).alias("k5"))
    left = base.filter(F.col("uuid") % 2 == 0).select(
        F.col("k5").alias("k"), F.col("v").alias("lv"))
    right = base.filter(F.col("uuid") % 2 == 1).select(
        F.col("k5").alias("k"), F.col("v").alias("rv"))
    joined = stateful_stream_join(left, right, "k", ["lv"], ["rv"],
                                  buckets=buckets)
    t0 = time.time()
    q = (joined.writeStream.format("noop")
         .option("checkpointLocation", f"{tmp}/jck_{tag}").start())
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    dt = time.time() - t0
    return {"records_per_sec": round(n / dt), "records": n,
            "seconds": round(dt, 2),
            **({"buckets": buckets} if buckets else {})}


def bench_windowed_agg(spark, tmp: str, n: int) -> dict:
    """Watermarked tumbling-window aggregation — the built-in stateful
    shape (native state store, no Python in the loop): events bucketed
    into 10-minute windows per key-group with late data bounded by a
    1-hour watermark."""
    import pyspark.sql.functions as F
    from kstream_spark.streaming.core import read_stream_parquet
    src = f"{tmp}/win"
    _seed(spark, src, n)
    ev = (read_stream_parquet(spark, src)
          .withColumn("g", F.col("k") % 100)
          .withWatermark("ts", "1 hour"))
    agg = (ev.groupBy("g", F.window("ts", "10 minutes"))
           .agg(F.count("*").alias("n"), F.sum("v").alias("sv"),
                F.approx_count_distinct("uuid").alias("du")))
    t0 = time.time()
    # update mode, not append: with a bounded seed the watermark never
    # passes most window ends, so append would emit ~nothing and the
    # number would measure ingestion only — update emits every batch's
    # changed windows, exercising the full state+emission path (r4 advice)
    q = (agg.writeStream.format("noop").outputMode("update")
         .option("checkpointLocation", f"{tmp}/wck").start())
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    dt = time.time() - t0
    return {"records_per_sec": round(n / dt), "records": n,
            "seconds": round(dt, 2)}


def bench_sessionize(spark, tmp: str, n: int) -> dict:
    import pyspark.sql.functions as F
    from kstream_spark.streaming.core import read_stream_parquet
    from kstream_spark.streaming.state import session_stream
    src = f"{tmp}/sin"
    _seed(spark, src, n)
    ev = (read_stream_parquet(spark, src)
          .select((F.col("uuid") % 10_000).alias("user_id"), F.col("ts"))
          .withWatermark("ts", "1 hour"))
    sess = session_stream(ev, "user_id", "ts", gap="30 minutes")
    t0 = time.time()
    q = (sess.writeStream.format("noop").outputMode("append")
         .option("checkpointLocation", f"{tmp}/sck").start())
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    dt = time.time() - t0
    return {"records_per_sec": round(n / dt), "records": n,
            "seconds": round(dt, 2)}


def bench_ann_admit(spark, tmp: str, n: int) -> dict:
    """Streaming ANN index maintenance throughput: n synthetic 64-d
    vectors arrive as a file stream and are encoded against a FIXED
    persisted index (8 coarse cells + 4x16 PQ codebooks) into the code
    store — the per-batch cost of keeping an IVF-PQ index current as
    data lands (streaming/ann.admit_stream)."""
    import pyspark.sql.functions as F

    from kstream_spark.operators.similarity import (kmeans_centroids,
                                                    pq_codebooks)
    from kstream_spark.streaming import ann as A
    from kstream_spark.streaming import core as SC

    src = f"{tmp}/ann_in"
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: (F.pmod(F.xxhash64(F.col("id") * i), F.lit(1000))
                   .cast("double") / 1000.0))
    (spark.range(n).select(F.col("id").alias("vec_id"),
                           vec.alias("embedding"))
     .repartition(8).write.parquet(src))
    train = spark.read.parquet(src).limit(2000)
    cents = kmeans_centroids(train, "embedding", k=8, iters=1,
                             id_col="vec_id")
    books = pq_codebooks(train, "embedding", m=4, k=16, iters=1,
                         id_col="vec_id")
    t0 = time.time()
    q = A.admit_stream(SC.read_stream_parquet(spark, src), "vec_id",
                       "embedding", cents, books, f"{tmp}/ann_store",
                       f"{tmp}/ann_ck")
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    dt = time.time() - t0
    stored = spark.read.parquet(f"{tmp}/ann_store").count()
    return {"records_per_sec": round(n / dt), "records": n,
            "seconds": round(dt, 2), "codes_stored": stored}


def bench_tokenize(spark, tmp: str, n: int) -> dict:
    """Streaming tokenizer-inference throughput: n synthetic documents
    arrive as a file stream and are Viterbi-tokenized against a FIXED
    persisted unigram vocab (streaming/text.tokenize_stream) — the
    per-batch cost of tokenize-at-ingest."""
    import pyspark.sql.functions as F

    from kstream_spark.operators.text import unigram_train
    from kstream_spark.streaming import text as ST

    src = f"{tmp}/tok_in"
    # ~5-word synthetic docs from a 64-word vocabulary
    word = lambda j: F.concat(F.lit("w"), F.pmod(
        F.xxhash64(F.col("id") * j), F.lit(64)).cast("string"))
    (spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[word(j) for j in range(1, 6)]).alias("text"))
     .repartition(8).write.parquet(src))
    train = spark.read.parquet(src).limit(5000)
    unigram_train(train, "text", seed_v=60, keep_v=40, iters=1,
                  max_piece_len=3).write.parquet(f"{tmp}/tok_vocab")
    t0 = time.time()
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src))
    q = ST.tokenize_stream(stream, f"{tmp}/tok_vocab", f"{tmp}/tok_out",
                           f"{tmp}/tok_ck", id_col="doc_id",
                           text_col="text", max_piece_len=3)
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    dt = time.time() - t0
    toks = spark.read.parquet(f"{tmp}/tok_out").count()
    return {"records_per_sec": round(n / dt), "records": n,
            "seconds": round(dt, 2), "tokens_emitted": toks}


def bench_corpus_admit(spark, tmp: str, n: int) -> dict:
    """Streaming corpus-admission throughput: n synthetic documents
    arrive as a file stream and pass the gopher quality gate, the
    exact-hash gate, and the increment-vs-corpus MinHash band join
    before landing in the corpus + signature store
    (streaming/corpus.admit_stream with gopher_gate) — the full
    ingestion gauntlet per batch.

    Workload shape: ids collide mod n//8, so only n/8 texts are unique
    and 7/8 of the stream is EXACT duplicates — the re-crawl-heavy
    ingest profile where the cheap hash gate must shed the bulk before
    any MinHash work.  ``unique_fraction`` in the result records this
    so the records_per_sec is read against the right mix."""
    import pyspark.sql.functions as F

    from kstream_spark.streaming.corpus import admit_stream, gopher_gate

    src = f"{tmp}/corp_in"
    word = lambda j: F.concat(F.lit("w"), F.pmod(
        F.xxhash64(F.col("base") * j), F.lit(512)).cast("string"))
    # ids collide mod 8 -> exact duplicates the hash gate must reject;
    # 24 words + "the" so the gopher word-count/stop rules pass
    (spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % (n // 8 if n >= 8 else 1)).alias("base"))
     .select("doc_id",
             F.concat_ws(" ", F.lit("the"),
                         *[word(j) for j in range(1, 25)]).alias("text"))
     .repartition(8).write.parquet(src))
    t0 = time.time()
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src))
    q = admit_stream(stream, f"{tmp}/corp_out", f"{tmp}/corp_sigs",
                     f"{tmp}/corp_ck", id_col="doc_id", text_col="text",
                     quality_gate=gopher_gate("doc_id", "text",
                                              min_words=10, max_words=200,
                                              min_stopwords=1))
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    dt = time.time() - t0
    admitted = spark.read.parquet(f"{tmp}/corp_out").count()
    return {"records_per_sec": round(n / dt), "records": n,
            "seconds": round(dt, 2), "admitted": admitted,
            "unique_fraction": round((n // 8 if n >= 8 else 1) / n, 4)}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000

    from kstream_spark import StreamBuilder, get_spark

    spark = get_spark(app_name="kstream_spark_stream_bench")
    b = StreamBuilder(spark)
    shapes = {}
    with tempfile.TemporaryDirectory() as tmp:
        shapes["materialize"] = bench_materialize(spark, b, tmp, n)
        shapes["windowed_agg"] = bench_windowed_agg(spark, tmp, n)
        shapes["stream_join"] = bench_stream_join(spark, tmp, n)
        shapes["stream_join_bucketed"] = bench_stream_join(
            spark, tmp, n, buckets=1024)
        shapes["sessionize"] = bench_sessionize(spark, tmp, n)
        shapes["ann_admit"] = bench_ann_admit(spark, tmp, n // 2)
        shapes["tokenize"] = bench_tokenize(spark, tmp, n // 2)
        shapes["corpus_admit"] = bench_corpus_admit(spark, tmp, n // 8)
        # same gauntlet at a production-sized trigger: the ~6s per-batch
        # fixed cost (plan construction + stage scheduling for the
        # ~25-stage dedup DAG) amortizes with batch size — 7.3k rec/s at
        # 62.5k records vs >50k rec/s here (r11 measurements), so the
        # small-n row above is the overhead-bound regime, not the
        # pipeline's capacity
        shapes["corpus_admit_amortized"] = bench_corpus_admit(
            spark, tmp + "/big", n * 4)

    m = shapes["materialize"]
    print(json.dumps({
        "metric": "streaming_records_per_sec",
        "value": m["records_per_sec"],
        "unit": "records/sec",
        "records": m["records"],
        "seconds": m["seconds"],
        "micro_batch_latency_ms": m["micro_batch_latency_ms"],
        "distinct_keys_materialized": m["distinct_keys_materialized"],
        "shapes": shapes,
        "baseline_reference_msgs_per_sec": 50_000,
        "baseline_reference_latency_ms": "2-5 (per-record; micro-batch here)",
    }))


if __name__ == "__main__":
    main()
