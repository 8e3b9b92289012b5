"""Runnable end-to-end STREAMING INGESTION pipeline — the round-trip a
pretraining corpus actually runs at the front door, composed from the
streaming-admission family:

  raw feed ──(1) drift monitor──> PSI alarms per micro-batch
      │          (streaming/quality.drift_stream vs persisted reference)
      └──(2) dedup admission ──> corpus parquet + signature store
                 (streaming/corpus.admit_stream)
                    └──(3) tokenize-on-ingest over the ADMITTED corpus
                           (streaming/text.tokenize_stream, chained as a
                            second file stream reading stage 2's output)

Stage models are trained once up front (reference bucket counts, unigram
vocab) and persisted; every stage re-reads its model per trigger, so a
refresh needs no restart.  All three stages are replay-idempotent
(epoch-keyed dynamic overwrite).

Run:  python examples/ingest_pipeline.py
"""

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def main():
    from kstream_spark import get_spark
    from kstream_spark.operators.quality import bucket_counts
    from kstream_spark.operators.text import unigram_train
    from kstream_spark.streaming.corpus import admit_stream
    from kstream_spark.streaming.quality import drift_stream
    from kstream_spark.streaming.text import tokenize_stream

    spark = get_spark("ingest_pipeline")
    work = tempfile.mkdtemp(prefix="ingest_demo_")
    paths = {d: f"{work}/{d}" for d in
             ("in", "corpus", "sigs", "vocab", "ref", "tokens", "psi",
              "ck1", "ck2", "ck3")}

    # --- train-once models from a trusted bootstrap corpus --------------
    boot = spark.createDataFrame(
        [(i, "streaming ingestion needs admission gates and monitors "
             "watching every arriving batch of text")
         for i in range(8)],
        "doc_id long, text string")
    unigram_train(boot, "text", seed_v=40, keep_v=25, iters=1,
                  max_piece_len=3).write.parquet(paths["vocab"])
    bucket_counts(boot, F.length("text").cast("long") % 7, [],
                  "count_ref").write.parquet(paths["ref"])

    # --- two micro-batches arrive ---------------------------------------
    base = ("streaming ingestion needs admission gates and monitors "
            "watching every arriving batch of text")
    spark.createDataFrame(
        [(1, base), (2, "a novel document about tokenizer fertility")],
        "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(paths["in"])
    time.sleep(1.1)
    spark.createDataFrame(
        [(3, base),                                   # exact re-ingest
         (4, "another genuinely new document entirely")],
        "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(paths["in"])

    schema = "doc_id long, text string"
    raw = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(paths["in"]))

    # (1) drift monitor on the raw feed
    q1 = drift_stream(raw, paths["ref"], paths["psi"], paths["ck1"],
                      F.length("text").cast("long") % 7, n_buckets=7)
    # (2) dedup admission gate
    q2 = admit_stream(
        (spark.readStream.schema(schema)
         .option("maxFilesPerTrigger", 1).parquet(paths["in"])),
        paths["corpus"], paths["sigs"], paths["ck2"],
        id_col="doc_id", text_col="text")
    q1.processAllAvailable(); q1.stop()
    q2.processAllAvailable(); q2.stop()

    # (3) tokenize the ADMITTED corpus (chained file stream on stage-2
    #     output; in production this runs concurrently, polling the dir)
    q3 = tokenize_stream(
        (spark.readStream.schema(schema + ", __epoch int")
         .parquet(paths["corpus"])),
        paths["vocab"], paths["tokens"], paths["ck3"],
        id_col="doc_id", text_col="text", max_piece_len=3)
    q3.processAllAvailable(); q3.stop()

    admitted = sorted(r.doc_id for r in
                      spark.read.parquet(paths["corpus"])
                      .select("doc_id").collect())
    toks = spark.read.parquet(paths["tokens"])
    n_tokens = toks.count()
    psi = (spark.read.parquet(paths["psi"])
           .groupBy("__epoch").agg(F.sum("psi_micro").alias("psi")))
    print(f"admitted doc_ids: {admitted}  (3 = exact re-ingest, rejected)")
    print(f"tokens emitted over the admitted corpus: {n_tokens}")
    print("per-batch drift PSI (micro units):")
    psi.orderBy("__epoch").show()
    shutil.rmtree(work, ignore_errors=True)
    return admitted, n_tokens


if __name__ == "__main__":
    main()
