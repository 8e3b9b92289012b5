"""Runnable streaming corpus-admission demo — the GROWING-corpus ingestion
loop: each micro-batch of incoming documents is admitted only if it
duplicates nothing in the standing corpus (exact content hash, then
increment-bands x corpus-bands MinHash) and nothing earlier in its own
batch.  The corpus's dedup state (signatures + content hashes) is written
at admit time, so no batch ever re-minhashes history — per-batch work is
O(|increment| + signature-store scan), the shape that survives 100 TB.

Run:  python examples/corpus_admission.py
"""

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    from kstream_spark import get_spark
    from kstream_spark.streaming.corpus import admit_stream

    spark = get_spark("corpus_admission")
    work = tempfile.mkdtemp(prefix="admit_demo_")
    src, corpus, sigs, ck = (f"{work}/{d}" for d in
                             ("in", "corpus", "sigs", "ck"))

    base = ("streaming ingestion of training data needs an admission gate "
            "that rejects documents already present in the corpus no matter "
            "how they arrive or which identifier they carry this time")
    # batch 1: two novel docs
    spark.createDataFrame(
        [(1, base), (2, "an entirely different document about watermarks")],
        "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(src)
    time.sleep(1.1)
    # batch 2: an exact re-ingest (new id), a near-dup, and one novel doc
    spark.createDataFrame(
        [(3, base), (4, base.replace("gate", "barrier")),
         (5, "a genuinely new topic never seen before")],
        "doc_id long, text string").coalesce(1) \
        .write.mode("append").parquet(src)

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = admit_stream(stream, corpus, sigs, ck,
                     id_col="doc_id", text_col="text")
    q.processAllAvailable()
    q.stop()

    admitted = sorted(r.doc_id for r in
                      spark.read.parquet(corpus).select("doc_id").collect())
    print(f"ingested: 5 docs in 2 batches")
    print(f"admitted: {admitted}  (3 = exact re-ingest, 4 = near-dup -> rejected)")
    shutil.rmtree(work, ignore_errors=True)
    return admitted


if __name__ == "__main__":
    main()
