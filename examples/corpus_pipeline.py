"""Runnable end-to-end training-corpus build — the data-pipeline superset
this engine adds beyond the reference's stream DSL (COVERAGE.md "north
star"): scrub -> quality gate -> exact + near-dup dedup -> balanced
sampling -> deterministic split -> chunk.

Every stage is a reusable operator with its own oracle-checked inventory
query; this example wires them into the one pipeline a corpus build
actually runs, and prints per-stage row counts (the funnel).

Run:  python examples/corpus_pipeline.py
"""

import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from kstream_spark import StreamBuilder, get_spark  # noqa: E402
from kstream_spark.operators import dedup as D  # noqa: E402
from kstream_spark.operators import text as TX  # noqa: E402
from kstream_spark.operators.sampling import (  # noqa: E402
    stratified_cap, train_val_split)

SF = "/root/testdata/sf0.001"


def main():
    spark = get_spark("corpus_pipeline")
    docs = StreamBuilder(spark).table(f"{SF}/documents.parquet").to_df()
    funnel = [("raw", docs.count())]

    # 1. PII scrub (projection only — no shuffle)
    clean = TX.pii_redact(docs, "doc_id", "text") \
        .join(docs.drop("text"), "doc_id") \
        .withColumnRenamed("redacted_text", "text")

    # 2. quality gate
    stats = TX.text_stats(clean, "doc_id", "text") \
        .select("doc_id", "quality_score")
    gated = clean.join(stats, "doc_id").filter(F.col("quality_score") >= 0.4)
    funnel.append(("quality_gate", gated.count()))

    # 3. exact dedup, then near-dup clustering to fixpoint
    exact_ids = D.exact_dedup(gated, "doc_id", "text").select("doc_id")
    exact = gated.join(exact_ids, "doc_id", "left_semi")
    funnel.append(("exact_dedup", exact.count()))

    pairs = D.minhash_lsh_pairs(exact, "doc_id", "text", threshold=0.7)
    deduped = D.dedup_survivors_cc(pairs, exact, "doc_id")
    funnel.append(("near_dedup", deduped.count()))

    # 4. balanced per-source sampling + deterministic split
    balanced = stratified_cap(deduped, "doc_id", "source", cap=20)
    final = train_val_split(balanced, "doc_id", val_pct=10, test_pct=10)
    funnel.append(("balanced", balanced.count()))

    print("\n== corpus funnel ==")
    for stage, n in funnel:
        print(f"{stage:>14}: {n}")
    print("\n== split x lang ==")
    final.groupBy("split", "lang").count() \
        .orderBy("split", "lang").show(20, truncate=False)
    # no spark.stop(): get_spark() is getOrCreate — callers (tests, REPLs)
    # may share the session


if __name__ == "__main__":
    main()
