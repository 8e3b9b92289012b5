"""Runnable corpus-filter funnel — the pre-dedup quality gauntlet.

The published web-corpus recipe applies cheap rule stacks BEFORE any
expensive dedup or LM scoring, in rejection-rate order:

  gopher rules     doc-level signals (length, word shape, stop words,
                   symbol/bullet/ellipsis ratios) -> keep + why-rejected
  c4 line clean    line-level surgery (short / markerful lines dropped,
                   survivors restitched)
  entropy screen   degenerate-text detector: unique-but-repetitive docs
                   (keyword stuffing, template loops) score near 0 bits

Each stage prints its rejection ledger; the funnel output is the corpus
a dedup + selection pipeline would actually ingest.

Run:  python examples/corpus_filters.py
"""

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kstream_spark import StreamBuilder, get_spark  # noqa: E402
from kstream_spark.operators import text as TX  # noqa: E402

SF = "/root/testdata/sf0.001"


def main():
    spark = get_spark("corpus_filters")
    docs = StreamBuilder(spark).table(f"{SF}/documents.parquet").to_df() \
        .select("doc_id", "text")
    n0 = docs.count()

    # stage 1: Gopher rule stack (fixture-calibrated length bounds)
    # min_stopwords=1: the synthetic fixture vocabulary carries only
    # "the" from the Gopher stop set, so >=2 would reject every doc
    g = TX.gopher_filter(docs, "doc_id", "text", min_words=20,
                         max_words=80, min_stopwords=1).persist()
    reasons = (g.filter(~F.col("keep"))
               .select(F.explode(F.split("fail_reasons", ",")).alias("rule"))
               .groupBy("rule").count().orderBy(F.desc("count")))
    print("== gopher rejection ledger ==")
    for r in reasons.collect():
        print(f"  {r['rule']:>15}: {r['count']}")
    kept1 = docs.join(g.filter("keep").select("doc_id"), "doc_id")
    n1 = kept1.count()

    # stage 2: C4 line cleaning (single-line fixture: length-rule only)
    c = TX.c4_line_clean(kept1, "doc_id", "text", min_line_words=15,
                         require_terminal_punct=False)
    kept2 = (c.filter(F.col("n_kept_lines") > 0)
             .select("doc_id", F.col("clean_text").alias("text")))
    n2 = kept2.count()

    # stage 3: entropy screen — drop the degenerate tail
    e = TX.doc_entropy(kept2, "doc_id", "text")
    kept3 = kept2.join(e.filter(F.col("norm_entropy") >= 0.5)
                       .select("doc_id"), "doc_id")
    n3 = kept3.count()

    print("== funnel ==")
    print(f"  input           : {n0}")
    print(f"  after gopher    : {n1}")
    print(f"  after c4 lines  : {n2}")
    print(f"  after entropy   : {n3}")
    g.unpersist()
    return {"input": n0, "gopher": n1, "c4": n2, "entropy": n3}


if __name__ == "__main__":
    main()
