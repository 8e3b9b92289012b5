"""Runnable data-selection app — the SELECTION LIFECYCLE on top of dedup
(capability superset; the reference has no selection surface):

  1. train a DSIR importance model toward a target domain ONCE
     (dsir_weights — an n_buckets-row table) and persist it;
  2. score + select the corpus against the persisted model (dsir_apply /
     select_dsir) — the train-once / score-many production shape, also
     what streaming/selection.admit_stream runs per micro-batch;
  3. pick a geometric-coverage coreset from the embedding table
     (greedy k-center) — diversity selection, complementary to
     importance selection;
  4. serve a diversified top-k (MMR) over the quantized index tier
     (SQ8), trading relevance against redundancy at retrieval time.

Run:  python examples/data_selection.py
"""

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kstream_spark import StreamBuilder, get_spark  # noqa: E402
from kstream_spark.operators import selection as SEL  # noqa: E402
from kstream_spark.operators import similarity as S  # noqa: E402

SF = "/root/testdata/sf0.001"


def main():
    spark = get_spark("data_selection")
    b = StreamBuilder(spark)
    docs = b.table(f"{SF}/documents.parquet").to_df()
    emb = b.table(f"{SF}/embeddings.parquet").to_df()

    with tempfile.TemporaryDirectory() as tmp:
        # 1. train the importance model once; persist it (the "model"
        #    artifact a streaming admission job would read every batch)
        w = SEL.dsir_weights(docs, "text", F.col("source") == "src18",
                             n_buckets=256)
        w.write.parquet(f"{tmp}/dsir_weights")

        # 2. score + select against the PERSISTED model
        weights = spark.read.parquet(f"{tmp}/dsir_weights")
        scored = SEL.dsir_apply(docs, "doc_id", "text", weights)
        print("== top-5 most target-like documents (exact integer "
              "micro-log scores) ==")
        scored.orderBy(F.desc("dsir_micro"), "doc_id").show(5)

        # 3. diversity coreset: 6 farthest-point centers
        core = SEL.kcenter_select(emb, "vec_id", "embedding", k=6)
        print("== k-center coreset (coverage radius non-increasing) ==")
        core.orderBy("rank").show(6)

        # 4. diversified retrieval over the SQ8 tier
        mmr = SEL.mmr_rerank(emb, "vec_id", "embedding",
                             query_ids=[0, 1], n_candidates=8, k=3)
        print("== MMR-diversified top-3 per query (integer deci-micro "
              "scores) ==")
        mmr.orderBy("query_id", "mmr_rank").show(6)

        sq = S.sq8_topk(emb, "vec_id", "embedding", query_ids=[0], k=3)
        print("== SQ8 (4x-compressed) asymmetric top-3 ==")
        sq.orderBy("rank").show(3)

        radii = [r.dist for r in core.orderBy("rank").collect()][1:]
        print("coverage radii:", radii)
        return radii


if __name__ == "__main__":
    main()
