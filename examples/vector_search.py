"""Runnable similarity-search app — the INDEX LIFECYCLE the similarity
operators are designed around (capability superset; the reference has no
vector tooling):

  1. train a coarse quantizer once (deterministic k-means);
  2. persist it next to the corpus (save_centroids) — the index artifact;
  3. serve approximate top-k by loading the quantizer and probing cells
     (no re-training per query batch);
  4. mine hard negatives for contrastive fine-tuning from the same index;
  5. audit index quality: recall@k of the probed search vs brute force;
  6. compress: train+persist PQ codebooks and serve RESIDUAL IVF-PQ —
     the m-byte-code memory footprint that makes billion-scale ANN fit.

Run:  python examples/vector_search.py
"""

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from kstream_spark import StreamBuilder, get_spark  # noqa: E402
from kstream_spark.operators import similarity as S  # noqa: E402

SF = "/root/testdata/sf0.001"


def main():
    spark = get_spark("vector_search")
    emb = StreamBuilder(spark).table(f"{SF}/embeddings.parquet").to_df()
    queries = [0, 1, 2, 3, 4]

    with tempfile.TemporaryDirectory() as tmp:
        # 1-2. train once, persist the quantizer
        cents = S.kmeans_centroids(emb, "embedding", k=8, iters=3,
                                   id_col="vec_id")
        S.save_centroids(spark, cents, f"{tmp}/ivf_centroids")

        # 3. serve: load + probe (what a search job actually runs)
        loaded = S.load_centroids(spark, f"{tmp}/ivf_centroids")
        topk = S.ivf_topk(emb, "vec_id", "embedding", query_ids=queries,
                          k=5, n_probe=3, centroids=loaded)
        print("== approximate top-5 per query (3 of 8 cells probed) ==")
        topk.orderBy("query_id", "rank").show(10, truncate=False)

        # 4. hard negatives for contrastive training
        negs = S.hard_negatives(emb, "vec_id", "embedding", "label",
                                query_ids=queries, k=3)
        print("== hardest different-label negatives ==")
        negs.orderBy("query_id", "rank").show(6, truncate=False)

        # 5. recall audit vs brute force
        exact = S.cosine_topk(emb, "vec_id", "embedding",
                              query_ids=queries, k=5)
        a = {(r.query_id, r.neighbor_id) for r in topk.collect()}
        e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
        recall = len(a & e) / len(e)
        print(f"recall@5 vs brute force: {recall:.2f}")

        # 6. compressed index: PQ codebooks persisted, residual IVF-PQ
        books = S.pq_codebooks(emb, "embedding", m=4, k=8, iters=2,
                               id_col="vec_id")
        S.save_codebooks(spark, books, f"{tmp}/pq_codebooks")
        rtopk = S.ivfpq_residual_topk(
            emb, "vec_id", "embedding", query_ids=queries,
            centroids=loaded, m=4, pq_k=8, pq_iters=2, k=5, n_probe=3)
        print("== residual IVF-PQ top-5 (m-byte codes, 3 cells probed) ==")
        rtopk.orderBy("query_id", "rank").show(10, truncate=False)
        return recall


if __name__ == "__main__":
    main()
