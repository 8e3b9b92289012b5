"""Phase-level profile for the r13 second-wave targets (guide §1).

Breaks the remaining expensive headline queries into their internal
phases so the round's fixes aim at the real cost: at sf0.1 the
embeddings fixture is 2 000 rows x 64 dims — the sim-family cost is
fixed per-ACTION overhead (plan analysis, Arrow round-trips, Python
worker dispatch), not data.  Phases timed min-of-N in one warmed JVM:

  sim_ivfpq_residual_topk : kmeans train | pq-on-residual train | full
  sim_ivfpq_topk          : kmeans train | pq train | full
  sim_ann_retrain         : brute-force topk | boot train | full train | full
  sim_ivfsq_topk          : seeds+sq8_stats | full
  graph_components        : edges build | full
  text_bpe_tokenize       : bpe_train | full

Usage: python tools/profile_r13b.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(spark, label, fn, n=3):
    spark.sparkContext.setJobDescription(f"profile:{label}")
    best = None
    for _ in range(n):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
    print(f"{label:55s} {best:7.3f}s", flush=True)
    return round(best, 3)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from kstream_spark import get_spark
    from kstream_spark import operators  # noqa: F401
    import kstream_spark.operators.similarity as S
    from kstream_spark.inventory import INVENTORY
    from kstream_spark.builder import StreamBuilder

    spark = get_spark(app_name="profile_r13b")
    # warm-up: file listing + python workers + codegen
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(1000, numPartitions=8).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode("overwrite").save()
    for q in ("sim_ivfpq_residual_topk", "sim_ivfpq_topk", "sim_ann_retrain",
              "sim_ivfsq_topk", "graph_components", "text_bpe_tokenize",
              "dedup_exact"):
        noop(INVENTORY[q][0](spark, sf_dir))
        spark.catalog.clearCache()

    out = {}
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    out["control_dedup_exact"] = t(
        spark, "control dedup_exact",
        lambda: noop(INVENTORY["dedup_exact"][0](spark, sf_dir)), n)

    # --- sim_ivfpq_topk phases
    out["kmeans_k8_i3"] = t(
        spark, "kmeans_centroids k=8 iters=3",
        lambda: S.kmeans_centroids(emb, "embedding", k=8, iters=3,
                                   id_col="vec_id"), n)
    out["pq_m4_k16_i2"] = t(
        spark, "pq_codebooks m=4 k=16 iters=2",
        lambda: S.pq_codebooks(emb, "embedding", m=4, k=16, iters=2,
                               id_col="vec_id"), n)
    out["ivfpq_topk_full"] = t(
        spark, "sim_ivfpq_topk full",
        lambda: noop(INVENTORY["sim_ivfpq_topk"][0](spark, sf_dir)), n)

    # --- sim_ivfpq_residual_topk phases
    cents = S.kmeans_centroids(emb, "embedding", k=8, iters=3,
                               id_col="vec_id")

    def residual_train_only():
        # replicate the res_df chain from ivfpq_residual_topk, then train
        import numpy as np
        from kstream_spark.functions.vectors import (as_double,
                                                     cell_cosine_scores,
                                                     norm)
        corpus = emb.select(F.col("vec_id").alias("neighbor_id"),
                            as_double(F.col("embedding")).alias("v")) \
            .withColumn("n", norm(F.col("v")))
        cell_scores = cell_cosine_scores(F.col("v"), F.col("n"), cents)
        assigned = corpus.withColumn(
            "cell_id",
            (F.array_position(cell_scores, F.array_max(cell_scores)) - 1)
            .cast("long")).select(
                "neighbor_id", "cell_id",
                F.transform(F.col("v"),
                            lambda x: x / F.col("n")).alias("v"))
        cmat = np.asarray(cents, dtype=np.float64)

        def residual(batches):
            import numpy as np
            import pandas as pd
            for pdf in batches:
                mat = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
                cells = pdf["cell_id"].to_numpy().astype(np.int64)
                res = mat - cmat[cells]
                yield pd.DataFrame(
                    {"neighbor_id": pdf["neighbor_id"].to_numpy(dtype=object),
                     "cell_id": pdf["cell_id"].to_numpy(dtype=object),
                     "rv": list(res.tolist())})

        res_df = assigned.mapInPandas(
            residual,
            schema="neighbor_id bigint, cell_id long, rv array<double>")
        S.pq_codebooks(res_df, "rv", m=8, k=32, iters=2,
                       id_col="neighbor_id")

    out["respq_train_m8_k32_i2"] = t(
        spark, "pq_codebooks on residual chain m=8 k=32", residual_train_only, n)
    out["ivfpq_residual_full"] = t(
        spark, "sim_ivfpq_residual_topk full",
        lambda: noop(INVENTORY["sim_ivfpq_residual_topk"][0](spark, sf_dir)),
        n)

    # --- sim_ann_retrain phases
    out["cosine_topk_q5"] = t(
        spark, "cosine_topk 5 queries",
        lambda: noop(S.cosine_topk(emb, "vec_id", "embedding",
                                   query_ids=[0, 1, 2, 3, 4], k=10)), n)
    out["ann_retrain_full"] = t(
        spark, "sim_ann_retrain full",
        lambda: noop(INVENTORY["sim_ann_retrain"][0](spark, sf_dir)), n)

    # --- sim_ivfsq_topk phases
    out["sq8_stats"] = t(spark, "sq8_stats",
                         lambda: S.sq8_stats(emb, "embedding"), n)
    out["ivfsq_topk_full"] = t(
        spark, "sim_ivfsq_topk full",
        lambda: noop(INVENTORY["sim_ivfsq_topk"][0](spark, sf_dir)), n)

    # --- graph_components phases
    def edges_only():
        from kstream_spark.inventory_behavior import _cooccur_pairs
        li = StreamBuilder(spark).table(f"{sf_dir}/lineitem.parquet",
                                        name="lineitem").to_df()
        edges = (_cooccur_pairs(li, "l_orderkey", "l_partkey")
                 .groupBy("s", "d").agg(F.count("*").alias("n"))
                 .filter(F.col("n") >= 2).select("s", "d"))
        noop(edges)

    out["components_edges_only"] = t(spark, "graph_components edges build",
                                     edges_only, n)
    out["graph_components_full"] = t(
        spark, "graph_components full",
        lambda: noop(INVENTORY["graph_components"][0](spark, sf_dir)), n)

    # --- text_bpe_tokenize phases
    out["bpe_train"] = t(
        spark, "text_bpe_train full",
        lambda: noop(INVENTORY["text_bpe_train"][0](spark, sf_dir)), n)
    out["bpe_tokenize_full"] = t(
        spark, "text_bpe_tokenize full",
        lambda: noop(INVENTORY["text_bpe_tokenize"][0](spark, sf_dir)), n)

    out["control_dedup_exact_end"] = t(
        spark, "control dedup_exact (end)",
        lambda: noop(INVENTORY["dedup_exact"][0](spark, sf_dir)), n)

    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
