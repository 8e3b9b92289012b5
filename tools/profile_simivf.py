"""A/B profile for the r6 sim_ivf* bench regression (r6 verdict ask #2).

Isolates the two r6 similarity.py changes on the search path at the bench
SF (sf0.1, local[32], min-of-N):

  arm A  current ivf_topk            (literal-projection assignment
                                      + _per_query_topk local prune)
  arm B  current assignment,         (quantifies _per_query_topk's
         plain rank-window ranker     mapInPandas fixed cost)
  arm C  r5 join+window assignment,  (quantifies the literal-projection
         _per_query_topk ranker       expression's fixed cost)
  ctrl   dedup_exact + sim_cosine_topk (environmental drift controls)

All arms run the sim_ivf_prod_state shape (persisted centroids, no
training) so the delta is pure search path.  Usage:
    python tools/profile_simivf.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def arm_b_plain_window(emb, centroids, query_ids, k=10, n_probe=3):
    """Current assignment; r5-style plain rank window (no local prune)."""
    from kstream_spark.functions.vectors import dot, norm
    from kstream_spark.operators.similarity import as_double
    from kstream_spark.util import ensure_parallelism
    emb = ensure_parallelism(emb)
    cent_list = [[float(x) for x in c] for c in centroids]
    spark = emb.sparkSession
    cents = F.broadcast(
        spark.createDataFrame(
            [(i, c) for i, c in enumerate(cent_list)],
            schema="cell_id long, cv array<double>")
        .withColumn("cn", norm(F.col("cv"))))
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"),
                        as_double(F.col("embedding")).alias("nv")) \
        .withColumn("nn", norm(F.col("nv")))
    cell_scores = F.array(*[
        F.round(dot(F.col("nv"), F.array(*[F.lit(float(x)) for x in c]))
                / (F.col("nn")
                   * F.lit(math.sqrt(sum(float(x) * float(x) for x in c)))),
                6)
        for c in cent_list])
    assigned = corpus.withColumn(
        "cell_id",
        (F.array_position(cell_scores, F.array_max(cell_scores)) - 1)
        .cast("long")).select("neighbor_id", "nv", "nn", "cell_id")
    queries = emb.filter(F.col("vec_id").isin(query_ids)) \
        .select(F.col("vec_id").alias("query_id"),
                as_double(F.col("embedding")).alias("qv")) \
        .withColumn("qn", norm(F.col("qv")))
    w_probe = W.partitionBy("query_id").orderBy(
        F.desc("cell_cos"), F.asc("cell_id"))
    probes = (F.broadcast(queries).join(cents)
              .withColumn("cell_cos",
                          F.round(dot(F.col("qv"), F.col("cv"))
                                  / (F.col("qn") * F.col("cn")), 6))
              .withColumn("rn", F.row_number().over(w_probe))
              .filter(F.col("rn") <= n_probe)
              .select("query_id", "qv", "qn", "cell_id"))
    scored = (probes.join(assigned, "cell_id")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(dot(F.col("qv"), F.col("nv"))
                              / (F.col("qn") * F.col("nn")), 6)
                      .alias("cos")))
    w = W.partitionBy("query_id").orderBy(F.desc("cos"),
                                          F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))


def arm_c_join_assignment(emb, centroids, query_ids, k=10, n_probe=3):
    """r5 join+window assignment; current _per_query_topk ranker."""
    from kstream_spark.functions.vectors import dot, norm
    from kstream_spark.operators.similarity import (_per_query_topk,
                                                    as_double)
    from kstream_spark.util import ensure_parallelism
    emb = ensure_parallelism(emb)
    spark = emb.sparkSession
    cents = F.broadcast(
        spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            schema="cell_id long, cv array<double>")
        .withColumn("cn", norm(F.col("cv"))))
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"),
                        as_double(F.col("embedding")).alias("nv")) \
        .withColumn("nn", norm(F.col("nv")))
    w_assign = W.partitionBy("neighbor_id").orderBy(
        F.desc("cell_cos"), F.asc("cell_id"))
    assigned = (corpus.join(cents)
                .withColumn("cell_cos",
                            F.round(dot(F.col("nv"), F.col("cv"))
                                    / (F.col("nn") * F.col("cn")), 6))
                .withColumn("rn", F.row_number().over(w_assign))
                .filter(F.col("rn") == 1)
                .select("neighbor_id", "nv", "nn", "cell_id"))
    queries = emb.filter(F.col("vec_id").isin(query_ids)) \
        .select(F.col("vec_id").alias("query_id"),
                as_double(F.col("embedding")).alias("qv")) \
        .withColumn("qn", norm(F.col("qv")))
    w_probe = W.partitionBy("query_id").orderBy(
        F.desc("cell_cos"), F.asc("cell_id"))
    probes = (F.broadcast(queries).join(cents)
              .withColumn("cell_cos",
                          F.round(dot(F.col("qv"), F.col("cv"))
                                  / (F.col("qn") * F.col("cn")), 6))
              .withColumn("rn", F.row_number().over(w_probe))
              .filter(F.col("rn") <= n_probe)
              .select("query_id", "qv", "qn", "cell_id"))
    scored = (probes.join(assigned, "cell_id")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(dot(F.col("qv"), F.col("nv"))
                              / (F.col("qn") * F.col("nn")), 6)
                      .alias("cos")))
    return _per_query_topk(scored, k, score_col="cos", asc=False)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from kstream_spark import StreamBuilder, get_spark
    from kstream_spark.operators import similarity as S
    spark = get_spark()
    emb = StreamBuilder(spark).table(f"{sf_dir}/embeddings.parquet").to_df()
    qids = [0, 1, 2, 3, 4]
    cents = S.kmeans_centroids(emb, "embedding", k=8, iters=3,
                               id_col="vec_id")

    def timed(name, fn):
        times = []
        for _ in range(n_runs):
            t0 = time.time()
            fn().collect()
            times.append(time.time() - t0)
        out[name] = round(min(times), 3)
        print(name, [round(t, 2) for t in times], flush=True)

    out: dict = {"sf_dir": sf_dir, "n_runs": n_runs}
    # warm the session with one throwaway pass
    S.ivf_topk(emb, "vec_id", "embedding", query_ids=qids, k=10,
               n_probe=3, centroids=cents).collect()
    timed("arm_a_current", lambda: S.ivf_topk(
        emb, "vec_id", "embedding", query_ids=qids, k=10, n_probe=3,
        centroids=cents))
    timed("arm_b_plain_window", lambda: arm_b_plain_window(
        emb, cents, qids))
    timed("arm_c_join_assignment", lambda: arm_c_join_assignment(
        emb, cents, qids))
    from kstream_spark.inventory import INVENTORY
    for ctrl in ("dedup_exact", "sim_cosine_topk"):
        fn, _sql = INVENTORY[ctrl]
        timed(f"ctrl_{ctrl}", lambda fn=fn: fn(spark, sf_dir))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
