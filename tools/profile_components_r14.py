"""Round-by-round instrumentation of graph_components at sf0.1: round
count, per-round seconds, surviving edge count, and the partition count
of each round's checkpointed edge relation — decides whether the cost is
rounds (pointer-jumping territory) or per-round overhead (partition
sizing, the LPA fix).  Mirrors connected_components' distributed arm
line for line; READ-ONLY instrumentation, no behavior change.

Usage: python tools/profile_components_r14.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from kstream_spark import get_spark
    from kstream_spark.builder import StreamBuilder
    from kstream_spark.inventory_behavior import _cooccur_pairs
    from kstream_spark.util import free_local_checkpoint

    spark = get_spark(app_name="components_profile")
    li = StreamBuilder(spark).table(f"{sf}/lineitem.parquet",
                                    name="lineitem").to_df()
    raw = (_cooccur_pairs(li, "l_orderkey", "l_partkey")
           .groupBy("s", "d").agg(F.count("*").alias("n"))
           .filter(F.col("n") >= 2).select("s", "d"))
    raw.write.format("noop").mode("overwrite").save()  # warm

    t_all = time.time()
    canon = (raw.select(F.greatest("s", "d").alias("v"),
                        F.least("s", "d").alias("m"))
             .distinct().persist())
    t0 = time.time()
    n_edges = canon.count()
    print(f"canon: {n_edges} edges, {time.time()-t0:.2f}s, "
          f"{canon.rdd.getNumPartitions()} parts")
    nodes = (canon.select(F.col("v").alias("node"))
             .unionByName(canon.select(F.col("m").alias("node")))
             .distinct().localCheckpoint(eager=True))
    edges = canon.filter(F.col("v") != F.col("m"))
    prev = None
    for rnd in range(20):
        t0 = time.time()
        sym = edges.unionByName(edges.select(F.col("m").alias("v"),
                                             F.col("v").alias("m")))
        wu = W.partitionBy("v")
        ls = (sym.withColumn("mn", F.least(F.min("m").over(wu), F.col("v")))
              .filter(F.col("m") > F.col("v"))
              .select(F.col("m").alias("v"), F.col("mn").alias("m")))
        wv = W.partitionBy("v")
        ss = ls.withColumn("mn", F.min("m").over(wv))
        new_edges = (ss.filter(F.col("m") != F.col("mn"))
                     .select(F.col("m").alias("v"), F.col("mn").alias("m"))
                     .unionByName(ss.select("v", F.col("mn").alias("m")))
                     .distinct()
                     .localCheckpoint(eager=True))
        if prev is None:
            canon.unpersist()
        else:
            free_local_checkpoint(prev)
        prev = edges = new_edges
        t_star = time.time() - t0
        t0 = time.time()
        violations = (
            edges.select(F.col("v").alias("node"),
                         F.lit(1).alias("c"), F.lit(0).alias("p"))
            .unionByName(
                edges.select(F.col("m").alias("node"),
                             F.lit(0).alias("c"), F.lit(1).alias("p")))
            .groupBy("node")
            .agg(F.sum("c").alias("c"), F.sum("p").alias("p"))
            .filter((F.col("c") > 1)
                    | ((F.col("c") > 0) & (F.col("p") > 0)))
            .limit(1).count())
        t_vio = time.time() - t0
        print(f"round {rnd}: star {t_star:.2f}s violations-probe "
              f"{t_vio:.2f}s edges={edges.count()} "
              f"parts={edges.rdd.getNumPartitions()} "
              f"violations={'yes' if violations else 'no'}")
        if violations == 0:
            break
    print(f"total {time.time()-t_all:.2f}s")


if __name__ == "__main__":
    main()
