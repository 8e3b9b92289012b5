"""Phase-level profile for the r13 THIRD-wave targets (guide §1).

The fresh post-wave-2 baseline (149.4 s sf0.1) is graph-family-heavy:
graph_triangles 9.5 s, dedup_incremental_prod_stateless 7.9 s,
graph_components 5.3 s, graph_lpa 4.5 s, graph_pagerank 4.4 s.  This
instrument splits each into its internal phases so the fixes aim at the
real cost:

  graph_triangles   : cooccur pairs build | +distinct | degree+orient |
                      adjacency+intersect full
  graph_pagerank    : edges build | nodes+deg | full
  graph_components  : edges build (co-occur + >=2 filter) | full
  dedup_incremental_prod_stateless : corpus minhash | exact gate |
                      full (one timed iteration, state pre-split)
  mm_afp_dedup      : decode+persist | bands | pairs join | full

Usage: python tools/profile_r13c.py [sf_dir] [n_runs] [target ...]
"""

from __future__ import annotations

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
    targets = set(sys.argv[3:]) or {"triangles", "pagerank", "components",
                                    "incr", "afp"}
    from kstream_spark import get_spark
    from kstream_spark.builder import StreamBuilder
    from kstream_spark.inventory import INVENTORY
    from kstream_spark.inventory_behavior import _cooccur_pairs

    spark = get_spark(app_name="profile_r13c")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(1000, numPartitions=8).mapInPandas(
        lambda it: it, "id long").write.format("noop") \
        .mode("overwrite").save()
    b = StreamBuilder(spark)
    li = b.table(f"{sf_dir}/lineitem.parquet", name="lineitem").to_df()

    if "triangles" in targets:
        pairs = _cooccur_pairs(li, "l_orderkey", "l_suppkey")
        t(spark, "triangles: cooccur pairs (no distinct)",
          lambda: noop(pairs), n)
        t(spark, "triangles: cooccur pairs + distinct",
          lambda: noop(pairs.distinct()), n)
        edges = pairs.distinct()
        both = edges.select(F.col("s").alias("a"), F.col("d").alias("b")) \
            .filter(F.col("a") != F.col("b"))
        und = (both.select(F.least("a", "b").alias("a"),
                           F.greatest("a", "b").alias("b")).distinct())
        deg = (und.select(F.col("a").alias("node"))
               .unionByName(und.select(F.col("b").alias("node")))
               .groupBy("node").agg(F.count("*").cast("long").alias("deg")))
        da = deg.select(F.col("node").alias("a"), F.col("deg").alias("_dega"))
        db = deg.select(F.col("node").alias("b"), F.col("deg").alias("_degb"))
        t(spark, "triangles: thru orient (ranked join x2)",
          lambda: noop(und.join(da, "a").join(db, "b")), n)
        t(spark, "triangles: full query",
          lambda: noop(INVENTORY["graph_triangles"][0](spark, sf_dir)), n)

    if "pagerank" in targets:
        orders = b.table(f"{sf_dir}/orders.parquet", name="orders").to_df()
        pedges = (orders.join(li, orders.o_orderkey == li.l_orderkey)
                  .select(F.col("o_custkey").alias("src"),
                          F.col("l_suppkey").alias("dst")).distinct())
        t(spark, "pagerank: edges build", lambda: noop(pedges), n)
        t(spark, "pagerank: full query",
          lambda: noop(INVENTORY["graph_pagerank"][0](spark, sf_dir)), n)

    if "components" in targets:
        cedges = (_cooccur_pairs(li, "l_orderkey", "l_partkey")
                  .groupBy("s", "d").agg(F.count("*").alias("n"))
                  .filter(F.col("n") >= 2).select("s", "d"))
        t(spark, "components: edges build", lambda: noop(cedges), n)
        t(spark, "components: full query",
          lambda: noop(INVENTORY["graph_components"][0](spark, sf_dir)), n)

    if "incr" in targets:
        from kstream_spark.operators.dedup import (_doc_local_minhash,
                                                   content_hash,
                                                   incremental_dedup,
                                                   BANDS, NUM_HASHES)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        inc = docs.filter(F.col("doc_id") % 50 == 0)
        cor = docs.filter(F.col("doc_id") % 50 != 0)
        t(spark, "incr-stateless: corpus minhash (pandas arm)",
          lambda: noop(_doc_local_minhash(cor, "doc_id", "text", 3,
                                          NUM_HASHES, bands=BANDS)), n)
        t(spark, "incr-stateless: corpus minhash (codegen arm)",
          lambda: noop(_doc_local_minhash(cor, "doc_id", "text", 3,
                                          NUM_HASHES, bands=BANDS,
                                          impl="codegen")), n)
        t(spark, "incr-stateless: exact gate (__ch distinct)",
          lambda: noop(cor.select(
              content_hash(F.col("text")).alias("__ch")).distinct()), n)
        t(spark, "incr-stateless: full",
          lambda: noop(incremental_dedup(inc, cor, "doc_id", "text", n=3,
                                         threshold=0.8).select("doc_id")),
          n)

    if "afp" in targets:
        t(spark, "mm_afp: full query",
          lambda: noop(INVENTORY["mm_afp_dedup"][0](spark, sf_dir)), n)


if __name__ == "__main__":
    main()
