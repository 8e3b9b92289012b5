"""Scale-up fixture generator: derive an sfN fixture from an existing
driver fixture by replicating each table M times with key-space offsets.

Purpose: SCALING.md measurements beyond the largest driver-provided SF
(sf0.1).  The driver's testdata is read-only and its generator private, so
scaling measurements need a derived fixture whose DISTRIBUTIONS match the
original — this replication preserves them exactly (per-copy cardinality
ratios, value ranges, string lengths, duplicate/near-dup structure), while
key offsets keep referential integrity (orders->customer, lineitem->orders/
part/supplier) intact across copies.

Two perturbations keep workload characteristics honest at scale:
  - documents.text gets a per-copy token suffix on every word (copy 0 is
    untouched), so the shingle spaces of different copies are DISJOINT —
    without this every doc would gain M-1 exact/near duplicates and the
    dedup verify stage would measure an artificial 10x duplicate rate;
  - embeddings.embedding gets a per-copy deterministic sign-flip pattern,
    so copies aren't exact vector duplicates but norm/magnitude
    distributions are preserved.

Output goes under the repo (gitignored .data/), never /root/testdata.

Usage: python tools/gen_sf.py [src_dir] [dst_dir] [multiplier]
       defaults: /root/testdata/sf0.1 /root/repo/.data/sf1 10
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.data/sf1"
    m = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from pyspark.sql import functions as F

    from kstream_spark import get_spark
    from kstream_spark.sources.parquet import read_parquet

    spark = get_spark(app_name="gen_sf")
    t = {n: read_parquet(spark, f"{src}/{n}.parquet") for n in TABLES}
    # key-space strides: one past the max key so copies never collide
    stride = {
        "cust": t["customer"].agg(F.max("c_custkey")).first()[0] + 1,
        "supp": t["supplier"].agg(F.max("s_suppkey")).first()[0] + 1,
        "part": t["part"].agg(F.max("p_partkey")).first()[0] + 1,
        "ord": t["orders"].agg(F.max("o_orderkey")).first()[0] + 1,
        "ev": t["events"].agg(F.max("event_id")).first()[0] + 1,
        "user": t["events"].agg(F.max("user_id")).first()[0] + 1,
        "doc": t["documents"].agg(F.max("doc_id")).first()[0] + 1,
        "vec": t["embeddings"].agg(F.max("vec_id")).first()[0] + 1,
    }

    def copies(df):
        """Cross the table with the copy index — one scan, no shuffle."""
        return df.crossJoin(
            spark.range(m).select(F.col("id").alias("__c")))

    def off(col, key):
        return (F.col(col) + F.col("__c") * stride[key]).alias(col)

    out = {}
    out["region"] = t["region"]
    out["nation"] = t["nation"]
    out["customer"] = copies(t["customer"]).select(
        off("c_custkey", "cust"), "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    out["supplier"] = copies(t["supplier"]).select(
        off("s_suppkey", "supp"), "s_name", "s_nationkey", "s_acctbal")
    out["part"] = copies(t["part"]).select(
        off("p_partkey", "part"), "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
    out["orders"] = copies(t["orders"]).select(
        off("o_orderkey", "ord"), off("o_custkey", "cust"), "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
    out["lineitem"] = copies(t["lineitem"]).select(
        off("l_orderkey", "ord"), off("l_partkey", "part"),
        off("l_suppkey", "supp"), "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate")
    out["events"] = copies(t["events"]).select(
        off("event_id", "ev"), "ts", off("user_id", "user"), "event_type",
        "value", "props")
    # per-copy token suffix -> disjoint shingle spaces across copies
    perturbed = F.when(
        F.col("__c") == 0, F.col("text")).otherwise(
        F.regexp_replace("text", r"(\S+)",
                         F.concat(F.lit("$1~"), F.col("__c"))))
    out["documents"] = copies(t["documents"]).select(
        off("doc_id", "doc"), perturbed.alias("text"), "lang", "source",
        F.length(perturbed).alias("n_chars"))
    # per-copy deterministic sign flips -> distinct but same-magnitude vecs
    flipped = F.transform(
        "embedding",
        lambda x, i: (x * F.when(
            F.pmod(F.hash(F.col("__c"), i), F.lit(2)) == 0,
            F.lit(1.0)).otherwise(F.lit(-1.0))).cast("float"))
    out["embeddings"] = copies(t["embeddings"]).select(
        off("vec_id", "vec"), flipped.alias("embedding"), "label")

    for name, df in out.items():
        files = max(1, min(32, m))
        df.repartition(files).write.mode("overwrite") \
            .parquet(f"{dst}/{name}.parquet")
        print(f"wrote {name}")
    for name in TABLES:
        print(name, spark.read.parquet(f"{dst}/{name}.parquet").count())


if __name__ == "__main__":
    main()
