"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, O(|Q|·|N|), fine when the query
set is small and broadcastable (the common "find neighbors for this batch"
shape).  Scale path: random-hyperplane LSH bucketing — candidates meet only
inside a bucket, turning the |N|² all-pairs search into sum-of-bucket²; an
IVF-style coarse quantizer is the same pattern with learned centroids.

All arithmetic is JVM-side (functions/vectors.py) — no Python UDFs.
Similarities are rounded in-query and ranked on the ROUNDED value with id
tie-breaks, so results are deterministic across engines (oracle parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from kstream_spark.functions.vectors import as_double, cosine


def cosine_topk(emb: DataFrame, id_col: str, vec_col: str,
                query_ids: list | None = None, queries: DataFrame | None = None,
                k: int = 10) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Returns (query_id, neighbor_id, cos, rank).  The query side is broadcast:
    the corpus side streams through one scan, no shuffle of the corpus.
    """
    from kstream_spark.util import ensure_parallelism
    emb = ensure_parallelism(emb)
    if queries is None:
        queries = emb.filter(F.col(id_col).isin(query_ids))
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   as_double(F.col(vec_col)).alias("qv")))
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   as_double(F.col(vec_col)).alias("nv"))
    scored = (
        q.join(c, F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))


def cosine_pairs(emb: DataFrame, id_col: str, vec_col: str,
                 threshold: float = 0.9) -> DataFrame:
    """All pairs with cosine >= threshold (brute force; use lsh_cosine_pairs
    at corpus scale).  Returns (id_a, id_b, cos)."""
    from kstream_spark.util import ensure_parallelism
    emb = ensure_parallelism(emb)
    a = emb.select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def lsh_cosine_pairs(emb: DataFrame, id_col: str, vec_col: str,
                     threshold: float = 0.9, planes: int = 16,
                     tables: int = 4, seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH near-dup pairs, exactly verified.

    Signature bit b = sign(v · r_b) for deterministic pseudo-random planes
    r_b derived from ``seed`` (hash-based, data-independent — every executor
    derives the same planes with no driver broadcast of state).  Docs meet
    iff they share a full signature in at least one of ``tables`` tables.
    Survivors are verified with exact cosine, so precision is exact and only
    recall depends on the LSH parameters.
    """
    import math

    dim_probe = emb.select(F.size(vec_col).alias("d")).first()
    dim = dim_probe["d"]

    def plane(t: int, p: int) -> list[float]:
        # deterministic pseudo-random unit-ish plane from (seed, table, plane)
        vals = []
        x = seed * 1_000_003 + t * 10_007 + p * 101
        for i in range(dim):
            x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            vals.append(((x >> 11) / float(1 << 53)) * 2.0 - 1.0)
        n = math.sqrt(sum(v * v for v in vals)) or 1.0
        return [v / n for v in vals]

    v = as_double(F.col(vec_col))
    sig_cols = []
    for t in range(tables):
        bits = []
        for p in range(planes):
            r = plane(t, p)
            d = F.aggregate(
                F.zip_with(v, F.array(*[F.lit(x) for x in r]), lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x)
            bits.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
        sig_cols.append(F.concat(*bits).alias(f"sig{t}"))

    signed = emb.select(F.col(id_col), *sig_cols)
    cand = None
    for t in range(tables):
        c = (signed.select(F.col(id_col).alias("id_a"), F.col(f"sig{t}").alias("s"))
             .join(signed.select(F.col(id_col).alias("id_b"), F.col(f"sig{t}").alias("s")), "s")
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b"))
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.distinct()

    a = emb.select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb"))
    return (
        cand.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b",
                F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def ivf_topk(emb: DataFrame, id_col: str, vec_col: str,
             query_ids: list, k: int = 10, n_cells: int = 16,
             n_probe: int = 4) -> DataFrame:
    """IVF-style approximate top-k: coarse quantizer + cell-probed search.

    The corpus is partitioned into ``n_cells`` Voronoi cells around
    deterministic centroids (the lowest-id vectors serve as centroids — at
    production scale substitute k-means centroids; the operator shape is
    identical).  A query probes only its ``n_probe`` nearest cells, so the
    scan cost drops by ~n_cells/n_probe versus brute force — the standard
    recall/cost dial.  Results are exact cosines over the probed subset,
    ranked like cosine_topk.
    """
    from kstream_spark.util import ensure_parallelism
    emb = ensure_parallelism(emb)
    cents = F.broadcast(
        emb.orderBy(id_col).limit(n_cells)
        .select(F.col(id_col).alias("cell_id"), as_double(F.col(vec_col)).alias("cv")))

    # assign every corpus vector to its nearest centroid (one broadcast pass)
    corpus = emb.select(F.col(id_col).alias("neighbor_id"),
                        as_double(F.col(vec_col)).alias("nv"))
    w_assign = W.partitionBy("neighbor_id").orderBy(
        F.desc("cell_cos"), F.asc("cell_id"))
    assigned = (corpus.join(cents)
                .withColumn("cell_cos", F.round(cosine(F.col("nv"), F.col("cv")), 6))
                .withColumn("rn", F.row_number().over(w_assign))
                .filter(F.col("rn") == 1)
                .select("neighbor_id", "nv", "cell_id"))

    # queries probe their n_probe nearest cells
    queries = emb.filter(F.col(id_col).isin(query_ids)) \
        .select(F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv"))
    w_probe = W.partitionBy("query_id").orderBy(F.desc("cell_cos"), F.asc("cell_id"))
    probes = (F.broadcast(queries).join(cents)
              .withColumn("cell_cos", F.round(cosine(F.col("qv"), F.col("cv")), 6))
              .withColumn("rn", F.row_number().over(w_probe))
              .filter(F.col("rn") <= n_probe)
              .select("query_id", "qv", "cell_id"))

    scored = (probes.join(assigned, "cell_id")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .select("query_id", "neighbor_id",
                      F.round(cosine(F.col("qv"), F.col("nv")), 6).alias("cos")))
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k))
