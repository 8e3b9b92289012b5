"""Graph operators: integer-exact PageRank power iteration.

The iterative-algorithm showcase of the bounded-driver-loop discipline
(bpe_train / kmeans_centroids / unigram_train): each round is ONE
map-side-combinable aggregation over the edge relation; the driver sees
nothing per round (the rank relation stays distributed), and every
quantity is integer micro-units so the result is bit-identical in any
engine and any aggregation order — a DuckDB oracle replays the rounds as
unrolled CTEs.

No reference analog (tryfix/kstream routes records; it has no graph
surface); part of the analytics capability superset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src_col: str, dst_col: str,
             iters: int = 3, damping_pct: int = 85) -> DataFrame:
    """PageRank by power iteration over a directed edge list, in EXACT
    integer micro-units:

      rank0        = 1_000_000 per node
      contribution = rank div out_degree        (integer division)
      rank'        = (100 - d)% * 1e6 / 100
                     + (d * sum(contributions)) div 100

    Integer division loses a bounded sub-micro remainder per edge —
    deterministically, identically in every engine — which is the point:
    float contributions would make the per-node sum depend on shuffle
    order.  Dangling nodes (no out-edges) appear as rank receivers only;
    their mass share simply stops circulating (the standard simplified
    treatment; add explicit teleport edges for the full formulation).

    Scale shape: the node and degree relations derive once; each round
    is one join of the rank relation onto the edge list (AQE broadcasts
    ranks when small, shuffles on the node key otherwise) + one
    map-side-combinable sum keyed on the destination — the classic BSP
    round as two bounded exchanges, no driver traffic at all.  Returns
    (node, rank_micro) after ``iters`` rounds.
    """
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("outd"))
    base = F.lit((100 - damping_pct) * 10_000).cast("long")
    rank = nodes.withColumn("rank_micro",
                            F.lit(1_000_000).cast("long"))
    for _ in range(iters):
        contrib = (e.join(rank.withColumnRenamed("node", "src"), "src")
                   .join(deg, "src")
                   .select("dst",
                           F.expr("rank_micro div outd").alias("c")))
        recv = contrib.groupBy(F.col("dst").alias("node")) \
            .agg(F.sum("c").cast("long").alias("_in"))
        rank = (nodes.join(recv, "node", "left")
                .select("node",
                        (base + F.expr(
                            f"({damping_pct}L * coalesce(_in, 0L)) div 100"))
                        .cast("long").alias("rank_micro")))
    return rank


def connected_components(edges: DataFrame, src_col: str, dst_col: str,
                         max_iter: int = 20,
                         collect_threshold: int = 1_000_000) -> DataFrame:
    """Connected components over an undirected edge list ->
    (node, component), component = min node id in the component.  Nodes
    are the edge endpoints (supply isolated nodes by left-joining the
    result back onto the full node relation).

    Hybrid execution, sized by the EDGE list (which in the dedup/ANN
    pipelines is a thresholded similarity output, tiny relative to the
    corpus): below ``collect_threshold`` edges, one bounded ``take``
    feeds an exact driver-side union-find (milliseconds, no BSP
    round-trips); above it, iterative min-label propagation — each
    round every node takes the min label among itself and its
    neighbors, a driver-side loop of distributed joins (the standard
    BSP-on-DataFrames formulation: rounds needed = graph diameter, a
    convergence count stops early).  Per round the traffic is two
    exchanges keyed on node ids; the label relation never visits the
    driver.

    Generalized out of the dedup module's cluster step
    (dedup.connected_components now delegates here) so the graph family
    shares one implementation with the near-dup clustering pipeline.
    """
    pairs = edges.select(F.col(src_col).alias("s"),
                         F.col(dst_col).alias("d"))
    # one action: pulls at most threshold+1 edges; spilling past the
    # limit routes to the distributed path without materializing the set
    rows = pairs.take(collect_threshold + 1)
    if len(rows) <= collect_threshold:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for r in rows:
            ra, rb = find(r["s"]), find(r["d"])
            if ra != rb:
                # union by min so the root IS the min id of the component
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = {x for r in rows for x in (r["s"], r["d"])}
        out = [(n, find(n)) for n in sorted(nodes)]
        return edges.sparkSession.createDataFrame(
            out, "node long, component long")
    # sym is re-joined every BSP round — persist it once instead of
    # recomputing the edge union per iteration
    sym = pairs.union(pairs.select(F.col("d").alias("s"),
                                   F.col("s").alias("d"))).persist()
    nodes = sym.select(F.col("s").alias("node")).distinct()
    # localCheckpoint (eager) per round is load-bearing, not a tuning
    # knob: persist() caches DATA but the logical plan still nests — each
    # round references the previous frame three times (neighbor join,
    # left join, changed-count), so the plan tree doubles per round and
    # ~20 rounds OOM the driver JVM during analysis alone.  Checkpoint
    # truncates the lineage so every round plans against a leaf.
    labels = nodes.withColumn("label", F.col("node")) \
        .localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_min = (sym.join(labels, sym.d == labels.node)
                        .groupBy("s").agg(F.min("label").alias("nlabel"))
                        .withColumnRenamed("s", "node"))
        lab1 = (labels.join(neighbor_min, "node", "left")
                .select("node", F.least(F.col("label"),
                                        F.coalesce("nlabel", "label"))
                        .alias("label")))
        # pointer jumping (Shiloach-Vishkin shortcut): label <- the
        # label OF the label.  Labels only ever hold node ids from the
        # same component, so the jump target always exists (inner join)
        # and stays in-component; halving the pointer chains each round
        # turns O(diameter) rounds into O(log diameter) — the difference
        # between 6 and 60 shuffles on a path-shaped 100 TB graph.
        jump = lab1.select(F.col("node").alias("label"),
                           F.col("label").alias("jlabel"))
        new_labels = (lab1.join(jump, "label")
                      .select("node", F.least("label", "jlabel")
                              .alias("label"))
                      .localCheckpoint(eager=True))
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.label") != F.col("o.label")).count())
        # free the PREVIOUS round's checkpoint blocks now that the
        # changed-count (its last consumer) ran — localCheckpoint stores
        # O(|nodes|) rows per round and GC-driven cleanup is
        # nondeterministic, so without this up to max_iter label copies
        # accumulate in executor storage on a high-diameter graph
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))


def triangle_count(edges: DataFrame, src_col: str, dst_col: str
                   ) -> DataFrame:
    """Exact per-node triangle counts over an UNDIRECTED graph (the
    edge list may contain either or both directions and self-loops;
    both are canonicalized away), via DEGREE ORIENTATION — the standard
    skew-robust formulation (Cohen's MapReduce triangle counting /
    Latapy's compact-forward): orient every edge from its lower-rank
    endpoint to the higher, rank = (degree, node id).  Each triangle is
    then enumerated exactly once from its lowest-rank vertex, and the
    wedge join's per-key fan-out is bounded by the oriented out-degree
    <= O(sqrt(2m)) regardless of how skewed the raw degrees are — a
    hub with a million neighbors contributes ZERO wedges from itself
    (all its edges point in), instead of 10^12.

    Returns (node, n_triangles) for every node of the graph (zero rows
    included).  Scale shape: degree aggregation, two equi-joins on the
    oriented edge relation (wedge build + closure check), one final
    explode-free count per corner — every exchange keyed on node ids.
    """
    both = edges.select(F.col(src_col).alias("a"),
                        F.col(dst_col).alias("b")) \
        .filter(F.col("a") != F.col("b"))
    und = (both.select(F.least("a", "b").alias("a"),
                       F.greatest("a", "b").alias("b"))
           .distinct())
    deg = (und.select(F.col("a").alias("node"))
           .unionByName(und.select(F.col("b").alias("node")))
           .groupBy("node").agg(F.count("*").cast("long").alias("deg")))
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("_dega"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("_degb"))
    ranked = und.join(da, "a").join(db, "b")
    lower_first = (F.col("_dega") < F.col("_degb")) | \
        ((F.col("_dega") == F.col("_degb")) & (F.col("a") < F.col("b")))
    oriented = ranked.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"))
    # wedges from the lowest-rank corner u: (u -> v), (u -> w), v != w;
    # close with the oriented edge between v and w (either direction —
    # orientation of the closing edge depends on v/w ranks)
    e1 = oriented.select(F.col("u"), F.col("v"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("w"))
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    closing = oriented.select(
        F.least("u", "v").alias("v"), F.greatest("u", "v").alias("w"))
    tris = wedges.join(closing, ["v", "w"])
    per_corner = (tris.select(F.explode(F.array("u", "v", "w"))
                              .alias("node"))
                  .groupBy("node")
                  .agg(F.count("*").cast("long").alias("n_triangles")))
    return (deg.select("node").join(per_corner, "node", "left")
            .select("node", F.coalesce("n_triangles", F.lit(0))
                    .cast("long").alias("n_triangles")))
