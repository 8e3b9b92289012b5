"""Graph operators: integer-exact PageRank."""

from pyspark.sql import functions as F

from kstream_spark.operators.graph import pagerank


def _reference_pagerank(edges, iters=3, damping_pct=85):
    """Sequential reference with the SAME integer arithmetic."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outd = {}
    for s, _ in edges:
        outd[s] = outd.get(s, 0) + 1
    rank = {n: 1_000_000 for n in nodes}
    base = (100 - damping_pct) * 10_000
    for _ in range(iters):
        recv = {n: 0 for n in nodes}
        for s, d in edges:
            recv[d] += rank[s] // outd[s]
        rank = {n: base + (damping_pct * recv[n]) // 100 for n in nodes}
    return rank


def test_pagerank_matches_integer_reference(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (2, 4)]
    df = spark.createDataFrame(edges, "s long, d long")
    got = {r.node: r.rank_micro for r in
           pagerank(df, "s", "d", iters=4).collect()}
    assert got == _reference_pagerank(edges, iters=4)
    # the hub (3: three in-edges) outranks the leaf (4: one in-edge)
    assert got[3] > got[4]


def test_pagerank_deterministic_under_partitioning(spark):
    edges = [(i, (i * 7) % 23) for i in range(200)] + \
            [(i % 23, (i * 3) % 23) for i in range(200)]
    a = spark.createDataFrame(edges, "s long, d long")
    r1 = {r.node: r.rank_micro for r in pagerank(a, "s", "d").collect()}
    r2 = {r.node: r.rank_micro for r in
          pagerank(a.repartition(13), "s", "d").collect()}
    assert r1 == r2  # integer micro-units: order-insensitive sums


def test_pagerank_dangling_receiver(spark):
    # node 9 has in-edges but no out-edges: it accumulates, never emits
    df = spark.createDataFrame([(1, 9), (2, 9), (9, 9)][:2],
                               "s long, d long")
    got = {r.node: r.rank_micro for r in
           pagerank(df, "s", "d", iters=2).collect()}
    assert set(got) == {1, 2, 9}
    assert got[9] > got[1] == got[2]


def test_pagerank_oracle_parity(spark):
    """Spark pagerank == the unrolled DuckDB power-iteration oracle on a
    customer->supplier purchase graph from the fixture — the r9
    registration's parity proof, run locally now (r8 window is full)."""
    import duckdb
    from kstream_spark.inventory_behavior import _pagerank_sql
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'/root/testdata/sf0.001/{t}.parquet'")
    oracle = con.execute(f"""
WITH e AS (SELECT DISTINCT o.o_custkey AS src, l.l_suppkey AS dst
           FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
{_pagerank_sql(3)}
SELECT node, rank_micro FROM r3
""").fetchdf().set_index("node")["rank_micro"].to_dict()
    from kstream_spark import StreamBuilder
    b = StreamBuilder(spark)
    orders = b.table("/root/testdata/sf0.001/orders.parquet").to_df()
    li = b.table("/root/testdata/sf0.001/lineitem.parquet").to_df()
    edges = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.col("o_custkey").alias("src"),
                     F.col("l_suppkey").alias("dst")).distinct())
    got = {r.node: r.rank_micro for r in
           pagerank(edges, "src", "dst", iters=3).collect()}
    assert got == oracle
