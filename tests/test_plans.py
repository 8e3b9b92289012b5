"""Plan-shape guards: the scale properties (pushdown, pruning, broadcast,
shuffle counts) asserted so a regression fails in CI."""

import pyspark.sql.functions as F

from kstream_spark import StreamBuilder
from kstream_spark.plans import inspect as P

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_and_pruning(spark):
    b = StreamBuilder(spark)
    df = (b.stream(f"{SF}/events.parquet")
          .filter(F.col("event_type") == "purchase")
          .select("event_id", "event_type").to_df())
    P.assert_filter_pushed(df, "EqualTo(event_type,purchase)")
    P.assert_column_pruned(df, "props")


def test_lookup_join_broadcasts_no_shuffle_of_fact(spark):
    b = StreamBuilder(spark)
    # snapshot dim: zero shuffles anywhere
    cust = b.global_table(f"{SF}/customer.parquet", key="c_custkey", sync=False,
                          snapshot=True)
    df = b.stream(f"{SF}/events.parquet") \
        .join_global_table(cust, on="user_id", how="left").to_df()
    P.assert_broadcast(df, 1)
    P.assert_no_sort_merge_join(df)
    assert P.shuffle_count(df) == 0

    # changelog dim: compaction costs exactly ONE shuffle of the (small)
    # dimension side; the fact side still never shuffles
    cust2 = b.global_table(f"{SF}/customer.parquet", key="c_custkey", sync=False)
    df2 = b.stream(f"{SF}/events.parquet") \
        .join_global_table(cust2, on="user_id", how="left").to_df()
    P.assert_broadcast(df2, 1)
    assert P.shuffle_count(df2) == 1


def test_star_join_all_broadcast(spark):
    from kstream_spark.inventory import q_star_join
    df = q_star_join(spark, SF)
    P.assert_broadcast(df, 3)
    P.assert_no_sort_merge_join(df)
    assert P.shuffle_count(df) == 0


def test_compaction_single_shuffle(spark):
    # latest-by-key must be ONE hash aggregation (partial + final), not a
    # window-sort: exactly one shuffle exchange
    from kstream_spark.inventory import q_versioned_upsert
    df = q_versioned_upsert(spark, SF)
    P.assert_max_shuffles(df, 1)


def test_pricing_summary_single_shuffle(spark):
    from kstream_spark.inventory import q_pricing_summary
    df = q_pricing_summary(spark, SF)
    P.assert_max_shuffles(df, 1)
    P.assert_filter_pushed(df, "l_shipdate")


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Bucketed tables join co-located: zero shuffle exchanges on either side
    (the 100 TB repeated-join strategy; batch analog of the reference's
    co-partitioned topics)."""
    from kstream_spark import StreamBuilder
    b = StreamBuilder(spark)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdb LOCATION '{tmp_path}/bdb'")
    left = b.from_df(spark.range(0, 1000).withColumnRenamed("id", "k")
                     .withColumn("v", F.col("k") * 2))
    right = b.from_df(spark.range(0, 1000).withColumnRenamed("id", "k")
                      .withColumn("w", F.col("k") + 1))
    left.to_bucketed_table("bdb.bt_left", buckets=8, key="k")
    right.to_bucketed_table("bdb.bt_right", buckets=8, key="k")

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bdb.bt_left").join(spark.table("bdb.bt_right"), "k")
        assert P.shuffle_count(joined) == 0
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bdb.bt_left")
        spark.sql("DROP TABLE IF EXISTS bdb.bt_right")
        spark.sql("DROP DATABASE IF EXISTS bdb")


def test_interval_overlap_join_plans_as_equi_join(spark):
    """The bucket decomposition must buy an EQUI-join plan: no
    BroadcastNestedLoopJoin / CartesianProduct anywhere (what Spark
    plans for a raw inequality join), and the overlap predicate appears
    only as a post-join Filter."""
    from kstream_spark.operators.joins import interval_overlap_join
    a = spark.createDataFrame([(1, 1, 0, 5)], "k long, aid long, s long, e long")
    b = spark.createDataFrame([(1, 2, 3, 9)], "k long, bid long, bs long, be long")
    out = interval_overlap_join(a, b, "k", "aid", "s", "e",
                                "bid", "bs", "be", bucket=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert out.count() == 1


def test_skew_join_splits_hot_keys(spark):
    from kstream_spark.util import skew_join
    from kstream_spark.plans import inspect as P
    left = spark.createDataFrame(
        [(0, i) for i in range(5000)] + [(k, 0) for k in range(1, 50)],
        "k long, v long")
    right = spark.createDataFrame([(k, f"r{k}") for k in range(50)],
                                  "k long, r string")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = skew_join(left, right, "k", hot_keys=[0])
        # hot key 0 joins via explicit broadcast even with auto-broadcast off
        P.assert_broadcast(out, 1)
        assert out.count() == 5000 + 49
        # parity with the plain join
        plain = left.join(right, "k").count()
        assert out.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_skew_join_samples_hot_keys(spark):
    from kstream_spark.util import skew_join
    left = spark.createDataFrame([(0, i) for i in range(2000)]
                                 + [(1, 0), (2, 0)], "k long, v long")
    right = spark.createDataFrame([(k, f"r{k}") for k in range(3)],
                                  "k long, r string")
    out = skew_join(left, right, "k", hot_threshold=100, sample_fraction=0.5)
    assert out.count() == 2002


def test_plan_dot_exports_graphviz(spark):
    from kstream_spark import StreamBuilder
    from kstream_spark.plans.inspect import plan_dot
    df = StreamBuilder(spark).stream(f"{SF}/events.parquet") \
        .filter(F.col("event_type") == "purchase").to_df()
    dot = plan_dot(df)
    assert dot.startswith("digraph plan {") and dot.endswith("}")
    assert "Filter" in dot and "->" in dot


def test_incremental_dedup_no_cartesian_bounded_shuffles(spark):
    """The growing-corpus dedup path must stay bucket-joined: no cartesian
    product anywhere, candidate generation via band equi-joins only."""
    from kstream_spark.inventory_pipeline import q_dedup_incremental
    df = q_dedup_incremental(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_embedding_lsh_no_cartesian(spark):
    """The ANN dedup scale path: candidates meet only inside LSH buckets —
    the plan must contain no all-pairs join."""
    from kstream_spark.inventory_pipeline import q_dedup_embedding_lsh
    df = q_dedup_embedding_lsh(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_kmeans_centroids_deterministic_across_runs(spark):
    """Seeding is id-ordered and every Lloyd step is round-6: two runs over
    differently-partitioned input must produce identical centroids."""
    from kstream_spark.operators.similarity import kmeans_centroids
    from kstream_spark import StreamBuilder
    emb = StreamBuilder(spark).table(f"{SF}/embeddings.parquet").to_df()
    c1 = kmeans_centroids(emb, "embedding", k=4, iters=2, id_col="vec_id")
    c2 = kmeans_centroids(emb.repartition(7), "embedding", k=4, iters=2,
                          id_col="vec_id")
    assert c1 == c2


def test_tune_shuffle_partitions_scales_with_input(spark):
    from kstream_spark.util import input_size_bytes, tune_shuffle_partitions
    from kstream_spark import StreamBuilder
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        cores = spark.sparkContext.defaultParallelism
        # tiny input: floored at core count (every core gets work)
        assert tune_shuffle_partitions(spark, 10 << 20) == cores
        # 1 TB at 128 MB targets: 8192 reduce partitions
        assert tune_shuffle_partitions(spark, 1 << 40) == 8192
        # stats-based size: positive for a real scan
        df = StreamBuilder(spark).table(f"{SF}/events.parquet").to_df()
        assert input_size_bytes(df) > 0
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_plan_stats_unavailable_degrades_gracefully(spark):
    """The private-API stats helper must return None (not raise) when the
    _jdf handle is missing — the Spark-Connect / version-drift case — and
    ensure_parallelism must still function on such a frame."""
    from kstream_spark.util import _plan_size_bytes, ensure_parallelism

    class NoJdf:
        """DataFrame stand-in without a _jdf attribute."""
        def __getattr__(self, name):
            raise AttributeError(name)

    assert _plan_size_bytes(NoJdf()) is None

    # unknown-stats SENTINEL (spark.sql.defaultSizeInBytes ~= Long.Max):
    # Catalyst reports it for relations it cannot size; it must read as
    # "unknown" (None), never as a real 8 EiB estimate (r4 verdict bug —
    # embedding_dedup_survivors warned '~8796093022207 MiB' on a 3-row
    # in-memory relation)
    class _Chain:
        def __init__(self, size):
            self._size = size
        def queryExecution(self):
            return self
        def optimizedPlan(self):
            return self
        def stats(self):
            return self
        def sizeInBytes(self):
            return self._size

    class FakeDF:
        def __init__(self, size):
            self.sparkSession = spark
            self._jdf = _Chain(size)

    assert _plan_size_bytes(FakeDF((1 << 63) - 1)) is None     # the sentinel
    assert _plan_size_bytes(FakeDF(12345)) == 12345            # real estimate

    # real frame, stats path monkey-stripped: ensure_parallelism falls
    # through to the partition-count check instead of crashing
    df = spark.range(100).repartition(2)
    import kstream_spark.util as u
    orig = u._plan_size_bytes
    u._plan_size_bytes = lambda _df: None
    try:
        out = ensure_parallelism(df, min_partitions=4)
        assert out.rdd.getNumPartitions() >= 4
    finally:
        u._plan_size_bytes = orig


def test_winnow_single_shuffle_no_cartesian(spark):
    """The fingerprint self-join is equi-keyed (broadcast or SMJ, never a
    cartesian).  Since the r7 capped-by-default flip the boilerplate cap
    adds ONE fingerprint-keyed count aggregation (bounded by the distinct
    fingerprint space, map-side combinable) on top of the pair reduce —
    so the budget is 3 shuffles, none of them corpus-keyed."""
    from kstream_spark.operators.dedup import winnow_pairs
    docs = StreamBuilder(spark).table(f"{SF}/documents.parquet").to_df()
    df = winnow_pairs(docs, "doc_id", "text", k=4, window=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    P.assert_max_shuffles(df, 3)


def test_semantic_dedup_single_shuffle(spark):
    """Literal-centroid assignment is a pure projection: the only shuffle
    is the per-cell grouping for the Arrow matmul; the anti-join side
    broadcasts."""
    from kstream_spark.operators import similarity as S
    emb = StreamBuilder(spark).table(f"{SF}/embeddings.parquet").to_df()
    cents = S.kmeans_centroids(emb, "embedding", k=4, iters=1,
                               id_col="vec_id")
    df = S.semantic_dedup(emb, "vec_id", "embedding", threshold=0.4,
                          centroids=cents)
    P.assert_max_shuffles(df, 1)
    P.assert_no_sort_merge_join(df)


def test_span_dedup_hot_set_broadcasts(spark):
    """The hot-segment set is tiny by definition (it is the boilerplate)
    and must probe as a broadcast anti-join, never a shuffled one."""
    from kstream_spark.operators.corpus import span_dedup
    docs = StreamBuilder(spark).table(f"{SF}/documents.parquet").to_df()
    df = span_dedup(docs, "doc_id", "text", span=8, max_docs=1)
    P.assert_broadcast(df, 1)


def test_distributed_rank_matches_window_and_avoids_global_sort(spark):
    """with_ntile_percent_rank == the unpartitioned-window version on a
    total order, and its executed plan contains NO global sort (every
    Sort is partition-local), ranks via ONE range shuffle (the counts
    pass reads a ReusedExchange), and confines SinglePartition exchanges
    to the driver-sized per-partition-count aggregates."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W
    from kstream_spark.operators.ranking import with_ntile_percent_rank

    df = spark.range(10_000).select(
        F.col("id"),
        # duplicated score values: the id tie-break makes the order total
        (F.col("id") % 997).cast("double").alias("score"))
    order = [F.desc("score"), F.asc("id")]
    two_phase = with_ntile_percent_rank(df, order, n_buckets=7,
                                        ntile_col="b", pct_col="p")
    w = W.orderBy(*order)
    window = df.select(
        "id", "score",
        F.ntile(7).over(w).cast("long").alias("b"),
        F.round(F.percent_rank().over(w), 6).alias("p"))
    got = {(r.id, r.b, r.p) for r in two_phase.collect()}
    want = {(r.id, r.b, r.p) for r in window.collect()}
    assert got == want

    plan = two_phase._jdf.queryExecution().executedPlan().toString()
    # Sort nodes print "Sort [keys], <global>, 0" — a single-task sort of
    # the data would be "true".  (The range shuffle + partition-local sort
    # themselves run inside the pinned localCheckpoint materialization —
    # sortWithinPartitions is global=false by construction.)
    assert ", true, 0" not in plan, plan
    # r7 regression guard: the ranked rows, the per-partition counts, and
    # the total must all read the ONE pinned materialization — rank
    # consistency previously leaned on ReuseExchange, and with AQE over a
    # complex upstream the branches re-executed with RESAMPLED range
    # boundaries (offsets from one partitioning, local ids from another:
    # an 11th ntile bucket out of 10 at sf1).  localCheckpoint makes the
    # shared scan structural:
    assert "Scan ExistingRDD" in plan, plan
    # num_partitions=1 (caller asserts a BOUNDED relation) short-circuits
    # to the plain window form — identical output, none of the two-phase
    # checkpoint/offset jobs
    single = with_ntile_percent_rank(df, order, n_buckets=7,
                                     ntile_col="b", pct_col="p",
                                     num_partitions=1)
    assert {(r.id, r.b, r.p) for r in single.collect()} == want
    splan = single._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" not in splan, splan  # no checkpoint pass


def test_ivfpq_corpus_never_shuffles_before_rank(spark):
    """IVF-PQ at scale: cell assignment is a literal projection, codes an
    Arrow projection, probes/tables broadcast — the only exchange of
    corpus-derived rows is the per-query top-k window over candidates."""
    from kstream_spark.operators import similarity as S
    emb = StreamBuilder(spark).table(f"{SF}/embeddings.parquet").to_df()
    cents = S.kmeans_centroids(emb, "embedding", k=4, iters=1,
                               id_col="vec_id")
    books = S.pq_codebooks(emb, "embedding", m=4, k=8, iters=1,
                           id_col="vec_id")
    df = S.ivfpq_topk(emb, "vec_id", "embedding", [0, 1], cents, books,
                      k=5, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    P.assert_no_sort_merge_join(df)
    P.assert_broadcast(df, 2)          # probes + tables
    assert P.shuffle_count(df) <= 1    # only the rank window


def test_ivfpq_residual_corpus_never_shuffles_before_rank(spark):
    """Residual IVF-PQ keeps the ivfpq_topk scale discipline: assignment
    is a literal projection, residual+encode are narrow Arrow passes, the
    per-(query, cell) ADC tables broadcast, and corpus rows cross at most
    the one rank-window exchange (fed by the narrow local top-k)."""
    from kstream_spark.operators import similarity as S
    emb = StreamBuilder(spark).table(f"{SF}/embeddings.parquet").to_df()
    cents = S.kmeans_centroids(emb, "embedding", k=4, iters=1,
                               id_col="vec_id")
    df = S.ivfpq_residual_topk(emb, "vec_id", "embedding", [0, 1], cents,
                               m=4, pq_k=8, pq_iters=1, k=5, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    P.assert_no_sort_merge_join(df)
    P.assert_broadcast(df, 1)          # the (query, cell) ADC tables
    assert P.shuffle_count(df) <= 1    # only the rank window
    assert "MapInPandas" in plan       # residual/encode/local-topk passes


def test_pq_adc_local_topk_before_rank_window(spark):
    """pq_adc_topk must never feed a corpus-sized relation into the
    per-query rank window: a NARROW MapInPandas top-k pass (<= k rows
    per (partition, query)) sits between the scoring join and the
    window's exchange, so no reducer sorts a corpus-sized slice.  The
    plan prints parents before children, so Window -> MapInPandas ->
    BroadcastHashJoin ordering proves the pruning is inside the window's
    input, not after it."""
    from kstream_spark.operators import similarity as S
    emb = StreamBuilder(spark).table(f"{SF}/embeddings.parquet").to_df()
    books = S.pq_codebooks(emb, "embedding", m=4, k=8, iters=1,
                           id_col="vec_id")
    df = S.pq_adc_topk(emb, "vec_id", "embedding", [0, 1], books, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    i_win = plan.index("Window")
    i_map = plan.index("MapInPandas")
    i_join = plan.index("BroadcastNestedLoopJoin") \
        if "BroadcastNestedLoopJoin" in plan else plan.index("BroadcastHashJoin")
    assert i_win < i_map < i_join, (i_win, i_map, i_join)


def test_partition_pruning_on_hive_layout(spark, tmp_path):
    """A filter on the partition column must prune at PLANNING time:
    PartitionFilters carries the predicate, and the scan touches only the
    matching partition's files (directory-level skipping — the
    first-order 100 TB technique, ahead of row-group stats)."""
    from kstream_spark.operators.layout import write_partitioned
    ev = StreamBuilder(spark).stream(f"{SF}/events.parquet").to_df()
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, ["event_type"])

    all_types = spark.read.parquet(path)
    one = all_types.filter(F.col("event_type") == "purchase")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "purchase" in plan.split(
        "PartitionFilters")[1][:200]
    # planning-time pruning: only the purchase partition's files are read.
    # (inputFiles() resolves from the ANALYZED plan — pre-pushdown — and
    # always lists every partition; input_file_name() reflects the files
    # the executed, pruned scan actually opened.)
    touched = {r[0] for r in
               one.select(F.input_file_name()).distinct().collect()}
    total = {r[0] for r in
             all_types.select(F.input_file_name()).distinct().collect()}
    assert touched and all("event_type=purchase" in f for f in touched)
    assert len(touched) < len(total)
    # correctness unchanged by the layout
    want = ev.filter(F.col("event_type") == "purchase").count()
    assert one.count() == want


def test_corpus_rule_stacks_zero_shuffle(spark):
    """gopher_filter / c4_line_clean / doc_entropy are scan-stage
    projections: zero exchanges, and only (doc_id, text) read."""
    from kstream_spark.operators import text as TX
    b = StreamBuilder(spark)
    docs = b.table(f"{SF}/documents.parquet").to_df()
    for out in (TX.gopher_filter(docs, "doc_id", "text"),
                TX.c4_line_clean(docs, "doc_id", "text"),
                TX.doc_entropy(docs, "doc_id", "text")):
        assert P.shuffle_count(out) == 0
        P.assert_column_pruned(out, "lang")


def test_asof_nearest_single_exchange(spark):
    """direction=nearest runs both fills over ONE sort: exactly the
    exchanges of the backward form (union shuffle), no extra."""
    from kstream_spark.operators.joins import asof_join
    b = StreamBuilder(spark)
    ev = b.stream(f"{SF}/events.parquet").to_df() \
        .select("event_id", "user_id", "ts")
    orders = b.stream(f"{SF}/orders.parquet").to_df()
    back = asof_join(ev, orders, "user_id", "ts", "o_orderdate",
                     ["o_orderkey"], right_key="o_custkey")
    near = asof_join(ev, orders, "user_id", "ts", "o_orderdate",
                     ["o_orderkey"], right_key="o_custkey",
                     direction="nearest")
    assert P.shuffle_count(near) == P.shuffle_count(back)


def test_bloom_semi_probe_sits_in_scan_stage(spark):
    """The bloom probe must appear as a Filter on the fact scan BELOW
    the exact semi join — the scan-stage shedding that is the whole
    point of the operator."""
    from kstream_spark.operators.joins import bloom_semi_join
    b = StreamBuilder(spark)
    orders = b.table(f"{SF}/orders.parquet").to_df() \
        .select(F.col("o_custkey").alias("ckey"), "o_totalprice")
    dim = b.table(f"{SF}/customer.parquet").to_df() \
        .filter(F.col("c_acctbal") > 9000) \
        .select(F.col("c_custkey").alias("ckey"))
    out = bloom_semi_join(orders, dim, "ckey", m_bits=1 << 12, k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    j = plan.find("Join")
    assert 0 <= j < plan.find("element_at")
