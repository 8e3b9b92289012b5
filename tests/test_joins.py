"""Join semantics mirroring kstream/processors/join/global_table_joiner_test.go:68-130
(inner hit, inner-miss => DLQ error path, left-miss => nil right)."""

import pyspark.sql.functions as F
import pytest

from kstream_spark import StreamBuilder
from kstream_spark.operators.joins import DLQ


@pytest.fixture(scope="module")
def env(spark):
    b = StreamBuilder(spark)
    stream = b.from_df(
        spark.createDataFrame([(100, 1), (200, 2), (300, 9)], "pk long, fk long"),
        name="left",
    )
    table = b.global_table(
        spark.createDataFrame([(1, "one"), (2, "two")], "tk long, name string"),
        key="tk", name="dim", sync=False,
    )
    return b, stream, table


def test_inner_hit_and_miss_to_dlq(env):
    _, stream, table = env
    dlq = DLQ()
    out = stream.join_global_table(table, on="fk", how="inner", dlq=dlq).to_df()
    assert {(r.pk, r.name) for r in out.collect()} == {(100, "one"), (200, "two")}
    # ref: global_table_joiner.go:109-113 — miss is an ERROR, not a drop
    missed = dlq.df().collect()
    assert [(r.pk, r.fk) for r in missed] == [(300, 9)]
    assert "dim" in missed[0].dlq_reason


def test_inner_without_dlq_drops(env):
    _, stream, table = env
    out = stream.join_global_table(table, on="fk", how="inner").to_df()
    assert out.count() == 2


def test_left_miss_gives_null(env):
    _, stream, table = env
    out = stream.join_global_table(table, on="fk", how="left").to_df()
    rows = {r.pk: r.name for r in out.collect()}
    assert rows == {100: "one", 200: "two", 300: None}


def test_lookup_join_is_broadcast(env):
    _, stream, table = env
    plan = stream.join_global_table(table, on="fk", how="left").to_df() \
        ._sc._jvm.PythonSQLUtils if False else None
    df = stream.join_global_table(table, on="fk", how="left").to_df()
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in physical


def test_stream_stream_join_time_bound(spark):
    b = StreamBuilder(spark)
    l = b.from_df(spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 01:00:00")],
        "k long, ts string").withColumn("ts", F.col("ts").cast("timestamp")))
    r = b.from_df(spark.createDataFrame(
        [(1, "2024-01-01 00:10:00"), (1, "2024-01-01 03:00:00"),
         (2, "2024-01-01 00:59:00")],
        "k long, ts string").withColumn("ts", F.col("ts").cast("timestamp")))
    # within 30 minutes after l.ts
    out = l.join_stream(r, on="k", within=("0 seconds", "30 minutes"),
                        select=[F.col("l.k").alias("k"),
                                F.col("r.ts").alias("rts")]).to_df()
    assert [r.k for r in out.collect()] == [1]

    # unbounded (reference parity: join/window.go has no eviction)
    out2 = l.join_stream(r, on="k").to_df()
    assert out2.count() == 3


def test_asof_join_basic_and_tolerance(spark):
    from kstream_spark.operators.joins import asof_join
    left = spark.createDataFrame(
        [(1, "2024-01-10"), (1, "2024-01-20"), (2, "2024-01-05"), (3, "2024-01-10")],
        "k long, lt string").withColumn("lt", F.col("lt").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-08", 100), (1, "2024-01-15", 101),
         (1, "2024-01-15", 102),              # dup ts -> greatest row wins
         (2, "2024-01-06", 200)],             # after left's ts -> no match
        "k long, rt string, val int").withColumn("rt", F.col("rt").cast("timestamp"))

    out = asof_join(left, right, key="k", left_ts="lt", right_ts="rt",
                    right_cols=["val"])
    rows = {(r.k, str(r.lt)[:10]): r.val for r in out.collect()}
    assert rows[(1, "2024-01-10")] == 100     # latest <= Jan10 is Jan8
    assert rows[(1, "2024-01-20")] == 102     # dup-ts deterministic winner
    assert rows[(2, "2024-01-05")] is None    # right row is later -> miss
    assert rows[(3, "2024-01-10")] is None    # key absent on right

    inner = asof_join(left, right, key="k", left_ts="lt", right_ts="rt",
                      right_cols=["val"], how="inner")
    assert inner.count() == 2

    tol = asof_join(left, right, key="k", left_ts="lt", right_ts="rt",
                    right_cols=["val"], tolerance="3 days")
    trows = {(r.k, str(r.lt)[:10]): r.val for r in tol.collect()}
    assert trows[(1, "2024-01-10")] == 100    # 2 days old: within tolerance
    assert trows[(1, "2024-01-20")] is None   # 5 days old: too stale


def test_asof_join_equal_ts_matches(spark):
    from kstream_spark.operators.joins import asof_join
    left = spark.createDataFrame([(1, "2024-01-08")], "k long, lt string") \
        .withColumn("lt", F.col("lt").cast("timestamp"))
    right = spark.createDataFrame([(1, "2024-01-08", 7)], "k long, rt string, val int") \
        .withColumn("rt", F.col("rt").cast("timestamp"))
    out = asof_join(left, right, key="k", left_ts="lt", right_ts="rt",
                    right_cols=["val"]).collect()
    assert out[0].val == 7                    # at-or-before includes equality


def test_asof_join_rejects_column_collision(spark):
    from kstream_spark.operators.joins import asof_join
    left = spark.createDataFrame([(1, "2024-01-01", 9)],
                                 "k long, lt string, val int") \
        .withColumn("lt", F.col("lt").cast("timestamp"))
    right = spark.createDataFrame([(1, "2024-01-01", 5)],
                                  "k long, rt string, val int") \
        .withColumn("rt", F.col("rt").cast("timestamp"))
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, key="k", left_ts="lt", right_ts="rt",
                  right_cols=["val"])


def test_range_join_bucketized_equals_plain(spark):
    from kstream_spark.operators.joins import range_join
    points = spark.createDataFrame(
        [(i, float(i)) for i in range(0, 100, 7)], "id long, v double")
    bands = spark.createDataFrame(
        [(0.0, 25.0, "low"), (25.0, 75.0, "mid"), (75.0, 200.0, "high")],
        "lo double, hi double, band string")
    plain = {(r.id, r.band) for r in
             range_join(points, bands, "v", "lo", "hi").collect()}
    bucketized = {(r.id, r.band) for r in
                  range_join(points, bands, "v", "lo", "hi",
                             bucket_width=10.0).collect()}
    assert plain == bucketized
    assert (0, "low") in plain and (77, "high") in plain
    # boundary: v == lo matches, v == hi does not (half-open)
    edge = spark.createDataFrame([(1, 25.0)], "id long, v double")
    got = range_join(edge, bands, "v", "lo", "hi").collect()
    assert [r.band for r in got] == ["mid"]


def test_range_join_clamp_bounds_fanout_exactly(spark):
    """The clamp caps the bucket domain for open-ended catch-all bands
    WITHOUT changing the answer: points far past the clamp still match
    via the shared boundary bucket, points before it via the floor, and
    the half-open edges survive."""
    from kstream_spark.operators.joins import range_join
    points = spark.createDataFrame(
        [(1, 5.0), (2, 30.0), (3, 75.0), (4, 99.0),     # inside clamp
         (5, 5000.0), (6, 1e8),                         # far past clamp
         (7, -3.0),                                     # before clamp
         (8, 100.0)],                                   # == catch-all lo
        "id long, v double")
    bands = spark.createDataFrame(
        [(-10.0, 25.0, "low"), (25.0, 100.0, "mid"),
         (100.0, 1e9, "catch_all")],                    # open-ended top
        "lo double, hi double, band string")
    plain = {(r.id, r.band) for r in
             range_join(points, bands, "v", "lo", "hi").collect()}
    clamped = {(r.id, r.band) for r in
               range_join(points, bands, "v", "lo", "hi",
                          bucket_width=10.0, clamp=(0.0, 100.0)).collect()}
    assert plain == clamped
    assert (6, "catch_all") in clamped and (7, "low") in clamped
    assert (8, "catch_all") in clamped


def test_interval_overlap_join_equals_inequality_join(spark):
    """Bucket decomposition must produce EXACTLY the pairs of the plain
    inequality join, including intervals spanning many buckets and
    touching endpoints; bucket size must not change the answer."""
    import pyspark.sql.functions as F

    from kstream_spark.operators.joins import interval_overlap_join
    a = spark.createDataFrame(
        [(1, 10, 0, 3), (1, 11, 5, 30), (1, 12, 40, 41),
         (2, 20, 0, 100), (2, 21, 7, 7)],
        "k long, aid long, s long, e long")
    b = spark.createDataFrame(
        [(1, 90, 3, 5), (1, 91, 29, 44), (2, 92, 50, 60),
         (2, 93, 101, 110), (3, 94, 0, 9)],
        "k long, bid long, bs long, be long")
    want = {(r.k, r.aid, r.bid) for r in
            a.join(b, "k").filter((F.col("s") <= F.col("be"))
                                  & (F.col("bs") <= F.col("e"))).collect()}
    for bucket in (1, 7, 1000):
        got = {(r.k, r.aid, r.bid) for r in interval_overlap_join(
            a, b, "k", "aid", "s", "e", "bid", "bs", "be",
            bucket=bucket).collect()}
        assert got == want, (bucket, got, want)
    assert (1, 10, 90) in want      # touching endpoints overlap
    assert (2, 20, 93) not in want  # adjacent-but-disjoint do not


def test_bloom_semi_join_exact_and_sheds_in_scan(spark):
    """Output is bit-identical to the plain left-semi join for any
    (m_bits, k) — the bloom admits false positives only, never false
    negatives — and the probe is a scan-stage Filter BEFORE the join."""
    import pyspark.sql.functions as F

    from kstream_spark.operators.joins import bloom_semi_join
    fact = spark.range(0, 2000).select(
        (F.col("id") % 500).alias("key"), F.col("id").alias("val"))
    dim = spark.range(0, 100).select((F.col("id") * 7).alias("key"))
    want = sorted((r.key, r.val) for r in
                  fact.join(dim, "key", "left_semi").collect())
    for m_bits, k in ((1 << 16, 3), (64, 2)):   # 64 bits: saturated bloom
        out = bloom_semi_join(fact, dim, "key", m_bits=m_bits, k=k)
        got = sorted((r.key, r.val) for r in out.collect())
        assert got == want, (m_bits, k)
    plan = out._jdf.queryExecution().executedPlan().toString()
    f_pos = plan.find("element_at")
    j_pos = plan.find("Join")
    assert 0 <= j_pos < f_pos  # probe filter sits below (after) the join node


def test_asof_join_forward_and_nearest(spark):
    """merge_asof direction parity: forward takes the earliest right at or
    after the left ts; nearest takes the closer side, ties backward."""
    from kstream_spark.operators.joins import asof_join
    left = spark.createDataFrame(
        [(1, "2024-01-10"), (1, "2024-01-16"), (1, "2024-01-30"),
         (2, "2024-01-05")],
        "k long, lt string").withColumn("lt", F.col("lt").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-08", 100), (1, "2024-01-15", 101),
         (1, "2024-01-17", 102), (2, "2024-01-05", 200)],
        "k long, rt string, val int") \
        .withColumn("rt", F.col("rt").cast("timestamp"))

    fwd = {(r.k, str(r.lt)[:10]): r.val for r in asof_join(
        left, right, "k", "lt", "rt", ["val"],
        direction="forward").collect()}
    assert fwd[(1, "2024-01-10")] == 101    # earliest >= Jan10
    assert fwd[(1, "2024-01-16")] == 102
    assert fwd[(1, "2024-01-30")] is None   # nothing after
    assert fwd[(2, "2024-01-05")] == 200    # equality qualifies forward

    near = {(r.k, str(r.lt)[:10]): r.val for r in asof_join(
        left, right, "k", "lt", "rt", ["val"],
        direction="nearest").collect()}
    assert near[(1, "2024-01-10")] == 100   # Jan8 (2d) beats Jan15 (5d)
    assert near[(1, "2024-01-16")] == 101   # tie 1d/1d -> backward wins
    assert near[(1, "2024-01-30")] == 102   # only a backward candidate
    assert near[(2, "2024-01-05")] == 200   # exact hit at distance 0

    # tolerance removes out-of-range candidates BEFORE the nearest choice
    ntol = {(r.k, str(r.lt)[:10]): r.val for r in asof_join(
        left, right, "k", "lt", "rt", ["val"],
        direction="nearest", tolerance="4 days").collect()}
    assert ntol[(1, "2024-01-10")] == 100
    assert ntol[(1, "2024-01-30")] is None  # backward candidate 13d stale

    import pytest as _pytest
    with _pytest.raises(ValueError):
        asof_join(left, right, "k", "lt", "rt", ["val"], direction="nope")


def test_asof_join_equal_ts_right_dupes_deterministic(spark):
    """Equal-timestamp right-side duplicates must resolve deterministically
    regardless of partitioning: the operator compacts the right side to one
    row per (key, ts) with max_by(struct(right_cols)) BEFORE the window
    fill (joins.asof_join), so every direction picks the greatest payload —
    the same row a SQL oracle's max() pre-aggregation picks.  Without the
    compaction, last()/first() over the union sort would take whichever
    duplicate the shuffle happened to order last/first (the r10 review's
    repartition-flip scenario)."""
    import random

    from kstream_spark.operators.joins import asof_join
    left = spark.createDataFrame(
        [(1, "2024-01-10"), (1, "2024-01-20")],
        "k long, lt string").withColumn("lt", F.col("lt").cast("timestamp"))
    # three right rows at the SAME (key, ts) between the two left rows;
    # every direction that matches must land on val=103 (max struct)
    dup_rows = [(1, "2024-01-15", v) for v in (101, 103, 102)]
    for seed in (0, 1, 2):
        rows = dup_rows[:]
        random.Random(seed).shuffle(rows)
        right = (spark.createDataFrame(rows, "k long, rt string, val int")
                 .withColumn("rt", F.col("rt").cast("timestamp"))
                 .repartition(7))       # scramble physical order too
        for direction in ("backward", "forward", "nearest"):
            out = {(r.k, str(r.lt)[:10]): r.val for r in asof_join(
                left, right, "k", "lt", "rt", ["val"],
                direction=direction).collect()}
            # Jan10: only a forward candidate; Jan20: only a backward one
            exp10 = None if direction == "backward" else 103
            exp20 = None if direction == "forward" else 103
            assert out[(1, "2024-01-10")] == exp10, (seed, direction)
            assert out[(1, "2024-01-20")] == exp20, (seed, direction)
