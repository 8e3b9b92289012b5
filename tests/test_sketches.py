"""Sketch operators: accuracy bounds vs exact answers."""

import pyspark.sql.functions as F

from kstream_spark import StreamBuilder
from kstream_spark.operators import sketches as SK

SF = "/root/testdata/sf0.01"


def test_hll_within_rsd(spark):
    ev = StreamBuilder(spark).stream(f"{SF}/events.parquet").to_df()
    approx = {r.event_type: r.approx_user_id for r in
              SK.hll_distinct(ev, ["event_type"], "user_id", rsd=0.02).collect()}
    exact = {r.event_type: r.n for r in
             ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n"))
             .collect()}
    for k in exact:
        assert abs(approx[k] - exact[k]) <= max(3, 0.1 * exact[k])


def test_approx_quantiles_close_to_exact(spark):
    ev = StreamBuilder(spark).stream(f"{SF}/events.parquet").to_df()
    got = SK.approx_quantiles(ev, ["event_type"], "value", probs=[0.5]).collect()
    exact = {r.event_type: r.m for r in
             ev.groupBy("event_type").agg(F.expr("percentile(value, 0.5)").alias("m"))
             .collect()}
    for r in got:
        assert abs(r.q50 - exact[r.event_type]) <= 0.05 * max(1.0, exact[r.event_type])


def test_frequent_items_finds_hot_value(spark):
    df = spark.range(0, 1000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 7 ELSE id END AS v")
    hot = SK.frequent_items(df, "v", support=0.4).collect()[0][0]
    assert 7 in hot


def test_count_min_sketch_binary(spark):
    ev = StreamBuilder(spark).stream(f"{SF}/events.parquet").to_df()
    out = SK.count_min(ev, ["event_type"], "user_id").collect()
    assert len(out) == 5
    assert all(isinstance(r.cms, (bytes, bytearray)) and len(r.cms) > 0
               for r in out)


def test_hll_mergeable_union_matches_exact_within_bound(spark):
    from kstream_spark.operators.sketches import hll_mergeable_distinct
    import pyspark.sql.functions as F
    # 3 segments with overlapping value sets: union must count each value
    # once across segments (a sum of per-segment distincts would say 900)
    df = spark.range(900).select(
        (F.col("id") % 3).alias("seg"),
        (F.col("id") % 300).alias("v"),
        F.lit("g").alias("grp"))
    out = hll_mergeable_distinct(df, ["grp"], "seg", "v").collect()[0]
    assert out["n_segments"] == 3
    assert abs(out["est"] - 300) <= 300 * 0.05
