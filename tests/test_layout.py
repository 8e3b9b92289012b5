"""Sessionization (behavior.sessionize) and Z-order layout (layout.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from kstream_spark.operators import behavior as B
from kstream_spark.operators.layout import cluster_by_zorder, zorder_key


def test_sessionize_gap_splits(spark):
    rows = [
        (1, 10, datetime(2024, 1, 1, 10, 0)),
        (2, 10, datetime(2024, 1, 1, 10, 20)),   # 20 min -> same session
        (3, 10, datetime(2024, 1, 1, 11, 0)),    # 40 min -> new session
        (4, 20, datetime(2024, 1, 1, 10, 0)),    # other user -> own session
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {r["event_id"]: (r["session_n"], r["is_session_start"]) for r in
           B.sessionize(df, "user_id", "ts", "30 minutes",
                        id_col="event_id").collect()}
    assert out == {1: (1, 1), 2: (1, 0), 3: (2, 1), 4: (1, 1)}


def test_sessionize_boundary_is_strict(spark):
    # exactly 30 minutes apart: NOT a new session (> gap, not >=)
    rows = [(1, 1, datetime(2024, 1, 1, 10, 0)),
            (2, 1, datetime(2024, 1, 1, 10, 30))]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = B.sessionize(df, "user_id", "ts", "30 minutes", id_col="event_id")
    assert out.agg(F.max("session_n")).first()[0] == 1


def test_zorder_key_known_interleave(spark):
    df = spark.createDataFrame([(3, 1), (0, 0), (65535, 65535)], "a long, b long")
    out = df.select(zorder_key(F.col("a"), F.col("b"), bits=16).alias("z")) \
        .collect()
    zs = sorted(r["z"] for r in out)
    # a=3 -> bits at 1,3 = 10; b=1 -> bit 0 = 1 -> 11
    assert zs[0] == 0
    assert zs[1] == 11
    assert zs[2] == (1 << 32) - 1  # all 32 bits set


def test_cluster_by_zorder_tightens_bounding_boxes(spark):
    # 64x64 grid; clustered into 16 ranges -> per-partition (a,b) bounding
    # boxes must be far smaller than the full domain
    rows = [(a, b) for a in range(64) for b in range(64)]
    df = spark.createDataFrame(rows, "a long, b long")
    parts = (cluster_by_zorder(df, "a", "b", num_files=16, bits=6)
             .withColumn("pid", F.spark_partition_id())
             .groupBy("pid")
             .agg((F.max("a") - F.min("a")).alias("da"),
                  (F.max("b") - F.min("b")).alias("db"),
                  F.count(F.lit(1)).alias("n"))
             .collect())
    assert sum(p["n"] for p in parts) == 64 * 64
    avg_area = sum((p["da"] + 1) * (p["db"] + 1) for p in parts) / len(parts)
    # random assignment would give ~64*64 per partition; z-order keeps
    # boxes near 64*64/16 = 256
    assert avg_area < 64 * 64 / 2


def _xy2d(n, x, y):
    """Sequential public-domain Hilbert xy2d reference."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_key_matches_reference_walk(spark):
    from pyspark.sql import functions as F
    from kstream_spark.operators.layout import hilbert_key
    bits = 4
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {(r.x, r.y): r.h for r in
           df.withColumn("h", hilbert_key(F.col("x"), F.col("y"),
                                          bits=bits)).collect()}
    for (x, y), h in got.items():
        assert h == _xy2d(1 << bits, x, y), (x, y)
    # a space-filling curve visits every cell exactly once
    assert sorted(got.values()) == list(range(256))


def test_hilbert_chunk_tables_match_walk_exhaustive():
    """The 4-state chunk LUTs (hilbert_key's fast path for bits%4==0)
    replay the classic per-bit walk EXACTLY on the full bits=8 domain —
    driver-side, no Spark.  Chunk transitions only depend on the 2-bit
    state, and all four states occur within this domain, so exhaustive
    bits=8 (walked nibble-wise AND as one byte-table lookup) plus the
    bits=4 Spark test pins both tables' semantics (bits=12 exhaustive /
    bits=16 randomized were verified when the nibble path landed)."""
    from kstream_spark.operators.layout import _hilbert_chunk_table
    tbl = _hilbert_chunk_table(4)
    byte_tbl = _hilbert_chunk_table(8)
    states_seen = set()
    for x in range(256):
        for y in range(256):
            st = d = 0
            for c in (1, 0):
                v = tbl[st * 256 + ((x >> (4 * c)) & 15) * 16
                        + ((y >> (4 * c)) & 15)]
                d = d * 256 + (v & 255)
                st = v >> 8
                states_seen.add(st)
            want = _xy2d(256, x, y)
            assert d == want, (x, y)
            assert byte_tbl[x * 256 + y] & 65535 == want, (x, y)
    assert states_seen == {0, 1, 2, 3}
    # byte-table STATE CHAINING: bits=16 walks two byte steps; randomized
    # parity against the per-bit walk covers all four entry states
    import random
    rng = random.Random(11)
    for _ in range(2000):
        x, y = rng.randrange(1 << 16), rng.randrange(1 << 16)
        st = d = 0
        for c in (1, 0):
            v = byte_tbl[st * 65536 + ((x >> (8 * c)) & 255) * 256
                         + ((y >> (8 * c)) & 255)]
            d = d * 65536 + (v & 65535)
            st = v >> 16
        assert d == _xy2d(1 << 16, x, y), (x, y)


def test_hilbert_is_continuous_morton_is_not(spark):
    """Consecutive Hilbert keys are always 4-neighbors (curve continuity
    — the locality property Morton lacks at power-of-two boundaries)."""
    from pyspark.sql import functions as F
    from kstream_spark.operators.layout import hilbert_key, zorder_key
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select("x", "y",
                    hilbert_key(F.col("x"), F.col("y"), 3).alias("h"),
                    zorder_key(F.col("x"), F.col("y"), 3).alias("z")) \
        .collect()
    by_h = {r.h: (r.x, r.y) for r in out}
    for d in range(63):
        (x1, y1), (x2, y2) = by_h[d], by_h[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1
    by_z = {r.z: (r.x, r.y) for r in out}
    jumps = sum(1 for d in range(63)
                if abs(by_z[d][0] - by_z[d + 1][0])
                + abs(by_z[d][1] - by_z[d + 1][1]) > 1)
    assert jumps > 0   # Morton jumps; Hilbert never does


def test_hilbert_layout_tightens_bounding_boxes(spark):
    """The write-side claim: range-partitioning by the Hilbert key gives
    per-file (x, y) bounding boxes whose total area is <= the Morton
    layout's on the same data — tighter boxes = more files pruned by a
    min/max-stats scan."""
    from pyspark.sql import functions as F
    from kstream_spark.operators.layout import (cluster_by_hilbert,
                                                cluster_by_zorder)

    def total_box_area(df, key):
        parts = (df.withColumn("_p", F.spark_partition_id())
                 .groupBy("_p")
                 .agg((F.max("x") - F.min("x") + 1).alias("dx"),
                      (F.max("y") - F.min("y") + 1).alias("dy")))
        return sum(r.dx * r.dy for r in parts.collect())

    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    hil = cluster_by_hilbert(df, "x", "y", num_files=16, bits=6)
    mor = cluster_by_zorder(df, "x", "y", num_files=16, bits=6)
    assert total_box_area(hil, "_hkey") <= total_box_area(mor, "_zkey")


def test_hilbert_oracle_parity(spark):
    """Spark hilbert_key == the unrolled DuckDB CTE oracle on the events
    fixture's (user_id mod, day) grid — the r9 registration's parity
    proof, run locally now (the r8 driver window is full)."""
    import duckdb
    from pyspark.sql import functions as F
    from kstream_spark.inventory_behavior import _hilbert_sql
    from kstream_spark.operators.layout import hilbert_key
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                "'/root/testdata/sf0.001/events.parquet'")
    oracle = con.execute(f"""
WITH pts AS (SELECT event_id,
                    user_id % 256 AS x,
                    date_diff('day', DATE '2024-01-01',
                              CAST(ts AS DATE)) % 256 AS y
             FROM events),
{_hilbert_sql(8, "pts")},
ids AS (SELECT event_id, x, y FROM pts)
SELECT i.event_id, h.d
FROM ids i JOIN h0 h ON h.ox = i.x AND h.oy = i.y
""").fetchdf().set_index("event_id")["d"].to_dict()
    from kstream_spark import StreamBuilder
    ev = StreamBuilder(spark).table(
        "/root/testdata/sf0.001/events.parquet").to_df()
    day = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01"))
    got = {r.event_id: r.h for r in
           ev.select("event_id",
                     hilbert_key(F.col("user_id") % 256, day % 256,
                                 bits=8).alias("h")).collect()}
    assert got == oracle
