"""Data quality (operators/quality.py) + SCD2 (operators/scd.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from kstream_spark.operators import quality as Q
from kstream_spark.operators.scd import scd2_history, scd2_lookup


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", -5.0), (3, None, 7.0), (3, "b", None)],
        "id long, grp string, v double")


def test_profile_single_pass_metrics(spark):
    out = {r["col_name"]: r for r in Q.profile(_df(spark)).collect()}
    assert out["id"]["n_rows"] == 4
    assert out["id"]["n_distinct"] == 3
    assert out["grp"]["n_null"] == 1
    assert out["grp"]["n_distinct"] == 2   # nulls not counted as a value
    assert out["v"]["n_null"] == 1


def test_profile_is_one_aggregation(spark):
    plan = Q.profile(_df(spark))._jdf.queryExecution().executedPlan().toString()
    # single-pass: exactly one aggregate subtree scanning the input, not
    # one scan per column (explode of the packed struct adds no exchange)
    assert plan.count("Exchange") <= 2


def test_check_counts_violations(spark):
    rules = {"neg_v": F.col("v") < 0, "null_grp": F.col("grp").isNull()}
    out = {r["rule"]: r["n_violations"] for r in
           Q.check(_df(spark), rules).collect()}
    assert out == {"neg_v": 1, "null_grp": 1}


def test_quarantine_splits_and_names_rules(spark):
    rules = {"neg_v": F.col("v") < 0, "null_grp": F.col("grp").isNull()}
    clean, bad = Q.quarantine(_df(spark), rules)
    assert sorted(r["id"] for r in clean.collect()) == [1, 3]
    flagged = {r["id"]: sorted(r["violated"]) for r in bad.collect()}
    assert flagged == {2: ["neg_v"], 3: ["null_grp"]}
    assert clean.count() + bad.count() == 4


def test_orphans_anti_join(spark):
    child = spark.createDataFrame([(1, 10), (2, 99)], "id long, fk long")
    parent = spark.createDataFrame([(10,)], "pk long")
    out = Q.orphans(child, "fk", parent, "pk").collect()
    assert [r["id"] for r in out] == [2]


def test_scd2_collapses_runs_and_assigns_intervals(spark):
    rows = [
        (1, 1, "bronze", datetime(2024, 1, 1)),
        (2, 1, "bronze", datetime(2024, 1, 5)),   # no change -> collapsed
        (3, 1, "gold", datetime(2024, 2, 1)),     # change
        (4, 2, "silver", datetime(2024, 1, 2)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long,"
                               " tier string, ts timestamp")
    hist = scd2_history(df, "user_id", ["tier"], "ts", id_col="event_id")
    got = {(r["user_id"], r["tier"]):
           (r["valid_from"], r["valid_to"], r["is_current"])
           for r in hist.collect()}
    assert got[(1, "bronze")] == (datetime(2024, 1, 1),
                                  datetime(2024, 2, 1), False)
    assert got[(1, "gold")] == (datetime(2024, 2, 1), None, True)
    assert got[(2, "silver")] == (datetime(2024, 1, 2), None, True)

    # point-in-time read between the two changes sees bronze
    asof = scd2_lookup(hist, "user_id", "2024-01-15 00:00:00")
    tiers = {r["user_id"]: r["tier"] for r in asof.collect()}
    assert tiers == {1: "bronze", 2: "silver"}


def test_scd2_null_safe_change_detection(spark):
    rows = [(1, 1, None, datetime(2024, 1, 1)),
            (2, 1, None, datetime(2024, 1, 2)),    # null == null: no change
            (3, 1, "x", datetime(2024, 1, 3))]
    df = spark.createDataFrame(rows, "event_id long, user_id long,"
                               " tier string, ts timestamp")
    hist = scd2_history(df, "user_id", ["tier"], "ts", id_col="event_id")
    assert hist.count() == 2


def test_drift_psi_detects_shift_and_is_zero_on_identical(spark):
    from pyspark.sql import functions as F
    from kstream_spark.operators.quality import drift_psi
    a = spark.createDataFrame([(i, float(i % 4)) for i in range(400)],
                              "id long, v double")
    bucket = F.floor("v").cast("long")
    # identical distributions -> every PSI term is exactly 0
    same = drift_psi(a, a, bucket, n_buckets=4).toPandas()
    assert (same["psi_micro"] == 0).all()
    # shifted distribution -> strictly positive total PSI
    b = spark.createDataFrame([(i, float(3)) for i in range(400)],
                              "id long, v double")
    shift = drift_psi(a, b, bucket, n_buckets=4).toPandas()
    assert shift["psi_micro"].sum() > 250_000  # PSI > 0.25: major shift
    # every bucket of either side is present in the output
    assert set(shift["bucket"]) == {0, 1, 2, 3}


def test_scd2_apply_edge_cases(spark):
    import datetime as dt
    from kstream_spark.operators.scd import scd2_apply, scd2_history
    t = lambda d: dt.datetime(2024, 1, d)
    log1 = spark.createDataFrame(
        [(1, "a", t(1), 10), (1, "b", t(3), 11),   # key 1: a then b
         (2, "x", t(2), 12)],                       # key 2: open x
        "k long, attr string, ts timestamp, eid long")
    snap = scd2_history(log1, "k", ["attr"], "ts", id_col="eid")
    changes = spark.createDataFrame(
        [(1, "b", t(5), 20),    # unchanged attr -> no new interval
         (2, "y", t(1), 21),    # LATE (ts <= open valid_from) -> dropped
         (3, "z", t(6), 22)],   # brand-new key
        "k long, attr string, ts timestamp, eid long")
    out = scd2_apply(snap, changes, "k", ["attr"], "ts",
                     id_col="eid").toPandas()
    rows = {(r.k, r.attr): (r.valid_to, r.is_current)
            for r in out.itertuples()}
    # key 1: closed 'a' passes through; 'b' stays open (no-op change)
    assert rows[(1, "a")][1] is False or rows[(1, "a")][1] == False  # noqa: E712
    assert rows[(1, "b")][1]
    # key 2: late change dropped -> 'x' still the single open row
    assert rows[(2, "x")][1]
    assert (2, "y") not in rows
    # key 3: derived from scratch
    assert rows[(3, "z")][1]
    assert len(out) == 4


def test_drift_psi_empty_side_ungrouped_matches_grouped_smoothing(spark):
    """An EMPTY reference (or current) relation must yield the finite
    Laplace-smoothed PSI in the ungrouped branch too — the ungrouped agg
    emits one NULL-sum row over an empty side, which used to propagate
    NULL psi_micro while the grouped branch smoothed it (advisor r7)."""
    from pyspark.sql import functions as F
    from kstream_spark.operators.quality import drift_psi
    cur = spark.createDataFrame([(i, float(i % 3)) for i in range(30)],
                                "id long, v double")
    empty = cur.filter(F.lit(False))
    bucket = F.floor("v").cast("long")
    out = drift_psi(empty, cur, bucket, n_buckets=3).toPandas()
    assert len(out) == 3
    assert out["psi_micro"].notna().all()
    # grouped branch on the same data (one constant group) agrees
    g = drift_psi(empty.withColumn("g", F.lit("a")),
                  cur.withColumn("g", F.lit("a")),
                  bucket, group_cols=["g"], n_buckets=3).toPandas()
    assert sorted(out["psi_micro"]) == sorted(g["psi_micro"])


def test_scd2_apply_string_ids(spark):
    """Non-long id columns: the open-row pseudo-change sentinel is typed
    off the change batch's id column (advisor r7 — a string event id
    used to fail/coerce in the unionByName)."""
    import datetime as dt
    from kstream_spark.operators.scd import scd2_apply, scd2_history
    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    log1 = spark.createDataFrame(
        [(1, "a", t(1), "ev-10"), (1, "b", t(3), "ev-11")],
        "k long, attr string, ts timestamp, eid string")
    snap = scd2_history(log1, "k", ["attr"], "ts", id_col="eid")
    changes = spark.createDataFrame(
        [(1, "c", t(5), "ev-20")],
        "k long, attr string, ts timestamp, eid string")
    out = scd2_apply(snap, changes, "k", ["attr"], "ts",
                     id_col="eid").toPandas()
    open_rows = out[out["is_current"]]
    assert open_rows["attr"].tolist() == ["c"]
    assert len(out) == 3  # a closed, b closed, c open


def test_key_skew_profile_and_feeds_skew_join(spark):
    from pyspark.sql import functions as F
    from kstream_spark.operators.quality import key_skew
    from kstream_spark.util import skew_join
    # key 0 carries half the table; a long tail carries the rest
    left = spark.range(0, 400).select(
        F.when(F.col("id") < 200, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"))
    prof = key_skew(left, "k", top_n=3).toPandas()
    assert prof["rank"].tolist() == [1, 2, 3]
    top = prof.iloc[0]
    assert top["key"] == 0 and top["cnt"] == 200
    assert top["share_ppm"] == 500_000          # exactly half, exact ppm
    assert (prof["n_rows"] == 400).all() and (prof["n_keys"] == 201).all()
    # the profile's heavy keys drive the relation split directly
    hot = prof[prof["share_ppm"] > 100_000]["key"].tolist()
    right = spark.range(0, 300).withColumnRenamed("id", "k") \
        .withColumn("p", F.col("k") * 2)
    out = skew_join(left, right, "k", hot_keys=hot)
    want = left.join(right, "k")
    assert out.count() == want.count()
    assert ({(r.k, r.v, r.p) for r in out.collect()}
            == {(r.k, r.v, r.p) for r in want.collect()})
