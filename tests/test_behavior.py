"""Ordered funnel + cohort retention (operators/behavior.py)."""

from datetime import datetime

from kstream_spark.operators import behavior as B

STEPS = ["view", "click", "purchase"]


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2024, 1, d, h)) for u, t, d, h in rows],
        "user_id long, event_type string, ts timestamp")


def test_funnel_strict_ordering(spark):
    df = _ev(spark, [
        # u1 completes in order -> stage 3
        (1, "view", 1, 0), (1, "click", 2, 0), (1, "purchase", 3, 0),
        # u2: purchase BEFORE click -> stops at stage 2
        (2, "view", 1, 0), (2, "purchase", 2, 0), (2, "click", 3, 0),
        # u3: click before any view -> stage 1 (view exists, click unusable)
        (3, "click", 1, 0), (3, "view", 2, 0),
        # u4: no funnel events at all -> stage 0
        (4, "error", 1, 0),
    ])
    out = {r["user_id"]: r["stage"] for r in
           B.funnel(df, "user_id", "event_type", "ts", STEPS).collect()}
    assert out == {1: 3, 2: 2, 3: 1, 4: 0}


def test_funnel_earliest_first_matching(spark):
    # view@d1, click@d2, view@d3, purchase@d4: t1 anchors at d1 so the
    # d2 click counts and the d4 purchase completes the funnel
    df = _ev(spark, [(1, "view", 1, 0), (1, "click", 2, 0),
                     (1, "view", 3, 0), (1, "purchase", 4, 0)])
    r = B.funnel(df, "user_id", "event_type", "ts", STEPS).collect()[0]
    assert r["stage"] == 3
    assert r["t_1"] == datetime(2024, 1, 1)
    assert r["t_2"] == datetime(2024, 1, 2)
    assert r["t_3"] == datetime(2024, 1, 4)


def test_funnel_single_exchange(spark):
    df = _ev(spark, [(1, "view", 1, 0)])
    plan = B.funnel(df, "user_id", "event_type", "ts", STEPS) \
        ._jdf.queryExecution().executedPlan().toString()
    # the 3-step window cascade + final groupBy share ONE user_id hash
    # exchange (plus AQE reads); a join-based funnel would show several
    assert plan.count("Exchange hashpartitioning") <= 1


def test_funnel_summary_counts(spark):
    df = _ev(spark, [(1, "view", 1, 0), (1, "click", 2, 0),
                     (2, "view", 1, 0), (3, "error", 1, 0)])
    out = {r["stage"]: r["n_users"] for r in
           B.funnel_summary(df, "user_id", "event_type", "ts",
                            STEPS).collect()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_cohort_retention_week_grid(spark):
    df = _ev(spark, [
        # u1 first event Mon Jan 1 -> cohort 2024-01-01; active wk0 and wk2
        (1, "view", 1, 0), (1, "view", 16, 0),
        # u2 first event Thu Jan 4 -> same cohort week; active wk0 only
        (2, "view", 4, 0),
        # u3 first event Mon Jan 8 -> cohort 2024-01-08; wk0 + wk1
        (3, "view", 8, 0), (3, "view", 15, 0),
    ])
    out = {(r["cohort_week"], r["week_n"]): r["n_active"] for r in
           B.cohort_retention(df, "user_id", "ts").collect()}
    w1, w2 = datetime(2024, 1, 1), datetime(2024, 1, 8)
    assert out == {(w1, 0): 2, (w1, 2): 1, (w2, 0): 1, (w2, 1): 1}


def test_top_paths_known_sequences(spark):
    import datetime as dt
    from kstream_spark.operators.behavior import top_paths
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    m = dt.timedelta(minutes=1)
    h = dt.timedelta(hours=2)
    rows = [
        # user 1, session 1: view > cart > buy (+ a 4th step ignored)
        (1, 1, "view", t0), (2, 1, "cart", t0 + m), (3, 1, "buy", t0 + 2*m),
        (4, 1, "view", t0 + 3*m),
        # user 1, session 2 (after the gap): view > cart > buy again
        (5, 1, "view", t0 + h), (6, 1, "cart", t0 + h + m),
        (7, 1, "buy", t0 + h + 2*m),
        # user 2: a 2-step session
        (8, 2, "view", t0), (9, 2, "exit", t0 + m),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    out = top_paths(df, "user_id", "ts", "event_type", "event_id",
                    steps=3, top_n=10).toPandas()
    assert out.iloc[0]["path"] == "view > cart > buy"
    assert out.iloc[0]["n_sessions"] == 2 and out.iloc[0]["rank"] == 1
    assert out.iloc[1]["path"] == "view > exit"
    assert out["rank"].tolist() == [1, 2]


def test_ewma_known_values_and_truncation(spark):
    """Normalized bounded-frame EWMA: hand-computed values at alpha=0.5,
    window=2 — frame j has weights [0.25, 0.5] (older, newer) normalized
    by their sum; the first row is unbiased (equals its own value)."""
    from kstream_spark.operators.behavior import ewma
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 40.0), (2, 1, 7.0)],
        "user_id long, event_id long, value double")
    out = {(r.user_id, r.event_id): r.ewma
           for r in ewma(df, "user_id", ["event_id"], "value",
                         alpha=0.5, window=2).collect()}
    assert out[(1, 1)] == 10.0
    # (10*0.25 + 20*0.5) / 0.75
    assert out[(1, 2)] == round((10 * 0.25 + 20 * 0.5) / 0.75, 6)
    assert out[(1, 3)] == round((20 * 0.25 + 40 * 0.5) / 0.75, 6)
    assert out[(2, 1)] == 7.0   # keys never mix


def test_ewma_null_values_are_observation_gaps(spark):
    """NULLs drop out of the frame: an all-NULL trailing frame gives
    ewma NULL (no crash), later rows weight only the observed values."""
    from kstream_spark.operators.behavior import ewma
    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, 20.0), (1, 3, None), (1, 4, 40.0)],
        "user_id long, event_id long, value double")
    out = {r.event_id: r.ewma
           for r in ewma(df, "user_id", ["event_id"], "value",
                         alpha=0.5, window=2).collect()}
    assert out[1] is None
    assert out[2] == 20.0
    # frame of event 4 = rows 3,4 -> observed [20?no: window=2 rows ->
    # rows (3,4) -> values [40.0] only] -> unbiased single value
    assert out[4] == 40.0
