"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's optimizer estimate of the plan's output volume (file
    sizes for scans) — no job, no rdd conversion.

    SINGLE choke point for the py4j-private ``_jdf.queryExecution()``
    handle: it is not public API (stable on the pinned Spark 4.x, could
    move in a future release), so it lives behind this one helper and
    every caller must tolerate ``None``.  Any attribute/py4j change on a
    Spark upgrade lands in the except and degrades to the conservative
    no-stats path instead of crashing — the Spark-Connect case (no _jdf at
    all) degrades the same way.

    Relations Catalyst cannot size (in-memory createDataFrame rows, some
    views) report ``spark.sql.defaultSizeInBytes`` — a Long.MaxValue-ish
    SENTINEL meaning "unknown", not a real estimate.  Returning it as a
    size made gates read "huge" (an 8 EiB warning for a 3-row relation),
    so the sentinel maps to ``None`` like every other no-stats case."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats()
                   .sizeInBytes())
        sentinel = int(df.sparkSession.conf.get(
            "spark.sql.defaultSizeInBytes", str((1 << 63) - 1)))
        if size >= sentinel:
            return None
        return size
    except Exception:
        return None


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None,
                       min_bytes: int | None = 8 << 20) -> DataFrame:
    """Repartition iff the input is both under-partitioned AND big enough
    for the shuffle to pay for itself.

    Single small files scan as ONE partition, serializing CPU-heavy per-row
    operators (shingling, hashing, vector math) onto one core — that's what
    the repartition fixes.  But at toy scale the round-trip shuffle costs
    more than the serialization it removes (r2 bench: sim_cosine_topk and
    text_quality both ~1.9x slower purely from this repartition), so inputs
    whose optimizer-estimated size is under ``min_bytes`` are left alone.
    The size comes from Catalyst plan statistics (file sizes for scans) —
    no job, no rdd conversion on the skip path.  At real scale inputs
    arrive in many splits and the partition check is a no-op anyway.

    ``min_bytes`` is per-operator: CPU-heavy fan-out operators (shingling
    explodes text ~10-50x) pass a lower floor; plain codegen passes keep
    the default.  ``min_bytes=None`` is the explicit OFF switch — return
    the frame untouched unconditionally.  (Callers that want the
    repartition pinned off must use None, not a huge-bytes sentinel: when
    Catalyst stats are unavailable a size threshold is simply skipped and
    the partition check would repartition anyway — ADVICE r9.)"""
    if min_bytes is None:
        return df
    spark = df.sparkSession
    size = _plan_size_bytes(df)
    if size is not None and size < min_bytes:
        return df
    # stats unavailable -> fall through to the partition check
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def free_local_checkpoint(df: DataFrame) -> None:
    """Release the storage blocks behind a ``localCheckpoint``-ed frame.

    ``Dataset.unpersist`` only drops CacheManager entries, and a
    localCheckpointed frame is not registered there — its data lives in
    the checkpointed RDD's own persistence, which ``unpersist`` never
    touches (verified empirically on PySpark 4.1.2: numCachedPartitions
    unchanged after ``df.unpersist(True)``; ADVICE r9).  Iterative
    algorithms that checkpoint per round (graph BSP loops) would
    accumulate one O(|nodes|) block set per round until ContextCleaner
    GC got around to them.

    The real handle is the LogicalRDD the checkpoint planted at the root
    of the analyzed plan: ``queryExecution().analyzed().rdd()`` is the
    persisted internal-row RDD, and unpersisting THAT frees the blocks
    immediately (probe: storage info goes to [] right after).  Uses the
    py4j-private ``_jdf`` like ``_plan_size_bytes``; any failure (plan
    shape changed on a Spark upgrade, Spark Connect) degrades to the
    old behavior — GC-driven cleanup — rather than crashing."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # fall back to ContextCleaner GC


def with_salt(df: DataFrame, buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Add a per-ROW salt column for skew mitigation.

    The salt must vary WITHIN a key (that's what splits a hot key across
    ``buckets`` reducers), so it is derived from the row position, not the
    key.  Aggregate on (key, salt) first (partial), then on key (final) —
    two balanced shuffles instead of one skewed one.  For skewed joins,
    explode the small side over all salt values and join on (key, salt).
    AQE's skew-join handling (on by default in get_spark) covers joins at
    runtime; explicit salting is the aggregation-side tool."""
    from pyspark.sql import functions as F
    return df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(buckets)))


def salted_agg(df: DataFrame, key: str, aggs: dict, buckets: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: name -> (partial Column aggregate, final reducer name), where
    the final reducer is one of 'sum' | 'min' | 'max' (the re-combine step
    for algebraic aggregates; count re-combines with sum)."""
    from pyspark.sql import functions as F
    salted = with_salt(df, buckets)
    partial = salted.groupBy(key, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (expr, _fin) in aggs.items()])
    final_fns = {"sum": F.sum, "min": F.min, "max": F.max}
    finals = [final_fns[fin](F.col(f"__p_{name}")).alias(name)
              for name, (_expr, fin) in aggs.items()]
    return partial.groupBy(key).agg(*finals)


def skew_join(left: DataFrame, right: DataFrame, key: str,
              how: str = "inner", hot_keys: list | None = None,
              hot_threshold: int = 100_000,
              sample_fraction: float = 0.01,
              max_isin_keys: int = 64) -> DataFrame:
    """Hot-key-split join for skewed fact/fact joins.

    AQE's skew-join only splits oversized partitions of a sort-merge join
    AFTER a full skewed shuffle of both sides; when a handful of keys carry
    a large share of the rows, splitting the RELATION beats splitting the
    partition: rows with hot keys join via broadcast (no shuffle of the hot
    mass at all), the long tail joins via the normal shuffle path, and the
    two unions back.  ``hot_keys`` pins the split explicitly; otherwise hot
    keys are estimated from a ``sample_fraction`` sample of the left side
    (sampled count / fraction > hot_threshold).

    The right side must be filter-small on the hot keys (dimension-or-less
    per key) — that subset is broadcast.

    A hot set up to ``max_isin_keys`` becomes an ``isin`` literal (codegen
    comparisons, pushable to the scan); a LARGER set would degrade the
    literal (a thousands-long OR chain bloats codegen and the plan), so it
    rides as a broadcast key table instead and the split becomes
    semi/anti joins — same relation split, scan-speed either way.
    """
    from pyspark.sql import functions as F
    if hot_keys is None:
        est = (left.sample(fraction=sample_fraction, seed=42)
               .groupBy(key).count()
               .filter(F.col("count") > hot_threshold * sample_fraction)
               .select(key).collect())
        hot_keys = [r[key] for r in est]
    if not hot_keys:
        return left.join(right, key, how)
    if len(hot_keys) <= max_isin_keys:
        is_hot = F.col(key).isin(hot_keys)
        l_hot, l_cold = left.filter(is_hot), left.filter(~is_hot)
        r_hot, r_cold = right.filter(is_hot), right.filter(~is_hot)
    else:
        hk = F.broadcast(local_df(
            left.sparkSession, [(k,) for k in hot_keys],
            left.select(key).schema))
        l_hot = left.join(hk, key, "left_semi")
        l_cold = left.join(hk, key, "left_anti")
        r_hot = right.join(hk, key, "left_semi")
        r_cold = right.join(hk, key, "left_anti")
    hot = l_hot.join(F.broadcast(r_hot), key, how)
    cold = l_cold.join(r_cold, key, how)
    return hot.unionByName(cold)


def local_df(spark, rows, schema) -> DataFrame:
    """Build a TINY driver-side relation as a JVM ``LocalTableScan``.

    ``spark.createDataFrame(list_of_rows, ...)`` produces a PYTHON-RDD-
    backed plan (``Scan ExistingRDD``) sliced into ``defaultParallelism``
    partitions — on ``local[32]`` that is 32 Python worker round-trips
    per ACTION for a 15-row probe table (measured r14: ~0.4 s evaluated
    in parallel, ~4.5 s under ``coalesce(1)``), re-paid every time the
    relation is scanned because nothing caches it.  Routing the same
    rows through a pandas DataFrame + Arrow yields a real JVM local
    relation: zero Python at execution time, correct (tiny) stats, and
    the same values bit-for-bit (measured: 0.06 s vs 0.4 s for the same
    15-row probe; plan shows ``LocalTableScan``).

    Values round-trip exactly: the pandas frame is built with
    ``dtype=object`` so ints/floats/strings/None and (nested) lists
    reach Arrow unchanged, and the explicit ``schema`` drives the
    conversion — no pandas type inference, no NaN coercion.  Schemas
    containing timestamp/date types fall back to the classic row path
    (Arrow's tz-localization semantics differ from the pickle path);
    Arrow conversion failures (e.g. nested Row objects) also fall back.

    ``rows`` must be a list of tuples/Rows matching ``schema``."""
    import pandas as pd
    from pyspark.sql import types as T

    def _temporal(dt) -> bool:
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType,
                           T.DateType)):
            return True
        if isinstance(dt, T.ArrayType):
            return _temporal(dt.elementType)
        if isinstance(dt, T.MapType):
            return _temporal(dt.keyType) or _temporal(dt.valueType)
        if isinstance(dt, T.StructType):
            return any(_temporal(f.dataType) for f in dt.fields)
        return False

    struct = schema
    if not isinstance(struct, T.StructType):
        try:
            struct = T._parse_datatype_string(schema)
        except Exception:
            return spark.createDataFrame(rows, schema)
    if rows and not _temporal(struct):
        try:
            pdf = pd.DataFrame([tuple(r) for r in rows], dtype=object)
            pdf.columns = [f.name for f in struct.fields]
            return spark.createDataFrame(pdf, struct)
        except Exception:
            pass  # nested Rows / exotic types: classic path below
    return spark.createDataFrame(rows, struct)


def collect_freeing(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize a BOUNDED final relation, unpersist the cached inputs
    it consumed, and return the result as a local relation with the same
    schema.

    Multi-consumer query bodies persist shared subtrees (scan once, feed
    N consumers) — but a query function that returns lazily can't
    unpersist them itself, and a long-lived session running the full
    inventory sweep would accumulate every such cache for its lifetime
    (ADVICE r8: inventory_corpus/inventory_pipeline leaks).  This helper
    is the contract: the caller asserts `out` is final-result-sized
    (audit rows, top-k, pair lists — never a corpus), so one bounded
    collect lets the caches be dropped deterministically the moment the
    result exists.

    KSTREAM_SPARK_KEEP_LAZY=1 returns ``out`` unchanged (keeping the
    caches alive) — plan-inspection tooling (tools/dump_plans.py) sets
    it so the distributed shape stays visible instead of collapsing to
    a LocalTableScan of the materialized rows."""
    import os
    if os.environ.get("KSTREAM_SPARK_KEEP_LAZY") == "1":
        return out
    rows = out.collect()
    schema = out.schema
    for df in cached:
        df.unpersist()
    # local_df (r14): the materialized result comes back as a JVM
    # LocalTableScan, not a Python-RDD scan — the caller's downstream
    # actions (the bench noop write, joins onto the audit rows) no
    # longer pay defaultParallelism Python worker round-trips per action
    return local_df(out.sparkSession, rows, schema)


def input_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's estimate of the plan's input volume (file sizes for
    scans).  None when stats are unavailable — see ``_plan_size_bytes``
    for the private-API caveat."""
    return _plan_size_bytes(df)


def tune_shuffle_partitions(spark, input_bytes: int,
                            target_partition_bytes: int = 128 << 20,
                            max_partitions: int = 200_000) -> int:
    """Size ``spark.sql.shuffle.partitions`` from the job's input volume.

    The default (200, or a fixed test value) is wrong at both ends of the
    scale: at 100 TB it packs ~500 GB into each reduce partition (OOM/spill),
    at 100 MB it schedules hundreds of empty tasks.  The right starting
    point is input_bytes / target_partition_bytes, floored at the cluster's
    core count so every core gets work; with AQE's partition coalescing on
    (session.get_spark enables it) an over-estimate is cheap — AQE merges
    small shuffle partitions at runtime, but it can never SPLIT an
    under-estimated one (only the skew-join path splits, and just for
    joins), so erring high is the safe side.

    Call once per job with the dominant input's size
    (``input_size_bytes``); returns the partition count it set."""
    import math
    cores = spark.sparkContext.defaultParallelism
    parts = max(cores, min(math.ceil(input_bytes / target_partition_bytes),
                           max_partitions))
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    return parts
