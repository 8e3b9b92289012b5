"""Small engine utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition iff the input is under-partitioned.

    Single small files scan as ONE partition, serializing CPU-heavy per-row
    operators (shingling, hashing, vector math) onto one core.  At real scale
    inputs arrive in many splits and this is a no-op — the check costs one
    partitioning lookup, no job."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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
