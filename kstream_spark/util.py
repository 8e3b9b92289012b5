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
