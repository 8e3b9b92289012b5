"""Streaming SCD2 dimension maintenance — the CDC-consumer shape.

The streaming face of ``operators/scd.scd2_apply``: each arriving
micro-batch of change events merges into a PERSISTED dimension laid out
as two relations —

  ``<dim>/closed``  append-only validity intervals (epoch-partitioned,
                    dynamic-overwrite: at-least-once replays rewrite
                    their own epoch instead of duplicating);
  ``<dim>/open``    one row per live key, overwritten per batch.

This is the warehouse upgrade of the reference's last-write-wins
GlobalTable (kstream/global_table.go:32-42 keeps only the latest value):
every state a key ever held stays queryable with its time range, and
``operators/scd.scd2_lookup`` over closed+open serves point-in-time
reads.

Scale shape: per-batch work is bounded by the change batch plus one row
per LIVE key (the open relation) — closed history is never read, never
shuffled, never rewritten.  The batch==stream invariant is asserted by
the parity test: consuming a log in any batch split yields the identical
dimension to one batch scd2_history over the full log.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_dimension(spark, dim_path: str) -> DataFrame:
    """The full SCD2 dimension (closed history + live rows), e.g. for
    scd2_lookup point-in-time reads.  Drops the epoch bookkeeping."""
    closed = spark.read.parquet(f"{dim_path}/closed").drop("__epoch")
    open_rows = spark.read.parquet(f"{dim_path}/open")
    return closed.unionByName(open_rows)


def scd2_stream(df: DataFrame, dim_path: str, checkpoint_dir: str,
                key_col: str, attr_cols: Sequence[str], ts_col: str,
                id_col: str | None = None, epoch_col: str = "__epoch"):
    """Maintain a persisted SCD2 dimension from a change stream.
    Returns the StreamingQuery."""
    from kstream_spark.operators.scd import scd2_apply

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        try:
            open_rows = spark.read.parquet(f"{dim_path}/open")
        except Exception:  # first batch: no dimension yet
            from kstream_spark.operators.scd import scd2_history
            open_rows = spark.createDataFrame(
                [], scd2_history(batch.limit(0), key_col, attr_cols,
                                 ts_col, id_col=id_col).schema)
        merged = scd2_apply(open_rows, batch, key_col, attr_cols, ts_col,
                            id_col=id_col)
        # the open snapshot holds no closed rows, so every non-current
        # output row was closed BY THIS BATCH -> epoch-keyed append
        newly_closed = merged.filter(~F.col("is_current"))
        still_open = merged.filter(F.col("is_current"))
        (newly_closed.withColumn(epoch_col, F.lit(epoch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(epoch_col).parquet(f"{dim_path}/closed"))
        # materialize before overwriting the relation it reads from
        (still_open.write.mode("overwrite")
         .parquet(f"{dim_path}/open.tmp"))
        tmp = spark.read.parquet(f"{dim_path}/open.tmp")
        tmp.write.mode("overwrite").parquet(f"{dim_path}/open")

    return (df.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", checkpoint_dir).start())
