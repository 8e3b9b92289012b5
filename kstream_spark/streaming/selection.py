"""Streaming data-selection admission — importance-gated ingestion.

The streaming face of ``operators/selection``: a DSIR weight table is
trained ONCE on a reference corpus (``dsir_weights``, persisted to
parquet — the "model"), and each arriving micro-batch is scored against
it (``dsir_apply``) with only documents above an importance threshold
admitted.  This is the filter-at-ingest shape of target-domain data
curation: the corpus never stores what selection would later discard.

Scale shape: per-batch work is one tokenize + broadcast-join against the
n_buckets-row weight table + one per-doc integer sum — O(|batch|), zero
state beyond the static weight table, no shuffle of history.  Replay
safety: admitted rows land in epoch-keyed partitions with dynamic
partition overwrite (the ``write_stream_idempotent`` protocol), so
at-least-once replays overwrite their own epoch instead of duplicating.

No reference analog (the reference has no selection surface); part of the
training-data capability superset.  Scores are exact integers, so the
streamed admission decision is bit-identical to the batch operator's —
asserted by the parity test (tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def admit_stream(df: DataFrame, weights_path: str, out_path: str,
                 checkpoint_dir: str, id_col: str, text_col: str,
                 min_micro: int = 0, n_buckets: int = 256,
                 epoch_col: str = "__epoch"):
    """Admit only documents whose DSIR importance score clears
    ``min_micro`` (exact integer micro-log units).  Returns the
    StreamingQuery.  The weight table is re-read per batch so a model
    refresh (retraining ``dsir_weights`` in place) takes effect on the
    next trigger without restarting the query."""
    from kstream_spark.operators.selection import dsir_apply

    def _admit(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        weights = spark.read.parquet(weights_path)
        scored = dsir_apply(batch, id_col, text_col, weights, n_buckets)
        admitted = (batch.join(
            scored.filter(F.col("dsir_micro") >= min_micro)
            .select(id_col, "dsir_micro"), id_col))
        (admitted.withColumn(epoch_col, F.lit(epoch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(epoch_col).parquet(out_path))

    return (df.writeStream.foreachBatch(_admit)
            .option("checkpointLocation", checkpoint_dir).start())
