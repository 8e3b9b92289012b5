"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media as ``binary`` payload columns with a metadata struct
(modality, byte size, content hash).  Decode / feature-extraction runs as
Arrow-batched pandas iterators over ``mapInPandas`` — the payload bytes never
pass through per-row Python.  The actual codec step is STUBBED (no
image/audio libs in this container): ``decode_stub`` raises
NotImplementedError unless ``fake=True``, in which case it produces a
deterministic fake feature vector from the payload hash so the Spark-side
plumbing (schema, batching, partitioning) is fully exercised and tested.

Scale notes: payloads dominate row size — keep them in their own column so
column pruning drops them when a query touches only metadata; partition by
content-hash prefix for even task sizing; never collect payloads.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attach_binary(df: DataFrame, source_col: str, modality: str = "image",
                  payload_col: str = "payload") -> DataFrame:
    """Wrap a column's bytes as a media payload + metadata struct."""
    payload = F.encode(F.col(source_col), "UTF-8") if \
        dict(df.dtypes)[source_col] == "string" else F.col(source_col)
    return df.withColumn(payload_col, payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(F.col(payload_col)).alias("n_bytes"),
            F.sha2(F.col(payload_col), 256).alias("sha256"),
        ),
    )


FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def decode_stub(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload", dim: int = 8,
                fake: bool = False) -> DataFrame:
    """Decode + feature-extract media payloads (Arrow-batched).

    Real codecs are unavailable in this container; ``fake=True`` derives a
    deterministic pseudo-feature from sha256(payload) so tests exercise the
    exact production plumbing (batch iterator, schema, Arrow transfer).
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/av/torchaudio) not installed in this "
            "environment; pass fake=True for the deterministic test path")

    def run(batches):
        for pdf in batches:
            feats, sizes = [], []
            for raw in pdf[payload_col]:
                b = bytes(raw)
                h = hashlib.sha256(b).digest()
                feats.append([h[i] / 255.0 for i in range(dim)])
                sizes.append(len(b))
            out = pdf[[id_col]].copy()
            out["n_bytes"] = sizes
            out["feature"] = feats
            yield out

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ])
    return df.select(id_col, payload_col).mapInPandas(run, schema)
