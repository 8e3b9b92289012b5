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


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload", every_n_bytes: int = 32,
                  max_frames: int = 8, fake: bool = False) -> DataFrame:
    """Frame sampling for video payloads: emit every k-th frame as its own
    row (one input row -> N frame rows).

    Plumbing is real — Arrow-batched iterator, explode-shaped output schema,
    frame index + byte-offset metadata; the codec is stubbed (``fake=True``
    treats every ``every_n_bytes`` slice as a "frame" and hashes it).  At
    scale the fan-out happens executor-side with no shuffle; downstream
    per-frame feature extraction partitions on (doc, frame).
    """
    if not fake:
        raise NotImplementedError(
            "video codecs (pyav/ffmpeg) not installed in this environment; "
            "pass fake=True for the deterministic test path")

    def run(batches):
        for pdf in batches:
            out = {"doc": [], "frame_idx": [], "byte_offset": [], "frame_sha": []}
            for _, row in pdf.iterrows():
                b = bytes(row[payload_col])
                for i in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    off = i * every_n_bytes
                    out["doc"].append(row[id_col])
                    out["frame_idx"].append(i)
                    out["byte_offset"].append(off)
                    out["frame_sha"].append(
                        hashlib.sha256(b[off:off + every_n_bytes]).hexdigest())
            import pandas as pd
            yield pd.DataFrame(out).rename(columns={"doc": id_col})

    schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("byte_offset", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ])
    return df.select(id_col, payload_col).mapInPandas(run, schema)


def resize_meta(df: DataFrame, target_w: int, target_h: int,
                meta_col: str = "media_meta") -> DataFrame:
    """Record a resize intent in metadata (JVM-side — the actual pixel work
    happens in the decode stage's pandas iterator when codecs exist).
    Demonstrates typed-metadata evolution without touching payload bytes —
    column pruning still drops the payload for metadata-only readers."""
    return df.withColumn(
        meta_col,
        F.struct(
            F.col(f"{meta_col}.modality").alias("modality"),
            F.col(f"{meta_col}.n_bytes").alias("n_bytes"),
            F.col(f"{meta_col}.sha256").alias("sha256"),
            F.lit(target_w).alias("target_w"),
            F.lit(target_h).alias("target_h"),
        ))


def attach_audio(df: DataFrame, source_col: str, sample_rate: int = 16000,
                 payload_col: str = "payload") -> DataFrame:
    """Audio-modality variant of attach_binary: payload + typed audio
    metadata (sample rate, estimated duration from byte length — the stub
    assumes 16-bit mono PCM; a real decoder would read the container
    header in the mapInPandas stage)."""
    payload = F.encode(F.col(source_col), "UTF-8") if \
        dict(df.dtypes)[source_col] == "string" else F.col(source_col)
    n_bytes = F.octet_length(payload)
    return df.withColumn(payload_col, payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("audio").alias("modality"),
            n_bytes.alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
            F.lit(sample_rate).alias("sample_rate"),
            F.round(n_bytes / (2 * sample_rate), 6).alias("est_duration_s"),
        ))
