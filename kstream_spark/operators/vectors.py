"""Embedding-vector transforms for similarity / retrieval pipelines.

L2 normalization (cosine becomes a plain dot product downstream) and
symmetric int8 quantization (4x memory + bandwidth reduction for ANN at
100 TB — the standard first compression step before IVF/PQ indexing).

Everything stays inside whole-stage codegen: higher-order array functions
(`transform` / `aggregate`) over the embedding column — no UDF, no shuffle,
no explode.  Values are rounded where emitted so results are engine-exact
(the [[oracle-parity]] discipline: IEEE sqrt/divide of identical inputs is
bit-identical; rounding kills fold-order noise in the sums).

No reference analog: tryfix/kstream carries opaque bytes and leaves all
math to user callbacks (kstream/encoding/encoder.go:10-15); this module is
part of the training-data capability superset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_sum(vec: Column) -> Column:
    return F.aggregate(vec, F.lit(0.0),
                       lambda a, x: a + x.cast("double") * x.cast("double"))


def l2_normalize(df: DataFrame, vec_col: str, out_col: str = "unit",
                 norm_col: str = "norm") -> DataFrame:
    """Attach the L2 norm (rounded 6) and the unit vector (components
    rounded 6).  Zero vectors normalize to zeros, not NaN."""
    vec = F.col(vec_col)
    # materialize the norm BEFORE the per-component lambda references it:
    # an outer aggregate referenced inside a higher-order lambda is
    # re-evaluated per element (O(dim^2) folds per vector; 3.3x measured
    # at dim 64 — same hazard as operators/dedup.py winnow_pairs)
    df = df.withColumn(norm_col, F.round(F.sqrt(_sq_sum(vec)), 6))
    norm = F.col(norm_col)
    unit = F.when(norm > 0,
                  F.transform(vec, lambda x: F.round(x.cast("double") / norm, 6))
                  ).otherwise(F.transform(vec, lambda x: F.lit(0.0)))
    return df.withColumn(out_col, unit)


def quantize_int8(df: DataFrame, vec_col: str, scale_col: str = "scale",
                  out_col: str = "qvec") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x| / 127
    (rounded 9 so every engine divides by the identical double), component
    q = round(x / scale) in [-127, 127].  Zero vectors get scale 0 and an
    all-zero code.  Dequantize with q * scale; cosine on dequantized
    vectors tracks exact cosine to ~1e-2 at dim 64 (tests assert this).
    """
    vec = F.col(vec_col)
    maxabs = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    # materialized before the lambda references it — see l2_normalize
    df = df.withColumn(scale_col, F.round(maxabs / 127.0, 9))
    scale = F.col(scale_col)
    qvec = F.when(scale > 0,
                  F.transform(vec, lambda x: F.round(x.cast("double") /
                                                     scale, 0).cast("long"))
                  ).otherwise(F.transform(vec, lambda x: F.lit(0).cast("long")))
    return df.withColumn(out_col, qvec)


def dequantize(qvec: Column, scale: Column) -> Column:
    """Inverse of quantize_int8 (lossy): component x ~= q * scale."""
    return F.transform(qvec, lambda q: q.cast("double") * scale)
