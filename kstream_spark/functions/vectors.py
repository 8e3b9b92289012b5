"""Vector Column helpers over array<float>/array<double> embedding columns.

JVM-side expressions (zip_with / aggregate / sqrt) — no Python UDF in the hot
path; whole-stage codegen applies.  Computation is promoted to double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    a, b = as_double(a), as_double(b)
    return dot(a, b) / (norm(a) * norm(b))
