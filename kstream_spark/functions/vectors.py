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


def lit_doubles(vals) -> Column:
    """array<double> literal built in ONE py4j round trip (r13).

    ``F.lit(list)`` recurses element-by-element through py4j — a 16x64
    centroid matrix cost ~0.9 s of socket round trips PER QUERY
    CONSTRUCTION (cProfile: 1269 ``lit`` calls inside
    cell_cosine_scores), pure driver overhead the bench pays every run.
    One ``F.expr`` string with D-suffixed shortest-repr doubles builds
    the IDENTICAL literal JVM-side: Python ``repr`` emits the shortest
    decimal that round-trips to the exact double, and Java's
    ``Double.parseDouble`` of that string returns the same bits
    (verified bit-identical over gauss/subnormal/huge/negative-zero
    values).  Non-finite values (no caller produces them) fall back to
    the element-wise path, which handles them today."""
    import math
    vals = [float(v) for v in vals]
    if not vals or not all(math.isfinite(v) for v in vals):
        return F.lit(vals)
    return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")


def lit_double_matrix(rows) -> Column:
    """array<array<double>> literal in one py4j round trip — see
    lit_doubles."""
    import math
    rows = [[float(v) for v in r] for r in rows]
    if not rows or not all(math.isfinite(v) for r in rows for v in r):
        return F.lit(rows)
    return F.expr("array(" + ",".join(
        "array(" + ",".join(f"{v!r}D" for v in r) + ")" for r in rows) + ")")


def cell_cosine_scores(v: Column, vnorm: Column, centroids: list) -> Column:
    """Round-6 cosine of ``v`` against every row of a LITERAL centroid
    matrix — the IVF cell-assignment scores — as one constant-size
    expression: the matrix and the precomputed centroid norms ride as
    single nested Literals and the per-cell score is a ``transform``
    over them.  The previous unrolled form (an F.array of n_cells
    separate dot expressions, each holding dim literal nodes) cost
    ~0.35s of per-run analysis/optimization at n_cells=8 x dim=64,
    measured min-of-5 at sf0.1 — pure driver-side plan overhead that
    bench pays on every run.  Arithmetic is bit-identical: same
    left-fold dot, same driver-side float centroid norm, same round-6;
    ties still resolve by array_position's first match downstream."""
    import math
    cmat = lit_double_matrix(centroids)
    cn = lit_doubles([math.sqrt(sum(float(x) * float(x) for x in c))
                      for c in centroids])
    return F.transform(
        cmat,
        lambda cv, i: F.round(
            dot(v, cv)
            / (vnorm * F.element_at(cn, (i + F.lit(1)).cast("int"))), 6))
