"""Approximate sketch operators (capability superset — nothing comparable in
the reference; standard warehouse sketches for 100 TB interactive analytics).

All are single-pass, mergeable aggregates (partial sketches combine on the
reduce side), so they scale as ordinary map-side-combined aggregations:
  hll_distinct       HyperLogLog++ distinct counts (relative error ~1/sqrt(2^p))
  approx_quantiles   Greenwald-Khanna quantiles with bounded rank error
  frequent_items     misra-gries style heavy hitters (df.stat.freqItems)
  count_min          count-min sketch column (mergeable binary sketch)
Exactness is probabilistic — tests assert error bounds against exact
answers; the driver records rows-only checks for the query entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_distinct(df: DataFrame, keys: list[str], col: str,
                 rsd: float = 0.02) -> DataFrame:
    """Approximate distinct count per group (HyperLogLog++)."""
    return (df.groupBy(*keys)
            .agg(F.approx_count_distinct(col, rsd).alias(f"approx_{col}"),
                 F.count("*").alias("n_rows")))


def approx_quantiles(df: DataFrame, keys: list[str], col: str,
                     probs: list[float] = (0.5, 0.95, 0.99),
                     accuracy: int = 10000) -> DataFrame:
    """Approximate quantiles per group (Greenwald-Khanna)."""
    aggs = [F.percentile_approx(col, p, accuracy).alias(f"q{int(p * 100)}")
            for p in probs]
    return df.groupBy(*keys).agg(*aggs)


def frequent_items(df: DataFrame, col: str, support: float = 0.05) -> DataFrame:
    """Heavy hitters with the given minimum support (single pass)."""
    return df.stat.freqItems([col], support)


def count_min(df: DataFrame, keys: list[str], col: str,
              eps: float = 0.01, confidence: float = 0.95,
              seed: int = 42) -> DataFrame:
    """Per-group count-min sketch (binary, mergeable downstream)."""
    return (df.groupBy(*keys)
            .agg(F.count_min_sketch(F.col(col), F.lit(eps), F.lit(confidence),
                                    F.lit(seed)).alias("cms")))


def hll_mergeable_distinct(df: DataFrame, keys: list[str], segment_col: str,
                           col: str, lg_k: int = 14) -> DataFrame:
    """Two-level mergeable distinct count (Apache DataSketches HLL): one
    sketch per (group, segment), then a LOSSLESS sketch union across
    segments per group.

    This is the 100 TB warehouse pattern the one-shot aggregate can't do:
    materialize a small per-partition/per-day sketch ONCE at ingest, then
    answer any cross-partition distinct question by unioning sketches —
    no re-scan of history, and the union is associative so partials
    combine map-side like any aggregate.  Returns (keys..., est,
    n_segments).
    """
    per_seg = df.groupBy(*keys, segment_col).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias("_sk"))
    return per_seg.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("est"),
        F.count("*").cast("long").alias("n_segments"))
