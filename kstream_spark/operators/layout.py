"""Storage-layout operators: Z-order (Morton) clustering keys for
multi-dimensional data skipping.

At 100 TB, which rows share a file decides how much a filtered scan reads:
parquet keeps min/max stats per row group, so clustering the write by an
interleaved-bit key gives BOTH dimensions locality — a filter on either
column prunes most files, where a plain sort only prunes its leading
column.  This is the same idea as Delta/Iceberg Z-ORDER, built here from
pure column expressions (shiftright/and/shiftleft sums — whole-stage
codegen, engine-portable, no UDF).

No reference analog: tryfix/kstream has no storage layer at all (state
lives in in-memory maps, backend/memory/memory.go:52-86).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(col_a: Column, col_b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative ints:
    bit i of a lands at 2i+1, bit i of b at 2i.  Columns are masked to
    ``bits`` first, so out-of-range values wrap rather than collide the
    high bits.  Disjoint bit positions mean plain addition == bitwise-or
    (keeps the expression portable to engines without a bitor aggregate).
    """
    a = col_a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    b = col_b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)),
                                 2 * i + 1))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)),
                                 2 * i))
    return reduce(lambda x, y: x + y, terms).cast("long")


def cluster_by_zorder(df: DataFrame, col_a: str, col_b: str,
                      num_files: int | None = None, bits: int = 16
                      ) -> DataFrame:
    """Range-partition + sort rows by their Z-key so a subsequent write
    yields files whose (col_a, col_b) bounding boxes are small — the write
    side of Z-order data skipping.  One range exchange (sampled bounds);
    pass ``num_files`` to control output file count explicitly.
    """
    keyed = df.withColumn("_zkey", zorder_key(F.col(col_a), F.col(col_b),
                                              bits))
    parts = [num_files] if num_files else []
    return (keyed.repartitionByRange(*parts, F.col("_zkey"))
            .sortWithinPartitions("_zkey"))


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      max_records_per_file: int | None = None) -> None:
    """Hive-layout partitioned write — the directory-level complement to
    Z-order's file-level skipping: a filter on a partition column prunes
    whole DIRECTORIES at planning time (PartitionFilters in the scan, zero
    IO for pruned partitions), where parquet min/max stats still cost a
    footer read per file.

    The 100 TB contract: partition by LOW-cardinality query-aligned
    columns (date, source, lang — hundreds to thousands of values), never
    by high-cardinality keys (a partition per user id = millions of tiny
    files, the classic small-file death).  ``max_records_per_file`` bounds
    file size within a partition without an extra repartition pass."""
    w = df.write.mode("overwrite")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.partitionBy(*partition_cols).parquet(path)
