"""Joins: lookup (stream–global-table) and stream–stream.

Ref:
  J1 lookup join   kstream/processors/join/global_table_joiner.go:11-132
                   (Join: 94-124; inner-miss => error, lines 109-113)
  J2 stream join   kstream/k_stream.go:383-516, join/side_joiner.go:9-108,
                   join/stream_joiner.go:8-73, join/window.go:1-29
  join types       kstream/processors/join/joiner.go:10-13 (Left|Inner)
  repartitioning   kstream/processors/join/repartition.go:16-85

Scale notes (the part the reference cannot do):
  * Lookup joins take ``table.lookup_relation()`` which is broadcast-hinted —
    at 100 TB fact scale the dimension broadcasts and the fact side never
    shuffles.  For non-broadcastable dims AQE picks shuffle-hash vs sort-merge.
  * The DLQ path computes matches and misses off ONE left-outer join (single
    probe of the hash table), then splits by null-ness of the right key —
    no second join, no second shuffle.
  * Stream-stream joins are equi-joins on the key plus an optional time-bound
    (interval join).  The reference buffers both sides forever
    (join/window.go:5-29 — unbounded map, no eviction); unbounded state does
    not survive at scale, so the engine requires/encourages ``within`` and, in
    streaming mode, watermarks.  COMPAT DELTA: with ``within=None`` in batch
    we reproduce the unbounded semantics exactly; in streaming a watermark is
    mandatory (Spark requirement) and late rows beyond it are dropped.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DLQ:
    """Dead-letter queue collecting records that failed an operator.

    Ref: kstream/dlq/dlq.go:12-79 — failed records produce to a DLQ topic
    (global or per-topic).  Batch mapping: failed rows accumulate as DataFrame
    lineage; ``df()`` unions them, a streaming sink writes them per batch.
    """

    def __init__(self, name: str = "dlq"):
        self.name = name
        self._parts: list[DataFrame] = []

    def add(self, df: DataFrame, reason: str) -> None:
        self._parts.append(df.withColumn("dlq_reason", F.lit(reason)))

    def df(self) -> DataFrame | None:
        if not self._parts:
            return None
        out = self._parts[0]
        for p in self._parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out


def join_global_table(stream, table, on, how: str = "inner", dlq: DLQ | None = None,
                      select: Sequence | None = None):
    """Per-record lookup into a GlobalTable.

    ``on``: FK column name on the stream (joined to the table's key), or a
    full join Column.  ``KeyMapper`` (FK extraction, joiner.go:20) is the
    caller computing the FK column; ``ValueMapper`` is ``select``.

    how='inner' + dlq: reference treats a missing right side as a per-record
    ERROR (retry -> DLQ), not a silent drop (global_table_joiner.go:109-113).
    We probe once with a left join and split on right-key null-ness.
    """
    right = table.lookup_relation()
    right_key = table.key[0]
    if isinstance(on, Column):
        cond = on
    else:
        cond = stream.df[on] == right[right_key]

    if how == "left" or dlq is None:
        joined = stream.df.join(right, cond, "left" if how == "left" else how)
        if select is not None:
            joined = joined.select(*select)
        return stream._derive(joined, name=f"{stream.name}⋈{table.name}")

    # inner with DLQ: ONE left-outer probe, split by match-ness.
    marked = right.withColumn("__rk_matched", F.lit(True))
    probed = stream.df.join(marked, cond, "left")
    matched = probed.filter(F.col("__rk_matched").isNotNull()).drop("__rk_matched")
    missed = probed.filter(F.col("__rk_matched").isNull()).select(*stream.df.columns)
    dlq.add(missed, reason=f"inner lookup miss: {table.name}")
    if select is not None:
        matched = matched.select(*select)
    return stream._derive(matched, name=f"{stream.name}⋈{table.name}")


def join_stream(left, right, on, within=None, ts_col: str = "ts", how: str = "inner",
                select: Sequence | None = None):
    """Stream-stream join on key, optional time bound.

    ``on``: key column name present on both sides, or a join Column.
    ``within``: None (unbounded — reference parity, batch only) or a string
    like "10 minutes" / a pair (lower, upper) bounding
    ``right.ts - left.ts``  ∈ [-lower, +upper].
    """
    l = left.df.alias("l")
    r = right.df.alias("r")
    if isinstance(on, Column):
        cond = on
    else:
        cond = F.col(f"l.{on}") == F.col(f"r.{on}")

    if within is not None:
        if isinstance(within, str):
            lower = upper = within
        else:
            lower, upper = within
        lts, rts = F.col(f"l.{ts_col}"), F.col(f"r.{ts_col}")
        cond = cond & (rts >= lts - F.expr(f"INTERVAL {lower}")) \
                    & (rts <= lts + F.expr(f"INTERVAL {upper}"))

    joined = l.join(r, cond, how)
    if select is not None:
        joined = joined.select(*select)
    return left._derive(joined, name=f"{left.name}⋈{right.name}")
