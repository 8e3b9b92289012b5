"""Data-quality operators: one-pass column profiling, rule checks, and
referential-integrity audits.

The validation layer a training pipeline runs before trusting a new drop
of data.  Design for 100 TB:

  * ``profile`` computes EVERY column's metrics in ONE aggregation over
    the table (a single scan + one reduce stage — count/null-count/
    approx- or exact-distinct per column as parallel aggregate
    expressions), then unpivots the tiny result driver-side.  The naive
    per-column loop would scan the table once per column.
  * ``check`` is the same single-pass shape: each rule is a boolean
    expression summed as violations; adding a rule adds an expression,
    not a pass.
  * ``orphans`` is a left-anti join — broadcast when the parent's key set
    fits, shuffle otherwise (Spark/AQE decides from stats).

No reference analog (tryfix/kstream validates nothing — bad records are
user-callback errors routed to the DLQ, kstream/dlq/dlq.go:12-79); the
DLQ path complements these checks and both feed the same quarantine
pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None,
            exact_distinct: bool = True) -> DataFrame:
    """Per-column (col_name, n_rows, n_null, n_distinct) computed in ONE
    pass.  ``exact_distinct=False`` swaps count_distinct for HLL
    approx_count_distinct — at 100 TB exact distinct of a high-cardinality
    column is a giant shuffle; the sketch is one fixed-size buffer per
    column per task."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    distinct = (F.count_distinct if exact_distinct
                else F.approx_count_distinct)
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    .cast("long").alias(f"_null_{c}"))
        aggs.append(distinct(F.col(c)).cast("long").alias(f"_dist_{c}"))
    row = df.agg(*aggs)
    # unpivot the 1-row wide result into (col_name, metrics) — tiny, local
    pairs = []
    for c in cols:
        pairs.append(F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").cast("long").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_null"),
            F.col(f"_dist_{c}").alias("n_distinct")))
    return (row.select(F.explode(F.array(*pairs)).alias("p"))
            .select("p.col_name", "p.n_rows", "p.n_null", "p.n_distinct"))


def check(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Rule violations in one pass: ``rules`` maps rule name -> boolean
    Column that is TRUE when the row VIOLATES the rule.  Returns
    (rule, n_violations) including zero rows — a report, not a filter."""
    aggs = [F.sum(F.when(expr, 1).otherwise(0)).cast("long").alias(name)
            for name, expr in rules.items()]
    row = df.agg(*aggs)
    pairs = [F.struct(F.lit(name).alias("rule"),
                      F.col(name).alias("n_violations"))
             for name in rules]
    return (row.select(F.explode(F.array(*pairs)).alias("p"))
            .select("p.rule", "p.n_violations"))


def quarantine(df: DataFrame, rules: dict[str, Column]
               ) -> tuple[DataFrame, DataFrame]:
    """Split rows into (clean, quarantined): quarantined rows carry a
    ``violated`` array naming every failed rule — the batch analog of the
    streaming DLQ (streaming/core.route_errors)."""
    flags = F.array_compact(F.array(*[
        F.when(expr, F.lit(name)).otherwise(F.lit(None))
        for name, expr in rules.items()]))
    tagged = df.withColumn("violated", flags)
    clean = tagged.filter(F.size("violated") == 0).drop("violated")
    bad = tagged.filter(F.size("violated") > 0)
    return clean, bad


def orphans(child: DataFrame, child_key: str, parent: DataFrame,
            parent_key: str) -> DataFrame:
    """Referential-integrity audit: child rows whose key has no parent
    (left-anti join; AQE broadcasts the parent key set when small)."""
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return child.join(keys, child_key, "left_anti")


def drift_psi(ref: DataFrame, cur: DataFrame, bucket_col,
              group_cols: list[str] | None = None,
              n_buckets: int = 10) -> DataFrame:
    """Population Stability Index between a REFERENCE snapshot and the
    CURRENT one — the standard drift alarm a pipeline runs before
    retraining on a new corpus version (PSI > 0.25 = major shift).

    ``bucket_col``: an integer Column mapping each row to a bucket id
    (use an EXACT integer bucketizer — e.g. bit-length of a count, the
    corpus_stats trick — never floor(log(x)): libm ulp differences at
    bucket boundaries would make engines disagree).  Laplace smoothing
    (+1 per bucket over ``n_buckets`` possible buckets) keeps empty
    buckets finite and every probability an exact ratio of integers.

    Per (group, bucket): count_ref, count_cur, and the PSI contribution
    (p_cur - p_ref) * ln(p_cur / p_ref) in rounded integer micro units —
    integer per-bucket terms sum order-insensitively to the headline PSI.

    Plan shape: one aggregation per side over (group, bucket), a
    broadcast-sized per-group totals join (groups x 1 rows), one
    full-outer bucket join of two bucket-count relations (each at most
    groups x n_buckets rows).  The event scans never shuffle more than
    their bucket counts.
    """
    gcols = list(group_cols or [])
    cr = bucket_counts(ref, bucket_col, gcols, "count_ref")
    cc = bucket_counts(cur, bucket_col, gcols, "count_cur")
    return drift_psi_from_counts(cr, cc, gcols, n_buckets)


def bucket_counts(df: DataFrame, bucket_col, gcols: list[str],
                  name: str) -> DataFrame:
    """(group..., bucket, <name>) counts — the persistable snapshot the
    streaming drift monitor stores as its reference."""
    return (df.select(*gcols, bucket_col.alias("bucket"))
            .groupBy(*gcols, "bucket")
            .agg(F.count("*").cast("long").alias(name)))


def drift_psi_from_counts(cr: DataFrame, cc: DataFrame, gcols: list[str],
                          n_buckets: int = 10) -> DataFrame:
    """PSI from two pre-aggregated bucket-count relations (the shared
    core of drift_psi and streaming/quality.drift_stream).  ``cr``
    carries count_ref, ``cc`` count_cur."""
    tr = cr.groupBy(*gcols).agg(F.sum("count_ref").alias("_n_count_ref"))
    tc = cc.groupBy(*gcols).agg(F.sum("count_cur").alias("_n_count_cur"))
    keys = gcols + ["bucket"]
    both = (cr.join(cc, keys, "full_outer")
            .fillna(0, subset=["count_ref", "count_cur"]))
    if gcols:
        # left + fillna: a group present in only one snapshot still gets
        # a finite smoothed probability on the empty side
        both = (both.join(F.broadcast(tr), gcols, "left")
                .join(F.broadcast(tc), gcols, "left")
                .fillna(0, subset=["_n_count_ref", "_n_count_cur"]))
    else:
        # the ungrouped agg emits one row with a NULL sum over an empty
        # side — fillna keeps parity with the grouped branch's smoothing
        both = (both.join(F.broadcast(tr)).join(F.broadcast(tc))
                .fillna(0, subset=["_n_count_ref", "_n_count_cur"]))
    pr = (F.col("count_ref") + 1) / (F.col("_n_count_ref") + n_buckets)
    pc = (F.col("count_cur") + 1) / (F.col("_n_count_cur") + n_buckets)
    psi = F.round((pc - pr) * F.log(pc / pr) * 1e6, 0).cast("long")
    return both.select(*gcols, "bucket", "count_ref", "count_cur",
                       psi.alias("psi_micro"))


def key_skew(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """Join-key skew profile — the operational pre-check before a large
    join: the ``top_n`` heaviest keys with their corpus share, next to
    the table's total/distinct counts, so a pipeline can decide between
    the plain join, AQE skew handling, and ``util.skew_join`` (whose
    ``hot_keys`` argument this output feeds directly).

    Returns (key, cnt, share_ppm, rank, n_rows, n_keys): share_ppm is
    the round-half-up integer parts-per-million via pure BIGINT
    arithmetic ((2e6*cnt + n) div (2n) — no float division, identical
    in any engine).

    Scale shape: ONE map-side-combinable count keyed on the join key
    (the wire carries distinct keys per task, not rows), a TakeOrdered
    top-n (no full sort of the key space), and a 1-row broadcast of the
    totals.  Cost is the same partial-aggregate scan the join's shuffle
    would do anyway — run it on a sample for a cheaper estimate
    (``df.sample(...)`` composes, exactly how skew_join's estimator
    samples)."""
    from pyspark.sql import Window as W
    counts = (df.groupBy(F.col(key_col).alias("key"))
              .agg(F.count("*").cast("long").alias("cnt")))
    tot = counts.agg(F.sum("cnt").cast("long").alias("n_rows"),
                     F.count("*").cast("long").alias("n_keys"))
    top = (counts.orderBy(F.desc("cnt"), F.asc("key")).limit(top_n)
           .withColumn("rank", F.row_number().over(
               W.orderBy(F.desc("cnt"), F.asc("key"))).cast("long")))
    return (top.join(F.broadcast(tot))
            .select("key", "cnt",
                    F.expr("(2000000 * cnt + n_rows) div (2 * n_rows)")
                    .alias("share_ppm"),
                    "rank", "n_rows", "n_keys"))
