"""Deterministic sampling / splitting for training-data pipelines.

``rand()``-based sampling is not reproducible across retries, re-partitions
or engines; hash-based assignment is — the split of a given record is a pure
function of its id, so reruns, incremental appends, and different engines
all agree.  Buckets come from the first 8 hex chars of md5(id) (portable,
oracle-exact: functions/text.hash_str discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(id_col: Column, buckets: int = 100, seed: str = "split") -> Column:
    """Stable bucket in [0, buckets) from md5 of the id (engine-portable)."""
    h = F.md5(F.encode(F.concat(F.lit(f"{seed}:"), id_col.cast("string")),
                       "UTF-8"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets)


def train_val_split(df: DataFrame, id_col: str, val_pct: int = 10,
                    test_pct: int = 0, seed: str = "split") -> DataFrame:
    """Assign each row a deterministic split label: train / val / test.

    Percentages are over 100 hash buckets; assignment is stable under
    reruns and incremental data arrival (a doc never migrates splits).
    """
    b = hash_bucket(F.col(id_col), 100, seed)
    label = (F.when(b < val_pct, "val")
             .when(b < val_pct + test_pct, "test")
             .otherwise("train"))
    return df.withColumn("split", label)


def deterministic_sample(df: DataFrame, id_col: str, pct: int,
                         seed: str = "sample") -> DataFrame:
    """Keep a stable pct% sample by id hash (same rows every run/engine)."""
    return df.filter(hash_bucket(F.col(id_col), 100, seed) < pct)


def domain_mix(df: DataFrame, id_col: str, domain_col: str,
               seed: str = "mix") -> DataFrame:
    """Temperature-based domain rebalancing (the multilingual-corpus
    standard: sample domain d with probability ∝ p_d^α, here α = 1/2).

    Down-samples over-represented domains: the rarest domain keeps every
    document and domain d keeps a deterministic ``sqrt(n_min / n_d)``
    fraction, chosen by id-hash bucket — stable under reruns, incremental
    appends, and engine swaps.  α is fixed at 1/2 because IEEE ``sqrt`` is
    correctly rounded (bit-identical in every engine) while ``pow`` is not;
    other temperatures would trade oracle-exactness for flexibility.

    Returns the kept rows with (keep_frac, n_domain) attached.

    Scale: domain counts are one combiner-friendly aggregation on a
    low-cardinality key; the resulting tiny weight table broadcast-joins
    back, so the corpus itself is filtered in the scan stage — no corpus
    shuffle at 100 TB.
    """
    from pyspark.sql import Window as W
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_domain"))
    weights = counts.withColumn(
        "_n_min", F.min("n_domain").over(W.partitionBy()))
    weights = weights.select(
        domain_col, "n_domain",
        F.round(F.sqrt(F.col("_n_min") / F.col("n_domain")), 6)
        .alias("keep_frac"))
    thresh = F.floor(F.col("keep_frac") * 1000000).cast("long")
    b = hash_bucket(F.col(id_col), 1000000, seed)
    return (df.join(F.broadcast(weights), domain_col)
            .filter(b < thresh))


def token_budget(df: DataFrame, id_col: str, domain_col: str,
                 tokens_col: str, budget: int, seed: str = "budget"
                 ) -> DataFrame:
    """Keep documents per domain, in deterministic hash order, until the
    domain's cumulative token count reaches ``budget`` — the "N tokens per
    source" corpus recipe, reproducible across reruns and engines.

    A document is kept if the running total INCLUDING it is ≤ budget, plus
    the first document of every domain (so a budget smaller than the first
    doc still yields data — standard greedy fill).

    Scale: one shuffle keyed on the domain (low cardinality → salt jumbo
    domains upstream if needed) + an in-partition running sum; the corpus
    is never globally sorted.
    """
    from pyspark.sql import Window as W
    h = F.md5(F.encode(F.concat(F.lit(f"{seed}:"),
                                F.col(id_col).cast("string")), "UTF-8"))
    w = W.partitionBy(domain_col).orderBy(h.asc(), F.col(id_col).asc())
    cum = F.sum(tokens_col).over(w).cast("long")
    rn = F.row_number().over(w)
    return (df.withColumn("cum_tokens", cum)
            .withColumn("_rn", rn)
            .filter((F.col("cum_tokens") <= budget) | (F.col("_rn") == 1))
            .drop("_rn"))


def stratified_cap(df: DataFrame, id_col: str, strat_col: str,
                   cap: int = 10, seed: str = "strat") -> DataFrame:
    """Keep at most ``cap`` rows per stratum, chosen by deterministic hash
    rank (md5 of the id) — balanced downsampling for skewed sources that is
    stable under reruns and engines (no rand()).

    One window per stratum = one shuffle on strat_col; at 100 TB prefer
    many strata (source, shard) so partitions stay bounded, and salt any
    jumbo stratum before the window."""
    from pyspark.sql import Window as W
    h = F.md5(F.encode(F.concat(F.lit(f"{seed}:"),
                                F.col(id_col).cast("string")), "UTF-8"))
    w = W.partitionBy(strat_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= cap).drop("rn"))


def group_split(df: DataFrame, group_col: str, val_pct: int = 10,
                test_pct: int = 0, seed: str = "gsplit",
                split_col: str = "split") -> DataFrame:
    """Leakage-safe train/val/test split: the split is a pure function of
    the GROUP (source domain, url host, dedup-cluster id), never the
    document — so near-duplicates and same-source documents always land in
    the SAME split, and holdout leakage through intra-group duplication is
    structurally impossible.  (train_val_split hashes the document id:
    two near-identical docs can land on opposite sides of the split, and
    the val metric silently trains on its own test set.)

    Same determinism contract as every sampler here: md5-bucketed, stable
    under reruns, incremental arrival, and engine swaps.  A projection —
    no shuffle, no group materialization."""
    b = hash_bucket(F.col(group_col), 100, seed)
    label = (F.when(b < val_pct, "val")
             .when(b < val_pct + test_pct, "test")
             .otherwise("train"))
    return df.withColumn(split_col, label)


def weighted_sample(df: DataFrame, id_col: str, weight_col: str,
                    n: int, seed: str = "wsample") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006): each row draws a reproducible uniform
    u from md5(id) and gets key = -ln(u) / w; the n SMALLEST keys are
    the sample — each row's inclusion probability is proportional to its
    weight, with no sequential pass and no rand().

    The standard use: upweight high-quality documents when subsampling a
    corpus to a token budget.  Scale shape: a pure projection + one
    global order-and-limit, which Spark executes as per-partition
    TakeOrdered (k rows per partition reach the driver-side merge) — no
    full sort at any size.  Deterministic across engines: u is an exact
    dyadic rational from the md5 prefix, keys round to 6 dp (ln is the
    one libm call — the same cross-engine tolerance text_tfidf's log
    has held across every sweep), ties break by id.  Non-positive
    weights are excluded (they can never win a draw)."""
    h = F.md5(F.encode(F.concat(F.lit(f"{seed}:"),
                                F.col(id_col).cast("string")), "UTF-8"))
    # u in (0, 1]: (first-8-hex + 1) / 2^32 — exact dyadic, never 0
    u = (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + 1) \
        / F.lit(4294967296.0)
    key = F.round(-F.log(u) / F.col(weight_col).cast("double"), 6)
    return (df.filter(F.col(weight_col) > 0)
            .withColumn("sample_key", key)
            .orderBy(F.asc("sample_key"), F.asc(id_col))
            .limit(n))
