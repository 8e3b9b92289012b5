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
