"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Query implementations live in ``kstream_spark.inventory`` (one entry per
operator from SURVEY.md §2, plus the data-pipeline superset).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the example_1 pipeline analog (branch -> filter -> chained
    lookup joins -> project; ref examples/example_1/stream/account_credited.go:44-63)
    on /root/testdata/sf0.001."""
    from kstream_spark.inventory import q_star_join
    return q_star_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kstream_spark.inventory import INVENTORY
    return {name: fn for name, (fn, _sql) in INVENTORY.items()}


def oracle_sql() -> dict[str, str]:
    from kstream_spark.inventory import INVENTORY
    return {name: sql for name, (_fn, sql) in INVENTORY.items() if sql is not None}
