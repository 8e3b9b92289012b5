"""kstream_spark — a PySpark-native analytics/stream-processing engine with the
query & data-processing capabilities of tryfix/kstream (Kafka Streams for Go).

This is NOT a port: the reference's topology tree / worker pool / changelog
machinery (see /root/reference/kstream/topology/node.go, worker_pool/pool.go,
changelog/) *is* Spark's runtime here.  We expose a thin DSL that builds
DataFrame lineage and lets Catalyst/Tungsten pick the physical plan, plus a
large-scale data-pipeline superset (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB operation.

Layout:
    session       -- SparkSession factory tuned for local[32] and cluster use
    builder       -- StreamBuilder: sources -> Stream / GlobalTable
    stream        -- Stream: filter/select_key/transform/branch/joins/to
    global_table  -- latest-by-key materialization (tombstones, versions)
    stores        -- named store registry + interactive query surface
    operators/    -- branch, joins, windows, dedup, similarity, text, multimodal
    functions/    -- reusable Column helpers (hashing, shingles, vectors)
    streaming/    -- Structured Streaming runner, materializer, DLQ, dedup
    plans/        -- plan inspection helpers (pushdown/broadcast assertions)
"""

from kstream_spark.session import get_spark
from kstream_spark.builder import StreamBuilder
from kstream_spark.stream import Stream
from kstream_spark.global_table import GlobalTable
from kstream_spark.stores.registry import StoreRegistry

__all__ = [
    "get_spark",
    "StreamBuilder",
    "Stream",
    "GlobalTable",
    "StoreRegistry",
]

__version__ = "0.1.0"
