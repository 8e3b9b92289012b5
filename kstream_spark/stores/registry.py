"""Named store registry + interactive query surface.

Ref:
  Store iface      kstream/store/store.go:20-31 (Set/Get/GetRange/GetAll/Delete,
                   per-record TTL store.go:119-149)
  IndexedStore     kstream/store/indexed_store.go:16-33,59-160
  StateStore       kstream/store/state_store.go:10-69
  Registry         kstream/store/registry.go:12-63
  HTTP query layer kstream/store/http.go:120-401 (list stores, full scan,
                   point lookup, index lookup)
  Backend          backend/backend.go:16-28, backend/memory/memory.go:52-100

Spark-first: a "store" is a named latest-by-key DataFrame (compacted with the
GlobalTable machinery) registered as a temp view — every store is instantly
queryable with full Spark SQL, which supersedes the reference's HTTP
scan/point/index endpoints.  Secondary indexes need no maintenance: a filter
on any column IS the index lookup (Catalyst prunes/pushes down); for
repeated hot lookups ``cache()`` the store.

TTL (store.go:25, memory cleaner memory.go:88-100): rows carry an expiry
timestamp; reads filter ``expiry > now`` — lazy expiry, same observable
semantics as the reference's background cleaner.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kstream_spark.global_table import compact_latest


class Store:
    """A named latest-by-key KV relation with the reference Store surface."""

    def __init__(self, name: str, df: DataFrame, key: str | Sequence[str],
                 ttl_col: str | None = None):
        self.name = name
        self.key = [key] if isinstance(key, str) else list(key)
        self.ttl_col = ttl_col
        self._df = df

    def _live(self) -> DataFrame:
        if self.ttl_col:
            return self._df.filter(
                F.col(self.ttl_col).isNull()
                | (F.col(self.ttl_col) > F.current_timestamp())
            )
        return self._df

    # ref: store.go Get / GetRange / GetAll
    def get(self, key_value) -> DataFrame:
        return self._live().filter(F.col(self.key[0]) == F.lit(key_value))

    def get_range(self, lo, hi) -> DataFrame:
        k = F.col(self.key[0])
        return self._live().filter((k >= F.lit(lo)) & (k <= F.lit(hi)))

    def get_all(self) -> DataFrame:
        return self._live()

    # ref: indexed_store.go GetIndexedRecords(index, key) — a filter IS the
    # index lookup in Spark; no maintained secondary structure needed.
    def get_indexed(self, index_col: str, value) -> DataFrame:
        return self._live().filter(F.col(index_col) == F.lit(value))

    # ref: indexed_store.go Indexes() — in the Spark model every non-key
    # column supports an index lookup (the filter IS the index, pushed to
    # the scan), so the listing is the schema minus the key
    def indexes(self) -> list[str]:
        return sorted(c for c in self._df.columns if c not in self.key)

    def df(self) -> DataFrame:
        return self._live()


class StoreRegistry:
    """Process-global name -> store map.  Ref: store/registry.go:12-63.

    ``materialize`` is the write path (ref processors/materializer.go:65-94):
    it compacts the incoming change-set to latest-per-key (version-gated) and
    registers/updates the named store; re-materializing the same store merges
    with previous contents via union + re-compaction (the batch analog of the
    upsert, MERGE-free since the container has no Delta jars).
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._stores: dict[str, Store] = {}

    def materialize(self, name: str, df: DataFrame, key: str | Sequence[str],
                    version: str | None = None,
                    tombstone: Column | str | None = None,
                    ttl_col: str | None = None) -> Store:
        keys = [key] if isinstance(key, str) else list(key)
        if name in self._stores:
            prev = self._stores[name]._df
            df = prev.unionByName(df, allowMissingColumns=True)
        compacted = compact_latest(df, keys, version=version, tombstone=tombstone)
        store = Store(name, compacted, keys, ttl_col=ttl_col)
        self._stores[name] = store
        compacted.createOrReplaceTempView(name)
        return store

    def store(self, name: str) -> Store:
        # ref: registry.go:115-125 — unknown store is an error
        return self._stores[name]

    def stores(self) -> list[str]:
        # ref: http.go GET /stores
        return sorted(self._stores)

    def indexes(self) -> dict[str, list[str]]:
        # ref: http.go GET /indexes (registry.Indexes(), http.go:138-147) —
        # store name -> its index-able (non-key) columns
        return {name: self._stores[name].indexes()
                for name in sorted(self._stores)}

    def sql(self, query: str) -> DataFrame:
        """Interactive query surface (supersedes ref store/http.go REST API)."""
        return self.spark.sql(query)


class PersistentStoreRegistry(StoreRegistry):
    """Registry with a disk-backed snapshot per store.

    Ref: the rocksdb backend the reference stubs out entirely
    (backend/rocks/rocks.go:10-302 is 100% commented out) and the
    local-offset resume path (global_table_stream_instance.go:93-98) —
    here: every materialize also writes a parquet snapshot, and ``load``
    restores stores after a restart.  Snapshots are partitioned-overwrite
    parquet — at scale this is the same pattern as a Delta/Iceberg table
    without the transaction log (the container has no lake-format jars).
    """

    def __init__(self, spark: SparkSession, root: str):
        super().__init__(spark)
        self.root = root.rstrip("/")
        self._epochs: dict[str, int] = {}

    def _latest_epoch(self, name: str) -> int | None:
        import glob
        import os
        dirs = glob.glob(f"{self.root}/{name}/epoch=*")
        if not dirs:
            return None
        return max(int(os.path.basename(d).split("=")[1]) for d in dirs)

    def materialize(self, name, df, key, version=None, tombstone=None,
                    ttl_col=None) -> Store:
        store = super().materialize(name, df, key, version=version,
                                    tombstone=tombstone, ttl_col=ttl_col)
        # epoch-versioned snapshot: a NEW directory per materialization, so
        # the write never clobbers the files the incoming lineage reads from
        # (the previous store may point at the prior snapshot)
        epoch = self._epochs.get(name, self._latest_epoch(name) or 0) + 1
        self._epochs[name] = epoch
        path = f"{self.root}/{name}/epoch={epoch}"
        store._df.write.mode("overwrite").parquet(path)
        # re-point the store at the snapshot: downstream reads hit the
        # materialized files, not the (possibly long) upstream lineage
        reloaded = self.spark.read.parquet(path)
        self._stores[name] = Store(name, reloaded, store.key, ttl_col=ttl_col)
        reloaded.createOrReplaceTempView(name)
        return self._stores[name]

    def load(self, name: str, key, ttl_col: str | None = None) -> Store:
        """Restore a store from its latest snapshot (restart path)."""
        epoch = self._latest_epoch(name)
        if epoch is None:
            raise KeyError(f"no snapshot for store: {name}")
        self._epochs[name] = epoch
        df = self.spark.read.parquet(f"{self.root}/{name}/epoch={epoch}")
        keys = [key] if isinstance(key, str) else list(key)
        store = Store(name, df, keys, ttl_col=ttl_col)
        self._stores[name] = store
        df.createOrReplaceTempView(name)
        return store
