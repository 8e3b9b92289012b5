"""Custom stateful streaming operator: per-key latest value with TTL.

Ref: Store.Set(k, v, ttl) + the memory backend's expiry sweep
(kstream/store/store.go:119-149, backend/memory/memory.go:88-100) and the
version-gated writability check (global_table_stream_instance.go:236-268).

Spark mapping: ``applyInPandasWithState`` — keyed state holds (version,
payload-json); a processing-time timeout implements TTL eviction.  This is
the (b)-tier implementation from the custom-operator preference order
(composition of built-ins can't express per-key timers); the state payload
is deliberately tiny (one row per key) so state size is O(live keys), which
scales linearly with executors at 100 TB stream volume.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def latest_with_ttl(df: DataFrame, key_col: str, version_col: str,
                    payload_cols: list[str], ttl_ms: int | None = None) -> DataFrame:
    """Streaming latest-by-key with optional per-key TTL.

    Emits (key, version, payload_json, expired) rows on every update; when a
    key's TTL elapses with no updates, a tombstone row (expired=true) is
    emitted and state is dropped — the streaming analog of the reference's
    background cleaner deleting expired entries.
    """
    out_schema = T.StructType([
        T.StructField(key_col, T.LongType()),
        T.StructField("version", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("expired", T.BooleanType()),
    ])
    state_schema = T.StructType([
        T.StructField("version", T.LongType()),
        T.StructField("payload", T.StringType()),
    ])

    def update(key, pdfs, state: GroupState):
        (k,) = key
        if state.hasTimedOut:
            ver, payload = state.get
            state.remove()
            yield pd.DataFrame([{key_col: k, "version": ver, "payload": payload,
                                 "expired": True}])
            return
        best_ver, best_payload = state.get if state.exists else (None, None)
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                v = int(row[version_col])
                # ref writability rule: new version must exceed current
                if best_ver is None or v > best_ver:
                    best_ver = v
                    best_payload = json.dumps(
                        {c: (None if pd.isna(row[c]) else
                             (row[c].item() if hasattr(row[c], "item") else row[c]))
                         for c in payload_cols}, sort_keys=True, default=str)
        state.update((best_ver, best_payload))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame([{key_col: k, "version": best_ver,
                             "payload": best_payload, "expired": False}])

    timeout = GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None \
        else GroupStateTimeout.NoTimeout
    return df.groupBy(key_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", timeout)
