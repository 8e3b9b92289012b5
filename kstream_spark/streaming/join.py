"""Stateful streaming stream-stream join with REFERENCE semantics.

Ref: kstream/processors/join/side_joiner.go:54-93 + join/window.go:5-29 —
each side buffers every record in an unbounded per-key map; an arriving left
record joins against ALL buffered right records (and vice versa); entries
are never evicted, not even on match.

Spark's built-in stream-stream join requires watermarks and time bounds
(operators/joins.py documents the delta).  This module closes that delta
with a custom stateful operator: both streams are tagged and unioned, then
``applyInPandasWithState`` keeps the two per-key buffers in keyed state and
emits the cross-matches exactly as the reference's SideJoiner does.

State growth: O(records per key) — the reference has the same unbounded
growth (its maps leak identically); ``ttl_ms`` bounds it with a per-key
processing-time timeout for production use (the recommended mode at scale;
None reproduces the reference exactly).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tag_sides(left: DataFrame, right: DataFrame, key: str,
              left_payload: list[str], right_payload: list[str]) -> DataFrame:
    """Union-tag the two streams: (key, side, payload_json)."""
    l = left.select(
        F.col(key).alias("k"), F.lit("L").alias("side"),
        F.to_json(F.struct(*left_payload)).alias("payload"))
    r = right.select(
        F.col(key).alias("k"), F.lit("R").alias("side"),
        F.to_json(F.struct(*right_payload)).alias("payload"))
    return l.unionByName(r)


def stateful_stream_join(left: DataFrame, right: DataFrame, key: str,
                         left_payload: list[str], right_payload: list[str],
                         ttl_ms: int | None = None) -> DataFrame:
    """Unbounded-buffer stream-stream inner join (reference parity).

    Emits one row per (left record, right record) cross-match per key, in
    arrival order — matched entries STAY buffered and match again later
    (side_joiner.go keeps them; window.go never evicts).

    Output: (k, left_json, right_json).
    """
    tagged = tag_sides(left, right, key, left_payload, right_payload)

    out_schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("left_json", T.StringType()),
        T.StructField("right_json", T.StringType()),
    ])
    state_schema = T.StructType([
        T.StructField("lefts", T.ArrayType(T.StringType())),
        T.StructField("rights", T.ArrayType(T.StringType())),
    ])

    def update(pkey, pdfs, state: GroupState):
        (k,) = pkey
        if state.hasTimedOut:
            state.remove()
            return
        lefts, rights = state.get if state.exists else ([], [])
        lefts, rights = list(lefts), list(rights)
        out = {"k": [], "left_json": [], "right_json": []}
        for pdf in pdfs:
            # column-wise zip, not iterrows: per-row Series construction is
            # ~100x the cost of the buffer work itself at bench volumes
            for side, payload in zip(pdf["side"].to_numpy(),
                                     pdf["payload"].to_numpy()):
                if side == "L":
                    # new left joins against every buffered right
                    for rj in rights:
                        out["k"].append(k)
                        out["left_json"].append(payload)
                        out["right_json"].append(rj)
                    lefts.append(payload)
                else:
                    for lj in lefts:
                        out["k"].append(k)
                        out["left_json"].append(lj)
                        out["right_json"].append(payload)
                    rights.append(payload)
        state.update((lefts, rights))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out["k"]:
            yield pd.DataFrame(out)

    timeout = GroupStateTimeout.ProcessingTimeTimeout if ttl_ms is not None \
        else GroupStateTimeout.NoTimeout
    return tagged.groupBy("k").applyInPandasWithState(
        update, out_schema, state_schema, "append", timeout)


def parse_joined(df: DataFrame, left_schema: T.StructType,
                 right_schema: T.StructType) -> DataFrame:
    """Decode the json payloads back to typed columns."""
    return df.select(
        "k",
        F.from_json("left_json", left_schema).alias("l"),
        F.from_json("right_json", right_schema).alias("r"))
