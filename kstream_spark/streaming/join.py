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

    Emits one row per (left record, right record) cross-match per key —
    matched entries STAY buffered and match again later (side_joiner.go
    keeps them; window.go never evicts).  Per micro-batch the emitted set
    is (new lefts x buffered rights) + (buffered lefts x new rights) +
    (new lefts x new rights): each pair appears exactly once, when the
    later of its two records arrives — the same set the reference's
    record-at-a-time loop produces, emitted as three vectorized blocks
    (numpy repeat/tile) instead of a Python append per pair, so a hot key
    whose buffers hold B records costs O(B) numpy ops per batch, not
    O(B^2) interpreter iterations.

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
        import numpy as np
        (k,) = pkey
        if state.hasTimedOut:
            state.remove()
            return
        lefts, rights = state.get if state.exists else ([], [])
        new_l, new_r = [], []
        for pdf in pdfs:
            side = pdf["side"].to_numpy()
            payload = pdf["payload"].to_numpy()
            is_l = side == "L"
            if is_l.any():
                new_l.append(payload[is_l])
            if not is_l.all():
                new_r.append(payload[~is_l])
        empty = np.empty(0, dtype=object)
        bl = np.concatenate(new_l) if new_l else empty
        br = np.concatenate(new_r) if new_r else empty
        ol = np.asarray(lefts, dtype=object)
        orr = np.asarray(rights, dtype=object)
        # three vectorized pair blocks — see docstring; repeat/tile keeps
        # duplicate payload multiplicity identical to the per-record loop
        lp, rp = [], []
        for lv, rv in ((bl, orr), (ol, br), (bl, br)):
            if len(lv) and len(rv):
                lp.append(np.repeat(lv, len(rv)))
                rp.append(np.tile(rv, len(lv)))
        state.update((list(lefts) + bl.tolist(), list(rights) + br.tolist()))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if lp:
            lj = np.concatenate(lp)
            yield pd.DataFrame({"k": np.full(len(lj), k, dtype=np.int64),
                                "left_json": lj,
                                "right_json": np.concatenate(rp)})

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
