"""Streaming CDC materialization — the unbounded form of
``operators.merge.apply_cdc_log`` (batch compaction of a changelog).

Reference impetus: the sniffer's per-packet INSERT stream
(ssidentity.c:102-113) is a changelog; a live dashboard wants the LATEST
state per key, updated as changes arrive, robust to out-of-order delivery
ACROSS micro-batches — a change from sequence 17 landing a batch after
sequence 23 must not regress the materialized row.

``cdc_latest_state_stream`` keeps one row of state per key — (best
sequence, op, payload) — via ``applyInPandasWithState``. The output is an
append-only changelog of materialized updates (each emitted row is final
— never retracted — so append mode is the correct declaration):
each micro-batch emits the key's current materialized row only when the
batch actually advanced it. Tombstones emit a final ``is_deleted`` marker
but STAY in state until the watermark passes their sequence time (an
event-time timeout then drops them) — removing them immediately would let
a stale non-delete in a later batch resurrect the key; the watermark
contract is precisely the moment that hazard disappears. Live keys hold
state indefinitely (the live-population invariant), deleted keys only for
the tombstone retention window.

Sequence order is (ts, seq_id) lexicographic — identical to the batch
operator, so stream ≡ batch parity is testable and tested
(tests/test_streaming.py). State per key is O(payload), no timers; at
100 TB the state store shards by key like every stateful operator here.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CDC_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("seq_us", LongType()),
        StructField("seq_id", LongType()),
        StructField("last_type", StringType()),
        StructField("last_value", DoubleType()),
        StructField("is_deleted", BooleanType()),
    ]
)

CDC_STATE_SCHEMA = StructType(
    [
        StructField("seq_us", LongType()),
        StructField("seq_id", LongType()),
        StructField("op", StringType()),
        StructField("last_type", StringType()),
        StructField("last_value", DoubleType()),
    ]
)


def _cdc_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # tombstone retention expired: the watermark has passed the
        # delete's sequence time, so no older change can arrive to
        # resurrect the key — dropping the tombstone is now SAFE (this is
        # exactly what the watermark contract guarantees). Live keys
        # never set a timeout.
        state.remove()
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        return
    # full microsecond precision — the batch operator orders by the raw
    # (ts, event_id), so the stream's sequence must too or same-ms events
    # resolve differently across the two
    ts_us = (rows["ts"].astype("int64") // 1_000).to_numpy()
    ids = rows["event_id"].to_numpy()
    # batch-local winner by (ts, event_id)
    best_i = max(range(len(rows)), key=lambda i: (ts_us[i], ids[i]))
    b_seq = (int(ts_us[best_i]), int(ids[best_i]))

    if state.exists:
        s_us, s_id, s_op, _s_type, _s_val = state.get
        if (s_us, s_id) >= b_seq:
            # stale replay — state already newer; emit nothing, but a
            # tombstone must RE-ARM its event-time timeout: GroupState
            # clears the timeout on every invocation, so returning
            # without setting it again would leak the tombstone forever
            if s_op == "D":
                state.update((s_us, s_id, s_op, _s_type, _s_val))
                state.setTimeoutTimestamp(s_us // 1_000 + 1)
            return
    new_op = str(rows.loc[best_i, "op"])
    new_type = str(rows.loc[best_i, "event_type"])
    new_val = float(rows.loc[best_i, "value"])
    # tombstones stay in state (op='D') so a stale non-delete arriving in
    # a LATER batch cannot resurrect the key; they expire via event-time
    # timeout once the watermark passes their sequence time
    state.update((b_seq[0], b_seq[1], new_op, new_type, new_val))
    if new_op == "D":
        state.setTimeoutTimestamp(b_seq[0] // 1_000 + 1)  # timeout is ms
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "seq_us": [b_seq[0]],
            "seq_id": [b_seq[1]],
            "last_type": [new_type],
            "last_value": [new_val],
            "is_deleted": [new_op == "D"],
        }
    )


def cdc_latest_state_stream(
    changes: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """(user_id, ts, event_id, op, event_type, value) change stream →
    append-only changelog of materialized latest rows per key. The
    watermark doubles as the tombstone retention window."""
    return (
        changes.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _cdc_fn,
            outputStructType=CDC_OUTPUT_SCHEMA,
            stateStructType=CDC_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
