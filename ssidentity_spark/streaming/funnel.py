"""Streaming funnel progression — the unbounded form of
``w6_funnel_progression`` (greedy-first-chain windowFunnel).

Like the streaming EMA (streaming/ema.py), the order-recursive fold
carries as O(1) state per key: (level, anchor time, last-applied
sequence). Rows fold in (ts, event_id) order within each micro-batch;
rows at-or-below the last-applied sequence fold nothing (replay safety);
cross-batch disorder is the upstream watermark's job. Emits a snapshot
of each touched key's progression per batch — the live "who is about to
convert" feed the batch query answers retrospectively.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FUNNEL_W_US = 3_600_000_000  # 60 min — same as the batch query
_STEPS = {"signup": 1, "view": 2, "purchase": 3}

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("funnel_level", IntegerType()),
        StructField("funnel_start_us", LongType()),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("level", IntegerType()),
        StructField("t0", LongType()),
        StructField("last_us", LongType()),
        StructField("last_id", LongType()),
    ]
)


def _funnel_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        return
    rows = rows.assign(_us=rows["ts"].astype("int64") // 1_000).sort_values(
        ["_us", "event_id"], kind="mergesort"
    )
    if state.exists:
        level, t0, last_us, last_id = state.get
    else:
        level, t0, last_us, last_id = 0, 0, -1, -1
    for us, eid, etype in zip(rows["_us"], rows["event_id"], rows["event_type"]):
        us, eid = int(us), int(eid)
        # replay guard at FULL microsecond precision — the same (us, eid)
        # order the fold sorts by; a coarser key would drop or reorder
        # distinct events sharing a coarser timestamp bucket
        if (us, eid) <= (last_us, last_id):
            continue  # replayed micro-batch — already folded
        s = _STEPS.get(str(etype), 0)
        if level == 0 and s == 1:
            level, t0 = 1, us
        elif s == level + 1 and us <= t0 + FUNNEL_W_US:
            level += 1
        last_us, last_id = us, eid
    state.update((level, t0, last_us, last_id))
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "funnel_level": [level],
            "funnel_start_us": [t0],
        }
    )


def funnel_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """(user_id, ts, event_id, event_type) stream → append-only per-batch
    snapshots of each touched key's funnel progression.

    Filters to the three funnel event types FIRST — the batch query's
    domain is users with at least one funnel event, so a user whose
    batch carries only e.g. 'click' rows must neither allocate state nor
    emit level-0 snapshots (they would diverge from the batch result and
    grow state with keys the semantics say don't exist)."""
    from pyspark.sql import functions as F

    return (
        events.filter(F.col("event_type").isin(*_STEPS))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
