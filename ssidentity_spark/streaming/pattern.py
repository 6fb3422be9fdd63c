"""Streaming event-sequence pattern matching — the unbounded form of
``w7_event_pattern`` (MATCH_RECOGNIZE episodes, W7).

The batch query runs a regex over the per-key event string; the regex
``s[cv]*p`` with DISJOINT character classes is recognized by a 2-state
DFA, so the streaming twin carries O(1) state per key — (armed, current
episode length, totals) — instead of the key's history. The DFA is
provably the same decomposition the regex scan produces for this pattern
class: with disjoint classes there is exactly one way to extend or kill
a partial match, so greedy left-to-right folding IS leftmost
non-overlapping matching (the property the batch side's engine-parity
argument rests on, reused here for stream ≡ batch).

State machine (s=signup, c/v=browse, p=purchase, e=error):
  IDLE  --s-->  ARMED(len=1)
  ARMED --c/v-> ARMED(len+1)
  ARMED --p-->  match (count++, longest=max, browse+=len-1) -> IDLE
  ARMED --s-->  ARMED(len=1)   (restart: the old anchor can never match)
  ARMED --e-->  IDLE
Replay safety and ordering follow streaming/funnel.py: rows fold in
(us, event_id) order, a full-precision replay guard skips re-delivered
rows, cross-batch disorder is the upstream watermark's job.
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

PATTERN_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_matches", LongType()),
        StructField("longest_match", LongType()),
        StructField("n_browse_steps", LongType()),
    ]
)

PATTERN_STATE_SCHEMA = StructType(
    [
        StructField("armed", IntegerType()),
        StructField("cur_len", LongType()),
        StructField("n_events", LongType()),
        StructField("n_matches", LongType()),
        StructField("longest", LongType()),
        StructField("browse", LongType()),
        StructField("last_us", LongType()),
        StructField("last_id", LongType()),
    ]
)


def _pattern_fn(
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
        armed, cur_len, n_events, n_matches, longest, browse, last_us, last_id = (
            state.get
        )
    else:
        armed, cur_len, n_events, n_matches, longest, browse = 0, 0, 0, 0, 0, 0
        last_us, last_id = -1, -1
    for us, eid, etype in zip(rows["_us"], rows["event_id"], rows["event_type"]):
        us, eid = int(us), int(eid)
        if (us, eid) <= (last_us, last_id):
            continue  # replayed micro-batch — already folded
        ch = str(etype)[:1]
        n_events += 1
        if armed:
            if ch in ("c", "v"):
                cur_len += 1
            elif ch == "p":
                n_matches += 1
                longest = max(longest, cur_len + 1)
                browse += cur_len - 1
                armed, cur_len = 0, 0
            elif ch == "s":
                cur_len = 1  # restart at the fresher anchor
            else:  # error (or any non-pattern type) kills the episode
                armed, cur_len = 0, 0
        elif ch == "s":
            armed, cur_len = 1, 1
        last_us, last_id = us, eid
    state.update(
        (armed, cur_len, n_events, n_matches, longest, browse, last_us, last_id)
    )
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "n_events": [n_events],
            "n_matches": [n_matches],
            "longest_match": [longest],
            "n_browse_steps": [browse],
        }
    )


def pattern_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """(user_id, ts, event_id, event_type) stream → append-only per-batch
    snapshots of each touched key's episode totals. The final snapshot
    per key (the one with the largest n_events — the counter is
    monotone) equals the batch query's row for that key."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _pattern_fn,
            outputStructType=PATTERN_OUTPUT_SCHEMA,
            stateStructType=PATTERN_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
