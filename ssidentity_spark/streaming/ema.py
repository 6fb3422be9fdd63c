"""Streaming per-key EMA — the O(1)-state form of ``ts_ema``.

The batch operator folds each key's full history; on an unbounded stream
the same recursion carries as two numbers of state per key (the running
EMA and the last-applied sequence), which is the whole point: the
order-recursive aggregation that can't map-side combine in batch becomes
a trivially bounded stateful operator when the stream delivers in order.

Ordering contract: rows are folded in (ts, event_id) order WITHIN each
micro-batch (sorted before the fold), and rows at-or-below the
last-applied sequence are dropped — a recursive statistic cannot absorb
a late row retroactively without replaying history, so cross-batch
disorder is resolved by the watermark upstream (late rows die there) and
by the sequence guard here (exactly-once replay safety: re-delivered
micro-batches re-fold nothing). Stream ≡ batch parity therefore holds
for in-order delivery and is pinned by test.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

EMA_ALPHA = 0.9  # same decay as the batch ts_ema query

EMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ema", DoubleType()),
        StructField("n_events", LongType()),
    ]
)

EMA_STATE_SCHEMA = StructType(
    [
        StructField("ema", DoubleType()),
        StructField("n", LongType()),
        StructField("last_us", LongType()),
        StructField("last_id", LongType()),
    ]
)


def _ema_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        return
    # full microsecond precision: the guard key must equal the sort key,
    # or distinct events inside a coarser bucket get dropped/reordered
    rows = rows.assign(_us=rows["ts"].astype("int64") // 1_000).sort_values(
        ["_us", "event_id"], kind="mergesort"
    )
    if state.exists:
        ema, n, last_us, last_id = state.get
    else:
        ema, n, last_us, last_id = 0.0, 0, -1, -1
    for us, eid, val in zip(rows["_us"], rows["event_id"], rows["value"]):
        us, eid, val = int(us), int(eid), float(val)
        if (us, eid) <= (last_us, last_id):
            continue  # replay / stale — recursive state can't rewind
        ema = val if n == 0 else ema * EMA_ALPHA + val * (1.0 - EMA_ALPHA)
        n += 1
        last_us, last_id = us, eid
    state.update((ema, n, last_us, last_id))
    yield pd.DataFrame(
        {"user_id": [int(key[0])], "ema": [ema], "n_events": [n]}
    )


def ema_stream(changes: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """(user_id, ts, event_id, value) stream → append-only per-batch
    snapshots of each touched key's running EMA."""
    return (
        changes.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _ema_fn,
            outputStructType=EMA_OUTPUT_SCHEMA,
            stateStructType=EMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def m4_downsample_stream(
    events: DataFrame, bucket: str = "4 hours", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming M4 downsample: per (event_type, event-time window) the
    first/last/min/max points, as a WATERMARKED WINDOWED AGGREGATION —
    M4's selection is four lexicographic struct extremes (no rank
    window), so the streaming state per open bucket is exactly four
    points and the sink receives append-mode finalized buckets. The
    aggregation expressions are SHARED with the batch parity frame
    (operators/timeseries.m4_point_exprs), and the window START equals
    the gated batch query's floor-epoch bucket (UTC session), so stream
    output == ts_m4_downsample's point set on closed buckets — parity
    pinned by test."""
    from pyspark.sql import functions as F

    from ssidentity_spark.functions.timeutil import epoch_us
    from ssidentity_spark.operators.timeseries import m4_point_exprs

    # watermarks require TIMESTAMP (not NTZ, which the testdata carries);
    # the session is pinned UTC, so the cast is wall-clock identity and
    # window starts still equal the batch query's floor-epoch buckets
    base = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            "ts",
            "event_type",
            epoch_us("ts").cast("long").alias("ts_us"),
            "value",
            "event_id",
        )
    )
    agg = base.groupBy(
        "event_type", F.window("ts", bucket).alias("w")
    ).agg(*m4_point_exprs())
    role = F.explode(
        F.map_from_arrays(
            F.array(
                F.lit("min"), F.lit("max"), F.lit("first"), F.lit("last")
            ),
            F.array("p_min", "p_max", "p_first", "p_last"),
        )
    )
    return agg.select(
        "event_type",
        epoch_us(F.col("w.start")).cast("long").alias("bucket_us"),
        role.alias("role", "p"),
    ).select(
        "event_type",
        "bucket_us",
        "role",
        F.col("p.ts_us").alias("ts_us"),
        F.col("p.value").alias("value"),
    )
