"""Streaming per-key EMA — the O(1)-state form of ``ts_ema``.

The batch operator folds each key's full history; on an unbounded stream
the same recursion carries as a few numbers of state per key (the
committed EMA and the fold frontier), which is the whole point: the
order-recursive aggregation that can't map-side combine in batch becomes
a trivially bounded stateful operator when the stream delivers in order.

Ordering contract (upgraded in r11 alongside streaming/pattern.py): a
recursive statistic cannot absorb a late row retroactively, so the state
carries a small PENDING buffer — rows append on arrival, and only the
prefix whose event time has passed the current watermark folds into the
committed EMA (in (us, event_id) order; by then no admissible row can
sort before it). Each emitted snapshot folds the still-pending suffix on
a COPY of the committed state, so snapshots stay complete — the final
snapshot per key (largest n_events; the counter is monotone) equals the
batch fold even when micro-batches interleave out of event-time order
within the watermark. The buffer is bounded by the watermark horizon per
key; rows at or before the committed frontier are replays or
watermark-expired and fold nothing (exactly-once replay safety).

CHECKPOINT COMPATIBILITY: the r11 pending-buffer upgrade CHANGED the
state schema (r10's ``last_us``/``last_id`` frontier pair became
``folded_wm_us`` + the three pending arrays). applyInPandasWithState
pins the state StructType into the checkpoint, so a checkpoint written
by the r10 operator cannot be restored by this one — restarting an
upgraded query REQUIRES a fresh checkpoint directory (and a source
replay/backfill if continuity matters). Same break, same round, same
remedy in streaming/funnel.py and streaming/pattern.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
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
        # committed fold frontier: events with us < folded_wm_us are in
        StructField("folded_wm_us", LongType()),
        StructField("pend_us", ArrayType(LongType())),
        StructField("pend_id", ArrayType(LongType())),
        StructField("pend_val", ArrayType(DoubleType())),
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
    rows = rows.assign(_us=rows["ts"].astype("int64") // 1_000)
    if state.exists:
        ema, n, folded_wm_us, pend_us, pend_id, pend_val = state.get
        pending = {
            (int(u), int(i)): float(v)
            for u, i, v in zip(pend_us or [], pend_id or [], pend_val or [])
        }
    else:
        ema, n, folded_wm_us = 0.0, 0, 0
        pending = {}
    for us, eid, val in zip(rows["_us"], rows["event_id"], rows["value"]):
        us, eid = int(us), int(eid)
        if us < folded_wm_us:
            continue  # already folded (replay) or watermark-expired
        pending[(us, eid)] = float(val)
    wm_us = state.getCurrentWatermarkMs() * 1_000
    keep: dict[tuple[int, int], float] = {}
    for (us, eid), val in sorted(pending.items()):
        if us < wm_us:
            ema = val if n == 0 else ema * EMA_ALPHA + val * (1.0 - EMA_ALPHA)
            n += 1
        else:
            keep[(us, eid)] = val
    folded_wm_us = max(folded_wm_us, wm_us)
    ks = sorted(keep)
    state.update(
        (
            ema,
            n,
            folded_wm_us,
            [k[0] for k in ks],
            [k[1] for k in ks],
            [keep[k] for k in ks],
        )
    )
    # speculative snapshot: committed fold + the pending suffix
    s_ema, s_n = ema, n
    for k in ks:
        v = keep[k]
        s_ema = v if s_n == 0 else s_ema * EMA_ALPHA + v * (1.0 - EMA_ALPHA)
        s_n += 1
    yield pd.DataFrame(
        {"user_id": [int(key[0])], "ema": [s_ema], "n_events": [s_n]}
    )


def ema_stream(changes: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """(user_id, ts, event_id, value) stream → append-only per-batch
    snapshots of each touched key's running EMA. Final snapshot per key
    (max n_events — monotone) equals the batch fold, including under
    cross-batch disorder within the watermark (module docstring)."""
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


# ---------------------------------------------------------------------------
# TS10 streaming twin (r12) — Holt linear smoothing with O(1) state per
# key: the (level, trend) recursion folds across micro-batches exactly
# like the EMA above, under the same watermark-sealed pending-buffer
# ordering contract (module docstring; the buffer bookkeeping is
# identical — only the fold step and the state payload differ). Each
# fold step is the SAME IEEE expression sequence as the batch
# ts_holt_linear (the l' expression recomputed inside b', no temporary
# reordering), so the final snapshot per key is bit-identical to the
# batch fold — pinned by the hypothesis property test and the
# micro-batch parity test.
# ---------------------------------------------------------------------------

HOLT_ALPHA = 0.5  # matches plans/timeseries._HOLT_ALPHA (test-pinned)
HOLT_BETA = 0.2

HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("n_events", LongType()),
    ]
)

HOLT_STATE_SCHEMA = StructType(
    [
        StructField("l", DoubleType()),
        StructField("b", DoubleType()),
        StructField("n", LongType()),
        StructField("folded_wm_us", LongType()),
        StructField("pend_us", ArrayType(LongType())),
        StructField("pend_id", ArrayType(LongType())),
        StructField("pend_val", ArrayType(DoubleType())),
    ]
)


def _holt_step(l: float, b: float, n: int, val: float):
    """One committed fold step — the batch query's expression verbatim:
    seed (x, 0) on the first element, then l' and b' with l'
    recomputed inside b' (same IEEE op order as the Spark/DuckDB
    folds)."""
    if n == 0:
        return val, 0.0, 1
    l2 = HOLT_ALPHA * val + (1.0 - HOLT_ALPHA) * (l + b)
    b2 = (
        HOLT_BETA
        * (HOLT_ALPHA * val + (1.0 - HOLT_ALPHA) * (l + b) - l)
        + (1.0 - HOLT_BETA) * b
    )
    return l2, b2, n + 1


def _holt_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs), ignore_index=True)
    if rows.empty:
        return
    rows = rows.assign(_us=rows["ts"].astype("int64") // 1_000)
    if state.exists:
        l, b, n, folded_wm_us, pend_us, pend_id, pend_val = state.get
        pending = {
            (int(u), int(i)): float(v)
            for u, i, v in zip(pend_us or [], pend_id or [], pend_val or [])
        }
    else:
        l, b, n, folded_wm_us = 0.0, 0.0, 0, 0
        pending = {}
    for us, eid, val in zip(rows["_us"], rows["event_id"], rows["value"]):
        us, eid = int(us), int(eid)
        if us < folded_wm_us:
            continue  # already folded (replay) or watermark-expired
        pending[(us, eid)] = float(val)
    wm_us = state.getCurrentWatermarkMs() * 1_000
    keep: dict[tuple[int, int], float] = {}
    for (us, eid), val in sorted(pending.items()):
        if us < wm_us:
            l, b, n = _holt_step(l, b, n, val)
        else:
            keep[(us, eid)] = val
    folded_wm_us = max(folded_wm_us, wm_us)
    ks = sorted(keep)
    state.update(
        (
            l,
            b,
            n,
            folded_wm_us,
            [k[0] for k in ks],
            [k[1] for k in ks],
            [keep[k] for k in ks],
        )
    )
    s_l, s_b, s_n = l, b, n
    for k in ks:
        s_l, s_b, s_n = _holt_step(s_l, s_b, s_n, keep[k])
    yield pd.DataFrame(
        {
            "user_id": [int(key[0])],
            "level": [s_l],
            "trend": [s_b],
            "n_events": [s_n],
        }
    )


def holt_stream(changes: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """(user_id, ts, event_id, value) stream → append-only per-batch
    snapshots of each touched key's running Holt (level, trend). Final
    snapshot per key (max n_events — monotone) is bit-identical to the
    batch ts_holt_linear fold, including under cross-batch disorder
    within the watermark."""
    return (
        changes.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _holt_fn,
            outputStructType=HOLT_OUTPUT_SCHEMA,
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
