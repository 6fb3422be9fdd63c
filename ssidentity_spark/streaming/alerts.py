"""T7 — stateful arrival/departure alerts (SURVEY §2.8, the hard 20%).

Reference impetus: "Tracking / Arrival alerts" (/root/reference/README.md:19).
Per-MAC presence state machine over the observation stream via
``applyInPandasWithState``:

- absent → row arrives  ⇒ emit ``arrival``, mark present
- present → no row until (last_seen + gap) passes the event-time watermark
  ⇒ timeout fires, emit ``departure``, clear state

State per key is 16 bytes (present flag + last-seen millis); event-time
timeouts mean state cannot grow past the active-device population, and the
watermark bounds both late data (T8) and timeout firing. Alert emission is
idempotent per (mac, alert_type, ts) under exactly-once sinks.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ALERT_OUTPUT_SCHEMA = StructType(
    [
        StructField("mac", StringType()),
        StructField("alert_type", StringType()),  # arrival | departure
        StructField("event_ms", LongType()),
        StructField("sensor_id", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("present", BooleanType()),
        StructField("last_seen_ms", LongType()),
        StructField("last_sensor", StringType()),
    ]
)


def _presence_fn(gap_ms: int):
    def fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        mac = key[0]
        if state.hasTimedOut:
            present, last_seen, last_sensor = (
                state.get if state.exists else (False, 0, None)
            )
            state.remove()
            if present:
                yield pd.DataFrame(
                    {
                        "mac": [mac],
                        "alert_type": ["departure"],
                        "event_ms": [last_seen + gap_ms],
                        "sensor_id": [last_sensor],
                    }
                )
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        # event-time millis arrive as datetime64 — normalize
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).to_numpy()
        newest = int(ts_ms.max())
        newest_sensor = str(rows.loc[ts_ms.argmax(), "sensor_id"])

        present, last_seen = False, 0
        if state.exists:
            present, last_seen, _sensor = state.get
        alerts = []
        if not present:
            first_i = ts_ms.argmin()
            alerts.append(
                (mac, "arrival", int(ts_ms.min()), str(rows.loc[first_i, "sensor_id"]))
            )
        last_seen = max(last_seen, newest)
        state.update((True, last_seen, newest_sensor))
        state.setTimeoutTimestamp(last_seen + gap_ms)
        if alerts:
            yield pd.DataFrame(
                alerts, columns=["mac", "alert_type", "event_ms", "sensor_id"]
            )

    return fn


def presence_alerts(
    obs_stream: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Arrival/departure alert stream from a watermarked observation stream.

    Input: OBSERVATIONS_SCHEMA streaming DataFrame. Output:
    (mac, alert_type, event_ms, sensor_id) in append mode.
    """
    gap_ms = {"15 minutes": 900_000, "30 minutes": 1_800_000}.get(gap, 1_800_000)
    return (
        obs_stream.withWatermark("ts", watermark)
        .groupBy("mac")
        .applyInPandasWithState(
            _presence_fn(gap_ms),
            outputStructType=ALERT_OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
