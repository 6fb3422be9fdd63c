"""Streaming sessionization — the unbounded form of ``w4_sessionize``
(W4 visit detection), built on Spark's NATIVE session windows: no Python
state, no custom fold — ``session_window`` is whole-stage JVM streaming
state with watermark-driven closure, exactly what the engine should reach
for before ``applyInPandasWithState`` (the Spark-first rule; the custom
ops stay for semantics built-ins can't express — W7's DFA, T7's
alert edges).

Gap parity with the batch query, to the microsecond: the batch rule
opens a new session when the inter-event gap is STRICTLY greater than
30 minutes (plans/analytics.py:_event_sessions). Spark's session-window
merge is END-INCLUSIVE — an event exactly ``gapDuration`` after the last
one still extends the session (measured, not assumed: the boundary test
pinned it) — i.e. a new session starts only when the gap EXCEEDS
``gapDuration``. ``gap = 30 minutes`` is therefore exact parity with the
batch strict-> rule on every microsecond-grained timestamp: a 30:00.000000
gap merges on both sides, 30:00.000001 splits on both.

Emission: append mode — a session row is emitted once the watermark
passes its end, i.e. CLOSED sessions only; trailing sessions stay open
on bounded input (the M4-twin horizon behavior, asserted in tests rather
than papered over). ``session_end`` is the window end = last event +
gap, the session-window convention (the batch twin's last-event time is
``session_end - gap``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# exact parity with the batch rule's strict-> threshold (see module
# docstring); the 30-minute constant is plans/analytics._SESSION_GAP_US
SESSION_GAP = "30 minutes"


def session_stream(
    events: DataFrame,
    gap: str = SESSION_GAP,
    watermark: str = "0 seconds",
) -> DataFrame:
    """(user_id, ts, ...) stream → one row per CLOSED session:
    (user_id, session_start, session_end, n_events)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
        )
    )
