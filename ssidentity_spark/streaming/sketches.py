"""Streaming sketches: the deterministic Count-Min and HLL register tables
(operators/sketches.py) maintained over an UNBOUNDED event stream.

Why this is the right streaming state story (the whole point of sketches
at 100 TB): the state IS the sketch — EXACTLY d·w counter rows for CMS and
≤ groups·m register rows for HLL, by construction, forever. No watermark
is needed to bound it and none is used: these are running aggregations over
fixed-cardinality keys, the one streaming-agg shape whose state cannot grow
with history. (Contrast streaming/corpus.py's dedup state, which needs the
watermark, and streaming/alerts.py's per-key state, which needs timeouts.)

Both aggregations are merge-friendly (counter add / register max), so
Spark's partial aggregation does the per-micro-batch work map-side and the
state store only ever sees the collapsed deltas.

The builders are THE SAME functions the batch queries use
(operators/sketches.py) — they are pure expressions + one aggregation, legal
on streaming DataFrames as-is, so stream ≡ batch holds by construction and
is pinned by tests/test_streaming.py.

Reference impetus: ssidentity.c:23-26 — per-device frequencies and device
rosters over a capture stream that never ends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ssidentity_spark.operators.sketches import cms_counters, hll_registers


def cms_counters_stream(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming CMS: (j, bucket, c) running counters — state fixed at
    d·w rows. Use outputMode 'update' ('complete' only for tiny sinks)."""
    return cms_counters(events, F.col(key_col).cast("string"))


def hll_registers_stream(
    events: DataFrame, group_col: str = "event_type", key_col: str = "user_id"
) -> DataFrame:
    """Streaming HLL register table: (group, bucket, rho) running maxima —
    the mergeable half; the closed-form estimate
    (operators/sketches.hll_estimates' final expression) is a cheap batch
    read over this table whenever a roster count is wanted."""
    return hll_registers(events, group_col, key_col)
