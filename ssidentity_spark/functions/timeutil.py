"""Timestamp helpers that are safe for both TIMESTAMP and TIMESTAMP_NTZ.

The driver's parquet stores naive ``timestamp[us]`` (no UTC flag), which
Spark 4 reads as TIMESTAMP_NTZ; ``F.unix_micros`` only accepts TIMESTAMP and
raises DATATYPE_MISMATCH on NTZ.  ``epoch_us`` computes microseconds since
the epoch without involving the session timezone at all — the NTZ wall-clock
value is measured against an NTZ epoch literal with ``timestamp_diff`` — so
the result is bit-identical to DuckDB's ``epoch_us(ts)`` on the same naive
parquet value, regardless of what ``spark.sql.session.timeZone`` is set to.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_NTZ = "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ)"


def epoch_us(col: Column | str) -> Column:
    """Microseconds since 1970-01-01 for TIMESTAMP or TIMESTAMP_NTZ columns.

    Timezone-independent: NTZ inputs are diffed against an NTZ epoch
    (no implicit cast through the session timezone), TIMESTAMP inputs are
    cast to NTZ in UTC semantics only when the session is UTC — which every
    session built by :mod:`ssidentity_spark.session` pins.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND", F.expr(_EPOCH_NTZ), c.cast("timestamp_ntz")
    )


def epoch_s(col: Column | str) -> Column:
    """FLOOR of epoch seconds (same contract as :func:`epoch_us`, and the
    same value as DuckDB's whole-second ``epoch()``): equals
    floor(epoch_us/1e6) for pre-1970 sub-second values too.
    ``timestamp_diff(SECOND, ...)`` alone truncates toward zero, so
    1969-12-31 23:59:59.5 would come back 0 instead of -1 — the exact
    off-by-one that once lived in operators/timeseries.bucketize; the
    correction is folded in here so every caller gets floor semantics."""
    c = F.col(col) if isinstance(col, str) else col
    epoch = F.expr(_EPOCH_NTZ)
    ntz = c.cast("timestamp_ntz")
    trunc = F.timestamp_diff("SECOND", epoch, ntz)
    us = F.timestamp_diff("MICROSECOND", epoch, ntz)
    return trunc - F.when(us < trunc * F.lit(1_000_000), F.lit(1)).otherwise(
        F.lit(0)
    )
