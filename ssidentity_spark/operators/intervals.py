"""Interval-overlap analytics: max concurrency via a bucketed sweep line.

The question ("how many devices were present AT ONCE?") is the occupancy
form of the reference's visit tracking (README.md:16-17 — arrival/leave
windows). The textbook sweep line — +1 at each start, -1 at each end,
running sum over one global time order — is a SCALE TRAP: a global
ORDER BY is a single-partition window, one task no matter how many
executors. This operator clips every interval to calendar buckets first
(day by default) and sweeps WITHIN each bucket:

- an interval spanning a bucket boundary contributes a segment per
  bucket; the segment that starts AT the bucket's first instant carries
  the open interval across the boundary, so per-bucket running sums need
  no cross-bucket state;
- the sweep partitions by bucket → embarrassingly parallel, shuffle
  keyed on the bucket, window state bounded by one bucket's endpoints;
- tie order is (t ASC, delta DESC): starts before ends at the same
  instant — closed-interval semantics, so touching intervals count as
  concurrent and zero-length intervals count themselves. Within an equal
  (t, delta) group the partial-sum MULTISET is order-invariant, so the
  bucket max is deterministic without a unique tiebreaker.

Pure DataFrame ops (sequence/explode + one window per bucket); the whole
plan is SQL-expressible, which is what lets the driver hash-gate it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# units valid both for date_trunc AND as `interval 1 <unit>` literals
_BUCKET_UNITS = {"year", "month", "week", "day", "hour", "minute", "second"}


def max_concurrency_by_bucket(
    intervals: DataFrame,
    start: str = "s_start",
    end: str = "s_end",
    bucket: str = "day",
) -> DataFrame:
    """(start, end) intervals → per-bucket (n_segments, max_concurrent).

    ``bucket`` is a unit valid BOTH as ``date_trunc`` and as an interval
    literal: year, month, week, day, hour, minute, second. (``quarter``
    is date_trunc-valid but ``interval 1 quarter`` does not parse, so it
    is rejected up front rather than crashing at plan build.) Output
    columns: ``bucket_ts`` (the bucket's first instant), ``n_segments``
    (intervals active in the bucket, boundary-spanners counted in each
    bucket they touch), ``max_concurrent``.
    """
    if bucket.lower() not in _BUCKET_UNITS:
        raise ValueError(
            f"max_concurrency_by_bucket: unsupported bucket {bucket!r} — "
            f"must be one of {sorted(_BUCKET_UNITS)} (a unit usable both "
            "in date_trunc and as an interval literal)"
        )
    one_bucket = F.expr(f"interval 1 {bucket}")
    seg = intervals.select(
        F.explode(
            F.sequence(
                F.date_trunc(bucket, F.col(start)),
                F.date_trunc(bucket, F.col(end)),
                one_bucket,
            )
        ).alias("bucket_ts"),
        F.col(start),
        F.col(end),
    ).select(
        "bucket_ts",
        F.greatest(F.col(start), F.col("bucket_ts")).alias("t_in"),
        F.least(F.col(end), F.col("bucket_ts") + one_bucket).alias("t_out"),
    )
    deltas = seg.select(
        "bucket_ts",
        F.explode(
            F.array(
                F.struct(F.col("t_in").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("t_out").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("ev"),
    ).select("bucket_ts", F.col("ev.t").alias("t"), F.col("ev.delta").alias("delta"))
    w = (
        Window.partitionBy("bucket_ts")
        .orderBy(F.col("t").asc(), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = deltas.withColumn("conc", F.sum("delta").over(w))
    return swept.groupBy("bucket_ts").agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_segments"),
        F.max("conc").cast("long").alias("max_concurrent"),
    )
