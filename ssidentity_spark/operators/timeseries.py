"""Time-series regularization: bucket downsample + gap-fill + linear
interpolation ("hypertable rollup" family).

Reference impetus: the sniffer's observation stream is an irregular
time-series per device (one row per captured probe, /root/reference/
ssidentity.c:83-117), and every declared analytic over it — habitual
movements, active hours, distance tracking (README.md:15-18) — wants a
regular grid: "what was the signal level at each interval", including
intervals with no probe. This operator turns the irregular (key, ts, value)
stream into a dense per-key grid with linearly interpolated values.

Spark-first design, no UDFs anywhere:

1. **Downsample** — one hash-shuffle on (key, bucket); the per-bucket mean
   is computed as exact DECIMAL sum ÷ count so both engines (and any two
   cluster runs with different partition orders) produce the bit-identical
   double regardless of float summation order.
2. **Dense grid** — per-key min/max bucket (tiny agg), then
   `sequence()` + `explode()`: output is linear in grid size, never a
   cross join. The grid joins back to observations on (key, bucket) —
   co-partitioned with the downsample shuffle.
3. **Interpolation** — two window passes per key (`last(ignorenulls)`
   looking back, `first(ignorenulls)` looking forward) recover the
   bracketing observed points; the fill is the exact linear blend
   ``prev + (next - prev) * frac`` written with a fixed operation order so
   the IEEE result is deterministic. Grid edges clamp to the nearest
   observed value.

Scale: every stage is a narrow expression or a single keyed shuffle; state
per key is O(grid length). At 100 TB the grid explode is the dominant
output — it is generated distributed (per-key rows fan out on executors,
nothing touches the driver) and AQE re-splits any skewed key's post-explode
partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ssidentity_spark.functions.timeutil import epoch_s


def bucketize(ts_col: Column | str, bucket_secs: int) -> Column:
    """Epoch-second bucket floor — matches DuckDB
    ``CAST(floor(epoch(ts) / n) * n AS BIGINT)`` exactly, INCLUDING
    pre-1970 sub-second timestamps (``epoch_s`` is a true floor, not a
    toward-zero truncation). The bucket floor is ``sec - pmod(sec, n)``
    — all integer arithmetic, no doubles, so no 2^53 precision cliff."""
    sec_floor = epoch_s(ts_col)
    return (sec_floor - F.pmod(sec_floor, F.lit(bucket_secs))).cast("long")


def resample_interpolate(
    df: DataFrame,
    key: str,
    ts: str,
    val: str,
    bucket_secs: int,
    round_dp: int = 6,
    method: str = "linear",
) -> DataFrame:
    """Downsample ``val`` to ``bucket_secs`` means per ``key``, densify to
    the key's full [min, max] bucket range, and fill the gaps. Returns
    (key, bucket, value_interp, gap_filled) — ``bucket`` is the
    epoch-second grid point, ``gap_filled`` marks rows that had no
    observation.

    ``method``:
    - ``"linear"`` (default): interpolate between the bracketing
      observed points; one-sided gaps (before the first / after the
      last observation) carry the nearest observed value.
    - ``"locf"``: last observation carried forward — the step-function
      fill sensor pipelines want when a reading is VALID-UNTIL-CHANGED
      rather than smoothly varying (a device's last seen RSSI holds
      until the next probe). Grid points before the key's first
      observation have no carry source and stay NULL (never
      back-filled: that would fabricate a reading from the future).
      Same plan shape minus the forward-looking window.
    """
    if method not in ("linear", "locf"):
        raise ValueError(f"method must be linear|locf, got {method!r}")
    # 1. downsample — exact decimal sum / count, then ONE double division:
    # bit-deterministic across partition orders and engines
    obs = (
        df.select(
            F.col(key),
            bucketize(ts, bucket_secs).alias("bucket"),
            F.col(val).cast("decimal(20,2)").alias("v"),
        )
        .groupBy(key, "bucket")
        .agg(
            # count("v") (nulls excluded) — dividing the null-skipping
            # sum by a count-all deflates the mean of any bucket holding
            # NULL observations; AVG semantics on both engines
            (F.sum("v").cast("double") / F.count("v")).alias("obs_val")
        )
    )

    # 2. dense grid — per-key span, then a distributed sequence explode.
    # sequence() materializes ONE array per key inside a single task
    # before explode, so a pathological span (a device seen in January
    # and December at 1-second buckets) would allocate the whole grid in
    # one row — guard it with a hard cap and a clear error; the
    # documented upgrade for longer spans is chunking the span into
    # coarse segments first (explode days, then seconds within a day),
    # which keeps every generated array bounded.
    max_grid = 10_000_000
    span = obs.groupBy(key).agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    guarded = span.withColumn(
        "_grid_n", (F.col("b1") - F.col("b0")) / bucket_secs + 1
    ).withColumn(
        "_grid_ok",
        F.when(F.col("_grid_n") <= max_grid, True).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "resample_interpolate: per-key grid exceeds "
                        f"{max_grid} buckets for key "
                    ),
                    F.col(key).cast("string"),
                    F.lit(" — cap the span or chunk by coarse segment"),
                )
            )
        ),
    )
    grid = guarded.where("_grid_ok").select(
        key,
        F.explode(
            F.sequence("b0", "b1", F.lit(bucket_secs).cast("long"))
        ).alias("bucket"),
    )
    dense = grid.join(obs, [key, "bucket"], "left")

    # 3. bracketing observed points via ignore-nulls windows
    w_prev = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    observed_bucket = F.when(
        F.col("obs_val").isNotNull(), F.col("bucket")
    )
    if method == "locf":
        # only the backward-looking carry is needed — no forward window
        bracketed = dense.select(
            key,
            "bucket",
            "obs_val",
            F.last("obs_val", ignorenulls=True).over(w_prev).alias("pv"),
        )
        value = F.coalesce(F.col("obs_val"), F.col("pv"))
    else:
        bracketed = dense.select(
            key,
            "bucket",
            "obs_val",
            F.last("obs_val", ignorenulls=True).over(w_prev).alias("pv"),
            F.last(observed_bucket, ignorenulls=True).over(w_prev).alias("pb"),
            F.first("obs_val", ignorenulls=True).over(w_next).alias("nv"),
            F.first(observed_bucket, ignorenulls=True).over(w_next).alias("nb"),
        )

        frac = (F.col("bucket") - F.col("pb")).cast("double") / (
            F.col("nb") - F.col("pb")
        ).cast("double")
        blend = F.col("pv") + (F.col("nv") - F.col("pv")) * frac
        value = (
            F.when(F.col("obs_val").isNotNull(), F.col("obs_val"))
            .when(F.col("pv").isNull(), F.col("nv"))
            .when(F.col("nv").isNull(), F.col("pv"))
            .otherwise(blend)
        )
    # engine-independent round: floor(x*10^dp + 0.5)/10^dp — i.e. round
    # half toward +INFINITY (for the non-negative measurements here that
    # coincides with HALF_UP; for negative inputs it differs from both
    # engines' native round, deliberately: the point is that both sides
    # of the gate compute the IDENTICAL formula). The blend of 2-decimal
    # bucket means by dyadic grid ratios lands EXACTLY on half-way
    # doubles (e.g. 32.6509375 at sf0.1), where Spark's round()
    # (HALF_UP) and DuckDB's (half-to-even) disagree — spelling the rule
    # out as floor arithmetic makes the tie break identically. Domain
    # note: floor() returns LongType, so |value| must stay below
    # ~9.2e12 (2^63/10^dp) — far above any physical measurement here,
    # and a regime where 6 fractional digits exceed double precision
    # anyway.
    scale = F.lit(float(10**round_dp))
    rounded = F.floor(value * scale + F.lit(0.5)) / scale
    return bracketed.select(
        key,
        "bucket",
        rounded.alias("value_interp"),
        F.col("obs_val").isNull().alias("gap_filled"),
    )


def m4_point_exprs() -> list[Column]:
    """The four M4 aggregation expressions over (ts_us, value, event_id)
    rows — lexicographic struct min/max carry the winning point's fields
    along with its tiebreaks, so the selection is a plain aggregate (no
    window), which makes it MAP-SIDE COMBINABLE in batch and a bounded
    stateful aggregation on a stream. SHARED by the streaming twin
    (streaming/ema.py:m4_downsample_stream) and its batch parity frame,
    so the role selection cannot drift. Tiebreaks match the gated query
    (plans/timeseries.py:ts_m4_downsample): value ties -> earliest
    (ts, id); first/last by (ts, id)."""
    from pyspark.sql import functions as F

    def pt(s):
        return F.struct(
            s["ts_us"].alias("ts_us"), s["value"].alias("value")
        )

    p_min = F.min(F.struct("value", "ts_us", "event_id"))
    # max value with EARLIEST tie: negate the tiebreak components
    p_max = F.max(
        F.struct(
            "value",
            (-F.col("ts_us")).alias("nts"),
            (-F.col("event_id")).alias("nid"),
        )
    )
    p_first = F.min(F.struct("ts_us", "event_id", "value"))
    p_last = F.max(F.struct("ts_us", "event_id", "value"))
    return [
        pt(p_min).alias("p_min"),
        F.struct(
            (-p_max["nts"]).alias("ts_us"), p_max["value"].alias("value")
        ).alias("p_max"),
        pt(p_first).alias("p_first"),
        pt(p_last).alias("p_last"),
    ]
