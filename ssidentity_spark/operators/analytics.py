"""The declared analytics surface of the reference, as reusable DataFrame
operators over the canonical ``observations`` schema (SURVEY §2.4-§2.7).

Impetus citations: /root/reference/README.md:15-19 ("Things that can be
correlated": triangulated living areas, habitual movements / active hours,
interests, tracking/arrival alerts, geolocation of associated SSIDs) and the
TODO analytics at /root/reference/ssidentity.c:23-37 (MAC-as-key dedup,
network tree, distance filtering).

Everything here is built-in DataFrame API: one shuffle per grouping/window
key, broadcast for small dims, no collect, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ssidentity_spark.functions.timeutil import epoch_us


def interests(obs: DataFrame) -> DataFrame:
    """A1: per-device probed-SSID profile (README.md:18)."""
    return obs.groupBy("mac").agg(
        F.sort_array(F.collect_set("ssid")).alias("ssids"),
        F.countDistinct("ssid").alias("n_ssids"),
        F.count(F.lit(1)).alias("n_probes"),
    )


def active_hours(obs: DataFrame) -> DataFrame:
    """A2: per-device hour×dow activity histogram (README.md:17)."""
    return obs.groupBy(
        "mac", F.hour("ts").alias("hr"), (F.weekday("ts") + 1).alias("dow")
    ).agg(F.count(F.lit(1)).alias("n"))


def habitual_hour(obs: DataFrame) -> DataFrame:
    """A2/W1: each device's modal activity hour."""
    h = obs.groupBy("mac", F.hour("ts").alias("hr")).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("mac").orderBy(F.desc("n"), F.asc("hr"))
    return h.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")


def network_tree(obs: DataFrame) -> DataFrame:
    """A3: AP(SSID) → known clients (ssidentity.c:36)."""
    return obs.groupBy("ssid").agg(
        F.sort_array(F.collect_set("mac")).alias("clients"),
        F.countDistinct("mac").alias("n_clients"),
        F.count(F.lit(1)).alias("n_probes"),
    )


def mac_key_rollup(obs: DataFrame) -> DataFrame:
    """A4: 'MAC as primary key, timestamps as CSV' (ssidentity.c:26).

    collect_set, not collect_list: repeated radio frames would otherwise
    emit duplicate timestamps here while the siblings (plans
    a4_mac_key_rollup, operators/maintenance.mac_roster_upsert) dedupe —
    the same conceptual feature must have ONE output."""
    return obs.groupBy("mac").agg(
        F.array_join(F.sort_array(F.collect_set("ts_str")), ",").alias("ts_csv"),
        F.count(F.lit(1)).alias("n"),
    )


def dedup_observations(obs: DataFrame) -> DataFrame:
    """A4/T6: drop repeated captures — radio frames repeat (rows 3-4 of
    observations.db are byte-identical). Full-row distinct: keying on a
    subset like (mac, ssid, ts) would nondeterministically pick a survivor
    among rows that differ in sensor_id/rssi/dist, which are genuinely
    distinct captures, not frame repeats."""
    return obs.dropDuplicates()


def signal_stats(obs: DataFrame) -> DataFrame:
    """A6: RSSI/distance distributions per (mac, ssid)."""
    return obs.groupBy("mac", "ssid").agg(
        F.min("rssi").alias("rssi_min"),
        F.max("rssi").alias("rssi_max"),
        F.round(F.avg("rssi"), 4).alias("rssi_avg"),
        F.round(F.stddev_samp("rssi"), 4).alias("rssi_std"),
        F.round(F.avg("dist"), 4).alias("dist_avg"),
        F.count(F.lit(1)).alias("n"),
    )


def distance_filter(obs: DataFrame, max_m: float) -> DataFrame:
    """P11: settings-driven distance filter (ssidentity.c:31)."""
    return obs.filter(F.col("dist") <= max_m)


def watchlist_hits(obs: DataFrame, watchlist: DataFrame) -> DataFrame:
    """J3/J6: tracking — observations of watchlisted devices (README.md:19).
    Watchlist is tiny → broadcast semi join; no shuffle of obs."""
    return obs.join(F.broadcast(watchlist.select("mac")), "mac", "left_semi")


def unknown_devices(obs: DataFrame, watchlist: DataFrame) -> DataFrame:
    """J3 anti: devices NOT on the watchlist."""
    return obs.join(F.broadcast(watchlist.select("mac")), "mac", "left_anti")


def ssid_locations(obs: DataFrame, ssid_geo: DataFrame) -> DataFrame:
    """J1: geolocate probed SSIDs via wardriving lookup (README.md:16).
    Left join keeps unmatched SSIDs (10 of 30 in fixtures)."""
    return obs.join(F.broadcast(ssid_geo), "ssid", "left")


def co_occurrence(obs: DataFrame, window: str = "30 seconds") -> DataFrame:
    """J2: companion devices — MAC pairs seen by the same sensor in the same
    time bucket (README.md:15-19 correlation network). Self-join on
    (sensor, bucket): both sides share one shuffle partitioning.

    ``n_cowindows`` counts DISTINCT time buckets, not (sensor, bucket)
    combinations: a pair caught once by k overlapping sensors is one
    instant of co-presence, not k units of "repeatedly travel together"
    support — counting combos would let a single multi-sensor sighting
    pass companion_clusters' repeat threshold."""
    b = obs.select(
        "mac", "sensor_id", F.window("ts", window).alias("w")
    ).dropDuplicates(["mac", "sensor_id", "w"])
    a, c = b.alias("a"), b.alias("c")
    return (
        a.join(
            c,
            (F.col("a.sensor_id") == F.col("c.sensor_id"))
            & (F.col("a.w") == F.col("c.w"))
            & (F.col("a.mac") < F.col("c.mac")),
        )
        .groupBy(F.col("a.mac").alias("mac_a"), F.col("c.mac").alias("mac_b"))
        .agg(F.countDistinct("a.w").alias("n_cowindows"))
    )


_GAP_UNITS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
}


def _gap_seconds(gap: str) -> int:
    """Parse a '<N> <unit>' duration into seconds, or raise — a silent
    default would sessionize with a wrong threshold and no error."""
    parts = gap.strip().split()
    if len(parts) == 2 and parts[0].isdigit() and parts[1].lower() in _GAP_UNITS:
        return int(parts[0]) * _GAP_UNITS[parts[1].lower()]
    raise ValueError(
        f"unsupported gap {gap!r} — expected '<N> "
        "seconds|minutes|hours' (e.g. '15 minutes')"
    )


def sessionize(obs: DataFrame, gap: str = "15 minutes") -> DataFrame:
    """W4: gap-based visit sessions per device (README.md:16-17).

    Gaps are measured in exact microseconds (timeutil.epoch_us — the
    NTZ-safe helper), so a 900.8 s gap splits the visit just like the
    plans-layer twin (w4_sessionize) instead of truncating to 900."""
    gap_us = _gap_seconds(gap) * 1_000_000
    w = Window.partitionBy("mac").orderBy("ts")
    gap_col = epoch_us("ts") - F.lag(epoch_us("ts")).over(w)
    flagged = obs.withColumn(
        "new_sess", F.when(gap_col.isNull() | (gap_col > gap_us), 1).otherwise(0)
    )
    with_id = flagged.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_id.groupBy("mac", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_probes"),
        F.sort_array(F.collect_set("sensor_id")).alias("sensors"),
    )


def arrivals(obs: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """W2: batch arrival detection — first sighting after an absence gap
    (README.md:19). The streaming twin is streaming/alerts.py (T7).
    Same parsed-gap + exact-microsecond semantics as :func:`sessionize`."""
    gap_us = _gap_seconds(gap) * 1_000_000
    w = Window.partitionBy("mac").orderBy("ts")
    prev = F.lag(epoch_us("ts")).over(w)
    return (
        obs.withColumn(
            "is_arrival",
            prev.isNull() | ((epoch_us("ts") - prev) > gap_us),
        )
        .filter(F.col("is_arrival"))
        .select("mac", "ts", "sensor_id", "rssi", "dist")
    )


def asof_last_seen(obs: DataFrame, probes: DataFrame) -> DataFrame:
    """J5: as-of join — for each probe time, the device's latest prior
    observation. Union + cumulative last_value idiom (no native as-of)."""
    left = probes.select(
        "mac", F.col("ts").alias("ts"), F.lit(1).alias("is_probe")
    )
    right = obs.select(
        "mac", "ts", F.lit(0).alias("is_probe")
    ).withColumn("obs_ts", F.col("ts"))
    unioned = left.unionByName(right, allowMissingColumns=True)
    w = (
        Window.partitionBy("mac")
        .orderBy("ts", "is_probe")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        unioned.withColumn("asof_ts", F.last("obs_ts", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select("mac", "ts", "asof_ts")
    )


def top_ssids(obs: DataFrame, k: int = 10) -> DataFrame:
    """A10/O2: most-probed SSIDs by distinct device count."""
    return (
        obs.groupBy("ssid")
        .agg(F.countDistinct("mac").alias("n_devices"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n_devices"), F.desc("n"), "ssid")
        .limit(k)
    )


def scalable_global_row_number(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int = 256,
    rn_col: str = "rn",
    n_col: str = "n_total",
) -> DataFrame:
    """Global row_number over ``order_cols`` WITHOUT a single-partition
    window (W1 at scale: ``Window.orderBy(...)`` with no partitionBy funnels
    the whole table through one task — a straggler/OOM at 100 TB).

    Two-pass bucketed rank:
      1. exact min/max of the leading order column (one partial+final agg);
      2. deterministic fixed-width bucket = floor((x-min)/width) — value-
         derived, so re-computation across plan branches cannot disagree
         (unlike repartitionByRange, whose sampled boundaries are not stable
         across recomputes, or approx-quantile boundaries);
      3. row_number within each bucket (parallel windows);
      4. bucket offsets via a cumulative sum over the <=n_buckets bucket
         counts — a single-partition window over a BUCKET-COUNT-sized input,
         broadcast-joined back.

    Ties across buckets are impossible: equal leading values share a bucket,
    and the remaining order columns only break ties inside it. The first
    order column must be numeric; output adds ``rn`` (1-based, dense over
    the whole frame) and ``n_total``. NULL leading values get their own
    bucket BELOW bucket 0 so they rank first, matching ``Window.orderBy``'s
    ascending NULLS FIRST (min/max ignore NULLs, and the naive floor()
    expression would otherwise drop NULL rows into the TOP bucket via
    F.least's null-skipping).

    Plan note: attaching the 1-ROW stats aggregate is a condition-less
    broadcast join, which Spark prints as BroadcastNestedLoopJoin — with a
    single-row build side that is O(n) work (one row tested per input row),
    not a pair-space join; PLANS.md's BNLJ flag on w1_distribution_ranks is
    this, by design.
    """
    lead = order_cols[0]
    stats = df.agg(
        F.min(lead).alias("_mn"),
        F.max(lead).alias("_mx"),
        F.count(F.lit(1)).alias(n_col),
    )
    with_stats = df.join(F.broadcast(stats))
    width = (F.col("_mx") - F.col("_mn")) / F.lit(n_buckets)
    bucket = (
        F.when(F.col(lead).isNull(), F.lit(-1))
        .when(F.col("_mx") == F.col("_mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor((F.col(lead) - F.col("_mn")) / width),
            )
        )
    )
    bucketed = with_stats.withColumn("_bucket", bucket).drop("_mn", "_mx")
    w_local = Window.partitionBy("_bucket").orderBy(*order_cols)
    ranked = bucketed.withColumn("_rn_local", F.row_number().over(w_local))
    counts = bucketed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_bn"))
    w_off = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_bucket", F.coalesce(F.sum("_bn").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        ranked.join(F.broadcast(offsets), "_bucket")
        .withColumn(rn_col, (F.col("_off") + F.col("_rn_local")).cast("long"))
        .drop("_bucket", "_rn_local", "_off")
    )


def ntile_from_rn(rn, n, tiles: int):
    """ntile(tiles) reconstructed from a global row number: the first
    ``n % tiles`` tiles get ``n div tiles + 1`` rows, the rest ``n div
    tiles`` (SQL-standard ntile distribution)."""
    q = F.floor(n / tiles)
    rem = n % tiles
    big = q + 1
    cutoff = rem * big
    return F.when(rn <= cutoff, F.ceil(rn / big)).otherwise(
        rem + F.ceil((rn - cutoff) / F.greatest(q, F.lit(1)))
    )
