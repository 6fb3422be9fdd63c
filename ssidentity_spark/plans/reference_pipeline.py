"""The reference's own pipeline surface as driver-visible queries.

r5 (VERDICT r4 ask #3): these queries carry REAL hash oracles. Each one
snapshots its deterministic fixture input (seed=42 — FIXTURES.md) to
``.fixture_snapshots/*.parquet`` when invoked and the DuckDB oracle
``read_parquet()``s that file. The correctness gate always executes the
Spark side first (tools/check_correctness.py run_one), so the snapshot
exists by the time the oracle SQL runs.

What the gate verifies differs per query — be precise about the claim:

- ``ref_visit_sessions`` / ``ref_companion_clusters`` /
  ``ref_watchlist_alerts``: the Spark plan READS the snapshot parquet, so
  both engines consume byte-identical inputs and the full analytic is
  independently recomputed (window SQL / recursive CTE) — a genuine
  two-engine gate.
- ``ref_parse_pipeline``: the snapshot is Spark's OWN parsed output fed
  back to the oracle. The byte-level field extraction therefore cannot be
  caught here (a byte-offset bug reproduces identically on both sides);
  what the oracle independently verifies is every DERIVATION over the
  extracted fields — ts_str formatting, mac u64→hex render, FSPL distance.
  The extraction itself is held by the golden/property tests in
  tests/test_parse.py against hand-built frames.
- ``ref_trilateration`` / ``ref_trilateration_inputs``: the Spark solver
  runs over the live fixture frame (the snapshot is the same deterministic
  content written for the oracle); the closed-form 2×2 normal-equation
  oracle (r6) independently re-derives the solve, and pytest truth tests
  hold the geometry (tests/test_trilateration.py).

They ignore ``sf_dir`` by design; pytest holds the parser's strong golden /
property assertions (tests/test_parse.py, test_operators.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssidentity_spark.fixtures import SNAPSHOT_DIR
from ssidentity_spark.registry import register


def _snap(name: str) -> str:
    return os.path.join(SNAPSHOT_DIR, f"{name}.parquet")


# DuckDB FSPL derivation — same expression family as the driver-green
# d1_fspl_distance oracle (plans/scalars.py:27).
_FSPL_SQL = "round(pow(10, (27.55 - rssi - 20 * log10(freq)) / 20), 2)"


@register(
    "ref_parse_pipeline",
    # The byte-level field extraction itself has no DuckDB analog (binary
    # 802.11 frames — goldens/properties live in tests/test_parse.py), but
    # every DERIVATION over the extracted fields is pure SQL: the oracle
    # recomputes ts_str formatting (D3), the MAC u64→hex render (D4/D5),
    # and the FSPL distance (D1/D6) from the snapshot's raw columns and
    # must reproduce the Spark plan's output bit-for-bit.
    oracle=f"""
    SELECT ts,
           upper(strftime(ts, '%m/%d/%y - %I:%M%p')) AS ts_str,
           sensor_id,
           lpad(upper(to_hex(mac_u64)), 12, '0') AS mac,
           ssid,
           rssi,
           freq,
           {_FSPL_SQL} AS dist,
           ssid_was_escaped
    FROM read_parquet('{_snap("parse_obs_200")}')
    """,
    survey="P1-P12,D1-D6,S1,S2",
)
def ref_parse_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw 802.11 frames → parsed observations (the whole reference program,
    ssidentity.c:65-117, as one declarative plan)."""
    from ssidentity_spark.fixtures import raw_frames_df, snapshot_fixture
    from ssidentity_spark.parse import parse_observations

    parsed = parse_observations(raw_frames_df(spark, n_extra=200))
    # snapshot the raw extracted fields (mac as u64 so the oracle exercises
    # the opposite direction of the hex render round-trip)
    base = parsed.select(
        "ts",
        "sensor_id",
        F.conv("mac", 16, 10).cast("long").alias("mac_u64"),
        "ssid",
        "rssi",
        "freq",
        "ssid_was_escaped",
    )
    snapshot_fixture("parse_obs_200", lambda: base.toPandas())
    return parsed


@register(
    "ref_trilateration",
    # Closed-form least-squares oracle (VERDICT r5 ask #2): the solver's
    # linearized system (operators/trilateration.py:_solve_group) has only
    # 2 unknowns, so numpy's lstsq is — for the full-rank geometry this
    # fixture guarantees (rank pinned by tests/test_trilateration.py) —
    # exactly the 2×2 normal-equation solve p = (AᵀA)⁻¹Aᵀb, which IS SQL:
    # sums of products per (mac, window) and a closed-form 2×2 inverse.
    # DuckDB re-derives the local-meters frame (x/y offsets from the
    # sensor-mean origin, mlon scaled by cos(lat₀)), the A·p=b rows
    # (first-sensor circle subtracted, sensors ordered by sensor_id — the
    # same order pandas' sorted groupby gives numpy), the solve, and the
    # all-sensor RMSE, from the same obs + sensors snapshots. lat/lon are
    # rounded to 4 dp and rmse to 1 dp on both engines, absorbing the
    # SVD-vs-normal-equations float tail.
    oracle=f"""
    WITH o AS (SELECT * FROM read_parquet('{_snap("trilat_obs")}')),
    s AS (SELECT * FROM read_parquet('{_snap("trilat_sensors")}')),
    g AS (
      SELECT o.mac, CAST(floor(epoch(o.ts) / 30) AS BIGINT) AS w,
             o.sensor_id, s.lat AS s_lat, s.lon AS s_lon, avg(o.dist) AS d
      FROM o JOIN s ON o.sensor_id = s.sensor_id
      GROUP BY 1, 2, 3, 4, 5
    ), c AS (
      SELECT mac, w, avg(s_lat) AS lat0, avg(s_lon) AS lon0,
             CAST(count(*) AS INTEGER) AS n
      FROM g GROUP BY 1, 2
    ), xy AS (
      SELECT g.mac, g.w,
             (g.s_lon - c.lon0) * (111320.0 * cos(radians(c.lat0))) AS x,
             (g.s_lat - c.lat0) * 111320.0 AS y,
             g.d,
             row_number() OVER (PARTITION BY g.mac, g.w
                                ORDER BY g.sensor_id) AS rn
      FROM g JOIN c ON g.mac = c.mac AND g.w = c.w
    ), ref AS (
      SELECT mac, w, x AS x1, y AS y1, d AS d1 FROM xy WHERE rn = 1
    ), ab AS (
      SELECT xy.mac, xy.w,
             2 * (x - x1) AS a1, 2 * (y - y1) AS a2,
             (d1 * d1 - d * d) + (x * x - x1 * x1) + (y * y - y1 * y1) AS b
      FROM xy JOIN ref ON xy.mac = ref.mac AND xy.w = ref.w
      WHERE xy.rn > 1
    ), ne AS (
      SELECT mac, w,
             sum(a1 * a1) AS sxx, sum(a1 * a2) AS sxy, sum(a2 * a2) AS syy,
             sum(a1 * b) AS sxb, sum(a2 * b) AS syb
      FROM ab GROUP BY 1, 2
    ), sol AS (
      SELECT mac, w,
             (syy * sxb - sxy * syb) / (sxx * syy - sxy * sxy) AS px,
             (sxx * syb - sxy * sxb) / (sxx * syy - sxy * sxy) AS py
      FROM ne
    ), res AS (
      SELECT xy.mac, xy.w,
             sqrt(avg(pow(sqrt((xy.x - p.px) * (xy.x - p.px)
                             + (xy.y - p.py) * (xy.y - p.py)) - xy.d, 2)))
               AS rmse
      FROM xy JOIN sol p ON xy.mac = p.mac AND xy.w = p.w
      GROUP BY 1, 2
    )
    SELECT c.mac,
           round(c.lat0 + p.py / 111320.0, 4) AS lat,
           round(c.lon0 + p.px / (111320.0 * cos(radians(c.lat0))), 4) AS lon,
           c.n AS n_sensors,
           round(r.rmse, 1) AS rmse_m
    FROM c
    JOIN sol p ON c.mac = p.mac AND c.w = p.w
    JOIN res r ON c.mac = r.mac AND c.w = r.w
    """,
    survey="U2,A5,J1",
)
def ref_trilateration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Known-truth observations → least-squares positions (ssidentity.c:35)."""
    from ssidentity_spark.fixtures import (
        SENSORS,
        sensors_df,
        snapshot_fixture,
        trilat_truth_observations,
    )
    from ssidentity_spark.operators.trilateration import trilaterate

    obs, _ = trilat_truth_observations(spark)
    import pandas as pd

    snapshot_fixture("trilat_obs", lambda: obs.toPandas())
    snapshot_fixture(
        "trilat_sensors",
        pd.DataFrame(list(SENSORS), columns=["sensor_id", "lat", "lon"]),
    )
    est = trilaterate(obs, sensors_df(spark))
    return est.select(
        "mac",
        F.round("lat", 4).alias("lat"),
        F.round("lon", 4).alias("lon"),
        "n_sensors",
        F.round("rmse_m", 1).alias("rmse_m"),
    )


@register(
    "ref_trilateration_inputs",
    # The SQL-expressible half of A5 (VERDICT r4 ask #9): the per-mac
    # aggregation that feeds the lstsq solver — sensor fan-in, distance
    # stats per (mac, sensor). Only the numpy solve stays un-oracled.
    oracle=f"""
    SELECT mac,
           sensor_id,
           CAST(count(*) AS BIGINT) AS n_obs,
           round(avg(dist), 2) AS avg_dist,
           round(min(dist), 2) AS min_dist
    FROM read_parquet('{_snap("trilat_obs")}')
    GROUP BY mac, sensor_id
    """,
    survey="A5,A7",
)
def ref_trilateration_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The solver's input aggregation (ssidentity.c:30-35 reads per-sensor
    distance estimates): per (mac, sensor) observation rollup, the exact
    frame trilaterate() consumes before the applyInPandas lstsq."""
    from ssidentity_spark.fixtures import snapshot_fixture, trilat_truth_observations

    obs, _ = trilat_truth_observations(spark)
    snapshot_fixture("trilat_obs", lambda: obs.toPandas())
    snapped = spark.read.parquet(_snap("trilat_obs"))
    return snapped.groupBy("mac", "sensor_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(F.avg("dist"), 2).alias("avg_dist"),
        F.round(F.min("dist"), 2).alias("min_dist"),
    )


@register(
    "ref_visit_sessions",
    # Gap-sessionization re-expressed in DuckDB window SQL over the same
    # snapshot. Tie-safety: the only duplicate (mac, ts) key in the fixture
    # is the fully-identical golden pair (pinned by
    # tests/test_testdata_contracts.py::test_observation_ties_are_identical),
    # so window tie order cannot change any aggregate below.
    oracle=f"""
    WITH o AS (SELECT * FROM read_parquet('{_snap("observations_2000")}')),
    flagged AS (
      SELECT mac, ts, sensor_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER w) > 900
             THEN 1 ELSE 0 END AS new_sess
      FROM o
      WINDOW w AS (PARTITION BY mac ORDER BY ts)
    ), ids AS (
      SELECT mac, ts, sensor_id,
             sum(new_sess) OVER (
               PARTITION BY mac ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    )
    SELECT mac,
           CAST(session_id AS BIGINT) AS session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start,
           CAST(count(*) AS BIGINT) AS n_probes,
           array_to_string(list_sort(list_distinct(list(sensor_id))), ',')
             AS sensors
    FROM ids
    GROUP BY mac, session_id
    """,
    survey="W4,A2",
)
def ref_visit_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based visit sessions over the observation fixture (README.md:16-17)."""
    from ssidentity_spark.fixtures import observations_pdf, snapshot_fixture
    from ssidentity_spark.operators.analytics import sessionize

    snapshot_fixture("observations_2000", lambda: observations_pdf(2000))
    obs = spark.read.parquet(_snap("observations_2000")).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    sess = sessionize(obs, gap="15 minutes")
    return sess.select(
        "mac",
        "session_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("start"),
        "n_probes",
        F.array_join("sensors", ",").alias("sensors"),
    )


@register(
    "ref_companion_clusters",
    # Co-occurrence edges + connected components, both re-derived in SQL:
    # the tumbling 30 s bucket is floor(epoch/30) (equality-identical to
    # Spark's window struct), and the fixpoint is a recursive CTE — the
    # same independent-algorithm pattern as the driver-green
    # dedup_cc_clusters oracle (plans/dedup.py).
    oracle=f"""
    WITH RECURSIVE
    o AS (SELECT * FROM read_parquet('{_snap("observations_800")}')),
    b AS (
      SELECT DISTINCT mac, sensor_id,
             CAST(floor(epoch(ts) / 30) AS BIGINT) AS w
      FROM o
    ),
    pairs AS (
      SELECT a.mac AS mac_a, c.mac AS mac_b
      FROM b a JOIN b c
        ON a.sensor_id = c.sensor_id AND a.w = c.w AND a.mac < c.mac
      GROUP BY 1, 2
      -- DISTINCT buckets, mirroring co_occurrence's n_cowindows: one
      -- multi-sensor instant is one unit of co-presence support
      HAVING count(DISTINCT a.w) >= 1
    ),
    edges AS (
      SELECT mac_a AS u, mac_b AS v FROM pairs
      UNION
      SELECT mac_b, mac_a FROM pairs
    ),
    reach(u, label) AS (
      SELECT u, u AS label FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.u
    ),
    comp AS (SELECT u AS vertex, min(label) AS component FROM reach GROUP BY u)
    SELECT component,
           array_to_string(list_sort(list(vertex)), ',') AS members,
           CAST(count(*) AS BIGINT) AS n_members
    FROM comp
    GROUP BY component
    """,
    survey="J2,A3 (correlation network)",
)
def ref_companion_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Devices that repeatedly co-occur → connected components
    (README.md:15-19 correlation network)."""
    from ssidentity_spark.fixtures import observations_pdf, snapshot_fixture
    from ssidentity_spark.operators.graph import companion_clusters

    snapshot_fixture("observations_800", lambda: observations_pdf(800))
    obs = spark.read.parquet(_snap("observations_800")).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    clusters = companion_clusters(obs, window="30 seconds", min_cowindows=1)
    return clusters.select(
        "component",
        F.array_join("members", ",").alias("members"),
        "n_members",
    )


@register(
    "ref_watchlist_alerts",
    # Watchlist semi-join + absence-gap arrival detection in window SQL.
    # The watchlist is the 5 lexicographically-smallest observed macs
    # (fixtures.watchlist_df keeps observed_macs[:5] and pads ghost
    # entries that match nothing), so the oracle's IN-list is the same
    # deterministic set.
    oracle=f"""
    WITH o AS (SELECT * FROM read_parquet('{_snap("observations_2000")}')),
    wl AS (SELECT DISTINCT mac FROM o ORDER BY mac LIMIT 5),
    hits AS (SELECT * FROM o WHERE mac IN (SELECT mac FROM wl)),
    flagged AS (
      SELECT mac, ts, sensor_id, dist,
             lag(ts) OVER (PARTITION BY mac ORDER BY ts) AS prev_ts
      FROM hits
    )
    SELECT mac,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS arrived_at,
           sensor_id,
           round(dist, 2) AS dist
    FROM flagged
    WHERE prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
    """,
    survey="J3,J6,W2",
)
def ref_watchlist_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival events for watchlisted devices (README.md:19): batch twin of
    the T7 streaming alert path."""
    from ssidentity_spark.fixtures import (
        observations_pdf,
        snapshot_fixture,
        watchlist_df,
    )
    from ssidentity_spark.operators.analytics import arrivals, watchlist_hits

    snapshot_fixture("observations_2000", lambda: observations_pdf(2000))
    obs = spark.read.parquet(_snap("observations_2000")).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    macs = [
        r.mac
        for r in obs.select("mac").distinct().orderBy("mac").limit(10).collect()
    ]
    hits = watchlist_hits(obs, watchlist_df(spark, macs))
    return arrivals(hits, gap="30 minutes").select(
        "mac",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("arrived_at"),
        "sensor_id",
        F.round("dist", 2).alias("dist"),
    )
