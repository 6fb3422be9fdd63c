"""Trilateration (SURVEY §2.9 U2): least-squares device position from
per-sensor FSPL distance estimates.

Reference impetus: the SERVER TODO "Add Triangulation (Trilateration
Estimation)" (/root/reference/ssidentity.c:35) over the multi-sensor fleet
(README.md:13,16). The reference never implemented it; this is the Spark
restatement: A5 aggregation (per mac × time-window set of (sensor, dist))
joined to the sensors dim, solved per group with numpy least squares inside
``applyInPandas`` — genuinely Python-worthy numerics, Arrow-batched, grouped
by (mac, window) so work distributes across executors.

Degenerate geometry (<3 sensors, collinear sensors → singular normal
equations) falls back to the distance-weighted centroid.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import StructField, StructType

from ssidentity_spark.schemas import POSITIONS_SCHEMA

METERS_PER_DEG_LAT = 111_320.0

# names/types come from the ONE shared definition, but nullability is
# relaxed: a group keyed by a NULL mac or NULL ts (→ NULL window) must
# come back as a null-keyed row, not crash the pandas→Arrow conversion
# against a non-nullable field
RESULT_SCHEMA = StructType(
    [StructField(f.name, f.dataType, True) for f in POSITIONS_SCHEMA]
)


def _solve_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mac = pdf["mac"].iloc[0]
    wstart = pdf["window_start"].iloc[0]
    # average distance per sensor within the window (A5 output may hold
    # several readings per sensor)
    g = pdf.groupby(["sensor_id", "s_lat", "s_lon"], as_index=False)["dist"].mean()
    n = len(g)
    lat0 = g["s_lat"].mean()
    mlat = METERS_PER_DEG_LAT
    mlon = METERS_PER_DEG_LAT * np.cos(np.radians(lat0))
    x = (g["s_lon"].to_numpy() - g["s_lon"].mean()) * mlon
    y = (g["s_lat"].to_numpy() - g["s_lat"].mean()) * mlat
    d = g["dist"].to_numpy()

    def centroid() -> tuple[float, float]:
        w = 1.0 / np.maximum(d, 1.0)
        cx = float((x * w).sum() / w.sum())
        cy = float((y * w).sum() / w.sum())
        return cx, cy

    px = py = None
    if n >= 3:
        # linearized trilateration: subtract the first circle equation
        # (x-xi)^2 + (y-yi)^2 = di^2 from the rest → A p = b
        A = np.column_stack([2 * (x[1:] - x[0]), 2 * (y[1:] - y[0])])
        b = (d[0] ** 2 - d[1:] ** 2) + (x[1:] ** 2 - x[0] ** 2) + (y[1:] ** 2 - y[0] ** 2)
        # rank check catches collinear sensor triples (singular geometry)
        if np.linalg.matrix_rank(A) >= 2:
            sol, *_ = np.linalg.lstsq(A, b, rcond=None)
            px, py = float(sol[0]), float(sol[1])
    if px is None:
        px, py = centroid()
    resid = np.sqrt((x - px) ** 2 + (y - py) ** 2) - d
    rmse = float(np.sqrt(np.mean(resid**2)))
    lat = g["s_lat"].mean() + py / mlat
    lon = g["s_lon"].mean() + px / mlon
    return pd.DataFrame(
        {
            "mac": [mac],
            "window_start": [wstart],
            "lat": [float(lat)],
            "lon": [float(lon)],
            "n_sensors": [int(n)],
            "rmse_m": [rmse],
        }
    )


def trilaterate(
    obs: DataFrame, sensors: DataFrame, window: str = "30 seconds"
) -> DataFrame:
    """A5 + U2: per (mac, window) position estimate.

    obs: OBSERVATIONS_SCHEMA rows; sensors: (sensor_id, lat, lon).
    The sensors dim is tiny → broadcast; the solve groups by (mac, window)
    so state per task is a handful of rows.
    """
    joined = obs.join(
        F.broadcast(
            sensors.select(
                "sensor_id",
                F.col("lat").alias("s_lat"),
                F.col("lon").alias("s_lon"),
            )
        ),
        "sensor_id",
    ).select(
        "mac",
        F.window("ts", window).start.alias("window_start"),
        "sensor_id",
        "s_lat",
        "s_lon",
        "dist",
    )
    # drop unusable readings BEFORE the solve: one NULL dist becomes NaN
    # in pandas and poisons the whole group's lstsq AND the centroid
    # fallback (NaN is not None, so the fallback never fires) — three
    # good sensors next to one bad reading would come back (NaN, NaN)
    usable = joined.where(F.col("dist").isNotNull() & ~F.isnan("dist"))
    return usable.groupBy("mac", "window_start").applyInPandas(
        _solve_group, schema=RESULT_SCHEMA
    )
