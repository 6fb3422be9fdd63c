"""Time-series regularization queries (hypertable-rollup family) over
``events``.

Reference impetus: every declared analytic over the sniffer's observation
stream (habitual movements / active hours / distance tracking,
/root/reference/README.md:15-18) consumes an IRREGULAR per-device series;
a regular grid with interpolated gaps is the canonical first rollup.
``events`` stands in for the observation stream (user_id ~ MAC, value ~
RSSI-like measure), as everywhere in plans/analytics.py.

Determinism contract with the oracle (the reason this family can be
hash-gated at all): bucket means are exact DECIMAL sums divided once, the
linear blend is written with a pinned operation order, and the final round
happens on both engines — see operators/timeseries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ssidentity_spark.io import load_table
from ssidentity_spark.operators.timeseries import resample_interpolate
from ssidentity_spark.registry import register

_BUCKET = 4 * 3600  # 4-hour grid: ~37% bucket occupancy at sf0.01 — the
# interpolation path (not just the pass-through) carries most rows


@register(
    "ts_gapfill_interpolate",
    # DuckDB recomputes the full pipeline: bucket means (decimal-exact),
    # per-key dense grid via generate_series, bracketing observed points
    # via IGNORE NULLS windows, and the same fixed-order linear blend.
    oracle=f"""
    WITH obs AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / {_BUCKET}) * {_BUCKET} AS BIGINT) AS bucket,
             CAST(sum(CAST(value AS DECIMAL(20,2))) AS DOUBLE) / count(*)
               AS obs_val
      FROM events
      WHERE user_id % 5 = 0
      GROUP BY 1, 2
    ), span AS (
      SELECT user_id, min(bucket) AS b0, max(bucket) AS b1 FROM obs GROUP BY 1
    ), grid AS (
      SELECT user_id, CAST(unnest(generate_series(b0, b1, {_BUCKET})) AS BIGINT)
               AS bucket
      FROM span
    ), dense AS (
      SELECT g.user_id, g.bucket, o.obs_val
      FROM grid g LEFT JOIN obs o USING (user_id, bucket)
    ), br AS (
      SELECT user_id, bucket, obs_val,
             last_value(obs_val IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN obs_val IS NOT NULL THEN bucket END
                        IGNORE NULLS) OVER wp AS pb,
             first_value(obs_val IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN obs_val IS NOT NULL THEN bucket END
                         IGNORE NULLS) OVER wn AS nb
      FROM dense
      WINDOW wp AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket,
           round(CASE WHEN obs_val IS NOT NULL THEN obs_val
                      WHEN pv IS NULL THEN nv
                      WHEN nv IS NULL THEN pv
                      ELSE pv + (nv - pv)
                           * (CAST(bucket - pb AS DOUBLE)
                              / CAST(nb - pb AS DOUBLE))
                 END, 6) AS value_interp,
           obs_val IS NULL AS gap_filled
    FROM br
    """,
    survey="EXT-timeseries,A1,W3",
    bench=True,  # r6 headliner: the output-bound grid/window shape no
    # other headliner exercises (seeds its baseline this round)
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Irregular event values → dense 4-hour grid with linear fill, for a
    deterministic 1-in-5 user cohort (bounds the gate's compare size; the
    operator itself is cohort-agnostic)."""
    e = load_table(spark, sf_dir, "events").where("user_id % 5 = 0")
    return resample_interpolate(e, "user_id", "ts", "value", _BUCKET)
