"""Scale-shape probe for the late-r11 time-series trio (TS6/TS7/TS8):
ts_seasonal_strength, ts_changepoint_amoc, ts_acf across the three SFs
(events 1x/10x/100x), caches cleared per run (the persisted-subtree
timing lesson).

Claims under test (SCALE.md):
- TS6: both aggregates map-side combine and the hour key space is
  period-bounded → wall time scales like the events scan, output rows
  = users.
- TS7: one keyed exchange; per-key cost is the sort (O(n log n)) →
  linear-ish growth, output rows = users. The adversarial regime is a
  single key owning the whole corpus (one sort buffer) — same bound as
  ts_ema, stated not probed (testdata has no such key; the per-key
  series at sf0.1 is ~860 rows).
- TS8: per-key state is the full sorted series; the fold does
  LAGS+1 passes over it → linear in series length per key.
- X28 (pipe_winsorize): the rank window is the one corpus-scale sort,
  shared with the per-type count on a single exchange; the fence join
  is a broadcast → wall time should scale like the sort, output rows
  = types (constant).

Usage: python tools/ts_wave12_blowup.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssidentity_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from ssidentity_spark.session import get_spark  # noqa: E402

QUERIES = (
    "ts_seasonal_strength",
    "ts_changepoint_amoc",
    "ts_acf",
    "pipe_winsorize",
)


def main() -> None:
    _ensure_loaded()
    spark = get_spark("ts-wave12-blowup", cores=8)
    for sf in ("0.001", "0.01", "0.1"):
        sf_dir = f"/root/testdata/sf{sf}"
        n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
        cells = []
        for name in QUERIES:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            cells.append(
                f"{name.removeprefix('ts_').removeprefix('pipe_')}="
                f"({round(dt, 2)}s, {REGISTRY[name].fn(spark, sf_dir).count()} rows)"
            )
        print(f"sf{sf}: events={n_events} " + " ".join(cells))
    spark.stop()


if __name__ == "__main__":
    main()
