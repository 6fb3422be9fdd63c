"""Headline benchmark — one JSON line for the driver.

Runs the bench-tagged queries from the registry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], forcing full
evaluation through the noop sink (no driver-side collect), and prints:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "per_query": {name: {"median": s, "stddev": s, "n": 5}, ...}}

Methodology (VERDICT r2 ask #4): one discarded warm-up pass (JIT + codegen
+ parquet footer caches), then n=5 timed runs per query; the headline
number and the regression gate both use the MEDIAN, and per-query stddev
ships in the artifact so sub-second flags are falsifiable (r2's 1.2x
"regressions" on two scan-bound queries were best-of-2 noise).
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ssidentity_spark.registry import bench_queries  # noqa: E402
from ssidentity_spark.session import cpu_count, get_spark  # noqa: E402

N_RUNS = 5

# Recorded per-query seconds from the last completed round's BENCH artifact
# (BENCH_r02.json, sf0.1 — r3's run crashed before timing) — emitted
# alongside fresh numbers so each round's artifact carries its own
# regression context (>1.3x flags a plan change). r02 numbers are best-of-3;
# from r4 on these are medians-of-5.
PREV_ROUND = {
    "dedup_exact": 0.244,
    "flagship_hourly_top_types": 0.518,
    "j1_region_revenue": 0.994,
    "j4_range_join_funnel": 0.348,
    "j9_q3_top_orders": 0.631,
    "sim_topk_bruteforce": 0.611,
    "text_token_stats": 0.291,
    "tpch_q1_pricing_summary": 0.349,
    "tpch_q6_forecast_revenue": 0.246,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("ssidentity-bench", cores=cpu_count())
    # testdata files are ~1-10 MB: split smaller so scans parallelize across
    # local cores (cluster deployments keep the 128 MB default)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
    # sf0.1 shuffles are KBs-per-partition: one wave of cores-many tasks
    # beats 2x-cores of scheduler overhead (AQE still coalesces below this)
    spark.conf.set("spark.sql.shuffle.partitions", str(cpu_count()))
    specs = bench_queries()

    # full warm-up pass: JIT + codegen + parquet footer caches — measured
    # numbers reflect steady-state engine throughput, not JVM startup
    for spec in specs.values():
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    per_query: dict[str, dict[str, float]] = {}
    for name, spec in sorted(specs.items()):
        samples: list[float] = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        timings[name] = round(med, 3)
        per_query[name] = {
            "median": round(med, 3),
            "stddev": round(statistics.stdev(samples), 3),
            "min": round(min(samples), 3),
            "n": N_RUNS,
        }
    total = round(sum(timings.values()), 3)
    ratios = {
        name: round(t / PREV_ROUND[name], 2)
        for name, t in timings.items()
        if name in PREV_ROUND
    }
    # TRANSITION-ROUND gate: PREV_ROUND carries r02's best-of-3 numbers, so
    # the like-for-like regression statistic this round is min-of-5 vs that
    # best (median-vs-best systematically overstates by the noise floor).
    # Once PREV_ROUND holds medians (r5+), switch the gate to `ratios`.
    # Note also that the driver REGENERATED the testdata parquet in r3
    # (timestamp columns became TIMESTAMP_NTZ), so prior-round numbers are
    # not byte-identical inputs either.
    gate_ratios = {
        name: round(per_query[name]["min"] / PREV_ROUND[name], 2)
        for name in timings
        if name in PREV_ROUND
    }
    print(
        json.dumps(
            {
                "metric": "headline-queries wall time (noop sink, local)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "per_query": per_query,
                "sf": sf,
                "prev_round": PREV_ROUND,
                "prev_round_stat": "best-of-3 (r02)",
                "ratio_vs_prev": ratios,
                "ratio_min_vs_prev_best": gate_ratios,
                "regressions_over_1.3x": sorted(
                    n for n, r in gate_ratios.items() if r > 1.3
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
