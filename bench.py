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

# Recorded per-query MEDIAN seconds from the last completed round's BENCH
# artifact (BENCH_r04.json, sf0.1, median-of-5) — emitted alongside fresh
# numbers so each round's artifact carries its own regression context
# (>1.3x flags a plan change). The three r5 EXT-family headliners
# (dedup_minhash_lsh_pairs, pipe_decontaminate, sim_ivfpq_rerank_topk) have
# no prior entry: their first medians land in BENCH_r05 and seed r6's gate.
PREV_ROUND = {
    "dedup_exact": 0.262,
    "flagship_hourly_top_types": 0.490,
    "j1_region_revenue": 1.119,
    "j4_range_join_funnel": 0.337,
    "j9_q3_top_orders": 0.657,
    "sim_topk_bruteforce": 0.526,
    "text_token_stats": 0.279,
    "tpch_q1_pricing_summary": 0.370,
    "tpch_q6_forecast_revenue": 0.205,
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
    # r5+: PREV_ROUND holds medians-of-5, so the regression gate is the
    # like-for-like median-vs-median ratio (the r4 transition round used
    # min-of-5 vs r02's best-of-3 while the statistics differed).
    gate_ratios = ratios
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
                "prev_round_stat": "median-of-5 (r04)",
                # r5 widened the headline set 9 → 12 (EXT families:
                # minhash-LSH, decontamination, IVFPQ+rerank), so the
                # TOTAL is not comparable round-over-round — compare
                # ratio_vs_prev per query; the 3 new names seed r6.
                "headliners_added_r5": sorted(
                    n for n in timings if n not in PREV_ROUND
                ),
                "ratio_vs_prev": ratios,
                "regressions_over_1.3x": sorted(
                    n for n, r in gate_ratios.items() if r > 1.3
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
