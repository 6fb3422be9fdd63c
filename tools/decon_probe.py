"""A/B probe for the pipe_decontaminate drift (VERDICT r9 ask #4).

Three conditions, one fresh session each:
  A. isolated: canary (tpch_q6) then pipe_decontaminate then
     dedup_semantic_cells, median-of-7 after 2 warmups.
  B. bench-replica: the full 19-headliner warm-up pass first (exactly
     what bench.py does), THEN the same three timed — measures the
     session-state cost the full bench imposes.
  C. bench-replica + clearCache before each timed run — isolates
     block-manager/cache pressure from other session state.
"""
import statistics, sys, time
sys.path.insert(0, "/root/repo")
from ssidentity_spark.registry import bench_queries
from ssidentity_spark.session import cpu_count, get_spark

COND = sys.argv[1]
sf_dir = "/root/testdata/sf0.1"
spark = get_spark("decon-probe", cores=cpu_count())
spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
spark.conf.set("spark.sql.shuffle.partitions", str(cpu_count()))
specs = bench_queries()
TIMED = ["tpch_q6_forecast_revenue", "pipe_decontaminate", "dedup_semantic_cells"]

if COND in ("B", "C"):
    for spec in specs.values():
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

out = {}
for name in TIMED:
    fn = specs[name].fn
    for _ in range(2):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    samples = []
    for _ in range(7):
        if COND == "C":
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    out[name] = (round(statistics.median(samples), 3), round(statistics.stdev(samples), 3))
print(COND, out, flush=True)
spark.stop()
