"""Capture .explain("formatted") for named queries to plans/r12/<name>_<tag>.txt.

Usage: python tools/capture_plans.py <tag> <query> [query ...]
Scale dir: sf0.001 (plan shape only — same plan family as sf0.1; AQE
runtime re-optimization is not visible pre-execution at any SF).
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ssidentity_spark.registry import REGISTRY, _ensure_loaded
from ssidentity_spark.session import get_spark

def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    _ensure_loaded()
    spark = get_spark("plan-capture", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, "/root/testdata/sf0.001")
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print("captured", name, flush=True)
    spark.stop()

if __name__ == "__main__":
    main()
