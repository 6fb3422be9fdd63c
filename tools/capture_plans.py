"""Capture .explain("formatted") for named queries to plans/<round>/<name>_<tag>.txt.

Usage: python tools/capture_plans.py [--round rNN] [--sf-dir DIR] <tag> <query> [query ...]
Env fallbacks: SPARK_GRAFT_PLAN_ROUND (default r13), SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.001 — plan shape only; same plan family as
sf0.1, AQE runtime re-optimization is not visible pre-execution at any SF).

r13 (ADVICE r12): the scale dir and round are arguments/env instead of
hardcoded, and the plan string comes from the public explain() API
(captured via redirect) instead of private JVM internals.
"""
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ssidentity_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from ssidentity_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    """Formatted physical plan via the public DataFrame.explain API."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    args = sys.argv[1:]
    rnd = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r13")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_PLANS", "/root/testdata/sf0.001")
    while args and args[0].startswith("--"):
        flag = args.pop(0)
        if flag == "--round":
            rnd = args.pop(0)
        elif flag == "--sf-dir":
            sf_dir = args.pop(0)
        else:
            raise SystemExit(f"unknown flag {flag}")
    tag = args[0]
    names = args[1:]
    _ensure_loaded()
    spark = get_spark("plan-capture", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = explain_formatted(df)
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print("captured", name, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
