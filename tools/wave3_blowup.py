"""Blow-up probe for the r9 wave-3 operators (expectations gate, sharded
export, NB classifier): replicate sf0.1 documents at 1x / 10x / 30x with
disjoint doc_id spaces (per-key structure preserved) and time each
operator end-to-end — linear-in-corpus is the claim, measured not
asserted. Method as the earlier probes (SCALE.md): best-of-2 warm
timings, noop sink (export writes real parquet — the write IS the
operator), local[32].

Usage: python tools/wave3_blowup.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssidentity_spark.io import load_table  # noqa: E402
from ssidentity_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def blow_up(df: DataFrame, copies: int) -> DataFrame:
    parts = [
        df.withColumn("doc_id", F.col("doc_id") + F.lit(c * 10_000_000))
        for c in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(label: str, run) -> float:
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        run()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f} s", flush=True)
    return best


def main() -> None:
    from ssidentity_spark.operators.expectations import apply_expectations
    from ssidentity_spark.operators.export import export_shards
    from ssidentity_spark.plans.pipeline import _EXP_RULES
    from ssidentity_spark.plans.text import nb_classify

    spark = get_spark("wave3-blowup", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text", "lang", "n_chars"
    )

    for copies in (1, 10, 30):
        docs = blow_up(base, copies).cache()
        n = docs.count()
        print(f"\n-- {copies}x ({n} docs) --", flush=True)

        def run_exp():
            valid, quarantine, _ = apply_expectations(docs, _EXP_RULES)
            valid.write.format("noop").mode("overwrite").save()
            quarantine.write.format("noop").mode("overwrite").save()

        timed(f"expectations {copies}x", run_exp)

        def run_export():
            out = tempfile.mkdtemp(prefix="w3shards-")
            shutil.rmtree(out)
            try:
                export_shards(
                    docs.withColumn(
                        "_sk", F.md5(F.col("doc_id").cast("string"))
                    ),
                    out,
                    256,
                    ["_sk", "doc_id"],
                    bucket=F.substring(F.col("_sk"), 1, 1),
                )
            finally:
                shutil.rmtree(out, ignore_errors=True)

        timed(f"shard_export {copies}x", run_export)

        def run_nb():
            nb_classify(docs).write.format("noop").mode("overwrite").save()

        timed(f"nb_classifier {copies}x", run_nb)

        def run_lr():
            from ssidentity_spark.plans.text import logreg_train_score

            logreg_train_score(docs).write.format("noop").mode(
                "overwrite"
            ).save()

        timed(f"logreg_train {copies}x", run_lr)
        docs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
