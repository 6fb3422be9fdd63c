"""Skew study for the span-dedup exchange (VERDICT r8 ask #4).

The dedup_span_exact shuffle key is the gram; a boilerplate-heavy
corpus concentrates window mass on few grams. This probe PLANTS the
named worst case — a corpus where ~90% of all stride-1 windows are ONE
gram (docs whose text is a single repeated character) — and times the
three plan shapes in plans/dedup.span_profile on it and on the real
(uniform) corpus at the same replication factor:

- repartition: the r8 original (explicit gram exchange of raw windows)
- twophase:    partial+final agg on (gram, doc_id), window over gd
- salted:      twophase + salted ndocs join (no per-gram colocation)

Every variant's output is cross-checked against the others (same
multiset) before a timing is reported, so a fast-but-wrong plan can't
win. Results land in SCALE.md.

Usage: python tools/span_skew.py [sf_dir] [factor] [salt]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssidentity_spark.io import load_table  # noqa: E402
from ssidentity_spark.plans.dedup import span_profile  # noqa: E402
from ssidentity_spark.session import cpu_count, get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FACTOR = int(sys.argv[2]) if len(sys.argv) > 2 else 10
SALT = int(sys.argv[3]) if len(sys.argv) > 3 else 16
MODES = ("repartition", "twophase", "salted")


def _planted(spark, docs, factor: int, skewed: bool):
    """Replicate the corpus ``factor``x; in skewed mode, replace 90% of
    docs' text with a repeated single char — every window of those docs
    is the SAME 40-char gram, so ~90% of total window mass is one key."""
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    blown = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * 1000 + F.col("rep")).alias("doc_id"),
        (
            F.when(
                F.col("doc_id") % 10 < 9, F.repeat(F.lit("a"), F.lit(300))
            ).otherwise(F.col("text"))
            if skewed
            else F.col("text")
        ).alias("text"),
    )
    tmp = tempfile.mkdtemp(prefix="span_skew_")
    blown.write.mode("overwrite").parquet(os.path.join(tmp, "documents.parquet"))
    return tmp


def main() -> None:
    spark = get_spark("span-skew", cores=cpu_count())
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(cpu_count()))
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    print(f"factor={FACTOR} salt={SALT} sf={SF_DIR}")
    print("| corpus | mode | out rows | total windows | dup frac | sec |")
    print("|---|---|---|---|---|---|")
    for skewed in (True, False):
        tmp = _planted(spark, docs, FACTOR, skewed)
        try:
            d = spark.read.parquet(os.path.join(tmp, "documents.parquet"))
            baseline = None
            for mode in MODES:
                t0 = time.perf_counter()
                agg = (
                    span_profile(d, mode=mode, salt=SALT)
                    .agg(
                        F.count(F.lit(1)).alias("rows"),
                        F.sum("n_windows").alias("w"),
                        F.sum("n_dup_windows").alias("dw"),
                        # order-insensitive content check across modes
                        F.sum(F.hash("doc_id", "n_windows", "n_dup_windows"))
                        .alias("sig"),
                    )
                    .collect()[0]
                )
                dt = time.perf_counter() - t0
                if baseline is None:
                    baseline = agg["sig"]
                assert agg["sig"] == baseline, f"{mode} diverged"
                print(
                    f"| {'planted-90%-one-gram' if skewed else 'uniform'} "
                    f"| {mode} | {agg['rows']} | {agg['w']} "
                    f"| {agg['dw'] / agg['w']:.4f} | {dt:.2f} |"
                )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
