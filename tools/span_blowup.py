"""Blow-up probe for exact substring-level dedup (dedup_span_exact):
runtime + structure at 1x / 3x / 10x / 30x corpus replication, in BOTH
replication modes — they stress opposite ends of the operator:

- ``salted``: each replica's words are re-joined with a replica-unique
  delimiter, so EVERY 40-char window contains the replica id and
  cross-replica duplication vanishes — duplication stays at the real
  corpus's level (the realistic case). Measures whether runtime is
  linear in corpus chars. (A prefix-only salt is NOT enough: windows
  past the prefix are still shared — measured 0.96 dup frac.)
- ``verbatim``: replicas are EXACT copies, so every window is
  duplicated and every gram's doc-count equals the factor — the
  worst case for the per-gram window (hot grams concentrate on one
  partition). Measures the skew exposure of partitioning by gram.

The probe runs the SHIPPED query fn (plans/dedup.dedup_span_exact
applied to a replicated view written to a temp dir), not an inline
re-implementation.

Usage: python tools/span_blowup.py [sf_dir] [factors-csv]
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
from ssidentity_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from ssidentity_spark.session import cpu_count, get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
FACTORS = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,3,10,30").split(",")]


def main() -> None:
    _ensure_loaded()
    spark = get_spark("span-blowup", cores=cpu_count())
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(cpu_count()))
    fn = REGISTRY["dedup_span_exact"].fn
    fn_trim = REGISTRY["dedup_span_trim"].fn

    docs = load_table(spark, SF_DIR, "documents")
    print("| mode | factor | docs | corpus chars | out rows | dup-window frac | profile sec | trim sec | cut frac |")
    print("|---|---|---|---|---|---|---|---|---|")
    for mode in ("salted", "verbatim"):
        for factor in FACTORS:
            reps = spark.range(factor).select(F.col("id").alias("rep"))
            blown = docs.crossJoin(F.broadcast(reps)).select(
                (F.col("doc_id") * 1000 + F.col("rep")).alias("doc_id"),
                (
                    # rep-unique inter-word delimiter: every 40-char
                    # window sees the replica id, so replicas share no
                    # grams and duplication stays at the 1x corpus level
                    F.expr("regexp_replace(text, ' ', format_string(' r%d ', rep))")
                    if mode == "salted"
                    else F.col("text")
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            tmp = tempfile.mkdtemp(prefix="span_blowup_")
            try:
                blown.write.mode("overwrite").parquet(
                    os.path.join(tmp, "documents.parquet")
                )
                stats = spark.read.parquet(
                    os.path.join(tmp, "documents.parquet")
                ).agg(
                    F.count(F.lit(1)), F.sum(F.length("text"))
                ).collect()[0]
                t0 = time.perf_counter()
                out = fn(spark, tmp)
                agg = out.agg(
                    F.count(F.lit(1)).alias("rows"),
                    F.sum("n_windows").alias("w"),
                    F.sum("n_dup_windows").alias("dw"),
                ).collect()[0]
                dt = time.perf_counter() - t0
                # trim is the stress twin: verbatim mode dooms all but
                # the first replica's windows, so the doomed subset is
                # ~(factor-1)/factor of ALL windows — worst case for the
                # per-doc island windows and the interval fold
                t1 = time.perf_counter()
                tr = fn_trim(spark, tmp).agg(
                    F.sum("n_cut_chars").alias("cut"),
                    F.sum("n_cut_chars") + F.sum("n_kept_chars"),
                ).collect()[0]
                dt_trim = time.perf_counter() - t1
                print(
                    f"| {mode} | {factor}x | {stats[0]} | {stats[1]} "
                    f"| {agg['rows']} | {agg['dw'] / agg['w']:.4f} | {dt:.2f} "
                    f"| {dt_trim:.2f} | {tr['cut'] / tr[1]:.4f} |"
                )
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
