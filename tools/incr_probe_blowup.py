"""Incremental-dedup probe vs full pair generation at blow-up scale: the
claim under dedup_incremental_pairs is that admitting a FIXED-SIZE batch
into a growing corpus costs the batch's pairs, not the corpus's. Reuses
tools/dedup_blowup.blowup (near-dup-planted replicas, so pair volume has
real quadratic-in-family structure for the full recompute to drown in).

Per factor: the corpus is all replicas; the "daily batch" is the LAST
replica of the first N_BATCH originals (fixed absolute size, like a real
ingest). Timed head-to-head, same session:

- full   — _spark_lsh_pairs over the whole corpus (what a non-
           incremental pipeline re-runs per ingest)
- probe  — incremental_probe_pairs(corpus, batch_ids) (the shipped
           delta shape; both sides pay the one signature pass — the
           DIFFERENCE is pure pair-generation volume)

Usage: python tools/incr_probe_blowup.py [sf_dir] [factors-csv]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ssidentity_spark.io import load_table  # noqa: E402
from ssidentity_spark.plans.dedup import (  # noqa: E402
    _spark_lsh_pairs,
    incremental_probe_pairs,
)
from ssidentity_spark.session import cpu_count, get_spark  # noqa: E402
from dedup_blowup import OFFSET, blowup  # noqa: E402

N_BATCH = 50  # originals whose newest replica forms the fixed daily batch


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [
        int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "2,3,10,30").split(",")
    ]
    spark = get_spark("incr-probe-blowup", cores=cpu_count())
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", str(cpu_count()))

    d = load_table(spark, sf_dir, "documents")
    print("| factor | docs | batch | full pairs | full sec | probe pairs | probe sec | probe/full |")
    print("|---|---|---|---|---|---|---|---|")
    for factor in factors:
        corpus = blowup(d, factor).cache()
        n = corpus.count()
        batch_ids = corpus.select("doc_id").where(
            (F.col("doc_id") >= (factor - 1) * OFFSET)
            & (F.col("doc_id") < (factor - 1) * OFFSET + N_BATCH)
        )
        t0 = time.perf_counter()
        full_pairs = _spark_lsh_pairs(corpus).count()
        t_full = time.perf_counter() - t0
        t1 = time.perf_counter()
        probe_pairs = incremental_probe_pairs(corpus, batch_ids).count()
        t_probe = time.perf_counter() - t1
        print(
            f"| {factor}x | {n} | {N_BATCH} | {full_pairs} | {t_full:.2f} "
            f"| {probe_pairs} | {t_probe:.2f} | {t_probe / t_full:.2f} |"
        )
        corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
