"""Blow-up probe for the r9 wave-8/9/10 operators (stop-gram removal,
k-anonymity, M4 downsample, cross-source leakage, split-leakage eval):
replicate sf0.1 inputs at 1x / 10x / 30x with disjoint id spaces and time
each end-to-end — best-of-2 JVM-warm, CACHE-COLD per iteration (the
wave6 probe convention: operators persist index subtrees and Spark keys
caches by logical plan).

Expected shapes:
- stop-gram removal: one gram census exchange + array rebuild — linear;
  under replication every gram's doc-count scales with copies, so the
  FIXED threshold flags more grams (the census grows), still linear work.
- k-anonymity: one rollup over group-cardinality data — flat past scan.
- M4: one keyed exchange, four in-partition sorts — linear in events.
- cross-source leakage: sig-keyed self-join — fan-out is dup-GROUP size,
  which replication multiplies (clique blow-up is quadratic in copies by
  construction: a g-group becomes 10g); the probe reports pair counts so
  the quadratic-output regime is visible, not hidden.
- split-leakage eval: pair generation + component solve, both dedup-family
  shapes already measured; the eval adds two broadcast joins.

Usage: python tools/wave8_blowup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssidentity_spark.io import load_table  # noqa: E402
from ssidentity_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

_SPARK = None


def blow_up(df: DataFrame, id_col: str, copies: int) -> DataFrame:
    parts = [
        df.withColumn(id_col, F.col(id_col) + F.lit(c * 10_000_000))
        for c in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(label: str, run) -> float:
    best = None
    for _ in range(2):
        _SPARK.catalog.clearCache()
        t0 = time.monotonic()
        run()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f} s", flush=True)
    return best


def main() -> None:
    from ssidentity_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    global _SPARK
    _SPARK = spark = get_spark("wave8-blowup", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    events = load_table(spark, SF_DIR, "events")

    for copies in (1, 10, 30):
        tmp = f"/tmp/wave8_{copies}x"
        blow_up(docs, "doc_id", copies).write.mode("overwrite").parquet(
            f"{tmp}/documents.parquet"
        )
        blow_up(events, "event_id", copies).write.mode("overwrite").parquet(
            f"{tmp}/events.parquet"
        )
        nd = spark.read.parquet(f"{tmp}/documents.parquet").count()
        ne = spark.read.parquet(f"{tmp}/events.parquet").count()
        print(f"\n-- {copies}x ({nd} docs, {ne} events) --", flush=True)

        for q in (
            "dedup_stopgram_remove",
            "pipe_k_anonymity",
            "ts_m4_downsample",
            "pipe_cross_source_leakage",
            "pipe_split_leakage_eval",
        ):
            def run(q=q):
                # noop WRITE sink (the bench.py convention), not count():
                # count() lets Catalyst prune every output column and even
                # eliminate unique-key left joins — the first run of this
                # probe timed stop-gram's full rebuild at 0.8 s at 30x
                # because the md5 rebuild never executed
                REGISTRY[q].fn(spark, tmp).write.format("noop").mode(
                    "overwrite"
                ).save()

            timed(q, run)


if __name__ == "__main__":
    main()
