"""Similarity-ordered storage layout: does clustering similar documents
adjacently shrink the parquet footprint? (r9)

Parquet compresses pages independently, so row ORDER changes bytes on
disk: near-duplicate or same-boilerplate documents that land in the same
page share dictionary/backreference context. At 100 TB a few percent of
compression is real money, and the rewrite slot already exists — the
OPTIMIZE job's ``repartition_fn`` (the same hook Z-order uses for
numeric box queries) can apply any layout for free during compaction.

Layouts measured (identical rows, identical parquet settings):

- shipped:   the corpus's natural (generator) order
- random:    md5-shuffled — the adversarial baseline (a corpus fresh
             out of a shuffled dedup pipeline looks like this)
- prefix:    ORDER BY text — clusters shared prefixes only
- simhash:   ORDER BY 32-bit SimHash (plans/dedup's signature) — near
             -dups cluster regardless of where the shared text sits

Replication factor plants realistic duplication (30% of docs get a
near-copy with a one-word edit) so the study isn't measuring a
dup-free corpus where layout can't matter.

Usage: python tools/layout_compression.py [sf_dir] [dup_frac]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssidentity_spark.io import load_table  # noqa: E402
from ssidentity_spark.session import cpu_count, get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DUP_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3


def _simhash_col():
    """The SHIPPED layout key (functions/textlayout.simhash32) — the
    study must measure the expression the optimize composition uses."""
    from ssidentity_spark.functions.textlayout import simhash32

    return simhash32(F.col("text"))


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _dd, ff in os.walk(d)
        for f in ff
        if f.endswith(".parquet")
    )


def main() -> None:
    spark = get_spark("layout-compression", cores=cpu_count())
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # plant near-dups: DUP_FRAC of docs get a copy with one word changed
    dups = (
        d.where(F.pmod(F.hash("doc_id"), F.lit(100)) < int(DUP_FRAC * 100))
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.lit("edited "), F.col("text")).alias("text"),
        )
    )
    corpus = d.unionByName(dups).persist()
    n = corpus.count()

    layouts = {
        "shipped": corpus,
        "random": corpus.orderBy(F.md5(F.col("doc_id").cast("string"))),
        "prefix": corpus.orderBy("text"),
        "simhash": corpus.withColumn("_sh", _simhash_col())
        .orderBy("_sh", "doc_id")
        .drop("_sh"),
    }
    print(f"sf={SF_DIR} docs={n} planted_dup_frac={DUP_FRAC}")
    print("| layout | parquet bytes | vs random |")
    print("|---|---|---|")
    base = None
    results = {}
    for name, df in layouts.items():
        tmp = tempfile.mkdtemp(prefix=f"layout_{name}_")
        try:
            # ONE file per layout so page packing, not file count, decides
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            results[name] = _dir_bytes(tmp)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    base = results["random"]
    for name, b in results.items():
        print(f"| {name} | {b:,} | {b / base:.3f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
