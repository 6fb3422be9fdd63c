"""Measure the row-group pruning win of Z-order clustering on parquet
min/max statistics — the evidence behind SCALE.md's z-order section.

Method: write the sf0.1 events table (100 k rows) three ways with
identical row-group sizing —

  1. unsorted      (arrival order),
  2. linear        (sorted by user_id),
  3. z-order       (sorted by morton(user_id, day)),

then, for a panel of 2-D box predicates (user_id range × day range),
count which row groups a stats-based reader MUST read: a group survives
pruning iff [min,max] of BOTH columns intersects the box — exactly the
skipping rule parquet readers and Delta/Iceberg data-skipping indexes
apply. Reported: row groups read / total, per layout.

Usage: python tools/zorder_study.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ssidentity_spark.functions.zorder import morton_key_scaled  # noqa: E402
from ssidentity_spark.session import cpu_count, get_spark  # noqa: E402

OUT = "/tmp/zorder_study"

# (user_lo, user_hi, day_lo, day_hi) box predicates: narrow/wide mixes
BOXES = [
    (0, 99, 1, 3),
    (0, 99, 10, 20),
    (400, 499, 5, 7),
    (700, 899, 1, 30),
    (0, 1500, 15, 15),
    (1200, 1299, 25, 28),
]


def write_layouts(spark, sf_dir: str) -> None:
    e = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("event_id", "user_id", F.dayofmonth("ts").alias("day"))
    )
    shutil.rmtree(OUT, ignore_errors=True)
    variants = {
        "unsorted": e,
        "linear": e.orderBy("user_id"),
        "zorder": e.withColumn(
            "zkey",
            morton_key_scaled(F.col("user_id"), 1500, F.col("day"), 31, 11),
        ).orderBy("zkey").drop("zkey"),
    }
    for name, df in variants.items():
        (
            df.coalesce(1)
            .write.option("parquet.block.size", 16 * 1024)
            .mode("overwrite")
            .parquet(f"{OUT}/{name}")
        )


def groups_read(path: str, box) -> tuple[int, int]:
    ulo, uhi, dlo, dhi = box
    must_read = total = 0
    for fn in os.listdir(path):
        if not fn.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, fn)).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.num_columns)
        }
        for g in range(md.num_row_groups):
            total += 1
            us = md.row_group(g).column(cols["user_id"]).statistics
            ds = md.row_group(g).column(cols["day"]).statistics
            if us.min <= uhi and us.max >= ulo and ds.min <= dhi and ds.max >= dlo:
                must_read += 1
    return must_read, total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("zorder-study", cores=cpu_count())
    # small row groups so the 100 k-row table has enough of them to prune
    spark.conf.set("spark.hadoop.parquet.block.size", str(16 * 1024))
    write_layouts(spark, sf_dir)
    print(f"{'box':>24} | {'unsorted':>10} | {'linear':>10} | {'zorder':>10}")
    sums = {"unsorted": 0, "linear": 0, "zorder": 0}
    total_groups = 0
    for box in BOXES:
        row = []
        for name in ("unsorted", "linear", "zorder"):
            r, t = groups_read(f"{OUT}/{name}", box)
            sums[name] += r
            total_groups = t
            row.append(f"{r}/{t}")
        print(f"{str(box):>24} | {row[0]:>10} | {row[1]:>10} | {row[2]:>10}")
    print(
        f"{'TOTAL':>24} | {sums['unsorted']:>10} | {sums['linear']:>10} | "
        f"{sums['zorder']:>10}   (of {total_groups} groups x {len(BOXES)} boxes)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
