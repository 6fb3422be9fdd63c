"""10x blow-up probe for the second r6 operator wave (sweep line, CDC
compaction, Bloom-pruned join, priority sampling, BPE training, AVI
decode). Method as the first-wave probe (SCALE.md): replicate sf0.1
inputs 10x with key offsets that preserve per-key density and join
structure; best-of-2 warm timings, noop sink, local[32].

Usage: python tools/wave2_blowup.py [sf_dir]
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
COPIES = 10


def blow_up(
    df: DataFrame, offsets: dict[str, int], shift_ts_days: int = 0
) -> DataFrame:
    """Union COPIES shifted replicas: per-key structure preserved, key
    spaces disjoint across replicas. ``shift_ts_days`` also offsets the
    event-time per replica — REQUIRED for time-window/sequence operators:
    without it the replicas' identical timestamps interleave inside the
    original windows (e.g. the day-partitioned transition lead()), which
    measures a structurally collapsed graph, not a 10x instance."""
    parts = []
    for c in range(COPIES):
        cur = df
        for col, step in offsets.items():
            cur = cur.withColumn(col, F.col(col) + F.lit(c * step))
        if shift_ts_days and "ts" in df.columns:
            cur = cur.withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {c * shift_ts_days} DAYS")
            )
        parts.append(cur)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def timed(label: str, build):
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        df = build()
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label}: {best:.2f} s")
    return best


def main() -> None:
    spark = get_spark("wave2-blowup", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    ev1 = load_table(spark, SF_DIR, "events").cache()
    ev1.count()
    # 40-day shift per replica: the events span ~30 days, so replicas
    # occupy disjoint day ranges and window/sequence operators see a
    # genuine 10x instance (not interleaved ties)
    ev10 = blow_up(
        ev1, {"user_id": 10_000, "event_id": 1_000_000_000}, shift_ts_days=40
    ).cache()
    ev10.count()
    docs1 = load_table(spark, SF_DIR, "documents").cache()
    docs1.count()
    docs10 = blow_up(docs1, {"doc_id": 10_000_000}).cache()
    docs10.count()
    orders1 = load_table(spark, SF_DIR, "orders").cache()
    cust1 = load_table(spark, SF_DIR, "customer").cache()
    orders1.count(), cust1.count()
    orders10 = blow_up(
        orders1, {"o_orderkey": 100_000_000, "o_custkey": 10_000_000}
    ).cache()
    cust10 = blow_up(cust1, {"c_custkey": 10_000_000}).cache()
    orders10.count(), cust10.count()

    from pyspark.sql import Window

    from ssidentity_spark.functions.timeutil import epoch_us
    from ssidentity_spark.operators.bloom import bloom_pruned_join
    from ssidentity_spark.operators.bpe import bpe_train, word_vocab
    from ssidentity_spark.operators.intervals import max_concurrency_by_bucket
    from ssidentity_spark.operators.merge import apply_cdc_log
    from ssidentity_spark.operators.multimodal import avi_roundtrip_features

    def w5(ev):
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        gap = epoch_us("ts") - F.lag(epoch_us("ts")).over(w)
        sess = ev.withColumn(
            "new_sess", F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
        ).withColumn(
            "session_id",
            F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        iv = sess.groupBy("user_id", "session_id").agg(
            F.min("ts").alias("s_start"), F.max("ts").alias("s_end")
        )
        return max_concurrency_by_bucket(iv, "s_start", "s_end", "day")

    def cdc(ev):
        e = ev.withColumn(
            "op", F.when(F.col("event_type") == "error", "D").otherwise("U")
        )
        return apply_cdc_log(e, ["user_id"], ["ts", "event_id"], "op")

    def bloom(orders, cust):
        dim = cust.filter(
            (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 5000)
        ).select("c_custkey")
        j = bloom_pruned_join(orders, "o_custkey", dim, "c_custkey")
        return j.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("r")
        )

    def sample(docs):
        u = (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
            ).cast("long")
            + 1
        ).cast("double")
        return (
            docs.where(F.col("n_chars") > 0)
            .withColumn("ip", u / F.col("n_chars"))
            .orderBy(F.col("ip").asc(), F.col("doc_id").asc())
            .select("doc_id")
            .limit(200)
        )

    def ema(ev):
        arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "value")))
        vals = F.transform(arr, lambda s: s["value"])
        e = F.aggregate(
            F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
            F.element_at(vals, 1),
            lambda acc, x: acc * F.lit(0.9) + x * F.lit(0.1),
        )
        return ev.groupBy("user_id").agg(F.round(e, 6).alias("ema"))

    def triangles(ev):
        ev.createOrReplaceTempView("events")
        tr = spark.sql(
            """
            SELECT user_id AS src, nxt AS dst FROM (
              SELECT user_id,
                     lead(user_id) OVER (
                       PARTITION BY CAST(ts AS DATE) ORDER BY ts, event_id
                     ) AS nxt
              FROM events
            ) WHERE nxt IS NOT NULL AND nxt <> user_id
            """
        )
        e = tr.select(
            F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
        ).distinct()
        e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
        return (
            e1.join(e2, F.col("e2.u") == F.col("e1.v"))
            .join(
                e3,
                (F.col("e3.u") == F.col("e1.u"))
                & (F.col("e3.v") == F.col("e2.v")),
            )
            .agg(F.count(F.lit(1)).alias("n_triangles"))
        )

    for label, one, ten, fn in [
        ("w5_max_concurrency", ev1, ev10, w5),
        ("s5_cdc_apply", ev1, ev10, cdc),
        ("ts_ema", ev1, ev10, ema),
        ("graph_triangles", ev1, ev10, triangles),
        ("pipe_weighted_sample", docs1, docs10, sample),
        ("mm_avi_frames", docs1, docs10, avi_roundtrip_features),
    ]:
        a = timed(f"{label} sf0.1", lambda: fn(one))
        b = timed(f"{label} x10", lambda: fn(ten))
        print(f"  -> scaling {b / a:.1f}x")

    a = timed("j10_bloom sf0.1", lambda: bloom(orders1, cust1))
    b = timed("j10_bloom x10", lambda: bloom(orders10, cust10))
    print(f"  -> scaling {b / a:.1f}x")

    # BPE: train 6 merges (the collect loop breaks the single-plan timing
    # pattern — time the whole call)
    for label, d in [("text_bpe_train sf0.1", docs1), ("text_bpe_train x10", docs10)]:
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            table, _ = bpe_train(spark, word_vocab(d.select("text")), k=6)
            table.collect()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: {best:.2f} s")

    spark.stop()


if __name__ == "__main__":
    main()
