"""Per-round plan evidence for the r13 pagerank contribution-step change.

graph_pagerank's final explain is just a Scan ExistingRDD of the last
checkpoint (the loop runs during plan construction), so the per-round
plan — where the optimization lives — must be captured from a
reconstructed round frame. This builds ONE round's `ranks` update in
three shapes over the real sf0.001 event graph and writes their
formatted plans to plans/r13/:

- graph_pagerank_round_before.txt  — the r12 shape: src-keyed edge
  cache, rank vector re-pinned by exchange, edge-grain
  repartition(dst) feeding a complete-mode aggregate.
- graph_pagerank_round_after.txt   — the r13 broadcast mode (vertex
  count under broadcast_max_nodes): dst-keyed edge cache + broadcast
  rank vector; no exchange in the round.
- graph_pagerank_round_after_shuffle.txt — the r13 large-graph mode:
  partial aggregation before a vertex-bounded exchange instead of the
  edge-grain repartition.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

from ssidentity_spark.io import load_table  # noqa: E402
from ssidentity_spark.plans.graph import _EDGES_SQL  # noqa: E402
from ssidentity_spark.session import get_spark  # noqa: E402
from tools.capture_plans import explain_formatted  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_PLANS", "/root/testdata/sf0.001")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    spark = get_spark("pagerank-round-plans", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    e = spark.sql(_EDGES_SQL).select(
        "src", "dst", F.col("w").cast("double").alias("w")
    )
    # width forced past 1: at sf0.001 the derived width is 1 and every
    # exchange degenerates to SinglePartition, hiding the structural
    # difference this file exists to document — 16 is representative of
    # any real width (the SHAPE claims are width-independent)
    partitions = 16
    out_w = e.groupBy("src").agg(F.sum("w").alias("wout"))
    ew0 = e.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("wout")).alias("p")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    state = (
        nodes.join(out_w, nodes.node == out_w.src, "left")
        .select("node", F.col("wout").isNull().alias("dangling"))
        .repartition(partitions, "node")
        .cache()
    )
    n_nodes = state.count()
    ranks = state.withColumn("rank", F.lit(1.0 / n_nodes)).localCheckpoint(
        eager=True
    )
    dangling = ranks.filter("dangling").agg(
        F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm")
    )

    def round_frame(contrib):
        return (
            state.join(contrib, state.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "dangling",
                (
                    F.lit(0.15 / n_nodes)
                    + 0.85
                    * (F.coalesce("m", F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
        )

    shapes = {}
    # r12 shape
    ew_src = ew0.repartition(partitions, "src").cache()
    ew_src.count()  # materialize: the round plans must show the cached
    # InMemoryTableScan the loop actually reads, not the edge lineage
    shapes["round_before"] = round_frame(
        ew_src.join(ranks.repartition(partitions, "node"), ew_src.src == ranks.node)
        .repartition(partitions, "dst")
        .groupBy("dst")
        .agg(F.sum(F.col("rank") * F.col("p")).alias("m"))
    )
    # r13 broadcast mode
    ew_dst = ew0.repartition(partitions, "dst").cache()
    ew_dst.count()
    rv = ranks.select("node", "rank")
    shapes["round_after"] = round_frame(
        ew_dst.join(F.broadcast(rv), ew_dst.src == rv.node)
        .groupBy("dst")
        .agg(F.sum(F.col("rank") * F.col("p")).alias("m"))
    )
    # r13 large-graph mode
    shapes["round_after_shuffle"] = round_frame(
        ew_src.join(rv.repartition(partitions, "node"), ew_src.src == rv.node)
        .groupBy("dst")
        .agg(F.sum(F.col("rank") * F.col("p")).alias("m"))
        .repartition(partitions, "dst")
    )
    for tag, df in shapes.items():
        with open(os.path.join(out_dir, f"graph_pagerank_{tag}.txt"), "w") as f:
            f.write(explain_formatted(df))
        print("captured", tag, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
