"""Dump the physical plan of every bench query (and a summary line for all
registered queries) to PLANS.md — the evidence artifact behind SCALE.md's
claims (broadcasts, pushdown, codegen, no Python nodes).

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssidentity_spark.registry import REGISTRY, _ensure_loaded, bench_queries  # noqa: E402
from ssidentity_spark.session import get_spark  # noqa: E402


def plan_str(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def summary_flags(plan: str) -> str:
    flags = []
    if "BroadcastHashJoin" in plan:
        flags.append("BHJ")
    if "SortMergeJoin" in plan:
        flags.append("SMJ")
    if "BroadcastNestedLoopJoin" in plan:
        flags.append("BNLJ")
    if "HashAggregate" in plan:
        flags.append("hash-agg")
    # count every true shuffle exchange (hash/range/single-partition),
    # excluding ReusedExchange references
    import re as _re

    n_shuffles = len(
        _re.findall(
            r"(?<!Reused)Exchange (?:hashpartitioning|rangepartitioning|"
            r"SinglePartition)",
            plan,
        )
    )
    if n_shuffles:
        flags.append(f"shuffles={n_shuffles}")
    # persisted frames: every InMemoryTableScan RE-PRINTS its cached
    # child plan, so the shuffle count above OVER-COUNTS (each cached
    # subtree executes once at runtime regardless of how many scans
    # reference it) — flag it so the reader applies the discount
    if "InMemoryTableScan" in plan:
        flags.append("cached-subtree-reprint(count inflated)")
    # pushdown is per-scan: ANY scan with a non-empty PushedFilters counts
    # (a dimension scan's empty list must not suppress the fact scan's)
    if _re.search(r"PushedFilters: \[[^\]]", plan):
        flags.append("pushdown")
    if any(m in plan for m in ("Python", "ArrowEval", "InPandas", "FlatMapGroups")):
        flags.append("PYTHON")
    return ", ".join(flags) or "narrow"


def _pagerank_round(spark, sf_dir):
    from ssidentity_spark.io import load_table
    from ssidentity_spark.operators.graph import pagerank
    from ssidentity_spark.plans.graph import _DAMPING, _EDGES_SQL

    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    # lineage='persist' keeps the round lazy — the exact loop body, visible
    return pagerank(spark.sql(_EDGES_SQL), iters=1, damping=_DAMPING, lineage="persist")


def _cc_round(spark, sf_dir):
    from ssidentity_spark.io import load_table
    from ssidentity_spark.operators.graph import connected_components_star
    from ssidentity_spark.plans.dedup import _spark_lsh_pairs

    pairs = _spark_lsh_pairs(load_table(spark, sf_dir, "documents"))
    return connected_components_star(
        pairs, src="doc_a", dst="doc_b", max_iter=1, truncate=False
    )


def _lpa_round(spark, sf_dir):
    # one representative LPA round, truncation off, INCLUDING the kNN
    # edge build (the measured-quadratic surface the summary must show
    # next to the round's two keyed exchanges — tools/lpa_blowup.py)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ssidentity_spark.io import load_table
    from ssidentity_spark.operators.graph import label_propagation
    from ssidentity_spark.plans.graph import _LPA_KNN
    from ssidentity_spark.plans.similarity import _dot, _norm_vec

    corpus = _norm_vec(load_table(spark, sf_dir, "embeddings"))
    nbrs = corpus.select(
        F.col("vec_id").alias("nbr"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nbr"))
    knn = (
        corpus.join(F.broadcast(nbrs), F.col("vec_id") != F.col("nbr"))
        .select(
            "vec_id",
            "nbr",
            F.round(
                _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cnrm")),
                6,
            ).alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _LPA_KNN)
        .select("vec_id", "nbr", F.lit(1).alias("w"))
    )
    return label_propagation(knn, src="vec_id", dst="nbr", iters=1, truncate=False)


def _mmr_round(spark, sf_dir):
    # the pool build + ONE greedy MMR round, truncation off — the
    # summary row shows only the post-checkpoint select
    from ssidentity_spark.plans.similarity import _MMR_LAM, _mmr_pool, mmr_select

    cand, pc = _mmr_pool(spark, sf_dir, truncate=False)
    return mmr_select(cand, pc, 2, _MMR_LAM, truncate=False)


def _bpe_round(spark, sf_dir):
    from pyspark.sql import functions as F

    from ssidentity_spark.io import load_table
    from ssidentity_spark.operators.bpe import _pair_counts, word_vocab

    vocab = word_vocab(load_table(spark, sf_dir, "documents").select("text"))
    return (
        _pair_counts(vocab)
        .orderBy(F.col("c").desc(), F.col("lhs").asc(), F.col("rhs").asc())
        .limit(1)
    )


# VERDICT r6 watch item 2: explain() on a checkpoint-truncated iterative
# operator sees only the post-checkpoint `Scan ExistingRDD`, so the
# summary table read "narrow" for exactly the queries whose per-round
# shuffle structure most needs auditing. Each builder here reconstructs
# ONE representative round of the same loop body with truncation disabled
# (pagerank: lineage='persist'; CC: truncate=False; BPE: the distributed
# pair-count that is the round's whole cost — the merge apply is a narrow
# map) so PLANS.md records the real join/agg/shuffle shape per iteration.
def _bfs_round(spark, sf_dir):
    # graph_bfs_hops' summary row is the post-checkpoint assigned frame
    # ("narrow"); this records the edge build + ONE frontier-expansion
    # round (edge join + distinct + anti-join) untruncated
    from pyspark.sql import functions as F

    from ssidentity_spark.io import load_table
    from ssidentity_spark.plans.graph import _mutual_knn_edges

    sym = _mutual_knn_edges(load_table(spark, sf_dir, "embeddings"))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("c"))
    seed = (
        deg.orderBy(F.desc("c"), F.asc("u"))
        .limit(1)
        .select(F.col("u").alias("node"))
    )
    return (
        sym.join(seed, sym.u == seed.node)
        .select(F.col("v").alias("node"))
        .distinct()
        .join(seed, "node", "left_anti")
    )


def _fusion_scored_stage(spark, sf_dir):
    # pipe_quality_fusion's summary row shows only the post-checkpoint
    # fused-rank assigner; this records the full upstream stage (signal
    # build + the ONE grouped rank-assigner pass + pivot) untruncated
    from ssidentity_spark.plans.pipeline import _fusion_scored

    return _fusion_scored(spark, sf_dir, truncate=False)


ROUND_PLANS = {
    "graph_pagerank": _pagerank_round,
    "dedup_cc_clusters": _cc_round,
    "text_bpe_train": _bpe_round,
    "graph_label_propagation": _lpa_round,
    "sim_mmr_diversify": _mmr_round,
    "pipe_quality_fusion": _fusion_scored_stage,
    "graph_bfs_hops": _bfs_round,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    _ensure_loaded()
    spark = get_spark("explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    lines = [
        "# PLANS — physical-plan audit (generated by tools/explain_audit.py)",
        "",
        f"Scale dir: `{sf_dir}`. Summary per registered query, full plans for",
        "the bench set. Flags: BHJ/SMJ/BNLJ join strategies, shuffle count,",
        "parquet pushdown, PYTHON (= non-JVM eval node, only expected for the",
        "documented Pandas-UDF operators).",
        "",
        "## Summary",
        "",
        "| query | plan flags |",
        "|---|---|",
    ]
    plans: dict[str, str] = {}
    for name in sorted(REGISTRY):
        try:
            plans[name] = plan_str(REGISTRY[name].fn(spark, sf_dir))
            lines.append(f"| {name} | {summary_flags(plans[name])} |")
        except Exception as e:  # noqa: BLE001
            lines.append(f"| {name} | ERROR: {str(e).splitlines()[0][:80]} |")
    lines += ["", "## Bench-set full plans", ""]
    # reuse the plans built above: several bench queries run real Spark
    # jobs (trainers, bounded collects) before a plan exists, and a
    # failure here must not discard the summary work or leave PLANS.md
    # stale
    for name in sorted(bench_queries()):
        lines += [f"### {name}", "", "```"]
        lines.append(
            plans.get(name, "ERROR: see summary row").strip()
        )
        lines += ["```", ""]
    lines += [
        "## Iterative-operator round plans",
        "",
        "The summary rows above show these queries' POST-checkpoint plans",
        "(`Scan ExistingRDD`) — the checkpoint that truncates lineage also",
        "blinds explain(). Each plan below is ONE representative round of",
        "the same loop body with truncation disabled, so the per-iteration",
        "join/agg/shuffle structure is on record. NOTE: the printed plan",
        "(and its shuffle count) includes the one-time prologue — edge",
        "derivation / normalization subtrees shown inline under their",
        "InMemoryTableScan definitions — which is cached and NOT re-run",
        "per round; the marginal per-round cost is the part above the",
        "InMemory/checkpoint leaves (for pagerank: one src-keyed join, one",
        "dst agg, one state join + 1-row broadcast).",
        "",
    ]
    for name, builder in sorted(ROUND_PLANS.items()):
        lines += [f"### {name} — one round", "", "```"]
        try:
            p = plan_str(builder(spark, sf_dir))
            lines.append(p.strip())
            lines += ["```", "", f"round flags: {summary_flags(p)}", ""]
        except Exception as e:  # noqa: BLE001
            lines.append(f"ERROR: {str(e).splitlines()[0][:120]}")
            lines += ["```", ""]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
