"""ANN recall OFF-SAMPLE: sim_ivfpq_rerank_topk on a 10× blown-up corpus
(VERDICT r2 stretch ask #9) — does the recall bar hold when the corpus is
10× the data the defaults were tuned on?

Blow-up: 10 jittered replicas of the sf0.1 embeddings (deterministic
per-replica, per-dim sinusoidal perturbation — changes DIRECTION, not just
scale, so replicas are near- but not exact-duplicates and cosine ranking is
non-degenerate). Queries are the 10 original vectors; ground truth is exact
brute force on the blown corpus.

Usage: python tools/ann_blowup.py [sf_dir] [factor]
Prints a markdown table for SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ssidentity_spark.io import load_table
from ssidentity_spark.operators.ivf import train_centroids
from ssidentity_spark.operators.pq import (
    ivf_pq_rerank_topk,
    ivf_pq_topk,
    train_codebooks,
)
from ssidentity_spark.plans.similarity import N_QUERIES, TOP_K, _dot, _norm_vec
from ssidentity_spark.session import get_spark

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ann_recall import _topk_sets, recall_at_k  # noqa: E402


def blowup(em: DataFrame, factor: int) -> DataFrame:
    """factor deterministic jittered replicas; replica 0 is the original."""
    n = em.count()
    reps = []
    for r in range(factor):
        if r == 0:
            reps.append(em.select("vec_id", "embedding"))
            continue
        jitter = F.transform(
            "embedding",
            lambda x, i: x
            + F.lit(0.08) * F.sin(F.col("vec_id") * 31 + i * 7 + F.lit(r * 131)),
        )
        reps.append(
            em.select(
                (F.col("vec_id") + F.lit(r * n)).alias("vec_id"),
                jitter.cast("array<float>").alias("embedding"),
            )
        )
    out = reps[0]
    for rep in reps[1:]:
        out = out.unionByName(rep)
    return out


def brute_topk(em: DataFrame, query_ids: list[int], top_k: int) -> DataFrame:
    corpus = _norm_vec(em)
    queries = corpus.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    scored = corpus.join(
        F.broadcast(queries), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qnrm") * F.col("nrm")), 6)
        .alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("ann-blowup")
    em = load_table(spark, sf_dir, "embeddings")
    big = blowup(em, factor).cache()
    n = big.count()
    qids = list(range(N_QUERIES))

    t0 = time.perf_counter()
    truth = _topk_sets(brute_topk(big, qids, TOP_K))
    t_brute = time.perf_counter() - t0
    brute_pairs = N_QUERIES * (n - 1)

    # model sizes scale with the corpus: k ≈ sqrt(n) cells
    k_cells = 64
    cents = train_centroids(big, k=k_cells, iters=3)
    books = train_codebooks(big, m=8, k=16, iters=5)

    print(
        f"corpus={n} ({factor}x sf0.1) queries={N_QUERIES} k={TOP_K} "
        f"cells={k_cells} brute_pairs={brute_pairs} brute_s={t_brute:.1f}"
    )
    print()
    print("| method | setting | recall@5 | scored pairs | vs brute | wall s |")
    print("|---|---|---|---|---|---|")
    for n_probes, n_cand in [(4, 50), (8, 50), (8, 100), (16, 100)]:
        frac = n_probes / k_cells
        approx_pairs = int(frac * n * N_QUERIES)
        t0 = time.perf_counter()
        got = _topk_sets(
            ivf_pq_rerank_topk(
                big, cents, books, qids,
                top_k=TOP_K, n_probes=n_probes, n_candidates=n_cand,
            )
        )
        dt = time.perf_counter() - t0
        r = recall_at_k(truth, got)
        print(
            f"| IVFPQ+rerank | {n_probes}/{k_cells} probes, {n_cand} cand "
            f"| {r:.2f} | ~{approx_pairs} ADC + {N_QUERIES * n_cand} exact "
            f"| {approx_pairs / brute_pairs:.1%} | {dt:.1f} |"
        )
    # ADC-only reference point (no re-rank) at the widest setting
    t0 = time.perf_counter()
    got = _topk_sets(
        ivf_pq_topk(big, cents, books, qids, top_k=TOP_K, n_probes=8)
    )
    dt = time.perf_counter() - t0
    r = recall_at_k(truth, got)
    print(
        f"| IVFPQ (no rerank) | 8/{k_cells} probes | {r:.2f} "
        f"| ~{int(8 / k_cells * n * N_QUERIES)} ADC | "
        f"{8 / k_cells:.1%} | {dt:.1f} |"
    )
    spark.stop()


if __name__ == "__main__":
    main()
