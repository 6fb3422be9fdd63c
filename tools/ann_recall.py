"""ANN quality curve: recall@k of the two approximate paths (sign-projection
LSH buckets, IVF probe-limited k-means cells) against brute-force ground
truth, with candidate volume as the cost axis.

Usage: python tools/ann_recall.py [sf_dir]   (default /root/testdata/sf0.1)

Prints a markdown table (pasted into SCALE.md) — recall is averaged over the
query set; `cand` is the number of (query, neighbor) pairs actually scored,
i.e. the work the approximation saves vs brute force's |queries|x|corpus|.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ssidentity_spark.io import load_table
from ssidentity_spark.operators.ivf import assign_cells, ivf_topk, train_centroids
from ssidentity_spark.plans.similarity import (
    N_QUERIES,
    TOP_K,
    _norm_vec,
    lsh_topk,
    sim_topk_bruteforce,
)
from ssidentity_spark.session import get_spark


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def recall_at_k(truth: dict[int, set[int]], got: dict[int, set[int]]) -> float:
    per_q = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth if truth[q]
    ]
    return sum(per_q) / len(per_q)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    em = load_table(spark, sf_dir, "embeddings")
    n_corpus = em.count()
    truth = _topk_sets(sim_topk_bruteforce(spark, sf_dir))
    brute_cost = N_QUERIES * (n_corpus - 1)
    print(f"corpus={n_corpus} queries={N_QUERIES} k={TOP_K} brute_cost={brute_cost}")
    print()
    print("| method | setting | recall@5 | scored pairs | vs brute |")
    print("|---|---|---|---|---|")

    for n_bands, n_proj, n_flips in [
        (1, 4, 0),
        (1, 6, 0),
        (1, 8, 0),
        (1, 8, 1),
        (1, 8, 3),
        (1, 8, 5),
        (4, 4, 0),
        (4, 6, 0),
        (8, 6, 0),
        (8, 8, 0),
        (4, 8, 3),
    ]:
        kw = dict(n_proj=n_proj, n_bands=n_bands, n_flips=n_flips)
        got = _topk_sets(lsh_topk(em, **kw))
        cand = lsh_topk(em, top_k=10**9, **kw).count()
        r = recall_at_k(truth, got)
        label = f"{n_bands} band(s) x {n_proj} bits"
        if n_flips:
            label += f" + {n_flips} probes"
        print(f"| LSH | {label} | {r:.2f} | {cand} | {cand / brute_cost:.1%} |")

    cents = train_centroids(em, k=16, iters=3)
    assigned = assign_cells(em, cents)
    cell_sizes = {r.cell: r.n for r in assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    for n_probes in [1, 2, 4, 8, 16]:
        got = _topk_sets(
            ivf_topk(em, cents, list(range(N_QUERIES)), top_k=TOP_K, n_probes=n_probes)
        )
        r = recall_at_k(truth, got)
        # cost: sum of probed cell sizes per query (upper bound incl. self)
        frac = n_probes / 16
        approx_cand = int(frac * n_corpus * N_QUERIES)
        print(
            f"| IVF k=16 | {n_probes} probes | {r:.2f} | ~{approx_cand} "
            f"| {approx_cand / brute_cost:.1%} |"
        )
    _ = cell_sizes

    # PQ: full scan (ADC costs a LUT lookup-sum per pair, not a dot
    # product) and the IVF x PQ composition (probe-pruned scan of codes)
    from ssidentity_spark.operators.pq import ivf_pq_topk, pq_adc_topk, train_codebooks

    for m in (8, 16):
        books = train_codebooks(em, m=m, k=16, iters=5)
        got = _topk_sets(pq_adc_topk(em, books, list(range(N_QUERIES)), top_k=TOP_K))
        r = recall_at_k(truth, got)
        print(
            f"| PQ m={m} k=16 | ADC full scan ({m // 2}B packed codes) "
            f"| {r:.2f} | {brute_cost} (LUT) | 100% of pairs, {512 // m}x "
            f"less memory |"
        )
    books = train_codebooks(em, m=8, k=16, iters=5)
    for n_probes in (4, 8):
        got = _topk_sets(
            ivf_pq_topk(
                em, cents, books, list(range(N_QUERIES)), top_k=TOP_K, n_probes=n_probes
            )
        )
        r = recall_at_k(truth, got)
        approx_cand = int(n_probes / 16 * n_corpus * N_QUERIES)
        print(
            f"| IVFPQ m=8 | {n_probes} probes | {r:.2f} | ~{approx_cand} (LUT) "
            f"| {approx_cand / brute_cost:.1%} |"
        )


if __name__ == "__main__":
    main()
