"""Filtered-ANN recall curve (VERDICT r8 stretch #8): recall@k of the
IVF-composed filtered search (sim_filtered_ivf_topk's operator,
plans/similarity.filtered_ivf_topk) against the EXACT per-label scan
(sim_filtered_topk) as ground truth, swept over probe counts, with the
scored-candidate volume as the cost axis.

Also reports per-label-frequency recall: the rare-label failure mode is
exactly why the exact tier exists — a label with few members scatters
over cells, and no probe count rescues it as cheaply as scanning its
(tiny) slice directly.

Usage: python tools/filtered_recall.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ssidentity_spark.io import load_table  # noqa: E402
from ssidentity_spark.plans.similarity import (  # noqa: E402
    N_QUERIES,
    TOP_K,
    filtered_ivf_candidates,
    filtered_ivf_topk,
)
from ssidentity_spark.registry import REGISTRY, _ensure_loaded  # noqa: E402
from ssidentity_spark.session import cpu_count, get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _topk_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def main() -> None:
    _ensure_loaded()
    spark = get_spark("filtered-recall", cores=cpu_count())
    spark.sparkContext.setLogLevel("ERROR")
    em = load_table(spark, SF_DIR, "embeddings")
    n_corpus = em.count()
    label_sizes = {
        r["label"]: r["n"]
        for r in em.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    truth_df = REGISTRY["sim_filtered_topk"].fn(spark, SF_DIR)
    truth = _topk_sets(truth_df)
    qlabel = {
        r.query_id: r.label
        for r in truth_df.select("query_id", "label").distinct().collect()
    }
    exact_cand = sum(label_sizes[qlabel[q]] - 1 for q in truth)

    sizes = sorted(label_sizes.values())
    med = sizes[len(sizes) // 2]
    rare_q = [q for q in truth if label_sizes[qlabel[q]] < med]
    print(f"sf={SF_DIR} corpus={n_corpus} queries={N_QUERIES} k={TOP_K}")
    print(
        f"exact per-label tier scores {exact_cand} candidates total; "
        f"{len(rare_q)} queries carry below-median labels"
    )
    print("| probes | recall@k | rare-label recall | scored cand | vs exact |")
    print("|---|---|---|---|---|")
    for n_probes in (1, 2, 4, 8):
        n_cand = filtered_ivf_candidates(em, n_probes).count()
        got = _topk_sets(filtered_ivf_topk(em, n_probes))
        hit = sum(len(truth[q] & got.get(q, set())) for q in truth)
        tot = sum(len(truth[q]) for q in truth)
        rh = sum(len(truth[q] & got.get(q, set())) for q in rare_q)
        rt = sum(len(truth[q]) for q in rare_q) or 1
        print(
            f"| {n_probes} | {hit / tot:.2f} | {rh / rt:.2f} | {n_cand} "
            f"| {n_cand / exact_cand:.2f}x |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
