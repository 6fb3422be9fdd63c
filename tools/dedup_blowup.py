"""Dedup at blow-up scale (VERDICT r4 ask #5): run the MinHash-LSH pair
generation and connected-component clustering on a near-dup-PLANTED corpus
grown 1×/3×/10×, and measure whether candidate volume tracks the planted
duplicate structure (linear) or degenerates toward O(n²).

Blow-up: ``factor`` replicas of the sf documents; replica r > 0 replaces
every 10th word (offset by r) with a replica-unique token, so replicas of
one original form a true near-dup cluster (pairwise 3-shingle Jaccard
≈ 0.6-0.8 — above the 4-band×2-row LSH threshold) while documents from
different originals stay unrelated. Planted structure: n_orig clusters of
size ``factor``.

Reported per factor:
- candidate pairs vs the planted pair count and vs n(n-1)/2 (the O(n²)
  ceiling a naive all-pairs join would scan);
- planted-pair recall (candidates that connect two replicas of the same
  original / planted pairs) and spurious pairs (cross-original);
- max band-bucket population — the LSH join's fan-in bound, i.e. the skew
  number that decides whether the bucket join survives 100 TB;
- HashMin CC iterations to fixpoint + cluster count;
- wall seconds for pair-gen and CC.

Usage: python tools/dedup_blowup.py [sf_dir] [factors-csv]
Prints a markdown table for SCALE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ssidentity_spark.io import load_table
from ssidentity_spark.operators.graph import (
    connected_components,
    connected_components_star,
)
from ssidentity_spark.plans.dedup import (
    BAND_ROWS,
    N_MINHASH,
    _spark_lsh_pairs,
    _spark_minhash,
    _spark_shingles,
    band_key_expr,
)
from ssidentity_spark.session import cpu_count, get_spark

OFFSET = 10_000_000  # replica doc_id namespace: doc_id + r * OFFSET


def blowup(d: DataFrame, factor: int) -> DataFrame:
    """factor near-dup replicas per document; replica 0 is the original."""
    reps = [d.select("doc_id", "text")]
    for r in range(1, factor):
        words = F.split(F.lower(F.col("text")), r"\s+")
        mutated = F.transform(
            words,
            lambda w, i: F.when(
                (i + F.lit(r)) % 10 == 0, F.concat(F.lit(f"xr{r}tok"), i)
            ).otherwise(w),
        )
        reps.append(
            d.select(
                (F.col("doc_id") + F.lit(r * OFFSET)).alias("doc_id"),
                F.array_join(mutated, " ").alias("text"),
            )
        )
    out = reps[0]
    for rep in reps[1:]:
        out = out.unionByName(rep)
    return out


def run(sf_dir: str, factor: int, cc_mode: str = "both") -> dict:
    spark = get_spark("dedup-blowup", cores=cpu_count())
    d = blowup(load_table(spark, sf_dir, "documents"), factor).cache()
    n = d.count()

    t0 = time.perf_counter()
    pairs = _spark_lsh_pairs(d).cache()
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0

    # planted vs spurious: replicas of one original share doc_id % OFFSET
    same_orig = (F.col("doc_a") % OFFSET) == (F.col("doc_b") % OFFSET)
    n_planted_hit = pairs.filter(same_orig).count()
    n_spurious = n_pairs - n_planted_hit
    n_orig = d.filter(F.col("doc_id") < OFFSET).count()
    n_planted = n_orig * factor * (factor - 1) // 2

    # LSH fan-in bound: the largest single band-bucket population.
    # band_key_expr is the SAME expression production pair-gen uses
    # (ADVICE r5: a hard-coded 4-band/mh{2b} copy here would silently
    # measure the wrong banding if N_MINHASH/BAND_ROWS ever change).
    sigs = _spark_minhash(_spark_shingles(d))
    band_exprs = [band_key_expr(b) for b in range(N_MINHASH // BAND_ROWS)]
    buckets = sigs.select(
        "doc_id", F.posexplode(F.array(*band_exprs)).alias("b", "band_key")
    )
    max_bucket = (
        buckets.groupBy("b", "band_key")
        .count()
        .agg(F.max("count").alias("m"))
        .collect()[0]["m"]
    )

    stats: dict = {}
    n_clustered = n_clusters = 0
    t_cc = 0.0
    if cc_mode in ("both", "hashmin"):
        t0 = time.perf_counter()
        comp = connected_components(pairs, src="doc_a", dst="doc_b", stats=stats)
        n_clustered = comp.count()
        n_clusters = comp.select("component").distinct().count()
        t_cc = time.perf_counter() - t0

    # pointer-doubling counterpart on the SAME pair set: O(log diameter)
    # rounds — the r6 30× run drove HashMin into its 50-round ceiling
    # (chain diameter grows with the replica factor), which is exactly the
    # regime this variant exists for; cluster counts must agree when both
    # converge
    star_stats: dict = {}
    n_clusters_star = 0
    t_cc_star = 0.0
    if cc_mode in ("both", "star"):
        t0 = time.perf_counter()
        comp_star = connected_components_star(
            pairs, src="doc_a", dst="doc_b", stats=star_stats
        )
        n_clusters_star = comp_star.select("component").distinct().count()
        t_cc_star = time.perf_counter() - t0

    pairs.unpersist()
    d.unpersist()
    spark.stop()
    return {
        "factor": factor,
        "n_docs": n,
        "n_pairs": n_pairs,
        "n_planted": n_planted,
        "recall": n_planted_hit / n_planted if n_planted else float("nan"),
        "spurious": n_spurious,
        "pct_nsq": 100.0 * n_pairs / (n * (n - 1) / 2),
        "max_bucket": max_bucket,
        "cc_iters": stats.get("iterations", 0),
        "cc_converged": stats.get("converged", False),
        "star_iters": star_stats.get("iterations", 0),
        "star_converged": star_stats.get("converged", False),
        "n_clusters": n_clusters,
        "n_clusters_star": n_clusters_star,
        "n_clustered": n_clustered,
        "t_pairs": t_pairs,
        "t_cc": t_cc,
        "t_cc_star": t_cc_star,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(x) for x in (sys.argv[2].split(",") if len(sys.argv) > 2 else [1, 3, 10])]
    # optional third arg: which CC variant(s) to time — "both" (default),
    # "star", or "hashmin". At 100× HashMin is known-truncating (see the
    # 30× row); star-only keeps the run affordable.
    cc_mode = sys.argv[3] if len(sys.argv) > 3 else "both"
    rows = [run(sf_dir, f, cc_mode) for f in factors]
    print(
        "| factor | docs | candidate pairs | planted pairs | planted recall "
        "| spurious | % of n(n-1)/2 | max bucket | HashMin iters (conv) "
        "| star iters (conv) | clusters (HashMin/star) "
        "| pair-gen s | CC s (HashMin/star) |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        hm = (
            f"{r['cc_iters']}{'' if r['cc_converged'] else ' TRUNCATED'}"
            if r["cc_iters"]
            else "—"
        )
        st = (
            f"{r['star_iters']}{'' if r['star_converged'] else ' TRUNCATED'}"
            if r["star_iters"]
            else "—"
        )
        print(
            f"| {r['factor']}× | {r['n_docs']:,} | {r['n_pairs']:,} "
            f"| {r['n_planted']:,} | {r['recall']:.3f} | {r['spurious']:,} "
            f"| {r['pct_nsq']:.4f}% | {r['max_bucket']} | {hm} | {st} "
            f"| {r['n_clusters']:,} / {r['n_clusters_star']:,} "
            f"| {r['t_pairs']:.1f} | {r['t_cc']:.1f} / {r['t_cc_star']:.1f} |"
        )


if __name__ == "__main__":
    main()
