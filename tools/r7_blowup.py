"""Blow-up probe for the r7 operator wave: sequence packing and
SemDeDup-shape semantic dedup at 1x / 10x / 30x corpus replication.

Method as the prior waves (SCALE.md): replicate sf0.1 inputs with id
offsets that keep the per-key structure. Two operator-specific twists:

- packing: replica texts are identical, so the (md5, doc_id) order
  interleaves replicas inside each bucket — fine: packing has no join
  structure to preserve, only token mass per bucket, which replication
  scales exactly.
- semantic dedup: the pinned centroid rule (vec_id % 97) means the
  centroid COUNT scales with the corpus like a trained codebook would —
  but identical replica vectors would all tie-break onto the lowest-id
  centroid copy and collapse every replica into the original's cell
  (cells 10x bigger, pairs 100x: a structurally wrong instance). Each
  replica therefore gets one coordinate nudged by c*0.01 so its
  direction is distinct and cells keep their natural ~mod-size — the
  property that makes intra-cell pairwise work LINEAR in the corpus.

The semantic-dedup stage runs the SHIPPED pipeline helpers
(plans/dedup._assign_cells / _cell_pair_cos — r7 review: no inline
re-implementation, the probe must measure the semantics the queries run).

Usage: python tools/r7_blowup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssidentity_spark.io import load_table  # noqa: E402
from ssidentity_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("r7-blowup")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    from ssidentity_spark.operators.packing import pack_sequences
    from ssidentity_spark.plans.dedup import (
        SEMDEDUP_COS,
        _SEM_CENT_MOD,
        _assign_cells,
        _cell_pair_cos,
    )
    from ssidentity_spark.plans.similarity import _norm_vec

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_docs = docs.count()
    em = load_table(spark, SF_DIR, "embeddings")
    n_vecs = em.count()

    for copies in (1, 10, 30):
        parts = [
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * 10_000_000))
            for c in range(copies)
        ]
        big_docs = parts[0]
        for p in parts[1:]:
            big_docs = big_docs.unionByName(p)

        best = None
        rows = seqs = 0
        for _ in range(2):
            t0 = time.monotonic()
            out = pack_sequences(big_docs, seq_len=512, n_buckets=16)
            agg = out.agg(
                F.count(F.lit(1)).alias("rows"),
                F.countDistinct("bucket", "seq_no").alias("seqs"),
            ).collect()[0]
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
            rows, seqs = agg["rows"], agg["seqs"]
        print(
            f"pack_sequences x{copies}: {best:.2f} s, "
            f"{copies * n_docs} docs -> {rows} map rows, {seqs} sequences"
        )

    for copies in (1, 10, 30):
        parts = []
        for c in range(copies):
            cur = em.withColumn("vec_id", F.col("vec_id") + F.lit(c * 10_000_000))
            if c:
                idx = c % 64
                cur = cur.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, i: x
                        + F.when(i == idx, F.lit(float(c) * 0.01)).otherwise(0.0),
                    ),
                )
            parts.append(cur)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)

        base = _norm_vec(big)
        cent = base.filter(F.col("vec_id") % _SEM_CENT_MOD == 0).select(
            F.col("vec_id").alias("cid"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cnrm"),
        )
        cells = _assign_cells(base, cent)
        t0 = time.monotonic()
        stats = (
            _cell_pair_cos(cells)
            .agg(
                F.count(F.lit(1)).alias("cand"),
                F.sum((F.col("cos") >= SEMDEDUP_COS).cast("long")).alias("dups"),
            )
            .collect()[0]
        )
        dt = time.monotonic() - t0
        n = copies * n_vecs
        n_cent = copies * ((n_vecs + _SEM_CENT_MOD - 1) // _SEM_CENT_MOD)
        frac = stats["cand"] / (n * (n - 1) / 2)
        print(
            f"dedup_semantic_cells x{copies}: {dt:.2f} s, {n} vecs, "
            f"~{n_cent} centroids, {stats['cand']} candidate pairs "
            f"({frac:.4%} of n^2/2), {stats['dups']} above-threshold"
        )
        cells.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
