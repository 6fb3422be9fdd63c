"""Blow-up probe for graph_label_propagation (G3, r10).

Two cost surfaces, measured separately so the quadratic one is named
rather than averaged away:

- kNN edge BUILD (exact brute tier): n^2 cosine pairs — fine at gate
  scale, the documented swap at 100 TB is the maintained IVF index
  (U5d's probed-cells candidates), which makes candidates per vector
  index-bounded instead of corpus-bounded.
- LPA ROUNDS: per round two keyed exchanges over (edges, labels) —
  linear in edge count, independent of how edges were produced.

Corpus = sf0.1 embeddings replicated Kx with jittered ids (distinct
vectors, same cluster structure). clearCache between conditions (the
measured r9 lesson: logical-plan-keyed caches poison warm timings).

Usage: python tools/lpa_blowup.py [factors...]
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssidentity_spark.io import load_table  # noqa: E402
from ssidentity_spark.operators.graph import label_propagation  # noqa: E402
from ssidentity_spark.plans.graph import _LPA_ITERS, _LPA_KNN  # noqa: E402
from ssidentity_spark.plans.similarity import _dot, _norm_vec  # noqa: E402
from ssidentity_spark.session import cpu_count, get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
FACTORS = [int(a) for a in sys.argv[1:]] or [1, 2, 4]


def knn_edges(corpus):
    nbrs = corpus.select(
        F.col("vec_id").alias("nbr"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nbr"))
    return (
        corpus.join(F.broadcast(nbrs), F.col("vec_id") != F.col("nbr"))
        .select(
            "vec_id",
            "nbr",
            F.round(
                _dot(F.col("v"), F.col("cv"))
                / (F.col("nrm") * F.col("cnrm")),
                6,
            ).alias("cos"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _LPA_KNN)
        .select("vec_id", "nbr", F.lit(1).alias("w"))
    )


def main() -> None:
    spark = get_spark("lpa-blowup", cores=cpu_count())
    em = load_table(spark, SF_DIR, "embeddings")
    for k in FACTORS:
        spark.catalog.clearCache()
        reps = spark.range(k).select(F.col("id").alias("rep"))
        blown = em.crossJoin(F.broadcast(reps)).select(
            (F.col("vec_id") * 100 + F.col("rep")).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.col("rep") * F.lit(1e-4)
            ).cast("array<float>").alias("embedding"),
            "label",
        )
        n = blown.count()
        corpus = _norm_vec(blown)
        t0 = time.perf_counter()
        edges = knn_edges(corpus).localCheckpoint(eager=True)
        n_edges = edges.count()
        t_knn = time.perf_counter() - t0
        t1 = time.perf_counter()
        labels = label_propagation(edges, src="vec_id", dst="nbr", iters=_LPA_ITERS)
        n_comm = labels.select("label").distinct().count()
        t_lpa = time.perf_counter() - t1
        print(
            f"factor={k} n={n} edges={n_edges} knn_build={t_knn:.1f}s "
            f"lpa_rounds={t_lpa:.1f}s communities={n_comm}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
