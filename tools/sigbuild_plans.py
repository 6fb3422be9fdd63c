"""Plan evidence for the r13 signature-build restructure (VERDICT r12
ask #7): id_linkage_banded / id_linkage_lsh_recall_eval checkpoint the
signature frame eagerly, so the final query explain only shows a Scan
ExistingRDD — the optimized segment must be captured pre-checkpoint.

Writes plans/r13/id_linkage_banded_sigbuild_{before,after}.txt: the
512-plane fan-out + 3 stacked aggregates in the r12 shape (each
aggregate partial+exchange+final) vs the r13 shape (one slim
profile-row exchange on user_id that all three aggregates ride).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

from ssidentity_spark.io import load_table  # noqa: E402
from ssidentity_spark.plans.analytics import (  # noqa: E402
    _LNK_SKETCH_BITS,
    _LNK_WORD_BITS,
    _cell_pair_width,
    _lnk_sign,
    behavior_profiles,
)
from ssidentity_spark.session import get_spark  # noqa: E402
from tools.capture_plans import explain_formatted  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_PLANS", "/root/testdata/sf0.001")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
    )
    spark = get_spark("sigbuild-plans", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    # width forced past 1 (sf0.001 would derive 1 and degenerate every
    # exchange to SinglePartition, hiding the shape difference)
    width = 16
    prof = behavior_profiles(load_table(spark, sf_dir, "events")).persist()
    prof.count()
    u = prof.select(F.countDistinct("user_id").cast("long").alias("u"))
    cellsum = prof.groupBy("hod", "event_type").agg(
        F.sum("c").cast("long").alias("s")
    )
    planes = spark.range(1, _LNK_SKETCH_BITS + 1).select(
        F.col("id").cast("long").alias("pn")
    )
    signs = (
        cellsum.select("hod", "event_type")
        .crossJoin(F.broadcast(planes))
        .withColumn("sgn", _lnk_sign())
    )

    def sig_from(p):
        centered = (
            p.join(F.broadcast(cellsum), ["hod", "event_type"])
            .crossJoin(F.broadcast(u))
            .select(
                "user_id", "hod", "event_type",
                (F.col("c") * F.col("u") - F.col("s")).alias("ctr"),
            )
        )
        proj = (
            centered.join(F.broadcast(signs), ["hod", "event_type"])
            .groupBy("user_id", "pn")
            .agg(F.sum(F.col("ctr") * F.col("sgn")).alias("pr"))
        )
        words = (
            proj.withColumn(
                "w", F.expr(f"CAST((pn - 1) DIV {_LNK_WORD_BITS} AS BIGINT)")
            )
            .withColumn(
                "bitv",
                F.when(
                    F.col("pr") > 0,
                    F.expr(
                        "shiftleft(CAST(1 AS BIGINT), "
                        f"CAST((pn - 1) % {_LNK_WORD_BITS} AS INT))"
                    ),
                ).otherwise(F.lit(0).cast("long")),
            )
            .groupBy("user_id", "w")
            .agg(F.sum("bitv").cast("long").alias("wv"))
        )
        return words.groupBy("user_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("w", "wv"))),
                lambda x: x["wv"],
            ).alias("wds")
        )

    shapes = {
        "sigbuild_before": sig_from(prof),
        "sigbuild_after": sig_from(prof.repartition(width, "user_id")),
    }
    for tag, df in shapes.items():
        with open(
            os.path.join(out_dir, f"id_linkage_banded_{tag}.txt"), "w"
        ) as f:
            f.write(explain_formatted(df))
        print("captured", tag, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
