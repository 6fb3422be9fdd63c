"""U4 — Python UDTF surface (SURVEY §2.9): one-row-in/N-rows-out operators.

The preferred path for explode-shaped work is built-in ``explode/transform``
(see plans/text.py:text_bigram_profile); this module provides the genuine
UDTF form (Spark ≥3.5 ``@udtf``) for logic that needs imperative row
expansion — here, probe-sequence → transition edges ("habitual movements",
/root/reference/README.md:17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="mac: string, from_ssid: string, to_ssid: string, gap_s: long")
class ProbeTransitions:
    """Expand one device's chronological probe list into transition edges.

    eval() receives (mac, ssids array, ts_seconds array) — pre-grouped and
    pre-sorted by the caller — and yields one row per consecutive pair that
    changes SSID.
    """

    def eval(self, mac: str, ssids: list, ts_s: list):  # noqa: D102
        if not ssids or len(ssids) < 2:
            return
        for prev, cur, t_prev, t_cur in zip(ssids, ssids[1:], ts_s, ts_s[1:]):
            if prev != cur:
                yield (mac, prev, cur, int(t_cur - t_prev))


def probe_transitions(spark: SparkSession, obs: DataFrame) -> DataFrame:
    """Transitions per device via the UDTF. The groupBy packs each device's
    history into arrays (one shuffle); the UDTF is then a narrow expansion."""
    spark.udtf.register("probe_transitions", ProbeTransitions)
    packed = (
        obs.select("mac", "ssid", F.unix_timestamp("ts").alias("t"))
        .groupBy("mac")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("t", "ssid"))
            ).alias("seq")
        )
        .select(
            "mac",
            F.col("seq.ssid").alias("ssids"),
            F.col("seq.t").alias("ts_s"),
        )
    )
    packed.createOrReplaceTempView("_packed_probes")
    return spark.sql(
        "SELECT t.* FROM _packed_probes, "
        "LATERAL probe_transitions(mac, ssids, ts_s) t"
    )
