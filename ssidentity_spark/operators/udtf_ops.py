"""U4 — Python UDTF surface (SURVEY §2.9): one-row-in/N-rows-out operators.

The preferred path for explode-shaped work is built-in ``explode/transform``
(see plans/text.py:text_bigram_profile); this module provides the genuine
UDTF form (Spark ≥3.5 ``@udtf``) for logic that needs imperative row
expansion — here, probe-sequence → transition edges ("habitual movements",
/root/reference/README.md:17).
"""

from __future__ import annotations

import uuid

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
            # SQL null semantics, not Python's: the declarative twin
            # (filter on lag(ssid) != ssid) drops any pair involving a
            # NULL ssid because the comparison is NULL — the UDTF must
            # agree or the pinned lag-equivalence breaks on real data
            if prev is not None and cur is not None and prev != cur:
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
    # a UNIQUE per-call view name: a fixed session-global name races under
    # concurrent callers of one SparkSession (caller B's
    # createOrReplaceTempView can land between A's registration and A's
    # spark.sql analysis, silently resolving A's query against B's data)
    view = f"_packed_probes_{uuid.uuid4().hex}"
    packed.createOrReplaceTempView(view)
    try:
        # spark.sql analyzes eagerly: the returned DataFrame's resolved
        # plan no longer references the view name, so dropping it below
        # neither invalidates the frame nor forces materialization
        return spark.sql(
            f"SELECT t.* FROM {view}, "
            "LATERAL probe_transitions(mac, ssids, ts_s) t"
        )
    finally:
        spark.catalog.dropTempView(view)
