"""Table loading for the driver testdata + the engine's own tables.

The driver testdata (TESTDATA.md) is a TPC-H-ish star schema plus ``events``
(stream-shaped), ``documents`` (text corpus) and ``embeddings`` (vectors).
``load_tables`` reads each parquet and registers a temp view under its bare
name so both the DataFrame API and ``spark.sql`` paths work.

The engine's own store (the reference's ``obs`` table → SURVEY §1.3/§2.1 S2/S4)
is partitioned parquet: ``write_observations`` appends with a date partition
so a 100 TB history is partition-pruned by time predicates, and
``read_observations`` scans it back. Reference: the single append-only SQLite
table at /root/reference/schema:1-9 and the INSERT sink at
/root/reference/ssidentity.c:97-111.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# r1-r2 testdata stored parquet TIMESTAMP(NANOS): Spark reads those as
# LongType under spark.sql.legacy.parquet.nanosAsLong and we convert to real
# timestamps (nanos→micros truncation == duckdb's µs precision). The r3
# regeneration writes naive timestamp[us] (read as TIMESTAMP_NTZ), so the
# bigint guard below simply never fires — kept so either vintage of the
# testdata loads correctly.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ssidentity_spark.session import tune

    # tune once per session (a marker conf skips the ~8 py4j round-trips
    # on every subsequent load_table — measurable noise in sub-300ms
    # bench samples); still idempotent if the marker is lost
    try:
        tuned = spark.conf.get("spark.ssidentity.tuned", "false") == "true"
    except Exception:
        tuned = False
    if not tuned:
        tune(spark)  # ensures nanosAsLong + UTC on driver-owned sessions
        try:
            spark.conf.set("spark.ssidentity.tuned", "true")
        except Exception:
            pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _NANO_TS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer `div`: bigint→double division would round at ~256 ns
            # granularity for 2024-epoch nanos and corrupt the µs digit
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Widen a frame to at least the session's default parallelism before
    a CPU-heavy per-row stage (Python decode, shingle explode + k-hash).

    Scan partitioning follows BYTES (~128 MB splits), but these stages'
    cost follows rows × per-row work — a single small parquet file
    otherwise serializes the whole stage on one core (measured at sf0.1:
    the PNG round-trip and the MinHash signature stage both ran as ONE
    task on a 32-core box). Round-robin repartition of the compact input
    rows is cheap next to the stage itself. A TRUE no-op when the frame
    is already at least default-parallelism wide (returns ``df``
    unchanged — ``repartition(n)`` would still shuffle even at the same
    n), so at 100 TB byte-proportional scans, and inside loops over an
    already-spread persisted frame, no exchange is added.

    CONTRACT: pass a scan-stage frame (reads + narrow projections/
    filters only). The width probe uses ``df.rdd``, and converting a
    frame that contains joins/aggregates forces AQE to finalize — and
    EXECUTE — the upstream shuffle stages at plan-build time, then
    reports the pre-coalesce width; such frames are detected from the
    analyzed plan and returned unchanged (their upstream shuffle already
    set the parallelism)."""
    import re

    spark = df.sparkSession
    plan = df._jdf.queryExecution().analyzed().toString()  # analysis only
    # node-position match (tree-prefixed line starts), not substring — a
    # column named join_key must not read as a Join node
    if re.search(
        r"(?m)^[\s+:|-]*(Join|Aggregate|Window|Repartition|RepartitionByExpression|Sort|Deduplicate) ",
        plan,
    ):
        return df
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Read the testdata tables and register each as a temp view."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# --- the engine's observation store (reference `obs` table, Spark-native) ---


def write_observations(df: DataFrame, path: str, mode: str = "append") -> None:
    """Append-only partitioned store for parsed observations.

    Replaces the reference's one-INSERT-per-packet SQLite sink
    (ssidentity.c:97-111) with bulk parquet commits partitioned by
    observation date — at 100 TB the date partition is what makes
    time-bounded analytics (active hours, arrivals) scan-prunable.
    """
    (
        df.withColumn("obs_date", F.to_date("ts"))
        .write.mode(mode)
        .partitionBy("obs_date")
        .parquet(path)
    )


def read_observations(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    df.createOrReplaceTempView("observations")
    return df


def write_observations_bucketed(
    df: DataFrame, table: str, n_buckets: int = 64, mode: str = "append"
) -> None:
    """S2 scale path: bucketed store for shuffle-free per-device analytics.

    Bucketing by ``mac`` co-locates each device's history: groupBy(mac),
    window-by-mac, and obs⋈obs self-joins on mac read pre-partitioned
    buckets and skip the shuffle entirely. At 100 TB this is the difference
    between re-shuffling the corpus per query and a narrow scan.

    Requires a metastore-backed table (saveAsTable); pair with
    ``spark.sql.sources.bucketing.enabled`` (default true).
    """
    (
        df.withColumn("obs_date", F.to_date("ts"))
        .write.mode(mode)
        .partitionBy("obs_date")
        .bucketBy(n_buckets, "mac")
        .sortBy("mac", "ts")
        .format("parquet")
        .saveAsTable(table)
    )
