"""Global contiguous row ids over a total order — WITHOUT the
single-partition trap.

The naive formulation, ``row_number().over(Window.orderBy(...))``, is the
classic Spark scale bug: a window with no ``partitionBy`` collapses the
entire dataset into ONE task (Spark even logs a warning). This module is
the two-phase formulation every large-scale pipeline uses instead
(corpus shard numbering, stable example ids for training manifests):

1. range-repartition on the order key → partitions hold disjoint,
   ordered key ranges;
2. rank WITHIN each partition (parallel windows keyed on the partition
   id) and count per partition;
3. turn the per-partition counts into starting offsets (a cumulative
   sum over #partitions rows — bounded by the partition count, not the
   data) and broadcast-join them back: ``row_id = offset + local_rank``.

DETERMINISM requires the order key to be UNIQUE (pass a tiebreaker
column): with a unique total order, a row's id equals the number of rows
ordered before it — independent of where the sampled range boundaries
fall — so re-runs and the DuckDB oracle agree bit-for-bit. With
duplicate keys the numbering would depend on which side of a boundary
equal rows landed, which is exactly the nondeterminism the uniqueness
requirement exists to exclude.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_global_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    n_parts: int | None = None,
) -> DataFrame:
    """Add ``id_col``: 0-based contiguous ids in the total order of
    ``order_cols`` (which must be a UNIQUE key — see module docstring).
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    n = n_parts or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = df.repartitionByRange(int(n), *[F.col(c) for c in order_cols])
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    local = with_pid.withColumn("_local", F.row_number().over(w) - 1)
    # partition offsets: #partitions rows — the single-partition window
    # here is BOUNDED BY THE PARTITION COUNT, not the data (the whole
    # point of the two-phase formulation)
    counts = with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(id_col, (F.col("_off") + F.col("_local")).cast("bigint"))
        .drop("_pid", "_local", "_off")
    )
