"""Global contiguous row ids over a total order — WITHOUT the
single-partition trap.

The naive formulation, ``row_number().over(Window.orderBy(...))``, is the
classic Spark scale bug: a window with no ``partitionBy`` collapses the
entire dataset into ONE task (Spark even logs a warning). This module is
the two-phase formulation every large-scale pipeline uses instead
(corpus shard numbering, stable example ids for training manifests):
rank WITHIN ordered buckets in parallel, then broadcast-join bucket
starting offsets (a cumulative sum over #buckets rows — bounded by the
bucket count, not the data): ``row_id = offset + local_rank``.

Two bucketing strategies:

- ``bucket=<Column>`` (preferred): a caller-supplied DETERMINISTIC
  ordered bucket key — any expression where ``bucket(a) < bucket(b)``
  implies ``key(a) < key(b)`` (e.g. a prefix of the order key: the first
  hex chars of an md5 sort key). Fully reproducible: no sampling
  anywhere, so re-runs, speculative re-execution, and the DuckDB oracle
  all agree bit-for-bit.
- default: ``repartitionByRange`` on the order key. Range boundaries
  come from SAMPLING, and the ranked branch and the offsets branch both
  consume the exchange — correctness then rests on Spark reusing ONE
  exchange instance for both (r7 review). The partitioned frame is
  therefore persisted, pinning a single materialization for both
  consumers regardless of the exchange-reuse rule.

DETERMINISM of the IDS additionally requires the order key to be UNIQUE
(pass a tiebreaker column): with a unique total order, a row's id equals
the number of rows ordered before it — independent of where bucket
boundaries fall. With duplicate keys the numbering would depend on which
side of a boundary equal rows landed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_global_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    n_parts: int | None = None,
    bucket: Column | None = None,
) -> DataFrame:
    """Add ``id_col``: 0-based contiguous ids in the total order of
    ``order_cols`` (which must be a UNIQUE key — see module docstring).
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    order = [F.col(c) for c in order_cols]
    if n_parts is not None and n_parts < 1:
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    if bucket is not None:
        keyed = df.withColumn("_b", bucket)
    else:
        if n_parts is not None:
            n = n_parts
        else:
            # the conf is not always numeric ('auto' on AQE-auto
            # platforms) — fall back to the input's own partition count
            raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            try:
                n = int(raw)
            except (TypeError, ValueError):
                n = max(1, df.rdd.getNumPartitions())
        ranged = df.repartitionByRange(int(n), *order)
        # persist: BOTH branches below read this one materialization, so
        # the sampled range boundaries are fixed once — not re-sampled
        # per consumer if exchange reuse doesn't dedupe the plan. The
        # cache lives until the returned frame is garbage-collected
        # (ContextCleaner) or evicted (MEMORY_AND_DISK); callers chaining
        # many large frames should prefer the bucket= path, which needs
        # no materialization at all
        keyed = ranged.withColumn("_b", F.spark_partition_id()).persist()
    w = Window.partitionBy("_b").orderBy(*order)
    local = keyed.withColumn("_local", F.row_number().over(w) - 1)
    # bucket offsets: #buckets rows — the single-partition window here is
    # BOUNDED BY THE BUCKET COUNT, not the data (the whole point of the
    # two-phase formulation)
    counts = keyed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_b")
        .withColumn(id_col, (F.col("_off") + F.col("_local")).cast("bigint"))
        .drop("_b", "_local", "_off")
    )
