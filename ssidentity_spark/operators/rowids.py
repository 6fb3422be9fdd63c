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


def _null_safe_bucket(bucket: Column) -> Column:
    # the offsets join below is an equality join on _b: a NULL bucket
    # would silently DROP the row (NULL never equals NULL) — fail loudly
    # instead and tell the caller to map NULLs to a sentinel bucket
    return F.when(bucket.isNotNull(), bucket).otherwise(
        F.raise_error(
            F.lit(
                "bucket expression evaluated to NULL for some row — map "
                "NULL inputs to an explicit sentinel bucket (the offsets "
                "equi-join would silently drop NULL-bucket rows)"
            )
        )
    )


def assign_global_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "row_id",
    n_parts: int | None = None,
    bucket: Column | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``id_col``: 0-based contiguous ids in the total order of
    ``order_cols`` (which must be a UNIQUE key — see module docstring).

    ``group_cols``: ids restart at 0 WITHIN each group — N independent
    rankings assigned in ONE two-phase pass (one intra-bucket window +
    one bucket-count aggregate for ALL groups together, instead of one
    assigner invocation per ranking). Requires the ``bucket=`` path, and
    the bucket expression must DETERMINE the group (lead it with the
    group key, e.g. ``group_id * K + quantized_key`` — no bucket may
    straddle two groups; the per-group cumulative offsets are keyed by
    bucket alone). ``order_cols`` then order rows within a group, and
    (group_cols + order_cols) must be UNIQUE."""
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    order = [F.col(c) for c in order_cols]
    if n_parts is not None and n_parts < 1:
        raise ValueError(f"n_parts must be >= 1, got {n_parts}")
    if group_cols:
        if bucket is None:
            raise ValueError(
                "group_cols requires an explicit bucket= expression that "
                "embeds the group key (range partitioning cannot promise "
                "group-pure buckets)"
            )
        keyed = df.withColumn("_b", _null_safe_bucket(bucket))
        w = Window.partitionBy("_b").orderBy(*order)
        local = keyed.withColumn("_local", F.row_number().over(w) - 1)
        # per-group offsets: still #buckets rows total; the cumulative
        # sum partitions by group and orders by bucket (buckets are
        # group-pure by contract, so each group's buckets cumulate
        # independently) — bounded by the bucket count, not the data
        counts = keyed.groupBy("_b", *group_cols).agg(
            F.count(F.lit(1)).alias("_n")
        )
        w_off = (
            Window.partitionBy(*group_cols)
            .orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = counts.select(
            "_b", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
        )
        return (
            local.join(F.broadcast(offsets), "_b")
            .withColumn(
                id_col, (F.col("_off") + F.col("_local")).cast("bigint")
            )
            .drop("_b", "_local", "_off")
        )
    if bucket is not None:
        keyed = df.withColumn("_b", _null_safe_bucket(bucket))
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


def assign_running_total(
    df: DataFrame,
    order: list[Column],
    value_col: str,
    out_col: str = "running_before",
    bucket: Column | None = None,
    n_parts: int | None = None,
) -> DataFrame:
    """Add ``out_col``: the sum of ``value_col`` over all rows STRICTLY
    BEFORE each row in the total order — the global prefix sum behind
    budgeted selection ("keep docs in quality order until the token
    budget is spent"), without the single-partition global-window trap.

    Same two-phase shape as :func:`assign_global_ids` (and the same
    contracts: deterministic monotone ``bucket`` preferred, order key
    must be UNIQUE for a deterministic result): an intra-bucket
    cumulative sum runs in parallel, bucket totals cumulate over
    #buckets rows, and the broadcast-joined offsets complete the global
    prefix. ``order`` takes Column expressions so descending orders
    (quality DESC) work; a caller's ``bucket`` must then be monotone in
    that SAME direction."""
    if not order:
        raise ValueError("order must name at least one column expression")
    if bucket is not None:
        keyed = df.withColumn("_b", _null_safe_bucket(bucket))
    else:
        if n_parts is not None:
            if n_parts < 1:
                raise ValueError(f"n_parts must be >= 1, got {n_parts}")
            n = n_parts
        else:
            raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            try:
                n = int(raw)
            except (TypeError, ValueError):
                n = max(1, df.rdd.getNumPartitions())
        # persist for the same exchange-pinning reason as assign_global_ids
        keyed = (
            df.repartitionByRange(int(n), *order)
            .withColumn("_b", F.spark_partition_id())
            .persist()
        )
    w = (
        Window.partitionBy("_b")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = keyed.withColumn(
        "_local", F.coalesce(F.sum(value_col).over(w), F.lit(0))
    )
    sums = keyed.groupBy("_b").agg(F.sum(value_col).alias("_n"))
    w_off = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sums.select(
        "_b", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_b")
        .withColumn(out_col, (F.col("_off") + F.col("_local")).cast("bigint"))
        .drop("_b", "_local", "_off")
    )
