"""Skew mitigation (SURVEY §4 / SCALE.md): salting helpers for hot keys.

A chatty device (one MAC emitting millions of probes) or a mega-popular SSID
turns a groupBy/join partition into a straggler. AQE's skew-join splitting
handles the join case at runtime; these helpers cover the aggregation case
and deterministic pre-salting when AQE can't see the skew (e.g. streaming).

Pattern: two-phase aggregation — salt the key into ``n_salts`` sub-keys,
partially aggregate per (key, salt), then merge the partials per key. The
second shuffle carries only |keys| × n_salts rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col: str = "_salt") -> DataFrame:
    """Per-ROW salt from ``monotonically_increasing_id`` (partition id ×
    position), not a hash of the row's VALUES: value-hashing gives every
    duplicate row the SAME salt, so a hot key made of identical rows — the
    exact case salting exists for — would not spread at all (and hashing
    all columns also crashes on MapType and pays a full-payload hash per
    row). The salt value never reaches any result below (counts/sums/
    top-k merge associatively across salts), so result determinism does
    not depend on salt determinism."""
    return df.withColumn(
        col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )


def salted_count(
    df: DataFrame, keys: Sequence[str], n_salts: int = 16
) -> DataFrame:
    """Two-phase count per key: (key, salt) partials → merge. Honest scope
    note: for ALGEBRAIC aggregates like count/sum Spark's map-side partial
    aggregation already bounds what any reducer sees (one partial per map
    task), so plain ``groupBy().count()`` is usually the right call; this
    two-phase form matters when partial aggregation is unavailable or
    degraded — hash-agg fallback to sort on very wide/high-cardinality
    keys, or engines/paths without map-side combine. The genuinely
    salt-requiring case is non-algebraic state: see
    ``top_k_per_key_skew_safe`` below."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(*keys).agg(F.sum("_pc").cast("long").alias("n"))


def salted_sum(
    df: DataFrame, keys: Sequence[str], value: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase sum — same scope note as :func:`salted_count`."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(F.sum(value).alias("_ps"))
    return partial.groupBy(*keys).agg(F.sum("_ps").alias(f"sum_{value}"))


def salted_broadcast_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 16
) -> DataFrame:
    """Skewed big-side join against a small dim: replicate the dim across
    salts and join on (key, salt) so a hot key spreads over n_salts tasks.
    (With a broadcastable dim, plain broadcast is already skew-immune; this
    is the pattern for when the dim is just over the broadcast threshold.)"""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = with_salt(big, n_salts)
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")


def top_k_per_key_skew_safe(
    df: DataFrame, key: str, order_col: Column, k: int, n_salts: int = 16
) -> DataFrame:
    """Top-k per key without a full window sort of a hot key: per-salt top-k
    first (bounds any task at its partition's rows), then global top-k over
    |keys| × n_salts × k survivors."""
    from pyspark.sql import Window

    salted = with_salt(df, n_salts)
    w1 = Window.partitionBy(key, "_salt").orderBy(order_col)
    survivors = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(key).orderBy(order_col)
    return (
        survivors.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
