"""Incremental view maintenance: keep a materialized rollup current by
merging ALGEBRAIC partial aggregates from only the new data — never
re-scanning history.

Reference impetus: the sniffer appends forever (ssidentity.c:102-113) and
every declared analytic (interests, active hours, rosters — README.md:15-19)
is a rollup over that ever-growing log. At 100 TB the difference between
"recompute the rollup" (O(history) per refresh) and "merge today's
partials" (O(increment)) is the difference between a nightly job that
finishes and one that doesn't.

The technique: restrict the materialized state to ALGEBRAIC aggregates —
ones with a merge function over partial states (count→add, sum→add,
min/max→min/max; avg is DERIVED from sum+count at read time, never stored).
Then refresh = unionByName(state, partials(new)) → one groupBy on the
rollup key. Sums are kept as exact DECIMALs in state so the merged result
is bit-identical to a from-scratch recompute no matter how many increments
the state has absorbed — the property ``ivm_daily_rollup``'s oracle (a full
recompute in DuckDB) hash-checks.

This is the batch mirror of streaming/sketches.py's point: mergeable state
is what makes both incremental batch AND streaming aggregation possible;
Spark's own partial aggregation exploits the same algebra inside every
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def rollup_partials(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Aggregate a slice of the log into mergeable partial state: one row
    per key with (n_events, n_values, sum_value, min_value, max_value).
    n_values counts non-null values — the AVG denominator; n_events
    counts rows (dividing the null-skipping sum by it would deflate the
    average of any key whose log contains NULL values)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(value).alias("n_values"),
        F.sum(F.col(value).cast("decimal(20,2)")).alias("sum_value"),
        F.min(value).alias("min_value"),
        F.max(value).alias("max_value"),
    )


def merge_partials(state: DataFrame, increment: DataFrame, keys: list[str]) -> DataFrame:
    """state ⊎ increment → new state: one groupBy on the rollup key.
    Associative + commutative per column, so any increment order (daily,
    hourly, backfill) converges to the same state."""
    return (
        state.unionByName(increment)
        .groupBy(*keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("n_values").alias("n_values"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )


def readout(state: DataFrame, keys: list[str]) -> DataFrame:
    """Derive the user-facing view from state: exact decimal sum cast to
    double once, avg as ONE division — bit-identical to a full recompute."""
    return state.select(
        *keys,
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
        (F.col("sum_value").cast("double") / F.col("n_values")).alias(
            "avg_value"
        ),
        "min_value",
        "max_value",
    )
