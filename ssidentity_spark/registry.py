"""Query registry — the driver-facing surface of the engine.

Every operator family from SURVEY.md §2 is embodied as one or more named
queries over the driver testdata tables. Each entry pairs a Spark callable
``(spark, sf_dir) -> DataFrame`` with (where SQL-expressible) an equivalent
DuckDB oracle SQL string. The driver hash-compares the two at sf0.01
(row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- floating aggregates are rounded to a fixed scale on both sides (different
  summation orders diverge in the last ulp — rounding makes the hash stable);
- every LIMIT / row_number has a unique-key tiebreaker (ties would otherwise
  be resolved differently by the two engines);
- counts/sums over integers are cast to BIGINT on both sides (duckdb sums
  integers into HUGEINT).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB ANSI SQL; None → driver does rows-only check
    survey: str = ""  # SURVEY.md §2 row ids this query embodies
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    survey: str = "",
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, survey=survey, tags=tags, bench=bench
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def bench_queries() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return {name: spec for name, spec in REGISTRY.items() if spec.bench}


_loaded = False


def _ensure_loaded() -> None:
    """Import every plans module exactly once to populate REGISTRY."""
    global _loaded
    if _loaded:
        return
    from ssidentity_spark import plans  # noqa: F401  (imports register queries)

    _loaded = True
