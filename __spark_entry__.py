"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 (smoke).
``queries()``/``oracle_sql()`` expose the full registry from
``ssidentity_spark.registry`` — one entry per implemented operator family
from SURVEY.md §2, each Spark callable paired (where SQL-expressible) with a
DuckDB oracle over the same parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the caller's cwd
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from ssidentity_spark.registry import all_queries

    return all_queries()["flagship_hourly_top_types"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ssidentity_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twins for every SQL-expressible query."""
    from ssidentity_spark.registry import all_oracles

    return all_oracles()
