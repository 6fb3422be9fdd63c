"""Queries expressed through the ``spark.sql`` entry point (SURVEY §3 entry
point 3): the engine registers the testdata as temp views and runs SQL text
— same Catalyst pipeline as the DataFrame API, proving both fronts work."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ssidentity_spark.io import load_tables
from ssidentity_spark.registry import register


@register(
    "sql_api_daily_type_summary",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           count(*) AS n,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 2) AS v_sum
    FROM events
    GROUP BY 1, 2
    """,
    survey="S4,A1,A8,D3",
)
def sql_api_daily_type_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT date_format(date_trunc('day', ts), 'yyyy-MM-dd') AS day,
               event_type,
               count(*) AS n,
               count(DISTINCT user_id) AS n_users,
               round(sum(value), 2) AS v_sum
        FROM events
        GROUP BY 1, 2
        """
    )


@register(
    "sql_api_source_quality_rank",
    oracle="""
    WITH q AS (
      SELECT source,
             len(string_split_regex(lower(text), '\\s+')) AS n_words
      FROM documents
    ), agg AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_words) AS BIGINT) AS total_words,
             round(avg(n_words), 4) AS avg_words
      FROM q GROUP BY 1
    )
    SELECT source, n_docs, total_words, avg_words,
           CAST(row_number() OVER (ORDER BY total_words DESC, source)
                AS INTEGER) AS rnk
    FROM agg
    """,
    survey="S4,A6,W1",
)
def sql_api_source_quality_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text front over the corpus domain: CTE → aggregate → window
    rank, same Catalyst plan the DataFrame API would produce. The global
    window is over |sources| = 20 aggregated rows — report-sized by
    construction, not a data-scale sort."""
    load_tables(spark, sf_dir, ("documents",))
    return spark.sql(
        r"""
        WITH q AS (
          SELECT source,
                 size(split(lower(text), '\\s+')) AS n_words
          FROM documents
        ), agg AS (
          SELECT source,
                 count(*) AS n_docs,
                 sum(n_words) AS total_words,
                 round(avg(n_words), 4) AS avg_words
          FROM q GROUP BY 1
        )
        SELECT source, n_docs, total_words, avg_words,
               CAST(row_number() OVER (ORDER BY total_words DESC, source)
                    AS INT) AS rnk
        FROM agg
        """
    )


@register(
    "sql_api_nation_order_stats",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS n_orders,
           round(avg(o.o_totalprice), 4) AS avg_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
    survey="S4,J1,J9",
)
def sql_api_nation_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(
        """
        SELECT n.n_name AS nation,
               count(*) AS n_orders,
               round(avg(o.o_totalprice), 4) AS avg_price
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1
        """
    )


@register(
    "sql_api_grouping_sets",
    # GROUPING SETS with grouping_id disambiguation — the A9 rollup/cube
    # family's general form (arbitrary aggregation lattices in ONE pass:
    # Catalyst expands to a single Expand + hash-agg, NOT one scan per
    # set). DuckDB runs the identical ANSI construct.
    oracle="""
    SELECT event_type,
           CAST(isodow(ts) AS INTEGER) AS dow,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS v_sum,
           CAST(GROUPING(event_type) * 2 + GROUPING(isodow(ts)) AS BIGINT)
             AS gid
    FROM events
    GROUP BY GROUPING SETS ((event_type, isodow(ts)), (event_type),
                            (isodow(ts)), ())
    """,
    survey="A9,A7",
)
def sql_api_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping lattice in one scan: (type × dow), type-only,
    dow-only, and grand total, disambiguated by grouping_id. At 100 TB
    this is one Expand (4× row multiplier) + one shuffle — always
    cheaper than four scans of the fact table."""
    load_tables(spark, sf_dir, ("events",))
    return spark.sql(
        """
        SELECT event_type,
               CAST(weekday(ts) + 1 AS INT) AS dow,
               count(*) AS n,
               round(sum(value), 2) AS v_sum,
               CAST(grouping_id(event_type, weekday(ts) + 1) AS BIGINT) AS gid
        FROM events
        GROUP BY GROUPING SETS ((event_type, weekday(ts) + 1), (event_type),
                                (weekday(ts) + 1), ())
        """
    )
