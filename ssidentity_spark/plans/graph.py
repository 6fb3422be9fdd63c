"""Graph-analytics queries over the event stream: PageRank on the
user-transition graph.

Reference impetus: README.md:15-17 — the declared correlation surface
("traveling companions", "habitual movements") is graph analysis over the
device co-observation network; connected components carries the clustering
half (A3, dedup_cc_clusters), PageRank carries the *influence ranking*
half. ``events`` stands in for the observation stream as everywhere.

Oracle strategy: PageRank with a FIXED iteration count is a static
dataflow, so the DuckDB twin is the same power iteration *unrolled* —
one chained CTE per round, generated programmatically below from the same
(damping, iters) constants the Spark operator receives. Both engines use
identical operation order in every formula; only float summation order
differs, absorbed by the final round(6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ssidentity_spark.io import load_table
from ssidentity_spark.operators.graph import pagerank
from ssidentity_spark.registry import register

_DAMPING = 0.85
_ITERS = 6

# shared edge derivation: within each calendar day, an edge from the user
# of each event to the user of the next event (by ts, event_id), self-loops
# dropped, weighted by transition count
_EDGES_SQL = """
    SELECT user_id AS src, nxt AS dst, CAST(count(*) AS DOUBLE) AS w
    FROM (
      SELECT user_id,
             lead(user_id) OVER (
               PARTITION BY CAST(ts AS DATE) ORDER BY ts, event_id
             ) AS nxt
      FROM events
    )
    WHERE nxt IS NOT NULL AND nxt <> user_id
    GROUP BY 1, 2
"""


def _pagerank_oracle(iters: int, damping: float) -> str:
    steps = []
    for k in range(1, iters + 1):
        prev = f"r{k - 1}"
        steps.append(
            f"""d{k} AS (
      SELECT coalesce(sum(rank), 0.0) AS dm FROM {prev}
      WHERE node NOT IN (SELECT src FROM o)
    ), s{k} AS (
      SELECT e.dst AS node, sum(r.rank * e.w / o.wout) AS m
      FROM e JOIN o ON e.src = o.src JOIN {prev} r ON r.node = e.src
      GROUP BY e.dst
    ), r{k} AS (
      SELECT n.node,
             ({(1.0 - damping)!r} / nc.c)
               + {damping!r} * (coalesce(s{k}.m, 0.0) + d{k}.dm / nc.c)
               AS rank
      FROM n CROSS JOIN nc CROSS JOIN d{k}
      LEFT JOIN s{k} ON n.node = s{k}.node
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH e AS ({_EDGES_SQL}),
    o AS (SELECT src, sum(w) AS wout FROM e GROUP BY 1),
    n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    nc AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM n),
    r0 AS (SELECT node, 1.0 / nc.c AS rank FROM n, nc),
    {chain}
    SELECT node AS user_id, round(rank, 6) AS rank FROM r{iters}
    """


@register(
    "graph_pagerank",
    oracle=_pagerank_oracle(_ITERS, _DAMPING),
    survey="EXT-graph,A3,J9",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Influence ranking of users in the daily transition graph: 6 rounds
    of damped weighted power iteration, dangling mass redistributed
    uniformly (the exact PageRank recurrence, not the simplified
    no-sink variant)."""
    e = load_table(spark, sf_dir, "events")
    day_w = Window.partitionBy(F.col("ts").cast("date")).orderBy(
        "ts", "event_id"
    )
    edges = (
        e.select("user_id", F.lead("user_id").over(day_w).alias("nxt"))
        .where(F.col("nxt").isNotNull() & (F.col("nxt") != F.col("user_id")))
        .groupBy(F.col("user_id").alias("src"), F.col("nxt").alias("dst"))
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    ranks = pagerank(edges, iters=_ITERS, damping=_DAMPING)
    return ranks.select(F.col("node").alias("user_id"), "rank")
