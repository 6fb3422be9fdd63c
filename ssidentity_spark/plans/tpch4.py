"""Fourth wave of star-schema analogs — the last classic TPC-H join shapes
left after tpch/tpch2/tpch3 (reference analytics ambition: README.md:15-19).
True Q11/Q20 key on ``partsupp`` and Q21 on commit/receipt dates, none of
which exist in the testdata, so each analog swaps an equivalent-role column
while keeping the decorrelated plan shape the optimizer must produce:

- Q11: fact-derived value per group vs a scalar fraction-of-total threshold
  (the GROUP BY ... HAVING > scalar-subquery shape).
- Q15: revenue view + global max + equality join-back.
- Q17: per-key average as a correlated threshold — decorrelated to one
  window pass instead of a self-join.
- Q20: nested semi-join chain (parts by name → per-supplier shipped
  quantity threshold → supplier semi).
- Q21: EXISTS + NOT EXISTS over sibling lineitems — decorrelated to
  per-order window aggregates (one shuffle, no self-joins).

Money sums FLOOR to whole units before compare (cross-engine ulp hygiene:
summation order differs, floor on a BIGINT-sized value is stable); counts
CAST to BIGINT on the DuckDB side (it sums into HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ssidentity_spark.io import load_table
from ssidentity_spark.registry import register

def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))

# ---------------------------------------------------------------------------
# TPC-H Q11 analog: nations holding an outsized share of shipped value
# ---------------------------------------------------------------------------


@register(
    "tpch_q11_important_value",
    oracle="""
    WITH val AS (
      SELECT s_nationkey,
             sum(l_extendedprice * (1 - l_discount)) AS v
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      GROUP BY 1
    )
    SELECT n_name AS nation,
           CAST(floor(v) AS BIGINT) AS value
    FROM val JOIN nation ON n_nationkey = s_nationkey
    WHERE v > (SELECT sum(v) * 0.03 FROM val)
    """,
    survey="J9,A6,A7",
)
def tpch_q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-group value vs a fraction-of-global-total threshold.
    The scalar total is a 1-row aggregate broadcast back over the ~25-row
    per-nation value table (O(groups) BNLJ, not O(rows)); the supplier dim
    join is left to AQE (SF-proportional), nation is an explicit broadcast
    (fixed 25 rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    val = (
        li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(F.sum(_rev()).alias("v"))
    )
    thresh = val.agg((F.sum("v") * 0.03).alias("thresh"))
    return (
        val.join(F.broadcast(thresh))
        .filter(F.col("v") > F.col("thresh"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(F.col("n_name").alias("nation"), F.floor("v").alias("value"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 analog: top supplier(s) by quarterly revenue
# ---------------------------------------------------------------------------


@register(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(floor(sum(l_extendedprice * (1 - l_discount))) AS BIGINT)
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_rev
    FROM rev JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
    survey="J9,A6,O2",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: revenue view reused twice — once for the global max
    (1-row broadcast), once joined back on equality. The FLOOR happens
    BEFORE the max/equality so the compared value is integral (the
    float sum's last-ulp order dependence can't flip a BIGINT equality).
    No global sort: max is an aggregate, the join-back is O(suppliers)."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.floor(F.sum(_rev())).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 analog: small-quantity orders for one brand
# ---------------------------------------------------------------------------


@register(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    WITH li AS (
      SELECT l_partkey, l_quantity, l_extendedprice,
             avg(l_quantity) OVER (PARTITION BY l_partkey) AS aq
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#11')
    )
    SELECT CAST(floor(sum(l_extendedprice) / 7.0) AS BIGINT) AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_small
    FROM li WHERE l_quantity < 0.5 * aq
    """,
    survey="J1,A6,W3",
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape, decorrelated Spark-first: the classic correlated
    ``l_quantity < 0.5 * (SELECT avg(..) WHERE same part)`` becomes ONE
    window pass over the brand-restricted lineitem — no per-part self-join,
    no second scan. Restricting to the brand's parts first is semantics-
    preserving (the average is per partkey and every surviving row's part
    is in the brand) and shrinks the window input 25×. Quantities are
    integral doubles, so the per-part average is order-independent and the
    0.5*avg comparison is engine-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    brand_parts = p.filter(F.col("p_brand") == "Brand#11").select("p_partkey")
    w = Window.partitionBy("l_partkey")
    small = (
        li.join(brand_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .withColumn("aq", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("aq"))
    )
    return small.agg(
        F.floor(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_small"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 analog: suppliers shipping excess volume of selected parts
# ---------------------------------------------------------------------------


@register(
    "tpch_q20_excess_suppliers",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE '%g%'
        AND l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate <  TIMESTAMP '1999-01-01'
      GROUP BY l_suppkey, l_partkey
      HAVING sum(l_quantity) > 52
    )
    """,
    survey="J3,J9,A6",
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested semi-join chain. Parts filtered by name pattern
    (availqty stand-in: shipped-quantity threshold over a year window),
    aggregated per (supplier, part), thresholded, then the supplier table
    is LEFT SEMI joined — each stage strictly shrinks the key set, and the
    final semi join carries only supplier keys, never fact rows."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    excess = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .join(
            p.filter(F.col("p_name").like("%g%")).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("sq"))
        .filter(F.col("sq") > 52)
        .select("l_suppkey")
        .distinct()
    )
    return s.join(
        excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name", "s_nationkey")


# ---------------------------------------------------------------------------
# TPC-H Q21 analog: suppliers who alone held up multi-supplier orders
# ---------------------------------------------------------------------------


@register(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 1000 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY 1, 2
    ), w AS (
      SELECT *,
             count(*)  OVER (PARTITION BY l_orderkey) AS n_supp,
             sum(late) OVER (PARTITION BY l_orderkey) AS n_late
      FROM li
    )
    SELECT s_suppkey, s_name, numwait FROM (
      SELECT l_suppkey, CAST(count(*) AS BIGINT) AS numwait
      FROM w WHERE late = 1 AND n_supp >= 2 AND n_late = 1
      GROUP BY 1
    ) j JOIN supplier ON s_suppkey = l_suppkey
    ORDER BY numwait DESC, s_suppkey
    LIMIT 20
    """,
    survey="J3,J9,W1,O2",
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape, decorrelated Spark-first: the reference formulation is an
    EXISTS (another supplier on the order) + NOT EXISTS (another LATE
    supplier) pair of correlated self-joins over lineitem. Per-order window
    counts express both quantifiers in ONE pass over the per-(order,
    supplier) rollup — late flag per sibling group, sibling count, late
    sibling count — so the fact table is shuffled once on orderkey instead
    of three times. Lateness = shipped >1000 days after order date (no
    commit/receipt dates in this schema; ~p90 of the ship-lag
    distribution). Top-20 with s_suppkey tiebreak keeps the LIMIT
    deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    per_supp = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        # one shuffle, not two: hash-partitioning on l_orderkey alone
        # satisfies BOTH the (orderkey, suppkey) rollup's clustering and
        # the per-order window's — without it Spark exchanges on the pair
        # and again on orderkey. The rollup barely compresses (~1 line per
        # (order, supplier) here), so the coarser key costs nothing.
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 1000 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    waited = (
        per_supp.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter((F.col("late") == 1) & (F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return (
        waited.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_suppkey"))
        .limit(20)
    )
