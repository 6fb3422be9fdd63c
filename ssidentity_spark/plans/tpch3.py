"""Third wave of star-schema analogs — the remaining classic TPC-H join
shapes the testdata columns can express (reference analytics surface:
README.md:15-19 declares the engine's ad-hoc query ambition; these widen
the J-family evidence):

- Q12: fact-fact SMJ with a date-arithmetic residual + conditional counts.
- Q13: LEFT OUTER join with an ON-clause filter, then a two-level
  aggregation (count per key, then distribution of counts).
- Q19: broadcast dim join under an OR-of-ANDs predicate — the shape that
  exercises disjunctive pushdown and join-condition residuals.
- Q22: scalar-subquery threshold + anti join, grouped fan-out.

The true TPC-H columns these queries key on (l_shipmode, l_commitdate,
o_comment, c_phone) are absent from the testdata, so each analog swaps in
a column with the same role (priority class, order status, brand/size,
nation key) while keeping the join/predicate structure intact.

Money-sum outputs FLOOR to whole units (driver gotcha: round() half-mode
diverges between Spark and DuckDB exactly on terminating-decimal .5
boundaries); counts stay exact; DuckDB integer sums CAST to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssidentity_spark.io import load_table
from ssidentity_spark.registry import register

# ---------------------------------------------------------------------------
# TPC-H Q12 analog: late shipments by line status x priority class
# ---------------------------------------------------------------------------

_HIGH = ("1-URGENT", "2-HIGH")


@register(
    "tpch_q12_late_priority",
    oracle=f"""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('{_HIGH[0]}', '{_HIGH[1]}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('{_HIGH[0]}', '{_HIGH[1]}')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
    survey="J2,A6",
)
def tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: lineitem⋈orders on orderkey (fact-fact, SMJ at scale)
    with the lateness predicate as a join residual; conditional counts
    replace Q12's shipmode split with the order-priority class."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin(*_HIGH)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 analog: customer order-count distribution (left outer join)
# ---------------------------------------------------------------------------


@register(
    "tpch_q13_custdist",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'P'
      GROUP BY 1
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY 1
    """,
    survey="J9,A6",
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: LEFT OUTER join with the filter in the ON clause (it must
    not drop order-less customers), count non-null orders per customer,
    then the distribution of those counts. Two shuffles: the outer join and
    the tiny second-level groupBy."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderstatus") != "P"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# TPC-H Q19 analog: disjunctive brand/size/quantity predicate revenue
# ---------------------------------------------------------------------------


@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(floor(sum(l_extendedprice * (1 - l_discount))) AS BIGINT)
             AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    survey="J1,A6",
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: part dim joined under an OR-of-ANDs predicate. The
    part-only conjuncts (brand set, size floor) are written separately so
    Catalyst pushes them below the join as a dim prefilter; the mixed
    lineitem×part disjunction stays a join residual. No broadcast hint:
    the brand-filtered subset is ~12% of part — SF-proportional, so per
    the module hint policy (tpch.py) AQE picks BHJ at test scale and is
    free to demote to a shuffle join when the subset outgrows the
    broadcast limit at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    arms = [
        ("Brand#11", 15, (1, 11)),
        ("Brand#13", 25, (10, 20)),
        ("Brand#22", 35, (20, 30)),
    ]
    dim_pre = F.col("p_brand").isin(*[b for b, _, _ in arms]) & (
        F.col("p_size") >= 1
    )
    resid = None
    for brand, max_size, (qlo, qhi) in arms:
        arm = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & F.col("l_quantity").between(qlo, qhi)
        )
        resid = arm if resid is None else resid | arm
    return (
        li.join(p.filter(dim_pre), F.col("l_partkey") == F.col("p_partkey"))
        .filter(resid)
        .agg(
            F.floor(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 analog: rich order-less customers by nation
# ---------------------------------------------------------------------------


@register(
    "tpch_q22_global_sales_opportunity",
    # Determinism: c_acctbal is a 2-decimal quantity stored as double
    # (max deviation from exact cents ~1e-10, verified at every SF), so
    # ALL the arithmetic runs in exact integer cents — the above-average
    # membership test as cents*n > sum_cents and the floor(sum) as an
    # integer division. The previous float form (c_acctbal > avg, then
    # floor(sum(double))) broke at sf0.1: one nation's 45-member sum
    # straddled the floor boundary between the two engines' summation
    # orders (344399 vs 344398).
    oracle="""
    WITH c2 AS (
      SELECT c_nationkey, c_custkey, c_acctbal,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ), pos AS (
      SELECT sum(cents) AS sc, count(*) AS nc FROM c2 WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey AS nation,
           count(*) AS numcust,
           CAST(sum(cents) // 100 AS BIGINT) AS totacctbal
    FROM c2, pos
    WHERE c2.cents * pos.nc > pos.sc
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c2.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
    survey="J3,A6",
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar aggregate broadcast as a threshold (the 1-row
    cross join Spark prints as BNLJ — O(n), one comparison per row), then a
    LEFT ANTI join against a filtered orders subset, grouped by nation
    (stand-in for Q22's phone country code). Real Q22 anti-joins the whole
    orders table, but this testdata gives every customer at least one
    order, so that form is vacuously empty; restricting to URGENT orders
    keeps the identical plan shape with a non-empty result (75 rows at
    sf0.01).

    Exact arithmetic: balances become integer CENTS up front, the
    above-average test is cents*n > sum(cents) (no float division), and
    the floored sum is an integer division — order-invariant and
    bit-equal cross-engine at any scale, unlike float avg/sum whose
    summation-order tail flipped a floor boundary at sf0.1."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    o = load_table(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum("cents").alias("sc"), F.count(F.lit(1)).alias("nc")
    )
    return (
        c.join(F.broadcast(pos))
        .filter(F.col("cents") * F.col("nc") > F.col("sc"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.expr("sum(cents) div 100").alias("totacctbal"),
        )
    )
