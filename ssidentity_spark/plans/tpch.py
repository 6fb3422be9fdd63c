"""Join-heavy analytical queries over the star schema (SURVEY §2.5 J1-J9,
§2.4 A5-A7 mechanics). These exercise the engine's join strategies the way
the reference's declared correlation analytics would at fleet scale
(README.md:15-19: obs ⋈ sensors ⋈ geo ⋈ watchlists).

Physical-plan intent (verified via .explain in tests):
- fixed-cardinality dims (nation=25, region=5) carry explicit F.broadcast —
  they are broadcast-sized at ANY scale factor, so the hint is free and
  removes a planner decision;
- SF-proportional dims (part, supplier, customer) carry NO hint: AQE's
  runtime statistics promote them to broadcast while they fit and demote to
  shuffle joins at 100 TB — measured faster locally than forcing the
  broadcast, and the only scale-correct choice;
- fact-fact joins (lineitem ⋈ orders) → shuffle sort-merge on the join key,
  AQE-coalesced; both sides hash-partition once and reuse;
- semi/anti joins stay semi/anti (no materialized distinct);
- the range join is an equi-join on user with a residual range predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssidentity_spark.io import load_table
from ssidentity_spark.registry import register

# ---------------------------------------------------------------------------
# TPC-H Q1 analog — the canonical scan-heavy aggregation (A6, A7, D6)
# ---------------------------------------------------------------------------


@register(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="A6,A7,D6,P11",
    bench=True,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# J1 — broadcast dimension joins: revenue by region (5-way star join)
# ---------------------------------------------------------------------------


@register(
    "j1_region_revenue",
    oracle="""
    SELECT r.r_name AS region,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    """,
    survey="J1,J9",
    bench=True,
)
def j1_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # No join hints here on purpose: AQE's runtime sizes pick broadcast for
    # the collapsed customer→nation→region dim at bench scale and would
    # demote to SMJ at 100 TB where the customer dim outgrows the threshold —
    # measured faster than forcing the broadcast (driver-side build cost).
    cust_dim = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "r_name")
    )
    # eager aggregation: collapse lineitem to order grain BEFORE the join —
    # the SMJ probe side shrinks ~4x (lineitems per order) and the final agg
    # shuffles order-grain rows, not item-grain. Measured 1.4x faster at
    # sf0.1, identical output; strictly better at scale (join input shrinks).
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        F.count(F.lit(1)).alias("n_li"),
    )
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(cust_dim, o.o_custkey == F.col("c_custkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.sum("n_li").cast("long").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# J9/J2 — TPC-H Q3 analog: top unshipped orders by revenue (SMJ + top-k)
# ---------------------------------------------------------------------------


@register(
    "j9_q3_top_orders",
    oracle="""
    SELECT l.l_orderkey AS l_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    survey="J2,J9,W1,O2",
    bench=True,
)
def j9_q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    # eager aggregation: the group keys are order-grain, so revenue is
    # summed per order BEFORE the joins — the join then carries one row per
    # order and no post-join agg exists at all (measured 1.4x faster at
    # sf0.1). Customer participates only as a filter → left_semi (orders
    # have exactly one customer, so semi ≡ the original inner join).
    rev = (
        li.filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        rev.join(o.filter(F.col("o_orderdate") < cutoff), rev.l_orderkey == o.o_orderkey)
        .join(
            c.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


# ---------------------------------------------------------------------------
# J9 — TPC-H Q5 analog: local-supplier revenue per nation
# ---------------------------------------------------------------------------


@register(
    "j9_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY 1
    """,
    survey="J9",
)
def j9_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    r_asia = r.filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            s,  # SF-proportional: AQE decides
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r_asia), n.n_regionkey == r_asia.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# J9 — TPC-H Q10 analog: returned-item revenue per customer (top 20)
# ---------------------------------------------------------------------------


@register(
    "j9_q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    survey="J1,J9,O2",
)
def j9_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li.filter(F.col("l_returnflag") == "R"), o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "nation", "revenue")
    )


# ---------------------------------------------------------------------------
# J3 — semi / anti joins (watchlist membership, README.md:19)
# ---------------------------------------------------------------------------


@register(
    "j3_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    survey="J3",
)
def j3_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "j3_active_customer_nations",
    oracle="""
    SELECT n.n_name AS nation, count(*) AS n_active_customers
    FROM nation n
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
    survey="J3,J1",
)
def j3_active_customer_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    active = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    return (
        active.join(F.broadcast(n), active.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_active_customers"))
    )


# ---------------------------------------------------------------------------
# J2 — fact ⋈ dim with mid-size build side: supplier volume by nation
# ---------------------------------------------------------------------------


@register(
    "j2_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation, s.s_name AS supplier,
           round(sum(l.l_quantity), 2) AS total_qty,
           count(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY 1, 2
    """,
    survey="J2,J1",
)
def j2_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    dim = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name", "n_name"
    )
    # dim is SF-proportional (supplier table): no broadcast hint — AQE
    # promotes to BHJ while it fits, demotes at scale
    return (
        li.join(dim, li.l_suppkey == dim.s_suppkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("s_name").alias("supplier"))
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# J1 — part-brand pricing (dim broadcast + conditional agg)
# ---------------------------------------------------------------------------


@register(
    "j1_brand_pricing",
    oracle="""
    SELECT p.p_brand AS p_brand,
           round(sum(l.l_extendedprice), 2) AS gross,
           round(avg(l.l_discount), 4) AS avg_disc,
           count(*) AS n_items,
           CAST(count(*) FILTER (WHERE p.p_type = 'PROMO') AS BIGINT) AS n_promo
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
    survey="J1,A6",
)
def j1_brand_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        # part is SF-proportional: AQE decides the build side
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("gross"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum((F.col("p_type") == "PROMO").cast("long")).alias("n_promo"),
        )
    )


# ---------------------------------------------------------------------------
# J8 — guarded cross join (tiny inputs only — trilateration candidate grids)
# ---------------------------------------------------------------------------


@register(
    "j8_cross_region_nation",
    oracle="""
    SELECT r.r_name AS r_name, n.n_name AS n_name,
           CAST(n.n_regionkey = r.r_regionkey AS BOOLEAN) AS is_home
    FROM region r CROSS JOIN nation n
    """,
    survey="J8",
)
def j8_cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name", "n_name", (F.col("n_regionkey") == F.col("r_regionkey")).alias("is_home")
    )


# ---------------------------------------------------------------------------
# Pivot — order status × priority matrix (conditional aggregation)
# ---------------------------------------------------------------------------


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p,
           round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY 1
    """,
    survey="A6,A7",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("n_f"),
        F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("n_o"),
        F.sum((F.col("o_orderstatus") == "P").cast("long")).alias("n_p"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )
