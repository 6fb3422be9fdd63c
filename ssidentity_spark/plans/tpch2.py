"""Second wave of star-schema queries: correlated-subquery shapes, exact
percentiles, min_by/max_by, unpivot, ntile/percent_rank — widening the
SURVEY §2.4-§2.7 surface with oracle twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssidentity_spark.io import load_table
from ssidentity_spark.registry import register

# ---------------------------------------------------------------------------
# TPC-H Q6 analog: the scan-dominant filter-aggregate (P11 + A6)
# ---------------------------------------------------------------------------


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    survey="P11,A6",
    bench=True,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 analog: EXISTS-style semi join with date correlation
# ---------------------------------------------------------------------------


@register(
    "tpch_q4_priority_count",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY 1
    """,
    survey="J3,A6",
)
def tpch_q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    filtered = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    hit = filtered.join(
        li,
        (filtered.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > filtered.o_orderdate),
        "left_semi",
    )
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


# ---------------------------------------------------------------------------
# TPC-H Q14 analog: conditional-aggregation ratio (promo revenue share)
# ---------------------------------------------------------------------------


@register(
    "tpch_q14_promo_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
    survey="J1,A6",
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)  # SF-proportional: AQE decides
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 analog: HAVING over a grouped subquery (large-quantity orders)
# ---------------------------------------------------------------------------


@register(
    "tpch_q18_big_orders",
    oracle="""
    SELECT o.o_orderkey AS o_orderkey, round(t.total_qty, 2) AS total_qty,
           round(o.o_totalprice, 2) AS o_totalprice
    FROM orders o
    JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty
          FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150) t
      ON o.o_orderkey = t.l_orderkey
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    survey="A6,J2,O2",
)
def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    t = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 150)
    )
    return (
        o.join(t, o.o_orderkey == t.l_orderkey)
        .select(
            "o_orderkey",
            F.round("raw_qty", 2).alias("total_qty"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Exact percentiles / median (A-family distribution stats)
# ---------------------------------------------------------------------------


@register(
    "agg_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY 1
    """,
    survey="A6,A8",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


@register(
    "agg_min_max_by",
    # Determinism: bare min_by/max_by leaves the returned key
    # engine-nondeterministic when two orders in a group share the extreme
    # price (o_totalprice already has duplicate values at sf0.1). Both
    # sides therefore take the lexicographic min/max of (price, orderkey)
    # — struct comparison in Spark, struct_pack in DuckDB — so the ties
    # break on the key identically in both engines.
    oracle="""
    SELECT o_orderstatus,
           min(struct_pack(p := o_totalprice, k := o_orderkey)).k
             AS cheapest_order,
           max(struct_pack(p := o_totalprice, k := o_orderkey)).k
             AS priciest_order,
           round(min(o_totalprice), 2) AS min_price,
           round(max(o_totalprice), 2) AS max_price
    FROM orders GROUP BY 1
    """,
    survey="A6",
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pk = F.struct(
        F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k")
    )
    return o.groupBy("o_orderstatus").agg(
        F.min(pk)["k"].alias("cheapest_order"),
        F.max(pk)["k"].alias("priciest_order"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


# ---------------------------------------------------------------------------
# Unpivot / stack (O-family reshaping)
# ---------------------------------------------------------------------------


@register(
    "unpivot_customer_metrics",
    oracle="""
    SELECT c_custkey, metric, round(val, 4) AS val FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    """,
    survey="O3,D7",
)
def unpivot_customer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.selectExpr(
        "c_custkey",
        "stack(2, 'acctbal', c_acctbal, 'nationkey', CAST(c_nationkey AS DOUBLE))"
        " AS (metric, raw_val)",
    ).select("c_custkey", "metric", F.round("raw_val", 4).alias("val"))


# ---------------------------------------------------------------------------
# Distribution window functions: ntile / percent_rank / cume_dist (W1)
# ---------------------------------------------------------------------------


@register(
    "w1_distribution_ranks",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
    survey="W1",
)
def w1_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks over a GLOBAL ordering without a global window.

    ``Window.orderBy`` with no partitionBy (the round-1 plan) funnels every
    row through one task — correct at test scale, a straggler/OOM at 100 TB.
    Instead: two-pass bucketed global row_number (operators/analytics.py
    ``scalable_global_row_number``), then ntile/percent_rank/cume_dist are
    pure arithmetic on (rn, n_total) because the ordering key
    (o_totalprice, o_orderkey) is unique — rank == row_number, so
    percent_rank = (rn-1)/(n-1) and cume_dist = rn/n exactly."""
    from ssidentity_spark.operators.analytics import (
        ntile_from_rn,
        scalable_global_row_number,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked = scalable_global_row_number(o, ["o_totalprice", "o_orderkey"])
    rn, n = F.col("rn"), F.col("n_total")
    return ranked.select(
        "o_orderkey",
        ntile_from_rn(rn, n, 4).cast("int").alias("quartile"),
        # n == 1 would make (rn-1)/(n-1) a NULL-producing 0/0; SQL's
        # percent_rank() defines the single-row case as 0.0.
        F.round(
            F.when(n > 1, (rn - 1) / (n - 1)).otherwise(F.lit(0.0)), 6
        ).alias("pct_rank"),
        F.round(rn / n, 6).alias("cume"),
    )


# ---------------------------------------------------------------------------
# string_agg / listagg-style ordered concatenation (A4-adjacent)
# ---------------------------------------------------------------------------


@register(
    "agg_ordered_listagg",
    oracle="""
    SELECT n.n_name AS nation,
           string_agg(s.s_name, '|' ORDER BY s.s_name) AS suppliers
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY 1
    """,
    survey="A4",
)
def agg_ordered_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), "|").alias(
                "suppliers"
            )
        )
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery shape: customers above their nation's average
# ---------------------------------------------------------------------------


@register(
    "j9_above_nation_avg",
    # Determinism: the membership test runs in EXACT integer cents
    # (cents * n > sum_cents), never as `c_acctbal > avg(double)` — a
    # balance exactly equal to its nation's average sits within 1 ulp of a
    # float threshold, and the two engines' summation orders can land on
    # opposite sides (the exact class tpch3.py's q22 postmortem records
    # breaking at sf0.1). nation_avg is then ONE double division of exact
    # integers, deterministic in both engines. Overflow headroom:
    # cents ≈ 1e6, so cents * n stays inside int64 up to ~9e12 customers
    # per nation — far beyond 100 TB scale.
    oracle="""
    WITH c2 AS (
      SELECT c_nationkey, c_custkey, c_acctbal,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    ), nat_avg AS (
      SELECT c_nationkey, sum(cents) AS sum_cents, count(*) AS n_cust
      FROM c2 GROUP BY 1
    )
    SELECT c.c_custkey AS c_custkey,
           round(c.c_acctbal, 2) AS acctbal,
           round(a.sum_cents / (100.0 * a.n_cust), 4) AS nation_avg
    FROM c2 c JOIN nat_avg a ON c.c_nationkey = a.c_nationkey
    WHERE c.cents * a.n_cust > a.sum_cents
    """,
    survey="J9,A6",
)
def j9_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cents", F.round(F.col("c_acctbal") * 100).cast("long")
    )
    nat = c.groupBy("c_nationkey").agg(
        F.sum("cents").alias("sum_cents"), F.count(F.lit(1)).alias("n_cust")
    )
    return (
        c.join(F.broadcast(nat), "c_nationkey")
        .filter(F.col("cents") * F.col("n_cust") > F.col("sum_cents"))
        .select(
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.round(F.col("sum_cents") / (F.col("n_cust") * 100.0), 4).alias(
                "nation_avg"
            ),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q7/Q8/Q9 analog shapes (J9 multi-way, dual dimension roles).
# The testdata lacks partsupp, so Q9's supply cost uses a retail-price proxy
# (documented inline); Q7/Q8 map 1:1 onto the available columns.
# ---------------------------------------------------------------------------

# The Python tuple is the source of truth; the SQL IN-list is derived from
# it (not the other way round — reverse-parsing the SQL fragment would
# silently corrupt on any name containing a quote or comma).
_Q7_NATION_NAMES = ("NATION_1", "NATION_2", "NATION_3")
_Q7_NATIONS = "(" + ", ".join(f"'{n}'" for n in _Q7_NATION_NAMES) + ")"


@register(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           -- floor to whole currency units: round()'s half-mode diverges
           -- between engines when a 60k-term double sum lands on a .xx5
           CAST(floor(sum(volume)) AS BIGINT) AS revenue,
           count(*) AS n_items
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN {_Q7_NATIONS}
        AND n2.n_name IN {_Q7_NATIONS}
        AND n1.n_name <> n2.n_name
    )
    GROUP BY 1, 2, 3
    """,
    survey="J9,J1,A6",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog: bilateral trade volume between nation pairs, with
    the nation dim joined in TWO roles (supplier side and customer side).
    Both nation joins are explicit broadcasts (fixed 25-row cardinality —
    the b6c008f hint policy); the three fact joins stay AQE-governed. The
    nation IN-filters reach the dim scans, so the fact side is pruned by
    two broadcast semi-join-shaped filters before the agg shuffle."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    nations = list(_Q7_NATION_NAMES)
    n1 = n.filter(F.col("n_name").isin(nations)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin(nations)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.floor(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("long")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share,
           count(*) AS n_items
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
    )
    GROUP BY o_year
    """,
    survey="J9,J1,A6",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog: one nation's share of PROMO-part volume sold into
    one region, per order year — an 8-way join (part, lineitem, supplier,
    orders, customer, nation x2 roles, region). Nation/region broadcast
    (fixed cardinality); part's p_type filter is pushed to its scan and AQE
    sizes that join; conditional share via CASE inside the same agg (one
    shuffle, no second pass)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q9_profit_by_nation",
    oracle="""
    SELECT nation, o_year, CAST(floor(sum(amount)) AS BIGINT) AS profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.1 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    )
    GROUP BY 1, 2
    """,
    survey="J9,A6",
)
def tpch_q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog: profit per supplier nation per year over a
    name-matched part subset. The testdata has no partsupp table, so
    supply cost is proxied as 10% of p_retailprice x quantity (the join
    tree and agg shape — 5-way with a LIKE-filtered part dim — is the
    point, not the cost constant)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        p.join(li, p.p_partkey == li.l_partkey)
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(F.floor(F.sum(amount)).cast("long").alias("profit"))
    )
