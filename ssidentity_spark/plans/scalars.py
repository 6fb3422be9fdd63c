"""Scalar-derivation surface (SURVEY §2.3 D1-D7) exercised over the driver
tables with a DuckDB oracle twin for every expression family.

D1 (FSPL distance) is the reference's one real derivation
(/root/reference/ssidentity.c:283-286):
    dist = 10 ^ ((27.55 − RSSI − 20·log10(freq)) / 20)  [meters]
validated against the 4 golden rows of /root/reference/observations.db in
tests/test_fspl.py. Here it runs over deterministic integer (rssi, freq)
pairs derived from event ids so both engines compute bit-comparable inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssidentity_spark.functions.fspl import fspl_distance
from ssidentity_spark.io import load_table
from ssidentity_spark.registry import register

# ---------------------------------------------------------------------------
# D1/D2/D6 — FSPL distance + rounding
# ---------------------------------------------------------------------------


@register(
    "d1_fspl_distance",
    oracle="""
    SELECT event_id,
           CAST(-90 + event_id % 60 AS INTEGER) AS rssi,
           CAST(2412 + (event_id % 5) * 25 AS INTEGER) AS freq,
           round(pow(10, (27.55 - (-90 + event_id % 60)
                          - 20 * log10(2412 + (event_id % 5) * 25)) / 20), 2) AS dist
    FROM events
    """,
    survey="D1,D6",
)
def d1_fspl_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rssi = (F.lit(-90) + F.col("event_id") % 60).cast("int")
    freq = (F.lit(2412) + (F.col("event_id") % 5) * 25).cast("int")
    return ev.select(
        "event_id",
        rssi.alias("rssi"),
        freq.alias("freq"),
        fspl_distance(rssi, freq).alias("dist"),
    )


# ---------------------------------------------------------------------------
# D7 — string functions
# ---------------------------------------------------------------------------


@register(
    "d7_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           substr(p_name, 1, 5) AS name_pfx,
           CAST(length(p_name) AS INTEGER) AS name_len,
           CAST(instr(p_name, 'widget') AS INTEGER) AS widget_pos,
           concat(p_brand, ':', p_type) AS brand_type,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           replace(p_name, ' ', '_') AS snake,
           trim(lower(p_type)) AS type_lc
    FROM part
    """,
    survey="D7",
)
def d7_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.length("p_name").alias("name_len"),
        F.instr(F.col("p_name"), "widget").alias("widget_pos"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.trim(F.lower("p_type")).alias("type_lc"),
    )


# ---------------------------------------------------------------------------
# D3/D7 — timestamp functions (incl. the reference's ts_str rendering,
# ssidentity.c:221 strftime "%x - %I:%M%p")
# ---------------------------------------------------------------------------


@register(
    "d7_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(isodow(o_orderdate) AS INTEGER) AS dow,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS INTEGER)
             AS days_to_2002,
           strftime(o_orderdate, '%m/%d/%y - %I:%M%p') AS ts_str
    FROM orders
    """,
    survey="D3,D7",
)
def d7_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        (F.weekday("o_orderdate") + F.lit(1)).alias("dow"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        # the reference's observation timestamp rendering (ssidentity.c:221)
        F.date_format("o_orderdate", "MM/dd/yy - hh:mma").alias("ts_str"),
    )


# ---------------------------------------------------------------------------
# D7 — JSON extraction (events.props is a JSON string)
# ---------------------------------------------------------------------------


@register(
    "d7_json_extract",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) % 10 AS k_mod
    FROM events
    """,
    survey="D7",
)
def d7_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k"), (k % 10).alias("k_mod"))


# ---------------------------------------------------------------------------
# D7 — math functions
# ---------------------------------------------------------------------------


@register(
    "d7_math_funcs",
    oracle="""
    SELECT event_id,
           round(abs(value - 100), 4) AS centered,
           round(sqrt(value), 6) AS root,
           round(ln(value + 1), 6) AS log_nat,
           round(log10(value + 1), 6) AS log_ten,
           CAST(ceil(value) AS BIGINT) AS val_ceil,
           CAST(floor(value) AS BIGINT) AS val_floor,
           round(pow(value, 0.5) * 2, 6) AS scaled
    FROM events
    """,
    survey="D7",
)
def d7_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(F.abs(v - 100), 4).alias("centered"),
        F.round(F.sqrt(v), 6).alias("root"),
        F.round(F.log(v + 1), 6).alias("log_nat"),
        F.round(F.log10(v + 1), 6).alias("log_ten"),
        F.ceil(v).alias("val_ceil"),
        F.floor(v).alias("val_floor"),
        F.round(F.pow(v, 0.5) * 2, 6).alias("scaled"),
    )


# ---------------------------------------------------------------------------
# D7 — array functions over embeddings (size / element / fold)
# ---------------------------------------------------------------------------


@register(
    "d7_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 5)
             AS elem_sum,
           round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6)
             AS elem_max
    FROM embeddings
    """,
    survey="D7,U5",
)
def d7_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return em.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 5
        ).alias("elem_sum"),
        F.round(F.array_max(dbl), 6).alias("elem_max"),
    )


