"""Observation-library operators (operators/analytics.py) cross-checked
against DuckDB over the same fixture parquet — the local analog of the
driver's oracle gate, applied to the reference-shaped schema."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from ssidentity_spark.operators import analytics as ops


@pytest.fixture(scope="module")
def obs_parquet(spark, observations, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("obs") / "observations.parquet")
    observations.coalesce(1).write.mode("overwrite").parquet(p)
    return p


@pytest.fixture(scope="module")
def duck(obs_parquet):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW observations AS SELECT * FROM read_parquet('{obs_parquet}/*.parquet')"
    )
    return con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _drows(con, sql):
    return sorted(tuple(r) for r in con.execute(sql).fetchall())


def test_interests(observations, duck):
    got = _rows(
        ops.interests(observations).select(
            "mac", F.array_join("ssids", ",").alias("s"), "n_ssids", "n_probes"
        )
    )
    want = _drows(
        duck,
        """SELECT mac, array_to_string(list_sort(list(DISTINCT ssid)), ','),
                  count(DISTINCT ssid), count(*)
           FROM observations GROUP BY mac""",
    )
    assert got == want


def test_active_hours(observations, duck):
    got = _rows(ops.active_hours(observations))
    want = _drows(
        duck,
        """SELECT mac, CAST(hour(ts) AS INTEGER), CAST(isodow(ts) AS INTEGER), count(*)
           FROM observations GROUP BY 1,2,3""",
    )
    assert got == want


def test_network_tree(observations, duck):
    got = _rows(
        ops.network_tree(observations).select(
            "ssid", F.array_join("clients", ",").alias("c"), "n_clients", "n_probes"
        )
    )
    want = _drows(
        duck,
        """SELECT ssid, array_to_string(list_sort(list(DISTINCT mac)), ','),
                  count(DISTINCT mac), count(*)
           FROM observations GROUP BY ssid""",
    )
    assert got == want


def test_dedup_drops_golden_duplicate(observations):
    """Rows 3-4 of the golden sample are identical → dedup removes one."""
    before = observations.filter(
        (F.col("mac") == "D42C0F2F56BB") & (F.col("rssi") == -84)
    ).count()
    after = (
        ops.dedup_observations(observations)
        .filter((F.col("mac") == "D42C0F2F56BB") & (F.col("rssi") == -84))
        .count()
    )
    assert before == 2 and after == 1


def test_signal_stats(observations, duck):
    got = _rows(ops.signal_stats(observations))
    want = _drows(
        duck,
        """SELECT mac, ssid, min(rssi), max(rssi), round(avg(rssi), 4),
                  round(stddev_samp(rssi), 4), round(avg(dist), 4), count(*)
           FROM observations GROUP BY 1,2""",
    )
    assert got == want


def test_distance_filter(observations, duck):
    got = ops.distance_filter(observations, 100.0).count()
    want = duck.execute(
        "SELECT count(*) FROM observations WHERE dist <= 100.0"
    ).fetchone()[0]
    assert got == want


def test_watchlist_semi_anti(spark, observations):
    from ssidentity_spark.fixtures import watchlist_df

    macs = [r.mac for r in observations.select("mac").distinct().limit(10).collect()]
    watch = watchlist_df(spark, macs)
    hits = ops.watchlist_hits(observations, watch)
    misses = ops.unknown_devices(observations, watch)
    assert hits.count() + misses.count() == observations.count()
    assert set(r.mac for r in hits.select("mac").distinct().collect()) <= set(macs[:5])


def test_ssid_locations_left_join(spark, observations):
    from ssidentity_spark.fixtures import ssid_geo_df

    joined = ops.ssid_locations(observations, ssid_geo_df(spark))
    assert joined.count() == observations.count()  # left join keeps all
    assert joined.filter(F.col("lat").isNull()).count() > 0  # unmatched SSIDs


def test_sessionize_counts(observations, duck):
    got = ops.sessionize(observations, gap="15 minutes").count()
    want = duck.execute(
        """WITH g AS (
             SELECT mac, CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 900
                              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS f
             FROM observations WINDOW w AS (PARTITION BY mac ORDER BY ts)
           ) SELECT sum(f) FROM g"""
    ).fetchone()[0]
    assert got == want


def test_arrivals_subset_of_observations(observations):
    arr = ops.arrivals(observations, gap="30 minutes")
    assert 0 < arr.count() <= observations.count()
    # every device's chronologically first observation is an arrival
    firsts = observations.groupBy("mac").agg(F.min("ts").alias("ts"))
    assert (
        arr.join(firsts, ["mac", "ts"], "left_semi").count()
        == firsts.count()
    )


def test_co_occurrence_symmetric_bound(observations):
    co = ops.co_occurrence(observations, window="30 seconds")
    rows = co.collect()
    assert all(r.mac_a < r.mac_b for r in rows)


def test_asof_last_seen(spark, observations):
    probes = observations.select("mac", "ts").limit(50)
    asof = ops.asof_last_seen(observations, probes)
    rows = asof.collect()
    assert len(rows) == 50
    assert all(r.asof_ts is None or r.asof_ts <= r.ts for r in rows)


def test_udtf_transitions_match_window_lag(spark, observations):
    """U4: the UDTF expansion agrees with the declarative lag() formulation."""
    from pyspark.sql import Window

    from ssidentity_spark.operators.udtf_ops import probe_transitions

    got = probe_transitions(spark, observations)
    w = Window.partitionBy("mac").orderBy(F.unix_timestamp("ts"), "ssid")
    # reference computation via lag over the same (t, ssid) ordering the
    # UDTF's array_sort(struct(t, ssid)) induces
    ref = (
        observations.select("mac", "ssid", F.unix_timestamp("ts").alias("t"))
        .withColumn("prev_ssid", F.lag("ssid").over(
            Window.partitionBy("mac").orderBy("t", "ssid")
        ))
        .withColumn("prev_t", F.lag("t").over(
            Window.partitionBy("mac").orderBy("t", "ssid")
        ))
        .filter(F.col("prev_ssid").isNotNull() & (F.col("prev_ssid") != F.col("ssid")))
        .select("mac", F.col("prev_ssid").alias("from_ssid"),
                F.col("ssid").alias("to_ssid"),
                (F.col("t") - F.col("prev_t")).alias("gap_s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_top_ssids(observations, duck):
    got = _rows(ops.top_ssids(observations, k=5))
    want = _drows(
        duck,
        """SELECT ssid, count(DISTINCT mac) AS d, count(*) AS n
           FROM observations GROUP BY ssid
           ORDER BY d DESC, n DESC, ssid LIMIT 5""",
    )
    assert got == want


def test_lsh_pairs_bucket_cap(spark):
    """The degenerate-bucket guardrail: a templated 'family' whose
    replicas all share band buckets is dropped when its bucket width
    exceeds max_bucket, while unrelated near-dup pairs survive — bounded
    per-bucket work at the cost of recall on the pathological family
    only. Default (no cap) still emits everything."""
    from ssidentity_spark.plans.dedup import _spark_lsh_pairs

    fam = "the same templated boilerplate sentence repeated across docs"
    rows = [(i, fam + f" v{i % 2}") for i in range(10)]  # big family
    rows += [
        (100, "a genuinely unique pair of documents about spark scaling"),
        (101, "a genuinely unique pair of documents about spark scaling!"),
    ]
    d = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    full = _spark_lsh_pairs(d)
    capped = _spark_lsh_pairs(d, max_bucket=4)
    full_pairs = {(r.doc_a, r.doc_b) for r in full.collect()}
    capped_pairs = {(r.doc_a, r.doc_b) for r in capped.collect()}
    assert (100, 101) in full_pairs and (100, 101) in capped_pairs
    fam_full = {p for p in full_pairs if p[0] < 100 and p[1] < 100}
    fam_capped = {p for p in capped_pairs if p[0] < 100 and p[1] < 100}
    assert len(fam_full) > 0
    assert len(fam_capped) < len(fam_full)  # wide buckets dropped
    assert capped_pairs <= full_pairs  # cap only removes, never invents


def test_morton_key_matches_python_reference(spark):
    from ssidentity_spark.functions.zorder import morton_key

    def py_morton(x, y, bits=16):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rows = [(0, 0), (1, 0), (0, 1), (255, 17), (1000, 29), (65535, 65535)]
    df = spark.createDataFrame(rows, "x long, y long").select(
        "x", "y", morton_key(F.col("x"), F.col("y"), 16).alias("z")
    )
    for r in df.collect():
        assert r["z"] == py_morton(r["x"], r["y"]), (r["x"], r["y"])


def test_scaled_morton_localizes_both_dimensions(spark):
    # points close in BOTH dims get closer keys than points close in only
    # one — the property that makes min/max pruning work per row group
    from ssidentity_spark.functions.zorder import morton_key_scaled

    df = spark.createDataFrame(
        [(10, 2), (11, 2), (10, 29), (1400, 2)], "u long, d long"
    ).select(
        "u", "d",
        morton_key_scaled(F.col("u"), 1500, F.col("d"), 31, 11).alias("z"),
    )
    z = {(r["u"], r["d"]): r["z"] for r in df.collect()}
    near = abs(z[(10, 2)] - z[(11, 2)])
    far_day = abs(z[(10, 2)] - z[(10, 29)])
    far_user = abs(z[(10, 2)] - z[(1400, 2)])
    assert near < far_day and near < far_user


def test_morton_scaled_huge_input_clamps_not_overflows(spark):
    # ADVICE r6: inputs past ~2^63/top used to hit ARITHMETIC_OVERFLOW in
    # the pre-clamp multiply under ANSI mode; the raw value must clamp
    # into [0, x_max] first and land on the same curve end as x_max
    from pyspark.sql import functions as F

    from ssidentity_spark.functions.zorder import morton_key_scaled

    df = spark.createDataFrame(
        [(2**62, 2), (1500, 2), (-(2**62), 2), (0, 2)], "u long, d long"
    ).select(
        "u",
        morton_key_scaled(F.col("u"), 1500, F.col("d"), 31, 11).alias("z"),
    )
    z = {r["u"]: r["z"] for r in df.collect()}
    assert z[2**62] == z[1500]  # clamps to the top of the range
    assert z[-(2**62)] == z[0]  # bottom clamp, no wrap


def test_morton_scaled_large_legitimate_domain(spark):
    # review r7: a LEGITIMATE domain max past ~2^63/top (nanosecond
    # epochs) must scale, not overflow — the scale multiply runs in
    # double, so ordering across the domain is preserved
    from pyspark.sql import functions as F

    from ssidentity_spark.functions.zorder import morton_key_scaled

    x_max = 1_700_000_000_000_000_000  # ns epoch scale
    df = spark.createDataFrame(
        [(0, 1), (x_max // 2, 1), (x_max, 1)], "t long, d long"
    ).select(
        "t",
        morton_key_scaled(F.col("t"), x_max, F.col("d"), 31, 16).alias("z"),
    )
    z = {r["t"]: r["z"] for r in df.collect()}
    assert z[0] < z[x_max // 2] < z[x_max]  # monotone across the domain


# --- interval sweep line (operators/intervals.py) -------------------------


def _iv_df(spark, rows):
    return spark.createDataFrame(rows, "s_start timestamp, s_end timestamp")


def test_max_concurrency_known_answer(spark):
    import datetime as dt

    from ssidentity_spark.operators.intervals import max_concurrency_by_bucket

    d = dt.datetime(2026, 3, 1)
    h = dt.timedelta(hours=1)
    rows = [
        (d + 1 * h, d + 4 * h),   # |----|
        (d + 2 * h, d + 5 * h),   #   |----|   overlap of 3 in [2h,4h]
        (d + 3 * h, d + 3 * h + dt.timedelta(minutes=30)),
        (d + 10 * h, d + 11 * h),  # isolated
    ]
    out = max_concurrency_by_bucket(_iv_df(spark, rows)).collect()
    assert len(out) == 1
    assert out[0]["max_concurrent"] == 3 and out[0]["n_segments"] == 4


def test_max_concurrency_boundary_spanner_counts_in_both_days(spark):
    import datetime as dt

    from ssidentity_spark.operators.intervals import max_concurrency_by_bucket

    d1 = dt.datetime(2026, 3, 1, 23, 0)
    d2 = dt.datetime(2026, 3, 2, 2, 0)
    out = {
        r["bucket_ts"]: (r["n_segments"], r["max_concurrent"])
        for r in max_concurrency_by_bucket(_iv_df(spark, [(d1, d2)])).collect()
    }
    assert out == {
        dt.datetime(2026, 3, 1): (1, 1),
        dt.datetime(2026, 3, 2): (1, 1),
    }


def test_max_concurrency_touching_intervals_are_concurrent(spark):
    import datetime as dt

    from ssidentity_spark.operators.intervals import max_concurrency_by_bucket

    d = dt.datetime(2026, 3, 1)
    h = dt.timedelta(hours=1)
    # end of first == start of second: starts-first tie order → concurrent
    rows = [(d + 1 * h, d + 2 * h), (d + 2 * h, d + 3 * h)]
    out = max_concurrency_by_bucket(_iv_df(spark, rows)).collect()
    assert out[0]["max_concurrent"] == 2


def test_max_concurrency_partitioning_invariant(spark):
    import datetime as dt
    import random

    from ssidentity_spark.operators.intervals import max_concurrency_by_bucket

    rng = random.Random(7)
    base = dt.datetime(2026, 3, 1)
    rows = []
    for _ in range(300):
        s = base + dt.timedelta(minutes=rng.randrange(0, 60 * 24 * 5))
        rows.append((s, s + dt.timedelta(minutes=rng.randrange(1, 600))))
    a = max_concurrency_by_bucket(_iv_df(spark, rows).repartition(13))
    b = max_concurrency_by_bucket(_iv_df(spark, rows).coalesce(1))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ema_fold_matches_python_reference(spark):
    from pyspark.sql import functions as F

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    rows = [(1, i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id int, event_id int, value double")
    arr = F.sort_array(F.collect_list(F.struct("event_id", "value")))
    vs = F.transform(arr, lambda s: s["value"])
    ema = F.aggregate(
        F.slice(vs, 2, F.greatest(F.size(vs) - 1, F.lit(0))),
        F.element_at(vs, 1),
        lambda acc, x: acc * F.lit(0.9) + x * F.lit(0.1),
    )
    got = df.groupBy("user_id").agg(ema.alias("ema")).collect()[0]["ema"]
    acc = vals[0]
    for v in vals[1:]:
        acc = acc * 0.9 + v * 0.1
    assert got == acc  # same fold order, same IEEE ops → bit-equal


# --- windowFunnel (plans/analytics.py:w6_funnel_progression) --------------


def test_funnel_levels_known_sequences(spark, tmp_path):
    import datetime as dt

    import pandas as pd

    from ssidentity_spark.plans.analytics import w6_funnel_progression

    base = dt.datetime(2026, 5, 1, 12, 0, 0)

    def ev(uid, minute, eid, etype):
        return (eid, base + dt.timedelta(minutes=minute), uid, etype, 1.0, "{}")

    rows = [
        # user 1: full chain inside the hour → level 3
        ev(1, 0, 1, "signup"), ev(1, 10, 2, "view"), ev(1, 20, 3, "purchase"),
        # user 2: purchase BEFORE view → chain stalls at 1... then view at
        # 30 → level 2; the early purchase must not count
        ev(2, 0, 10, "signup"), ev(2, 5, 11, "purchase"), ev(2, 30, 12, "view"),
        # user 3: view arrives 90 min after the anchoring signup → expired
        ev(3, 0, 20, "signup"), ev(3, 90, 21, "view"),
        # user 4: no signup at all → level 0
        ev(4, 0, 30, "view"), ev(4, 1, 31, "purchase"),
        # user 5: FIRST signup anchors; the second (later) signup must not
        # re-anchor, so the view at 70 min is expired → level 1
        ev(5, 0, 40, "signup"), ev(5, 65, 41, "signup"), ev(5, 70, 42, "view"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    sf_dir = str(tmp_path)
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r["user_id"]: r["funnel_level"]
        for r in w6_funnel_progression(spark, sf_dir).collect()
    }
    assert got == {1: 3, 2: 2, 3: 1, 4: 0, 5: 1}


def test_pii_redaction_semantics(spark):
    """Redaction pins: every type replaced with its token, counts match,
    fixed order means an email's digits never get re-matched as a phone,
    and non-PII text passes through byte-identical."""
    import pandas as pd

    from ssidentity_spark.functions.pii import pii_counts, redact_pii
    from pyspark.sql import functions as F

    cases = [
        ("mail a.b+c@ex-ample.org now", "mail <EMAIL> now", (1, 0, 0, 0)),
        ("card 1234 5678 9012 3456 and 1111-2222-3333-4444",
         "card <CARD> and <CARD>", (0, 2, 0, 0)),
        ("call +14155550100 ok", "call <PHONE> ok", (0, 0, 1, 0)),
        ("host 192.168.0.1:8080", "host <IP>:8080", (0, 0, 0, 1)),
        ("plain text, no identifiers.", "plain text, no identifiers.",
         (0, 0, 0, 0)),
        # the whole +digits@host span is ONE email (the local-part class
        # includes '+'), consumed before the phone pattern can see it in
        # REDACTION; counts are independent per-pattern tallies on the
        # raw text, so the span tallies under both email AND phone
        ("x +123456789@mail.com y", "x <EMAIL> y", (1, 0, 1, 0)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(cases)), "t": [c[0] for c in cases]})
    )
    counts = pii_counts(F.col("t"))
    got = {
        r["i"]: r
        for r in df.select(
            "i",
            redact_pii(F.col("t")).alias("red"),
            counts["n_email"].alias("e"),
            counts["n_card"].alias("c"),
            counts["n_phone"].alias("p"),
            counts["n_ipv4"].alias("q"),
        ).collect()
    }
    for i, (_raw, want_red, (e, c, p, q)) in enumerate(cases):
        assert got[i]["red"] == want_red, (i, got[i]["red"])
        assert (got[i]["e"], got[i]["c"], got[i]["p"], got[i]["q"]) == (
            e, c, p, q,
        ), i


def test_running_total_matches_global_window(spark):
    """assign_running_total (r9): the two-phase bucket prefix sum equals
    the naive global running-total window on every row, for a DESC float
    order with a monotone quantized bucket — including ties resolved by
    the id tiebreaker and the empty-prefix row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ssidentity_spark.operators.rowids import assign_running_total

    df = spark.range(500).select(
        F.col("id"),
        (F.pmod(F.hash("id"), F.lit(100)) / 100.0).alias("q"),
        (F.pmod(F.hash("id", F.lit(1)), F.lit(50)) + 1).alias("v"),
    )
    got = assign_running_total(
        df,
        order=[F.desc("q"), F.asc("id")],
        value_col="v",
        bucket=F.floor((F.lit(1.0) - F.col("q")) * 16).cast("int"),
    )
    w = Window.orderBy(F.desc("q"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    want = df.withColumn(
        "running_before", F.coalesce(F.sum("v").over(w), F.lit(0)).cast("bigint")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the first row in the order has an empty prefix
    first = got.orderBy(F.desc("q"), F.asc("id")).limit(1).collect()[0]
    assert first["running_before"] == 0


def test_running_total_sampled_bucket_path(spark):
    """The bucket-less (repartitionByRange) fallback produces the same
    prefix sums as the explicit-bucket path."""
    from pyspark.sql import functions as F

    from ssidentity_spark.operators.rowids import assign_running_total

    df = spark.range(300).select(
        F.col("id"), (F.pmod(F.hash("id"), F.lit(7)) + 1).alias("v")
    )
    a = assign_running_total(
        df, order=[F.asc("id")], value_col="v", n_parts=8
    )
    b = assign_running_total(
        df,
        order=[F.asc("id")],
        value_col="v",
        bucket=(F.col("id") / 40).cast("int"),
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_running_total_rejects_null_buckets(spark):
    """r9 review: a NULL bucket would silently DROP the row at the
    offsets equi-join — it must raise instead."""
    import pytest
    from pyspark.sql import functions as F

    from ssidentity_spark.operators.rowids import assign_running_total

    df = spark.range(10).select(
        "id",
        F.when(F.col("id") < 5, F.col("id")).alias("maybe_null"),
        F.lit(1).alias("v"),
    )
    out = assign_running_total(
        df, order=[F.asc("id")], value_col="v", bucket=F.col("maybe_null")
    )
    with pytest.raises(Exception, match="sentinel bucket"):
        out.collect()
