"""operators/merge: MERGE clause semantics + SCD2 run collapsing."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ssidentity_spark.operators.merge import merge_upsert, scd2_history


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, bal double",
    )


def _changes(spark):
    # 1: update, 3: delete (flagged), 9: insert; 2 untouched
    return spark.createDataFrame(
        [(1, 5.0, False), (3, 0.0, True), (9, 7.0, False)],
        "id long, delta double, tomb boolean",
    )


def test_merge_all_four_clauses(spark):
    out = merge_upsert(
        _base(spark),
        _changes(spark),
        key="id",
        set_cols={
            "name": F.coalesce(F.col("b.name"), F.lit("new")),
            "bal": F.coalesce(F.col("b.bal"), F.lit(0.0)) + F.col("c.delta"),
        },
        delete_when=F.col("c.tomb"),
    )
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 9}  # 3 deleted
    assert rows[1]["merge_action"] == "updated" and rows[1]["bal"] == 15.0
    assert rows[2]["merge_action"] == "kept" and rows[2]["bal"] == 20.0
    assert rows[9]["merge_action"] == "inserted"
    assert rows[9]["name"] == "new" and rows[9]["bal"] == 7.0


def test_merge_without_deletes_keeps_matched(spark):
    out = merge_upsert(
        _base(spark),
        _changes(spark),
        key="id",
        set_cols={"bal": F.coalesce(F.col("b.bal"), F.lit(0.0))},
    )
    assert {r["id"] for r in out.collect()} == {1, 2, 3, 9}


def test_scd2_collapses_runs_and_dates_them(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0 + dt.timedelta(minutes=m), v)
        for m, v in [(0, "x"), (1, "x"), (2, "y"), (3, "y"), (4, "x")]
    ] + [(2, t0, "z")]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, v string")
    hist = scd2_history(df, "uid", "ts", "v").collect()
    u1 = sorted(
        (r for r in hist if r["uid"] == 1), key=lambda r: r["valid_from"]
    )
    assert [r["value"] for r in u1] == ["x", "y", "x"]
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert [r["is_current"] for r in u1] == [False, False, True]
    (u2,) = [r for r in hist if r["uid"] == 2]
    assert u2["value"] == "z" and u2["is_current"] and u2["valid_to"] is None


def test_ivm_merge_is_order_invariant(spark):
    """Any increment order (and any split granularity) converges to the
    same state — the algebraic property incremental maintenance rests on."""
    from ssidentity_spark.operators.incremental import (
        merge_partials,
        readout,
        rollup_partials,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    day = F.dayofmonth("ts")

    def build(splits):
        state = rollup_partials(ev.where(splits[0]), ["user_id"], "value")
        for cond in splits[1:]:
            state = merge_partials(
                state, rollup_partials(ev.where(cond), ["user_id"], "value"),
                ["user_id"],
            )
        return sorted(map(tuple, readout(state, ["user_id"]).collect()))

    whole = build([day >= 1])
    daily_fwd = build([day == d for d in range(1, 31)])
    daily_rev = build([day == d for d in range(30, 0, -1)])
    assert whole == daily_fwd == daily_rev


def test_cdc_apply_latest_wins_and_tombstones(spark):
    from ssidentity_spark.operators.merge import apply_cdc_log

    rows = [
        # key 1: U then U — latest (seq 3) wins
        (1, 1, "U", "a"),
        (1, 3, "U", "b"),
        # key 2: U then terminal D — key dropped
        (2, 1, "U", "x"),
        (2, 9, "D", None),
        # key 3: D then a LATER U — resurrection wins
        (3, 2, "D", None),
        (3, 5, "U", "back"),
    ]
    df = spark.createDataFrame(rows, "k int, seq int, op string, v string")
    out = {
        r["k"]: (r["v"], r["n_changes"])
        for r in apply_cdc_log(df, ["k"], ["seq"], "op").collect()
    }
    assert out == {1: ("b", 2), 3: ("back", 2)}


def test_cdc_apply_is_arrival_order_invariant(spark):
    """The sequence defines 'latest' — a shuffled replay of the same log
    compacts to the identical final state."""
    import random

    from ssidentity_spark.operators.merge import apply_cdc_log

    rows = [
        (k, seq, "D" if (k * 7 + seq) % 11 == 0 else "U", f"v{k}-{seq}")
        for k in range(20)
        for seq in range(15)
    ]
    shuffled = rows[:]
    random.Random(42).shuffle(shuffled)
    schema = "k int, seq int, op string, v string"
    a = apply_cdc_log(
        spark.createDataFrame(rows, schema).repartition(8), ["k"], ["seq"], "op"
    )
    b = apply_cdc_log(
        spark.createDataFrame(shuffled, schema).repartition(3), ["k"], ["seq"], "op"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_merge_null_delete_condition_updates_not_deletes(spark):
    """SQL MERGE semantics: an UNKNOWN (NULL) delete predicate is
    not-deleted — the matched row must fall through to the update
    clause, never silently vanish."""
    from ssidentity_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, bal double")
    changes = spark.createDataFrame(
        [(1, None, 5.0), (2, "D", 0.0)], "k long, op string, delta double"
    )
    out = {
        r["k"]: r["bal"]
        for r in merge_upsert(
            base,
            changes,
            key="k",
            set_cols={"bal": F.col("b.bal") + F.col("c.delta")},
            delete_when=F.col("c.op") == "D",
        ).collect()
    }
    # k=1: op NULL -> delete condition UNKNOWN -> updated (not dropped);
    # k=2: op 'D' -> deleted
    assert out == {1: 15.0}


def test_scd2_null_values_form_their_own_runs(spark):
    """A -> NULL -> A must produce three runs (null-safe run detection),
    not collapse into one."""
    import datetime as dt

    from ssidentity_spark.operators.merge import scd2_history

    base = dt.datetime(2026, 6, 1)
    rows = [
        (1, base, "A"),
        (1, base + dt.timedelta(hours=1), None),
        (1, base + dt.timedelta(hours=2), "A"),
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v string")
    runs = scd2_history(df, "k", "ts", "v").orderBy("valid_from").collect()
    assert [r["value"] for r in runs] == ["A", None, "A"]
    assert [r["is_current"] for r in runs] == [False, False, True]
