"""File-pruned MERGE INTO the versioned table (operators/tablelog.py:
merge_into, VERDICT r7 ask #3) — clause semantics, the by-reference
file-pruning claim, change-feed reconstruction (batch + streaming), and
the r7 ADVICE hardening items that landed alongside it."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.operators.tablelog import (
    VersionConflict,
    _read_manifest,
    history,
    latest_version,
    merge_into,
    read_changes,
    read_versioned,
    write_versioned,
)


@pytest.fixture()
def base_table(spark, tmp_path):
    """1000 keys range-clustered into 8 files: key bands of ~125."""
    path = str(tmp_path / "t")
    df = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") * 10.0).alias("price"),
        F.concat(F.lit("b"), (F.col("id") % 5).cast("string")).alias("brand"),
    )
    write_versioned(df.repartitionByRange(8, "k"), path, "append")
    return path


def _changes(spark):
    """Changelog localized to keys [0, 100): delete %10==0, update the
    rest (+1.0), plus 5 brand-new keys."""
    upd = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 10.0 + 1.0).alias("price"),
        F.when(F.col("id") % 10 == 0, "D").otherwise("U").alias("op"),
    )
    ins = spark.range(5000, 5005).select(
        F.col("id").alias("k"), F.lit(9.99).alias("price"), F.lit("I").alias("op")
    )
    return upd.unionByName(ins)


def test_merge_semantics(spark, base_table):
    stats = merge_into(
        spark,
        base_table,
        _changes(spark),
        "k",
        {"price": "c.price"},
        delete_when="c.op = 'D'",
    )
    assert stats["rows_deleted"] == 10
    assert stats["rows_updated"] == 90
    assert stats["rows_inserted"] == 5
    got = {(r["k"], r["price"], r["brand"]) for r in
           read_versioned(spark, base_table).collect()}
    expect = set()
    for k in range(1000):
        if k < 100 and k % 10 == 0:
            continue  # deleted
        price = k * 10.0 + 1.0 if k < 100 else k * 10.0
        expect.add((k, price, f"b{k % 5}"))
    for k in range(5000, 5005):
        expect.add((k, 9.99, None))  # unassigned col inserts as NULL
    assert got == expect


def test_merge_prunes_files_by_reference(spark, base_table):
    before = set(_read_manifest(base_table, 0)["files"])
    stats = merge_into(
        spark,
        base_table,
        _changes(spark),
        "k",
        {"price": "c.price"},
        delete_when="c.op = 'D'",
    )
    # keys [0,100) live in 1 of 8 range-clustered files
    assert stats["files_rewritten"] == 1
    assert stats["files_kept"] == 7
    after = set(_read_manifest(base_table, stats["version"])["files"])
    # kept files carry BY REFERENCE: same rel paths, bytes untouched
    assert len(before & after) == 7
    assert history(base_table)[-1]["operation"] == "merge"


def test_merge_empty_changelog_commits_nothing(spark, base_table):
    stats = merge_into(
        spark,
        base_table,
        spark.createDataFrame([], "k bigint, price double, op string"),
        "k",
        {"price": "c.price"},
    )
    assert stats["version"] == 0
    assert latest_version(base_table) == 0


def test_merge_change_feed_batch(spark, base_table):
    v = merge_into(
        spark,
        base_table,
        _changes(spark),
        "k",
        {"price": "c.price"},
        delete_when="c.op = 'D'",
    )["version"]
    feed = read_changes(spark, base_table, 0, include_deletes=True)
    rows = {
        (r["k"], r["price"], r["_commit_version"], r["_change_type"])
        for r in feed.where(F.col("_commit_version") == v).collect()
    }
    deletes = {t for t in rows if t[3] == "delete"}
    pres = {t for t in rows if t[3] == "update_preimage"}
    posts = {t for t in rows if t[3] == "update_postimage"}
    inserts = {t for t in rows if t[3] == "insert"}
    assert {t[0] for t in deletes} == {k for k in range(100) if k % 10 == 0}
    assert len(pres) == len(posts) == 90
    assert all(t[1] == t[0] * 10.0 for t in pres)
    assert all(t[1] == t[0] * 10.0 + 1.0 for t in posts)
    assert {t[0] for t in inserts} == set(range(5000, 5005))
    # append-only consumers must not silently cross a merge
    with pytest.raises(ValueError, match="MERGE"):
        read_changes(spark, base_table, 0)


def test_merge_streaming_change_feed(spark, base_table, tmp_path):
    from ssidentity_spark.sources.managed_source import register

    register(spark)
    merge_into(
        spark,
        base_table,
        _changes(spark),
        "k",
        {"price": "c.price"},
        delete_when="c.op = 'D'",
    )
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("managed_table")
        .option("readChangeFeed", "true")
        .load(base_table)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    by_type = {
        r["_change_type"]: r["n"]
        for r in got.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {
        "insert": 1000 + 5,  # v0 snapshot + merge inserts
        "delete": 10,
        "update_preimage": 90,
        "update_postimage": 90,
    }


def test_merge_rejects_nondeterministic_assignment(spark, base_table):
    with pytest.raises(ValueError, match="deterministic"):
        merge_into(
            spark,
            base_table,
            _changes(spark),
            "k",
            {"price": "c.price + rand()"},
        )


def test_merge_into_empty_table_is_all_inserts(spark, tmp_path):
    path = str(tmp_path / "e")
    write_versioned(
        spark.createDataFrame([], "k bigint, price double"), path, "append"
    )
    stats = merge_into(
        spark,
        path,
        spark.range(3).select(F.col("id").alias("k"), F.lit(1.5).alias("price")),
        "k",
        {"price": "c.price"},
    )
    assert stats["rows_inserted"] == 3
    got = {(r["k"], r["price"]) for r in read_versioned(spark, path).collect()}
    assert got == {(0, 1.5), (1, 1.5), (2, 1.5)}


def test_merge_applies_tip_deletion_vectors(spark, base_table):
    """Rows removed by a DV before the merge must stay removed: the
    positioned scan drops them, so the rewrite materializes the delete
    for hit files."""
    from ssidentity_spark.operators.tablelog import delete_where

    delete_where(spark, base_table, "k = 5", mode="dv")
    merge_into(
        spark,
        base_table,
        spark.createDataFrame([(7, 999.0)], "k bigint, price double"),
        "k",
        {"price": "c.price"},
    )
    tip = read_versioned(spark, base_table)
    assert tip.where("k = 5").count() == 0
    assert tip.where("k = 7").collect()[0]["price"] == 999.0
    assert tip.count() == 999


# --- r7 ADVICE hardening -------------------------------------------------


def test_version_listing_survives_9_digit_versions(spark, tmp_path):
    """ADVICE r7: v100000000 widens the zero-pad to 9 digits; the
    listing regex must still see it or the log wedges in perpetual
    VersionConflict."""
    from ssidentity_spark.operators.tablelog import _commit

    path = str(tmp_path / "wide")
    write_versioned(spark.range(3).selectExpr("id AS k"), path, "append")
    m = _read_manifest(path, 0)
    _commit(path, 100_000_000, m["files"], "append")
    assert latest_version(path) == 100_000_000
    assert read_versioned(spark, path, 100_000_000).count() == 3


def test_commit_files_rejects_bookkeeping_meta(spark, tmp_path):
    from ssidentity_spark.operators.tablelog import commit_files

    path = str(tmp_path / "bk")
    write_versioned(spark.range(3).selectExpr("id AS k"), path, "append")
    for key in ("dv_files", "schema", "batch_ids", "change_file"):
        with pytest.raises(ValueError, match="bookkeeping"):
            commit_files(path, [], meta={key: []})


def test_quiet_change_feed_over_vacuumed_table_returns_typed_empty(
    spark, tmp_path
):
    """ADVICE r7: an all-quiet feed range whose end manifest was
    vacuumed must return an empty typed frame, not FileNotFoundError."""
    from ssidentity_spark.operators.tablelog import vacuum

    path = str(tmp_path / "q")
    write_versioned(spark.range(3).selectExpr("id AS k"), path, "append")
    write_versioned(spark.range(3, 5).selectExpr("id AS k"), path, "append")
    vacuum(path, keep_latest=1)
    feed = read_changes(spark, path, 1, 1, include_deletes=True)
    assert feed.count() == 0
    assert "k" in feed.columns and "_commit_version" in feed.columns


# --- r8 ADVICE hardening -------------------------------------------------


def test_merge_rejects_duplicate_change_keys(spark, base_table):
    """ADVICE r8 (high): two changelog rows for one key must raise — a
    full-outer join would fan the matched base row out, duplicating it in
    the rewrite and fabricating duplicate update_preimage facts."""
    dup = spark.createDataFrame(
        [(1, 11.0), (1, 12.0), (2, 20.5)], "k bigint, price double"
    )
    with pytest.raises(ValueError, match="at most one source row"):
        merge_into(spark, base_table, dup, "k", {"price": "c.price"})
    # nothing committed, table untouched
    assert latest_version(base_table) == 0
    assert read_versioned(spark, base_table).count() == 1000


def test_merge_null_change_keys_insert_independently(spark, tmp_path):
    """NULL change keys never equi-match a base row: each is an
    independent insert, exempt from the duplicate-key gate."""
    path = str(tmp_path / "nk")
    write_versioned(
        spark.createDataFrame([(1, 10.0)], "k bigint, price double"),
        path,
        "append",
    )
    ch = spark.createDataFrame(
        [(None, 1.0), (None, 2.0)], "k bigint, price double"
    )
    stats = merge_into(spark, path, ch, "k", {"price": "c.price"})
    assert stats["rows_inserted"] == 2
    assert stats["rows_updated"] == 0
    got = {(r["k"], r["price"]) for r in read_versioned(spark, path).collect()}
    assert got == {(1, 10.0), (None, 1.0), (None, 2.0)}


def test_merge_preserves_null_key_base_rows(spark, tmp_path):
    """ADVICE r8 (medium): a base row whose merge-key column is NULL in a
    HIT file must pass through untouched — not inflated into
    rows_inserted, no fabricated _change_type='insert' fact."""
    path = str(tmp_path / "nb")
    write_versioned(
        spark.createDataFrame(
            [(None, 1.0), (7, 70.0)], "k bigint, price double"
        ).coalesce(1),
        path,
        "append",
    )
    stats = merge_into(
        spark,
        path,
        spark.createDataFrame([(7, 77.0)], "k bigint, price double"),
        "k",
        {"price": "c.price"},
    )
    assert stats["rows_updated"] == 1
    assert stats["rows_inserted"] == 0
    got = {(r["k"], r["price"]) for r in read_versioned(spark, path).collect()}
    assert got == {(None, 1.0), (7, 77.0)}
    feed = read_changes(spark, path, 0, include_deletes=True)
    assert feed.where("_change_type = 'insert'").count() == 0


def test_stream_merge_gate_has_its_own_knob(spark, base_table, tmp_path):
    """ADVICE r8 (low): ignoreUpdates must NOT silently drop a merge
    version (merges also insert); skipMergeCommits opts in by name."""
    from ssidentity_spark.sources.managed_source import register

    register(spark)
    merge_into(
        spark,
        base_table,
        _changes(spark),
        "k",
        {"price": "c.price"},
        delete_when="c.op = 'D'",
    )

    def run(opts, ck, out):
        r = spark.readStream.format("managed_table")
        for kk, vv in opts.items():
            r = r.option(kk, vv)
        q = (
            r.load(base_table).writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    # an option named for updates does not cover merges — loud failure
    # that names the dedicated knob and the insert-loss consequence
    with pytest.raises(Exception, match="skipMergeCommits"):
        run({"ignoreUpdates": "true"}, str(tmp_path / "c1"), str(tmp_path / "o1"))
    run({"skipMergeCommits": "true"}, str(tmp_path / "c2"), str(tmp_path / "o2"))
    got = spark.read.parquet(str(tmp_path / "o2"))
    assert got.count() == 1000  # the v0 snapshot only; merge emitted nothing


def test_vacuum_managed_keeps_fresh_empty_dirs(spark, tmp_path):
    """ADVICE r7: a concurrent writer's just-created empty attempt dir
    must survive the rmdir pass; an AGED empty dir is swept."""
    from ssidentity_spark.operators.managed import vacuum_managed, write_managed

    path = str(tmp_path / "vm")
    write_managed(
        spark, spark.range(50).selectExpr("id % 5 AS k", "id AS v"), path, "k"
    )
    fresh = os.path.join(path, "data", "attempt-fresh")
    aged = os.path.join(path, "data", "attempt-aged")
    os.makedirs(fresh)
    os.makedirs(aged)
    old = 1_000_000_000.0
    os.utime(aged, (old, old))
    vacuum_managed(path, keep_latest=1, min_orphan_age_s=3600)
    assert os.path.isdir(fresh)
    assert not os.path.exists(aged)


def test_merge_works_when_key_is_named_count(spark, tmp_path):
    """r9 review: the duplicate-key gate must not collide with a change
    key literally named 'count' (groupBy().count() would emit an
    ambiguous second 'count' column)."""
    path = str(tmp_path / "cnt")
    write_versioned(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "count bigint, price double"),
        path,
        "append",
    )
    stats = merge_into(
        spark,
        path,
        spark.createDataFrame([(1, 11.0)], "count bigint, price double"),
        "count",
        {"price": "c.price"},
    )
    assert stats["rows_updated"] == 1
    got = {(r["count"], r["price"]) for r in read_versioned(spark, path).collect()}
    assert got == {(1, 11.0), (2, 20.0)}
    # and the gate itself still fires on real duplicates
    with pytest.raises(ValueError, match="at most one source row"):
        merge_into(
            spark,
            path,
            spark.createDataFrame(
                [(1, 1.0), (1, 2.0)], "count bigint, price double"
            ),
            "count",
            {"price": "c.price"},
        )
