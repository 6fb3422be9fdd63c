"""File-level Bloom index (operators/fileindex.py): lookup ≡ full scan,
Python/JVM hash parity, and the layout lesson — clustering is what makes
the index selective."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.operators.fileindex import (
    _py_positions,
    build_bloom_index,
    point_lookup,
    point_lookup_files,
)


@pytest.fixture(scope="module")
def table(spark):
    return (
        spark.range(0, 40_000)
        .select(
            (F.col("id") % 500).alias("key"),
            (F.col("id") * 7 % 1000).alias("v"),
        )
        .cache()
    )


def _write(df, path, clustered):
    if clustered:
        df.repartitionByRange(16, "key").write.parquet(path)
    else:
        df.repartition(16).write.parquet(path)


def test_python_jvm_hash_parity(spark):
    from ssidentity_spark.operators.bloom import bloom_positions

    vals = spark.createDataFrame([(17,), (9999,), (-3,)], "x long")
    jvm = vals.select(
        F.array(*bloom_positions(F.col("x"), 1 << 13, 4)).alias("p"), "x"
    ).collect()
    for r in jvm:
        assert list(r["p"]) == _py_positions(r["x"], 1 << 13, 4)


@pytest.mark.parametrize("clustered", [False, True])
def test_lookup_equals_full_scan(spark, tmp_path, table, clustered):
    path = str(tmp_path / f"t_{clustered}")
    _write(table, path, clustered)
    build_bloom_index(spark, path, "key")
    for key in (0, 123, 499):
        got, n_read, n_total = point_lookup(spark, path, "key", key)
        want = table.where(F.col("key") == key)
        assert got.count() == want.count() == 80
        assert got.agg(F.sum("v")).collect() == want.agg(F.sum("v")).collect()
        assert 1 <= n_read <= n_total == 16


def test_absent_key_reads_nothing_or_fp_only(spark, tmp_path, table):
    path = str(tmp_path / "t_absent")
    _write(table, path, True)
    build_bloom_index(spark, path, "key")
    got, n_read, _ = point_lookup(spark, path, "key", 777_777)
    assert got.count() == 0
    assert n_read <= 2  # at most bloom false positives


def test_clustering_is_what_makes_the_index_selective(spark, tmp_path, table):
    """The measured lesson: random layout → every file holds every key →
    nothing skips; range-clustered layout → ~1 file per key."""
    p_rand = str(tmp_path / "rand")
    p_clust = str(tmp_path / "clust")
    _write(table, p_rand, False)
    _write(table, p_clust, True)
    build_bloom_index(spark, p_rand, "key")
    build_bloom_index(spark, p_clust, "key")
    n_rand = len(point_lookup_files(p_rand, 123))
    n_clust = len(point_lookup_files(p_clust, 123))
    assert n_rand >= 14  # random: essentially no skipping
    assert n_clust <= 2  # clustered: all but ~one file skipped


# --- managed tables (operators/managed.py) --------------------------------


def test_managed_write_lookup_and_time_travel(spark, tmp_path):
    """The composition contract: clustered + versioned + indexed writes;
    point lookups touch ~1 file and equal a full-snapshot filter; old
    versions stay queryable with their own index."""
    from ssidentity_spark.operators.managed import (
        managed_point_lookup,
        write_managed,
    )
    from ssidentity_spark.operators.tablelog import read_versioned

    path = str(tmp_path / "obs")
    # observation-shaped: mac-keyed event rows
    def obs(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 200).alias("mac_key"),
            (F.col("id")).alias("seq"),
            (F.col("id") % 7).cast("double").alias("rssi"),
        )

    v0 = write_managed(spark, obs(0, 20_000), path, "mac_key")
    v1 = write_managed(spark, obs(20_000, 50_000), path, "mac_key")
    assert (v0, v1) == (0, 1)

    for mac in (0, 123, 199):
        got, n_read, n_total = managed_point_lookup(spark, path, mac)
        want = read_versioned(spark, path).where(F.col("mac_key") == mac)
        assert got.count() == want.count() > 0
        assert (
            got.agg(F.sum("seq")).collect() == want.agg(F.sum("seq")).collect()
        )
        # clustered layout: the lookup touches a small fraction of files
        assert n_read <= 4 and n_total >= 16

    # time travel: v0's index answers against v0's snapshot only
    got0, n_read0, n_total0 = managed_point_lookup(spark, path, 123, version=0)
    want0 = read_versioned(spark, path, 0).where(F.col("mac_key") == 123)
    assert got0.count() == want0.count() == 100
    assert n_total0 == 16 and n_read0 <= 2


def test_vacuum_managed_cleans_sidecars_and_orphans(spark, tmp_path):
    import os

    from ssidentity_spark.operators.managed import (
        managed_point_lookup,
        vacuum_managed,
        write_managed,
    )

    path = str(tmp_path / "vm")
    df = spark.range(0, 5_000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v")
    )
    write_managed(spark, df, path, "k")
    write_managed(spark, df.select("k", (F.col("v") + 10_000).alias("v")), path, "k")
    write_managed(spark, df.limit(100), path, "k", mode="overwrite")
    # a crashed writer's orphan bytes
    orphan = os.path.join(path, "data", "stream", "dead.parquet")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    with open(orphan, "wb") as f:
        f.write(b"junk")

    # a freshly staged file survives the default retention guard
    assert vacuum_managed(path, keep_latest=3)["orphans"] == []
    out = vacuum_managed(path, keep_latest=2, min_orphan_age_s=0)
    # v1 is an APPEND carrying v0's files forward, so retained manifests
    # still reference them — correctly NOT deleted; only the dropped
    # version's sidecar and the crashed writer's orphan go
    assert out["data"] == []
    assert "bloom-v00000000.json" in out["sidecars"]
    assert any("dead.parquet" in o for o in out["orphans"])
    # retained versions still answer point lookups with their own index
    got, n_read, _ = managed_point_lookup(spark, path, 7, version=1)
    assert got.count() == 200 and n_read >= 1
    got2, _, _ = managed_point_lookup(spark, path, 7)  # tip (overwrite)
    assert got2.count() == 2  # ids 7, 57 in limit(100)... verify below
    # exact check: tip has ids 0..99 -> k==7 for ids 7, 57
    assert {r["v"] for r in got2.collect()} == {7, 57}


# --- min/max range index (r7) ---------------------------------------------


def test_range_index_clustered_skips_unsorted_does_not(spark, tmp_path):
    from pyspark.sql import functions as F

    from ssidentity_spark.operators.fileindex import (
        build_minmax_index,
        range_lookup,
    )

    df = spark.range(0, 40_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    clustered = str(tmp_path / "clustered")
    df.repartitionByRange(16, "k").write.parquet(clustered)
    build_minmax_index(spark, clustered, "k")
    rows, read, total = range_lookup(spark, clustered, 100, 160)
    assert rows.count() == 61 * 40  # inclusive band, 40 rows per key
    assert read <= 3 < total == 16  # each file owns ~1/16 of the domain

    rand = str(tmp_path / "rand")
    df.repartition(16).write.parquet(rand)
    build_minmax_index(spark, rand, "k")
    rows2, read2, total2 = range_lookup(spark, rand, 100, 160)
    assert rows2.count() == 61 * 40  # identical answer either way
    assert read2 == total2 == 16  # random layout: nothing skips


def test_range_survivors_boundaries_and_nulls():
    from ssidentity_spark.operators.fileindex import range_survivors

    idx = {
        "files": {
            "a": [0, 9],
            "b": [10, 19],
            "c": [20, 29],
            "d": [None, None],  # all-null stats: must be KEPT
        }
    }
    assert range_survivors(idx, 10, 19) == ["b", "d"]
    assert range_survivors(idx, 9, 10) == ["a", "b", "d"]  # inclusive edges
    assert range_survivors(idx, None, 5) == ["a", "d"]
    assert range_survivors(idx, 25, None) == ["c", "d"]
    assert range_survivors(idx, 100, 200) == ["d"]
    assert range_survivors(idx, 10, 19, restrict={"b"}) == ["b"]


def test_range_index_rejects_float_key(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from ssidentity_spark.operators.fileindex import build_minmax_index

    p = str(tmp_path / "f")
    spark.range(0, 10).select(F.col("id").cast("double").alias("k")).write.parquet(p)
    with pytest.raises(TypeError, match="minmax index key"):
        build_minmax_index(spark, p, "k")


def test_range_lookup_open_bounds(spark, tmp_path):
    """r7 review: a None bound means UNBOUNDED — between(lit(None), x)
    is SQL null and used to silently return zero rows."""
    from pyspark.sql import functions as F

    from ssidentity_spark.operators.fileindex import (
        build_minmax_index,
        range_lookup,
    )

    p = str(tmp_path / "open")
    spark.range(0, 1_000).select((F.col("id") % 100).alias("k")).repartitionByRange(
        8, "k"
    ).write.parquet(p)
    build_minmax_index(spark, p, "k")
    rows, read, total = range_lookup(spark, p, None, 19)
    assert rows.count() == 20 * 10  # k in [0, 19]
    assert read < total
    rows2, _r, _t = range_lookup(spark, p, 80, None)
    assert rows2.count() == 20 * 10  # k in [80, 99]
    rows3, read3, total3 = range_lookup(spark, p, None, None)
    assert rows3.count() == 1_000 and read3 == total3


def test_delete_managed_keeps_lookup_exact_and_index_incremental(spark, tmp_path):
    """Row-level DELETE on the managed table: the post-delete tip answers
    point lookups exactly (deleted keys gone, survivors intact), the new
    sidecar carries bitmaps for every tip file, and kept files' bitmaps
    are byte-identical to the parent's (incremental rebuild, O(rewritten
    files) index I/O)."""
    import json
    import os

    from ssidentity_spark.operators.managed import (
        _index_path,
        delete_managed,
        managed_point_lookup,
        write_managed,
    )
    from ssidentity_spark.operators.tablelog import _read_manifest, read_versioned

    path = str(tmp_path / "obs")
    df = spark.range(0, 20_000).select(
        (F.col("id") % 200).alias("mac_key"),
        F.col("id").alias("seq"),
    )
    write_managed(spark, df, path, "mac_key")
    with open(_index_path(path, 0)) as f:
        idx0 = json.load(f)

    # delete one clustered key entirely — range clustering means few files hit
    stats = delete_managed(spark, path, "mac_key = 123")
    assert stats["version"] == 1 and stats["rows_deleted"] == 100
    assert stats["files_rewritten"] <= 3 < stats["files_kept"]

    # lookups: the deleted key reads nothing, a surviving key is exact
    got, _, _ = managed_point_lookup(spark, path, 123)
    assert got.count() == 0
    got, n_read, n_total = managed_point_lookup(spark, path, 42)
    assert got.count() == 100 and n_read <= 4
    # time travel: the pre-delete version still answers for the deleted key
    got0, _, _ = managed_point_lookup(spark, path, 123, version=0)
    assert got0.count() == 100

    # sidecar invariants: every tip file indexed; kept files' bitmaps carried
    with open(_index_path(path, 1)) as f:
        idx1 = json.load(f)
    tip_files = _read_manifest(path, 1)["files"]
    assert set(idx1["files"]) == set(tip_files)
    kept = set(tip_files) & set(_read_manifest(path, 0)["files"])
    assert kept and all(idx1["files"][f] == idx0["files"][f] for f in kept)
    assert read_versioned(spark, path).count() == 19_900

    # no-op delete: no version, no sidecar churn
    stats2 = delete_managed(spark, path, "mac_key = 99999")
    assert stats2["rows_deleted"] == 0 and stats2["version"] == 1
    assert not os.path.exists(_index_path(path, 2))


def test_update_managed_reindexes_incrementally(spark, tmp_path):
    import json

    from ssidentity_spark.operators.managed import (
        _index_path,
        managed_point_lookup,
        update_managed,
        write_managed,
    )

    path = str(tmp_path / "obs")
    df = spark.range(0, 10_000).select(
        (F.col("id") % 100).alias("mac_key"), F.col("id").alias("seq")
    )
    write_managed(spark, df, path, "mac_key")
    with open(_index_path(path, 0)) as f:
        idx0 = json.load(f)
    stats = update_managed(spark, path, "mac_key = 7", {"seq": "seq + 1000000"})
    assert stats["rows_updated"] == 100 and stats["version"] == 1
    got, n_read, _ = managed_point_lookup(spark, path, 7)
    assert got.count() == 100 and n_read <= 4
    assert got.agg(F.min("seq")).collect()[0][0] >= 1_000_000
    with open(_index_path(path, 1)) as f:
        idx1 = json.load(f)
    from ssidentity_spark.operators.tablelog import _read_manifest

    kept = set(_read_manifest(path, 1)["files"]) & set(
        _read_manifest(path, 0)["files"]
    )
    assert kept and all(idx1["files"][r] == idx0["files"][r] for r in kept)
