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
