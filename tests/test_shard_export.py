"""Sharded corpus export (operators/export.py): dense deterministic
assignment, fixed shard sizes, one file per shard, physical row order."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.operators.export import export_shards


def _corpus(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("sk")
    )


def test_shard_sizes_and_density(spark, tmp_path):
    out = str(tmp_path / "shards")
    n_shards = export_shards(
        _corpus(spark, 100), out, 16, ["sk", "k"],
        bucket=F.substring("sk", 1, 1),
    )
    assert n_shards == 7  # 6 full shards of 16 + one of 4
    back = spark.read.parquet(out)
    sizes = {
        r["shard_id"]: r["n"]
        for r in back.groupBy("shard_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert {int(s) for s in sizes} == set(range(7))
    assert sorted(sizes.values(), reverse=True) == [16] * 6 + [4]
    # positions dense within each shard
    pos_ok = back.groupBy("shard_id").agg(
        (F.count(F.lit(1)) == F.max("pos_in_shard") + 1).alias("ok")
    )
    assert all(r["ok"] for r in pos_ok.collect())


def test_one_file_per_shard_in_logical_order(spark, tmp_path):
    out = str(tmp_path / "shards")
    export_shards(
        _corpus(spark, 64), out, 16, ["sk", "k"],
        bucket=F.substring("sk", 1, 1),
    )
    for d in os.listdir(out):
        if not d.startswith("shard_id="):
            continue
        parts = [
            n for n in os.listdir(os.path.join(out, d))
            if n.endswith(".parquet")
        ]
        assert len(parts) == 1, f"{d} has {len(parts)} files"
    back = spark.read.parquet(out).select(
        "pos_in_shard", F.col("_metadata.row_index").alias("ri")
    )
    assert back.where("pos_in_shard <> ri").count() == 0


def test_export_is_deterministic_across_runs(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    df = _corpus(spark, 80)
    export_shards(df, a, 10, ["sk", "k"], bucket=F.substring("sk", 1, 1))
    export_shards(df, b, 10, ["sk", "k"], bucket=F.substring("sk", 1, 1))
    ra = sorted(
        (r["k"], r["shard_id"], r["pos_in_shard"])
        for r in spark.read.parquet(a).collect()
    )
    rb = sorted(
        (r["k"], r["shard_id"], r["pos_in_shard"])
        for r in spark.read.parquet(b).collect()
    )
    assert ra == rb


def test_roundtrip_loses_nothing(spark, tmp_path):
    out = str(tmp_path / "shards")
    df = _corpus(spark, 37)
    export_shards(df, out, 8, ["sk", "k"])  # range-partition path
    back = spark.read.parquet(out)
    assert back.count() == 37
    assert sorted(r["k"] for r in back.collect()) == list(range(37))


def test_validation(spark, tmp_path):
    df = _corpus(spark, 10)
    with pytest.raises(ValueError, match="rows_per_shard"):
        export_shards(df, str(tmp_path / "x"), 0, ["sk", "k"])
    with pytest.raises(ValueError, match="clobber"):
        export_shards(
            df.withColumn("shard_id", F.lit(1)),
            str(tmp_path / "y"),
            4,
            ["sk", "k"],
        )
