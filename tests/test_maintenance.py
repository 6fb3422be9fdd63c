"""Upsert / roster-merge / compaction operator tests."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from ssidentity_spark.operators.maintenance import (
    compact_partition,
    latest_per_key,
    mac_roster_upsert,
    upsert_by_key,
    upsert_parquet,
)


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [("A", 1, "old"), ("B", 2, "old"), ("C", 3, "old")], "k STRING, v INT, src STRING"
    )


def test_upsert_by_key(spark, target):
    updates = spark.createDataFrame(
        [("B", 20, "new"), ("D", 40, "new")], "k STRING, v INT, src STRING"
    )
    got = {r.k: (r.v, r.src) for r in upsert_by_key(target, updates, ["k"]).collect()}
    assert got == {"A": (1, "old"), "B": (20, "new"), "C": (3, "old"), "D": (40, "new")}


def test_latest_per_key(spark):
    df = spark.createDataFrame(
        [("A", 1, 10), ("A", 2, 20), ("B", 1, 30)], "k STRING, ver INT, v INT"
    )
    got = {r.k: r.v for r in latest_per_key(df, ["k"], "ver").collect()}
    assert got == {"A": 20, "B": 30}


def test_upsert_parquet_swap(spark, target, tmp_path):
    path = str(tmp_path / "tbl")
    target.write.parquet(path)
    updates = spark.createDataFrame([("A", 100, "new")], "k STRING, v INT, src STRING")
    upsert_parquet(spark, path, updates, ["k"])
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {"A": 100, "B": 2, "C": 3}


def test_mac_roster_upsert(spark, observations):
    half1 = observations.filter(F.dayofmonth("ts") <= 20)
    half2 = observations.filter(F.dayofmonth("ts") > 20)
    empty = spark.createDataFrame(
        [],
        "mac STRING, first_seen TIMESTAMP, last_seen TIMESTAMP, ts_csv STRING, n_probes LONG",
    )
    roster = mac_roster_upsert(mac_roster_upsert(empty, half1), half2)
    direct = observations.groupBy("mac").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.count(F.lit(1)).alias("n_probes"),
    )
    got = {r.mac: (r.first_seen, r.last_seen, r.n_probes) for r in roster.collect()}
    want = {r.mac: (r.first_seen, r.last_seen, r.n_probes) for r in direct.collect()}
    assert got == want
    # the CSV field holds the union of distinct rendered timestamps
    csvs = {r.mac: r.ts_csv for r in roster.collect()}
    sample = next(iter(csvs.values()))
    assert sample == ",".join(sorted(sample.split(",")))


def test_compact_partition(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(10_000).repartition(37).write.parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    n_files = compact_partition(spark, path, target_rows_per_file=5_000)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert before == 37 and n_files == 2 and after == 2
    assert spark.read.parquet(path).count() == 10_000


def _partition_files(path: str, part: str) -> dict[str, bytes]:
    import os

    out = {}
    for f in glob.glob(f"{path}/{part}/*.parquet"):
        with open(f, "rb") as fh:
            out[os.path.basename(f)] = fh.read()
    return out


def test_partitioned_upsert_touches_only_affected_partitions(spark, tmp_path):
    """The 100 TB contract: a MERGE batch must cost O(touched partitions),
    leaving every other partition's files byte-identical on disk."""
    from ssidentity_spark.operators.maintenance import upsert_parquet_partitioned

    path = str(tmp_path / "fact")
    rows = [
        (k, d, v)
        for d, base in [("2024-01-01", 0), ("2024-01-02", 100), ("2024-01-03", 200)]
        for k, v in [(f"{d}#{i}", base + i) for i in range(5)]
    ]
    spark.createDataFrame(rows, "k STRING, d STRING, v INT").write.partitionBy(
        "d"
    ).parquet(path)

    before = {
        p: _partition_files(path, f"d={p}") for p in ["2024-01-01", "2024-01-03"]
    }
    updates = spark.createDataFrame(
        [("2024-01-02#1", "2024-01-02", 9999), ("2024-01-02#new", "2024-01-02", 7)],
        "k STRING, d STRING, v INT",
    )
    touched = upsert_parquet_partitioned(spark, path, updates, ["k"], "d")
    assert touched == ["2024-01-02"]

    for p, files in before.items():
        assert _partition_files(path, f"d={p}") == files, f"partition {p} rewritten"
    got = {r.k: r.v for r in spark.read.parquet(path).filter("d = '2024-01-02'").collect()}
    assert got["2024-01-02#1"] == 9999 and got["2024-01-02#new"] == 7
    assert len(got) == 6  # 5 originals (1 replaced) + 1 appended
    assert spark.read.parquet(path).count() == 16


def test_swap_survives_leftover_backup(spark, target, tmp_path):
    """A crash between backup-rename and stage-move leaves a ._backup dir;
    the next upsert must clear it and still swap correctly."""
    import os

    path = str(tmp_path / "tbl")
    target.write.parquet(path)
    os.makedirs(path + "._backup")  # simulated interrupted-swap residue
    updates = spark.createDataFrame([("C", 33, "new")], "k STRING, v INT, src STRING")
    upsert_parquet(spark, path, updates, ["k"])
    assert not os.path.isdir(path + "._backup")
    assert not os.path.isdir(path + "._stage")
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {"A": 1, "B": 2, "C": 33}


def test_optimize_managed_preserves_layout_and_index(spark, tmp_path):
    """r7: OPTIMIZE on a managed table must keep the cluster layout
    through the rewrite and rebuild the bloom sidecar for the compacted
    version — otherwise point lookups silently degrade to full scans."""
    from pyspark.sql import functions as F

    from ssidentity_spark.operators.managed import (
        managed_point_lookup,
        optimize_managed,
        write_managed,
    )
    from ssidentity_spark.operators.tablelog import read_versioned

    path = str(tmp_path / "om")
    df = spark.range(0, 20_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("seq")
    )
    # two appends -> 32 small clustered parts
    write_managed(spark, df, path, "k", n_files=16)
    write_managed(
        spark, df.select("k", (F.col("seq") + 100_000).alias("seq")),
        path, "k", n_files=16,
    )
    before, total_before = managed_point_lookup(spark, path, 42)[1:]
    stats = optimize_managed(spark, path, target_rows_per_file=10_000)
    assert stats["files_after"] < stats["files_before"] == total_before
    assert stats["indexed_files"] == stats["files_after"]
    # content identical through the rewrite
    assert read_versioned(spark, path).count() == 40_000
    rows, read, total = managed_point_lookup(spark, path, 42)
    assert rows.count() == 80  # 2 appends x (20,000 / 500 keys) rows of k=42
    # the index still prunes: range clustering keeps each key in few files
    assert read < total == stats["files_after"]
    assert read <= max(1, before)  # pruning no worse than pre-compaction


def test_optimize_managed_requires_sidecar(spark, tmp_path):
    from ssidentity_spark.operators.managed import optimize_managed
    from ssidentity_spark.operators.tablelog import write_versioned

    path = str(tmp_path / "nosc")
    write_versioned(
        spark.range(0, 10).select(F.col("id").alias("k")), path, "append"
    )
    with pytest.raises(FileNotFoundError, match="not a managed table"):
        optimize_managed(spark, path)


def test_upsert_by_key_rejects_duplicate_update_keys(spark, target):
    """MERGE contract: a batch holding the same key twice must raise, not
    silently append both rows into a key-unique table."""
    updates = spark.createDataFrame(
        [("A", 1, "new"), ("A", 2, "new")], "k STRING, v INT, src STRING"
    )
    with pytest.raises(ValueError, match="more than once"):
        upsert_by_key(target, updates, ["k"])


def test_latest_per_key_deterministic_on_order_ties(spark):
    """Equal order_col values must yield the same survivor every run."""
    rows = [("A", 2, 20), ("A", 2, 21), ("B", 1, 5)]
    df = spark.createDataFrame(rows, "k STRING, ver INT, v INT")
    got = {
        frozenset(
            (r.k, r.v) for r in latest_per_key(df.repartition(n), ["k"], "ver").collect()
        )
        for n in (1, 3, 7)
    }
    assert got == {frozenset({("A", 21), ("B", 5)})}


def test_partitioned_upsert_preserves_null_partition(spark, tmp_path):
    """A batch touching the NULL partition must not delete the other rows
    living there (isin([None]) is NULL for every row)."""
    from ssidentity_spark.operators.maintenance import upsert_parquet_partitioned

    path = str(tmp_path / "tbl")
    spark.createDataFrame(
        [("k1", None, 1), ("k2", None, 2), ("k3", "2024-01-01", 3)],
        "k STRING, d STRING, v INT",
    ).write.partitionBy("d").parquet(path)
    updates = spark.createDataFrame([("k1", None, 99)], "k STRING, d STRING, v INT")
    upsert_parquet_partitioned(spark, path, updates, ["k"], "d")
    got = {r.k: r.v for r in spark.read.parquet(path).collect()}
    assert got == {"k1": 99, "k2": 2, "k3": 3}


def test_roster_merge_drops_phantom_empty_csv_entry(spark):
    """A prior batch whose ts_str values were all NULL yields ts_csv='';
    later merges must not keep a phantom '' token (leading comma)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    empty = spark.createDataFrame(
        [],
        "mac STRING, first_seen TIMESTAMP, last_seen TIMESTAMP, ts_csv STRING, n_probes LONG",
    )
    b1 = spark.createDataFrame(
        [("AA", t0, None)], "mac STRING, ts TIMESTAMP, ts_str STRING"
    )
    b2 = spark.createDataFrame(
        [("AA", t0, "01/01/24 - 12:01AM")], "mac STRING, ts TIMESTAMP, ts_str STRING"
    )
    roster = mac_roster_upsert(mac_roster_upsert(empty, b1), b2)
    row = roster.collect()[0]
    assert row.ts_csv == "01/01/24 - 12:01AM"


def test_optimize_similarity_layout_read_identical_and_smaller(spark, tmp_path):
    """r9: OPTIMIZE CLUSTER BY SimHash — read-identical compaction whose
    layout packs near-dups adjacently; on a corpus with planted
    near-copies the clustered rewrite must be strictly smaller on disk
    than the same rows compacted in shuffled order."""
    import os

    from pyspark.sql import functions as F

    from ssidentity_spark.operators.tablelog import (
        _read_manifest,
        latest_version,
        optimize,
        optimize_similarity_layout,
        read_versioned,
        write_versioned,
    )

    def table_bytes(path):
        m = _read_manifest(path, latest_version(path))
        return sum(
            os.path.getsize(os.path.join(path, f)) for f in m["files"]
        )

    base = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("lorem ipsum shared boilerplate sentence repeated "),
            (F.pmod(F.col("id"), F.lit(40))).cast("string"),
            F.lit(" tail "),
            F.md5(F.col("id").cast("string")),
        ).alias("text"),
    )
    # shuffled order: the post-dedup-pipeline reality
    shuffled = base.orderBy(F.md5(F.col("doc_id").cast("string")))

    p_plain = str(tmp_path / "plain")
    write_versioned(shuffled.repartition(4), p_plain, "append")
    optimize(spark, p_plain)
    p_sim = str(tmp_path / "sim")
    write_versioned(shuffled.repartition(4), p_sim, "append")
    stats = optimize_similarity_layout(spark, p_sim)

    # read-identical
    a = {tuple(r) for r in read_versioned(spark, p_plain).collect()}
    b = {tuple(r) for r in read_versioned(spark, p_sim).collect()}
    assert a == b and len(a) == 400
    assert stats["rows"] == 400
    # the clustered layout compresses strictly better
    assert table_bytes(p_sim) < table_bytes(p_plain)
