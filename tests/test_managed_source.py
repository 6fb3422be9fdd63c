"""The managed_table Python data source (sources/managed_source.py):
schema inference, version pinning, result parity with the direct reader,
filter-pushdown file pruning, and snapshot isolation through the format."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.operators.managed import write_managed
from ssidentity_spark.operators.tablelog import read_versioned
from ssidentity_spark.sources.managed_source import (
    ManagedTableReader,
    register,
)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ds") / "t")
    df = spark.range(0, 20_000).select(
        (F.col("id") % 200).alias("mac_key"),
        F.col("id").alias("seq"),
        (F.col("id") % 7).cast("double").alias("rssi"),
    )
    write_managed(spark, df, path, "mac_key")
    write_managed(
        spark,
        df.select("mac_key", (F.col("seq") + 100_000).alias("seq"), "rssi"),
        path,
        "mac_key",
    )
    register(spark)
    return path


def test_schema_inferred_from_snapshot(spark, table):
    r = spark.read.format("managed_table").load(table)
    assert r.schema.simpleString() == (
        "struct<mac_key:bigint,seq:bigint,rssi:double>"
    )


def test_reads_match_direct_reader(spark, table):
    via_format = spark.read.format("managed_table").load(table)
    direct = read_versioned(spark, table)
    assert via_format.count() == direct.count() == 40_000
    assert (
        via_format.agg(F.sum("seq")).collect()
        == direct.agg(F.sum("seq")).collect()
    )


def test_version_option_pins_snapshot(spark, table):
    v0 = spark.read.format("managed_table").option("version", 0).load(table)
    assert v0.count() == 20_000
    assert v0.agg(F.max("seq")).collect()[0][0] == 19_999  # pre-append values


def test_filtered_read_is_exact(spark, table):
    r = spark.read.format("managed_table").load(table)
    got = r.where(F.col("mac_key") == 123)
    want = read_versioned(spark, table).where(F.col("mac_key") == 123)
    assert got.count() == want.count() == 200
    assert got.agg(F.sum("seq")).collect() == want.agg(F.sum("seq")).collect()
    # bloom fp safety: a key outside the domain returns nothing
    assert r.where(F.col("mac_key") == 987_654).count() == 0


def test_pushdown_prunes_partitions(spark, table):
    r = spark.read.format("managed_table").load(table)
    reader = ManagedTableReader(table, 1, r.schema)
    n_all = len(reader.partitions())
    reader.pruned_value = 123
    n_pruned = len(reader.partitions())
    assert n_pruned <= 4 < n_all == 32


def test_range_pushdown_prunes_partitions(spark, table):
    """r8 (VERDICT r7 ask #2): range predicates on the indexed key reach
    the min/max sidecar — a BETWEEN scan through the format plans
    partitions only for stat-surviving files, and every filter is
    returned to Spark for exact re-application."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    r = spark.read.format("managed_table").load(table)
    reader = ManagedTableReader(table, 1, r.schema)
    n_all = len(reader.partitions())
    returned = list(
        reader.pushFilters(
            [
                GreaterThanOrEqual(("mac_key",), 40),
                LessThanOrEqual(("mac_key",), 60),
            ]
        )
    )
    assert len(returned) == 2  # partially-pushed contract: all come back
    assert reader.range_lo == 40 and reader.range_hi == 60
    n_pruned = len(reader.partitions())
    assert n_pruned <= 6 < n_all == 32


def test_range_pushdown_strict_bounds_stay_exact(spark, table):
    """Strict > / < are widened to inclusive pruning bounds (a file whose
    max equals the bound survives as a false positive), and the engine's
    re-applied filter keeps the RESULT exact."""
    r = spark.read.format("managed_table").load(table)
    direct = read_versioned(spark, table)
    for pred in [
        (F.col("mac_key") > 40) & (F.col("mac_key") < 60),
        (F.col("mac_key") >= 197),
        (F.col("mac_key") < 3),
        (F.col("mac_key") > 40) & (F.col("mac_key") <= 41),
    ]:
        got = r.where(pred)
        want = direct.where(pred)
        assert got.count() == want.count()
        assert (
            got.agg(F.sum("seq")).collect() == want.agg(F.sum("seq")).collect()
        )
    # out-of-domain band prunes to the empty marker partition
    assert r.where((F.col("mac_key") >= 900) & (F.col("mac_key") <= 950)).count() == 0


def test_corrupt_minmax_sidecar_degrades_to_unpruned(spark, tmp_path):
    from ssidentity_spark.operators.managed import _minmax_path, write_managed

    register(spark)
    path = str(tmp_path / "mm")
    df = spark.range(1_000).selectExpr("id % 50 AS mac_key", "id AS seq")
    write_managed(spark, df, path, "mac_key")
    with open(_minmax_path(path, 0), "w") as f:
        f.write('{"key": "mac_')
    got = spark.read.format("managed_table").load(path)
    assert got.where(F.col("mac_key").between(10, 20)).count() == 220


def test_minmax_sidecar_maintained_across_dml_and_optimize(spark, tmp_path):
    """The minmax sidecar follows every write path that maintains the
    bloom sidecar: append (incremental), delete/update (O(rewritten
    files)), optimize (rebuild)."""
    import json as _json

    from ssidentity_spark.operators.managed import (
        _minmax_path,
        delete_managed,
        optimize_managed,
        write_managed,
    )

    path = str(tmp_path / "dmlmm")
    df = spark.range(2_000).selectExpr("id % 100 AS mac_key", "id AS seq")
    write_managed(spark, df, path, "mac_key", n_files=8)
    write_managed(
        spark,
        spark.range(2_000, 3_000).selectExpr("id % 100 AS mac_key", "id AS seq"),
        path,
        "mac_key",
        n_files=8,
    )
    stats = delete_managed(spark, path, "mac_key = 7")
    v = stats["version"]
    assert os.path.exists(_minmax_path(path, v))
    stats2 = optimize_managed(spark, path, target_rows_per_file=10_000)
    v2 = stats2["version"]
    with open(_minmax_path(path, v2)) as f:
        idx = _json.load(f)
    assert idx["key"] == "mac_key"
    from ssidentity_spark.operators.tablelog import _read_manifest

    assert set(idx["files"]) == set(_read_manifest(path, v2)["files"])
    # scans through the format stay exact across the whole chain
    register(spark)
    t = spark.read.format("managed_table").load(path)
    want = read_versioned(spark, path).where(F.col("mac_key").between(30, 40))
    got = t.where(F.col("mac_key").between(30, 40))
    assert got.count() == want.count()
    assert got.agg(F.sum("seq")).collect() == want.agg(F.sum("seq")).collect()


def test_version_pin_is_isolation_boundary(spark, table):
    """An explicit version option is the stability contract: it reads the
    same snapshot before and after later commits. (An unpinned read
    resolves the tip per action — directory semantics, documented.)"""
    pinned = spark.read.format("managed_table").option("version", 1).load(table)
    assert pinned.count() == 40_000
    write_managed(
        spark,
        spark.range(0, 10).select(
            (F.col("id")).alias("mac_key"),
            F.col("id").alias("seq"),
            F.lit(0.0).alias("rssi"),
        ),
        table,
        "mac_key",
    )
    assert pinned.count() == 40_000  # same snapshot after the commit
    assert spark.read.format("managed_table").load(table).count() == 40_010


def test_stream_writer_lands_atomic_versions(spark, tmp_path):
    """df.writeStream.format('managed_table'): each micro-batch = one
    atomic append version with its batch_id in the manifest; reads
    through the format see the committed prefix; a replayed batch
    (commit called again with a committed id) no-ops and cleans its
    stage."""
    import os

    from ssidentity_spark.operators.tablelog import (
        committed_batch_ids,
        history,
    )
    from ssidentity_spark.sources.managed_source import (
        ManagedTableStreamWriter,
        _StagedFiles,
    )

    src = str(tmp_path / "wsrc")
    path = str(tmp_path / "wt")
    ck = str(tmp_path / "wck")
    schema = "k long, v double"
    register(spark)

    total = 0
    for lo, hi in [(0, 500), (500, 1200)]:
        spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") % 9).cast("double").alias("v")
        ).coalesce(2).write.mode("append").parquet(src)
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("managed_table")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start(path)
        )
        q.awaitTermination(180)
        total = hi
        got = spark.read.format("managed_table").load(path)
        assert got.count() == total
    assert committed_batch_ids(path)
    n_versions = len(history(path))

    # simulate the crash-replay: commit() again with an already-committed
    # batch id and a freshly staged file — must no-op and remove the stage
    w = ManagedTableStreamWriter(path, spark.read.format("managed_table").load(path).schema)
    stale_rel = os.path.join("data", "stream", "replayed.parquet")
    os.makedirs(os.path.join(path, "data", "stream"), exist_ok=True)
    with open(os.path.join(path, stale_rel), "wb") as f:
        f.write(b"not-a-real-parquet")
    w.commit([_StagedFiles(stale_rel)], min(committed_batch_ids(path)))
    assert len(history(path)) == n_versions
    assert not os.path.exists(os.path.join(path, stale_rel))
    assert spark.read.format("managed_table").load(path).count() == total

    # abort drops staged files
    with open(os.path.join(path, stale_rel), "wb") as f:
        f.write(b"junk")
    w.abort([_StagedFiles(stale_rel)], 999)
    assert not os.path.exists(os.path.join(path, stale_rel))


def test_stream_reader_tails_versions_exactly_once(spark, tmp_path):
    """spark.readStream.format('managed_table'): offsets are version
    numbers, the incremental read is the manifest diff — restarting on
    the same checkpoint after new commits delivers ONLY the new rows."""
    from ssidentity_spark.operators.tablelog import write_versioned

    path = str(tmp_path / "rt")
    out = str(tmp_path / "rout")
    ck = str(tmp_path / "rck")
    register(spark)

    def commit(lo, hi):
        write_versioned(
            spark.range(lo, hi).select(F.col("id").alias("k")), path, "append"
        )

    seen = []
    for lo, hi in [(0, 100), (100, 250), (250, 300)]:
        commit(lo, hi)
        q = (
            spark.readStream.format("managed_table")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.read.parquet(out)
        assert got.count() == hi  # cumulative, no duplicates
        seen.append(hi)
    assert spark.read.parquet(out).agg(F.sum("k")).collect()[0][0] == sum(
        range(300)
    )


def test_stream_reader_rejects_overwrite_history(spark, tmp_path):
    from ssidentity_spark.operators.tablelog import write_versioned

    path = str(tmp_path / "ow")
    out = str(tmp_path / "oout")
    ck = str(tmp_path / "ock")
    register(spark)
    write_versioned(
        spark.range(0, 10).select(F.col("id").alias("k")), path, "append"
    )
    write_versioned(
        spark.range(0, 3).select(F.col("id").alias("k")), path, "overwrite"
    )
    q = (
        spark.readStream.format("managed_table")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="append-only"):
        q.awaitTermination(180)
        raise RuntimeError("query should have failed")  # pragma: no cover


def test_table_to_table_streaming_hop(spark, tmp_path):
    """The medallion pattern end-to-end: readStream from managed table A
    (version-offset tailing) → transform → writeStream into managed
    table B (atomic version per micro-batch) — both ends of the format,
    exactly-once across sequential runs."""
    from ssidentity_spark.operators.tablelog import write_versioned

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ck = str(tmp_path / "hck")
    register(spark)

    for lo, hi in [(0, 200), (200, 500)]:
        write_versioned(
            spark.range(lo, hi).select(
                F.col("id").alias("k"), (F.col("id") * 2).alias("v")
            ),
            bronze,
            "append",
        )
        q = (
            spark.readStream.format("managed_table")
            .load(bronze)
            .where(F.col("k") % 2 == 0)  # the "transform"
            .writeStream.format("managed_table")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start(silver)
        )
        q.awaitTermination(180)

    got = spark.read.format("managed_table").load(silver)
    assert got.count() == 250  # even k in [0, 500)
    assert got.agg(F.sum("v")).collect()[0][0] == sum(
        2 * k for k in range(0, 500, 2)
    )


def test_batch_writer_append_and_overwrite(spark, tmp_path):
    """df.write.format('managed_table'): mode maps to the log's
    append/overwrite commit; every write is one atomic version and old
    versions stay readable."""
    from ssidentity_spark.operators.tablelog import history

    path = str(tmp_path / "bw")
    register(spark)
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    df.write.format("managed_table").mode("append").save(path)
    spark.range(100, 130).select(F.col("id").alias("k")).write.format(
        "managed_table"
    ).mode("append").save(path)
    assert spark.read.format("managed_table").load(path).count() == 130
    spark.range(0, 7).select(F.col("id").alias("k")).write.format(
        "managed_table"
    ).mode("overwrite").save(path)
    assert spark.read.format("managed_table").load(path).count() == 7
    # time travel across the overwrite
    assert (
        spark.read.format("managed_table").option("version", 1).load(path).count()
        == 130
    )
    assert [h["operation"] for h in history(path)] == [
        "append",
        "append",
        "overwrite",
    ]


def test_writer_preserves_declared_types_for_all_null_batch(spark, tmp_path):
    """An all-null column must land with its DECLARED type, not pyarrow's
    inferred null type (which would wedge later schema inference)."""
    path = str(tmp_path / "nulls")
    register(spark)
    spark.createDataFrame(
        [(1, None), (2, None)], "k long, v double"
    ).write.format("managed_table").mode("append").save(path)
    r = spark.read.format("managed_table").load(path)
    assert r.schema.simpleString() == "struct<k:bigint,v:double>"
    assert r.where(F.col("v").isNull()).count() == 2


def test_fresh_stream_on_vacuumed_table_names_the_cause(spark, tmp_path):
    """ADVICE r6: after vacuum() drops early manifests, a fresh readStream
    (offset -1) must fail with an error naming vacuum and the
    startingVersion escape hatch — not a raw FileNotFoundError."""
    from ssidentity_spark.operators.tablelog import vacuum, write_versioned

    path = str(tmp_path / "vt")
    register(spark)
    for lo, hi in [(0, 10), (10, 30), (30, 60)]:
        write_versioned(
            spark.range(lo, hi).select(F.col("id").alias("k")), path, "append"
        )
    vacuum(path, keep_latest=1)  # drops manifests 0 and 1
    q = (
        spark.readStream.format("managed_table")
        .load(path)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "vout"))
        .option("checkpointLocation", str(tmp_path / "vck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="startingVersion"):
        q.awaitTermination(180)
        raise RuntimeError("query should have failed")  # pragma: no cover


def test_starting_version_begins_at_retained_snapshot(spark, tmp_path):
    """.option('startingVersion', N) on a vacuumed table: the first batch
    is snapshot N's FULL retained file list (appends never rewrite files,
    so that list carries every surviving row), then diffs tail as usual."""
    from ssidentity_spark.operators.tablelog import vacuum, write_versioned

    path = str(tmp_path / "svt")
    out = str(tmp_path / "svout")
    ck = str(tmp_path / "svck")
    register(spark)
    for lo, hi in [(0, 10), (10, 30), (30, 60)]:
        write_versioned(
            spark.range(lo, hi).select(F.col("id").alias("k")), path, "append"
        )
    vacuum(path, keep_latest=1)  # oldest retained version is now 2

    def run():
        q = (
            spark.readStream.format("managed_table")
            .option("startingVersion", 2)
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    got = spark.read.parquet(out)
    # appends never delete files, so snapshot 2 still carries all 60 rows
    assert got.count() == 60
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(60))
    # tail after the snapshot: only the new version's rows arrive
    write_versioned(
        spark.range(60, 80).select(F.col("id").alias("k")), path, "append"
    )
    run()
    assert spark.read.parquet(out).count() == 80


def test_empty_overwrite_reads_back_as_empty(spark, tmp_path):
    """ADVICE r6: committing an all-empty overwrite must produce a tip
    that reads back as an EMPTY table with the declared schema — not an
    unreadable files=[] version."""
    path = str(tmp_path / "em")
    register(spark)
    df = spark.range(0, 5).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    df.write.format("managed_table").mode("overwrite").save(path)
    df.filter("k < 0").write.format("managed_table").mode("overwrite").save(path)
    back = spark.read.format("managed_table").load(path)
    assert back.count() == 0
    assert back.schema.simpleString() == "struct<k:bigint,v:double>"
    assert read_versioned(spark, path).count() == 0


def test_stream_reader_skips_optimize_versions(spark, tmp_path):
    """Compaction commits are dataChange=false for a streaming reader:
    the rewritten files must NOT be re-emitted (they would duplicate
    every row), while appends before and after flow exactly-once."""
    from ssidentity_spark.operators.tablelog import optimize, write_versioned

    path = str(tmp_path / "ot")
    out = str(tmp_path / "oout2")
    ck = str(tmp_path / "ock2")
    register(spark)

    def run():
        q = (
            spark.readStream.format("managed_table")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    write_versioned(
        spark.range(0, 50).select(F.col("id").alias("k")).repartition(4),
        path,
        "append",
    )
    run()
    assert spark.read.parquet(out).count() == 50
    optimize(spark, path, target_rows_per_file=1_000)
    write_versioned(
        spark.range(50, 70).select(F.col("id").alias("k")), path, "append"
    )
    run()
    got = spark.read.parquet(out)
    assert got.count() == 70  # optimize emitted nothing, append arrived
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(70))


def test_format_reads_evolved_table_with_padded_nulls(spark, tmp_path):
    """Additive evolution through the format: the manifest's recorded
    schema is authoritative (no single footer carries every column) and
    pre-evolution parts read the new columns as typed nulls."""
    from ssidentity_spark.operators.tablelog import write_versioned

    path = str(tmp_path / "evds")
    register(spark)
    write_versioned(
        spark.range(0, 8).select(F.col("id").alias("k")), path, "append"
    )
    write_versioned(
        spark.range(8, 12).select(
            F.col("id").alias("k"), (F.col("id") * 2.0).alias("score")
        ),
        path,
        "append",
    )
    t = spark.read.format("managed_table").load(path)
    assert t.schema.simpleString() == "struct<k:bigint,score:double>"
    rows = {(r["k"], r["score"]) for r in t.collect()}
    assert rows == {(k, None) for k in range(8)} | {
        (k, k * 2.0) for k in range(8, 12)
    }
    # streaming read across the evolution boundary pads identically
    out = str(tmp_path / "evout")
    q = (
        spark.readStream.format("managed_table")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "evck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.read.parquet(out)
    assert {(r["k"], r["score"]) for r in got.collect()} == rows


def test_max_versions_per_trigger_paces_running_stream(spark, tmp_path):
    """Backlog throttling: once the stream is RUNNING, a burst of
    versions drains at most maxVersionsPerTrigger per micro-batch (the
    first batch after a (re)start is uncapped by design — see the
    semantics note in the reader; capping it could wedge restarts)."""
    import json as _json
    import os
    import time

    from ssidentity_spark.operators.tablelog import write_versioned

    path = str(tmp_path / "thr")
    out = str(tmp_path / "tout")
    ck = str(tmp_path / "tck")
    register(spark)
    write_versioned(
        spark.range(0, 10).select(F.col("id").alias("k")), path, "append"
    )
    q = (
        spark.readStream.format("managed_table")
        .option("maxVersionsPerTrigger", 2)
        .load(path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    odir = os.path.join(ck, "offsets")

    def _steps():
        out_steps = []
        if not os.path.isdir(odir):
            return out_steps
        for name in sorted(os.listdir(odir), key=lambda n: int(n) if n.isdigit() else -1):
            if name.isdigit():
                with open(os.path.join(odir, name)) as f:
                    last = f.read().splitlines()[-1]
                out_steps.append(_json.loads(last)["version"])
        return out_steps

    try:
        deadline = time.time() + 60
        while time.time() < deadline and not _steps():
            time.sleep(0.5)  # first (uncapped) batch committed
        # burst: five more versions land while the stream is running
        for i in range(1, 6):
            write_versioned(
                spark.range(i * 10, (i + 1) * 10).select(F.col("id").alias("k")),
                path,
                "append",
            )
        deadline = time.time() + 90
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() == 60:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 60
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(60))
    steps = _steps()
    assert steps[-1] == 5  # caught up
    # pacing: every advancement after the first committed batch moves
    # at most 2 versions
    assert all(b - a <= 2 for a, b in zip(steps, steps[1:]))
    assert len(steps) >= 3  # the burst took multiple micro-batches


def test_format_writes_preserve_evolved_schema_record(spark, tmp_path):
    """r7 review: a schema-oblivious commit (or one declaring only its
    own columns) must never ERASE the evolved schema from the tip — the
    record carries forward and unions inside commit_files, so format
    reads keep surfacing every column."""
    from ssidentity_spark.operators.tablelog import (
        _read_manifest,
        latest_version,
        write_versioned,
    )

    path = str(tmp_path / "evkeep")
    register(spark)
    write_versioned(
        spark.range(0, 4).select(F.col("id").alias("k")), path, "append"
    )
    write_versioned(
        spark.range(4, 6).select(
            F.col("id").alias("k"), (F.col("id") * 1.5).alias("score")
        ),
        path,
        "append",
    )
    # append THROUGH THE FORMAT with the full evolved schema
    spark.createDataFrame([(6, 9.0)], "k long, score double").write.format(
        "managed_table"
    ).mode("append").save(path)
    tip = _read_manifest(path, latest_version(path))
    assert tip.get("schema") == [["k", "bigint"], ["score", "double"]]
    t = spark.read.format("managed_table").load(path)
    assert t.schema.simpleString() == "struct<k:bigint,score:double>"
    rows = {(r["k"], r["score"]) for r in t.collect()}
    assert rows == {(0, None), (1, None), (2, None), (3, None),
                    (4, 6.0), (5, 7.5), (6, 9.0)}


def test_stream_change_feed_emits_inserts_and_deletes(spark, tmp_path):
    """readChangeFeed streaming: appends arrive as _change_type='insert',
    a row-level DELETE contributes its recorded change file as 'delete'
    rows, optimize versions contribute nothing — each stamped with its
    commit version (the batch read_changes contract, as a stream)."""
    from ssidentity_spark.operators.tablelog import (
        delete_where,
        optimize,
        write_versioned,
    )

    register(spark)
    path = str(tmp_path / "t")
    write_versioned(
        spark.range(0, 10).selectExpr("id AS k"), path, "append"
    )  # v0
    write_versioned(
        spark.range(10, 15).selectExpr("id AS k"), path, "append"
    )  # v1
    optimize(spark, path, target_rows_per_file=1_000)  # v2: no changes
    delete_where(spark, path, "k % 2 = 0")  # v3: removes 0..14 evens
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("managed_table")
        .option("readChangeFeed", "true")
        .load(path)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["_commit_version"], r["_change_type"])
        for r in spark.read.parquet(out).collect()
    }
    expect = {(k, 0, "insert") for k in range(10)}
    expect |= {(k, 1, "insert") for k in range(10, 15)}
    expect |= {(k, 3, "delete") for k in range(0, 15) if k % 2 == 0}
    assert got == expect


def test_stream_change_feed_tails_new_deletes_incrementally(spark, tmp_path):
    """A restarted CDF stream picks up ONLY the delete/append versions
    committed since its checkpoint offset."""
    from ssidentity_spark.operators.tablelog import (
        delete_where,
        write_versioned,
    )

    register(spark)
    path = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    write_versioned(spark.range(0, 6).selectExpr("id AS k"), path, "append")

    def run():
        q = (
            spark.readStream.format("managed_table")
            .option("readChangeFeed", "true")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert spark.read.parquet(out).count() == 6
    delete_where(spark, path, "k >= 4")  # v1
    write_versioned(spark.range(6, 8).selectExpr("id AS k"), path, "append")
    run()
    got = {
        (r["k"], r["_commit_version"], r["_change_type"])
        for r in spark.read.parquet(out).collect()
    }
    assert {(4, 1, "delete"), (5, 1, "delete")} <= got
    assert {(6, 2, "insert"), (7, 2, "insert")} <= got
    assert len(got) == 10  # 6 base inserts + 2 deletes + 2 new inserts


def test_batch_read_rejects_change_feed_option(spark, tmp_path):
    from ssidentity_spark.operators.tablelog import write_versioned

    register(spark)
    path = str(tmp_path / "t")
    write_versioned(spark.range(0, 3).selectExpr("id AS k"), path, "append")
    import pytest

    with pytest.raises(Exception, match="read_changes"):
        (
            spark.read.format("managed_table")
            .option("readChangeFeed", "true")
            .load(path)
            .collect()
        )


def test_batch_scan_applies_deletion_vectors(spark, tmp_path):
    """r8 (VERDICT r7 ask #7): merge-on-read through the format — the
    scan anti-joins the DV ledger per file instead of rejecting, and
    stays identical to the DV-aware direct reader across stacked DVs
    and a subsequent append."""
    from ssidentity_spark.operators.tablelog import delete_where, write_versioned

    register(spark)
    path = str(tmp_path / "dvb")
    write_versioned(
        spark.range(500).selectExpr("id AS k", "CAST(id * 2 AS DOUBLE) AS v").repartition(4),
        path,
        "append",
    )
    delete_where(spark, path, "k % 7 = 0", mode="dv")
    delete_where(spark, path, "k % 11 = 3", mode="dv")
    write_versioned(
        spark.range(500, 520).selectExpr(
            "id AS k", "CAST(id * 2 AS DOUBLE) AS v"
        ),
        path,
        "append",
    )
    got = spark.read.format("managed_table").load(path)
    want = read_versioned(spark, path)
    assert got.count() == want.count()
    assert got.agg(F.sum("k"), F.sum("v")).collect() == want.agg(
        F.sum("k"), F.sum("v")
    ).collect()
    assert got.where("k % 7 = 0 AND k < 500").count() == 0


def test_stream_starting_version_applies_deletion_vectors(spark, tmp_path):
    """A fresh stream starting AT a DV-bearing snapshot replays the
    snapshot with the vectors applied (no resurrection), then tails
    later appends normally — the medallion pattern surviving a DV
    delete upstream. Stream output ≡ batch snapshot + appends."""
    from ssidentity_spark.operators.tablelog import delete_where, write_versioned

    register(spark)
    path = str(tmp_path / "dvs")
    out = str(tmp_path / "dvout")
    ck = str(tmp_path / "dvck")
    write_versioned(
        spark.range(300).selectExpr("id AS k").repartition(3), path, "append"
    )
    delete_where(spark, path, "k % 3 = 0", mode="dv")  # v1: 100 doomed
    tip = 1

    def run():
        q = (
            spark.readStream.format("managed_table")
            .option("startingVersion", tip)
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    got = spark.read.parquet(out)
    assert got.count() == 200
    assert got.where("k % 3 = 0").count() == 0
    assert got.agg(F.sum("k")).collect()[0][0] == sum(
        k for k in range(300) if k % 3
    )
    # tail after the snapshot: a plain append arrives whole
    write_versioned(spark.range(300, 330).selectExpr("id AS k"), path, "append")
    run()
    assert spark.read.parquet(out).count() == 230


def test_stream_cdf_across_dv_delete_matches_batch_feed(spark, tmp_path):
    """readChangeFeed over a mid-stream DV delete: the recorded change
    file arrives as _change_type='delete' rows (same contract as cow),
    and the data files the DV left untouched are not re-emitted."""
    from ssidentity_spark.operators.tablelog import delete_where, write_versioned

    register(spark)
    path = str(tmp_path / "dvc")
    out = str(tmp_path / "dvcout")
    ck = str(tmp_path / "dvcck")
    write_versioned(spark.range(50).selectExpr("id AS k"), path, "append")

    def run():
        q = (
            spark.readStream.format("managed_table")
            .option("readChangeFeed", "true")
            .load(path)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    delete_where(spark, path, "k >= 40", mode="dv")
    run()
    got = {
        (r["k"], r["_commit_version"], r["_change_type"])
        for r in spark.read.parquet(out).collect()
    }
    expect = {(k, 0, "insert") for k in range(50)}
    expect |= {(k, 1, "delete") for k in range(40, 50)}
    assert got == expect


def test_stage_rows_naive_local_timestamps_store_correct_instants(tmp_path):
    """pyspark hands write() naive OS-LOCAL datetimes; the staged parquet
    declares timestamp('us', tz='UTC'). Without binding the local zone
    first, Arrow would read the naive value as UTC wall time and shift
    every instant by the host's UTC offset — pin the corrected behavior
    under a non-UTC process timezone."""
    import datetime as dt
    import os as _os
    import time as _time

    import pyarrow.parquet as pq

    from ssidentity_spark.sources.managed_source import _stage_rows

    old_tz = _os.environ.get("TZ")
    _os.environ["TZ"] = "America/New_York"
    _time.tzset()
    try:
        # 2026-01-01 07:00 naive-local in New York == 12:00:00Z
        naive = dt.datetime(2026, 1, 1, 7, 0, 0)
        out = str(tmp_path / "part.parquet")
        n = _stage_rows(
            iter([{"k": 1, "ts": naive}]),
            ["k", "ts"],
            [("k", "bigint"), ("ts", "timestamp")],
            out,
        )
        assert n == 1
        col = pq.read_table(out).column("ts").to_pylist()[0]
        assert col.astimezone(dt.timezone.utc) == dt.datetime(
            2026, 1, 1, 12, 0, 0, tzinfo=dt.timezone.utc
        )
    finally:
        if old_tz is None:
            _os.environ.pop("TZ", None)
        else:
            _os.environ["TZ"] = old_tz
        _time.tzset()


def test_max_versions_per_trigger_rejects_nonpositive(spark, tmp_path):
    from ssidentity_spark.operators.tablelog import write_versioned

    register(spark)
    path = str(tmp_path / "t")
    write_versioned(spark.range(3).selectExpr("id AS k"), path, "append")
    import pytest

    with pytest.raises(Exception, match="maxVersionsPerTrigger"):
        (
            spark.readStream.format("managed_table")
            .option("maxVersionsPerTrigger", 0)
            .load(path)
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )


def test_corrupt_sidecar_degrades_scan_instead_of_bricking(spark, tmp_path):
    import os as _os

    from ssidentity_spark.operators.managed import _index_path, write_managed

    register(spark)
    path = str(tmp_path / "m")
    df = spark.range(100).selectExpr("id % 10 AS mac_key", "id AS seq")
    write_managed(spark, df, path, "mac_key")
    # simulate a crash-truncated sidecar
    with open(_index_path(path, 0), "w") as f:
        f.write('{"key": "mac_')
    got = spark.read.format("managed_table").load(path)
    assert got.count() == 100  # unpruned scan, not a JSONDecodeError


def test_in_list_pushdown_prunes_partitions(spark, table):
    """r8: IN-lists on the indexed key prune as the UNION of per-value
    lookups — a sparse list opens only its values' files, not the
    [min, max] envelope, and results stay exact."""
    from pyspark.sql.datasource import In

    r = spark.read.format("managed_table").load(table)
    reader = ManagedTableReader(table, 1, r.schema)
    n_all = len(reader.partitions())
    returned = list(reader.pushFilters([In(("mac_key",), (3, 150))]))
    assert len(returned) == 1  # partially-pushed: the filter comes back
    n_pruned = len(reader.partitions())
    assert n_pruned <= 8 < n_all == 32

    # pin v1: an earlier test appends a v2 to the module-scoped table
    r1 = spark.read.format("managed_table").option("version", 1).load(table)
    got = r1.where(F.col("mac_key").isin(3, 150))
    want = read_versioned(spark, table, 1).where(F.col("mac_key").isin(3, 150))
    assert got.count() == want.count() == 400
    assert got.agg(F.sum("seq")).collect() == want.agg(F.sum("seq")).collect()
    # values outside the domain return nothing (and prune to nothing)
    assert r.where(F.col("mac_key").isin(900_000, 900_001)).count() == 0


def test_anded_in_lists_intersect_values(spark, table):
    from pyspark.sql.datasource import In

    r = spark.read.format("managed_table").load(table)
    reader = ManagedTableReader(table, 1, r.schema)
    list(reader.pushFilters([In(("mac_key",), (3, 150)), In(("mac_key",), (150, 180))]))
    assert reader.in_values["mac_key"] == {150}
    # disjoint ANDed lists: provably empty, one marker partition
    reader2 = ManagedTableReader(table, 1, r.schema)
    list(reader2.pushFilters([In(("mac_key",), (3,)), In(("mac_key",), (150,))]))
    parts = reader2.partitions()
    assert len(parts) == 1 and parts[0].rel_file is None


def test_equality_on_minmax_key_prunes_without_bloom(spark, table):
    """EqualTo on the min/max-indexed key collapses the range band to
    [v, v] — pruning holds even where the bloom path doesn't apply
    (here both indexes share the key, so the band just tightens)."""
    from pyspark.sql.datasource import EqualTo

    r = spark.read.format("managed_table").load(table)
    reader = ManagedTableReader(table, 1, r.schema)
    reader.index = None  # simulate a table with only the min/max sidecar
    list(reader.pushFilters([EqualTo(("mac_key",), 123)]))
    assert reader.range_lo == 123 and reader.range_hi == 123
    n_pruned = len(reader.partitions())
    assert n_pruned <= 4 < 32


def test_engine_delivers_in_filter_to_the_source(spark, tmp_path):
    """End-to-end proof the ENGINE pushes isin into pushFilters (not
    just the driver-side reader simulation): every file outside the
    IN-list's survivor set is deleted from disk, so the filtered scan
    succeeds iff the source actually planned only pruned partitions —
    an unpruned scan would hit the missing files and fail."""
    import glob

    from ssidentity_spark.operators.fileindex import bloom_survivors
    from ssidentity_spark.operators.managed import write_managed

    path = str(tmp_path / "t")
    df = spark.range(0, 4_000).select(
        (F.col("id") % 40).alias("mac_key"),
        F.col("id").alias("seq"),
    )
    write_managed(spark, df, path, "mac_key")
    register(spark)
    r = spark.read.format("managed_table").load(path)
    reader = ManagedTableReader(path, 0, r.schema)
    keep = set()
    for v in (3, 17):
        keep.update(bloom_survivors(reader.index, v, restrict=set(reader.files)))
    assert keep and len(keep) < len(reader.files)
    victims = [f for f in reader.files if f not in keep]
    assert victims  # the proof is vacuous if nothing gets deleted
    for f in victims:
        os.remove(os.path.join(path, f))

    got = r.where(F.col("mac_key").isin(3, 17)).agg(
        F.count(F.lit(1)), F.sum("seq")
    ).collect()[0]
    want = df.where(F.col("mac_key").isin(3, 17)).agg(
        F.count(F.lit(1)), F.sum("seq")
    ).collect()[0]
    assert tuple(got) == tuple(want)
    # control: an unfiltered scan must hit the deleted files
    with pytest.raises(Exception):
        spark.read.format("managed_table").load(path).count()


def test_data_source_reads_shallow_clone_with_repointed_dvs(
    spark, tmp_path
):
    """A shallow clone's manifest references the source's parts via
    ../-relative paths and carries REWRITTEN DV sidecars — the
    managed_table format must read it like any table (same join-by-
    basename scan, per-file DV mask), composing CLONE with the whole
    V4 read surface."""
    from ssidentity_spark.operators.tablelog import (
        clone_table,
        delete_where,
        write_versioned,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(
        spark.range(20).select(F.col("id").alias("k")), src, "append"
    )
    delete_where(spark, src, "k = 3", mode="dv")
    clone_table(src, dst)
    register(spark)
    back = spark.read.format("managed_table").load(dst)
    got = sorted(r["k"] for r in back.collect())
    assert got == [k for k in range(20) if k != 3]
