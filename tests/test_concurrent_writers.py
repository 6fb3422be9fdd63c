"""Concurrent-writer property tests for the transaction log (VERDICT r7
ask #6): two real OS processes racing the commit protocol. The claim
under test is optimistic concurrency at the manifest layer — os.link
publication admits exactly ONE winner per version, losers either retry
against the new parent (appends) or abort with VersionConflict and clean
their staging (pinned-parent DML) — so no committed version is ever lost
or overwritten.

The child processes drive ``commit_files``/``_commit`` directly (the
layer every writer — batch, streaming sink, DML verb — funnels through);
data parts are pre-staged pyarrow files so the race is pure protocol,
not two competing JVMs. A Spark-level read at the end verifies the
surviving table is exactly the union of winning commits."""

from __future__ import annotations

import json
import multiprocessing as mp
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ssidentity_spark.operators.tablelog import (
    _read_manifest,
    history,
    latest_version,
    read_versioned,
)

N_COMMITS = 12  # per writer


def _stage(path: str, writer: str, i: int) -> str:
    """One tiny real parquet part under data/, manifest-relative path."""
    rel = os.path.join("data", f"{writer}-{i:04d}.parquet")
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array([i], type=pa.int64()),
                  "writer": pa.array([writer])}),
        os.path.join(path, rel),
    )
    return rel


def _appender(path: str, writer: str, out: "mp.Queue") -> None:
    from ssidentity_spark.operators.tablelog import commit_files

    wins = []
    for i in range(N_COMMITS):
        rel = _stage(path, writer, i)
        v = commit_files(
            path,
            [rel],
            mode="append",
            max_retries=200,
            schema=[("k", "bigint"), ("writer", "string")],
        )
        wins.append((v, rel))
    out.put((writer, wins))


def _pinned_deleter(path: str, out: "mp.Queue") -> None:
    """The DML commit shape: read tip, rewrite one file's content, commit
    pinned to tip+1 WITHOUT retrying (a blind retry could drop a
    concurrent append's rows). Loses races until one attempt lands."""
    from ssidentity_spark.operators.tablelog import (
        VersionConflict,
        _commit,
        _read_manifest,
        latest_version,
    )

    attempts = 0
    while True:
        attempts += 1
        tip = latest_version(path)
        m = _read_manifest(path, tip)
        victim = sorted(m["files"])[0]
        rel = os.path.join("data", f"del-rewrite-{attempts:04d}.parquet")
        pq.write_table(
            pa.table({"k": pa.array([-1], type=pa.int64()),
                      "writer": pa.array(["deleter"])}),
            os.path.join(path, rel),
        )
        kept = [f for f in m["files"] if f != victim] + [rel]
        try:
            _commit(path, tip + 1, kept, "delete",
                    meta={"predicate": "test", "rows_deleted": 1,
                          "schema": m.get("schema")})
        except VersionConflict:
            os.remove(os.path.join(path, rel))  # abort cleans staging
            continue
        out.put(("deleter", tip + 1, victim, rel, attempts))
        return


@pytest.fixture()
def log_path(tmp_path):
    path = str(tmp_path / "race")
    rel = _stage(path, "seed", 0)
    from ssidentity_spark.operators.tablelog import commit_files

    commit_files(path, [rel], mode="append",
                 schema=[("k", "bigint"), ("writer", "string")])
    return path


def _run(procs: list[mp.Process], q: mp.Queue, n_results: int):
    for p in procs:
        p.start()
    results = [q.get(timeout=120) for _ in range(n_results)]
    for p in procs:
        p.join(timeout=60)
        assert p.exitcode == 0
    return results


def test_concurrent_appends_lose_nothing(spark, log_path):
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    results = _run(
        [
            ctx.Process(target=_appender, args=(log_path, w, q))
            for w in ("alpha", "beta")
        ],
        q,
        2,
    )
    wins = {w: dict(v) for w, v in results}
    # exactly one winner per version: both writers' committed versions
    # are disjoint and cover (1, 2N] with the seed at 0
    versions = sorted(v for per in wins.values() for v in per)
    assert versions == list(range(1, 2 * N_COMMITS + 1))
    assert latest_version(log_path) == 2 * N_COMMITS
    # no lost commit: the tip's file list carries every staged part
    tip_files = set(_read_manifest(log_path, latest_version(log_path))["files"])
    expected = {rel for per in wins.values() for rel in per.values()}
    assert expected <= tip_files
    # parent chain is intact (no forked or skipped history)
    for v in range(1, 2 * N_COMMITS + 1):
        assert _read_manifest(log_path, v)["parent"] == v - 1
    # the surviving table reads every row exactly once
    got = read_versioned(spark, log_path)
    assert got.count() == 2 * N_COMMITS + 1
    by_writer = {
        r["writer"]: r["n"]
        for r in got.groupBy("writer").count().withColumnRenamed("count", "n").collect()
    }
    assert by_writer == {"seed": 1, "alpha": N_COMMITS, "beta": N_COMMITS}


def test_concurrent_append_and_pinned_delete(spark, log_path):
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    results = _run(
        [
            ctx.Process(target=_appender, args=(log_path, "alpha", q)),
            ctx.Process(target=_pinned_deleter, args=(log_path, q)),
        ],
        q,
        2,
    )
    by_role = {r[0]: r for r in results}
    _, append_wins = by_role["alpha"]
    _, del_v, victim, rewrite_rel, attempts = by_role["deleter"]
    # one winner per version: appender's versions and the delete's are
    # disjoint and together cover (1, N+1]
    versions = sorted([v for v, _ in append_wins] + [del_v])
    assert versions == list(range(1, N_COMMITS + 2))
    # the delete landed on the parent it pinned (no blind retry)
    assert _read_manifest(log_path, del_v)["parent"] == del_v - 1
    assert _read_manifest(log_path, del_v)["operation"] == "delete"
    # no lost commit: every append file staged BEFORE or AFTER the
    # delete survives at the tip unless it was the delete's victim
    tip_files = set(_read_manifest(log_path, latest_version(log_path))["files"])
    for _, rel in append_wins:
        if rel != victim:
            assert rel in tip_files
    assert victim not in tip_files
    assert rewrite_rel in tip_files
    # losing attempts cleaned their staged rewrites (no orphan parts in
    # the manifest; files on disk are vacuum's business, but the LOG
    # must reference only winners)
    for f in tip_files:
        assert not f.startswith("data/del-rewrite-") or f == rewrite_rel
    # the surviving table is consistent
    got = read_versioned(spark, log_path)
    assert got.where("writer = 'deleter'").count() == 1
    assert got.where("writer = 'alpha'").count() >= N_COMMITS - 1


# --- r9 (VERDICT r8 stretch #9): merge vs append, DV delete vs OPTIMIZE ---


def _ambush_appender(path: str, trigger_glob: str, out: "mp.Queue") -> None:
    """Pre-stage an append part, signal readiness, poll until
    ``trigger_glob`` matches (the victim DML has written its first
    private artifact but not yet committed), then land the commit —
    everything slow happens BEFORE the trigger so the victim's
    pinned-parent commit reliably loses the race."""
    import glob
    import time

    from ssidentity_spark.operators.tablelog import commit_files

    rel = _stage(path, "ambush", 0)
    open(os.path.join(path, ".ambush_ready"), "w").close()
    while not glob.glob(os.path.join(path, trigger_glob)):
        time.sleep(0.001)
    v = commit_files(
        path,
        [rel],
        mode="append",
        max_retries=200,
        schema=[("k", "bigint"), ("writer", "string")],
    )
    out.put(("ambush", v, rel))


def _ambush_optimizer(path: str, trigger_glob: str, out: "mp.Queue") -> None:
    """Protocol-level OPTIMIZE racing a DV delete: compact the CURRENT
    tip's parts into one pre-staged file, then — once the delete's
    first private artifact appears — commit ``operation='optimize'``.
    The interaction the abort exists for: a DV pinned to the old rel
    paths must NOT land on a manifest whose files were just
    rewritten."""
    import glob
    import time

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from ssidentity_spark.operators.tablelog import (
        _commit,
        _read_manifest,
        latest_version,
    )

    tip = latest_version(path)
    m = _read_manifest(path, tip)
    tbl = _pa.concat_tables(
        [_pq.read_table(os.path.join(path, f)) for f in sorted(m["files"])]
    )
    rel = os.path.join("data", "ambush-compact-0001.parquet")
    _pq.write_table(tbl, os.path.join(path, rel))
    open(os.path.join(path, ".ambush_ready"), "w").close()
    while not glob.glob(os.path.join(path, trigger_glob)):
        time.sleep(0.001)
    _commit(
        path, tip + 1, [rel], "optimize", meta={"schema": m.get("schema")}
    )
    out.put(("optimizer", tip + 1, rel))


def _await_ready(path: str, timeout_s: float = 60.0) -> None:
    import time

    marker = os.path.join(path, ".ambush_ready")
    t0 = time.time()
    while not os.path.exists(marker):
        assert time.time() - t0 < timeout_s, "ambush child never signalled"
        time.sleep(0.01)


def test_merge_race_aborts_cleans_and_retries_cleanly(spark, tmp_path):
    """merge_into's pinned-parent claim under a REAL two-process race: an
    append lands between the merge's tip read and its commit → the merge
    must raise VersionConflict, remove its staged data AND change files,
    and leave the table readable; a fresh merge then succeeds WITH the
    ambush row intact."""
    import glob

    from pyspark.sql import functions as F

    from ssidentity_spark.operators.tablelog import (
        VersionConflict,
        merge_into,
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "mr")
    write_versioned(
        spark.range(10).select(
            F.col("id").alias("k"), F.lit("seed").alias("writer")
        ),
        path,
        "append",
    )
    changes = spark.createDataFrame([(3, "merged")], "k bigint, writer string")

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    child = ctx.Process(
        target=_ambush_appender, args=(path, "_changes/*", q)
    )
    child.start()
    try:
        _await_ready(path)
        with pytest.raises(VersionConflict):
            merge_into(spark, path, changes, "k", {"writer": "c.writer"})
        role, av, arel = q.get(timeout=60)
    finally:
        child.join(timeout=60)
    assert child.exitcode == 0
    assert (role, av) == ("ambush", 1)
    # abort cleaned ALL private staging: no merge data dirs, no change sets
    assert glob.glob(os.path.join(path, "data", "merge-*")) == []
    assert glob.glob(os.path.join(path, "_changes", "*")) == []
    # the table is intact and the ambush append survived
    assert latest_version(path) == 1
    got = read_versioned(spark, path)
    assert got.count() == 11
    # the retry (fresh tip read) lands cleanly on top of the append
    stats = merge_into(spark, path, changes, "k", {"writer": "c.writer"})
    assert stats["version"] == 2 and stats["rows_updated"] == 1
    rows = {(r["k"], r["writer"]) for r in read_versioned(spark, path).collect()}
    assert (3, "merged") in rows and (0, "ambush") in rows
    assert len(rows) == 11


def test_dv_delete_race_with_optimize_aborts_then_lands(spark, tmp_path):
    """DV delete vs OPTIMIZE, two processes: the compactor rewrites the
    file set while the delete's DV (pinned to the OLD rel paths) is
    staged but uncommitted. The delete must abort — a committed DV
    naming rewritten files would be inert and resurrect the rows — clean
    its sidecar + change set, and succeed on retry against the compacted
    tip."""
    import glob

    from pyspark.sql import functions as F

    from ssidentity_spark.operators.tablelog import (
        VersionConflict,
        delete_where,
        read_versioned,
        write_versioned,
    )

    path = str(tmp_path / "dvr")
    write_versioned(
        spark.range(10)
        .select(F.col("id").alias("k"), F.lit("seed").alias("writer"))
        .repartition(2),
        path,
        "append",
    )
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    child = ctx.Process(target=_ambush_optimizer, args=(path, "_changes/*", q))
    child.start()
    try:
        _await_ready(path)
        with pytest.raises(VersionConflict):
            delete_where(spark, path, "k = 3", mode="dv")
        role, ov, orel = q.get(timeout=60)
    finally:
        child.join(timeout=60)
    assert child.exitcode == 0
    assert (role, ov) == ("optimizer", 1)
    # abort cleaned the DV sidecar and the change set
    assert glob.glob(os.path.join(path, "_dv", "*")) == []
    assert glob.glob(os.path.join(path, "_changes", "*")) == []
    # the compacted tip reads all 10 rows
    assert latest_version(path) == 1
    assert read_versioned(spark, path).count() == 10
    # retry pins the COMPACTED file set; the delete lands and reads back
    stats = delete_where(spark, path, "k = 3", mode="dv")
    assert stats["version"] == 2 and stats["rows_deleted"] == 1
    got = {r["k"] for r in read_versioned(spark, path).collect()}
    assert got == set(range(10)) - {3}
