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
