"""CLONE (operators/tablelog.py:clone_table): shallow/deep table forks.

The reference stores one SQLite file (ssidentity.c:62-66) — copying it is
the only "branch" it has. At lakehouse scale the fork must be a manifest
operation: shallow = zero bytes copied, deep = byte copies with zero
recompute. These tests pin the contracts the query gate
(src_clone_shallow) summarizes into one hash: pinned-version reads,
independent evolution, ledger freshness, DV repointing, and the vacuum
ownership guard that keeps clone maintenance from destroying the source.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.operators.tablelog import (
    _read_manifest,
    clone_table,
    delete_where,
    latest_version,
    read_versioned,
    restore_version,
    vacuum,
    write_versioned,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_shallow_clone_reads_pinned_version(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, 0, 10), src, "append")  # v0
    write_versioned(_df(spark, 10, 15), src, "append")  # v1
    stats = clone_table(src, dst, version=0)
    assert stats == {
        "version": 0,
        "source_version": 0,
        "files": len(_read_manifest(src, 0)["files"]),
        "mode": "shallow",
    }
    assert _rows(read_versioned(spark, dst)) == _rows(
        read_versioned(spark, src, 0)
    )
    # zero-copy: every clone file resolves to a source file
    src_real = {
        os.path.realpath(os.path.join(src, f))
        for f in _read_manifest(src, 0)["files"]
    }
    dst_real = {
        os.path.realpath(os.path.join(dst, f))
        for f in _read_manifest(dst, 0)["files"]
    }
    assert dst_real == src_real


def test_clone_evolves_independently_both_ways(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, 0, 10), src, "append")
    clone_table(src, dst)
    # clone-side DML rewrites land under the CLONE root, source untouched
    delete_where(spark, dst, "k % 2 = 0")
    assert read_versioned(spark, src).count() == 10
    assert read_versioned(spark, dst).count() == 5
    # source-side append never appears in the clone
    write_versioned(_df(spark, 10, 20), src, "append")
    assert read_versioned(spark, dst).count() == 5
    assert read_versioned(spark, src).count() == 20


def test_vacuum_on_clone_never_deletes_borrowed_source_files(
    spark, tmp_path
):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, 0, 10), src, "append")
    clone_table(src, dst)
    delete_where(spark, dst, "k < 3")  # clone v1: rewrites under clone root
    deleted = vacuum(dst, keep_latest=1)  # drops clone v0 (all borrowed)
    src_files = _read_manifest(src, 0)["files"]
    assert all(os.path.exists(os.path.join(src, f)) for f in src_files)
    # nothing reported deleted outside the clone root either
    assert all(".." not in d for d in deleted)
    assert read_versioned(spark, src).count() == 10
    assert read_versioned(spark, dst).count() == 7


def test_clone_is_create_only_and_requires_committed_version(
    spark, tmp_path
):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, 0, 5), src, "append")
    clone_table(src, dst)
    with pytest.raises(ValueError, match="create-only"):
        clone_table(src, dst)
    with pytest.raises(ValueError, match="no such committed version"):
        clone_table(src, str(tmp_path / "dst2"), version=7)
    with pytest.raises(FileNotFoundError):
        clone_table(str(tmp_path / "empty"), str(tmp_path / "dst3"))


def test_clone_does_not_carry_stream_batch_ledger(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(
        _df(spark, 0, 5), src, "append", meta={"batch_id": "q1#0"}
    )
    assert _read_manifest(src, 0)["batch_ids"] == ["q1#0"]
    clone_table(src, dst)
    # a clone is a NEW table: a sink that wrote the source must not be
    # treated as already-committed into the clone
    assert not _read_manifest(dst, 0).get("batch_ids")


def test_shallow_clone_repoints_deletion_vectors(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, 0, 10), src, "append")
    delete_where(spark, src, "k % 3 = 0", mode="dv")  # v1: DV sidecar
    clone_table(src, dst)
    m = _read_manifest(dst, 0)
    # the sidecar is REWRITTEN under the clone (f repointed), not borrowed
    assert m["dv_files"] and all(
        not d.startswith("..") for d in m["dv_files"]
    )
    assert _rows(read_versioned(spark, dst)) == _rows(
        read_versioned(spark, src)
    )
    assert read_versioned(spark, dst).count() == 6  # 0,3,6,9 removed


def test_deep_clone_survives_source_destruction(spark, tmp_path):
    import shutil

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, 0, 10), src, "append")
    delete_where(spark, src, "k = 4", mode="dv")
    stats = clone_table(src, dst, deep=True)
    assert stats["mode"] == "deep"
    expected = _rows(read_versioned(spark, src))
    shutil.rmtree(src)  # the hazard shallow clones document
    assert _rows(read_versioned(spark, dst)) == expected


def test_clone_refuses_vacuumed_source_version(spark, tmp_path):
    src = str(tmp_path / "src")
    write_versioned(_df(spark, 0, 5), src, "overwrite")
    write_versioned(_df(spark, 5, 9), src, "overwrite")
    vacuum(src, keep_latest=1)
    with pytest.raises(ValueError, match="no such committed version"):
        clone_table(src, str(tmp_path / "dst"), version=0)


def test_clone_then_restore_composes(spark, tmp_path):
    # fork, diverge, roll the fork back: clone v0 is a restorable anchor
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, 0, 10), src, "append")
    clone_table(src, dst)
    delete_where(spark, dst, "k < 9")
    restore_version(dst, 0)
    assert latest_version(dst) == 2
    assert _rows(read_versioned(spark, dst)) == _rows(
        read_versioned(spark, src, 0)
    )


def test_clone_tolerates_inert_dv_rows(spark, tmp_path):
    """cow DML carries dv_files forward after REWRITING the very files
    some DV rows name — those rows are inert for readers, and the clone
    must drop them instead of crashing on the missing remap (r9 review:
    KeyError made any DV-then-cow-DML table uncloneable)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_versioned(_df(spark, 0, 10), src, "append")
    delete_where(spark, src, "k = 2", mode="dv")  # v1: DV names file A
    delete_where(spark, src, "k = 5", mode="cow")  # v2: rewrites A, carries dv
    expected = _rows(read_versioned(spark, src))
    assert len(expected) == 8
    clone_table(src, dst)
    assert _rows(read_versioned(spark, dst)) == expected


def test_clone_drops_fully_inert_dv_sidecars(spark, tmp_path):
    """If EVERY carried DV row is inert (optimize materialized them but
    a later restore re-exposed the ledger shape), the clone carries no
    dv_files key at all."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    # ONE part file, so the cow rewrite below retires exactly the file
    # every DV row names
    write_versioned(_df(spark, 0, 6).coalesce(1), src, "append")
    delete_where(spark, src, "k = 1", mode="dv")
    delete_where(spark, src, "k IN (0, 2)", mode="cow")
    clone_table(src, dst)
    m = _read_manifest(dst, 0)
    assert not m.get("dv_files")
    assert _rows(read_versioned(spark, dst)) == _rows(
        read_versioned(spark, src)
    )
