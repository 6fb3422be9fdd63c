"""CHECK constraints (M8b): named boolean expressions in the manifest,
enforced on append/overwrite/update/merge — the Delta ``ALTER TABLE ADD
CONSTRAINT`` verb. Violations fail LOUDLY naming the constraint and count,
and no version is committed (atomicity pinned on the tip)."""

from __future__ import annotations

import pytest

from ssidentity_spark.operators.tablelog import (
    add_constraint,
    drop_constraint,
    latest_version,
    merge_into,
    read_versioned,
    table_constraints,
    update_where,
    write_versioned,
)


def _mk(spark, tmp_path, rows=((1, 10.0), (2, 20.0))):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(list(rows), "id long, v double")
    write_versioned(df, p, "overwrite")
    return p


def test_add_validates_existing_data_and_blocks_bad_appends(spark, tmp_path):
    p = _mk(spark, tmp_path)
    v = add_constraint(spark, p, "v_positive", "v > 0")
    assert table_constraints(p) == {"v_positive": "v > 0"}
    tip = latest_version(p)
    assert tip == v
    bad = spark.createDataFrame([(3, -1.0)], "id long, v double")
    with pytest.raises(ValueError, match="v_positive.*1 row"):
        write_versioned(bad, p, "append")
    # atomicity: nothing committed, data unchanged
    assert latest_version(p) == tip
    assert read_versioned(spark, p).count() == 2
    # a valid append still lands
    ok = spark.createDataFrame([(3, 3.0)], "id long, v double")
    write_versioned(ok, p, "append")
    assert read_versioned(spark, p).count() == 3


def test_add_rejects_when_existing_data_violates(spark, tmp_path):
    p = _mk(spark, tmp_path, rows=((1, 10.0), (2, -5.0)))
    with pytest.raises(ValueError, match="add_constraint.*1 row"):
        add_constraint(spark, p, "v_positive", "v > 0")
    assert table_constraints(p) == {}


def test_null_fails_the_constraint(spark, tmp_path):
    p = _mk(spark, tmp_path)
    add_constraint(spark, p, "v_positive", "v > 0")
    nullish = spark.createDataFrame([(9, None)], "id long, v double")
    with pytest.raises(ValueError, match="v_positive"):
        write_versioned(nullish, p, "append")


def test_update_set_cannot_violate(spark, tmp_path):
    p = _mk(spark, tmp_path)
    add_constraint(spark, p, "v_positive", "v > 0")
    tip = latest_version(p)
    with pytest.raises(ValueError, match="update_where.*v_positive"):
        update_where(spark, p, "id = 1", {"v": "-99.0"})
    assert latest_version(p) == tip
    update_where(spark, p, "id = 1", {"v": "99.0"})
    got = {r["id"]: r["v"] for r in read_versioned(spark, p).collect()}
    assert got[1] == 99.0


def test_merge_cannot_insert_violations(spark, tmp_path):
    p = _mk(spark, tmp_path)
    add_constraint(spark, p, "v_positive", "v > 0")
    tip = latest_version(p)
    changes = spark.createDataFrame([(7, -7.0)], "id long, v double")
    with pytest.raises(ValueError, match="merge_into.*v_positive"):
        merge_into(spark, p, changes, key="id", assignments={"v": "c.v"})
    assert latest_version(p) == tip
    # and a valid merge lands
    good = spark.createDataFrame([(7, 7.0)], "id long, v double")
    merge_into(spark, p, good, key="id", assignments={"v": "c.v"})
    got = {r["id"]: r["v"] for r in read_versioned(spark, p).collect()}
    assert got[7] == 7.0


def test_constraints_survive_commits_and_drop_restores_writes(
    spark, tmp_path
):
    p = _mk(spark, tmp_path)
    add_constraint(spark, p, "v_positive", "v > 0")
    ok = spark.createDataFrame([(5, 5.0)], "id long, v double")
    write_versioned(ok, p, "append")  # ordinary commit: no constraints key
    assert table_constraints(p) == {"v_positive": "v > 0"}  # walk-back carry
    drop_constraint(p, "v_positive")
    assert table_constraints(p) == {}
    bad = spark.createDataFrame([(6, -6.0)], "id long, v double")
    write_versioned(bad, p, "append")  # allowed again
    assert read_versioned(spark, p).count() == 4
    with pytest.raises(ValueError, match="no constraint"):
        drop_constraint(p, "v_positive")


def test_meta_cannot_smuggle_constraints(spark, tmp_path):
    p = _mk(spark, tmp_path)
    add_constraint(spark, p, "v_positive", "v > 0")
    ok = spark.createDataFrame([(8, 8.0)], "id long, v double")
    with pytest.raises(ValueError, match="bookkeeping"):
        write_versioned(ok, p, "append", meta={"constraints": {}})


def test_constraints_survive_vacuum_and_drop_does_not_resurrect(
    spark, tmp_path
):
    """The record rides every manifest (the batch-ledger pattern), so
    vacuuming the add_constraint version keeps enforcement — and
    vacuuming the post-drop version does NOT resurrect the dropped
    constraint from an older manifest."""
    from ssidentity_spark.operators.tablelog import vacuum

    p = _mk(spark, tmp_path)
    add_constraint(spark, p, "v_positive", "v > 0")
    write_versioned(
        spark.createDataFrame([(5, 5.0)], "id long, v double"), p, "append"
    )
    vacuum(p, keep_latest=1)
    assert table_constraints(p) == {"v_positive": "v > 0"}
    bad = spark.createDataFrame([(6, -6.0)], "id long, v double")
    with pytest.raises(ValueError, match="v_positive"):
        write_versioned(bad, p, "append")
    drop_constraint(p, "v_positive")
    write_versioned(bad, p, "append")  # allowed post-drop
    vacuum(p, keep_latest=1)
    assert table_constraints(p) == {}  # no resurrection
    write_versioned(
        spark.createDataFrame([(7, -7.0)], "id long, v double"), p, "append"
    )


def test_clone_inherits_constraints_and_evolves_independently(
    spark, tmp_path
):
    from ssidentity_spark.operators.tablelog import clone_table

    p = _mk(spark, tmp_path)
    add_constraint(spark, p, "v_positive", "v > 0")
    dst = str(tmp_path / "c")
    clone_table(p, dst)
    assert table_constraints(dst) == {"v_positive": "v > 0"}
    bad = spark.createDataFrame([(6, -6.0)], "id long, v double")
    with pytest.raises(ValueError, match="v_positive"):
        write_versioned(bad, dst, "append")
    drop_constraint(dst, "v_positive")
    write_versioned(bad, dst, "append")  # clone freed
    with pytest.raises(ValueError, match="v_positive"):
        write_versioned(bad, p, "append")  # source still guarded


def test_data_source_write_path_is_guarded(spark, tmp_path):
    """The Python Data Source writer stages files from executors and
    commits via commit_files — the staged-file check must catch a
    violating batch there too (a DataFrame-level hook would miss it)."""
    from ssidentity_spark.sources.managed_source import register

    register(spark)
    p = _mk(spark, tmp_path)
    add_constraint(spark, p, "v_positive", "v > 0")
    tip = latest_version(p)
    bad = spark.createDataFrame([(3, -1.0)], "id long, v double")
    with pytest.raises(Exception, match="v_positive"):
        bad.write.format("managed_table").mode("append").save(p)
    assert latest_version(p) == tip
    ok = spark.createDataFrame([(3, 3.0)], "id long, v double")
    ok.write.format("managed_table").mode("append").save(p)
    assert read_versioned(spark, p).count() == 3


def test_spark_only_dialect_rejected_at_add_time(spark, tmp_path):
    """A constraint must parse in BOTH engines — a Spark-only expression
    is rejected at add_constraint, not discovered as an obscure
    commit_files failure on the first write."""
    p = _mk(spark, tmp_path)
    with pytest.raises(Exception):
        add_constraint(spark, p, "bad", "rlike(cast(v as string), '^[0-9]')")
    assert table_constraints(p) == {}
