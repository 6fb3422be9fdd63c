"""Randomized DML-sequence invariants for the versioned table.

Seeded random interleavings of append / cow-delete / dv-delete / update /
optimize, checked after EVERY op against a driver-side Python model:

- the tip snapshot always equals the model (merge-on-read included);
- the change feed from version 0 REPLAYS to the final state (inserts
  applied, deletes removed, update pre/post images swap values);
- time travel to any recorded version reproduces the model's snapshot
  at that point;
- vacuum afterwards changes nothing readable.

This is the generative counterpart of the directed tests: the DML verbs
interact (a dv delete's vectors must mask later update/delete hit
passes; optimize must materialize; ledgers must ride every commit), and
the interactions are exactly what random sequences exercise.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.operators.tablelog import (
    delete_where,
    optimize,
    read_changes,
    read_versioned,
    update_where,
    vacuum,
    write_versioned,
)


def _tip_rows(spark, path):
    return {
        (r["k"], r["v"]) for r in read_versioned(spark, path).collect()
    }


def _mk(spark, rows):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(rows)], "k long, v long"
    )


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_random_dml_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"t{seed}")
    model: dict[int, int] = {}
    next_k = 0
    snapshots: list[tuple[int, frozenset]] = []

    def do_append():
        nonlocal next_k
        batch = {k: k * 10 for k in range(next_k, next_k + rng.randint(3, 8))}
        next_k = max(batch) + 1
        write_versioned(_mk(spark, batch.items()), path, "append")
        model.update(batch)

    def do_delete():
        m, r = rng.choice([(3, 0), (4, 1), (5, 2)])
        mode = rng.choice(["cow", "dv"])
        stats = delete_where(spark, path, f"k % {m} = {r}", mode=mode)
        doomed = [k for k in model if k % m == r]
        assert stats["rows_deleted"] == len(doomed)
        for k in doomed:
            del model[k]
        if mode == "dv" and doomed:
            assert stats["files_rewritten"] == 0

    def do_update():
        m, r = rng.choice([(3, 1), (4, 2), (5, 0)])
        c = rng.randint(1, 9)
        stats = update_where(spark, path, f"k % {m} = {r}", {"v": f"v + {c}"})
        hit = [k for k in model if k % m == r]
        assert stats["rows_updated"] == len(hit)
        for k in hit:
            model[k] = model[k] + c

    def do_optimize():
        optimize(spark, path, target_rows_per_file=1_000)

    do_append()  # the table must exist first
    ops = [do_append, do_delete, do_update, do_optimize]
    for _ in range(9):
        rng.choice(ops)()
        got = _tip_rows(spark, path)
        want = {(k, v) for k, v in model.items()}
        assert got == want, f"tip diverged from model (seed {seed})"
        from ssidentity_spark.operators.tablelog import latest_version

        snapshots.append((latest_version(path), frozenset(want)))

    # time travel reproduces every recorded point
    for v, snap in rng.sample(snapshots, min(4, len(snapshots))):
        got = {
            (r["k"], r["v"])
            for r in read_versioned(spark, path, v).collect()
        }
        assert got == set(snap), f"time travel to v{v} diverged"

    # feed replay: the feed is EXCLUSIVE of the start version, so seed
    # from the v0 snapshot, then fold the changes in version order
    feed = read_changes(spark, path, 0, include_deletes=True).collect()
    feed.sort(key=lambda r: (r["_commit_version"],
                             r["_change_type"] != "update_preimage"))
    replay: dict[int, int] = {
        r["k"]: r["v"] for r in read_versioned(spark, path, 0).collect()
    }
    for r in feed:
        t = r["_change_type"]
        if t == "insert" or t == "update_postimage":
            replay[r["k"]] = r["v"]
        elif t == "delete":
            del replay[r["k"]]
        elif t == "update_preimage":
            assert replay[r["k"]] == r["v"], "preimage mismatch"
    assert replay == model, f"feed replay diverged (seed {seed})"

    # vacuum to the tip: still readable, still the model
    vacuum(path, keep_latest=1)
    assert _tip_rows(spark, path) == {(k, v) for k, v in model.items()}
