"""Managed tables: the storage pieces composed into one write/read path.

The reference's entire storage story is "INSERT each packet into SQLite,
query it later by MAC" (ssidentity.c:102-113, README.md:15-19). At
100 TB that splits into write-path decisions this repo built separately
— CLUSTER so stats and indexes can skip (zorder.py / repartitionByRange),
COMMIT atomically with time travel (tablelog.py), INDEX for point
lookups (fileindex.py) — and this module is the composition: one call
writes a clustered, versioned, bloom-indexed snapshot; one call answers
"everything key X ever did" touching only the files that can matter,
against any pinned version.

The per-version index sidecar lives at ``_index/bloom-v{N}.json`` and is
built from exactly the manifest's file list (never orphaned staging
data). Lookups intersect {manifest files} ∩ {bloom-passing files} — both
index- and manifest-sized driver traffic, data-sized work only for the
surviving files.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssidentity_spark.operators.fileindex import (
    INDEX_K,
    INDEX_M_BITS,
    bloom_survivors,
    build_bloom_index,
)
from ssidentity_spark.operators.tablelog import (
    _read_manifest,
    latest_version,
    write_versioned,
)


def _index_path(path: str, version: int) -> str:
    return os.path.join(path, "_index", f"bloom-v{version:08d}.json")


def _minmax_path(path: str, version: int) -> str:
    """Per-version min/max sidecar — the RANGE half of data skipping
    (the bloom sidecar answers equality). Same per-file-immutability
    contract: a file's [min, max] never changes, so appends carry the
    parent's entries and scan only new files."""
    return os.path.join(path, "_index", f"minmax-v{version:08d}.json")


def _write_sidecar(path: str, version: int, key: str, m_bits: int, index: dict) -> None:
    """Publish the bloom sidecar ATOMICALLY (tmp + os.replace, the
    fileindex.py pattern): a crash mid-write must leave the previous
    state, never a truncated JSON that readers would choke on (the data
    source degrades gracefully on a bad sidecar, but a clean one should
    simply never exist)."""
    import uuid

    final = _index_path(path, version)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    tmp = final + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(
            {"key": key, "m_bits": m_bits, "k": INDEX_K, "files": index}, f
        )
    os.replace(tmp, final)


def _write_minmax_sidecar(path: str, version: int, key: str, index: dict) -> None:
    """Atomic publish (tmp + os.replace) — same crash contract as the
    bloom sidecar above."""
    import uuid

    final = _minmax_path(path, version)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    tmp = final + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump({"key": key, "files": index}, f)
    os.replace(tmp, final)


def _maintain_minmax(
    spark: SparkSession, path: str, key: str, version: int, files: list[str]
) -> int:
    """Min/max sidecar for ``version`` at O(new files) cost: entries for
    files present in the parent's sidecar are carried (per-file stats
    are immutable), only files new to this version are scanned. Returns
    indexed file count; 0 (and no sidecar) when the key type doesn't
    support exact JSON round-tripping — readers degrade to
    no-range-pruning, never to wrong results."""
    from ssidentity_spark.operators.fileindex import build_minmax_index

    parent: dict[str, list] = {}
    if version > 0:
        prev = _minmax_path(path, version - 1)
        if os.path.exists(prev):
            try:
                with open(prev) as f:
                    pidx = json.load(f)
                if pidx.get("key") == key:
                    parent = pidx["files"]
            except (json.JSONDecodeError, OSError):
                parent = {}
    carried = {rel: parent[rel] for rel in files if rel in parent}
    new_files = [rel for rel in files if rel not in carried]
    try:
        new_index = (
            build_minmax_index(
                spark, path, key, files=new_files, write_sidecar=False
            )
            if new_files
            else {}
        )
    except TypeError:
        # float/other key: minmax sidecar unsupported (JSON ordering
        # semantics) — bloom index still works, range scans read all
        return 0
    index = {**carried, **new_index}
    _write_minmax_sidecar(path, version, key, index)
    return len(index)


def write_managed(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    cluster_key: str,
    mode: str = "append",
    n_files: int = 16,
    m_bits: int = INDEX_M_BITS,
) -> int:
    """Cluster → commit → index, returning the committed version."""
    clustered = df.repartitionByRange(n_files, cluster_key).sortWithinPartitions(
        cluster_key
    )
    version = write_versioned(clustered, path, mode)
    files = _read_manifest(path, version)["files"]
    # INCREMENTAL index: the parent version's per-file bitmaps are
    # immutable — reuse them and scan only the files this commit added,
    # so an append costs O(delta) index I/O, not O(table)
    parent_index: dict[str, list[int]] = {}
    if mode == "append" and version > 0:
        prev_sidecar = _index_path(path, version - 1)
        if os.path.exists(prev_sidecar):
            with open(prev_sidecar) as f:
                prev = json.load(f)
            if prev["key"] == cluster_key and prev["m_bits"] == m_bits:
                parent_index = prev["files"]
    new_files = [f for f in files if f not in parent_index]
    new_index = (
        build_bloom_index(
            spark,
            path,
            cluster_key,
            m_bits=m_bits,
            files=new_files,
            write_sidecar=False,
        )
        if new_files
        else {}
    )
    index = {rel: parent_index[rel] for rel in files if rel in parent_index}
    index.update(new_index)
    _write_sidecar(path, version, cluster_key, m_bits, index)
    _maintain_minmax(spark, path, cluster_key, version, list(files))
    return version


def optimize_managed(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """OPTIMIZE the managed table: compact the tip's small parts
    PRESERVING the cluster layout, then rebuild the bloom sidecar for
    the new version — the composition `tablelog.optimize` alone can't
    do (a plain round-robin rewrite would destroy the range clustering
    the index's file-skipping depends on — measured 64× vs ~none,
    SCALE.md — and the compacted version would have no sidecar at all,
    silently degrading every point lookup to a full-manifest scan).

    The cluster key and index geometry come from the tip's sidecar
    (raises if the table has none — then it isn't a managed table and
    plain ``tablelog.optimize`` is the right tool). Returns optimize's
    stats plus ``{"indexed_files"}``."""
    tip = latest_version(path)
    if tip is None:
        raise FileNotFoundError(f"no committed version at {path}")
    sidecar = _index_path(path, tip)
    if not os.path.exists(sidecar):
        raise FileNotFoundError(
            f"no bloom sidecar for tip version {tip} at {path} — not a "
            "managed table (use tablelog.optimize for unindexed tables)"
        )
    with open(sidecar) as f:
        idx = json.load(f)
    key, m_bits = idx["key"], idx["m_bits"]

    from ssidentity_spark.operators.tablelog import optimize

    stats = optimize(
        spark,
        path,
        target_rows_per_file=target_rows_per_file,
        repartition_fn=lambda df, n: df.repartitionByRange(
            n, key
        ).sortWithinPartitions(key),
    )
    version = stats["version"]
    files = _read_manifest(path, version)["files"]
    index = build_bloom_index(
        spark, path, key, m_bits=m_bits, files=files, write_sidecar=False
    )
    _write_sidecar(path, version, key, m_bits, index)
    _maintain_minmax(spark, path, key, version, list(files))
    return {**stats, "indexed_files": len(index)}


def delete_managed(spark: SparkSession, path: str, predicate: str) -> dict:
    """Row-level DELETE on the managed table: copy-on-write delete via
    :func:`tablelog.delete_where`, then the sidecar maintenance the log
    layer can't do — a bloom index for the new version so point lookups
    against the post-delete tip keep their file-skipping.

    Index cost is O(rewritten files): kept files' bitmaps are immutable
    and carried from the parent sidecar (the same incremental contract as
    ``write_managed``); only the rewritten survivor parts are scanned.
    A delete pruned down to few files by a cluster-key-aligned predicate
    therefore pays index I/O proportional to what it touched, not to the
    table. Kept-file bitmaps stay exact; rewritten files get FRESH
    bitmaps, so deleted keys stop passing the index for those files
    (a deleted key may still bloom-pass into a kept file it never
    occupied — a false positive the lookup's data read resolves, never a
    correctness issue).

    Returns delete_where's stats plus ``{"indexed_files"}``. A delete
    that matched nothing commits no version and rebuilds nothing."""
    tip = latest_version(path)
    if tip is None:
        raise FileNotFoundError(f"no committed version at {path}")
    sidecar = _index_path(path, tip)
    if not os.path.exists(sidecar):
        raise FileNotFoundError(
            f"no bloom sidecar for tip version {tip} at {path} — not a "
            "managed table (use tablelog.delete_where for unindexed tables)"
        )
    with open(sidecar) as f:
        idx = json.load(f)
    key, m_bits = idx["key"], idx["m_bits"]

    from ssidentity_spark.operators.tablelog import delete_where

    stats = delete_where(spark, path, predicate)
    if stats["version"] == tip:  # no-op delete: no new version, no index
        return {**stats, "indexed_files": len(idx["files"])}
    n = _reindex_incremental(spark, path, idx, key, m_bits, stats["version"])
    return {**stats, "indexed_files": n}


def _reindex_incremental(
    spark: SparkSession, path: str, parent_idx: dict, key: str,
    m_bits: int, version: int,
) -> int:
    """Sidecar for ``version`` at O(rewritten files) cost: files carried
    from the parent keep their (immutable) bitmaps; only files new to
    this version are scanned."""
    files = _read_manifest(path, version)["files"]
    carried = {
        rel: parent_idx["files"][rel]
        for rel in files
        if rel in parent_idx["files"]
    }
    new_files = [rel for rel in files if rel not in carried]
    new_index = (
        build_bloom_index(
            spark, path, key, m_bits=m_bits, files=new_files, write_sidecar=False
        )
        if new_files
        else {}
    )
    index = {**carried, **new_index}
    _write_sidecar(path, version, key, m_bits, index)
    _maintain_minmax(spark, path, key, version, files)
    return len(index)


def update_managed(
    spark: SparkSession, path: str, predicate: str, assignments: dict[str, str]
) -> dict:
    """Row-level UPDATE on the managed table: copy-on-write update via
    :func:`tablelog.update_where`, then an incremental bloom sidecar for
    the new version (same contract as :func:`delete_managed` — kept
    files' bitmaps carry over, only rewritten parts are scanned). Note
    an update that REWRITES the cluster-key column itself still yields a
    correct index (fresh bitmaps for rewritten files), but the range
    CLUSTERING of those files degrades — re-cluster with
    :func:`optimize_managed` if the key is updated in bulk."""
    tip = latest_version(path)
    if tip is None:
        raise FileNotFoundError(f"no committed version at {path}")
    sidecar = _index_path(path, tip)
    if not os.path.exists(sidecar):
        raise FileNotFoundError(
            f"no bloom sidecar for tip version {tip} at {path} — not a "
            "managed table (use tablelog.update_where for unindexed tables)"
        )
    with open(sidecar) as f:
        idx = json.load(f)
    key, m_bits = idx["key"], idx["m_bits"]

    from ssidentity_spark.operators.tablelog import update_where

    stats = update_where(spark, path, predicate, assignments)
    if stats["version"] == tip:  # no-op update
        return {**stats, "indexed_files": len(idx["files"])}
    n = _reindex_incremental(spark, path, idx, key, m_bits, stats["version"])
    return {**stats, "indexed_files": n}


def merge_managed(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    assignments: dict[str, str],
    delete_when: str | None = None,
    change_key: str | None = None,
) -> dict:
    """File-pruned MERGE on the managed table: :func:`tablelog.merge_into`
    (upsert a changelog rewriting only key-overlapping files), then the
    incremental bloom + min/max sidecars for the new version — the same
    O(rewritten files) reindex contract as delete/update. Note the merge
    key need not be the cluster key; pruning locality follows how well
    the CHANGELOG's keys align with the cluster layout."""
    tip = latest_version(path)
    if tip is None:
        raise FileNotFoundError(f"no committed version at {path}")
    sidecar = _index_path(path, tip)
    if not os.path.exists(sidecar):
        raise FileNotFoundError(
            f"no bloom sidecar for tip version {tip} at {path} — not a "
            "managed table (use tablelog.merge_into for unindexed tables)"
        )
    with open(sidecar) as f:
        idx = json.load(f)
    ikey, m_bits = idx["key"], idx["m_bits"]

    from ssidentity_spark.operators.tablelog import merge_into

    stats = merge_into(
        spark,
        path,
        changes,
        key,
        assignments,
        delete_when=delete_when,
        change_key=change_key,
    )
    if stats["version"] == tip:  # no-op merge
        return {**stats, "indexed_files": len(idx["files"])}
    n = _reindex_incremental(spark, path, idx, ikey, m_bits, stats["version"])
    return {**stats, "indexed_files": n}


def managed_point_lookup(
    spark: SparkSession,
    path: str,
    value,
    version: int | None = None,
) -> tuple[DataFrame, int, int]:
    """→ (rows with key = value in the pinned snapshot, files read,
    files in snapshot). Identical to filtering a full snapshot read —
    the index only removes files that provably cannot match."""
    v = latest_version(path) if version is None else version
    m = _read_manifest(path, v)
    if m.get("dv_files"):
        raise ValueError(
            f"version {v} at {path} carries merge-on-read deletion "
            "vectors — the indexed point lookup reads data files "
            "directly and would resurrect deleted rows. Run "
            "optimize_managed to materialize the deletes, or read via "
            "tablelog.read_versioned (which applies DVs)."
        )
    manifest_files = set(m["files"])
    with open(_index_path(path, v)) as f:
        idx = json.load(f)
    key = idx["key"]
    survivors = bloom_survivors(idx, value, restrict=manifest_files)
    if not survivors:
        empty = (
            spark.read.parquet(*[os.path.join(path, f) for f in manifest_files])
            .where(F.col(key) == F.lit(value))
            .limit(0)
        )
        return empty, 0, len(manifest_files)
    df = spark.read.parquet(
        *[os.path.join(path, f) for f in sorted(survivors)]
    ).where(F.col(key) == F.lit(value))
    return df, len(survivors), len(manifest_files)


def vacuum_managed(
    path: str, keep_latest: int = 1, min_orphan_age_s: float = 3600.0
) -> dict[str, list[str]]:
    """Vacuum the managed table: drop old snapshots via the transaction
    log's vacuum, then the maintenance the log layer can't do itself —
    delete index sidecars of dropped versions and any staged data file
    referenced by NO retained manifest (crashed/aborted writers leave
    these; they are invisible to readers but accumulate bytes).

    ``min_orphan_age_s`` is the concurrency guard: a LIVE writer's
    freshly staged files are also unreferenced until its commit lands,
    so only orphans older than the retention age are deleted — the same
    race every lakehouse vacuum handles with a retention period."""
    import time

    from ssidentity_spark.operators.tablelog import _versions, vacuum

    deleted_data = vacuum(path, keep_latest=keep_latest)
    retained = set(_versions(path))

    dropped_sidecars: list[str] = []
    index_dir = os.path.join(path, "_index")
    if os.path.isdir(index_dir):
        for name in os.listdir(index_dir):
            if name.startswith("bloom-v") and name.endswith(".json"):
                v = int(name[len("bloom-v"):-len(".json")])
                if v not in retained:
                    os.remove(os.path.join(index_dir, name))
                    dropped_sidecars.append(name)

    referenced: set[str] = set()
    referenced_dirs: set[str] = set()
    for v in retained:
        m = _read_manifest(path, v)
        referenced.update(m["files"])
        for key in ("change_file", "change_file_pre", "change_file_post"):
            if m.get(key):
                referenced.add(m[key])
                # change sets are directories too (distributed writes)
                referenced_dirs.add(m[key])
        # deletion-vector entries are DIRECTORIES of parquet parts —
        # everything under a referenced dir is alive
        referenced_dirs.update(m.get("dv_files", []))
    orphans: list[str] = []
    cutoff = time.time() - min_orphan_age_s
    # _changes/_dv hold DML versions' recorded facts; a losing racer's
    # attempt-unique file/dir is unreferenced by any manifest and ages
    # into this sweep like any other orphan
    for sub in ("data", "_changes", "_dv"):
        for dirpath, _dirs, names in os.walk(os.path.join(path, sub)):
            for name in names:
                full = os.path.join(dirpath, name)
                rel = os.path.relpath(full, path)
                in_live_dir = any(
                    rel.startswith(d.rstrip("/") + "/")
                    for d in referenced_dirs
                )
                if (
                    rel not in referenced
                    and not in_live_dir
                    and os.path.getmtime(full) <= cutoff
                ):
                    os.remove(full)
                    orphans.append(rel)
        # second pass, bottom-up: losing racers' now-empty attempt
        # directories would otherwise accumulate forever (and be
        # re-walked by every future vacuum). The SAME age cutoff as the
        # file sweep (ADVICE r7): a concurrent writer's just-created,
        # momentarily-empty staging/change/DV attempt dir must not be
        # rmdir'd mid-write — the attempt-unique-dir design explicitly
        # supports that writer, and racing its first part write would
        # fail its job.
        for dirpath, _dirs, names in os.walk(
            os.path.join(path, sub), topdown=False
        ):
            rel = os.path.relpath(dirpath, path)
            if (
                rel not in (sub, ".")
                and rel not in referenced_dirs
                and not os.listdir(dirpath)
                and os.path.getmtime(dirpath) <= cutoff
            ):
                os.rmdir(dirpath)
    return {
        "data": sorted(deleted_data),
        "sidecars": sorted(dropped_sidecars),
        "orphans": sorted(orphans),
    }
