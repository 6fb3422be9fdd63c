"""Snapshot-versioned parquet tables: a minimal transaction log.

The reference's sink is a single append-only SQLite table
(ssidentity.c:102-113); at warehouse scale the equivalent needs three
things plain parquet directories don't give: ATOMIC commits (a crashed
writer must leave no half-visible data), SNAPSHOT ISOLATION (readers see
one consistent version even while writers land), and TIME TRAVEL
(reproduce yesterday's training set exactly — the reproducibility
property every corpus pipeline here assumes). This module is the
lakehouse transaction-log design (as published for Delta Lake / Iceberg)
in miniature:

- data files are immutable parquet parts under ``data/``, written FIRST;
  a file not referenced by a committed manifest is invisible, so a crash
  mid-write leaves garbage bytes, never a wrong query answer;
- each commit is one JSON manifest ``_log/v%08d.json`` holding the FULL
  file list of that snapshot (simple over incremental: at manifest sizes
  up to ~10^5 files the full list is kilobytes; past that, Iceberg-style
  manifest trees are the documented upgrade path);
- the commit itself is ``open(..., 'x')`` — atomic create-exclusive — so
  two writers racing for the same version number cannot both win:
  optimistic concurrency exactly as the public lakehouse designs do it
  (the loser re-reads the new tip and retries);
- readers resolve the tip (or any pinned version) and load exactly that
  file list — snapshot isolation with zero locks;
- ``vacuum`` deletes data files referenced by NO retained manifest.

Driver traffic is manifest-sized; data moves only through executors.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"
_DATA = "data"


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"v{version:08d}.json")


def _versions(path: str) -> list[int]:
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        # strict match: a stray file in _log/ (editor artifact, tool
        # droppings) must be ignored, not crash every reader with a
        # ValueError from int(). \d{8,}, not \d{8}: _manifest_path's
        # zero-pad WIDENS past version 99,999,999 (a per-micro-batch
        # sink can get there), and a fixed-width pattern would make
        # that committed version invisible — latest_version sticks,
        # the next writer re-attempts it, and the log wedges in
        # perpetual VersionConflict (ADVICE r7). The numeric sort
        # below handles wider names.
        if re.fullmatch(r"v\d{8,}\.json", name):
            out.append(int(name[1:-5]))
    return sorted(out)


def latest_version(path: str) -> int | None:
    vs = _versions(path)
    return vs[-1] if vs else None


def _read_manifest(path: str, version: int) -> dict:
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


class VersionConflict(Exception):
    """Another writer committed this version first — re-read the tip and
    retry (optimistic concurrency's contract)."""


_CORE_MANIFEST_KEYS = ("version", "operation", "files", "parent")


def _attempt_tag() -> str:
    """pid + uuid: staging/change/DV paths must be unique across
    PROCESSES and THREADS — two foreachBatch sinks in one driver racing
    the same version would otherwise collide on a pid-only name."""
    return f"{os.getpid()}-{uuid.uuid4().hex[:8]}"


def _commit(
    path: str,
    version: int,
    files: list[str],
    operation: str,
    meta: dict | None = None,
) -> None:
    clobber = [k for k in (meta or {}) if k in _CORE_MANIFEST_KEYS]
    if clobber:
        # meta is a public passthrough (write_versioned/commit_files) —
        # letting it overwrite the core commit record would falsify the
        # file list or history chain silently
        raise ValueError(
            f"meta must not override core manifest keys {clobber}"
        )
    os.makedirs(_log_dir(path), exist_ok=True)
    manifest = {
        "version": version,
        "operation": operation,
        "files": sorted(files),
        "parent": version - 1 if version > 0 else None,
        **(meta or {}),
    }
    if "constraints" not in manifest and version > 0:
        # CHECK constraints ride EVERY manifest once the table has ever
        # declared any (like the batch ledger): vacuum drops old
        # manifests, so a walk-back-only record could be reclaimed — or
        # worse, a dropped constraint could RESURRECT when the post-drop
        # {} manifest is vacuumed and an older one resurfaces
        rec = _constraints_record(path)
        if rec is not None:
            manifest["constraints"] = dict(rec)
    # crash-atomic AND exclusive: the manifest is fully written to a tmp
    # file first, then os.link() publishes it — link is atomic and fails
    # with FileExistsError if v{N} exists, so a crash mid-write leaves
    # only an invisible tmp (never a truncated manifest that would wedge
    # latest_version), and exactly one racing writer can publish v{N}.
    # The tmp name carries a uuid, not just the pid: two THREADS in one
    # driver (two foreachBatch sinks, retry loops) racing the same
    # version must not share — and truncate — each other's tmp bytes.
    tmp = (
        _manifest_path(path, version)
        + f".tmp-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    )
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, _manifest_path(path, version))
    except FileExistsError as e:
        raise VersionConflict(
            f"version {version} already committed at {path}"
        ) from e
    finally:
        os.unlink(tmp)
    # durability needs the DIRECTORY entry on disk too, not only the
    # file bytes: without this a power loss after the caller was told
    # "committed" can silently roll the log back one version
    dfd = os.open(_log_dir(path), os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _df_schema_spec(df: DataFrame) -> list[list[str]]:
    """(name, simpleString) pairs — the manifest's schema record."""
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


def check_schema_evolution(
    parent_schema: list | None, new_schema: list, mode: str
) -> None:
    """Additive-only evolution (the lakehouse mergeSchema contract):
    an APPEND may introduce new columns (old files read them as null)
    but must preserve every existing column's name and type — silently
    dropping or retyping a column under readers is the failure class
    this guards. OVERWRITE replaces the data, so it may replace the
    schema too."""
    if parent_schema is None or mode == "overwrite":
        return
    parent_cols = {n: t for n, t in parent_schema}
    new_cols = {n: t for n, t in new_schema}
    missing = [n for n in parent_cols if n not in new_cols]
    retyped = [
        f"{n}: {parent_cols[n]} -> {new_cols[n]}"
        for n in parent_cols
        if n in new_cols and new_cols[n] != parent_cols[n]
    ]
    if missing or retyped:
        raise ValueError(
            "append schema evolution is ADDITIVE only — existing columns "
            f"must keep their name and type (missing: {missing}, "
            f"retyped: {retyped}); use mode='overwrite' to replace the "
            "schema with the data"
        )


def write_versioned(
    df: DataFrame,
    path: str,
    mode: str = "append",
    max_retries: int = 5,
    meta: dict | None = None,
) -> int:
    """Write ``df`` as a new snapshot; returns the committed version.

    Data parts land under ``data/<staging>/`` first; only the manifest
    commit makes them visible. On a version race the data files are NOT
    rewritten — only the (cheap) manifest commit retries against the new
    parent, exactly the lost-update behaviour a log-structured table
    wants for blind appends.

    The manifest records the snapshot's schema; appends may ADD nullable
    columns (additive evolution — old parts read the new columns as
    null via mergeSchema) but never drop or retype existing ones
    (:func:`check_schema_evolution`)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    parent = latest_version(path)
    if parent is not None:
        # fast-fail before staging data; the authoritative (race-proof)
        # check re-runs inside commit_files against the commit-time parent
        check_schema_evolution(
            _read_manifest(path, parent).get("schema"), _df_schema_spec(df), mode
        )
    attempt_version = 0 if parent is None else parent + 1
    stage = os.path.join(path, _DATA, f"s{attempt_version:08d}-{_attempt_tag()}")
    df.write.mode("error").parquet(stage)
    new_files = [
        os.path.relpath(os.path.join(stage, n), path)
        for n in os.listdir(stage)
        if n.endswith(".parquet")
    ]
    # CHECK constraints: validated DISTRIBUTED here — one Spark aggregate
    # over the staged files computes every rule's violation count in
    # parallel (a terabyte append must never funnel through a single-node
    # scan; VERDICT r9). Reading the staged parquet back — rather than
    # re-evaluating ``df`` — costs one columnar scan of the delta and
    # never recomputes the caller's upstream plan. The validated record
    # is handed to commit_files, whose single-scan DuckDB fallback then
    # only ever fires for executor-staged Data Source commits or for a
    # constraint added concurrently mid-commit (the TOCTOU re-check).
    cons = table_constraints(path)
    if cons and new_files:
        staged_df = df.sparkSession.read.parquet(
            *[os.path.join(path, f) for f in new_files]
        )
        # context names THIS layer (ADVICE r10): the distributed check runs
        # in write_versioned before commit_files — a failure here never
        # reached the manifest commit, and the message must say so
        check_constraints(staged_df, cons, f"write_versioned at {path}")
    return commit_files(
        path,
        new_files,
        mode,
        meta=meta,
        max_retries=max_retries,
        schema=_df_schema_spec(df),
        validated_constraints=cons or None,
    )


def read_versioned(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Load a pinned snapshot (default: the tip). The manifest's file
    list IS the isolation boundary — concurrent commits cannot change
    what this DataFrame reads."""
    v = latest_version(path) if version is None else version
    if v is None or not os.path.exists(_manifest_path(path, v)):
        raise FileNotFoundError(f"no committed version {version!r} at {path}")
    m = _read_manifest(path, v)
    files = m["files"]
    if not files:
        raise FileNotFoundError(f"version {v} at {path} is empty")
    if m.get("dv_files"):
        # merge-on-read: anti-join the snapshot's deletion vectors out
        # (the DV read path — see delete_where(mode='dv'))
        cols, type_of = _manifest_cols(spark, path, m, files)
        return _scan_with_positions(
            spark, path, m, files, cols, type_of
        ).drop("_f", "_p")
    # mergeSchema honours additive evolution: parts written before a
    # column existed read it as null; column order follows the
    # manifest's recorded schema when present
    df = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(path, f) for f in files]
    )
    if m.get("schema"):
        df = df.select(*[n for n, _t in m["schema"]])
    return df


def history(path: str) -> list[dict]:
    return [
        {k: m[k] for k in ("version", "operation", "parent")}
        | {"n_files": len(m["files"])}
        for m in (_read_manifest(path, v) for v in _versions(path))
    ]


def _owned(path: str, rel: str) -> bool:
    """True iff ``rel`` resolves INSIDE the table root. A shallow clone's
    manifest references the SOURCE table's files via ``../``-relative
    paths — maintenance on the clone (vacuum) must never delete bytes it
    does not own, or dropping an old clone version would destroy the
    source table underneath every other reader (the Delta shallow-clone
    ownership rule)."""
    root = os.path.realpath(path)
    target = os.path.realpath(os.path.join(path, rel))
    return target == root or target.startswith(root + os.sep)


def vacuum(path: str, keep_latest: int = 1, dry_run: bool = False) -> list[str]:
    """Delete data files referenced by NO retained manifest (and the
    dropped manifests, and dropped delete-versions' change files).
    Returns the deleted file paths. Readers of retained versions are
    unaffected — their file lists stay whole. Files OUTSIDE the table
    root (a shallow clone's borrowed source files) are never deleted —
    see :func:`_owned`.

    ``dry_run=True`` returns exactly what a real run WOULD delete
    without touching anything (Delta's ``VACUUM ... DRY RUN``) — the
    audit step before an irreversible retention sweep: at 100 TB,
    "how many bytes does dropping 30 versions reclaim, and is any of it
    borrowed?" must be answerable without committing to it."""
    import shutil as _shutil

    vs = _versions(path)
    if len(vs) <= keep_latest:
        return []
    keep, drop = vs[-keep_latest:], vs[:-keep_latest]
    referenced = set()
    referenced_dv = set()
    for v in keep:
        m = _read_manifest(path, v)
        referenced.update(m["files"])
        referenced_dv.update(m.get("dv_files", []))
    deleted = []
    for v in drop:
        m = _read_manifest(path, v)
        for f in m["files"]:
            if f not in referenced and _owned(path, f):
                full = os.path.join(path, f)
                if os.path.exists(full):
                    if not dry_run:
                        os.remove(full)
                    deleted.append(f)
        # a dropped DML version's change sets go with it — no retained
        # consumer can ask for its feed rows anymore (directories since
        # the distributed-write change; single files from before that)
        for key in (
            "change_file",
            "change_file_pre",
            "change_file_post",
            "change_file_insert",
        ):
            cf = m.get(key)
            if cf and not _owned(path, cf):
                continue
            full_cf = os.path.join(path, cf) if cf else None
            if cf and os.path.isdir(full_cf):
                if not dry_run:
                    _shutil.rmtree(full_cf, ignore_errors=True)
                deleted.append(cf)
            elif cf and os.path.exists(full_cf):
                if not dry_run:
                    os.remove(full_cf)
                deleted.append(cf)
        # deletion-vector dirs: the ledger is cumulative, so a retained
        # manifest may still reference a dropped version's DV — only
        # unreferenced ones go
        for dv in m.get("dv_files", []):
            if (
                dv not in referenced_dv
                and _owned(path, dv)
                and os.path.isdir(os.path.join(path, dv))
            ):
                if not dry_run:
                    _shutil.rmtree(os.path.join(path, dv), ignore_errors=True)
                deleted.append(dv)
        if not dry_run:
            os.remove(_manifest_path(path, v))
    return sorted(set(deleted))


def optimize(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
    repartition_fn=None,
) -> dict:
    """OPTIMIZE: rewrite the tip snapshot's (small) parts into
    ~``target_rows_per_file``-sized files and commit the result as a NEW
    version with ``operation='optimize'`` — read-identical by
    construction (same rows, different physical layout). The missing
    lakehouse maintenance op next to vacuum/MERGE/time-travel: streaming
    sinks land one part per micro-batch per task, and a 100 TB table
    tailed for a month becomes millions of KB-files whose footer reads
    dominate scan time; compaction is what keeps the manifest and the
    scan O(data), not O(commits).

    Semantics:

    - TIME TRAVEL is unaffected: prior manifests keep referencing the
      original parts (vacuum reclaims them only when those versions age
      out of retention — tested).
    - STREAMING readers skip optimize versions entirely (no data
      change — the Delta ``dataChange=false`` contract): re-emitting
      compacted files would duplicate every row downstream.
    - CONCURRENCY: unlike blind appends, optimize must NOT retry on a
      version race — a concurrent append's rows are absent from the
      compacted rewrite, so winning the retry would silently drop them.
      The commit is pinned to parent = the tip read at start; on
      :class:`VersionConflict` the staged files are deleted and the
      conflict re-raised (the maintenance job just runs again later).

    Returns ``{"version", "rows", "files_before", "files_after"}``.
    """
    tip = latest_version(path)
    if tip is None:
        raise FileNotFoundError(f"no committed version at {path}")
    tip_m = _read_manifest(path, tip)
    files = tip_m["files"]
    if not files:
        raise FileNotFoundError(f"version {tip} at {path} is empty")
    # mergeSchema: compaction REWRITES pre-evolution parts into the
    # current unified schema (nulls materialized) — optimize doubles as
    # the schema-migration job, exactly as in the production lakehouses.
    # Deletion vectors are MATERIALIZED here too: the rewrite reads
    # through the DV-filtered path, so the compacted version physically
    # drops the merge-on-read deleted rows and clears the DV ledger —
    # the read-cost debt dv-mode deletes accumulate is paid off exactly
    # once, in the maintenance job.
    if tip_m.get("dv_files"):
        cols, type_of = _manifest_cols(spark, path, tip_m, files)
        df = _scan_with_positions(
            spark, path, tip_m, files, cols, type_of
        ).drop("_f", "_p")
    else:
        df = spark.read.option("mergeSchema", "true").parquet(
            *[os.path.join(path, f) for f in files]
        )
        if tip_m.get("schema"):
            df = df.select(*[n for n, _t in tip_m["schema"]])
    n = df.count()
    n_files = max(1, (n + target_rows_per_file - 1) // target_rows_per_file)
    stage = os.path.join(path, _DATA, f"optimize-{tip + 1:08d}-{_attempt_tag()}")
    # repartition_fn(df, n_files) lets layout-aware callers keep their
    # physical order through the rewrite (managed tables pass a
    # range-cluster-by-key partitioner so compaction never degrades the
    # bloom/zorder pruning the layout was built for); the default is a
    # plain round-robin repartition
    reshaped = (
        repartition_fn(df, n_files) if repartition_fn else df.repartition(n_files)
    )
    reshaped.write.mode("error").parquet(stage)
    new_files = sorted(
        os.path.relpath(os.path.join(stage, name), path)
        for name in os.listdir(stage)
        if name.endswith(".parquet")
    )
    # carry the cumulative stream-batch ledger and the recorded schema
    # forward like every commit
    meta = {"batch_ids": [str(b) for b in tip_m.get("batch_ids", [])]}
    if tip_m.get("schema"):
        meta["schema"] = tip_m["schema"]
    try:
        _commit(path, tip + 1, new_files, "optimize", meta=meta)
    except VersionConflict:
        # the whole staging directory is this attempt's private output —
        # remove it tree-wise so a lost race leaves no _SUCCESS/.crc
        # markers (or empty dirs) behind for vacuum to trip over
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        raise
    return {
        "version": tip + 1,
        "rows": n,
        "files_before": len(files),
        "files_after": len(new_files),
    }


def _manifest_cols(spark, path, m, files) -> tuple[list[str], dict]:
    """(column order, name→simpleString) for a snapshot. From the
    manifest's recorded schema when present — ZERO file I/O on the
    common path — else inferred once via a mergeSchema reader (which
    reads every file's footer; the price of a schema-less legacy log)."""
    if m.get("schema"):
        return [n for n, _t in m["schema"]], dict(m["schema"])
    raw = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(path, f) for f in files]
    )
    return (
        list(raw.columns),
        {f.name: f.dataType.simpleString() for f in raw.schema.fields},
    )


def _dv_positions(spark, path: str, dv_files: list[str]):
    """Union of deletion-vector position sets: (f rel-path, pos)."""
    return spark.read.parquet(
        *[os.path.join(path, d) for d in dv_files]
    ).select("f", "pos")


def _scan_with_positions(spark, path, manifest, files, cols, type_of):
    """The ONE physical read every DML and DV-aware snapshot read goes
    through: the given files, padded to the manifest schema, each row
    carrying its (``_f`` = manifest-relative file path, ``_p`` = row
    position) — with rows already removed by the manifest's deletion
    vectors FILTERED OUT (left_anti on (_f, _p)). DV entries referencing
    files outside ``files`` are inert, so subset scans are safe."""
    from pyspark.sql import functions as F

    clash = [c for c in cols if c in ("_f", "_p", "__mt_base", "__mt_rel")]
    if clash:
        raise ValueError(
            f"table at {path} has column(s) {clash} that collide with "
            "the DV scan's internal columns — rename them "
            "(leading-underscore names are reserved, like Delta's)"
        )
    raw = spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(path, f) for f in files]
    )
    # _metadata.file_path is a URI (scheme slash count varies, and path
    # characters like spaces arrive percent-ENCODED) — deriving the
    # manifest-relative path by string surgery on it is fragile. Part
    # BASENAMES are task-unique ASCII (Spark's part-<task>-<uuid> naming)
    # and never percent-encoded, so map basename → manifest rel path via
    # a broadcast join against the (file-count-sized) manifest list.
    base_map = [(os.path.basename(f), f) for f in files]
    if len({b for b, _ in base_map}) != len(base_map):
        raise RuntimeError(
            f"duplicate part basenames in manifest at {path} — cannot "
            "attribute row positions to files"
        )
    mdf = spark.createDataFrame(
        base_map, "__mt_base string, __mt_rel string"
    )
    raw2 = raw.select(
        *[
            F.col(c) if c in raw.columns
            else F.lit(None).cast(type_of[c]).alias(c)
            for c in cols
        ],
        F.element_at(
            F.split(F.col("_metadata.file_path"), "/"), -1
        ).alias("__mt_base"),
        F.col("_metadata.row_index").alias("_p"),
    )
    df = (
        raw2.join(F.broadcast(mdf), "__mt_base")
        .drop("__mt_base")
        .withColumnRenamed("__mt_rel", "_f")
    )
    dvs = manifest.get("dv_files") or []
    if dvs:
        dv = _dv_positions(spark, path, dvs)
        df = df.join(
            dv,
            (df["_f"] == dv["f"]) & (df["_p"] == dv["pos"]),
            "left_anti",
        )
    return df


def _require_deterministic(scan, sql_exprs: list[str], context: str) -> None:
    """DML predicates/assignments are re-evaluated across SEVERAL
    independent jobs (hit pass, rewrite, change files) — a
    non-deterministic expression (rand(), uuid(), shuffle(), ...) would
    commit data that silently disagrees with the recorded change feed.
    Reject up front via the analyzer's own deterministic flag, as the
    production lakehouses do. (Limitation: current_timestamp() carries
    deterministic=true — it is per-QUERY constant — yet still varies
    across this module's jobs; precompute time into a column.)"""
    from pyspark.sql import functions as F

    probe = scan.limit(0).select(
        *[F.expr(e).alias(f"__det{i}") for i, e in enumerate(sql_exprs)]
    )
    try:
        exprs = probe._jdf.queryExecution().analyzed().expressions()
        bad = [
            sql_exprs[i]
            for i in range(exprs.length())
            if not exprs.apply(i).deterministic()
        ]
    except Exception:  # introspection failure must not block valid DML
        return
    if bad:
        raise ValueError(
            f"{context} uses non-deterministic expression(s) {bad} — "
            "DML evaluates expressions in multiple independent jobs, so "
            "the committed data and the change feed would disagree; "
            "precompute the value into a column first"
        )


def _dml_hit_files(scan, pred) -> dict[str, int]:
    """ONE distributed pass over a position-carrying scan: which files
    contain LIVE rows where ``pred`` is TRUE, and how many each. The
    collect is file-count-bounded (manifest-sized driver traffic).
    NULL-predicate rows are not matches — filter() drops them, the ANSI
    DML contract."""
    rows = scan.filter(pred).groupBy("_f").count().collect()
    return {r["_f"]: r["count"] for r in rows}


def _write_change_file(df, path: str, next_v: int, tag: str = "") -> str:
    """Record change rows under ``_changes/`` as a DISTRIBUTED parquet
    directory with an ATTEMPT-unique name (pid suffix): the atomic
    manifest commit is what binds version → change set, so a racing
    DML's losing directory is never visible (an orphan for vacuum's
    sweep). A directory, not a coalesce(1) file, because a change set is
    O(changed rows) — a retention sweep deleting 30% of a 100 TB table
    must not funnel terabytes through one task."""
    change_rel = os.path.join(
        "_changes", f"v{next_v:08d}{tag}-{_attempt_tag()}"
    )
    df.write.mode("error").parquet(os.path.join(path, change_rel))
    return change_rel


def update_where(
    spark: SparkSession,
    path: str,
    predicate: str,
    assignments: dict[str, str],
) -> dict:
    """Row-level UPDATE as a copy-on-write commit: for every row where
    ``predicate`` is TRUE, replace each ``assignments`` column with its
    SQL expression (ALL expressions evaluate against the PREIMAGE row —
    standard UPDATE semantics, so ``{"a": "b", "b": "a"}`` swaps);
    FALSE-or-NULL rows pass through byte-identical. The third DML verb
    next to MERGE and DELETE, sharing their machinery:

    - one ``_metadata.file_path`` pass finds the hit files; untouched
      files carry into the new version BY REFERENCE;
    - assignment results are CAST to the column's manifest type — an
      UPDATE can never silently retype a column under readers;
    - PRE- and POST-image rows are recorded as two change files (the
      Delta CDF shape), so the change feed emits exact
      ``update_preimage`` / ``update_postimage`` rows without
      re-evaluating anything;
    - pinned-parent commit: a version race aborts (staged data and
      change files removed) rather than dropping a concurrent append;
    - a no-match update commits nothing.

    Returns ``{"version", "rows_updated", "files_kept",
    "files_rewritten", "files_after"}``.
    """
    from pyspark.sql import functions as F

    tip = latest_version(path)
    if tip is None:
        raise FileNotFoundError(f"no committed version at {path}")
    tip_m = _read_manifest(path, tip)
    files = tip_m["files"]
    if not files:
        return {
            "version": tip,
            "rows_updated": 0,
            "files_kept": 0,
            "files_rewritten": 0,
            "files_after": 0,
        }
    cols, type_of = _manifest_cols(spark, path, tip_m, files)
    bad = [c for c in assignments if c not in cols]
    if bad:
        raise ValueError(f"UPDATE of unknown column(s) {bad} at {path}")
    pred = F.expr(predicate)
    scan = _scan_with_positions(spark, path, tip_m, files, cols, type_of)
    _require_deterministic(
        scan, [predicate, *assignments.values()], "UPDATE"
    )
    hit_rel = _dml_hit_files(scan, pred)
    rows_updated = sum(hit_rel.values())
    if not hit_rel:
        return {
            "version": tip,
            "rows_updated": 0,
            "files_kept": len(files),
            "files_rewritten": 0,
            "files_after": len(files),
        }
    kept = [f for f in files if f not in hit_rel]
    # src backs THREE write jobs (rewritten parts, pre images, post
    # images) — persist so the hit files are scanned once, not per
    # consumer (the same fix dv-mode delete carries for its double scan)
    src = _scan_with_positions(
        spark, path, tip_m, sorted(hit_rel), cols, type_of
    ).drop("_f", "_p").persist()
    matched = F.coalesce(pred, F.lit(False))

    def post_col(c):
        if c in assignments:
            return F.when(
                matched, F.expr(assignments[c]).cast(type_of[c])
            ).otherwise(F.col(c)).alias(c)
        return F.col(c)

    # ONE select computes every assignment from the preimage row
    rewritten = src.select(*[post_col(c) for c in cols])
    pre = src.filter(matched)
    post = pre.select(
        *[
            F.expr(assignments[c]).cast(type_of[c]).alias(c)
            if c in assignments
            else F.col(c)
            for c in cols
        ]
    )
    change_pre = _write_change_file(pre, path, tip + 1, tag="-pre")
    change_post = _write_change_file(post, path, tip + 1, tag="-post")
    # the SET expressions can introduce constraint violations — check
    # the rewritten rows (hit files only) before anything is staged
    check_constraints(
        rewritten, table_constraints(path), f"update_where at {path}"
    )
    stage = os.path.join(path, _DATA, f"update-{tip + 1:08d}-{_attempt_tag()}")
    rewritten.write.mode("error").parquet(stage)
    src.unpersist()
    new_files = sorted(
        os.path.relpath(os.path.join(stage, n), path)
        for n in os.listdir(stage)
        if n.endswith(".parquet")
    )
    meta: dict = {
        "batch_ids": [str(b) for b in tip_m.get("batch_ids", [])],
        "predicate": predicate,
        "assignments": dict(assignments),
        "rows_updated": rows_updated,
        "change_file_pre": change_pre,
        "change_file_post": change_post,
    }
    if tip_m.get("dv_files"):
        # kept files' deletion vectors still apply; entries for the
        # rewritten (replaced) files are inert — their rel paths left
        # the manifest
        meta["dv_files"] = tip_m["dv_files"]
    if tip_m.get("schema"):
        meta["schema"] = tip_m["schema"]
    try:
        _commit(path, tip + 1, kept + new_files, "update", meta=meta)
    except VersionConflict:
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        for rel in (change_pre, change_post):
            shutil.rmtree(os.path.join(path, rel), ignore_errors=True)
        raise
    return {
        "version": tip + 1,
        "rows_updated": rows_updated,
        "files_kept": len(kept),
        "files_rewritten": len(hit_rel),
        "files_after": len(kept) + len(new_files),
    }


def delete_where(
    spark: SparkSession, path: str, predicate: str, mode: str = "cow"
) -> dict:
    """Row-level DELETE: remove every row where ``predicate`` (a SQL
    boolean expression) is TRUE, keep rows where it is FALSE **or NULL**
    (ANSI DELETE semantics), committed as a new version with
    ``operation='delete'``. The missing DML verb next to
    MERGE/OPTIMIZE/VACUUM/time-travel — what GDPR erasure and retention
    enforcement run on a production lakehouse.

    ``mode`` picks the physical strategy (the Delta/Iceberg-v2 pair):

    - ``"cow"`` (copy-on-write, default): files containing doomed rows
      are REWRITTEN without them. Write cost O(rows in hit files); read
      cost unchanged. Right when deletes are rare or large.
    - ``"dv"`` (merge-on-read deletion vectors): NO data file is
      rewritten — the doomed rows' (file, position) pairs land in a
      ``_dv/`` sidecar recorded on the manifest, and every subsequent
      read anti-joins them out. Write cost O(matched rows); read cost
      grows with accumulated DV size until ``optimize`` MATERIALIZES
      the deletes (applies DVs during its rewrite and clears the
      ledger). Right for frequent small deletes on huge files. Readers
      that cannot apply DVs (the managed point lookup, the data-source
      scan) reject DV-bearing snapshots loudly and name optimize as
      the way out.

    Both modes record the deleted rows themselves as a change file, so
    batch and streaming change feeds behave identically under either.

    Scale shape — the whole point of the file-level design:

    - ONE distributed pass computes per-file match counts via the
      ``_metadata.file_path`` column; the collect is file-count-bounded
      (manifest-sized driver traffic, same order as reading the manifest
      itself).
    - Files with NO matching rows are carried into the new version **by
      reference** — never read again, never rewritten. A predicate
      aligned with the cluster key touches O(matching files), not
      O(table); only files that provably contain doomed rows pay the
      rewrite.
    - TIME TRAVEL: prior versions keep referencing the original parts;
      vacuum reclaims them when those versions age out (same contract as
      optimize).
    - CONCURRENCY: like optimize, a delete must NOT retry on a version
      race — a concurrent append's rows are absent from the rewrite, so
      winning a blind retry would silently drop them. The commit is
      pinned to the tip read at start; on :class:`VersionConflict` the
      staged files are deleted and the conflict re-raised.
    - The manifest records the predicate and the deleted-row count: the
      predicate is the authoritative row-level definition of the change,
      which is what lets the change feed reconstruct the deleted rows
      exactly (``read_changes(include_deletes=True)``) without
      tombstone files.

    A delete that matches NOTHING commits no version (returns the
    current tip with ``rows_deleted=0``) — an empty commit would spam
    the history and wake every incremental consumer for nothing.

    Returns ``{"version", "rows_deleted", "files_kept", "files_rewritten",
    "files_after"}``.
    """
    from pyspark.sql import functions as F

    if mode not in ("cow", "dv"):
        raise ValueError(f"mode must be cow|dv, got {mode!r}")
    tip = latest_version(path)
    if tip is None:
        raise FileNotFoundError(f"no committed version at {path}")
    tip_m = _read_manifest(path, tip)
    files = tip_m["files"]
    if not files:
        return {
            "version": tip,
            "rows_deleted": 0,
            "files_kept": 0,
            "files_rewritten": 0,
            "files_after": 0,
        }
    pred = F.expr(predicate)
    cols, type_of = _manifest_cols(spark, path, tip_m, files)
    # pass 1: which files contain LIVE rows the predicate dooms?
    scan = _scan_with_positions(spark, path, tip_m, files, cols, type_of)
    _require_deterministic(scan, [predicate], "DELETE")
    hit_rel = _dml_hit_files(scan, pred)
    rows_deleted = sum(hit_rel.values())
    if not hit_rel:
        return {
            "version": tip,
            "rows_deleted": 0,
            "files_kept": len(files),
            "files_rewritten": 0,
            "files_after": len(files),
        }
    src = _scan_with_positions(
        spark, path, tip_m, sorted(hit_rel), cols, type_of
    )
    matched = F.coalesce(pred, F.lit(False))
    # CHANGE FILE (the Delta CDF design): record the deleted rows
    # themselves under _changes/ — O(deleted rows) extra write — so
    # change-feed consumers (batch AND streaming) read recorded facts
    # instead of re-evaluating the predicate at read time (a streaming
    # source cannot evaluate a SQL predicate string inside its Python
    # read path at all). Attempt-unique name, bound by the manifest
    # commit, vacuumed with its version (_write_change_file).
    doomed = src.filter(matched)
    if mode == "dv":
        # dv mode reads `doomed` TWICE (change file + position sidecar) —
        # persist so the hit files are scanned and the predicate
        # evaluated once, not per write (review: the double scan doubled
        # the dominant read cost on dv's target workload)
        doomed = doomed.persist()
    change_rel = _write_change_file(doomed.drop("_f", "_p"), path, tip + 1)

    if mode == "dv":
        # merge-on-read: record (file, position) of every doomed row;
        # data files untouched. The DV parquet is written DISTRIBUTED
        # (no coalesce — at scale a DV can be large); the attempt-unique
        # directory is bound by the manifest commit like change files.
        dv_rel = os.path.join(
            "_dv", f"v{tip + 1:08d}-{_attempt_tag()}"
        )
        doomed.select(
            F.col("_f").alias("f"), F.col("_p").alias("pos")
        ).write.mode("error").parquet(os.path.join(path, dv_rel))
        doomed.unpersist()
        meta = {
            "batch_ids": [str(b) for b in tip_m.get("batch_ids", [])],
            "predicate": predicate,
            "rows_deleted": rows_deleted,
            "change_file": change_rel,
            "delete_mode": "dv",
            "dv_files": list(tip_m.get("dv_files", [])) + [dv_rel],
        }
        if tip_m.get("schema"):
            meta["schema"] = tip_m["schema"]
        try:
            _commit(path, tip + 1, list(files), "delete", meta=meta)
        except VersionConflict:
            import shutil

            shutil.rmtree(os.path.join(path, dv_rel), ignore_errors=True)
            # the change set is a DIRECTORY (distributed write) — rmtree,
            # not os.remove, or the cleanup itself raises and masks the
            # VersionConflict the caller's abort contract depends on
            shutil.rmtree(
                os.path.join(path, change_rel), ignore_errors=True
            )
            raise
        return {
            "version": tip + 1,
            "rows_deleted": rows_deleted,
            "files_kept": len(files),
            "files_rewritten": 0,
            "files_after": len(files),
        }

    kept = [f for f in files if f not in hit_rel]
    # pass 2 (cow): rewrite ONLY the hit files, keeping FALSE-or-NULL rows
    survivors = src.filter(~matched).drop("_f", "_p")
    stage = os.path.join(path, _DATA, f"delete-{tip + 1:08d}-{_attempt_tag()}")
    if not kept:
        # every file is being rewritten: if the predicate doomed the whole
        # table the rewrite may stage zero parts, and a files=[] tip is
        # unreadable — pin one (possibly empty) part so the empty table
        # reads back as empty (same contract as the empty-overwrite fix)
        survivors = survivors.coalesce(1)
    survivors.write.mode("error").parquet(stage)
    new_files = sorted(
        os.path.relpath(os.path.join(stage, n), path)
        for n in os.listdir(stage)
        if n.endswith(".parquet")
    )
    meta = {
        "batch_ids": [str(b) for b in tip_m.get("batch_ids", [])],
        "predicate": predicate,
        "rows_deleted": rows_deleted,
        "change_file": change_rel,
    }
    if tip_m.get("dv_files"):
        # kept files' DVs still apply; rewritten files' entries are inert
        meta["dv_files"] = tip_m["dv_files"]
    if tip_m.get("schema"):
        meta["schema"] = tip_m["schema"]
    try:
        _commit(path, tip + 1, kept + new_files, "delete", meta=meta)
    except VersionConflict:
        import shutil

        shutil.rmtree(stage, ignore_errors=True)
        shutil.rmtree(os.path.join(path, change_rel), ignore_errors=True)
        raise
    return {
        "version": tip + 1,
        "rows_deleted": rows_deleted,
        "files_kept": len(kept),
        "files_rewritten": len(hit_rel),
        "files_after": len(kept) + len(new_files),
    }


def merge_into(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    assignments: dict[str, str],
    delete_when: str | None = None,
    change_key: str | None = None,
) -> dict:
    """File-pruned MERGE INTO the versioned table — the fourth DML verb
    (VERDICT r7 ask #3): upsert a changelog into the tip WITHOUT
    rewriting untouched files, the reference's S5 fan-in
    (ssidentity.c:102-113, each parsed record appended into the device
    table) at 100 TB fact scale.

    Clause semantics (the relational MERGE, same as
    :func:`ssidentity_spark.operators.merge.merge_upsert`):

    - matched + ``delete_when``          → row removed
    - matched otherwise                  → ``assignments`` applied
    - change with no base match          → inserted from ``assignments``
    - base row with no change            → kept byte-identical

    The changelog must carry AT MOST ONE row per (non-NULL) change key —
    a duplicated key raises (Delta's "multiple source rows matched"):
    letting it through would fan the full-outer join out, duplicating
    the matched base row in both the table and the change feed. Row
    provenance in the join comes from explicit side markers, so base
    rows whose key column is NULL are preserved untouched, never
    miscounted as inserts.

    ``assignments`` maps base column → SQL expression over the joined
    row (``b.col`` = base/preimage, ``c.col`` = change); results are
    CAST to the column's manifest type (MERGE can never silently retype
    a column). Unassigned non-key columns keep their base value on
    update and insert as typed NULL.

    Scale shape — what distinguishes this from ``merge_upsert`` over a
    full snapshot read:

    - ONE key-column pass (parquet column pruning: only ``key`` and the
      position metadata are read) semi-joins the snapshot against the
      DISTINCT change keys to find HIT files; the collect is
      file-count-bounded. Kept files carry into the new version **by
      reference** — never read again, never rewritten. A changelog
      aligned with the cluster key touches O(matching files), not
      O(table).
    - The merge join itself runs over the hit files only — full-outer
      on the key, sort-merge at scale, AQE-broadcast when the changelog
      is small (the dimension-maintenance common case). This is exact,
      not approximate: a kept file provably contains NO matching key,
      so every unmatched change row is a true insert.
    - Change files record all four row classes (deleted, update
      pre/post images, inserted — the Delta CDF shape), so batch and
      streaming feeds read facts, never re-derive them.
    - CONCURRENCY: pinned-parent commit; a version race aborts (staged
      data + change files removed), never retries — a blind retry would
      drop a concurrent append's rows from the rewrite.
    - Tip deletion vectors are APPLIED during the rewrite for hit files
      (their entries become inert) and carried for kept files.

    An empty changelog commits nothing. Returns ``{"version",
    "rows_updated", "rows_inserted", "rows_deleted", "files_kept",
    "files_rewritten", "files_after"}``.
    """
    from pyspark.sql import functions as F

    ck = change_key or key
    tip = latest_version(path)
    if tip is None:
        raise FileNotFoundError(f"no committed version at {path}")
    tip_m = _read_manifest(path, tip)
    files = tip_m["files"]
    cols, type_of = _manifest_cols(spark, path, tip_m, files)
    if key not in cols:
        raise ValueError(f"merge key {key!r} not a column of {path}")
    bad = [c for c in assignments if c not in cols]
    if bad:
        raise ValueError(f"MERGE assigns unknown column(s) {bad} at {path}")

    changes = changes.persist()  # read by hit pass + merge + counts
    try:
        # MERGE contract: at most ONE source row per change key. A
        # duplicated key would fan the full-outer join out — the matched
        # base row multiplies, every copy lands in the rewrite and the
        # change feed (duplicated rows in the table, fabricated
        # update_preimage facts). Delta raises the same way ("multiple
        # source rows matched"). NULL change keys are exempt: they never
        # equi-match a base row, so each is an independent insert.
        dup = (
            changes.where(F.col(ck).isNotNull())
            .groupBy(ck)
            # aliased count: .count() would emit a column literally named
            # "count", ambiguous whenever the change KEY is named count
            .agg(F.count(F.lit(1)).alias("_n_dup"))
            .where(F.col("_n_dup") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"MERGE changelog has {dup[0]['_n_dup']} rows for "
                f"{ck}={dup[0][0]!r} — merge requires at most one source "
                "row per change key (dedupe the changelog first, e.g. "
                "keep the latest row per key with max_by)"
            )
        # pass 1: which files contain LIVE rows whose key appears in the
        # changelog? Key-column-only scan, file-count-bounded collect.
        ckeys = changes.select(F.col(ck).alias(key)).distinct()
        if files:
            scan = _scan_with_positions(spark, path, tip_m, files, cols, type_of)
            hit_rel = {
                r["_f"]: r["count"]
                for r in scan.select(key, "_f")
                .join(ckeys, key, "left_semi")
                .groupBy("_f")
                .count()
                .collect()
            }
        else:
            hit_rel = {}
        kept = [f for f in files if f not in hit_rel]

        if hit_rel:
            base = (
                _scan_with_positions(
                    spark, path, tip_m, sorted(hit_rel), cols, type_of
                )
                .drop("_f", "_p")
                .persist()
            )
        else:
            base = (
                spark.createDataFrame(
                    [], ", ".join(f"`{c}` {type_of[c]}" for c in cols)
                ).persist()
            )

        # Row provenance comes from explicit side markers, NOT key
        # nullability: a pre-existing base row whose merge-key column is
        # NULL (in a hit file) must classify as an untouched base row —
        # keying provenance off b.<key> IS NULL would misread it as an
        # insert, inflating rows_inserted and fabricating a
        # _change_type='insert' fact on every merge touching its file.
        b = base.withColumn("_is_base", F.lit(True)).alias("b")
        c = changes.withColumn("_is_change", F.lit(True)).alias("c")
        joined = b.join(
            c, F.col(f"b.{key}") == F.col(f"c.{ck}"), "full_outer"
        ).persist()  # read by counts + up to 4 change/data writes
        # determinism gate probes the JOINED frame — merge expressions
        # reference b./c. aliases that resolve only there
        _require_deterministic(
            joined,
            [*assignments.values()] + ([delete_when] if delete_when else []),
            "MERGE",
        )
        has_base = F.col("b._is_base").isNotNull()
        has_change = F.col("c._is_change").isNotNull()
        matched = has_base & has_change
        insert_only = ~has_base
        doom = (
            matched & F.coalesce(F.expr(delete_when), F.lit(False))
            if delete_when is not None
            else F.lit(False)
        )

        def out_col(name):
            if name == key:
                return F.coalesce(F.col(f"b.{key}"), F.col(f"c.{ck}")).cast(
                    type_of[key]
                ).alias(key)
            if name in assignments:
                return (
                    F.when(has_change, F.expr(assignments[name]))
                    .otherwise(F.col(f"b.{name}"))
                    .cast(type_of[name])
                    .alias(name)
                )
            return F.col(f"b.{name}").cast(type_of[name]).alias(name)

        out_cols = [out_col(name) for name in cols]

        # one pass over the join for the manifest's row counts
        counts = joined.agg(
            F.sum(F.when(doom, 1).otherwise(0)).alias("d"),
            F.sum(F.when(matched & ~doom & has_change, 1).otherwise(0)).alias(
                "u"
            ),
            F.sum(F.when(insert_only, 1).otherwise(0)).alias("i"),
        ).collect()[0]
        rows_deleted = int(counts["d"] or 0)
        rows_updated = int(counts["u"] or 0)
        rows_inserted = int(counts["i"] or 0)
        if rows_deleted == rows_updated == rows_inserted == 0:
            return {
                "version": tip,
                "rows_updated": 0,
                "rows_inserted": 0,
                "rows_deleted": 0,
                "files_kept": len(files),
                "files_rewritten": 0,
                "files_after": len(files),
            }

        next_v = tip + 1
        base_cols = [F.col(f"b.{n}").alias(n) for n in cols]
        change_files: list[str] = []
        meta: dict = {
            "batch_ids": [str(x) for x in tip_m.get("batch_ids", [])],
            "merge_key": key,
            "assignments": dict(assignments),
            "rows_updated": rows_updated,
            "rows_inserted": rows_inserted,
            "rows_deleted": rows_deleted,
        }
        if delete_when is not None:
            meta["delete_when"] = delete_when
        if rows_deleted:
            rel = _write_change_file(
                joined.where(doom).select(*base_cols), path, next_v
            )
            meta["change_file"] = rel
            change_files.append(rel)
        if rows_updated:
            upd = matched & ~doom & has_change
            rel = _write_change_file(
                joined.where(upd).select(*base_cols), path, next_v, tag="-pre"
            )
            meta["change_file_pre"] = rel
            change_files.append(rel)
            rel = _write_change_file(
                joined.where(upd).select(*out_cols), path, next_v, tag="-post"
            )
            meta["change_file_post"] = rel
            change_files.append(rel)
        if rows_inserted:
            rel = _write_change_file(
                joined.where(insert_only).select(*out_cols),
                path,
                next_v,
                tag="-ins",
            )
            meta["change_file_insert"] = rel
            change_files.append(rel)

        rewritten = joined.where(~doom).select(*out_cols)
        # merged rows (updates + inserts) can violate — check before
        # anything is staged
        check_constraints(
            rewritten, table_constraints(path), f"merge_into at {path}"
        )
        stage = os.path.join(path, _DATA, f"merge-{next_v:08d}-{_attempt_tag()}")
        if not kept:
            # whole table rewritten: pin one (possibly empty) part so a
            # merge that deletes everything stays readable (the
            # empty-overwrite contract)
            rewritten = rewritten.coalesce(1)
        rewritten.write.mode("error").parquet(stage)
        new_files = sorted(
            os.path.relpath(os.path.join(stage, n), path)
            for n in os.listdir(stage)
            if n.endswith(".parquet")
        )
        if tip_m.get("dv_files"):
            # kept files' DVs still apply; rewritten files' entries are
            # inert (their rel paths left the manifest) and hit-file DV
            # rows were dropped during the positioned scan
            meta["dv_files"] = tip_m["dv_files"]
        if tip_m.get("schema"):
            meta["schema"] = tip_m["schema"]
        try:
            _commit(path, next_v, kept + new_files, "merge", meta=meta)
        except VersionConflict:
            import shutil

            shutil.rmtree(stage, ignore_errors=True)
            for rel in change_files:
                shutil.rmtree(os.path.join(path, rel), ignore_errors=True)
            raise
        return {
            "version": next_v,
            "rows_updated": rows_updated,
            "rows_inserted": rows_inserted,
            "rows_deleted": rows_deleted,
            "files_kept": len(kept),
            "files_rewritten": len(hit_rel),
            "files_after": len(kept) + len(new_files),
        }
    finally:
        changes.unpersist()
        try:
            base.unpersist()
        except NameError:
            pass
        try:
            joined.unpersist()
        except NameError:
            pass


def optimize_zorder(
    spark: SparkSession,
    path: str,
    x: str,
    y: str,
    target_rows_per_file: int = 1_000_000,
    bits: int = 11,
) -> dict:
    """OPTIMIZE ZORDER BY (x, y): compact the tip re-clustered along the
    range-normalized Morton curve, so per-file min/max stats prune BOTH
    dimensions of box queries (the multi-dim half of data skipping —
    measured 2.3x fewer row groups vs the best linear sort, SCALE.md).
    Pure composition: :func:`optimize` does the read-identical commit
    (deletion vectors materialized, ledger cleared, time travel kept,
    race-aborted) and the layout comes from
    :func:`functions.zorder.morton_key_scaled` over the tip's actual
    value ranges (two scalar aggregates — model-sized driver traffic)."""
    from pyspark.sql import functions as F

    from ssidentity_spark.functions.zorder import morton_key_scaled

    tip_df = read_versioned(spark, path)
    mx, my = tip_df.agg(F.max(x), F.max(y)).collect()[0]  # two scalars
    if mx is None or my is None:
        raise ValueError(f"zorder columns {x}/{y} are all-NULL at {path}")

    def recluster(df, n):
        key = morton_key_scaled(
            F.col(x), int(mx), F.col(y), int(my), bits=bits
        )
        return (
            df.withColumn("_zorder", key)
            .repartitionByRange(n, "_zorder")
            .sortWithinPartitions("_zorder")
            .drop("_zorder")
        )

    return optimize(
        spark,
        path,
        target_rows_per_file=target_rows_per_file,
        repartition_fn=recluster,
    )


def optimize_similarity_layout(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """OPTIMIZE CLUSTER BY SimHash: compact the tip with near-duplicate
    documents laid out adjacently, so parquet's page-local compression
    sees them together — measured −11.5% bytes vs a shuffled corpus at
    30% near-dups (SCALE.md "r9: layout"; prefix sort gets only −4.6%).
    The text twin of :func:`optimize_zorder`: pure composition through
    :func:`optimize`'s ``repartition_fn`` (read-identical commit, DVs
    materialized, time travel kept, race-aborted), and the layout key
    (:func:`functions.textlayout.simhash32`) is a single Column
    expression — the range repartition is the only exchange."""
    from ssidentity_spark.functions.textlayout import simhash32

    def recluster(df, n):
        from pyspark.sql import functions as F

        if "_simhash" in df.columns:
            # withColumn would CLOBBER it and the final drop would then
            # delete real data while the carried manifest schema still
            # lists the column — every later read of the tip would fail
            raise ValueError(
                "table has a column named '_simhash', which collides "
                "with the layout key — rename it (leading-underscore "
                "names are reserved, like Delta's)"
            )
        return (
            df.withColumn("_simhash", simhash32(F.col(text_col)))
            .repartitionByRange(n, "_simhash")
            .sortWithinPartitions("_simhash")
            .drop("_simhash")
        )

    return optimize(
        spark,
        path,
        target_rows_per_file=target_rows_per_file,
        repartition_fn=recluster,
    )


def restore_version(path: str, version: int) -> dict:
    """RESTORE the table to a prior snapshot as a NEW commit (the Delta
    ``RESTORE TABLE ... TO VERSION AS OF`` verb) — the rollback half of
    time travel: reading an old version answers "what was true", restore
    makes it true AGAIN at the tip, without rewriting a byte of data.

    Semantics:

    - The new manifest references ``version``'s files (and its deletion
      vectors and recorded schema) BY REFERENCE — restore is a pure log
      operation, O(manifest), never O(data). A 100 TB rollback commits
      in milliseconds.
    - HISTORY is preserved: every version between ``version`` and the
      pre-restore tip still time-travels (restore appends to the log,
      it never truncates it — re-restoring forward works too).
    - The STREAM walker raises on restore versions (same gate as
      overwrite): re-added files would re-emit their rows as fresh
      appends downstream. Snapshot-read across it, or restart the
      stream at the restored snapshot with ``startingVersion``.
    - The cumulative stream-batch ledger (``batch_ids``) is carried
      from the TIP, not the restored version — a restarted
      exactly-once sink must still see every batch id it ever
      committed, or it would re-apply the batches the rollback undid.
    - VACUUM interaction: restore requires ``version``'s data files to
      still exist; if retention already reclaimed them the restore
      fails LOUDLY naming vacuum (Delta errors the same way).
    - CONCURRENCY: pinned-parent commit; a version race raises
      :class:`VersionConflict` — nothing is staged, so there is
      nothing to clean.

    Returns ``{"version", "restored_from", "files"}``."""
    tip = latest_version(path)
    if tip is None:
        raise FileNotFoundError(f"no committed version at {path}")
    if not 0 <= version <= tip:
        raise ValueError(
            f"RESTORE target must be a committed version in [0, {tip}], "
            f"got {version}"
        )
    if version == tip:
        # restoring to the tip is the identity — no commit, like an
        # empty-changelog merge
        return {"version": tip, "restored_from": version, "files": None}
    try:
        m = _read_manifest(path, version)
    except FileNotFoundError:
        retained = _versions(path)
        oldest = retained[0] if retained else None
        raise ValueError(
            f"cannot RESTORE {path} to version {version}: its manifest "
            f"has been vacuumed from the log (oldest retained: {oldest})"
        ) from None
    missing = [
        f
        for f in list(m["files"]) + list(m.get("dv_files", []))
        if not os.path.exists(os.path.join(path, f))
    ]
    if missing:
        raise ValueError(
            f"cannot RESTORE {path} to version {version}: {len(missing)} "
            f"data file(s) were reclaimed by vacuum (first: {missing[0]}). "
            "Restore targets must be within the vacuum retention window."
        )
    tip_m = _read_manifest(path, tip)
    meta: dict = {
        "batch_ids": [str(b) for b in tip_m.get("batch_ids", [])],
        "restored_from": version,
    }
    if m.get("dv_files"):
        meta["dv_files"] = m["dv_files"]
    if m.get("schema"):
        meta["schema"] = m["schema"]
    _commit(path, tip + 1, list(m["files"]), "restore", meta=meta)
    return {
        "version": tip + 1,
        "restored_from": version,
        "files": len(m["files"]),
    }


def _repoint_dvs(
    src: str, dst: str, dv_files: list[str], file_map: dict[str, str]
) -> list[str]:
    """Rewrite the source's deletion-vector sidecars into the CLONE's own
    ``_dv/`` dir with their ``f`` column re-pointed through ``file_map``
    (source rel path → clone rel path). DV rows name files by the
    SOURCE manifest's rel paths; a clone's manifest uses different rel
    paths for the same bytes, and the read-time anti-join matches on the
    clone's — carrying the source sidecars verbatim would silently
    RESURRECT every deleted row. Sidecars are O(doomed rows), so the
    rewrite keeps clone cost at O(manifest + doomed rows), never
    O(data).

    INERT rows — DV entries naming files NOT in the snapshot's file list
    (cow DML and merge carry ``dv_files`` forward after rewriting the
    very files some rows name; the read path ignores them) — are DROPPED
    here rather than remapped: they reference nothing in the clone, and
    remapping them would crash on the missing file_map key."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = []
    for dv in dv_files:
        tables = []
        full = os.path.join(src, dv)
        parts = (
            [
                os.path.join(full, n)
                for n in sorted(os.listdir(full))
                if n.endswith(".parquet")
            ]
            if os.path.isdir(full)
            else [full]
        )
        for p in parts:
            tables.append(pq.read_table(p, columns=["f", "pos"]))
        t = pa.concat_tables(tables)
        live = [f in file_map for f in t.column("f").to_pylist()]
        t = t.filter(pa.array(live, pa.bool_()))
        if t.num_rows == 0:
            continue  # every row was inert — nothing to carry
        remapped = [file_map[f] for f in t.column("f").to_pylist()]
        t = t.set_column(
            t.schema.get_field_index("f"), "f", pa.array(remapped, pa.string())
        )
        dv_rel = os.path.join("_dv", f"clone-{_attempt_tag()}")
        os.makedirs(os.path.join(dst, dv_rel))
        pq.write_table(t, os.path.join(dst, dv_rel, "part-0.parquet"))
        out.append(dv_rel)
    return out


def clone_table(
    src: str, dst: str, version: int | None = None, deep: bool = False
) -> dict:
    """CLONE: create a NEW versioned table at ``dst`` whose v0 is a
    pinned snapshot of the table at ``src`` (the Delta ``CREATE TABLE
    ... CLONE`` verb) — the branching half of the log surface next to
    RESTORE's rollback: dev/test copies of a production table, schema
    experiments, and point-in-time forks, without recomputing anything.

    - **shallow** (default): the clone's manifest references the
      source's data files BY ``../``-relative PATH — a pure log
      operation, O(manifest), zero bytes copied. A 100 TB fork commits
      in milliseconds. Deletion-vector sidecars are the one exception:
      they are rewritten (O(doomed rows)) because their ``f`` rows name
      files by the source's rel paths (:func:`_repoint_dvs`).
    - **deep**: data files (and DV sidecars) are byte-copied under the
      clone root — self-contained, survives the source's vacuum or
      deletion. O(data) in I/O but zero recompute.

    The clone then evolves INDEPENDENTLY: appends/DML/OPTIMIZE on the
    clone stage their files under the clone root and never touch the
    source; the source's later commits never appear in the clone.
    :func:`vacuum` on a shallow clone skips borrowed files via the
    :func:`_owned` guard, so clone maintenance cannot destroy the
    source.

    CONTRACTS AND HAZARDS (both match Delta's documented semantics):

    - ``dst`` must not already be a versioned table (create-only).
    - The stream-batch ledger (``batch_ids``) is NOT carried — a clone
      is a new table; a streaming sink that wrote the source is not
      "already committed" into the clone.
    - A shallow clone borrows bytes it does not own: ``vacuum`` on the
      SOURCE consults only the source's manifests and may reclaim files
      the clone still references, breaking the clone's reads. That is
      the documented shallow-clone trade; use ``deep=True`` (or vacuum
      retention discipline) when the source's lifecycle is not yours.

    Returns ``{"version": 0, "source_version", "files", "mode"}``."""
    src_tip = latest_version(src)
    if src_tip is None:
        raise FileNotFoundError(f"no committed version at {src}")
    v = src_tip if version is None else version
    if not os.path.exists(_manifest_path(src, v)):
        raise ValueError(
            f"cannot CLONE {src} at version {v}: no such committed "
            f"version (tip: {src_tip}; older manifests may be vacuumed)"
        )
    if latest_version(dst) is not None:
        raise ValueError(
            f"CLONE target {dst} is already a versioned table — clone is "
            "create-only (drop the target or pick a fresh path)"
        )
    m = _read_manifest(src, v)
    missing = [
        f
        for f in list(m["files"]) + list(m.get("dv_files", []))
        if not os.path.exists(os.path.join(src, f))
    ]
    if missing:
        raise ValueError(
            f"cannot CLONE {src} at version {v}: {len(missing)} file(s) "
            f"were reclaimed by vacuum (first: {missing[0]})"
        )
    basenames = [os.path.basename(f) for f in m["files"]]
    if len(set(basenames)) != len(basenames):
        raise RuntimeError(
            f"duplicate part basenames in source manifest at {src} — "
            "cannot attribute deletion-vector rows across the clone"
        )
    os.makedirs(dst, exist_ok=True)
    if deep:
        import shutil as _shutil

        copy_dir = os.path.join(_DATA, f"clone-{_attempt_tag()}")
        os.makedirs(os.path.join(dst, copy_dir))
        file_map = {}
        for f in m["files"]:
            rel = os.path.join(copy_dir, os.path.basename(f))
            _shutil.copyfile(os.path.join(src, f), os.path.join(dst, rel))
            file_map[f] = rel
    else:
        file_map = {
            f: os.path.relpath(os.path.join(src, f), dst) for f in m["files"]
        }
    meta: dict = {
        "cloned_from": os.path.abspath(src),
        "source_version": v,
        "clone_mode": "deep" if deep else "shallow",
    }
    if m.get("dv_files"):
        carried = _repoint_dvs(src, dst, m["dv_files"], file_map)
        if carried:  # all-inert sidecars carry nothing
            meta["dv_files"] = carried
    if m.get("schema"):
        meta["schema"] = m["schema"]
    # CHECK constraints are part of the table definition — a clone
    # inherits them (Delta clones carry table properties); the clone
    # evolves them independently afterward (add/drop on the clone never
    # touches the source)
    rec = _constraints_record(src)
    if rec is not None:
        meta["constraints"] = dict(rec)
    _commit(dst, 0, list(file_map.values()), "clone", meta=meta)
    return {
        "version": 0,
        "source_version": v,
        "files": len(file_map),
        "mode": meta["clone_mode"],
    }


def iter_manifest_diffs(
    path: str,
    start_v: int,
    end_v: int,
    base_files: set[str] | None = None,
    consume_whole_version: int | None = None,
    context: str = "the version walk",
    on_delete: str = "raise",
    on_update: str = "raise",
    on_merge: str = "raise",
):
    """ONE implementation of the manifest diff semantics shared by the
    streaming source and the batch change feed (r7 review: they must
    never drift apart). Yields ``(version, added_files)`` for each
    data-changing version in ``(start_v, end_v]``:

    - ``optimize`` versions yield nothing (dataChange=false) but advance
      the file baseline;
    - ``delete`` versions raise by default (the walk's consumers are
      append-only); ``on_delete='skip'`` advances the baseline without
      yielding — the streaming ``ignoreDeletes`` contract, where
      downstream explicitly accepts never seeing the removed rows (the
      rewritten survivor files are NOT re-emitted: their rows already
      flowed downstream when first appended);
    - ``merge`` versions raise by default with their own gate:
      ``on_merge='skip'`` (the ``skipMergeCommits`` stream option)
      advances the baseline without yielding. Deliberately NOT covered
      by ``on_update``: a merge also inserts genuinely new rows, and
      skipping it drops those inserts — the caller must accept that by
      name, not via an option named for updates;
    - ``overwrite`` versions — or any baseline violation — raise, UNLESS
      the version equals ``consume_whole_version`` (the streaming
      ``startingVersion`` snapshot, consumed whole);
    - a vacuumed manifest anywhere in the range raises naming vacuum as
      the cause and the ways out.

    ``base_files`` overrides the baseline (empty set = everything in the
    first version is "added"); default reads ``start_v``'s manifest
    (empty baseline when ``start_v < 0``).
    """

    def manifest_or_explain(v: int) -> dict:
        try:
            return _read_manifest(path, v)
        except FileNotFoundError:
            retained = _versions(path)
            oldest = retained[0] if retained else None
            raise ValueError(
                f"{context} at {path}: version {v} has been vacuumed from "
                f"the log (oldest retained version: {oldest}). Streams: "
                f"restart with .option('startingVersion', {oldest}) to "
                "begin at the oldest retained snapshot (replays its full "
                "file list) or use a fresh checkpoint; batch: start at a "
                "retained version or snapshot-read (read_versioned). "
                "Raising instead of skipping: silently jumping the gap "
                "would drop the rows committed in the vacuumed versions."
            ) from None

    if on_delete not in ("raise", "skip"):
        raise ValueError(f"on_delete must be raise|skip, got {on_delete!r}")
    if on_update not in ("raise", "skip"):
        raise ValueError(f"on_update must be raise|skip, got {on_update!r}")
    if on_merge not in ("raise", "skip"):
        raise ValueError(f"on_merge must be raise|skip, got {on_merge!r}")
    if base_files is not None:
        prev = set(base_files)
    elif start_v >= 0:
        prev = set(manifest_or_explain(start_v)["files"])
    else:
        prev = set()
    for v in range(start_v + 1, end_v + 1):
        m = manifest_or_explain(v)
        cur = set(m["files"])
        if m.get("operation") == "optimize" and v != consume_whole_version:
            prev = cur
            continue
        if m.get("operation") == "delete" and v != consume_whole_version:
            if on_delete == "skip":
                prev = cur
                continue
            raise ValueError(
                f"version {v} at {path} is a DELETE "
                f"(rows removed: {m.get('rows_deleted')}) — {context} is "
                "append-only. Streams: .option('ignoreDeletes', 'true') "
                "skips delete versions (downstream will NOT see the "
                "removed rows); batch: read_changes(include_deletes=True) "
                "emits them as _change_type='delete' rows."
            )
        if m.get("operation") == "update" and v != consume_whole_version:
            if on_update == "skip":
                prev = cur
                continue
            raise ValueError(
                f"version {v} at {path} is an UPDATE "
                f"(rows changed: {m.get('rows_updated')}) — {context} is "
                "append-only. Streams: .option('ignoreUpdates', 'true') "
                "skips update versions (downstream will NOT see the new "
                "values); batch: read_changes(include_deletes=True) emits "
                "update_preimage/update_postimage rows; a change-feed "
                "stream (.option('readChangeFeed','true')) emits them too."
            )
        if m.get("operation") == "merge" and v != consume_whole_version:
            # a merge both rewrites files (its diff would re-emit old
            # rows) AND inserts genuinely new ones, so it gets its OWN
            # gate: skipping a merge drops the merge's inserts too —
            # data loss that ignoreUpdates (named for updates) must not
            # silently opt into. on_merge='skip' is the explicit
            # Delta-skipChangeCommits-style acceptance of that.
            if on_merge == "skip":
                prev = cur
                continue
            raise ValueError(
                f"version {v} at {path} is a MERGE "
                f"(updated: {m.get('rows_updated')}, inserted: "
                f"{m.get('rows_inserted')}, deleted: "
                f"{m.get('rows_deleted')}) — {context} is append-only. "
                "Streams: .option('skipMergeCommits', 'true') skips merge "
                "versions (downstream will NOT see the merge's updated "
                "values OR its newly inserted rows — ignoreUpdates alone "
                "deliberately does not cover merges, precisely because "
                "they also insert); batch: "
                "read_changes(include_deletes=True) emits the recorded "
                "insert/update/delete rows; a change-feed stream "
                "(.option('readChangeFeed','true')) emits them too."
            )
        # restore is gated like overwrite even when its file list happens
        # to be a superset of the baseline: re-added files carry rows the
        # stream already emitted before the rollback — yielding them
        # would duplicate downstream
        if m.get("operation") in ("overwrite", "restore") or not prev <= cur:
            if v != consume_whole_version:
                raise ValueError(
                    f"version {v} at {path} is not append-only "
                    f"(overwrite/restore/replaced files) — {context} "
                    "requires an append-only history; snapshot-read "
                    "across it (read_versioned) or restart the stream at "
                    "it with .option('startingVersion', ...)"
                )
        yield v, sorted(cur - prev)
        prev = cur


def read_changes(
    spark: SparkSession,
    path: str,
    start_version: int,
    end_version: int | None = None,
    include_deletes: bool = False,
) -> DataFrame:
    """Change data feed: the rows ADDED between ``start_version``
    (exclusive) and ``end_version`` (inclusive, default tip), each
    stamped with a ``_commit_version`` metadata column — the batch twin
    of the streaming reader's manifest-diff tailing, and what an
    incremental downstream job (IVM refresh, index rebuild, replication)
    reads instead of re-scanning history.

    Semantics mirror the streaming source exactly:

    - appends contribute their file diff (parts are immutable, so the
      diff IS the row-level change set);
    - ``optimize`` versions contribute NOTHING (dataChange=false — the
      rewrite carries no new rows) but advance the file baseline;
    - ``overwrite`` versions raise: a rewrite has no row-level diff
      without tombstones, and silently treating the new snapshot as
      "changes" would double-count surviving rows. Use a snapshot read
      (``read_versioned``) across overwrite boundaries.
    - ``delete`` versions raise by default (an append-only consumer must
      not silently miss removals). With ``include_deletes=True`` the feed
      gains a ``_change_type`` column ('insert' / 'delete'): appends emit
      their rows as inserts, and each delete version emits exactly the
      REMOVED rows — reconstructed by reading the files the commit
      replaced and re-applying the manifest-recorded predicate, which is
      exact because parts are immutable (the rewritten survivor files
      contribute nothing: their rows already appeared as inserts).
    - a vacuumed manifest inside the range raises with the cause (the
      same contract as the streaming source's error).
    """
    from pyspark.sql import functions as F

    tip = latest_version(path)
    if tip is None:
        raise FileNotFoundError(f"no committed version at {path}")
    end = tip if end_version is None else end_version
    if not 0 <= start_version <= end <= tip:
        raise ValueError(
            f"need 0 <= start {start_version} <= end {end} <= tip {tip}"
        )

    parts: list[DataFrame] = []

    def stamp(df: DataFrame, v: int, change: str) -> DataFrame:
        df = df.withColumn("_commit_version", F.lit(v))
        if include_deletes:
            df = df.withColumn("_change_type", F.lit(change))
        return df

    for v, added in iter_manifest_diffs(
        path,
        start_version,
        end,
        context="the change feed",
        on_delete="skip" if include_deletes else "raise",
        on_update="skip" if include_deletes else "raise",
        # merge versions are emitted from their recorded change files in
        # the include_deletes branch below, never from the file diff
        on_merge="skip" if include_deletes else "raise",
    ):
        if added:
            parts.append(
                stamp(
                    spark.read.parquet(
                        *[os.path.join(path, f) for f in added]
                    ),
                    v,
                    "insert",
                )
            )
    if include_deletes:
        for v in range(start_version + 1, end + 1):
            m = _read_manifest(path, v)
            if m.get("operation") == "merge":
                # recorded facts for all four row classes (insert rows
                # come from the change file, NOT the file diff — the
                # rewritten parts also carry pre-existing rows)
                for mkey, kind in (
                    ("change_file", "delete"),
                    ("change_file_pre", "update_preimage"),
                    ("change_file_post", "update_postimage"),
                    ("change_file_insert", "insert"),
                ):
                    if m.get(mkey):
                        parts.append(
                            stamp(
                                spark.read.parquet(
                                    os.path.join(path, m[mkey])
                                ),
                                v,
                                kind,
                            )
                        )
                continue
            if m.get("operation") == "update":
                for key, kind in (
                    ("change_file_pre", "update_preimage"),
                    ("change_file_post", "update_postimage"),
                ):
                    if not m.get(key):
                        raise ValueError(
                            f"update version {v} at {path} records no "
                            f"{key} — cannot reconstruct the feed"
                        )
                    parts.append(
                        stamp(
                            spark.read.parquet(os.path.join(path, m[key])),
                            v,
                            kind,
                        )
                    )
                continue
            if m.get("operation") != "delete":
                continue
            if m.get("change_file"):
                # preferred path: the delete RECORDED its removed rows as
                # a change file (see delete_where) — read facts, don't
                # re-derive them
                parts.append(
                    stamp(
                        spark.read.parquet(
                            os.path.join(path, m["change_file"])
                        ),
                        v,
                        "delete",
                    )
                )
                continue
            if "predicate" not in m:
                raise ValueError(
                    f"delete version {v} at {path} records no predicate — "
                    "cannot reconstruct the removed rows"
                )
            # fallback for change-file-less delete versions: re-derive the
            # removed rows from the replaced files + recorded predicate
            removed = sorted(
                set(_read_manifest(path, v - 1)["files"]) - set(m["files"])
            )
            if removed:
                parts.append(
                    stamp(
                        spark.read.option("mergeSchema", "true")
                        .parquet(*[os.path.join(path, f) for f in removed])
                        .filter(F.expr(m["predicate"])),
                        v,
                        "delete",
                    )
                )
    if not parts:
        # typed-empty. Prefer the manifest's RECORDED schema — zero file
        # I/O, and a snapshot read of `end` would raise when `end` was
        # vacuumed or its file list is empty (ADVICE r7: an all-quiet
        # feed over such a table must return empty, not error). Fall
        # back to the nearest READABLE retained manifest's record, then
        # to the snapshot read only as a last resort (schema-less
        # legacy logs).
        spec = None
        try:
            spec = _read_manifest(path, end).get("schema")
        except FileNotFoundError:
            pass
        if spec is None:
            for v in reversed(_versions(path)):
                s = _read_manifest(path, v).get("schema")
                if s is not None:
                    spec = s
                    break
        if spec is not None:
            empty = spark.createDataFrame(
                [], ", ".join(f"`{n}` {t}" for n, t in spec)
            )
            return stamp(empty, 0, "insert").limit(0)
        return stamp(read_versioned(spark, path, end), 0, "insert").limit(0)
    out = parts[0]
    for p in parts[1:]:
        # allowMissingColumns: versions before an additive schema
        # evolution lack the newer columns — they read as null, same as
        # the mergeSchema snapshot read
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def committed_batch_ids(path: str) -> set[str]:
    """Stream batch TOKENS already durable in the log (bare batch ids,
    or "<query_id>#<batch_id>" for identity-declaring writers). The tip
    manifest carries the cumulative ledger (``batch_ids``), so this is
    one JSON read per call — not an O(versions) history scan, which
    would make stream-commit cost quadratic over a query's lifetime.
    Falls back to the full scan for logs written before the ledger
    existed."""
    tip = latest_version(path)
    if tip is None:
        return set()
    m = _read_manifest(path, tip)
    if "batch_ids" in m:
        return {str(b) for b in m["batch_ids"]}
    out = set()
    for v in _versions(path):
        b = _read_manifest(path, v).get("batch_id")
        if b is not None:
            out.add(str(b))
    return out


def versioned_stream_sink(
    stream_df: DataFrame, path: str, checkpoint: str, query_id: str | None = None
):
    """Structured-Streaming sink into the versioned table, exactly-once.

    foreachBatch's replay contract: after a crash between the data write
    and Spark's own commit record, the SAME batch_id re-runs. Each
    manifest records its batch_id, so the replayed batch finds itself
    already durable and no-ops — the transaction log itself is the
    idempotence ledger (the same design Delta's streaming writer uses:
    txn version per stream batch). Every micro-batch lands as one atomic
    append version; a reader pinning any version sees a consistent
    prefix of the stream."""

    def _sink(batch: DataFrame, batch_id: int) -> None:
        sink_batch(batch, batch_id, path, query_id=query_id)

    return (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def sink_batch(
    batch: DataFrame, batch_id: int, path: str, query_id: str | None = None
) -> int | None:
    """One stream micro-batch → one append version, idempotent on the
    batch token. ``query_id`` scopes the token (Delta's appId idea):
    WITHOUT it, two different streaming queries sinking into one table
    would read each other's batch numbers as replays and silently drop
    data — pass a stable per-query id (e.g. derived from the checkpoint
    path) whenever more than one stream writes the table. Returns the
    committed version, or None for a replay."""
    token = f"{query_id}#{int(batch_id)}" if query_id else str(int(batch_id))
    if token in committed_batch_ids(path):
        return None  # replayed batch — already committed, exactly-once
    return write_versioned(batch, path, "append", meta={"batch_id": token})


def commit_files(
    path: str,
    new_files: list[str],
    mode: str = "append",
    meta: dict | None = None,
    max_retries: int = 5,
    schema: list | None = None,
    validated_constraints: dict[str, str] | None = None,
) -> int:
    """Commit ALREADY-STAGED (path-relative) data files as a new version —
    the primitive under write_versioned and the data-source writers
    (whose executors stage files themselves).

    ``schema`` is this commit's (name, simpleString) column spec. It is
    validated and UNIONED against the parent INSIDE the retry loop —
    against whatever the parent is at commit time, not at call time — so
    a racing writer's added column is never dropped from the recorded
    schema and an append never lands unchecked on top of a concurrent
    incompatible overwrite (r7 review). When ``schema`` is None the
    parent's record is carried forward unchanged (like the batch-id
    ledger): a schema-oblivious caller must not erase the record.

    ``validated_constraints``: the {name: expr} record the CALLER already
    validated against ``new_files`` with a distributed Spark pass
    (write_versioned does); rules present there with an identical
    expression are not re-checked here. Any rule NOT covered — including
    one added concurrently mid-commit — is validated by the single-scan
    DuckDB fallback before the manifest publishes."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    # managed bookkeeping keys are maintained INSIDE this function (the
    # parent-carry logic below) or by the DML verbs' private _commit
    # calls — caller meta smuggling one in would suppress the carry and
    # silently drop or fabricate the DV ledger / recorded schema /
    # change-feed pointers for the new version (ADVICE r7)
    _BOOKKEEPING = (
        "constraints",
        "dv_files",
        "schema",
        "batch_ids",
        "change_file",
        "change_file_pre",
        "change_file_post",
        "change_file_insert",
    )
    smuggled = [k for k in (meta or {}) if k in _BOOKKEEPING]
    if smuggled:
        raise ValueError(
            f"meta must not set managed bookkeeping key(s) {smuggled} — "
            "they are maintained by the commit path itself"
        )
    # CHECK constraints: enforced on the STAGED parquet before the
    # manifest publishes it — commit_files is the choke point every
    # appending/overwriting writer passes through (write_versioned, the
    # stream sink, AND the Python Data Source writers whose executors
    # stage files directly, which a DataFrame-level hook would miss).
    # Violations leave only invisible staged bytes, never a version.
    #
    # COST SHAPE (VERDICT r9): the DataFrame paths (write_versioned →
    # stream sink) validate DISTRIBUTED — one Spark aggregate over the
    # staged files computing every rule's violation count — and pass the
    # already-validated record via ``validated_constraints``; the DuckDB
    # path below is the FALLBACK for executor-staged Python Data Source
    # commits only (their commit callback runs where no SparkSession
    # exists, and the staged parquet is engine-neutral bytes), and it
    # issues ONE single scan for ALL constraints, never one per rule.
    # Its cost is bounded by the DELTA (new_files), never the table, but
    # it is single-node — DataFrame writers never hit it.
    validated: dict[str, str] = dict(validated_constraints or {})

    def _ensure_validated(cons: dict | None) -> None:
        pending = {
            n: e for n, e in (cons or {}).items() if validated.get(n) != e
        }
        if pending and new_files:
            _duckdb_validate_staged(path, list(new_files), pending)
            validated.update(pending)

    _ensure_validated(table_constraints(path))
    for _ in range(max_retries):
        parent = latest_version(path)
        version = 0 if parent is None else parent + 1
        parent_m = _read_manifest(path, parent) if parent is not None else {}
        # TOCTOU guard (ADVICE r9): a concurrent add_constraint landing
        # between the pre-loop validation and this attempt's publish
        # would otherwise commit rows that were never checked against the
        # new rule. The carry makes the commit-time parent's record
        # authoritative — re-validate exactly the rules this call has not
        # already validated (no-op on the common unchanged path).
        _ensure_validated(parent_m.get("constraints"))
        if mode == "append" and parent is not None:
            files = parent_m["files"] + list(new_files)
        else:
            files = list(new_files)
        # the cumulative stream-batch ledger rides every manifest so the
        # idempotence check is one tip read; it survives overwrites (it
        # is about stream replay, not data). Entries are string TOKENS —
        # bare batch ids from single-writer streams, or
        # "<query_id>#<batch_id>" when the writer declares an identity
        # (two different streaming queries sinking into one table must
        # not treat each other's batch numbers as replays)
        ledger = [str(b) for b in parent_m.get("batch_ids", [])]
        full_meta = dict(meta or {})
        if full_meta.get("batch_id") is not None:
            ledger = sorted(set(ledger) | {str(full_meta["batch_id"])})
        full_meta["batch_ids"] = ledger
        # deletion vectors ride appends like the batch ledger: the carried
        # files' removed rows stay removed. An overwrite replaces the data,
        # so DVs reset with it.
        if (
            mode == "append"
            and parent_m.get("dv_files")
            and "dv_files" not in full_meta
        ):
            full_meta["dv_files"] = parent_m["dv_files"]
        if schema is not None:
            check_schema_evolution(parent_m.get("schema"), schema, mode)
            spec = [list(c) for c in schema]
            if mode == "append" and parent_m.get("schema"):
                existing = {n for n, _t in parent_m["schema"]}
                spec = [list(c) for c in parent_m["schema"]] + [
                    [n, t] for n, t in schema if n not in existing
                ]
            full_meta["schema"] = spec
        elif parent_m.get("schema") and "schema" not in full_meta:
            full_meta["schema"] = parent_m["schema"]
        try:
            _commit(path, version, files, mode, meta=full_meta)
            return version
        except VersionConflict:
            continue
    raise VersionConflict(f"gave up after {max_retries} retries at {path}")


# ---------------------------------------------------------------------------
# CHECK constraints (the Delta ``ALTER TABLE ADD CONSTRAINT`` verb): named
# boolean SQL expressions stored in the manifest and enforced on every
# write that introduces or modifies rows (append/overwrite via
# write_versioned — which also carries the stream sink — plus the UPDATE
# and MERGE rewrites). DELETE and OPTIMIZE never create rows that did not
# already satisfy the table's constraints, so they skip the check.
# NULL fails a constraint (prove-TRUE, the expectations convention).
# ---------------------------------------------------------------------------


def table_constraints(path: str) -> dict[str, str]:
    """The table's active constraints: {name: sql_expr}. Stored in the
    manifest by add/drop_constraint and looked up by walking the version
    chain tip-first to the NEWEST manifest carrying the key — ordinary
    commits do not copy it, so the walk is the carry (constraints
    survive appends, overwrites, RESTORE and OPTIMIZE by construction)."""
    rec = _constraints_record(path)
    return dict(rec) if rec else {}


def _constraints_record(path: str) -> dict | None:
    """The TIP manifest's constraints record. None = the table has never
    declared constraints; {} = declared then all dropped — the
    distinction keeps _commit's carry from letting vacuum resurrect a
    dropped constraint.

    Tip-only is sufficient BECAUSE of the carry: _commit stamps the
    record onto every manifest published after the declaration, so a
    tip without the key means no declaration exists as of the tip — no
    O(versions) walk per commit (which would go quadratic over a
    streaming sink's life)."""
    tip = latest_version(path)
    if tip is None:
        return None
    return _read_manifest(path, tip).get("constraints")


def _duckdb_validate_staged(
    path: str, new_files: list[str], constraints: dict[str, str]
) -> None:
    """Single-node fallback validation of staged parquet — for the
    Python Data Source writers whose commit callback has no live
    SparkSession (the staged files are engine-neutral bytes, and the
    constraint dialect is the ANSI subset both engines parse — the same
    contract every oracle in this repo lives by). ONE scan computes
    every rule's violation count via filtered aggregates; cost is
    bounded by the staged DELTA, never the table. DataFrame writers
    (write_versioned / stream sink) never reach this — they validate
    distributed and pass ``validated_constraints``."""
    import duckdb

    staged = [os.path.join(path, f) for f in new_files]
    names = sorted(constraints)
    sel = ", ".join(
        f"count(*) FILTER (WHERE NOT ({constraints[n]}) "
        f"OR (({constraints[n]}) IS NULL)) AS c{i}"
        for i, n in enumerate(names)
    )
    row = (
        duckdb.connect()
        .execute(
            f"SELECT {sel} FROM parquet_scan($files)", {"files": staged}
        )
        .fetchone()
    )
    bad = [
        f"{n} ({constraints[n]!r}): {row[i]} row(s)"
        for i, n in enumerate(names)
        if row[i]
    ]
    if bad:
        raise ValueError(
            f"CHECK constraint violation in commit_files at {path}: "
            + "; ".join(bad)
            + " — no version was committed"
        )


def check_constraints(df: DataFrame, constraints: dict[str, str], context: str) -> None:
    """Raise ValueError naming every violated constraint (with its row
    count) if any row of ``df`` fails any constraint — one aggregate
    pass for all constraints together, NULL counts as a violation."""
    from pyspark.sql import functions as F

    if not constraints:
        return
    names = sorted(constraints)
    row = df.agg(
        *[
            F.sum(
                F.when(F.expr(constraints[n]), 0).otherwise(1)
            ).alias(f"c{i}")
            for i, n in enumerate(names)
        ]
    ).collect()[0]
    bad = [
        f"{n} ({constraints[n]!r}): {row[f'c{i}']} row(s)"
        for i, n in enumerate(names)
        if (row[f"c{i}"] or 0) > 0
    ]
    if bad:
        raise ValueError(
            f"CHECK constraint violation in {context}: "
            + "; ".join(bad)
            + " — no version was committed"
        )


def _constraint_commit(
    path: str,
    constraints: dict[str, str],
    operation: str,
    parent: int | None = None,
) -> int:
    """Metadata-only pinned-parent commit carrying the parent's files,
    schema, DV and ledger records unchanged (the restore pattern).
    ``parent`` pins the version the caller VALIDATED against — if another
    commit landed since, _commit raises VersionConflict instead of
    silently publishing a record whose validation never saw the racing
    commit's rows (ADVICE r9 TOCTOU)."""
    if parent is None:
        parent = latest_version(path)
    if parent is None:
        raise ValueError(f"no table at {path}")
    m = _read_manifest(path, parent)
    version = parent + 1
    meta = {"constraints": constraints, "batch_ids": m.get("batch_ids", [])}
    for k in ("schema", "dv_files"):
        if m.get(k):
            meta[k] = m[k]
    _commit(path, version, m["files"], operation, meta)
    return version


# Spark simpleString -> DuckDB type, for the empty-table dialect probe
_DUCKDB_TYPES = {
    "tinyint": "TINYINT",
    "smallint": "SMALLINT",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "float": "REAL",
    "double": "DOUBLE",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "binary": "BLOB",
}


def add_constraint(
    spark: SparkSession, path: str, name: str, expr: str, max_retries: int = 5
) -> int:
    """Add a named CHECK constraint. EXISTING data must already satisfy
    it (validated here — Delta errors the same way); subsequent
    appends/overwrites/updates/merges enforce it at write time and fail
    LOUDLY without committing. Returns the metadata-only version.

    The expression must be ENGINE-PORTABLE ANSI SQL (the repo's oracle
    dialect): Spark evaluates it on the DataFrame write/rewrite hooks,
    DuckDB on executor-staged Data Source commits — both dialects are
    parse-checked here, not at first write. The validate-then-commit
    pair is PINNED to one parent version and retried on conflict, so a
    data append racing this call can never land rows the new constraint
    has not seen (ADVICE r9). Note RESTORE is metadata-only and does not
    re-validate restored data against constraints added after the
    restored version (Delta behaves the same); re-run add_constraint's
    validation manually if that matters."""
    from pyspark.sql import functions as F

    # fail fast on an unparseable expression IN BOTH DIALECTS, not at
    # first write (a one-dialect expr would wedge every subsequent
    # commit behind an obscure error)
    F.expr(expr)
    import duckdb

    for _ in range(max_retries):
        tip = latest_version(path)
        if tip is None:
            raise ValueError(f"no table at {path}")
        tip_m = _read_manifest(path, tip)
        cons = dict(tip_m.get("constraints") or {})
        if name in cons:
            raise ValueError(
                f"constraint {name!r} already exists on {path}"
            )
        probe = [os.path.join(path, f) for f in tip_m.get("files", [])][:1]
        if probe:
            duckdb.connect().execute(
                f"SELECT ({expr}) FROM parquet_scan($f) LIMIT 1",
                {"f": probe},
            )
        elif tip_m.get("schema"):
            # EMPTY table (ADVICE r9): no data file to probe, so
            # parse-check against a zero-row relation synthesized from
            # the recorded schema — otherwise a Spark-only expression is
            # accepted here and wedges every subsequent commit. Complex
            # (array/struct/map) columns fall back to VARCHAR: the
            # constraint dialect contract is scalar ANSI anyway, and a
            # false parse failure is the loud-and-early failure mode.
            cols = ", ".join(
                f'CAST(NULL AS {_DUCKDB_TYPES.get(t.split("(")[0], "VARCHAR") if not t.startswith("decimal") else t.upper()}) AS "{n}"'
                for n, t in tip_m["schema"]
            )
            duckdb.connect().execute(
                f"SELECT ({expr}) FROM (SELECT {cols}) WHERE 1 = 0"
            )
        if tip_m.get("files"):
            check_constraints(
                read_versioned(spark, path, tip),
                {name: expr},
                f"add_constraint on {path}",
            )
        new_cons = dict(cons)
        new_cons[name] = expr
        try:
            return _constraint_commit(
                path, new_cons, "add_constraint", parent=tip
            )
        except VersionConflict:
            # a data/metadata commit landed between validation and
            # publish — re-validate against the new tip (its rows were
            # never checked against this rule) and try again
            continue
    raise VersionConflict(
        f"add_constraint gave up after {max_retries} retries at {path}"
    )


def drop_constraint(path: str, name: str, max_retries: int = 5) -> int:
    """Remove a named CHECK constraint. Pinned-parent like add_constraint
    (the same TOCTOU family): reading the record at one tip and
    publishing at a later one would silently ERASE a constraint added
    concurrently in between — the read and the commit must see the same
    parent, retrying on conflict."""
    for _ in range(max_retries):
        tip = latest_version(path)
        if tip is None:
            raise ValueError(f"no table at {path}")
        cons = dict(_read_manifest(path, tip).get("constraints") or {})
        if name not in cons:
            raise ValueError(f"no constraint {name!r} on {path}")
        del cons[name]
        try:
            return _constraint_commit(
                path, cons, "drop_constraint", parent=tip
            )
        except VersionConflict:
            continue
    raise VersionConflict(
        f"drop_constraint gave up after {max_retries} retries at {path}"
    )
