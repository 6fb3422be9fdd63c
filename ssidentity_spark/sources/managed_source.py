"""``spark.read.format("managed_table")`` — the versioned/indexed table
(operators/tablelog.py + fileindex.py) as a first-class Spark data source
via the Spark 4 Python Data Source API (pyspark.sql.datasource).

What the integration buys over the helper functions:

- the table participates in ordinary query planning — users write
  ``spark.read.format("managed_table").option("version", 3).load(path)``
  and compose filters/projections like any source;
- **filter pushdown** (`pushFilters`, Spark 4.1): an ``EqualTo`` on the
  table's index key is consumed for FILE PRUNING against the per-version
  bloom index before partitions are planned — the scan never opens files
  that provably cannot match. The filter is also returned to Spark as
  partially-pushed (the API's contract for approximate pruning) so the
  engine re-applies it exactly — bloom false positives cost I/O, never
  correctness;
- one :class:`InputPartition` per surviving data file → Spark schedules
  file-parallel reads; each task streams Arrow record batches
  (``read()`` yielding pyarrow batches is the zero-copy path).

Version semantics: an explicit ``.option("version", N)`` is a pinned
snapshot — stable across later commits, the reproducibility contract.
An unpinned read resolves the tip manifest PER ACTION (the Python data
source constructs its reader at execution time), i.e. the familiar
read-a-directory behaviour; use the version option (or
``tablelog.read_versioned``, which resolves at call time) when isolation
across actions matters.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from ssidentity_spark.operators.fileindex import bloom_survivors, range_survivors
from ssidentity_spark.operators.tablelog import (
    _read_manifest,
    latest_version,
)

FORMAT_NAME = "managed_table"


# ONE definition of the sidecar path contract (operators/managed.py owns
# it) — a rename there must not silently disable pruning here
from ssidentity_spark.operators.managed import (  # noqa: E402
    _index_path as _index_sidecar,
    _minmax_path as _minmax_sidecar,
)


class ManagedTableDataSource(DataSource):
    """Entry point: resolves the pinned version and infers the schema
    from the snapshot's own parquet footers (no user schema needed)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _resolve(self) -> tuple[str, int]:
        path = self.options.get("path")
        if not path:
            raise ValueError("managed_table requires .load(path)")
        v = self.options.get("version")
        version = latest_version(path) if v is None else int(v)
        if version is None:
            raise FileNotFoundError(f"no committed version at {path}")
        return path, version

    def _cdf(self) -> bool:
        return str(self.options.get("readchangefeed", "false")).lower() == "true"

    def schema(self) -> StructType:
        from pyspark.sql.types import LongType, StringType, StructField

        base = self._table_schema()
        if self._cdf():
            clash = [
                f.name
                for f in base.fields
                if f.name in ("_commit_version", "_change_type")
            ]
            if clash:
                raise ValueError(
                    f"table columns {clash} collide with the change "
                    "feed's metadata columns — rename them before "
                    "reading with readChangeFeed"
                )
            # change-feed reads append the CDF metadata columns to the
            # table schema — same contract as the batch read_changes
            return StructType(
                list(base.fields)
                + [
                    StructField("_commit_version", LongType(), True),
                    StructField("_change_type", StringType(), True),
                ]
            )
        return base

    def _table_schema(self) -> StructType:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.types import (
            BinaryType,
            BooleanType,
            ByteType,
            DoubleType,
            FloatType,
            IntegerType,
            LongType,
            ShortType,
            StringType,
            StructField,
            TimestampNTZType,
            TimestampType,
        )

        path, version = self._resolve()
        m = _read_manifest(path, version)
        files = m["files"]
        if m.get("schema"):
            # the manifest's recorded schema is authoritative — under
            # additive evolution no single footer carries every column
            simple = {
                "bigint": LongType(),
                "int": IntegerType(),
                "smallint": ShortType(),
                "tinyint": ByteType(),
                "double": DoubleType(),
                "float": FloatType(),
                "string": StringType(),
                "boolean": BooleanType(),
                "binary": BinaryType(),
                "timestamp": TimestampType(),
                "timestamp_ntz": TimestampNTZType(),
            }
            fields = []
            for name, t in m["schema"]:
                if t not in simple:
                    raise TypeError(
                        f"managed_table: unmapped manifest type {t}"
                    )
                fields.append(StructField(name, simple[t], True))
            return StructType(fields)
        if not files:
            raise FileNotFoundError(f"version {version} at {path} is empty")
        arrow = pq.read_schema(os.path.join(path, files[0]))

        # direct arrow→spark map (no session needed — schema() runs off
        # the driver's SQL context in the Python data source worker)
        def conv(t: pa.DataType):
            if pa.types.is_int64(t):
                return LongType()
            if pa.types.is_int32(t):
                return IntegerType()
            if pa.types.is_float64(t):
                return DoubleType()
            if pa.types.is_float32(t):
                return FloatType()
            if pa.types.is_string(t) or pa.types.is_large_string(t):
                return StringType()
            if pa.types.is_boolean(t):
                return BooleanType()
            if pa.types.is_binary(t) or pa.types.is_large_binary(t):
                return BinaryType()
            if pa.types.is_timestamp(t):
                return TimestampType() if t.tz else TimestampNTZType()
            raise TypeError(f"managed_table: unmapped arrow type {t}")

        return StructType(
            [StructField(f.name, conv(f.type), True) for f in arrow]
        )

    def reader(self, schema: StructType) -> "ManagedTableReader":
        if self._cdf():
            raise ValueError(
                "readChangeFeed is a STREAMING option here (readStream); "
                "for a batch change feed use tablelog.read_changes, which "
                "supports version ranges and include_deletes"
            )
        path, version = self._resolve()
        return ManagedTableReader(path, version, schema)

    def writer(self, schema: StructType, overwrite: bool) -> "ManagedTableWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("managed_table requires .save(path)")
        return ManagedTableWriter(path, schema, overwrite)

    def streamReader(self, schema: StructType) -> "ManagedTableStreamReader":
        path = self.options.get("path")
        if not path:
            raise ValueError("managed_table requires .load(path)")
        sv = self.options.get("startingversion")
        mv = self.options.get("maxversionspertrigger")
        if mv is not None and int(mv) < 1:
            # 0 would cap every post-first-batch offset at _last_end + 0:
            # the stream silently freezes forever instead of erroring
            raise ValueError(
                f"maxVersionsPerTrigger must be >= 1, got {mv}"
            )
        ig = str(self.options.get("ignoredeletes", "false")).lower() == "true"
        iu = str(self.options.get("ignoreupdates", "false")).lower() == "true"
        sm = (
            str(self.options.get("skipmergecommits", "false")).lower()
            == "true"
        )
        return ManagedTableStreamReader(
            path,
            schema,
            None if sv is None else int(sv),
            None if mv is None else int(mv),
            ignore_deletes=ig,
            ignore_updates=iu,
            skip_merge_commits=sm,
            read_change_feed=self._cdf(),
        )

    def streamWriter(self, schema: StructType, overwrite: bool):
        path = self.options.get("path")
        if not path:
            raise ValueError("managed_table requires .start(path)")
        if overwrite:
            raise ValueError("managed_table stream sink is append-only")
        return ManagedTableStreamWriter(
            path, schema, query_id=self.options.get("queryid")
        )


def _read_padded(full_path: str, field_specs):
    """Stream one part file projecting the DECLARED schema: columns the
    file predates (additive evolution) are materialized as typed nulls,
    and order follows the declaration — so every emitted Arrow batch has
    the identical layout regardless of which schema era wrote the part.
    Batches come from ``iter_batches`` (row-group granularity), so task
    memory is bounded by one row group, not one file — a 1 GB compacted
    part no longer materializes whole before the first batch."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    target = _arrow_schema(field_specs)
    pf = pq.ParquetFile(full_path)
    have = set(pf.schema_arrow.names)
    present = [f.name for f in target if f.name in have]
    names = [f.name for f in target]
    if not present:
        # the file predates EVERY declared column: all-null rows
        n = pf.metadata.num_rows
        if n:
            yield pa.RecordBatch.from_arrays(
                [pa.nulls(n, type=f.type) for f in target], names=names
            )
        return
    for batch in pf.iter_batches(columns=present):
        cols = []
        for f in target:
            if f.name in have:
                col = batch.column(batch.schema.get_field_index(f.name))
                if col.type != f.type:
                    col = col.cast(f.type)
                cols.append(col)
            else:
                cols.append(pa.nulls(batch.num_rows, type=f.type))
        yield pa.RecordBatch.from_arrays(cols, names=names)


class _FilePartition(InputPartition):
    def __init__(
        self,
        rel_file: str,
        version: int | None = None,
        change_type: str | None = None,
        dv_files: list[str] | None = None,
    ):
        self.rel_file = rel_file
        # CDF-mode reads stamp every row with the commit version and the
        # change type; plain reads leave both None
        self.version = version
        self.change_type = change_type
        # merge-on-read: deletion-vector sidecars whose (f, pos) entries
        # must be anti-joined out of this file's rows at read time
        self.dv_files = dv_files


def _dv_masked(batches, path: str, dv_files: list[str], rel_file: str):
    """Apply deletion vectors to a file's record-batch stream: drop rows
    whose in-file position appears in any DV sidecar's (f, pos) set for
    this file. Positions are ``_metadata.row_index`` semantics — the
    row's index in the file's physical read order — which sequential
    pyarrow ``iter_batches`` reproduces exactly, so a running offset per
    batch is the position. The DV parquet is read with a pushed
    ``f == rel_file`` filter: per-task DV I/O is O(this file's doomed
    rows), not O(table's DV ledger)."""
    import numpy as np
    import pyarrow.dataset as pads

    doomed: set[int] = set()
    for dv in dv_files:
        t = pads.dataset(
            os.path.join(path, dv), format="parquet"
        ).to_table(filter=pads.field("f") == rel_file, columns=["pos"])
        doomed.update(t.column("pos").to_pylist())
    if not doomed:
        yield from batches
        return
    pos = np.array(sorted(doomed), dtype=np.int64)
    offset = 0
    for batch in batches:
        n = batch.num_rows
        lo = int(np.searchsorted(pos, offset))
        hi = int(np.searchsorted(pos, offset + n))
        if hi > lo:
            import pyarrow as pa

            mask = np.ones(n, dtype=bool)
            mask[pos[lo:hi] - offset] = False
            batch = batch.filter(pa.array(mask))
        offset += n
        if batch.num_rows:
            yield batch


class ManagedTableReader(DataSourceReader):
    def __init__(self, path: str, version: int, schema: StructType):
        self.path = path
        self.version = version
        self.field_specs = [
            (f.name, f.dataType.simpleString()) for f in schema.fields
        ]
        m = _read_manifest(path, version)
        # merge-on-read: DV sidecars are applied inside read() per file
        # (r8, VERDICT r7 ask #7 — the scan previously rejected
        # DV-bearing snapshots and named optimize as the way out)
        self.dv_files = list(m.get("dv_files") or [])
        self.files = list(m["files"])
        self.index = None
        sidecar = _index_sidecar(path, version)
        if os.path.exists(sidecar):
            try:
                with open(sidecar) as f:
                    self.index = json.load(f)
            except (json.JSONDecodeError, OSError):
                # a crash-truncated sidecar must DEGRADE the scan (no
                # pruning), never brick a fully committed version
                self.index = None
        self.minmax = None
        mm_sidecar = _minmax_sidecar(path, version)
        if os.path.exists(mm_sidecar):
            try:
                with open(mm_sidecar) as f:
                    self.minmax = json.load(f)
            except (json.JSONDecodeError, OSError):
                self.minmax = None
        self.pruned_value = None  # set by pushFilters
        self.range_lo = None  # tightest lower bound on the indexed key
        self.range_hi = None  # tightest upper bound
        # IN-list values per indexed key name (ANDed lists on the same
        # key intersect; lists on different indexed keys prune independently)
        self.in_values: dict[str, set] = {}

    def pushFilters(self, filters: list[Filter]):
        for flt in filters:
            if (
                self.index is not None
                and isinstance(flt, EqualTo)
                and len(flt.attribute) == 1
                and flt.attribute[0] == self.index["key"]
                and self.pruned_value is None
            ):
                self.pruned_value = flt.value
            # Range predicates on the min/max-indexed key tighten the
            # [range_lo, range_hi] band the scan must intersect. Strict
            # bounds (>, <) are widened to inclusive — a file whose max
            # EQUALS a GreaterThan bound survives as a false positive
            # the engine's re-applied filter removes; stats pruning may
            # over-read, never over-drop.
            elif (
                self.minmax is not None
                and isinstance(
                    flt,
                    (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual),
                )
                and len(flt.attribute) == 1
                and flt.attribute[0] == self.minmax["key"]
            ):
                if isinstance(flt, (GreaterThan, GreaterThanOrEqual)):
                    if self.range_lo is None or flt.value > self.range_lo:
                        self.range_lo = flt.value
                else:
                    if self.range_hi is None or flt.value < self.range_hi:
                        self.range_hi = flt.value
            # EqualTo on the min/max-indexed key is a degenerate range
            # [v, v] — prunes even when the bloom index is absent or
            # keyed on a different column (conflicting equalities across
            # ANDed filters collapse the band to empty, correctly)
            elif (
                self.minmax is not None
                and isinstance(flt, EqualTo)
                and len(flt.attribute) == 1
                and flt.attribute[0] == self.minmax["key"]
            ):
                if self.range_lo is None or flt.value > self.range_lo:
                    self.range_lo = flt.value
                if self.range_hi is None or flt.value < self.range_hi:
                    self.range_hi = flt.value
            # IN-list on either indexed key: survivors are the UNION of
            # per-value lookups (tighter than the [min, max] envelope
            # for sparse lists); ANDed IN-lists intersect value sets
            elif (
                isinstance(flt, In)
                and len(flt.attribute) == 1
                and (
                    (self.index is not None
                     and flt.attribute[0] == self.index["key"])
                    or (self.minmax is not None
                        and flt.attribute[0] == self.minmax["key"])
                )
            ):
                key = flt.attribute[0]
                vals = set(flt.value)
                self.in_values[key] = (
                    vals
                    if key not in self.in_values
                    else self.in_values[key] & vals
                )
            # every filter goes back to Spark: bloom pruning is
            # approximate (fp possible) and min/max pruning keeps whole
            # files for one matching row, so the engine must re-apply —
            # the "partially pushed" contract
            yield flt

    def partitions(self):
        files = self.files
        if self.pruned_value is not None and self.index is not None:
            files = bloom_survivors(
                self.index, self.pruned_value, restrict=set(files)
            )
        if (
            self.minmax is not None
            and (self.range_lo is not None or self.range_hi is not None)
        ):
            files = range_survivors(
                self.minmax, self.range_lo, self.range_hi, restrict=set(files)
            )
        # IN-lists: survivors are the UNION of per-value lookups against
        # whichever index covers the key, intersected with prior pruning
        for key, vals in self.in_values.items():
            if self.index is not None and key == self.index["key"]:
                hit: set[str] = set()
                for v in vals:
                    hit.update(
                        bloom_survivors(self.index, v, restrict=set(files))
                    )
                files = sorted(hit)
            elif self.minmax is not None and key == self.minmax["key"]:
                hit = set()
                for v in vals:
                    hit.update(
                        range_survivors(self.minmax, v, v, restrict=set(files))
                    )
                files = sorted(hit)
        if not files:
            # bloom pruned everything — one empty partition (Spark calls
            # read(None) when partitions() is empty, so keep one marker)
            return [_FilePartition(None)]
        dv = self.dv_files or None
        return [_FilePartition(rel, dv_files=dv) for rel in sorted(files)]

    def read(self, partition: _FilePartition):
        if partition is None or partition.rel_file is None:
            return
        batches = _read_padded(
            os.path.join(self.path, partition.rel_file), self.field_specs
        )
        if getattr(partition, "dv_files", None):
            batches = _dv_masked(
                batches, self.path, partition.dv_files, partition.rel_file
            )
        yield from batches


def register(spark) -> None:
    # runtime-settable in Spark 4.1; required for pushFilters to be called
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ManagedTableDataSource)


# ---------------------------------------------------------------------------
# Write side: df.writeStream.format("managed_table").start() — each
# micro-batch's executor tasks stage parquet parts and report them as
# commit messages; the driver's commit() turns the batch into ONE atomic
# append version (manifest batch_id = idempotence ledger, as in
# tablelog.versioned_stream_sink); abort() deletes the staged parts, so
# a failed batch leaves garbage bytes, never visible rows — Spark's sink
# commit protocol and the transaction log reinforcing each other.
# ---------------------------------------------------------------------------


class _StagedFiles(WriterCommitMessage):
    def __init__(self, rel_file):
        self.rel_file = rel_file


def _stage_rows(
    iterator, field_names, field_specs, full_path, chunk_rows=65536
) -> int:
    """Stream rows into a staged parquet file in fixed-size Arrow chunks:
    peak task memory is ONE chunk, not the whole partition (the previous
    list-of-Rows + transposed-lists + arrow-table pattern held the
    partition three times over). Returns rows written; 0 means no file
    was created.

    TIMEZONE contract: pyspark's Python data source hands write() naive
    datetimes in the OS-LOCAL timezone, while the declared arrow type is
    timestamp('us', tz='UTC'). pyarrow's schema-constrained conversion
    keeps the WALL-CLOCK fields and ignores any tz offset (verified:
    both naive 07:00 and aware 07:00-05:00 store as 07:00Z), so the fix
    is to rewrite each value to its UTC WALL TIME first —
    ``astimezone(timezone.utc)`` binds the OS zone to a naive value and
    converts — making the stored instant correct on any host zone."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = _arrow_schema(field_specs)
    ts_cols = [n for n, t in field_specs if t == "timestamp"]
    writer = None
    total = 0
    buf: list = []

    def flush():
        nonlocal writer, total
        if not buf:
            return
        data = {c: [r[c] for r in buf] for c in field_names}
        for c in ts_cols:
            data[c] = [
                None if v is None else v.astimezone(_dt.timezone.utc)
                for v in data[c]
            ]
        tbl = pa.table(data, schema=schema)
        if writer is None:
            os.makedirs(os.path.dirname(full_path), exist_ok=True)
            writer = pq.ParquetWriter(full_path, schema)
        writer.write_table(tbl)
        total += len(buf)
        buf.clear()

    for r in iterator:
        buf.append(r)
        if len(buf) >= chunk_rows:
            flush()
    flush()
    if writer is not None:
        writer.close()
    return total


def _arrow_schema(field_specs):
    """Spark (name, simpleString) pairs → explicit pyarrow schema, so
    staged parts carry the DECLARED types — never pa.table inference,
    which types an all-null column as null and widens int32 to int64,
    corrupting the table's schema contract."""
    import pyarrow as pa

    m = {
        "bigint": pa.int64(),
        "int": pa.int32(),
        "smallint": pa.int16(),
        "tinyint": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "string": pa.string(),
        "boolean": pa.bool_(),
        "binary": pa.binary(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    fields = []
    for name, simple in field_specs:
        if simple not in m:
            raise TypeError(f"managed_table writer: unmapped type {simple}")
        fields.append(pa.field(name, m[simple]))
    return pa.schema(fields)


class ManagedTableStreamWriter(DataSourceStreamWriter):
    def __init__(
        self, path: str, schema: StructType, query_id: str | None = None
    ):
        self.path = path
        self.field_names = list(schema.fieldNames())
        self.field_specs = [
            (f.name, f.dataType.simpleString()) for f in schema.fields
        ]
        # .option("queryId", ...): scopes the exactly-once ledger token
        # (Delta's appId idea) — two DIFFERENT streaming queries sinking
        # into one table must not read each other's batch numbers as
        # replays. Stable across restarts because the caller derives it
        # from something checkpoint-scoped.
        self.query_id = query_id

    def write(self, iterator):
        import uuid

        rel = os.path.join("data", "stream", f"{uuid.uuid4().hex}.parquet")
        n = _stage_rows(
            iterator,
            self.field_names,
            self.field_specs,
            os.path.join(self.path, rel),
        )
        return _StagedFiles(rel if n else None)

    def _staged(self, messages) -> list[str]:
        return [m.rel_file for m in messages if m is not None and m.rel_file]

    def commit(self, messages, batchId: int) -> None:
        from ssidentity_spark.operators.tablelog import (
            commit_files,
            committed_batch_ids,
        )

        files = self._staged(messages)
        token = (
            f"{self.query_id}#{int(batchId)}"
            if self.query_id
            else str(int(batchId))
        )
        if token in committed_batch_ids(self.path):
            # replayed batch: already durable — drop this attempt's stage
            for rel in files:
                try:
                    os.remove(os.path.join(self.path, rel))
                except FileNotFoundError:
                    pass
            return
        commit_files(
            self.path,
            files,
            "append",
            meta={"batch_id": token},
            schema=[[n, t] for n, t in self.field_specs],
        )

    def abort(self, messages, batchId: int) -> None:
        for rel in self._staged(messages):
            try:
                os.remove(os.path.join(self.path, rel))
            except FileNotFoundError:
                pass


# ---------------------------------------------------------------------------
# Streaming READ side: spark.readStream.format("managed_table") — the
# transaction log is a natural streaming source because offsets ARE
# version numbers: an offset {"version": N} means "snapshots <= N
# consumed", latestOffset is the tip, and the incremental read between
# two offsets is the manifest DIFF (files each append version added).
# One InputPartition per new file → parallel catch-up. Overwrite
# versions break append-only semantics, so encountering one inside the
# consumed range fails loudly (the same contract Delta's streaming
# source enforces) instead of silently replaying rewritten data.
# ---------------------------------------------------------------------------


class ManagedTableStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        path: str,
        schema: StructType,
        starting_version: int | None = None,
        max_versions_per_trigger: int | None = None,
        ignore_deletes: bool = False,
        ignore_updates: bool = False,
        skip_merge_commits: bool = False,
        read_change_feed: bool = False,
    ):
        self.path = path
        # .option("readChangeFeed", "true"): the stream emits CHANGES, not
        # just appends — each row stamped (_commit_version, _change_type),
        # delete versions contributing their recorded change file as
        # _change_type='delete' rows (exactly the batch read_changes
        # contract). The two CDF columns arrive via schema() and are
        # produced by read(), not read from parquet.
        self.read_change_feed = read_change_feed
        specs = [(f.name, f.dataType.simpleString()) for f in schema.fields]
        if read_change_feed:
            specs = [
                s for s in specs
                if s[0] not in ("_commit_version", "_change_type")
            ]
        self.field_specs = specs
        # .option("startingVersion", N): begin the stream AT snapshot N —
        # version N's full file list is the first micro-batch, diffs
        # after. The escape hatch for tables whose early manifests were
        # vacuumed away (vacuum drops manifests below the retention
        # window, so "consume the full history" is no longer satisfiable)
        # and for skipping deep history on long-lived tables.
        self.starting_version = starting_version
        # .option("maxVersionsPerTrigger", N): backlog throttling (the
        # Delta maxFilesPerTrigger idea at version granularity) — the
        # stream advances at most N versions per micro-batch once
        # running. Semantics note: latestOffset() takes no argument and
        # is called BEFORE the reader learns the checkpoint offset
        # (traced), so the cap is relative to the last offset this
        # reader served via partitions() — the FIRST batch after a
        # (re)start is therefore uncapped. Capping it from a seeded
        # baseline would be WORSE: a restarted stream whose checkpoint
        # is ahead of the seed would see latest < start, produce no
        # batch, never call partitions(), and wedge forever. One
        # uncapped catch-up batch is the safe trade; steady-state bursts
        # (a writer landing many versions between triggers) are paced.
        self.max_versions = max_versions_per_trigger
        # .option("ignoreDeletes"/"ignoreUpdates", "true"): advance past
        # row-level DELETE/UPDATE versions without emitting anything —
        # the caller explicitly accepts that downstream never sees the
        # removed rows / new values (Delta's ignoreDeletes contract,
        # split per verb). Default false: DML inside the consumed range
        # fails loudly with the ways out.
        self.ignore_deletes = ignore_deletes
        self.ignore_updates = ignore_updates
        # .option("skipMergeCommits", "true"): advance past MERGE
        # versions without emitting anything. Deliberately SEPARATE from
        # ignoreUpdates: a merge also INSERTS new rows, and an option
        # named for updates must not silently drop inserts — the caller
        # opts into that loss by name (Delta's skipChangeCommits shape).
        self.skip_merge_commits = skip_merge_commits
        self._last_end: int | None = None

    def initialOffset(self) -> dict:
        if self.starting_version is not None:
            return {"version": self.starting_version - 1}
        return {"version": -1}  # consume the full history first, then tail

    def latestOffset(self) -> dict:
        v = latest_version(self.path)
        tip = -1 if v is None else v
        if self.max_versions is not None and self._last_end is not None:
            tip = min(tip, self._last_end + self.max_versions)
        return {"version": tip}

    def _new_files(self, start_v: int, end_v: int) -> list[str]:
        """Thin wrapper over tablelog.iter_manifest_diffs — ONE shared
        implementation of the diff semantics for stream and batch
        change-feed consumers (r7 review). The startingVersion snapshot
        is consumed WHOLE (empty baseline + overwrite exemption for that
        one version); manifest N-1 is deliberately not consulted — it
        may be vacuumed, and diffing against it would silently drop the
        files carried over from the vacuumed history."""
        synthetic_base = (
            self.starting_version is not None
            and start_v == self.starting_version - 1
        )
        out: list[str] = []
        for _v, added in self._diffs(start_v, end_v, synthetic_base):
            out.extend(added)
        return out

    def _diffs(self, start_v: int, end_v: int, synthetic_base: bool):
        from ssidentity_spark.operators.tablelog import (
            _read_manifest,
            iter_manifest_diffs,
        )

        # CDF mode never raises on DML at the walker level — those
        # versions are emitted separately from their change files in
        # partitions()
        skip_d = self.ignore_deletes or self.read_change_feed
        skip_u = self.ignore_updates or self.read_change_feed
        skip_m = self.skip_merge_commits or self.read_change_feed
        yield from iter_manifest_diffs(
            self.path,
            start_v,
            end_v,
            base_files=set() if synthetic_base else None,
            consume_whole_version=(
                self.starting_version if synthetic_base else None
            ),
            context="the managed_table stream",
            on_delete="skip" if skip_d else "raise",
            on_update="skip" if skip_u else "raise",
            on_merge="skip" if skip_m else "raise",
        )

    def partitions(self, start: dict, end: dict):
        from ssidentity_spark.operators.tablelog import _read_manifest

        self._last_end = int(end["version"])  # cap baseline for the next trigger
        start_v, end_v = int(start["version"]), int(end["version"])
        synthetic_base = (
            self.starting_version is not None
            and start_v == self.starting_version - 1
        )

        def snapshot_dv(v: int) -> list[str] | None:
            """DV sidecars to apply when replaying version v's files
            WHOLE (the startingVersion snapshot): without this the
            replay would resurrect merge-on-read-deleted rows. Ordinary
            diff-tailed appends never need it — a DV can only reference
            files committed at or before its delete version, and those
            files flowed downstream before the delete existed."""
            if synthetic_base and v == self.starting_version:
                return _read_manifest(self.path, v).get("dv_files") or None
            return None

        if not self.read_change_feed:
            out = [
                _FilePartition(rel, dv_files=snapshot_dv(v))
                for v, added in self._diffs(start_v, end_v, synthetic_base)
                for rel in added
            ]
            return out or [_FilePartition(None)]
        def change_parts(cf: str) -> list[str]:
            # change sets are DISTRIBUTED parquet directories (one
            # partition per part — the whole point of not coalescing a
            # 100 TB retention sweep through one task); single .parquet
            # files from before that change read as one partition
            full = os.path.join(self.path, cf)
            if os.path.isdir(full):
                return [
                    os.path.join(cf, n)
                    for n in sorted(os.listdir(full))
                    if n.endswith(".parquet")
                ]
            return [cf]

        parts: list[_FilePartition] = []
        for v, added in self._diffs(start_v, end_v, synthetic_base):
            parts.extend(
                _FilePartition(rel, v, "insert", dv_files=snapshot_dv(v))
                for rel in added
            )
        for v in range(start_v + 1, end_v + 1):
            if synthetic_base and v == self.starting_version:
                continue  # the base snapshot was consumed whole as inserts
            m = _read_manifest(self.path, v)
            op = m.get("operation")
            if op == "merge":
                # all four recorded row classes; insert rows come from
                # the change file, never the file diff (rewritten parts
                # also carry pre-existing rows)
                for key, kind in (
                    ("change_file", "delete"),
                    ("change_file_pre", "update_preimage"),
                    ("change_file_post", "update_postimage"),
                    ("change_file_insert", "insert"),
                ):
                    cf = m.get(key)
                    if cf:
                        parts.extend(
                            _FilePartition(p, v, kind)
                            for p in change_parts(cf)
                        )
                continue
            if op == "update":
                for key, kind in (
                    ("change_file_pre", "update_preimage"),
                    ("change_file_post", "update_postimage"),
                ):
                    cf = m.get(key)
                    if not cf:
                        raise ValueError(
                            f"update version {v} at {self.path} has no "
                            f"recorded {key} — a streaming change feed "
                            "cannot reconstruct the images"
                        )
                    parts.extend(
                        _FilePartition(p, v, kind) for p in change_parts(cf)
                    )
                continue
            if op != "delete":
                continue
            cf = m.get("change_file")
            if not cf:
                raise ValueError(
                    f"delete version {v} at {self.path} has no recorded "
                    "change file — a streaming change feed cannot "
                    "reconstruct removed rows (use the batch "
                    "read_changes predicate fallback, or re-run the "
                    "delete with a delete_where that records changes)"
                )
            parts.extend(
                _FilePartition(p, v, "delete") for p in change_parts(cf)
            )
        if not parts:
            return [_FilePartition(None)]
        return parts

    def read(self, partition: _FilePartition):
        if partition is None or partition.rel_file is None:
            return
        batches = _read_padded(
            os.path.join(self.path, partition.rel_file), self.field_specs
        )
        if getattr(partition, "dv_files", None):
            batches = _dv_masked(
                batches, self.path, partition.dv_files, partition.rel_file
            )
        if not self.read_change_feed:
            yield from batches
            return
        import pyarrow as pa

        for batch in batches:
            n = batch.num_rows
            yield pa.RecordBatch.from_arrays(
                list(batch.columns)
                + [
                    pa.array([partition.version] * n, type=pa.int64()),
                    pa.array([partition.change_type] * n, type=pa.string()),
                ],
                names=list(batch.schema.names)
                + ["_commit_version", "_change_type"],
            )

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint


# ---------------------------------------------------------------------------
# Batch write side: df.write.format("managed_table").mode(...).save(path)
# — same stage-then-commit shape as the stream writer, minus the batch-id
# ledger (batch writes are not replayed by an engine protocol); mode maps
# to the transaction log's append/overwrite commit.
# ---------------------------------------------------------------------------


class ManagedTableWriter(DataSourceWriter):
    def __init__(self, path: str, schema: StructType, overwrite: bool):
        self.path = path
        self.field_names = list(schema.fieldNames())
        self.field_specs = [
            (f.name, f.dataType.simpleString()) for f in schema.fields
        ]
        self.mode = "overwrite" if overwrite else "append"

    def write(self, iterator):
        import uuid

        rel = os.path.join("data", "batch", f"{uuid.uuid4().hex}.parquet")
        n = _stage_rows(
            iterator,
            self.field_names,
            self.field_specs,
            os.path.join(self.path, rel),
        )
        return _StagedFiles(rel if n else None)

    def commit(self, messages) -> None:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        from ssidentity_spark.operators.tablelog import commit_files

        files = [m.rel_file for m in messages if m is not None and m.rel_file]
        if not files and self.mode == "overwrite":
            # an all-empty overwrite must read back as an EMPTY table,
            # not an unreadable one: a files=[] tip breaks schema() and
            # read_versioned (no footer to infer from), so stage one
            # zero-row part carrying the declared schema
            rel = os.path.join("data", "batch", f"{uuid.uuid4().hex}.parquet")
            full = os.path.join(self.path, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            schema = _arrow_schema(self.field_specs)
            pq.write_table(
                pa.table({f.name: [] for f in schema}, schema=schema), full
            )
            files = [rel]
        commit_files(
            self.path,
            files,
            self.mode,
            schema=[[n, t] for n, t in self.field_specs],
        )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.rel_file:
                try:
                    os.remove(os.path.join(self.path, m.rel_file))
                except FileNotFoundError:
                    pass
