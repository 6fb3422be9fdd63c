"""File-level Bloom index: point-lookup data skipping for parquet tables.

Z-order (functions/zorder.py) prunes row groups for BOX predicates via
min/max stats; the complementary gap is the POINT lookup — "show me
everything MAC X ever did" (the reference's core interactive query,
README.md:15-19) — where min/max stats on a high-cardinality key are
useless unless the file happens to be sorted by exactly that key. The
lakehouse answer (parquet's own optional bloom filters, Hudi's bloom
index) is a tiny per-file Bloom bitmap of the key values: a reader
consults kilobytes of index to skip terabytes of files, with zero false
negatives by construction.

Same deterministic md5-slice hash family as operators/bloom.py, computed
JVM-side at index-build time and replayed in plain Python at lookup time
(the two are pinned equal by test). The index is a JSON sidecar under
``_index/`` — per file, ``m_bits/64`` long words; driver traffic is
index-sized, never data-sized.

THE measured lesson (tests + SCALE.md): index selectivity is a property
of LAYOUT, not of the index — on randomly-ordered data every file
contains nearly every key and nothing skips; after clustering
(repartitionByRange on the key — or a z-order write for multi-dim) the
same index skips all but one file. Write-path clustering and read-path
indexing are two halves of one design.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from urllib.parse import unquote, urlparse

from ssidentity_spark.operators.bloom import bloom_positions

INDEX_M_BITS = 1 << 13  # 8 Kib / file — holds ~1k keys at ~3% fp
INDEX_K = 4
_INDEX_FILE = os.path.join("_index", "bloom.json")


def build_bloom_index(
    spark: SparkSession,
    path: str,
    key: str,
    m_bits: int = INDEX_M_BITS,
    k: int = INDEX_K,
    files: list[str] | None = None,
    write_sidecar: bool = True,
) -> dict[str, list[int]]:
    """Scan the table once, computing each data file's key bitmap
    (positions JVM-side via the shared hash family; OR-folding on the
    driver over index-sized traffic), and write the sidecar.

    ``files`` restricts the scan to an explicit (path-relative) file
    list — how a VERSIONED table indexes exactly its manifest's files,
    never orphaned staging data (see operators/managed.py)."""
    if files is not None:
        df = spark.read.parquet(*[os.path.join(path, f) for f in files])
    else:
        df = spark.read.parquet(path)
    # the Python lookup side hashes str(value); Spark's cast-to-string
    # renders doubles/booleans differently ('1.0E20' vs '1e+20'), which
    # would turn into bloom FALSE NEGATIVES — so the index key must be a
    # type whose renderings agree
    kt = df.schema[key].dataType.simpleString()
    if kt not in ("tinyint", "smallint", "int", "bigint", "string"):
        raise TypeError(
            f"bloom index key must be integral or string, got {kt}: "
            "float/bool renderings differ between the JVM index build "
            "and the Python lookup, breaking the no-false-negative "
            "guarantee"
        )
    rows = (
        df.select(
            F.input_file_name().alias("f"),
            F.explode(F.array(*bloom_positions(F.col(key), m_bits, k))).alias(
                "pos"
            ),
        )
        .groupBy("f")
        .agg(F.collect_set("pos").alias("positions"))
        .collect()
    )
    index: dict[str, list[int]] = {}
    for r in rows:
        words = [0] * (m_bits // 64)
        for pos in r["positions"]:
            words[pos // 64] |= 1 << (pos % 64)
        index[_uri_to_rel(r["f"], path)] = words
    if write_sidecar:
        sidecar = os.path.join(path, _INDEX_FILE)
        os.makedirs(os.path.dirname(sidecar), exist_ok=True)
        with open(sidecar + ".tmp", "w") as f:
            json.dump(
                {"key": key, "m_bits": m_bits, "k": k, "files": index}, f
            )
        os.replace(sidecar + ".tmp", sidecar)  # crash-safe swap
    return index


def _uri_to_rel(name: str, path: str) -> str:
    """input_file_name() returns a URI (file:///..., percent-encoded);
    the sidecar keys must match the manifest's plain relative paths."""
    parsed = urlparse(name)
    local = unquote(parsed.path) if parsed.scheme else name
    return os.path.relpath(local, os.path.abspath(path))


def bloom_survivors(index: dict, value, restrict=None) -> list[str]:
    """Files in ``index`` that MIGHT contain ``value`` (no false
    negatives), optionally intersected with ``restrict`` — THE membership
    probe, shared by point_lookup, the managed-table lookup, and the
    managed_table data source partition pruning."""
    m_bits, k = index["m_bits"], index["k"]
    pos = _py_positions(value, m_bits, k)
    return sorted(
        rel
        for rel, words in index["files"].items()
        if (restrict is None or rel in restrict)
        and all((words[p // 64] >> (p % 64)) & 1 for p in pos)
    )


def _py_positions(value, m_bits: int, k: int) -> list[int]:
    """Python replica of bloom_positions — pinned equal by test."""
    s = str(value)
    return [
        int(hashlib.md5(f"{s}#{j}".encode()).hexdigest()[:15], 16) % m_bits
        for j in range(1, k + 1)
    ]


def point_lookup_files(path: str, value) -> list[str]:
    """Files that MIGHT contain ``value`` (no false negatives)."""
    with open(os.path.join(path, _INDEX_FILE)) as f:
        idx = json.load(f)
    return bloom_survivors(idx, value)


def point_lookup(
    spark: SparkSession, path: str, key: str, value
) -> tuple[DataFrame, int, int]:
    """→ (rows for key=value, files read, files total). Result is
    IDENTICAL to a full-scan filter — the index only skips files that
    provably cannot match; the residual filter removes bloom FPs.

    The sidecar is read ONCE (single parse, no replaced-between-reads
    race), and ``key`` is validated against the indexed column: pruning
    by one column's bitmaps while filtering another would silently drop
    matching files — the opposite of the no-false-negative contract."""
    with open(os.path.join(path, _INDEX_FILE)) as f:
        idx = json.load(f)
    if idx.get("key") != key:
        raise ValueError(
            f"point_lookup key {key!r} does not match the indexed column "
            f"{idx.get('key')!r} at {path} — pruning by the wrong bitmaps "
            "would silently return incomplete results"
        )
    n_total = len(idx["files"])
    files = bloom_survivors(idx, value)
    if not files:
        df = spark.read.parquet(path).where(F.col(key) == F.lit(value)).limit(0)
        return df, 0, n_total
    df = spark.read.parquet(
        *[os.path.join(path, rel) for rel in files]
    ).where(F.col(key) == F.lit(value))
    return df, len(files), n_total


# ---------------------------------------------------------------------------
# Min/max range index — the RANGE-predicate half of file skipping
# ---------------------------------------------------------------------------

_MINMAX_FILE = os.path.join("_index", "minmax.json")


def build_minmax_index(
    spark: SparkSession,
    path: str,
    key: str,
    files: list[str] | None = None,
    write_sidecar: bool = True,
) -> dict[str, list]:
    """Per-file ``[min, max]`` of ``key`` — the range-predicate half of
    file skipping (Iceberg manifest column stats / parquet row-group
    stats lifted to FILE granularity, so the planner can drop whole
    files without opening a footer). The bloom index above answers
    equality; min/max answers BETWEEN/>=/<= — together they are the two
    halves of lakehouse data skipping, and BOTH are layout-dependent:
    on a range-clustered write each file owns a narrow key band and a
    range predicate touches few files; on random layout every file
    spans the whole domain and nothing skips (measured, like the bloom
    study — tests).

    Same integral/string key restriction as the bloom index: the JSON
    sidecar must round-trip values exactly."""
    if files is not None:
        df = spark.read.parquet(*[os.path.join(path, f) for f in files])
    else:
        df = spark.read.parquet(path)
    kt = df.schema[key].dataType.simpleString()
    if kt not in ("tinyint", "smallint", "int", "bigint", "string"):
        raise TypeError(
            f"minmax index key must be integral or string, got {kt}: "
            "float NaN/rendering semantics would corrupt the JSON "
            "sidecar's ordering guarantees"
        )
    rows = (
        df.select(F.input_file_name().alias("f"), F.col(key).alias("k"))
        .groupBy("f")
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    index = {_uri_to_rel(r["f"], path): [r["lo"], r["hi"]] for r in rows}
    if write_sidecar:
        sidecar = os.path.join(path, _MINMAX_FILE)
        os.makedirs(os.path.dirname(sidecar), exist_ok=True)
        with open(sidecar + ".tmp", "w") as f:
            json.dump({"key": key, "files": index}, f)
        os.replace(sidecar + ".tmp", sidecar)  # crash-safe swap
    return index


def range_survivors(
    index: dict, lo=None, hi=None, restrict=None
) -> list[str]:
    """Files whose ``[min, max]`` intersects ``[lo, hi]`` (either bound
    None = unbounded). Zero false negatives by construction: a file is
    dropped only when its entire key range lies outside the predicate.
    All-null files (min/max None) are KEPT — stats are absent, not
    exclusionary."""
    out = []
    for rel, (fmin, fmax) in index["files"].items():
        if restrict is not None and rel not in restrict:
            continue
        if fmin is None or fmax is None:
            out.append(rel)
            continue
        if lo is not None and fmax < lo:
            continue
        if hi is not None and fmin > hi:
            continue
        out.append(rel)
    return sorted(out)


def range_lookup(
    spark: SparkSession, path: str, lo, hi
) -> tuple[DataFrame, int, int]:
    """→ (rows with lo <= key <= hi, files read, files total). Identical
    to filtering the full table — the index only removes files that
    provably cannot intersect; the engine re-applies the predicate
    exactly (stats fp costs I/O, never correctness)."""
    with open(os.path.join(path, _MINMAX_FILE)) as f:
        idx = json.load(f)
    key = idx["key"]
    total = len(idx["files"])
    survivors = range_survivors(idx, lo, hi)
    # build the residual predicate bound-by-bound: between(lit(None), x)
    # is SQL null — it would silently filter every row instead of
    # meaning "unbounded" (r7 review)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(key) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(key) <= F.lit(hi))
    if not survivors:
        return (
            spark.read.parquet(path).where(pred).limit(0),
            0,
            total,
        )
    df = spark.read.parquet(
        *[os.path.join(path, f) for f in survivors]
    ).where(pred)
    return df, len(survivors), total
