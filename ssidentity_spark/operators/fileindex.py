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
    provably cannot match; the residual filter removes bloom FPs."""
    with open(os.path.join(path, _INDEX_FILE)) as f:
        n_total = len(json.load(f)["files"])
    files = point_lookup_files(path, value)
    if not files:
        df = spark.read.parquet(path).where(F.col(key) == F.lit(value)).limit(0)
        return df, 0, n_total
    df = spark.read.parquet(
        *[os.path.join(path, rel) for rel in files]
    ).where(F.col(key) == F.lit(value))
    return df, len(files), n_total
