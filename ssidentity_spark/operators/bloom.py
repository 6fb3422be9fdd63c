"""Bloom-filter join pruning: drop fact rows map-side BEFORE the shuffle.

The 100 TB problem (SURVEY §4, SCALE.md): a selective dim-side predicate
(think: the reference's watchlist subset of MACs, ssidentity.c:33-37 —
"flag known devices") joined against an enormous fact table. When the dim
side is small Spark broadcasts the join and nothing more is needed; but
once the surviving dim KEY SET is millions of rows, the join becomes a
shuffle SMJ and every fact row — overwhelmingly rows that will never
match — pays the shuffle write/read. A Bloom filter of the dim keys is
hundreds-of-times smaller than the key set itself, broadcasts cheaply,
and filters the fact scan *inside the map task*, so only candidate rows
ever reach the exchange. False positives are removed by the real join
that follows; false negatives are impossible by construction, so the
plan's RESULT is bit-identical to the plain join — which is exactly what
lets the driver hash-gate it against a plain-SQL oracle.

Spark 3.3+ has an internal runtime-filtering rewrite of the same shape
(InjectRuntimeFilter); this is the explicit, deterministic form — the
hash functions are the same md5-slice family the deterministic sketches
use (operators/sketches.py), so every bit position is reproducible
cross-engine and the membership test is a plain JVM Column expression
(no UDF, stays inside whole-stage codegen).

Geometry: m = 2^16 bits (8 KiB → 1024 long words), k = 4 hashes. The
md5 60-bit slice mod a power-of-two m is exactly uniform (no modulo
bias). For n inserted keys the false-positive rate is
(1 - e^(-k·n/m))^k — ~2.4e-3 at n = 2048, pinned by test. At 100 TB
scale m is a config knob: even m = 2^30 (128 MiB bitmap) broadcasts in
seconds and holds ~10^8 keys at <1% fp.

Driver traffic is bounded by the BITMAP (≤ m bits as distinct positions),
never by the dim cardinality — same bounded-model discipline as the IVF
centroid collect (operators/ivf.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_M_BITS = 1 << 16  # power of two → unbiased modulo of the 60-bit slice
BLOOM_K = 4
_WORDS = BLOOM_M_BITS // 64

# guardrail: the bitmap literal must stay plan-size-realistic (ADVICE.md
# taught this lesson for streaming-ANN centroid literals) — 2^20 bits is
# 16384 long literals, already generous for a Catalyst expression tree.
MAX_LITERAL_BITS = 1 << 20


def bloom_positions(key: Column, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K) -> list[Column]:
    """The k bit positions for ``key`` — md5('key#j') 60-bit slice mod m.

    Matches DuckDB ``CAST(('0x'||substr(md5(k||'#j'),1,15)) AS BIGINT) % m``
    bit-for-bit (same primitive the Count-Min oracle uses)."""
    key_s = key.cast("string")
    return [
        F.conv(
            F.substring(F.md5(F.concat(key_s, F.lit(f"#{j}"))), 1, 15), 16, 10
        ).cast("long")
        % m_bits
        for j in range(1, k + 1)
    ]


def build_bloom(
    dim: DataFrame, key: str, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> list[int]:
    """Build the bitmap from a dim-side key column.

    Distributed part: explode each key into its k positions and
    ``distinct()`` them — a single narrow shuffle over ≤ m_bits values.
    Driver part: OR the positions into ``m_bits/64`` long words. The
    collect is bounded by the bitmap size, not the dim cardinality.
    """
    if m_bits % 64 or m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two and a multiple of 64")
    pos_rows = (
        # NULL keys hash to NULL positions which would crash the driver
        # fold below; the inner join this bloom guards drops NULL keys
        # anyway, so excluding them preserves the no-false-negative
        # contract (fileindex.build_bloom_index gets the same effect from
        # collect_set's null-skipping)
        dim.where(F.col(key).isNotNull())
        .select(
            F.explode(F.array(*bloom_positions(F.col(key), m_bits, k))).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos_rows:
        words[r["pos"] // 64] |= 1 << (r["pos"] % 64)
    # two's-complement into Spark's signed LongType
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def might_contain(
    words: list[int], key: Column, m_bits: int = BLOOM_M_BITS, k: int = BLOOM_K
) -> Column:
    """Membership test as a pure JVM Column expression (codegen-friendly):
    all k bits set ⇒ maybe-member; any bit clear ⇒ definitely absent.
    Refuses bitmaps past MAX_LITERAL_BITS — use
    ``might_contain_broadcast`` there (the expression-tree cost of the
    literal array is the constraint, not the bitmap itself)."""
    if m_bits > MAX_LITERAL_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds MAX_LITERAL_BITS={MAX_LITERAL_BITS} — "
            "a multi-MB bitmap as a plan literal bloats plan serialization. "
            "Use might_contain_broadcast (the bitmap ships once per "
            "executor as a Spark broadcast), the per-file bloom index "
            "(operators/fileindex.py, prunes whole files before any scan), "
            "or Spark's native runtime filter "
            "(spark.sql.optimizer.runtime.bloomFilter.enabled)"
        )
    bitmap = F.array(*[F.lit(w) for w in words])
    checks = []
    for pos in bloom_positions(key, m_bits, k):
        word = F.element_at(bitmap, (pos / F.lit(64)).cast("int") + F.lit(1))
        # pyspark's shiftleft wrapper pins numBits to a python int; the SQL
        # function takes an expression — call it by name
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        checks.append(word.bitwiseAND(bit) != F.lit(0))
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_pruned_join(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Inner-join ``fact`` to ``dim`` with a Bloom pre-filter on the fact
    side. Result is IDENTICAL to the plain join (the join removes the
    false positives); the pre-filter only changes how many fact rows
    reach the exchange."""
    words = build_bloom(dim, dim_key, m_bits, k)
    pruned = fact.where(might_contain(words, F.col(fact_key), m_bits, k))
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], "inner")


def might_contain_broadcast(
    spark,
    words: list[int],
    key: Column,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> Column:
    """The large-bitmap form: the words ship ONCE per executor as a Spark
    broadcast (a 128 MiB bitmap at m=2^30 broadcasts in seconds), and the
    membership test runs as a vectorized Arrow pandas_udf over numpy —
    the documented upgrade path past MAX_LITERAL_BITS. Semantics are
    identical to ``might_contain`` (pinned by test); the trade is the
    Python-worker hop, which the bitmap size, not the row count, decides
    — at 10^5+ distinct dim keys the literal expression tree is the
    bigger cost."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    arr = np.array([w & 0xFFFFFFFFFFFFFFFF for w in words], dtype=np.uint64)
    bc = spark.sparkContext.broadcast(arr)

    @pandas_udf("boolean")
    def _member(keys: pd.Series) -> pd.Series:
        import hashlib

        bitmap = bc.value
        out = []
        for v in keys:
            ok = True
            s = str(v)
            for j in range(1, k + 1):
                pos = (
                    int(hashlib.md5(f"{s}#{j}".encode()).hexdigest()[:15], 16)
                    % m_bits
                )
                if not (int(bitmap[pos // 64]) >> (pos % 64)) & 1:
                    ok = False
                    break
            out.append(ok)
        return pd.Series(out)

    return _member(key.cast("string"))
