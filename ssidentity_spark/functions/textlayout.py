"""Similarity-ordered storage layout for text corpora.

Parquet compresses pages independently, so ROW ORDER changes the bytes
on disk: near-duplicate / shared-boilerplate documents that land in the
same page share dictionary and backreference context. Clustering the
corpus by a 32-bit SimHash before the write is measured at **-11.5%
parquet bytes vs a shuffled corpus** at 30% planted near-dups (prefix
sort manages only -4.6% — it can't see duplication past the first
divergent byte; tools/layout_compression.py, SCALE.md "r9: layout").

The rewrite slot is OPTIMIZE's ``repartition_fn`` — the same hook
Z-order uses for numeric box queries — so the layout is applied during
the compaction the table needs anyway, read-identical by the optimize
contract.

``simhash32`` is a PURE Column expression (one pass over the token
array, no explode/groupBy), so the layout key adds no shuffle of its
own: ``repartitionByRange`` on it is the only exchange, exactly like a
zorder rewrite. It deliberately trades fidelity for expression-onlyness
vs plans/dedup.dedup_simhash (same hash family, same bit rule; that one
is the oracle-gated analytics form, this one is the layout key).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def simhash32(text: Column) -> Column:
    """32-bit SimHash of whitespace-tokenized ``text`` as a single
    Column expression: per token, an md5-slice 60-bit hash votes ±1 on
    each of 32 bits; the signature sets the bits with positive votes."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")

    def h(t: Column) -> Column:
        return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")

    def vote(b: int) -> Column:
        return F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc
            + (F.shiftright(h(t), b).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    out = F.lit(0).cast("long")
    for b in range(32):
        out = out + F.when(vote(b) > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0)
        )
    return out
