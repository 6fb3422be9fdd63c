"""Approximate (fuzzy) string join: blocked candidate generation +
edit-distance verification — the standard entity-resolution/data-cleaning
join the exact J-family lacks.

Reference impetus: the sniffer's SSID field is free text typed by humans
(ssidentity.c:156-166 sanitizes it); "MyHomeWiFi" / "MyHomeWifi" /
"MyHomeWiFi_5G" are one network to an analyst. The general op — find
string pairs within edit distance k without the O(n²) all-pairs scan —
is the same one a corpus pipeline runs to reconcile near-identical
titles/sources.

Shape (the same candidates-then-verify discipline as every dedup here):

- **Blocking**: an EQUI join on a caller-chosen blocking key (here: a
  token of the string) generates candidates — pairwise work is
  O(Σ block²), bounded by block cardinality, never O(n²). Recall is
  traded exactly like LSH banding: pairs whose typo falls IN the
  blocking token are missed; production stacks several blocking passes
  (token, prefix, length bucket) and unions them.
- **Cheap prune**: ``abs(len(a) − len(b)) ≤ k`` is a Levenshtein lower
  bound — rows failing it never reach the dynamic-programming verify.
- **Verify**: the built-in ``levenshtein`` (JVM codegen; identical
  classic edit-distance semantics in DuckDB, which is what makes the op
  hash-gateable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block: Column,
    max_dist: int = 2,
    min_dist: int = 1,
) -> DataFrame:
    """Pairs (id_a < id_b) whose ``text_col`` values are within
    ``[min_dist, max_dist]`` edit distance AND share the blocking key.
    ``min_dist=1`` excludes exact duplicates by default (exact dedup is
    a cheaper, separate operator). Returns
    ``(id_a, id_b, text_a, text_b, dist)``.
    """
    if max_dist < min_dist or min_dist < 0:
        raise ValueError(f"need 0 <= min_dist <= max_dist, got {min_dist}..{max_dist}")
    t = df.select(
        F.col(id_col).alias("fj_id"),
        F.col(text_col).alias("fj_text"),
        block.alias("fj_block"),
    )
    a = t.select(
        F.col("fj_block"),
        F.col("fj_id").alias("id_a"),
        F.col("fj_text").alias("text_a"),
    )
    b = t.select(
        F.col("fj_block"),
        F.col("fj_id").alias("id_b"),
        F.col("fj_text").alias("text_b"),
    )
    return (
        a.join(b, "fj_block")
        .filter(F.col("id_a") < F.col("id_b"))
        # length-difference lower bound prunes before the DP verify
        .filter(
            F.abs(F.length("text_a") - F.length("text_b")) <= max_dist
        )
        .select(
            "id_a",
            "id_b",
            "text_a",
            "text_b",
            # threshold form (Spark >= 3.5): bounds the DP band to
            # O(max_dist * n) per pair and short-circuits to -1 past the
            # threshold, which the dist >= min_dist filter (min_dist >= 0)
            # already excludes — unbounded Levenshtein is O(len_a * len_b)
            # per candidate pair for distances we were going to discard
            F.levenshtein("text_a", "text_b", threshold=int(max_dist)).alias(
                "dist"
            ),
        )
        .filter((F.col("dist") >= min_dist) & (F.col("dist") <= max_dist))
    )
