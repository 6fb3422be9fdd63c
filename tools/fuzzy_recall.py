"""Approximate-join recall study (VERDICT r7 ask #8): the blocked
Levenshtein join (operators/fuzzy.py) trades recall via blocking exactly
like LSH banding trades it via band geometry — measure the trade instead
of asserting it.

Corpus: a planted-typo benchmark built from part names. Each original
string gets exactly ONE typo replica (seeded, deterministic): a
substitution, deletion, or insertion at a hash-chosen position of the
name (never in the id suffix that keeps originals distinct). Planted
truth = the (original, replica) pair, always within edit distance 1.
Blow-up ``factor`` multiplies the number of ORIGINALS (each salted
distinct), so planted structure stays one pair per original while the
candidate space grows quadratically.

Blocking strategies measured (each an equi-join on its key; recall is
lost exactly when the typo perturbs the key):

- ``first_token``  — split()[0] (what j11_fuzzy_part_match uses)
- ``prefix4``      — first 4 characters
- ``len_bucket``   — length // 4 (insert/delete can cross a boundary)
- ``any_token``    — explode tokens, candidate on ANY shared token
- ``stacked``      — union of the selective passes (first_token +
                     prefix4 + any_token): several cheap passes, union,
                     dedup, one verify
- ``one_delete``   — deletion-neighborhood (SymSpell) keys: exact
                     recall for dist <= 1 by construction; productized
                     as operators/fuzzy.deletion_neighborhood_join and
                     gated by j11_fuzzy_symspell's UNBLOCKED oracle

Reported per (factor, strategy): planted-pair recall, candidate pairs,
candidates / n²-ceiling, wall seconds. Prints a markdown table for
SCALE.md.

Usage: python tools/fuzzy_recall.py [sf_dir] [factors-csv]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from ssidentity_spark.io import load_table  # noqa: E402
from ssidentity_spark.session import cpu_count, get_spark  # noqa: E402


def build_corpus(spark, sf_dir: str, factor: int) -> DataFrame:
    """(sid, text, orig_id) — orig_id groups each original with its one
    typo replica; sid is globally unique."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    originals = (
        part.crossJoin(F.broadcast(reps))
        .select(
            (F.col("p_partkey") * 1000 + F.col("rep")).alias("orig_id"),
            # the id token keeps scaled originals distinct without
            # touching the name the typo perturbs
            F.concat(
                F.col("p_name"),
                F.lit(" #"),
                (F.col("p_partkey") * 1000 + F.col("rep")).cast("string"),
            ).alias("text"),
            F.col("p_name").alias("name"),
        )
    )
    # seeded typo inside the name: pos in [0, len(name)), kind in {sub,
    # del, ins} — xxhash64 is deterministic across sessions
    o = originals.withColumn(
        "pos", (F.pmod(F.xxhash64("text"), F.length("name"))).cast("int")
    ).withColumn("kind", (F.pmod(F.xxhash64("text", F.lit(1)), F.lit(3))).cast("int"))
    typo_name = (
        F.when(
            F.col("kind") == 0,  # substitute with a char outside the alphabet
            F.concat(
                F.expr("substring(name, 1, pos)"),
                F.lit("q"),
                F.expr("substring(name, pos + 2)"),
            ),
        )
        .when(
            F.col("kind") == 1,  # delete
            F.concat(
                F.expr("substring(name, 1, pos)"),
                F.expr("substring(name, pos + 2)"),
            ),
        )
        .otherwise(  # insert
            F.concat(
                F.expr("substring(name, 1, pos)"),
                F.lit("q"),
                F.expr("substring(name, pos + 1)"),
            )
        )
    )
    replicas = o.select(
        F.col("orig_id"),
        F.concat(
            typo_name, F.lit(" #"), F.col("orig_id").cast("string")
        ).alias("text"),
    )
    return (
        originals.select(
            (F.col("orig_id") * 2).alias("sid"), "text", "orig_id"
        )
        .unionByName(
            replicas.select(
                (F.col("orig_id") * 2 + 1).alias("sid"), "text", "orig_id"
            )
        )
    )


BLOCKS = {
    "first_token": lambda: F.split(F.col("text"), " ")[0],
    "prefix4": lambda: F.substring(F.col("text"), 1, 4),
    "len_bucket": lambda: (F.length("text") / F.lit(4)).cast("int"),
}


def candidates_for(corpus: DataFrame, strategy: str) -> DataFrame:
    """(sid_a < sid_b) candidate pairs under the strategy, deduped."""
    if strategy in BLOCKS:
        keyed = corpus.select(
            BLOCKS[strategy]().alias("bk"), "sid", "text", "orig_id"
        )
        keyed_b = keyed.select(
            "bk",
            F.col("sid").alias("sid_b"),
            F.col("text").alias("text_b"),
            F.col("orig_id").alias("orig_b"),
        )
        return (
            keyed.join(keyed_b, "bk")
            .filter(F.col("sid") < F.col("sid_b"))
            .select("sid", "sid_b", "text", "text_b", "orig_id", "orig_b")
            .dropDuplicates(["sid", "sid_b"])
        )
    if strategy == "any_token":
        tok = corpus.select(
            "sid", "text", "orig_id", F.explode(F.split("text", " ")).alias("bk")
        ).filter(
            # the #id disambiguation token is shared ONLY by a planted
            # pair — blocking on it would trivially find every planted
            # pair and measure nothing; block on real name tokens
            (F.length("bk") > 0) & ~F.col("bk").startswith("#")
        )
        tok_b = tok.select(
            "bk",
            F.col("sid").alias("sid_b"),
            F.col("text").alias("text_b"),
            F.col("orig_id").alias("orig_b"),
        )
        return (
            tok.join(tok_b, "bk")
            .filter(F.col("sid") < F.col("sid_b"))
            .select("sid", "sid_b", "text", "text_b", "orig_id", "orig_b")
            .dropDuplicates(["sid", "sid_b"])
        )
    if strategy == "one_delete":
        # deletion-neighborhood blocking (the public SymSpell idea): key
        # every string by itself PLUS each of its 1-character deletions.
        # Any pair at edit distance 1 shares a key by construction
        # (substitution: both delete the edited position; insert/delete:
        # the shorter string IS a deletion key of the longer), so recall
        # is exactly 1.0 for dist<=1 — the blocking stops being a
        # recall trade and becomes an index. Explode factor is O(L) per
        # string; key entropy is near-unique, so bucket sizes — and the
        # candidate count — track the PLANTED structure, not n².
        keyed = corpus.select(
            "sid",
            "text",
            "orig_id",
            F.explode(
                F.concat(
                    F.array(F.col("text")),
                    F.expr(
                        "transform(sequence(1, length(text)), i -> "
                        "concat(substring(text, 1, i-1), substring(text, i+1)))"
                    ),
                )
            ).alias("bk"),
        )
        keyed_b = keyed.select(
            "bk",
            F.col("sid").alias("sid_b"),
            F.col("text").alias("text_b"),
            F.col("orig_id").alias("orig_b"),
        )
        return (
            keyed.join(keyed_b, "bk")
            .filter(F.col("sid") < F.col("sid_b"))
            .select("sid", "sid_b", "text", "text_b", "orig_id", "orig_b")
            .dropDuplicates(["sid", "sid_b"])
        )
    if strategy == "stacked":
        # union of the SELECTIVE passes only — len_bucket is excluded
        # because on a low-length-variance corpus it degenerates toward
        # O(n²) (measured: 69% of the pair ceiling at 3x) and a union
        # containing it inherits that cost for ~no recall it uniquely
        # contributes
        parts = [
            candidates_for(corpus, s)
            for s in ("first_token", "prefix4", "any_token")
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.dropDuplicates(["sid", "sid_b"])
    raise ValueError(strategy)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    factors = [int(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "1,3,10").split(",")]
    spark = get_spark("fuzzy-recall", cores=cpu_count())
    spark.conf.set("spark.sql.shuffle.partitions", str(cpu_count()))

    print("| factor | strategy | n | planted | recall | candidates | cand/n²-ceiling | sec |")
    print("|---|---|---|---|---|---|---|---|")
    for factor in factors:
        corpus = build_corpus(spark, sf_dir, factor).cache()
        n = corpus.count()
        planted = n // 2
        ceiling = n * (n - 1) // 2
        strategies = [
            "first_token",
            "prefix4",
            "len_bucket",
            "any_token",
            "stacked",
            "one_delete",
        ]
        if factor >= 10:
            # len_bucket is already measured degenerate at 3x; at 10x it
            # is a 500M-pair verify for nothing new
            strategies.remove("len_bucket")
        for strategy in strategies:
            t0 = time.perf_counter()
            cand = candidates_for(corpus, strategy)
            verified = cand.filter(
                F.levenshtein("text", "text_b", 2) >= 0
            )
            found_planted = (
                verified.filter(F.col("orig_id") == F.col("orig_b"))
                .count()
            )
            n_cand = cand.count()
            dt = time.perf_counter() - t0
            print(
                f"| {factor}x | {strategy} | {n} | {planted} "
                f"| {found_planted / planted:.3f} | {n_cand} "
                f"| {n_cand / ceiling:.5%} | {dt:.2f} |"
            )
        corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
