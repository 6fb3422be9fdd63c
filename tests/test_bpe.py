"""BPE training/tokenization (operators/bpe.py): known-corpus merges, the
canonical-form edge cases the docstring claims (back-to-back pairs,
greedy ties, boundary safety), and plan hygiene for the apply chain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssidentity_spark.operators.bpe import (
    bpe_apply,
    bpe_train,
    token_count,
    word_vocab,
)


def _vocab_from_words(spark, word_counts):
    docs = spark.createDataFrame(
        [(" ".join([w] * c),) for w, c in word_counts], "text string"
    )
    return word_vocab(docs)


def test_learns_expected_merges_on_known_corpus(spark):
    # 'low'x5, 'lower'x2, 'newest'x6, 'widest'x3 — the Sennrich toy
    # corpus shape: 'es' (9) then 'est' (9) then 'est</w>' (9) dominate
    vocab = _vocab_from_words(
        spark, [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    )
    table, merges = bpe_train(spark, vocab, k=3)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>")]
    rows = {r["it"]: (r["lhs"], r["rhs"], r["pair_count"]) for r in table.collect()}
    assert rows[0] == ("e", "s", 9)
    assert rows[1] == ("es", "t", 9)
    assert rows[2] == ("est", "</w>", 9)


def test_back_to_back_pair_occurrences_both_merge(spark):
    vocab = _vocab_from_words(spark, [("abab", 3)])
    _table, merges = bpe_train(spark, vocab, k=1)
    assert merges == [("a", "b")]
    applied = (
        vocab.select(bpe_apply(F.col("s"), merges).alias("s"))
        .collect()[0]["s"]
    )
    assert applied == " ab  ab  </w> "


def test_greedy_tie_merges_leftmost_only(spark):
    vocab = _vocab_from_words(spark, [("aaa", 2)])
    _t, merges = bpe_train(spark, vocab, k=1)
    assert merges == [("a", "a")]
    applied = (
        vocab.select(bpe_apply(F.col("s"), merges).alias("s"))
        .collect()[0]["s"]
    )
    # greedy left-to-right: (aa, a), never (a, aa)
    assert applied == " aa  a  </w> "


def test_merge_is_boundary_safe(spark):
    # after merging (a,b)→ab, a later merge (b,c) must not fire inside
    # 'ab  c' (b is a suffix of the merged token, not a free symbol)
    vocab = _vocab_from_words(spark, [("abc", 1)])
    s0 = vocab.collect()[0]["s"]
    merged = bpe_apply(F.lit(s0), [("a", "b"), ("b", "c")])
    out = spark.range(1).select(merged.alias("s")).collect()[0]["s"]
    assert out == " ab  c  </w> "  # (b,c) correctly found nothing


def test_token_count_and_compression(spark):
    vocab = _vocab_from_words(spark, [("banana", 4)])
    _t, merges = bpe_train(spark, vocab, k=2)
    n = (
        vocab.select(token_count(bpe_apply(F.col("s"), merges)).alias("n"))
        .collect()[0]["n"]
    )
    # 7 symbols (6 chars + </w>) minus one per applied merge occurrence:
    # 'an' appears twice → first merge saves 2, second saves >=1
    assert n <= 4


def test_early_stop_on_exhausted_vocab(spark):
    vocab = _vocab_from_words(spark, [("ab", 1)])
    table, merges = bpe_train(spark, vocab, k=10)
    # 'ab</w>' has 2 pairs, then 1, then 0 → at most 3 merges recorded
    assert len(merges) <= 3
    assert table.count() == len(merges)


def test_apply_chain_stays_jvm(spark):
    docs = spark.createDataFrame([("x y z",)], "text string")
    vocab = word_vocab(docs)
    plan = (
        vocab.select(bpe_apply(F.col("s"), [("x", "</w>")]).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_wordpiece_objective_differs_from_bpe(spark):
    """On 'aaab' x100: BPE merges the most FREQUENT pair (a,a) [c=200],
    WordPiece the most LIKELY pair (b,</w>) [c=100 but rare symbols:
    100/(100*100) beats 200/(300*300)] — pinning that the objective is
    really the likelihood ratio, not the raw count."""
    import pandas as pd

    from ssidentity_spark.operators.bpe import (
        bpe_train,
        word_vocab,
        wordpiece_train,
    )

    docs = spark.createDataFrame(
        pd.DataFrame({"text": ["aaab"] * 100})
    )
    vocab = word_vocab(docs)
    _bt, bpe_merges = bpe_train(spark, vocab, k=1)
    _wt, wp_merges = wordpiece_train(spark, vocab, k=1)
    assert bpe_merges == [("a", "a")]
    assert wp_merges == [("b", "</w>")]
    # the merge table carries the objective's inputs
    row = _wt.collect()[0]
    assert (row["pair_count"], row["lhs_count"], row["rhs_count"]) == (
        100, 100, 100,
    )


def test_tokenize_oracle_parity_when_training_exhausts(spark, tmp_path):
    """The DuckDB tokenize oracle must agree with the Spark query on a
    corpus whose vocab exhausts before all _BPE_K merge rounds: the empty
    late-round merge tables used to NULL the scalar replace patterns and
    NULL-collapse every document's counts (r7 review); each stage now
    coalesces back to the unmerged string, matching Spark's early stop."""
    import duckdb

    from ssidentity_spark.plans.text import _BPE_TOKENIZE_ORACLE, text_bpe_tokenize

    rows = [(1, "aa aa ab"), (2, "aa b")]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    got = {
        r.doc_id: (r.n_words, r.n_symbols_before, r.n_tokens, r.compression)
        for r in text_bpe_tokenize(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    want = {
        r[0]: tuple(r[1:]) for r in con.execute(_BPE_TOKENIZE_ORACLE).fetchall()
    }
    assert want and None not in {v for t in want.values() for v in t}
    assert got == want
