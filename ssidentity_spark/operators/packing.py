"""Sequence packing: fixed-length training sequences from a tokenized
corpus — the standard LLM-pretraining packing step (concatenate documents
in a deterministic order, chunk the token stream into ``seq_len``-sized
sequences, keep the doc↔sequence boundary map as the audit trail).

Reference impetus: the reference stores raw observations and defers all
batching to query time (README.md:15-19); a corpus pipeline feeding a
trainer needs the opposite — a deterministic, reproducible physical
batching. This is the one standard corpus operator SURVEY §2.10 lacked
(VERDICT r6 ask #6).

Design for 100 TB:

- **Bucketed, not global.** A single global concatenation order would
  force one global cumulative sum — a sequential dependency (and Spark's
  ``Window.orderBy`` without ``partitionBy`` collapses to ONE partition:
  the classic scale trap). Instead docs hash into ``n_buckets``
  independent streams (``doc_id % n_buckets``) and each bucket packs in
  parallel: same determinism, same fill ratio (one possibly-short tail
  sequence per bucket instead of one total), embarrassingly parallel.
  Size ``n_buckets`` to ~10× executor count on a real cluster.
- **Deterministic order** inside a bucket: ``(md5(text), doc_id)`` — the
  same content-addressed shuffle order the dedup/split operators use, so
  re-runs (and the DuckDB oracle) reproduce byte-identical packing.
- **Docs split across sequence boundaries** (GPT-style packing): every
  sequence except each bucket's last is EXACTLY full — no padding waste,
  no first-fit heuristics, and the whole computation is integer window
  arithmetic (one cumulative sum + one bounded explode), which is what
  makes it hash-gateable cross-engine.

The output is the boundary map: one row per (document × sequence it
occupies) with the in-doc token span and the in-sequence offset. A doc
shorter than ``seq_len`` yields one row; a doc spanning k boundaries
yields k+1 rows. ``sum(doc_to - doc_from)`` grouped by sequence
reconstructs the fill; grouped by doc it reconstructs ``n_tokens`` —
both pinned by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# the same BPE-ish token regex the text family counts with
# (plans/text.py:_TOKEN_RE) so packing composes with tokenization
TOKEN_RE = r"\w+|[^\w\s]"


def pack_token_counts(
    counts: DataFrame,
    seq_len: int = 2048,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    order_col: str = "m",
) -> DataFrame:
    """Core packing arithmetic over PRE-COMPUTED per-doc token counts:
    ``counts`` carries (id, deterministic order key, token count) — the
    entry point for composing packing with a real tokenizer (BPE counts
    from ``text_bpe_tokenize``) instead of the regex estimate.

    Returns the boundary map ``(bucket, seq_no, doc_id, doc_from,
    doc_to, seq_offset)``; zero-token rows are excluded (they occupy no
    positions and would emit degenerate zero-width spans)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_buckets < 1:
        # % 0 is DIVIDE_BY_ZERO under ANSI and a silent one-partition
        # collapse (bucket NULL) without — the exact trap this module
        # exists to avoid
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    L = F.lit(seq_len)
    t = counts.select(
        F.col(id_col).alias("doc_id"),
        F.col(order_col).alias("m"),
        (F.col(id_col) % n_buckets).cast("int").alias("bucket"),
        F.col(count_col).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("bucket")
        .orderBy("m", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = t.select(
        "bucket",
        "doc_id",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("s"),
    )
    # integer DIV (not floor of a double divide): bit-exact at any scale
    spans = o.select(
        "bucket",
        "doc_id",
        "n_tokens",
        "s",
        F.explode(
            F.sequence(
                F.expr(f"s DIV {seq_len}"),
                F.expr(f"(s + n_tokens - 1) DIV {seq_len}"),
            )
        ).alias("seq_no"),
    )
    return spans.select(
        "bucket",
        "seq_no",
        "doc_id",
        F.greatest(F.lit(0), F.col("seq_no") * L - F.col("s")).alias("doc_from"),
        F.least(F.col("n_tokens"), (F.col("seq_no") + 1) * L - F.col("s")).alias(
            "doc_to"
        ),
        F.greatest(F.lit(0), F.col("s") - F.col("seq_no") * L).alias("seq_offset"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boundary map of the packed corpus from raw text: token counts via
    the shared BPE-ish regex, order key md5(text). See
    :func:`pack_token_counts` for the arithmetic and the composed form."""
    counts = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.encode(text_col, "UTF-8")).alias("m"),
        F.regexp_count(text_col, F.lit(TOKEN_RE)).cast("bigint").alias("n_tokens"),
    )
    return pack_token_counts(
        counts, seq_len=seq_len, n_buckets=n_buckets
    )


def pack_nosplit(
    counts: DataFrame,
    seq_len: int = 2048,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    order_col: str = "m",
    oversize: str = "error",
) -> DataFrame:
    """NO-SPLIT packing: every document lands WHOLE inside one sequence
    (the SFT / instruction-tuning constraint — an example must never
    cross a sequence boundary), via next-fit-decreasing per bucket:
    docs sort by token count DESC (deterministic (order, id) tiebreak),
    and each doc joins the current open sequence if it fits, else opens
    a new one. Unlike the split form, fill < 1.0 is inherent — the
    per-sequence fill is the audit the caller monitors.

    Scale shape: each bucket's fold is a per-key ARRAY aggregate (the
    ts_ema / w6 pattern) — sequential by nature (bin packing is), so
    parallelism comes from bucket count and bucket size is the memory
    bound: size ``n_buckets`` so a bucket's (id, len) pairs fit a task
    (tens of bytes per doc — 10M docs/bucket ≈ a few hundred MB; cap
    accordingly). Next-fit (not first-fit) is deliberate: it needs O(1)
    fold state, and on DESC-sorted input its fill is within a few
    percent of first-fit-decreasing while staying engine-replayable as
    a linear recurrence (the DuckDB oracle replays it as a recursive
    CTE).

    ``oversize``: a doc longer than ``seq_len`` cannot be packed whole —
    ``'error'`` raises at evaluation (raise_error guard inside the
    plan); ``'drop'`` excludes them (the caller truncates upstream).

    Returns ``(bucket, seq_no, doc_id, n_tokens, seq_offset)`` — one row
    per document."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if oversize not in ("error", "drop"):
        raise ValueError(f"oversize must be error|drop, got {oversize!r}")
    L = F.lit(seq_len)
    t = counts.select(
        F.col(id_col).alias("doc_id"),
        F.col(order_col).alias("m"),
        (F.col(id_col) % n_buckets).cast("int").alias("bucket"),
        F.col(count_col).cast("bigint").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    if oversize == "drop":
        t = t.filter(F.col("n_tokens") <= L)
    else:
        t = t.withColumn(
            "n_tokens",
            F.when(
                F.col("n_tokens") > L,
                F.raise_error(
                    F.concat(
                        F.lit("pack_nosplit: doc "),
                        F.col("doc_id").cast("string"),
                        F.lit(f" exceeds seq_len {seq_len}; truncate "
                              "upstream or pass oversize='drop'"),
                    )
                ).cast("bigint"),
            ).otherwise(F.col("n_tokens")),
        )
    # sort key: length DESC via (L - n), then (m, doc_id) — sort_array is
    # ascending over the struct fields in order
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                (L - F.col("n_tokens")).alias("inv"),
                F.col("m").alias("m"),
                F.col("doc_id").alias("doc_id"),
                F.col("n_tokens").alias("n"),
            )
        )
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("bin"),
        F.lit(0).cast("long").alias("fill"),
        F.expr(
            "CAST(array() AS array<struct<doc_id: bigint, n: bigint,"
            " bin: bigint, off: bigint>>)"
        ).alias("out"),
    )

    def step(acc, e):
        fits = acc["fill"] + e["n"] <= L
        nbin = F.when(fits, acc["bin"]).otherwise(acc["bin"] + 1)
        noff = F.when(fits, acc["fill"]).otherwise(F.lit(0).cast("long"))
        nfill = noff + e["n"]
        row = F.struct(
            e["doc_id"].alias("doc_id"),
            e["n"].alias("n"),
            nbin.alias("bin"),
            noff.alias("off"),
        )
        return F.struct(
            nbin.alias("bin"),
            nfill.alias("fill"),
            F.concat(acc["out"], F.array(row)).alias("out"),
        )

    folded = t.groupBy("bucket").agg(
        F.aggregate(arr, zero, step).alias("st")
    )
    return folded.select(
        "bucket", F.explode(F.col("st.out")).alias("e")
    ).select(
        "bucket",
        F.col("e.bin").alias("seq_no"),
        F.col("e.doc_id").alias("doc_id"),
        F.col("e.n").alias("n_tokens"),
        F.col("e.off").alias("seq_offset"),
    )
