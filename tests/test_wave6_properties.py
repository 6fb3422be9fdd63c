"""r9 wave-6 semantics on controlled corpora: sparse tf-idf cosine pairs
(U6g) and the retrieval-eval scorecard (E1). The driver-gate hash rows pin
Spark ≡ DuckDB on the real tables; these pin the SEMANTICS."""

from __future__ import annotations

import math

from ssidentity_spark.plans.text import _SC_DF_CAP
from ssidentity_spark.registry import REGISTRY


def _docs(spark, tmp_path, texts):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def _pairs(spark, tmp_path, texts):
    out = REGISTRY["text_sparse_cosine_pairs"].fn(
        spark, _docs(spark, tmp_path, texts)
    )
    return {(r["doc_a"], r["doc_b"]): (r["n_shared"], r["cos"]) for r in out.collect()}


def test_identical_docs_score_exactly_one(spark, tmp_path):
    t = "alpha beta gamma delta epsilon zeta"
    got = _pairs(spark, tmp_path, [t, t, "totally different words here now"])
    assert set(got) == {(0, 1)}
    assert got[(0, 1)][1] == 1.0


def test_disjoint_docs_never_pair(spark, tmp_path):
    got = _pairs(
        spark,
        tmp_path,
        ["a b c d e f", "g h i j k l", "m n o p q r"],
    )
    assert got == {}


def test_boilerplate_shingle_above_df_cap_generates_no_candidates(
    spark, tmp_path
):
    """Docs whose ONLY shared shingle sits in more than DF_CAP documents
    must not pair at all — the posting-list bound that keeps the
    candidate volume sum(df^2 | df <= cap), never O(n^2)."""
    texts = [f"common one two u{i}a u{i}b u{i}c" for i in range(_SC_DF_CAP + 1)]
    got = _pairs(spark, tmp_path, texts)
    # "common one two" has df = cap+1 (pruned); every cross-boundary
    # shingle ("two u{i}a ...") is unique per doc
    assert got == {}


def test_cosine_matches_hand_computed_tfidf(spark, tmp_path):
    """3 docs, overlap only between 0 and 1 on one shingle — verify the
    exact tf-idf cosine value against a by-hand computation."""
    a = "x y z p q"  # shingles: xyz yzp zpq
    b = "x y z p r"  # shingles: xyz yzp zpr
    fillers = ["aa bb cc dd", "ee ff gg hh", "ii jj kk ll"]
    got = _pairs(spark, tmp_path, [a, b, *fillers])
    assert set(got) == {(0, 1)}
    n_shared, cos = got[(0, 1)]
    assert n_shared == 2  # "x y z" and "y z p", each df = 2 of 5 docs
    s, u = math.log(5 / 2), math.log(5 / 1)
    expect = round(2 * s**2 / (2 * s**2 + u**2), 6)
    assert cos == expect


def _embed(spark, tmp_path, rows):
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    out = REGISTRY["sim_retrieval_eval"].fn(spark, sf)
    return {r["query_id"]: r.asDict() for r in out.collect()}


def test_perfectly_separated_labels_score_perfect_metrics(spark, tmp_path):
    """Label-0 vectors cluster at [1, eps_i], label-1 at [eps_i, 1]; the
    query (vec 0, label 0) retrieves only label-0 neighbors in its
    top-10 -> precision = mrr = ndcg = 1, recall = 10 / n_rel."""
    rows = []
    for i in range(12):  # label 0: ids 0..11 -> n_rel = 11
        rows.append((i, [1.0, 0.001 * i], 0))
    for i in range(12, 24):
        rows.append((i, [0.001 * i, 1.0], 1))
    got = _embed(spark, tmp_path, rows)
    assert set(got) == {0}  # stride 25: only vec_id 0 queries
    m = got[0]
    assert m["n_rel"] == 11 and m["hits"] == 10
    assert m["precision_at_k"] == 1.0
    assert m["recall_at_k"] == round(10 / 11, 6)
    assert m["mrr_at_k"] == 1.0
    assert m["ndcg_at_k"] == 1.0


def test_unique_label_query_has_null_recall_and_ndcg(spark, tmp_path):
    rows = [(0, [1.0, 0.0], 7)] + [
        (i, [0.5, 0.5 + 0.001 * i], 1) for i in range(1, 15)
    ]
    got = _embed(spark, tmp_path, rows)
    m = got[0]
    assert m["n_rel"] == 0 and m["hits"] == 0
    assert m["recall_at_k"] is None and m["ndcg_at_k"] is None
    assert m["mrr_at_k"] == 0.0 and m["precision_at_k"] == 0.0


def test_first_relevant_at_rank_two_halves_mrr(spark, tmp_path):
    """One off-label vector sits closest to the query; the first
    relevant lands at rank 2 -> mrr = 1/2, and dcg loses exactly the
    rank-1 slot."""
    rows = [(0, [1.0, 0.0], 0)]
    rows.append((1, [1.0, 0.0001], 9))  # nearest, wrong label
    for i in range(2, 13):  # 11 same-label, slightly farther
        rows.append((i, [1.0, 0.01 * i], 0))
    got = _embed(spark, tmp_path, rows)
    m = got[0]
    assert m["mrr_at_k"] == 0.5
    assert m["hits"] == 9  # top-10 = 1 wrong + 9 right (11 available)
    dcg = sum(1 / math.log2(r + 1) for r in range(2, 11))
    idcg = sum(1 / math.log2(r + 1) for r in range(1, 11))
    assert m["ndcg_at_k"] == round(dcg / idcg, 6)


def test_wordpiece_tokenize_roundtrips_and_uses_merges(spark):
    """Every segmentation must rebuild word || '</w>' exactly (greedy
    matching loses nothing), and at least one word must use a merged
    symbol (the vocab actually reaches the walk)."""
    rows = REGISTRY["text_wordpiece_tokenize"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    saw_merge = False
    for r in rows:
        pieces = r["pieces"].split(" ")
        assert "".join(pieces) == r["word"] + "</w>"
        assert r["n_pieces"] == len(pieces)
        saw_merge |= any(len(p) > 1 and p != "</w>" for p in pieces)
    assert saw_merge


def test_quality_fusion_invariants(spark):
    """Each rank column is a permutation of 1..n, the RRF value is
    exactly the sum its ranks imply, and the fused rank orders by
    (rrf desc, doc_id) — recomputed from the output itself."""
    rows = REGISTRY["pipe_quality_fusion"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_len", "r_lex", "r_flu", "fused_rank"):
        assert sorted(r[col] for r in rows) == list(range(1, n + 1))
    for r in rows:
        expect = round(
            1 / (60 + r["r_len"]) + 1 / (60 + r["r_lex"]) + 1 / (60 + r["r_flu"]),
            6,
        )
        assert r["rrf"] == expect
    # the fused rank orders by the UNROUNDED rrf; the reported rrf is
    # rounded, so assert monotonicity on the rounded values (non-
    # increasing along the fused order)
    by_fused = sorted(rows, key=lambda r: r["fused_rank"])
    assert [r["rrf"] for r in by_fused] == sorted(
        (r["rrf"] for r in rows), reverse=True
    )


def test_hll_set_algebra_bounds_and_union_exactness(spark):
    """The union estimate must equal the plain HLL estimate of the
    unioned key set (register max-merge is EXACT for HLL), and both
    union and intersection estimates must sit within the sketch's error
    budget of the exact values."""
    from ssidentity_spark.operators.sketches import (
        hll_error_budget,
        hll_estimates,
    )
    from ssidentity_spark.io import load_table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["a8_hll_set_algebra"].fn(spark, sf).collect()
    assert rows
    ev = load_table(spark, sf, "events")
    budget = 6 * hll_error_budget()  # generous: IE compounds 3 sketches
    for r in rows[:3]:
        # recompute the union estimate from the RAW unioned rows
        direct = (
            hll_estimates(
                ev.where(
                    F.col("event_type").isin(r["type_a"], r["type_b"])
                ).withColumn("g", F.lit("u")),
                "g",
                "user_id",
            ).collect()[0]["hll_est"]
        )
        assert r["hll_union"] == direct
    for r in rows:
        assert abs(r["hll_union"] - r["exact_union"]) <= budget * r["exact_union"]
        if r["exact_inter"] > 0:
            assert (
                abs(r["hll_inter"] - r["exact_inter"])
                <= budget * r["exact_union"]
            )


def _stopgram(spark, tmp_path, texts):
    from ssidentity_spark.plans.dedup import STOPGRAM_MIN_DOCS  # noqa: F401

    out = REGISTRY["dedup_stopgram_remove"].fn(
        spark, _docs(spark, tmp_path, texts)
    )
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_stopgram_removes_all_occurrences_at_threshold(spark, tmp_path):
    """A gram in exactly MIN_DOCS docs is removed from EVERY doc
    (drop-all, unlike span_trim's keep-first); one below threshold
    survives everywhere."""
    import hashlib

    from ssidentity_spark.plans.dedup import STOPGRAM_MIN_DOCS as G

    boiler = "the usual footer"
    texts = [f"u{i}a u{i}b {boiler} u{i}c" for i in range(G)]
    texts.append("rare pair here only once plus filler words")
    got = _stopgram(spark, tmp_path, texts)
    for i in range(G):
        m = got[i]
        assert m["n_removed"] == 3  # exactly the boilerplate gram's span
        cleaned = f"u{i}a u{i}b u{i}c"
        assert m["cleaned_md5"] == hashlib.md5(cleaned.encode()).hexdigest()
    assert got[G]["n_removed"] == 0


def test_stopgram_fully_removed_doc_reports_null(spark, tmp_path):
    from ssidentity_spark.plans.dedup import STOPGRAM_MIN_DOCS as G

    texts = ["only the footer"] * G + ["something else entirely different words"]
    got = _stopgram(spark, tmp_path, texts)
    for i in range(G):
        assert got[i]["n_removed"] == 3
        assert got[i]["cleaned_md5"] is None


def test_stopgram_overlapping_grams_union_coverage(spark, tmp_path):
    """Overlapping stop-gram occurrences cover the UNION of their spans,
    not a double count."""
    from ssidentity_spark.plans.dedup import STOPGRAM_MIN_DOCS as G

    # "a b c d" contains grams "a b c" and "b c d", both in G docs ->
    # coverage = positions of all four words, removed once each
    texts = [f"u{i}x a b c d u{i}y" for i in range(G)]
    got = _stopgram(spark, tmp_path, texts)
    for i in range(G):
        assert got[i]["n_removed"] == 4


def test_stopgram_empty_and_whitespace_docs_flow_through(spark, tmp_path):
    """ADVICE r9: an empty/whitespace-only doc used to crash the rebuild
    (F.sequence(1, 0) descends, element_at(w, 0) throws) — it must
    instead report n_words=0 / n_removed=0 / NULL md5, matching the
    oracle, in BOTH the batch query and the shared streaming rebuild."""
    from ssidentity_spark.plans.dedup import STOPGRAM_MIN_DOCS as G

    texts = [f"u{i}a the usual footer u{i}b" for i in range(G)]
    texts += ["", "   \t  "]
    got = _stopgram(spark, tmp_path, texts)
    for i in (G, G + 1):
        assert got[i]["n_words"] == 0
        assert got[i]["n_removed"] == 0
        assert got[i]["cleaned_md5"] is None
    for i in range(G):
        assert got[i]["n_removed"] == 3  # the census still fired


def test_stopgram_stream_twin_handles_empty_docs(spark, tmp_path):
    from ssidentity_spark.plans.dedup import STOPGRAM_MIN_DOCS as G
    from ssidentity_spark.streaming.corpus import (
        stopgram_remove_stream,
        stopgram_set,
    )

    texts = [f"u{i}a the usual footer u{i}b" for i in range(G)] + ["", " "]
    sf = _docs(spark, tmp_path, texts)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    census = stopgram_set(docs)
    src = str(tmp_path / "src")
    docs.select("doc_id", "text").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        stopgram_remove_stream(stream, census)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["doc_id"]: r.asDict() for r in spark.read.parquet(out).collect()}
    assert len(got) == G + 2
    for i in (G, G + 1):
        assert got[i]["n_words"] == 0 and got[i]["cleaned_md5"] is None


def test_k_anonymity_ladder_is_monotone_and_consistent(spark):
    from ssidentity_spark.plans.pipeline import _KANON_K

    rows = REGISTRY["pipe_k_anonymity"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    seen_levels = set()
    for r in rows:
        assert r["n_docs"] <= r["n_l1"] <= r["n_l2"]
        counts = [r["n_docs"], r["n_l1"], r["n_l2"]]
        expect = next(
            (i for i, c in enumerate(counts) if c >= _KANON_K), 3
        )
        assert r["min_level"] == expect
        assert r["is_k_anon"] == (r["n_docs"] >= _KANON_K)
        seen_levels.add(r["min_level"])
    assert len(seen_levels) > 1  # the audit distinguishes groups


def test_stopgram_streaming_twin_matches_batch(spark, tmp_path):
    """stopgram_remove_stream shares the batch rebuild expressions —
    parity pinned end-to-end through a real micro-batch, census from the
    same corpus."""
    from ssidentity_spark.io import load_table
    from ssidentity_spark.streaming.corpus import (
        stopgram_remove_stream,
        stopgram_set,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    census = stopgram_set(docs)
    src = str(tmp_path / "src")
    docs.select("doc_id", "text").write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        stopgram_remove_stream(stream, census)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    want = sorted(
        map(tuple, REGISTRY["dedup_stopgram_remove"].fn(spark, sf).collect())
    )
    assert got == want and len(got) > 0


def test_m4_keeps_at_most_four_points_and_the_true_extremes(spark):
    from collections import defaultdict

    from pyspark.sql import functions as F

    from ssidentity_spark.io import load_table
    from ssidentity_spark.plans.timeseries import _M4_BUCKET

    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["ts_m4_downsample"].fn(spark, sf).collect()
    assert rows
    by_bucket = defaultdict(list)
    for r in rows:
        by_bucket[(r["event_type"], r["bucket"])].append(r)
    assert any(len(v) == 4 for v in by_bucket.values())  # dense buckets
    for pts in by_bucket.values():
        assert 1 <= len(pts) <= 4
    # the selected extremes are the TRUE bucket extremes
    ev = load_table(spark, sf, "events")
    truth = {
        (r["event_type"], r["bucket"]): (r["lo"], r["hi"], r["t0"], r["t1"])
        for r in ev.groupBy(
            "event_type",
            (
                F.floor(
                    F.unix_timestamp("ts") / _M4_BUCKET
                ) * _M4_BUCKET
            ).cast("long").alias("bucket"),
        )
        .agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.min("ts").alias("t0"),
            F.max("ts").alias("t1"),
        )
        .collect()
    }
    for key, pts in by_bucket.items():
        lo, hi, _t0, _t1 = truth[key]
        vals = [p["value"] for p in pts]
        assert min(vals) == lo and max(vals) == hi


def test_m4_streaming_twin_matches_batch_and_gated_point_set(spark, tmp_path):
    """m4_downsample_stream shares its aggregation expressions with the
    batch frame — parity pinned through a real micro-batch, and the
    stream's distinct point set equals the gated query's output."""
    from pyspark.sql import functions as F

    from ssidentity_spark.functions.timeutil import epoch_us
    from ssidentity_spark.io import load_table
    from ssidentity_spark.operators.timeseries import m4_point_exprs
    from ssidentity_spark.streaming.ema import m4_downsample_stream

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    src = str(tmp_path / "src")
    ev.select("ts", "event_type", "value", "event_id").write.parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp_ntz, event_type string, value double, event_id long"
    ).parquet(src)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        m4_downsample_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)

    # batch twin from the SAME aggregation expressions
    batch = (
        ev.select(
            "event_type",
            F.window("ts", "4 hours").alias("w"),
            epoch_us("ts").cast("long").alias("ts_us"),
            "value",
            "event_id",
        )
        .groupBy("event_type", "w")
        .agg(*m4_point_exprs())
    )
    # append mode emits a bucket only once the watermark passes its END —
    # the trailing buckets inside the 2h horizon stay open forever on a
    # bounded input, so parity is exact over CLOSED buckets
    max_ts_us = ev.agg(
        F.max(epoch_us("ts")).alias("m")
    ).collect()[0]["m"]
    cutoff_us = max_ts_us - 2 * 3600 * 1_000_000
    bucket_us = 4 * 3600 * 1_000_000

    def closed(b):
        return b + bucket_us <= cutoff_us

    want_rows = set()
    for r in batch.collect():
        b = int(r["w"]["start"].timestamp() * 1_000_000)
        if not closed(b):
            continue
        for role in ("min", "max", "first", "last"):
            p = r[f"p_{role}"]
            want_rows.add((r["event_type"], b, role, p["ts_us"], p["value"]))
    got_rows = {
        (r["event_type"], r["bucket_us"], r["role"], r["ts_us"], r["value"])
        for r in got.collect()
        if closed(r["bucket_us"])
    }
    assert got_rows == want_rows and len(got_rows) > 0
    # nothing beyond the horizon leaked into the append output early
    emitted = {r["bucket_us"] for r in got.collect()}
    want_buckets = {b for (_t, b, *_rest) in want_rows}
    assert want_buckets <= emitted

    # and the stream's DISTINCT point set matches the gated query on
    # closed buckets
    gated = {
        (r["event_type"], r["bucket"] * 1_000_000, r["ts_us"], r["value"])
        for r in REGISTRY["ts_m4_downsample"].fn(spark, sf).collect()
        if closed(r["bucket"] * 1_000_000)
    }
    stream_points = {
        (r["event_type"], r["bucket_us"], r["ts_us"], r["value"])
        for r in got.collect()
        if closed(r["bucket_us"])
    }
    assert stream_points == gated
