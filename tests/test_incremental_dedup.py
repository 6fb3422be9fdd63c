"""dedup_incremental_pairs' streaming twin: a readChangeFeed stream over
the versioned corpus drives per-batch band-index probes, and the union
of all batches' pairs must equal the full-recompute answer — the
medallion exactly-once incremental-dedup story end-to-end (the batch
query's driver-gate hash row pins the single-append case vs DuckDB)."""

from __future__ import annotations

from ssidentity_spark.io import load_table
from ssidentity_spark.plans.dedup import (
    _spark_lsh_pairs,
    incremental_probe_pairs,
)

SF_DIR = "/root/testdata/sf0.001"


def _probe_pairs(snapshot, batch_ids):
    """The SHIPPED probe (plans/dedup.incremental_probe_pairs) — the test
    must exercise the operator the query runs, not a re-implementation."""
    return {
        (r["doc_a"], r["doc_b"])
        for r in incremental_probe_pairs(snapshot, batch_ids).collect()
    }


def test_streamed_batches_probe_to_the_full_recompute_answer(spark, tmp_path):
    from ssidentity_spark.operators.tablelog import (
        read_versioned,
        write_versioned,
    )
    from ssidentity_spark.sources.managed_source import register

    register(spark)
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    path = str(tmp_path / "corpus")
    write_versioned(d.where("doc_id % 5 != 0"), path, "append")  # v0 base
    write_versioned(d.where("doc_id % 10 = 0"), path, "append")  # v1 batch
    write_versioned(d.where("doc_id % 10 = 5"), path, "append")  # v2 batch

    got: set = set()
    versions: list = []

    def probe_batch(batch_df, _bid):
        # a micro-batch may carry several commit versions (the FIRST
        # batch after a start is uncapped — documented latestOffset
        # semantics); probe each version in commit order against the
        # snapshot AS OF that version, never the future
        rows = batch_df.select("doc_id", "_commit_version").collect()
        by_v: dict = {}
        for r in rows:
            by_v.setdefault(r["_commit_version"], []).append(r["doc_id"])
        for v in sorted(by_v):
            if v == 0:
                # the base snapshot is the BOOTSTRAP (a one-time full
                # dedup, pinned by the batch query's gate) — the stream
                # maintains from the first post-base commit on
                continue
            versions.append(v)
            snap = read_versioned(spark, path, v).select("doc_id", "text")
            ids = spark.createDataFrame(
                [(i,) for i in by_v[v]], "doc_id long"
            )
            got.update(_probe_pairs(snap, ids))

    q = (
        spark.readStream.format("managed_table")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", 1)
        .load(path)
        .writeStream.foreachBatch(probe_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert sorted(versions) == [1, 2]

    # ground truth: full-corpus pair-gen, filtered to delta-touching
    full = read_versioned(spark, path).select("doc_id", "text")
    want = {
        (r["doc_a"], r["doc_b"])
        for r in _spark_lsh_pairs(full).collect()
        if r["doc_a"] % 5 == 0 or r["doc_b"] % 5 == 0
    }
    assert got == want
    assert want  # non-vacuous: the corpus has delta-touching candidates


def test_maintained_index_probe_reuses_persisted_signatures(spark, tmp_path):
    """VERDICT r8 ask #5: the maintained-index probe must read the base's
    signatures back from the persisted table, never re-shingle the base —
    and a second batch must probe v2's index with only v2's new rows
    computed. Pinned two ways: (a) the probe plan contains NO shingle
    pipeline (no minhash aggregate, no Python/regex tokenize — it is a
    parquet scan + rollup), and (b) two successive maintained batches
    produce exactly the full-recompute answer, cumulatively."""
    from ssidentity_spark.operators.tablelog import (
        read_changes,
        read_versioned,
        write_versioned,
    )
    from ssidentity_spark.plans.dedup import band_index, probe_band_index

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    path = str(tmp_path / "index")
    write_versioned(band_index(d.where("doc_id % 5 != 0")), path, "append")
    write_versioned(band_index(d.where("doc_id % 10 = 0")), path, "append")
    write_versioned(band_index(d.where("doc_id % 10 = 5")), path, "append")

    got: set = set()
    for v in (1, 2):
        index = read_versioned(spark, path, v)
        delta_ids = (
            read_changes(spark, path, 0, v)
            .where(f"_commit_version = {v}")
            .select("doc_id")
            .distinct()
        )
        probe = probe_band_index(index, delta_ids)
        plan = probe._jdf.queryExecution().executedPlan().toString()
        # (a) no signature recomputation in the probe plan: the shingle
        # pipeline's fingerprints are the minhash partial aggregate and
        # the tokenizing regex split — neither may appear
        assert "mh0" not in plan
        assert "split" not in plan.lower()
        got.update((r["doc_a"], r["doc_b"]) for r in probe.collect())

    full = (
        d.where("doc_id % 5 != 0")
        .unionByName(d.where("doc_id % 5 = 0"))
    )
    want = {
        (r["doc_a"], r["doc_b"])
        for r in _spark_lsh_pairs(full).collect()
        if r["doc_a"] % 5 == 0 or r["doc_b"] % 5 == 0
    }
    # v1's probe sees only v1's docs as delta; v2's probe covers v2 vs all
    # of v0+v1+v2 — the union is exactly the delta-touching recompute set
    assert got == want
    assert want


def test_streaming_ingest_maintains_the_index_and_probes(spark, tmp_path):
    """The full streaming medallion loop for X12b: a readChangeFeed
    stream over the CORPUS drives, per batch, (1) append ONLY the
    batch's band_index rows to the maintained index table, (2) probe
    the index tip with the batch's ids. No batch ever re-shingles the
    base; the union of all probes equals the full-recompute answer."""
    from ssidentity_spark.operators.tablelog import (
        read_versioned,
        write_versioned,
    )
    from ssidentity_spark.plans.dedup import band_index, probe_band_index
    from ssidentity_spark.sources.managed_source import register

    register(spark)
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = str(tmp_path / "corpus")
    index = str(tmp_path / "index")
    write_versioned(d.where("doc_id % 5 != 0"), corpus, "append")  # v0 base
    write_versioned(d.where("doc_id % 10 = 0"), corpus, "append")  # v1
    write_versioned(d.where("doc_id % 10 = 5"), corpus, "append")  # v2
    # bootstrap: the base's index rows — the ONE full signature pass
    write_versioned(band_index(d.where("doc_id % 5 != 0")), index, "append")

    got: set = set()

    def ingest(batch_df, _bid):
        rows = batch_df.select("doc_id", "text", "_commit_version").collect()
        by_v: dict = {}
        for r in rows:
            by_v.setdefault(r["_commit_version"], []).append(
                (r["doc_id"], r["text"])
            )
        for v in sorted(by_v):
            if v == 0:
                continue  # the bootstrap pass above covers the base
            batch = spark.createDataFrame(
                by_v[v], "doc_id long, text string"
            )
            # (1) maintain: append ONLY this batch's signature rows
            write_versioned(band_index(batch), index, "append")
            # (2) probe the maintained tip with the batch's ids
            ids = batch.select("doc_id")
            pairs = probe_band_index(read_versioned(spark, index), ids)
            got.update((r["doc_a"], r["doc_b"]) for r in pairs.collect())

    q = (
        spark.readStream.format("managed_table")
        .option("readChangeFeed", "true")
        .option("maxVersionsPerTrigger", 1)
        .load(corpus)
        .writeStream.foreachBatch(ingest)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    full = read_versioned(spark, corpus).select("doc_id", "text")
    want = {
        (r["doc_a"], r["doc_b"])
        for r in _spark_lsh_pairs(full).collect()
        if r["doc_a"] % 5 == 0 or r["doc_b"] % 5 == 0
    }
    assert got == want
    assert want
