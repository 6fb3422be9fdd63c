"""Product-quantization ANN (operators/pq.py): model determinism, encode
integrity, bit-exact ADC against numpy, quantization-granularity
monotonicity, and the near-dup recall bar. Bars are pinned from measured
values (see SCALE.md): this corpus's mid-similarity regime gives PQ low
top-k recall (like sign-LSH), but near-dups quantize to shared codes and
recall ~1.0 — the operating point the compression is for."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from ssidentity_spark.io import load_table
from ssidentity_spark.operators.ivf import train_centroids
from ssidentity_spark.operators.pq import (
    adc_lut,
    decode_pq,
    encode_pq,
    ivf_pq_topk,
    pq_adc_topk,
    train_codebooks,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def em(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


@pytest.fixture(scope="module")
def books(em):
    return train_codebooks(em, m=8, k=16, iters=5)


@pytest.fixture(scope="module")
def corpus_np(em):
    rows = em.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    x = np.array([r.embedding for r in rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    return ids, xn


def test_training_is_deterministic(em, books):
    again = train_codebooks(em, m=8, k=16, iters=5)
    assert books.shape == (8, 16, 8)
    assert np.array_equal(books, again)


def test_codes_in_range_and_length(em, books):
    codes = encode_pq(em, books).select("codes").collect()
    arr = np.array([r.codes for r in codes], dtype=np.int32)
    assert arr.shape[1] == 8
    assert arr.min() >= 0 and arr.max() < 16


def test_adc_matches_numpy_reconstruction_distance(em, books, corpus_np):
    """The JVM ADC path (broadcast LUT + zip_with/element_at/aggregate)
    must equal numpy's ||q_norm − decode(codes)||² for every scored pair —
    ADC is exact w.r.t. the reconstruction by construction, so any gap is
    a lookup/indexing bug."""
    ids, xn = corpus_np
    got = pq_adc_topk(em, books, [0, 1, 2], top_k=10**9).collect()
    codes = {
        r.vec_id: np.array(r.codes, dtype=np.int32)
        for r in encode_pq(em, books).select("vec_id", "codes").collect()
    }
    recon = {v: decode_pq(c[None, :], books)[0] for v, c in codes.items()}
    by_id = {int(i): xn[j] for j, i in enumerate(ids)}
    for r in got[:500]:
        q = by_id[r.query_id]
        adc = ((q - recon[r.neighbor_id]) ** 2).sum()
        assert abs(r.approx_cos - round(1.0 - adc / 2.0, 6)) <= 1e-6


def test_finer_quantization_reduces_reconstruction_error(em, corpus_np):
    """m=16 halves the subspace width → strictly better reconstruction
    than m=8 at the same k (measured 0.0050 vs 0.0086 mean sq err)."""
    _, xn = corpus_np

    def mse(m):
        bk = train_codebooks(em, m=m, k=16, iters=5)
        codes = np.array(
            [r.codes for r in encode_pq(em, bk).orderBy("vec_id").select("codes").collect()],
            dtype=np.int32,
        )
        return ((decode_pq(codes, bk) - xn) ** 2).mean()

    m8, m16 = mse(8), mse(16)
    assert m16 < m8
    assert m8 < 0.02  # sanity: far better than zero-vector baseline (~1/64)


def test_ivfpq_full_probe_equals_plain_pq(em, books):
    """With n_probes == k the cell filter passes the whole corpus, so
    IVF×PQ must return exactly the plain PQ-ADC result — pins the
    composition's join logic (cells only prune, never rescore)."""
    cents = train_centroids(em, k=8, iters=3)
    qids = [0, 1, 2]
    full = {
        (r.query_id, r.rnk): (r.neighbor_id, r.approx_cos)
        for r in ivf_pq_topk(em, cents, books, qids, top_k=5, n_probes=8).collect()
    }
    plain = {
        (r.query_id, r.rnk): (r.neighbor_id, r.approx_cos)
        for r in pq_adc_topk(em, books, qids, top_k=5).collect()
    }
    assert full == plain


def test_ivfpq_probe_limited_is_subset_scored(em, books):
    """Probe-limited IVF×PQ scores only probed-cell members: every result
    pair must appear in the full-probe scoring with the same ADC value,
    and the scored candidate count must shrink."""
    cents = train_centroids(em, k=8, iters=3)
    qids = [0, 1, 2]
    all_pairs = {
        (r.query_id, r.neighbor_id): r.approx_cos
        for r in ivf_pq_topk(em, cents, books, qids, top_k=10**9, n_probes=8).collect()
    }
    probed = ivf_pq_topk(em, cents, books, qids, top_k=10**9, n_probes=2).collect()
    assert 0 < len(probed) < len(all_pairs)
    for r in probed:
        assert all_pairs[(r.query_id, r.neighbor_id)] == r.approx_cos


def test_ivfpq_rerank_recovers_recall(em, books, corpus_np):
    """Exact re-rank over PQ candidates is the production pattern: recall
    must beat raw ADC ranking decisively (measured 0.88 vs 0.26 at
    sf0.01 — pinned at >= 0.8 and strictly greater), and every result
    must come from the candidate stage."""
    from ssidentity_spark.operators.pq import ivf_pq_rerank_topk

    ids, xn = corpus_np
    by_pos = {int(i): j for j, i in enumerate(ids)}
    truth = {}
    for q in range(10):
        cos = xn @ xn[by_pos[q]]
        order = np.argsort(-cos)
        truth[q] = set([int(ids[i]) for i in order if ids[i] != q][:5])

    cents = train_centroids(em, k=16, iters=3)
    qids = list(range(10))

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    def recall(got):
        return np.mean([len(got.get(q, set()) & set(truth[q])) / 5 for q in qids])

    reranked = topk_sets(
        ivf_pq_rerank_topk(em, cents, books, qids, top_k=5, n_probes=4, n_candidates=100)
    )
    raw = topk_sets(ivf_pq_topk(em, cents, books, qids, top_k=5, n_probes=4))
    cands = topk_sets(
        ivf_pq_topk(em, cents, books, qids, top_k=100, n_probes=4)
    )
    assert recall(reranked) >= 0.8
    assert recall(reranked) > recall(raw)
    for q, neighbors in reranked.items():
        assert neighbors <= cands[q]


def test_pq_recall_high_in_near_dup_regime(spark):
    """Planted ~0.98-cosine duplicate groups quantize to (near-)identical
    codes, so ADC ranks them first: recall@3 ≥ 0.9 (measured 1.0). Same
    fixture convention as the LSH near-dup bar."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 64))
    rows = []
    vid = 0
    for b in base:
        for _ in range(4):
            noisy = b + rng.normal(scale=0.05, size=64)
            rows.append((vid, [float(x) for x in noisy]))
            vid += 1
    emp = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    x = np.array([r[1] for r in rows], dtype=np.float64)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)

    truth = {}
    for q in range(10):
        cos = xn @ xn[q]
        order = np.argsort(-cos)
        truth[q] = set([int(i) for i in order if i != q][:3])

    books = train_codebooks(emp, m=8, k=16, iters=5)
    got = {}
    for r in pq_adc_topk(emp, books, list(range(10)), top_k=3).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recall = np.mean([len(got.get(q, set()) & set(truth[q])) / 3 for q in range(10)])
    assert recall >= 0.9


def test_pinned_query_reuses_model_and_matches_trained_search(spark):
    """sim_ivfpq_pinned_topk (the benched search row, VERDICT r10 ask
    #3): same trainers as the model-build query, so the SEARCH result is
    identical to sim_ivfpq_rerank_topk; the model trains once per corpus
    dir and later invocations reuse it (what keeps Lloyd's iterations
    out of the timed bench body)."""
    import ssidentity_spark.plans  # noqa: F401
    from ssidentity_spark.plans import similarity as S
    from ssidentity_spark.registry import REGISTRY

    sf = "/root/testdata/sf0.001"
    S._IVFPQ_MODEL_CACHE.clear()
    got1 = {
        (r.query_id, r.neighbor_id, r.cos, r.rnk)
        for r in REGISTRY["sim_ivfpq_pinned_topk"].fn(spark, sf).collect()
    }
    assert sf in S._IVFPQ_MODEL_CACHE  # first call trained + cached
    trained = {
        (r.query_id, r.neighbor_id, r.cos, r.rnk)
        for r in REGISTRY["sim_ivfpq_rerank_topk"].fn(spark, sf).collect()
    }
    assert got1 == trained  # identical deterministic model -> same search
    # second call must NOT retrain: poison the trainers and re-run
    import ssidentity_spark.operators.ivf as ivf_mod

    orig = ivf_mod.train_centroids
    ivf_mod.train_centroids = None  # would raise if called
    try:
        got2 = {
            (r.query_id, r.neighbor_id, r.cos, r.rnk)
            for r in REGISTRY["sim_ivfpq_pinned_topk"].fn(spark, sf).collect()
        }
    finally:
        ivf_mod.train_centroids = orig
    assert got2 == got1
