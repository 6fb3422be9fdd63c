"""Property-based tests (hypothesis) for the r7 pure-Python cores: the
sequence-packing span arithmetic (the closed-form greatest/least/DIV
formulas the Spark expressions implement) against a brute-force
token-by-token packer, and the MP3 frame-header walk against generated
spec-conformant streams.

The Spark sides are pinned by their own tests and the driver hash gate;
these attack the algebra underneath with generated inputs."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _formula_spans(counts: list[int], L: int) -> list[tuple[int, int, int, int, int]]:
    """The exact arithmetic of operators/packing.pack_token_counts for a
    single bucket in the given order: (doc_idx, seq_no, doc_from,
    doc_to, seq_offset) per span."""
    out = []
    s = 0
    for i, n in enumerate(counts):
        if n <= 0:
            continue
        for seq_no in range(s // L, (s + n - 1) // L + 1):
            doc_from = max(0, seq_no * L - s)
            doc_to = min(n, (seq_no + 1) * L - s)
            seq_offset = max(0, s - seq_no * L)
            out.append((i, seq_no, doc_from, doc_to, seq_offset))
        s += n
    return out


def _simulated_spans(counts: list[int], L: int):
    """Brute force: walk the concatenated token stream position by
    position, recording which (doc, in-doc index) lands at which
    (sequence, in-sequence position)."""
    placed = {}  # (doc_idx, tok_idx) -> (seq_no, pos_in_seq)
    pos = 0
    for i, n in enumerate(counts):
        if n <= 0:
            continue
        for t in range(n):
            placed[(i, t)] = (pos // L, pos % L)
            pos += 1
    return placed


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 37), min_size=0, max_size=40),
    st.integers(1, 16),
)
def test_packing_formula_matches_token_walk(counts, L):
    spans = _formula_spans(counts, L)
    placed = _simulated_spans(counts, L)
    # rebuild the per-token placement from the spans and compare exactly
    from_spans = {}
    for i, seq_no, a, b, off in spans:
        assert 0 <= a < b  # non-degenerate, ordered
        for t in range(a, b):
            from_spans[(i, t)] = (seq_no, off + (t - a))
    assert from_spans == placed
    # every non-tail sequence is exactly full
    fill = {}
    for _i, seq_no, a, b, _off in spans:
        fill[seq_no] = fill.get(seq_no, 0) + (b - a)
    if fill:
        last = max(fill)
        for seq_no, f in fill.items():
            assert f == L if seq_no < last else 0 < f <= L


@st.composite
def _mp3_stream(draw):
    version = draw(st.sampled_from([1, 2, 25]))
    layer = draw(st.sampled_from([1, 2, 3]))
    sr_idx = draw(st.integers(0, 2))
    mono = draw(st.booleans())
    n = draw(st.integers(1, 8))
    frames = []
    kbps_list = []
    for k in range(n):
        br_idx = draw(st.integers(1, 14))
        padding = draw(st.integers(0, 1))
        frames.append((br_idx, padding))
    return version, layer, sr_idx, mono, frames


@settings(max_examples=120, deadline=None)
@given(_mp3_stream())
def test_mp3_walk_recovers_generated_stream(case):
    from ssidentity_spark.operators.multimodal import (
        _mp3_frame_header,
        decode_mp3_metadata,
    )

    version, layer, sr_idx, mono, frames = case
    ver_bits = {1: 3, 2: 2, 25: 0}[version]
    layer_bits = {1: 3, 2: 2, 3: 1}[layer]
    payload = bytearray()
    spf = None
    for br_idx, padding in frames:
        b1 = 0xFF
        b2 = 0xE0 | (ver_bits << 3) | (layer_bits << 1) | 1
        b3 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
        b4 = 0xC0 if mono else 0x00
        hdr = bytes([b1, b2, b3, b4])
        parsed = _mp3_frame_header(hdr, 0)
        assert parsed is not None
        _v, _ly, _kbps, _rate, _ch, frame_len, spf = parsed
        # layer-I short frames at low bitrate/high rate can compute a
        # frame shorter than the header itself — the walk treats that as
        # end-of-stream, so only emit frames with room for their header
        if frame_len <= 4:
            return
        payload += hdr + bytes(frame_len - 4)
    m = decode_mp3_metadata(bytes(payload))
    assert m["n_frames"] == len(frames)
    assert m["n_samples"] == len(frames) * spf
    assert m["channels"] == (1 if mono else 2)
    assert m["vbr"] == (len({b for b, _ in frames}) > 1)


@settings(max_examples=200, deadline=None)
@given(
    n_toks=st.integers(min_value=1, max_value=2000),
)
def test_chunking_arithmetic_covers_every_token_once_per_window(n_toks):
    """pipe_chunk_documents' pure arithmetic (r9): for any doc length,
    the chunk windows (start = i*S+1, len = min(C, n - i*S)) cover token
    1..n with no gap, consecutive chunks overlap by exactly C-S (except
    a shorter tail), and no window is empty or out of range."""
    import math

    C, S = 64, 48
    n_extra = max(0, math.ceil((n_toks - C) / S))
    windows = []
    for i in range(n_extra + 1):
        start = i * S + 1
        length = min(C, n_toks - i * S)
        windows.append((start, start + length - 1))
        assert length >= 1
        assert start + length - 1 <= n_toks
    # coverage: union of [start, end] == [1, n_toks]
    covered = set()
    for s, e in windows:
        covered.update(range(s, e + 1))
    assert covered == set(range(1, n_toks + 1))
    # overlap: consecutive full windows overlap by exactly C - S
    for (s1, e1), (s2, e2) in zip(windows, windows[1:]):
        assert s2 - s1 == S
        if e1 - s1 + 1 == C:
            assert max(0, e1 - s2 + 1) == C - S


@settings(max_examples=100, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_running_total_property_matches_python_fold(spark, vals):
    """assign_running_total == the python prefix sum over the same total
    order, for arbitrary float qualities (incl. duplicates pushed to
    bucket boundaries) and zero-valued rows."""
    from pyspark.sql import functions as F

    from ssidentity_spark.operators.rowids import assign_running_total

    rows = [(i, q, v) for i, (q, v) in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, q double, v long")
    got = {
        r["id"]: r["running_before"]
        for r in assign_running_total(
            df,
            order=[F.desc("q"), F.asc("id")],
            value_col="v",
            bucket=F.floor((F.lit(1.0) - F.col("q")) * 16).cast("int"),
        ).collect()
    }
    acc = 0
    for i, q, v in sorted(rows, key=lambda r: (-r[1], r[0])):
        assert got[i] == acc
        acc += v
