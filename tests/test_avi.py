"""AVI container codec (operators/avi.py): DIB lossless round-trip, MJPG
near-lossless round-trip through the baseline JPEG codec, strict container
validation, keyframe sampling, and the Arrow-path query shape."""

from __future__ import annotations

import random
import struct

import numpy as np
import pytest

from ssidentity_spark.operators.avi import (
    build_avi,
    parse_avi,
    sample_frames,
)


def _gray_frames(n, w, h, seed=0):
    rng = random.Random(seed)
    return [bytes(rng.randrange(256) for _ in range(w * h)) for _ in range(n)]


def test_dib_roundtrip_is_lossless():
    frames = _gray_frames(5, 8, 4, seed=1)
    avi = build_avi(frames, 8, 4, fps=25, codec="DIB ")
    w, h, fps, codec, out = parse_avi(avi)
    assert (w, h, fps, codec) == (8, 4, 25, "DIB ")
    assert out == frames


def test_dib_roundtrip_odd_width_padding():
    # width 5 → 15-byte BGR rows padded to 16: exercises the stride math
    frames = _gray_frames(3, 5, 3, seed=2)
    avi = build_avi(frames, 5, 3, codec="DIB ")
    assert parse_avi(avi)[4] == frames


def test_mjpg_roundtrip_error_bound():
    from ssidentity_spark.operators.jpeg import encode_jpeg_gray

    W, H = 16, 8
    gray = _gray_frames(4, W, H, seed=3)
    jfr = [
        encode_jpeg_gray([list(f[y * W : (y + 1) * W]) for y in range(H)], quant=1)
        for f in gray
    ]
    avi = build_avi(jfr, W, H, fps=10, codec="MJPG")
    w, h, fps, codec, out = parse_avi(avi)
    assert (w, h, fps, codec) == (W, H, 10, "MJPG")
    for a, b in zip(gray, out):
        err = np.abs(
            np.frombuffer(a, np.uint8).astype(int)
            - np.frombuffer(b, np.uint8).astype(int)
        )
        # unit quantization: rounding error only (same bound the JPEG
        # encoder-twin tests pin)
        assert err.max() <= 4


def test_sample_frames_keyframe_stride():
    frames = _gray_frames(6, 8, 4, seed=4)
    avi = build_avi(frames, 8, 4, codec="DIB ")
    w, h, n, s, sum_px, n_px = sample_frames(avi, 2)
    assert (w, h, n, s) == (8, 4, 6, 3)
    assert sum_px == sum(sum(f) for f in frames[::2])
    assert n_px == 3 * 32


def test_rejects_non_avi_and_truncation():
    with pytest.raises(ValueError):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    frames = _gray_frames(2, 8, 4)
    avi = build_avi(frames, 8, 4)
    with pytest.raises(ValueError):
        parse_avi(avi[: len(avi) // 2])  # truncated container
    # corrupt the declared RIFF size upward → truncation detected
    bad = avi[:4] + struct.pack("<I", len(avi) + 100) + avi[8:]
    with pytest.raises(ValueError):
        parse_avi(bad)


def test_skips_unknown_chunks():
    """Spec behaviour: readers tolerate unknown chunks (JUNK padding)."""
    frames = _gray_frames(2, 8, 4, seed=5)
    avi = build_avi(frames, 8, 4)
    junk = b"JUNK" + struct.pack("<I", 6) + b"abcdef"
    # splice JUNK between hdrl and movi: rebuild the RIFF wrapper
    inner = avi[12:]
    movi_at = inner.find(b"movi") - 8  # back to the movi LIST's own header
    patched_inner = inner[:movi_at] + junk + inner[movi_at:]
    patched = (
        b"RIFF" + struct.pack("<I", len(patched_inner) + 4) + b"AVI " + patched_inner
    )
    assert parse_avi(patched)[4] == frames


def test_arrow_query_shape(spark):
    from pyspark.sql import functions as F

    from ssidentity_spark.operators.multimodal import avi_roundtrip_features

    docs = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("x" * 70), F.col("id").cast("string")).alias("text"),
    )
    out = avi_roundtrip_features(docs)
    rows = out.collect()
    assert len(rows) == 40
    assert all(r["n_frames"] == 2 and r["n_sampled"] == 1 for r in rows)
    # the sampled frame is frame 0 = first 32 bytes = 32 * ord('x')
    assert all(r["sum_px"] == 32 * ord("x") for r in rows)
