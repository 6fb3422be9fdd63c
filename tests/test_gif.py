"""GIF codec (operators/gif.py): LZW + container roundtrips. GIF is
lossless, so decode∘encode equality is EXACT — any bit slip in the
variable-width code machinery corrupts the index stream outright, making
exactness the detector for both LZW sides at once."""

from __future__ import annotations

import numpy as np
import pytest

from ssidentity_spark.operators.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def _frame(rng, w, h, alpha):
    return [[int(rng.integers(0, alpha)) for _ in range(w)] for _ in range(h)]


def test_lzw_roundtrip_with_code_growth():
    rng = np.random.default_rng(51)
    for n, alpha in ((1, 4), (1000, 4), (20_000, 16), (60_000, 64)):
        idx = list(rng.integers(0, alpha, size=n))
        mcs = max(2, (alpha - 1).bit_length())
        assert lzw_decode(mcs, lzw_encode(mcs, idx)) == idx
    # highly repetitive input drives the dictionary to its 4096 freeze
    idx = ([0, 1] * 3000) + ([2] * 4000) + list(rng.integers(0, 4, size=8000))
    assert lzw_decode(2, lzw_encode(2, idx)) == idx


def test_gif_single_frame_exact_mean():
    rng = np.random.default_rng(52)
    palette = [(10, 20, 30), (200, 100, 0), (5, 5, 5), (255, 255, 255)]
    frame = _frame(rng, 13, 7, 4)
    w, h, nf, mean = decode_gif(encode_gif([frame], palette))
    exp = sum(sum(palette[i]) for row in frame for i in row) / (13 * 7 * 3)
    assert (w, h, nf) == (13, 7, 1)
    assert mean == pytest.approx(exp, abs=1e-9)


def test_gif_animation_frame_count_and_mean():
    rng = np.random.default_rng(53)
    palette = [(0, 0, 0), (30, 60, 90), (255, 0, 255)]
    frames = [_frame(rng, 9, 5, 3) for _ in range(4)]
    w, h, nf, mean = decode_gif(encode_gif(frames, palette))
    exp = sum(
        sum(palette[i]) for f in frames for row in f for i in row
    ) / (4 * 9 * 5 * 3)
    assert (w, h, nf) == (9, 5, 4)
    assert mean == pytest.approx(exp, abs=1e-9)


def test_gif_256_color_palette():
    rng = np.random.default_rng(54)
    palette = [(i, (i * 3) % 256, (i * 7) % 256) for i in range(256)]
    frame = _frame(rng, 40, 25, 256)
    w, h, nf, mean = decode_gif(encode_gif([frame], palette))
    exp = sum(sum(palette[i]) for row in frame for i in row) / (40 * 25 * 3)
    assert (w, h, nf) == (40, 25, 1)
    assert mean == pytest.approx(exp, abs=1e-9)


def test_gif_skips_89a_extensions():
    """GCE/comment/application extension blocks between frames must be
    walked over without affecting pixel stats."""
    palette = [(100, 100, 100), (50, 50, 50)]
    frame = [[0, 1], [1, 0]]
    payload = encode_gif([frame], palette)
    # splice a graphic-control extension + comment before the frame
    idesc = payload.index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x0a\x00\x00\x00"
    comment = b"\x21\xfe\x05hello\x00"
    spliced = payload[:idesc] + gce + comment + payload[idesc:]
    w, h, nf, mean = decode_gif(spliced)
    assert (w, h, nf) == (2, 2, 1)
    assert mean == pytest.approx(75.0)


def test_gif_rejects_corrupt():
    palette = [(1, 2, 3), (4, 5, 6)]
    good = encode_gif([[[0, 1], [1, 0]]], palette)
    with pytest.raises(NotImplementedError):
        decode_gif(good[: len(good) - 4])  # truncated (no trailer/data end)
    with pytest.raises(NotImplementedError):
        decode_gif(b"GIF89a" + b"\x00" * 4)  # truncated header
    with pytest.raises(NotImplementedError):
        decode_gif(b"NOTGIF" + good[6:])


def test_decode_image_dispatches_gif(spark):
    """GIF payloads through the production mapInPandas Arrow path."""
    from ssidentity_spark.operators.multimodal import extract_image_features

    palette = [(60, 60, 60), (120, 120, 120)]
    rows = [
        (1, encode_gif([[[0, 1], [1, 0]]], palette)),
        (2, encode_gif([[[1] * 3] * 4], palette)),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    got = {r.doc_id: r for r in extract_image_features(df).collect()}
    assert (got[1].width, got[1].height, got[1].mean_px) == (2, 2, 90.0)
    assert (got[2].width, got[2].height, got[2].mean_px) == (3, 4, 120.0)
