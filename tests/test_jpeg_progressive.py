"""Progressive JPEG codec (operators/jpeg_progressive.py): decode∘encode
properties against the original pixels. The encoder's script ends with
refinement passes to Al=0, so the successive-approximation progression is
exactly lossless down to quantization — the same error bounds as the
baseline codec apply, and any desync in the EOB-run / correction-bit
protocol shows up as gross pixel corruption, making the tight bound the
detector."""

from __future__ import annotations

import numpy as np
import pytest

from ssidentity_spark.operators.jpeg import decode_jpeg, decode_jpeg_pixels
from ssidentity_spark.operators.jpeg_progressive import (
    decode_progressive_pixels,
    encode_jpeg_progressive,
)


def test_gray_roundtrip_error_bound():
    rng = np.random.default_rng(41)
    for w, h in ((8, 8), (13, 9), (1, 1), (17, 31), (40, 40), (9, 1)):
        px = rng.integers(0, 256, size=(h, w))
        got = decode_progressive_pixels(encode_jpeg_progressive(px, quant=1))
        assert got.shape == (h, w)
        err = np.abs(got - px).max()
        assert err <= 4.0, f"{w}x{h}: {err}"


def test_color_444_roundtrip_error_bound():
    rng = np.random.default_rng(42)
    for w, h in ((8, 8), (21, 15), (37, 23)):
        rgb = rng.integers(0, 256, size=(h, w, 3))
        got = decode_progressive_pixels(encode_jpeg_progressive(rgb, quant=1))
        assert got.shape == (h, w, 3)
        err = np.abs(got - rgb).max()
        assert err <= 4.0, f"{w}x{h}: {err}"


def test_color_420_chroma_flat_roundtrip():
    rng = np.random.default_rng(43)
    for bw_, bh_ in ((9, 8), (5, 7), (11, 3)):
        base = rng.integers(0, 256, size=(bh_, bw_, 3))
        rgb = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
        got = decode_progressive_pixels(
            encode_jpeg_progressive(rgb, quant=1, subsample=True)
        )
        assert got.shape == rgb.shape
        assert np.abs(got - rgb).max() <= 4.0


def test_coarse_quant_mean_preserved():
    rng = np.random.default_rng(44)
    px = rng.integers(0, 256, size=(19, 27))
    got = decode_progressive_pixels(encode_jpeg_progressive(px, quant=16))
    assert got.shape == (19, 27)
    assert abs(float(got.mean()) - float(px.mean())) <= 4.0


def test_baseline_entry_dispatches_sof2():
    """decode_jpeg / decode_jpeg_pixels route SOF2 streams to the
    progressive decoder, so decode_image handles them transparently."""
    rng = np.random.default_rng(45)
    px = rng.integers(0, 256, size=(12, 20))
    payload = encode_jpeg_progressive(px, quant=1)
    got = decode_jpeg_pixels(payload)
    assert got.shape == (12, 20)
    assert np.abs(got - px).max() <= 4.0
    w, h, m = decode_jpeg(payload)
    assert (w, h) == (20, 12)
    assert m == pytest.approx(float(px.mean()), abs=1.0)


def test_rejects_invalid_progressive_scans():
    rng = np.random.default_rng(46)
    good = encode_jpeg_progressive(rng.integers(0, 256, size=(8, 8)), quant=1)
    # baseline stream marker-flipped to SOF2 → DC+AC in one scan: invalid
    from ssidentity_spark.operators.jpeg import encode_jpeg_gray

    flipped = encode_jpeg_gray([[70] * 8 for _ in range(8)]).replace(
        b"\xff\xc0", b"\xff\xc2", 1
    )
    with pytest.raises(NotImplementedError):
        decode_progressive_pixels(flipped)
    # truncated entropy mid-scan
    with pytest.raises(NotImplementedError):
        decode_progressive_pixels(good[: len(good) * 2 // 3])


def test_decode_image_dispatches_progressive(spark):
    """SOF2 payloads through the production mapInPandas Arrow path."""
    from ssidentity_spark.operators.multimodal import extract_image_features

    rng = np.random.default_rng(47)
    rows = [
        (1, encode_jpeg_progressive(np.full((8, 10), 90), quant=1)),
        (2, encode_jpeg_progressive(np.full((6, 6, 3), 120), quant=1)),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    got = {r.doc_id: r for r in extract_image_features(df).collect()}
    assert (got[1].width, got[1].height) == (10, 8)
    assert got[1].mean_px == pytest.approx(90.0, abs=1.0)
    assert (got[2].width, got[2].height) == (6, 6)
    assert got[2].mean_px == pytest.approx(120.0, abs=1.5)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        w=st.integers(min_value=1, max_value=24),
        h=st.integers(min_value=1, max_value=24),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    @settings(max_examples=20, deadline=None)
    def test_progressive_roundtrip_property(w, h, seed):
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w))
        got = decode_progressive_pixels(encode_jpeg_progressive(px, quant=1))
        assert got.shape == (h, w)
        assert np.abs(got - px).max() <= 4.0

except ImportError:  # pragma: no cover
    pass


def test_interleaved_dc_444_roundtrip():
    """r7: DC scans in the interleaved (MCU-ordered, all-components) form
    real progressive encoders default to."""
    rng = np.random.default_rng(45)
    for w, h in ((8, 8), (21, 15), (13, 9)):
        rgb = rng.integers(0, 256, size=(h, w, 3))
        got = decode_progressive_pixels(
            encode_jpeg_progressive(rgb, quant=1, interleave_dc=True)
        )
        assert got.shape == (h, w, 3)
        assert np.abs(got - rgb).max() <= 4.0


def test_interleaved_dc_420_dummy_blocks_roundtrip():
    """2x2-subsampled luma means the MCU grid pads chroma with dummy
    blocks on odd block counts — the dummy entropy data must be consumed
    exactly (any desync corrupts every later block)."""
    rng = np.random.default_rng(46)
    for bw_, bh_ in ((9, 8), (5, 7), (11, 3)):
        base = rng.integers(0, 256, size=(bh_, bw_, 3))
        rgb = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
        got = decode_progressive_pixels(
            encode_jpeg_progressive(
                rgb, quant=1, subsample=True, interleave_dc=True
            )
        )
        assert got.shape == rgb.shape
        assert np.abs(got - rgb).max() <= 4.0


def test_restart_intervals_gray_and_color_roundtrip():
    """r7: DRI/RSTn inside progressive streams — predictor and EOB-run
    reset at every boundary, byte-aligned markers consumed mid-scan."""
    rng = np.random.default_rng(47)
    px = rng.integers(0, 256, size=(17, 31))
    for dri in (1, 2, 5):
        got = decode_progressive_pixels(
            encode_jpeg_progressive(px, quant=1, restart_interval=dri)
        )
        assert np.abs(got - px).max() <= 4.0
    rgb = rng.integers(0, 256, size=(15, 21, 3))
    got = decode_progressive_pixels(
        encode_jpeg_progressive(rgb, quant=1, restart_interval=3)
    )
    assert np.abs(got - rgb).max() <= 4.0


def test_restart_plus_interleaved_dc_roundtrip():
    rng = np.random.default_rng(48)
    base = rng.integers(0, 256, size=(7, 9, 3))
    rgb = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    got = decode_progressive_pixels(
        encode_jpeg_progressive(
            rgb, quant=1, subsample=True, interleave_dc=True, restart_interval=2
        )
    )
    assert got.shape == rgb.shape
    assert np.abs(got - rgb).max() <= 4.0


def test_interleaved_ac_scan_rejected():
    """An interleaved AC scan is invalid T.81 progressive — rejected with
    the real cause, not decoded wrong."""
    rng = np.random.default_rng(49)
    payload = bytearray(
        encode_jpeg_progressive(
            rng.integers(0, 256, size=(8, 8, 3)), quant=1
        )
    )
    # find an AC SOS (ns=1, ss>0) and rewrite its header to ns=3: the
    # resulting stream claims an interleaved AC scan
    i = 2
    while i + 4 < len(payload):
        if payload[i] == 0xFF and payload[i + 1] == 0xDA:
            ln = int.from_bytes(payload[i + 2 : i + 4], "big")
            body = payload[i + 4 : i + 2 + ln]
            if body[0] == 1 and body[3] > 0:
                new_body = bytes(
                    [3, 1, body[2], 2, body[2], 3, body[2], body[3], body[4], body[5]]
                )
                payload[i + 2 : i + 2 + ln] = (
                    (len(new_body) + 2).to_bytes(2, "big") + new_body
                )
                break
            i += 2 + ln
        else:
            i += 1
    with pytest.raises(NotImplementedError, match="interleaved progressive AC"):
        decode_progressive_pixels(bytes(payload))
