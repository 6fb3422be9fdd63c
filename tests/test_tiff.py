"""Baseline TIFF codec (operators/tiff.py): uncompressed strips in both
byte orders — lossless, so decode∘encode is exact."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ssidentity_spark.operators.tiff import decode_tiff, encode_tiff


def test_roundtrip_gray_and_rgb_both_endians():
    rng = np.random.default_rng(61)
    for big_endian in (False, True):
        g = rng.integers(0, 256, size=(7, 13))
        w, h, m = decode_tiff(encode_tiff(g, big_endian=big_endian))
        assert (w, h) == (13, 7)
        assert m == pytest.approx(float(g.mean()), abs=1e-9)
        rgb = rng.integers(0, 256, size=(5, 9, 3))
        w, h, m = decode_tiff(encode_tiff(rgb, big_endian=big_endian))
        assert (w, h) == (9, 5)
        assert m == pytest.approx(float(rgb.mean()), abs=1e-9)


def test_white_is_zero_inversion():
    """Photometric 0 (WhiteIsZero) inverts to the BlackIsZero scale."""
    g = np.full((2, 2), 55, dtype=np.uint8)
    payload = bytearray(encode_tiff(g))
    # flip the Photometric tag value (262, SHORT) from 1 to 0
    i = payload.index(struct.pack("<HHIHH", 262, 3, 1, 1, 0))
    payload[i : i + 12] = struct.pack("<HHIHH", 262, 3, 1, 0, 0)
    w, h, m = decode_tiff(bytes(payload))
    assert m == pytest.approx(200.0)


def test_rejects_unsupported_variants():
    g = np.zeros((2, 2), dtype=np.uint8)
    payload = bytearray(encode_tiff(g))
    # compression tag (259) flipped to LZW (5)
    i = payload.index(struct.pack("<HHIHH", 259, 3, 1, 1, 0))
    lzw = bytearray(payload)
    lzw[i : i + 12] = struct.pack("<HHIHH", 259, 3, 1, 5, 0)
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(lzw))
    with pytest.raises(NotImplementedError):
        decode_tiff(b"II+\x00" + bytes(payload[4:]))  # BigTIFF magic
    with pytest.raises(NotImplementedError):
        decode_tiff(bytes(payload[: len(payload) - 3]))  # truncated strip


def test_decode_image_dispatches_tiff(spark):
    from ssidentity_spark.operators.multimodal import extract_image_features

    rows = [
        (1, encode_tiff(np.full((4, 6), 77, dtype=np.uint8))),
        (2, encode_tiff(np.full((3, 5, 3), 140, dtype=np.uint8), big_endian=True)),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY")
    got = {r.doc_id: r for r in extract_image_features(df).collect()}
    assert (got[1].width, got[1].height, got[1].mean_px) == (6, 4, 77.0)
    assert (got[2].width, got[2].height, got[2].mean_px) == (5, 3, 140.0)
