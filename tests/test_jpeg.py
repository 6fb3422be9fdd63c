"""Baseline grayscale JPEG codec (operators/jpeg.py): decode∘encode
properties against the ORIGINAL pixel array as ground truth — exact
dimensions always; with a unit quantization table the only loss is DCT
coefficient rounding, so per-pixel reconstruction error is tightly
bounded; coarse quantization stays dimension-exact with a bounded mean
shift. Plus the mapInPandas dispatch path on a mixed-format batch."""

from __future__ import annotations

import numpy as np
import pytest

from ssidentity_spark.operators.jpeg import (
    decode_jpeg_gray,
    decode_jpeg_gray_pixels,
    encode_jpeg_gray,
)


def _rand_img(rng, w, h):
    return [[int(rng.integers(0, 256)) for _ in range(w)] for _ in range(h)]


def test_roundtrip_known_images():
    # flat image: DCT is a lone DC coefficient — exact after rounding
    flat = [[128] * 8 for _ in range(8)]
    assert decode_jpeg_gray(encode_jpeg_gray(flat)) == (8, 8, 128.0)
    # 1x1 (pads to a full block; crop must recover the single pixel)
    one = [[200]]
    w, h, m = decode_jpeg_gray(encode_jpeg_gray(one))
    assert (w, h) == (1, 1)
    assert m == pytest.approx(200, abs=1.0)


def test_roundtrip_pixel_error_bound_unit_quant():
    rng = np.random.default_rng(11)
    for w, h in ((8, 8), (3, 5), (17, 9), (24, 24), (16, 40), (9, 1)):
        px = _rand_img(rng, w, h)
        got = decode_jpeg_gray_pixels(encode_jpeg_gray(px, quant=1))
        assert got.shape == (h, w)
        err = np.abs(got - np.array(px, dtype=float)).max()
        # 64 coefficients each rounded by <=0.5; basis magnitudes bound the
        # spatial error well under 4 grey levels
        assert err <= 4.0, f"{w}x{h}: max pixel err {err}"


def test_roundtrip_coarse_quant_dims_and_mean():
    rng = np.random.default_rng(12)
    px = _rand_img(rng, 19, 13)
    w, h, m = decode_jpeg_gray(encode_jpeg_gray(px, quant=16))
    assert (w, h) == (19, 13)
    # DC is quantized by 16 → block means move by <= 16/(2*8) = 1 grey
    # level plus AC truncation; a loose bound still catches real breakage
    assert m == pytest.approx(np.array(px, dtype=float).mean(), abs=4.0)


def test_decoder_rejects_unsupported_variants():
    rng = np.random.default_rng(13)
    good = encode_jpeg_gray(_rand_img(rng, 8, 8))
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(good[: len(good) // 3])  # truncated stream
    # flip SOF0 (FFC0) to progressive SOF2 (FFC2)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(prog)
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # no SOF/SOS


def test_decode_image_dispatches_jpeg(spark):
    """Mixed BMP/PNG/JPEG batch through the production Arrow path."""
    from ssidentity_spark.fixtures import build_bmp, build_png
    from ssidentity_spark.operators.multimodal import extract_image_features

    rows = [
        (1, build_bmp(4, 2, pixel_fn=lambda x, y: (50, 50, 50))),
        (2, build_png(4, 2, pixel_fn=lambda x, y: (60, 60, 60), color_type=2)),
        (3, encode_jpeg_gray([[70] * 6 for _ in range(4)])),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY").repartition(2)
    got = {r.doc_id: r for r in extract_image_features(df).collect()}
    assert (got[1].width, got[1].height, got[1].mean_px) == (4, 2, 50.0)
    assert (got[2].width, got[2].height, got[2].mean_px) == (4, 2, 60.0)
    assert (got[3].width, got[3].height) == (6, 4)
    assert got[3].mean_px == pytest.approx(70.0, abs=1.0)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        w=st.integers(min_value=1, max_value=20),
        h=st.integers(min_value=1, max_value=20),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    @settings(max_examples=30, deadline=None)
    def test_jpeg_roundtrip_property(w, h, seed):
        rng = np.random.default_rng(seed)
        px = _rand_img(rng, w, h)
        got = decode_jpeg_gray_pixels(encode_jpeg_gray(px, quant=1))
        assert got.shape == (h, w)
        assert np.abs(got - np.array(px, dtype=float)).max() <= 4.0

except ImportError:  # pragma: no cover
    pass
