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
    decode_jpeg,
    decode_jpeg_gray,
    decode_jpeg_gray_pixels,
    decode_jpeg_pixels,
    encode_jpeg_color,
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


def test_color_roundtrip_444_error_bound():
    """4:4:4 color: no chroma subsampling, so the only loss is coefficient
    rounding through the (invertible) YCbCr transform — same ≤4-level
    bound as grayscale, per channel."""
    rng = np.random.default_rng(21)
    for w, h in ((8, 8), (13, 9), (32, 17), (1, 1), (9, 24)):
        rgb = rng.integers(0, 256, size=(h, w, 3))
        got = decode_jpeg_pixels(encode_jpeg_color(rgb, quant=1, subsample=False))
        assert got.shape == (h, w, 3)
        err = np.abs(got - rgb).max()
        assert err <= 4.0, f"444 {w}x{h}: max err {err}"


def test_color_roundtrip_420_chroma_flat_error_bound():
    """4:2:0: chroma is a 2×2 box mean, lossless when every 2×2 pixel
    quad has constant colour — the roundtrip then meets the same ≤4
    bound, proving the MCU walk / upsample paths carry no extra error."""
    rng = np.random.default_rng(22)
    for bw_, bh_ in ((4, 4), (11, 9), (8, 5)):
        base = rng.integers(0, 256, size=(bh_, bw_, 3))
        rgb = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
        got = decode_jpeg_pixels(encode_jpeg_color(rgb, quant=1, subsample=True))
        assert got.shape == rgb.shape
        err = np.abs(got - rgb).max()
        assert err <= 4.0, f"420 {bw_ * 2}x{bh_ * 2}: max err {err}"


def test_color_roundtrip_420_smooth_and_odd_dims():
    """Smooth gradients under 4:2:0 at non-MCU-multiple dims: chroma
    blockiness is bounded by the local gradient (≤ ~2 chroma levels per
    2×2 quad here), and edge-pad crop recovers exact dimensions."""
    yy, xx = np.mgrid[0:23, 0:37]
    rgb = np.stack([(xx * 3) % 256, (yy * 5) % 256, (xx + yy) % 256], axis=-1)
    got = decode_jpeg_pixels(encode_jpeg_color(rgb, quant=1, subsample=True))
    assert got.shape == (23, 37, 3)
    assert np.abs(got - rgb).max() <= 8.0
    w, h, m = decode_jpeg(encode_jpeg_color(rgb, quant=1, subsample=True))
    assert (w, h) == (37, 23)
    assert m == pytest.approx(float(rgb.mean()), abs=1.0)


def test_restart_interval_roundtrip():
    """DRI/RSTn: the encoder byte-aligns and resets DC predictors every
    ``restart_interval`` MCUs; the decoder must consume the markers and
    reset identically — any slip shows up as corrupted DC chains (gross
    pixel error), so the tight rounding bound is the detector."""
    rng = np.random.default_rng(31)
    px = _rand_img(rng, 28, 20)  # 4×3 blocks
    plain = encode_jpeg_gray(px, quant=1)
    for ri in (1, 2, 3, 7):
        payload = encode_jpeg_gray(px, quant=1, restart_interval=ri)
        assert payload != plain and b"\xff\xdd" in payload
        got = decode_jpeg_gray_pixels(payload)
        assert got.shape == (20, 28)
        assert np.abs(got - np.array(px, dtype=float)).max() <= 4.0
    rgb = np.repeat(
        np.repeat(rng.integers(0, 256, size=(9, 11, 3)), 2, axis=0), 2, axis=1
    )
    for ri in (1, 2):
        got = decode_jpeg_pixels(
            encode_jpeg_color(rgb, quant=1, subsample=True, restart_interval=ri)
        )
        assert np.abs(got - rgb).max() <= 4.0


def test_missing_restart_marker_raises():
    """A DRI segment promising markers the stream does not contain must
    fail loudly, not desync silently."""
    rng = np.random.default_rng(32)
    px = _rand_img(rng, 24, 16)
    plain = encode_jpeg_gray(px, quant=1)  # no RSTn markers in the scan
    # splice a DRI(1) segment in front of SOS
    sos = plain.index(b"\xff\xda")
    spoofed = plain[:sos] + b"\xff\xdd\x00\x04\x00\x01" + plain[sos:]
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray_pixels(spoofed)


def test_gray_api_rejects_color_stream():
    rgb = np.full((8, 8, 3), 90)
    payload = encode_jpeg_color(rgb)
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(payload)
    # but the general entry decodes it
    w, h, m = decode_jpeg(payload)
    assert (w, h) == (8, 8)
    assert m == pytest.approx(90.0, abs=1.5)


def test_decode_image_dispatches_jpeg(spark):
    """Mixed BMP/PNG/JPEG batch through the production Arrow path."""
    from ssidentity_spark.fixtures import build_bmp, build_png
    from ssidentity_spark.operators.multimodal import extract_image_features

    rows = [
        (1, build_bmp(4, 2, pixel_fn=lambda x, y: (50, 50, 50))),
        (2, build_png(4, 2, pixel_fn=lambda x, y: (60, 60, 60), color_type=2)),
        (3, encode_jpeg_gray([[70] * 6 for _ in range(4)])),
        (4, encode_jpeg_color(np.full((16, 18, 3), 80))),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY").repartition(2)
    got = {r.doc_id: r for r in extract_image_features(df).collect()}
    assert (got[1].width, got[1].height, got[1].mean_px) == (4, 2, 50.0)
    assert (got[2].width, got[2].height, got[2].mean_px) == (4, 2, 60.0)
    assert (got[3].width, got[3].height) == (6, 4)
    assert got[3].mean_px == pytest.approx(70.0, abs=1.0)
    assert (got[4].width, got[4].height) == (18, 16)
    assert got[4].mean_px == pytest.approx(80.0, abs=1.5)


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

    @given(
        w=st.integers(min_value=1, max_value=16),
        h=st.integers(min_value=1, max_value=16),
        seed=st.integers(min_value=0, max_value=10_000),
        subsample=st.booleans(),
    )
    @settings(max_examples=20, deadline=None)
    def test_jpeg_color_roundtrip_property(w, h, seed, subsample):
        """Any dims, both sampling modes: exact shape; 4:4:4 meets the
        rounding bound, 4:2:0 on arbitrary images stays within the
        worst-case chroma box-mean excursion mapped through YCbCr→RGB."""
        from ssidentity_spark.operators.jpeg import _rgb_to_ycbcr, _ycbcr_to_rgb

        rng = np.random.default_rng(seed)
        rgb = rng.integers(0, 256, size=(h, w, 3))
        got = decode_jpeg_pixels(
            encode_jpeg_color(rgb, quant=1, subsample=subsample)
        )
        assert got.shape == (h, w, 3)
        if not subsample:
            # 4:4:4: only coefficient rounding — same bound as grayscale
            assert np.abs(got - rgb).max() <= 4.0
        else:
            # 4:2:0: compare against an INDEPENDENT numpy recomputation of
            # the chroma-decimated reference (edge-pad → 2×2 box-mean →
            # nearest upsample) — the codec may only add DCT rounding on
            # top of that reference, never more
            mh, mw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
            p = np.pad(
                rgb.astype(float), ((0, mh - h), (0, mw - w), (0, 0)), mode="edge"
            )
            y, cb, cr = _rgb_to_ycbcr(p)
            dec = lambda c: np.repeat(  # noqa: E731
                np.repeat(
                    c.reshape(mh // 2, 2, mw // 2, 2).mean(axis=(1, 3)), 2, axis=0
                ),
                2,
                axis=1,
            )
            want = _ycbcr_to_rgb(y, dec(cb), dec(cr))[:h, :w]
            assert np.abs(got - want).max() <= 4.0

except ImportError:  # pragma: no cover
    pass
