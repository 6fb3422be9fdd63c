"""Multimodal binary plumbing: Arrow/mapInPandas feature extraction with the
deterministic fake decoder; real codec stubs must raise (they're gated)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ssidentity_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    extract_features,
    fake_decode,
    resize_stub,
    sample_frames,
)


@pytest.fixture(scope="module")
def payloads(spark):
    rows = [(1, b"hello world"), (2, b"\x10\x20binary\x00blob"), (3, b"")]
    return spark.createDataFrame(rows, "doc_id LONG, payload BINARY").cache()


def test_codec_stubs_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF")


def test_fake_decode_deterministic():
    assert fake_decode(b"hello") == (104, 101)
    assert fake_decode(b"") == (0, 0)
    assert fake_decode(b"\xff") == (255, 0)


def test_extract_features(payloads):
    rows = {r.doc_id: r for r in extract_features(payloads).collect()}
    assert rows[1].fake_width == ord("h") and rows[1].fake_height == ord("e")
    assert rows[1].n_bytes == 11
    assert rows[2].fake_width == 0x10 and rows[2].fake_height == 0x20
    assert rows[3].n_bytes == 0 and rows[3].fake_width == 0


def test_resize_roundtrip_schema(payloads):
    out = resize_stub(payloads)
    assert out.schema == payloads.schema
    assert out.count() == payloads.count()


def test_frame_sample_fanout(payloads):
    # frame size 4, stride 2: doc 1 (11 bytes → 2 frames) samples frame 0;
    # doc 2 (13 bytes → 3 frames) samples frames 0 and 2; doc 3 (empty) none
    rows = sample_frames(payloads, frame_bytes=4, stride=2, pfx_bytes=4).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert sorted(r.frame_idx for r in by_doc[1]) == [0]
    assert sorted(r.frame_idx for r in by_doc[2]) == [0, 2]
    assert 3 not in by_doc
    d2 = {r.frame_idx: r for r in by_doc[2]}
    assert d2[0].frame_pfx_hex == b"\x10\x20bi".hex().upper()
    assert d2[2].frame_pfx_hex == b"\x00blo".hex().upper()
    assert all(r.n_frames == 3 for r in by_doc[2])


def test_binary_column_survives_shuffle(payloads):
    """Binary payloads must round-trip a shuffle + join untouched."""
    meta = payloads.select("doc_id", F.md5(F.col("payload")).alias("h"))
    joined = payloads.repartition(4, "doc_id").join(meta, "doc_id")
    for r in joined.collect():
        import hashlib

        assert hashlib.md5(bytes(r.payload)).hexdigest() == r.h


# --- real dependency-free decoders (BMP / PCM-WAV), VERDICT r2 ask #6 ---


def test_decode_bmp_real_known_image():
    from ssidentity_spark.fixtures import build_bmp
    from ssidentity_spark.operators.multimodal import decode_image

    # solid mid-grey 4x2 → mean is exactly 100
    bmp = build_bmp(4, 2, pixel_fn=lambda x, y: (100, 100, 100))
    assert decode_image(bmp) == (4, 2, 100.0)
    # gradient image: mean equals the hand-computed channel average
    w, h = 5, 3
    bmp = build_bmp(w, h)
    total = sum(
        ((x * 7) % 256) + ((y * 11) % 256) + ((x + y) % 256)
        for y in range(h)
        for x in range(w)
    )
    width, height, mean = decode_image(bmp)
    assert (width, height) == (w, h)
    assert mean == pytest.approx(total / (w * h * 3))


def test_decode_bmp_row_padding_excluded():
    from ssidentity_spark.fixtures import build_bmp
    from ssidentity_spark.operators.multimodal import decode_image

    # width 3 → 9-byte rows padded to 12: mean must ignore the pad bytes
    bmp = build_bmp(3, 2, pixel_fn=lambda x, y: (200, 200, 200))
    assert decode_image(bmp) == (3, 2, 200.0)


def test_decode_wav_real_header():
    from ssidentity_spark.fixtures import build_wav
    from ssidentity_spark.operators.multimodal import decode_audio

    assert decode_audio(build_wav(1000, 22050, 2, 16)) == (2, 22050, 16, 1000)
    assert decode_audio(build_wav(441, 44100, 1, 8)) == (1, 44100, 8, 441)


def test_decoders_still_raise_on_compressed_formats():
    from ssidentity_spark.operators.multimodal import decode_audio, decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 64)  # jpeg
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x03" + b"\x00" * 64)  # mp3
    # PNG is now decodable, but a signature with garbage chunks still raises
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


def test_decode_png_known_images():
    from ssidentity_spark.fixtures import build_png
    from ssidentity_spark.operators.multimodal import decode_image

    # solid mid-grey RGB 4x2 → mean exactly 100, regardless of row filters
    png = build_png(4, 2, pixel_fn=lambda x, y: (100, 100, 100), color_type=2)
    assert decode_image(png) == (4, 2, 100.0)
    # grayscale: single channel mean
    png = build_png(3, 3, pixel_fn=lambda x, y: (x * 10 + y,), color_type=0)
    total = sum(x * 10 + y for y in range(3) for x in range(3))
    w, h, m = decode_image(png)
    assert (w, h) == (3, 3)
    assert m == pytest.approx(total / 9)
    # RGBA: alpha excluded from the mean
    png = build_png(
        2, 2, pixel_fn=lambda x, y: (10, 20, 30, 255), color_type=6
    )
    assert decode_image(png) == (2, 2, 20.0)


def test_decode_png_rejects_truncation_and_variants():
    from ssidentity_spark.fixtures import build_png
    from ssidentity_spark.operators.multimodal import decode_png

    png = build_png(8, 8)
    with pytest.raises(NotImplementedError):
        decode_png(png[: len(png) // 2])  # truncated chunk
    # 16-bit depth flag in IHDR → unsupported variant must raise, not
    # silently misdecode (IHDR data starts at byte 16; depth is byte 24)
    mutated = bytearray(png)
    mutated[24] = 16
    with pytest.raises(NotImplementedError):
        decode_png(bytes(mutated))


def test_extract_image_features_arrow_path(spark):
    """The REAL BMP decoder through the same mapInPandas/Arrow plumbing as
    the fake-decode query path."""
    from ssidentity_spark.fixtures import build_bmp
    from ssidentity_spark.operators.multimodal import extract_image_features

    from ssidentity_spark.fixtures import build_png

    rows = [
        (1, build_bmp(4, 2, pixel_fn=lambda x, y: (10, 20, 30))),
        (2, build_bmp(7, 5)),
        (3, build_bmp(1, 1, pixel_fn=lambda x, y: (255, 255, 255))),
        # mixed-format batch: the dispatcher routes per payload
        (4, build_png(4, 2, pixel_fn=lambda x, y: (10, 20, 30), color_type=2)),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, payload BINARY").repartition(2)
    got = {r.doc_id: r for r in extract_image_features(df).collect()}
    assert (got[1].width, got[1].height, got[1].mean_px) == (4, 2, 20.0)
    assert (got[3].width, got[3].height, got[3].mean_px) == (1, 1, 255.0)
    w, h = 7, 5
    total = sum(
        ((x * 7) % 256) + ((y * 11) % 256) + ((x + y) % 256)
        for y in range(h)
        for x in range(w)
    )
    assert got[2].mean_px == pytest.approx(total / (w * h * 3))
    assert (got[4].width, got[4].height, got[4].mean_px) == (4, 2, 20.0)


# --- property tests: decoders vs independently-computed ground truth ---

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        w=st.integers(min_value=1, max_value=17),
        h=st.integers(min_value=1, max_value=9),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    @settings(max_examples=40, deadline=None)
    def test_bmp_decode_roundtrip_property(w, h, seed):
        """Any width (including non-multiple-of-4 strides) decodes to the
        independently-computed channel mean."""
        from ssidentity_spark.fixtures import build_bmp
        from ssidentity_spark.operators.multimodal import decode_image

        def px(x, y):
            v = (x * 31 + y * 17 + seed) % 251
            return (v, (v * 3) % 256, (v * 7) % 256)

        bmp = build_bmp(w, h, pixel_fn=px)
        total = sum(sum(px(x, y)) for y in range(h) for x in range(w))
        got_w, got_h, got_mean = decode_image(bmp)
        assert (got_w, got_h) == (w, h)
        assert got_mean == pytest.approx(total / (w * h * 3))

    @given(
        w=st.integers(min_value=1, max_value=17),
        h=st.integers(min_value=1, max_value=9),
        color_type=st.sampled_from([0, 2, 6]),
        filters=st.lists(
            st.integers(min_value=0, max_value=4), min_size=9, max_size=9
        ),
        seed=st.integers(min_value=0, max_value=10_000),
    )
    @settings(max_examples=60, deadline=None)
    def test_png_decode_roundtrip_property(w, h, color_type, filters, seed):
        """decode∘encode == identity for every color type and any per-row
        mix of the five scanline filter types — the unfilter loop is the
        error-prone part, so filters are drawn adversarially."""
        from ssidentity_spark.fixtures import build_png
        from ssidentity_spark.operators.multimodal import decode_image

        channels = {0: 1, 2: 3, 6: 4}[color_type]
        color = 3 if channels == 4 else channels

        def px(x, y):
            v = (x * 31 + y * 17 + seed) % 251
            return ((v, (v * 3) % 256, (v * 7) % 256, (v * 13) % 256))[:channels]

        png = build_png(
            w, h, pixel_fn=px, color_type=color_type, row_filters=filters[:h]
        )
        total = sum(
            sum(px(x, y)[:color]) for y in range(h) for x in range(w)
        )
        got_w, got_h, got_mean = decode_image(png)
        assert (got_w, got_h) == (w, h)
        assert got_mean == pytest.approx(total / (w * h * color))

    @given(
        n=st.integers(min_value=1, max_value=5000),
        rate=st.sampled_from([8000, 16000, 22050, 44100]),
        ch=st.integers(min_value=1, max_value=4),
        bits=st.sampled_from([8, 16, 32]),
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_decode_roundtrip_property(n, rate, ch, bits):
        from ssidentity_spark.fixtures import build_wav
        from ssidentity_spark.operators.multimodal import decode_audio

        assert decode_audio(build_wav(n, rate, ch, bits)) == (ch, rate, bits, n)

except ImportError:  # pragma: no cover - hypothesis is in the env by contract
    pass


def test_decode_audio_samples_roundtrip():
    """Sample-level PCM decode against numpy ground truth, all PCM widths
    (8-bit unsigned per spec, 16/32-bit signed LE)."""
    import numpy as np

    from ssidentity_spark.operators.multimodal import (
        decode_audio_samples,
        pcm_wav_from_samples,
    )

    rng = np.random.default_rng(5)
    # 16-bit signed
    want16 = rng.integers(-32768, 32768, size=300, dtype=np.int16)
    ch, rate, bits, got = decode_audio_samples(
        pcm_wav_from_samples(want16.tobytes(), 22050, 1, 16)
    )
    assert (ch, rate, bits) == (1, 22050, 16)
    assert np.array_equal(got, want16.astype(np.int32))
    # 8-bit unsigned
    want8 = rng.integers(0, 256, size=100, dtype=np.uint8)
    _, _, bits, got = decode_audio_samples(
        pcm_wav_from_samples(want8.tobytes(), 8000, 1, 8)
    )
    assert bits == 8
    assert np.array_equal(got, want8.astype(np.int32))
    # 32-bit signed
    want32 = rng.integers(-(2**31), 2**31, size=50, dtype=np.int32)
    _, _, bits, got = decode_audio_samples(
        pcm_wav_from_samples(want32.tobytes(), 44100, 1, 32)
    )
    assert bits == 32
    assert np.array_equal(got, want32)


# ---------------------------------------------------------------------------
# r6 PNG variants: palette, 16-bit, Adam7 interlace (decode_png)
# ---------------------------------------------------------------------------


def _png_wrap(width, height, depth, color_type, interlace, raw, plte=b""):
    import struct as _s
    import zlib as _z

    def chunk(ctype, data):
        body = ctype + data
        return _s.pack(">I", len(data)) + body + _s.pack(">I", _z.crc32(body))

    ihdr = _s.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte:
        out += chunk(b"PLTE", plte)
    out += chunk(b"IDAT", _z.compress(raw)) + chunk(b"IEND", b"")
    return out


def test_decode_png_palette():
    from ssidentity_spark.operators.multimodal import decode_png

    plte = bytes([10, 20, 30, 200, 100, 0])  # two palette entries
    # 4x2 image alternating the two entries, filter 0 rows
    raw = b"\x00" + bytes([0, 1, 0, 1]) + b"\x00" + bytes([1, 0, 1, 0])
    w, h, m = decode_png(_png_wrap(4, 2, 8, 3, 0, raw, plte))
    assert (w, h) == (4, 2)
    assert m == pytest.approx((sum([10, 20, 30]) + sum([200, 100, 0])) / 6)


def test_decode_png_16bit_gray_and_rgba():
    import struct as _s

    from ssidentity_spark.operators.multimodal import decode_png

    # 3x1 16-bit gray: values v*257 scale back to v exactly
    vals = [0, 128, 255]
    raw = b"\x00" + b"".join(_s.pack(">H", v * 257) for v in vals)
    w, h, m = decode_png(_png_wrap(3, 1, 16, 0, 0, raw))
    assert (w, h) == (3, 1)
    assert m == pytest.approx(sum(vals) / 3)
    # 1x1 16-bit RGBA: alpha must be excluded
    raw = b"\x00" + _s.pack(">HHHH", 100 * 257, 50 * 257, 30 * 257, 9999)
    w, h, m = decode_png(_png_wrap(1, 1, 16, 6, 0, raw))
    assert m == pytest.approx((100 + 50 + 30) / 3)


def test_decode_png_adam7_interlaced():
    from ssidentity_spark.operators.multimodal import decode_png

    # 9x9 grayscale gradient, interlaced: every pixel appears in exactly
    # one Adam7 pass, so the mean must equal the plain-raster mean
    width = height = 9
    px = {(x, y): (x * 17 + y * 5) % 256 for x in range(width) for y in range(height)}
    passes = (
        (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
        (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
    )
    raw = bytearray()
    for x0, dx, y0, dy in passes:
        xs = list(range(x0, width, dx))
        ys = list(range(y0, height, dy))
        if not xs or not ys:
            continue
        for y in ys:
            raw.append(0)  # filter type 0
            raw.extend(px[(x, y)] for x in xs)
    w, h, m = decode_png(_png_wrap(width, height, 8, 0, 1, bytes(raw)))
    assert (w, h) == (width, height)
    expected = sum(px.values()) / (width * height)
    assert m == pytest.approx(expected)


def test_decode_png_still_rejects_unsupported():
    from ssidentity_spark.operators.multimodal import decode_png

    # sub-byte palette depth stays out of scope
    with pytest.raises(NotImplementedError):
        decode_png(_png_wrap(4, 1, 4, 3, 0, b"\x00\x01\x02", b"\x01\x02\x03"))
    # palette image without PLTE
    with pytest.raises(NotImplementedError):
        decode_png(_png_wrap(2, 1, 8, 3, 0, b"\x00\x00\x01"))


# ---------------------------------------------------------------------------
# r6 WAV variants: 24-bit PCM, IEEE float, WAVE_FORMAT_EXTENSIBLE
# ---------------------------------------------------------------------------


def _wav_wrap(fmt_body: bytes, data: bytes) -> bytes:
    import struct as _s

    chunks = b"fmt " + _s.pack("<I", len(fmt_body)) + fmt_body
    if len(fmt_body) & 1:
        chunks += b"\x00"
    chunks += b"data" + _s.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + _s.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_audio_24bit_pcm():
    import struct as _s

    from ssidentity_spark.operators.multimodal import (
        decode_audio,
        decode_audio_samples,
    )

    vals = [0, 1, -1, 8_388_607, -8_388_608, 123_456, -654_321]
    data = b"".join(_s.pack("<i", v)[:3] for v in vals)
    fmt = _s.pack("<HHIIHH", 1, 1, 16000, 16000 * 3, 3, 24)
    payload = _wav_wrap(fmt, data)
    assert decode_audio(payload) == (1, 16000, 24, len(vals))
    ch, rate, bits, samples = decode_audio_samples(payload)
    assert list(samples) == vals


def test_decode_audio_ieee_float():
    import struct as _s

    from ssidentity_spark.operators.multimodal import decode_audio_samples

    vals = [0.0, 0.5, -0.25, 1.0, -1.0]
    data = b"".join(_s.pack("<f", v) for v in vals)
    fmt = _s.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    ch, rate, bits, samples = decode_audio_samples(_wav_wrap(fmt, data))
    assert (ch, rate, bits) == (1, 8000, 32)
    assert samples.dtype.kind == "f"
    assert list(samples) == vals


def test_decode_audio_extensible_pcm():
    import struct as _s

    from ssidentity_spark.operators.multimodal import (
        decode_audio,
        decode_audio_samples,
    )

    vals = [100, -200, 300, -400]  # stereo 16-bit → 2 frames
    data = b"".join(_s.pack("<h", v) for v in vals)
    # WAVE_FORMAT_EXTENSIBLE: base fmt + cbSize=22 + validBits +
    # channelMask + SubFormat GUID (leading code 1 = PCM)
    guid = _s.pack("<H", 1) + b"\x00\x00" + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    fmt = _s.pack("<HHIIHHHHI", 0xFFFE, 2, 44100, 44100 * 4, 4, 16, 22, 16, 3) + guid
    payload = _wav_wrap(fmt, data)
    assert decode_audio(payload) == (2, 44100, 16, 2)
    _, _, _, samples = decode_audio_samples(payload)
    assert list(samples) == vals


def test_decode_audio_rejects_compressed():
    import struct as _s

    from ssidentity_spark.operators.multimodal import decode_audio

    fmt = _s.pack("<HHIIHH", 85, 1, 44100, 0, 1, 0)  # MP3-in-WAV
    with pytest.raises(NotImplementedError):
        decode_audio(_wav_wrap(fmt, b"\x00\x01"))


# --- MP3 frame-header metadata (r7: the last declared-modality gap) -------


def _mp3_frame(version=1, layer=3, br_idx=9, sr_idx=0, padding=0, mono=False):
    """Build one structurally valid MPEG frame: 4-byte header + zero
    payload sized per the spec formula (we never decode audio, only
    walk)."""
    ver_bits = {1: 3, 2: 2, 25: 0}[version]
    layer_bits = {1: 3, 2: 2, 3: 1}[layer]
    b1 = 0xFF
    b2 = 0xE0 | (ver_bits << 3) | (layer_bits << 1) | 1  # no CRC
    b3 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    b4 = 0xC0 if mono else 0x00
    from ssidentity_spark.operators.multimodal import _mp3_frame_header

    hdr = bytes([b1, b2, b3, b4])
    parsed = _mp3_frame_header(hdr, 0)
    assert parsed is not None
    frame_len = parsed[5]
    return hdr + bytes(frame_len - 4)


def test_mp3_metadata_walk_counts_frames():
    from ssidentity_spark.operators.multimodal import decode_mp3_metadata

    stream = b"".join(_mp3_frame() for _ in range(7))
    m = decode_mp3_metadata(stream)
    assert m == {
        "version": "MPEG1",
        "layer": 3,
        "sample_rate": 44100,
        "channels": 2,
        "n_frames": 7,
        "n_samples": 7 * 1152,
        "bitrate_kbps": 128,
        "vbr": False,
        "duration_s": round(7 * 1152 / 44100, 6),
    }


def test_mp3_id3v2_tag_skipped_and_vbr_flagged():
    from ssidentity_spark.operators.multimodal import decode_mp3_metadata

    # ID3v2 header: "ID3", version 3.0, flags 0, syncsafe size 130
    id3 = b"ID3\x03\x00\x00" + bytes([0, 0, 1, 2]) + bytes(130)
    stream = id3 + _mp3_frame(br_idx=9) + _mp3_frame(br_idx=11) + _mp3_frame(br_idx=9)
    m = decode_mp3_metadata(stream)
    assert m["n_frames"] == 3
    assert m["vbr"] is True
    assert m["bitrate_kbps"] == 128


def test_mp3_variants_mpeg2_layer2_mono_padding():
    from ssidentity_spark.operators.multimodal import decode_mp3_metadata

    s2 = b"".join(
        _mp3_frame(version=2, layer=3, br_idx=5, sr_idx=2, padding=i % 2, mono=True)
        for i in range(4)
    )
    m = decode_mp3_metadata(s2)
    assert (m["version"], m["layer"], m["sample_rate"], m["channels"]) == (
        "MPEG2", 3, 16000, 1
    )
    assert m["n_frames"] == 4 and m["n_samples"] == 4 * 576


def test_decode_audio_routes_mp3_instead_of_raising():
    from ssidentity_spark.operators.multimodal import decode_audio

    stream = b"".join(_mp3_frame() for _ in range(3))
    channels, rate, bits, n_samples = decode_audio(stream)
    assert (channels, rate, bits, n_samples) == (2, 44100, 0, 3 * 1152)


def test_mp3_garbage_still_raises():
    from ssidentity_spark.operators.multimodal import decode_mp3_metadata

    with pytest.raises(NotImplementedError, match="frame sync"):
        decode_mp3_metadata(b"ID3\x03\x00\x00" + bytes(20))
    with pytest.raises(NotImplementedError):
        decode_mp3_metadata(b"\x00\x01\x02\x03")


def test_dhash_robustness_and_banding_guarantee(spark):
    """dHash semantics pins: (a) gradient roundtrip is exact through the
    real PNG decode; (b) a 1-intensity pixel tweak leaves the hash
    unchanged (perceptual, not cryptographic); (c) inverting the gradient
    flips every bit; (d) banding catches every pair within 3 bits
    (pigeonhole over 4 bands)."""
    from ssidentity_spark.fixtures import build_png
    from ssidentity_spark.operators.multimodal import (
        decode_png_gray,
        dhash_bands,
    )

    base = bytes(range(256))

    def hash_of(b: bytes):
        png = build_png(
            16, 16, pixel_fn=lambda x, y, _b=b: (_b[y * 16 + x],), color_type=0
        )
        w, h, px = decode_png_gray(png)
        assert (w, h) == (16, 16) and px == b
        return dhash_bands(px, 16, 16)

    h0 = hash_of(base)
    assert h0 == (0xFFFF,) * 4  # monotone ramp: every neighbour increases

    tweaked = bytearray(base)
    tweaked[100] += 1
    assert hash_of(bytes(tweaked)) == h0  # 1-intensity nudge: invariant

    inverted = bytes(255 - v for v in base)
    h_inv = hash_of(inverted)
    assert h_inv == (0,) * 4  # every comparison flips

    # banding guarantee: hamming <= 3 cannot straddle all 4 bands
    for flip_bits in ((0,), (5, 20), (1, 30, 60)):
        bands = list(h0)
        for k in flip_bits:
            bands[k // 16] ^= 1 << (k % 16)
        assert any(bands[j] == h0[j] for j in range(4))


def test_audio_frame_features_semantics(spark):
    """Feature pins on crafted ASCII-safe signals (the operator utf-8
    encodes text, so payload bytes must be < 0x80 to arrive verbatim):
    a constant frame has zero ZCR and zero response in every non-DC
    Walsh-Hadamard coefficient; an amplitude-alternating frame
    concentrates into wht_1 exactly; energy is the exact integer sum of
    squares; the tail partial frame is dropped."""
    import pandas as pd

    from ssidentity_spark.operators.multimodal import audio_frame_features

    # frame 0: 64 equal samples from 'AA' byte pairs -> s = 65 + 65*256
    const_text = "AA" * 64
    # frame 1: samples alternate between 'dA' and 'DA' pairs:
    #   hi = ord('d') + 256*ord('A') = 100 + 16640, lo = 68 + 16640
    alt_text = "dADA" * 32
    # plus a 17-char tail: a partial frame that must be dropped
    text = const_text + alt_text + "x" * 17
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "text": [text]})
    )
    rows = {r["frame_idx"]: r.asDict() for r in
            audio_frame_features(df).collect()}
    assert set(rows) == {0, 1}

    s0 = 65 + 65 * 256
    r0 = rows[0]
    assert r0["energy"] == 64 * s0 * s0
    assert r0["zcr"] == 0
    assert (r0["wht_1"], r0["wht_2"], r0["wht_4"], r0["wht_8"]) == (0, 0, 0, 0)

    hi, lo = 100 + 65 * 256, 68 + 65 * 256
    r1 = rows[1]
    assert r1["energy"] == 32 * (hi * hi + lo * lo)
    assert r1["zcr"] == 0  # all positive: amplitude flips, no sign flips
    # per-sample alternation is sequency k=1: wht_1 = sum s_i * (-1)^i
    assert r1["wht_1"] == 32 * (hi - lo)
    # and is orthogonal to the k=2,4,8 basis functions
    assert (r1["wht_2"], r1["wht_4"], r1["wht_8"]) == (0, 0, 0)


def test_null_rows_skip_instead_of_crashing(spark):
    """A NULL text/payload row must be skipped like a sub-minimum one,
    not crash the executor task (review finding: every mapInPandas loop
    called .encode()/bytes() on the raw value)."""
    import pandas as pd

    from ssidentity_spark.operators.multimodal import (
        audio_frame_features,
        image_dhash_features,
        png_roundtrip_features,
        sample_frames,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["x" * 300, None]})
    )
    assert png_roundtrip_features(docs).count() == 1
    assert image_dhash_features(docs).count() == 1
    assert audio_frame_features(docs).count() > 0
    pay = docs.select(
        "doc_id",
        F.when(F.col("text").isNotNull(), F.encode("text", "UTF-8")).alias(
            "payload"
        ),
    )
    assert sample_frames(pay).filter("doc_id = 2").count() == 0


def test_wav_short_fmt_chunk_rejected():
    import struct

    from ssidentity_spark.operators.multimodal import _wav_walk
    import pytest

    # RIFF/WAVE with a 'fmt ' chunk DECLARING size 4 followed by data
    fmt = b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
    data = b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    body = b"WAVE" + fmt + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="fmt"):
        _wav_walk(payload)


def test_mp3_truncated_final_frame_not_counted():
    import struct

    from ssidentity_spark.operators.multimodal import decode_mp3_metadata

    # MPEG1 Layer III, 128kbps, 44100Hz: header 0xFFFB9000, frame_len 417
    header = bytes([0xFF, 0xFB, 0x90, 0x00])
    full = header + bytes(413)
    meta = decode_mp3_metadata(full + full)
    assert meta["n_frames"] == 2
    # cut the second frame to its header: it must not count
    meta2 = decode_mp3_metadata(full + header)
    assert meta2["n_frames"] == 1


def test_wav_partial_trailing_frame_consistent():
    import struct

    import numpy as np

    from ssidentity_spark.operators.multimodal import (
        decode_audio,
        decode_audio_samples,
    )

    # stereo 16-bit, data = 6 bytes (1.5 frames)
    fmt_body = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    fmt = b"fmt " + struct.pack("<I", 16) + fmt_body
    data = b"data" + struct.pack("<I", 6) + b"\x01\x00\x02\x00\x03\x00"
    body = b"WAVE" + fmt + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    ch, rate, bits, n = decode_audio(payload)
    _ch, _r, _b, samples = decode_audio_samples(payload)
    assert n == 1 and len(samples) == ch * n  # orphan half-frame dropped


def test_extract_features_null_payload_alignment(spark):
    """A NULL payload must be SKIPPED, not shift features onto the wrong
    doc_ids via pandas index alignment (and not NaN-pad the int32 cols)."""
    from ssidentity_spark.operators.multimodal import extract_features

    df = spark.createDataFrame(
        [(10, b"AB"), (11, None), (12, b"XY")], "doc_id LONG, payload BINARY"
    )
    got = {r.doc_id: (r.fake_width, r.n_bytes) for r in extract_features(df).collect()}
    assert got == {10: (ord("A"), 2), 12: (ord("X"), 2)}


def test_video_keyframe_signature_brightness_invariance(spark):
    """The gradient signature is dHash-like: a uniformly brightness-
    shifted clip (every byte +1, no clipping) collides with the
    original; a clip with a different gradient structure does not."""
    from ssidentity_spark.operators.multimodal import (
        video_keyframe_signatures,
    )

    base = "abcdefgh" * 16  # 128 bytes -> 4 frames of 8x4, rising rows
    shifted = "bcdefghi" * 16  # every byte +1: same gradients
    falling = "hgfedcba" * 16  # reversed gradients
    docs = spark.createDataFrame(
        [(1, base), (2, shifted), (3, falling)],
        "doc_id long, text string",
    )
    rows = video_keyframe_signatures(docs).collect()
    sigs = {}
    for r in rows:
        sigs.setdefault(r["doc_id"], {})[r["frame_idx"]] = r["sig"]
    assert sigs[1] == sigs[2]  # brightness shift invisible
    assert sigs[1] != sigs[3]
    # 4 frames -> keyframes 0 and 2
    assert sorted(sigs[1]) == [0, 1]


def test_video_keyframe_short_docs_skip(spark):
    from ssidentity_spark.operators.multimodal import (
        video_keyframe_signatures,
    )

    docs = spark.createDataFrame(
        [(1, "x" * 40), (2, None)], "doc_id long, text string"
    )
    assert video_keyframe_signatures(docs).count() == 0
