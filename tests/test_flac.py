"""operators/flac: lossless roundtrip, integrity checks, format plumbing."""

from __future__ import annotations

import math
import random

import pytest

from ssidentity_spark.operators.flac import (
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def test_roundtrip_constant_ramp_noise():
    random.seed(11)
    cases = [
        [42] * 4097,  # constant, spans two frames
        list(range(-3000, 3000)),  # perfectly linear → order-2 residuals 0
        [random.randint(-32768, 32767) for _ in range(6000)],  # incompressible
    ]
    for samples in cases:
        rate, bps, out = decode_flac(encode_flac(samples))
        assert out == samples
        assert (rate, bps) == (16000, 16)


def test_smooth_signal_actually_compresses():
    random.seed(5)
    samples = [
        int(12000 * math.sin(i / 40)) + random.randint(-8, 8)
        for i in range(8000)
    ]
    blob = encode_flac(samples)
    assert decode_flac(blob)[2] == samples
    assert len(blob) < len(samples) * 2 * 0.5  # > 2x over raw 16-bit PCM


def test_8_and_24_bit_paths():
    random.seed(3)
    s8 = [random.randint(-128, 127) for _ in range(1000)]
    assert decode_flac(encode_flac(s8, bps=8))[2] == s8
    s24 = [random.randint(-(1 << 23), (1 << 23) - 1) for _ in range(1000)]
    assert decode_flac(encode_flac(s24, bps=24))[2] == s24


def test_every_corrupted_byte_is_detected():
    random.seed(9)
    samples = [int(500 * math.sin(i / 9)) for i in range(600)]
    blob = bytearray(encode_flac(samples))
    # flip one bit in every byte past the magic: CRC-8 (header), CRC-16
    # (frame), or MD5 (stream) must catch each one — or the decode must
    # come back bit-identical is NOT acceptable for a real flip, so any
    # non-raising decode must be re-checked against the original
    caught = 0
    for i in range(4, len(blob)):
        blob[i] ^= 0x10
        try:
            _, _, out = decode_flac(bytes(blob))
            assert out == samples  # only legal if the flip was immaterial
        except (ValueError, NotImplementedError, IndexError):
            caught += 1
        blob[i] ^= 0x10
    assert caught > (len(blob) - 4) * 0.85


def test_utf8_frame_numbers_beyond_one_byte():
    # >128 frames forces multi-byte UTF-8 frame numbers
    samples = [(i * 7) % 20000 - 10000 for i in range(4096 * 130)]
    _, _, out = decode_flac(encode_flac(samples))
    assert out == samples


def test_rejects_non_flac():
    with pytest.raises(ValueError):
        decode_flac(b"RIFF....WAVE")


def test_crc_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 on the classic check string
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_read_signed_zero_bits_is_zero():
    """Escaped-Rice partitions with raw_bits=0 (all-zero residuals) are
    legal FLAC; reading 0 signed bits must yield 0, not a shift error."""
    from ssidentity_spark.operators.flac import _BitReader

    r = _BitReader(b"\xff")
    assert r.read_signed(0) == 0
    assert r.read_signed(0) == 0


def test_streaminfo_min_blocksize_excludes_short_final_block():
    """Per spec, min/max blocksize exclude the (possibly short) last
    block — a 4097-sample stream must not advertise min-blocksize 1."""
    from ssidentity_spark.operators.flac import decode_flac, encode_flac

    samples = [(i * 37) % 1000 - 500 for i in range(4097)]
    blob = encode_flac(samples)
    # STREAMINFO: bytes 8.. hold min blocksize (16 bits) after the
    # 'fLaC' magic + 4-byte block header
    min_bs = int.from_bytes(blob[8:10], "big")
    assert min_bs == 4096
    _rate, _bps, decoded = decode_flac(blob)
    assert decoded == samples


def test_reserved_sample_size_code_rejected():
    # ADVICE r6 + review r7: the one RESERVED sample-size code (0b011 —
    # RFC 9639 defines 0b111 as 32 bps, not reserved) must fail AT THE
    # HEADER with the real cause, not fall back to the STREAMINFO width
    # and die later in a misleading stream-MD5 mismatch.
    payload = bytearray(encode_flac([100, -100] * 64))
    # layout: fLaC(4) + block header(4) + STREAMINFO(18+16 md5) = first
    # frame header at 42; its byte 3 = chan(4) | ss_code(3) | reserved(1)
    fh = 42
    assert payload[fh] == 0xFF and payload[fh + 1] == 0xF8
    payload[fh + 3] = (payload[fh + 3] & 0b11110001) | (0b011 << 1)
    payload[fh + 7] = crc8(bytes(payload[fh : fh + 7]))  # re-seal CRC-8
    with pytest.raises(ValueError, match="reserved sample-size"):
        decode_flac(bytes(payload))
