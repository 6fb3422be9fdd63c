"""Dependency-free FLAC codec (subset): encoder twin + full decoder for
streams using CONSTANT / VERBATIM / FIXED-prediction subframes with Rice
residual coding — the complete lossless path for the fixed-predictor
profile of the public xiph.org FLAC format.

Like operators/jpeg.py and the PNG path in operators/multimodal.py, this
exists so the engine's audio-column plumbing decodes a REAL compressed
format end-to-end without codec libraries (the sandbox has none): the
encoder is the independent twin used by decode∘encode property tests and
by the hash-gated ``mm_flac_decode`` query, whose DuckDB oracle recomputes
sample stats from raw bytes — so the whole bit-level chain (UTF-8 frame
numbers, unary/Rice codes, fixed predictors, CRC-8/CRC-16, MD5) is
verified against an engine that never sees FLAC at all.

Scope (documented boundary, mirrors the JPEG/MP3 notes in COVERAGE.md):
independent channels only (no left/side, right/side, mid/side stereo
decorrelation), FIXED and not LPC subframes, 8/16/24-bit samples (32-bit frame
headers are honoured per RFC 9639 §9.1.3 — 0b111 is 32 bps, not
reserved). Streams
produced by ``encode_flac`` always decode; foreign fixed-profile streams
decode too; LPC/side-coded streams raise ``NotImplementedError``.

Reference impetus: the sniffer stores opaque byte payloads per observation
(ssidentity.c:83-84 reads raw buffers); the multimodal column surface
(SURVEY §2 EXT rows) treats audio as binary + typed metadata, and this
codec is the decode step behind it.
"""

from __future__ import annotations

import hashlib
import struct

# ---------------------------------------------------------------------------
# CRCs (FLAC frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005, both
# init 0, no reflection) — tables built once at import
# ---------------------------------------------------------------------------


def _crc8_table() -> list[int]:
    tbl = []
    for byte in range(256):
        c = byte
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        tbl.append(c)
    return tbl


def _crc16_table() -> list[int]:
    tbl = []
    for byte in range(256):
        c = byte << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        tbl.append(c)
    return tbl


_CRC8 = _crc8_table()
_CRC16 = _crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ _CRC16[((c >> 8) ^ b) & 0xFF]
    return c


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0
        self.out = bytearray()

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self.out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a one bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def bytes(self) -> bytes:
        assert self._nbits == 0, "unaligned"
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos  # byte position of next fill
        self._acc = 0
        self._nbits = 0

    def read(self, nbits: int) -> int:
        while self._nbits < nbits:
            if self.pos >= len(self.data):
                raise ValueError("truncated FLAC stream")
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._nbits += 8
        self._nbits -= nbits
        v = (self._acc >> self._nbits) & ((1 << nbits) - 1)
        self._acc &= (1 << self._nbits) - 1
        return v

    def read_signed(self, nbits: int) -> int:
        if nbits == 0:
            # legal escaped-Rice partition with raw_bits=0: all residuals
            # are zero (1 << -1 would raise otherwise)
            return 0
        v = self.read(nbits)
        return v - (1 << nbits) if v >= 1 << (nbits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self._nbits = 0
        self._acc = 0

    def byte_pos(self) -> int:
        assert self._nbits % 8 == 0
        return self.pos - self._nbits // 8


# ---------------------------------------------------------------------------
# fixed predictors (FLAC orders 0-4; residual = sample - prediction)
# ---------------------------------------------------------------------------

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(samples: list[int], order: int) -> list[int]:
    coeffs = _FIXED_COEFFS[order]
    return [
        samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coeffs))
        for i in range(order, len(samples))
    ]


def _fixed_restore(warmup: list[int], residual: list[int], order: int) -> list[int]:
    coeffs = _FIXED_COEFFS[order]
    out = list(warmup)
    for r in residual:
        out.append(r + sum(c * out[-1 - j] for j, c in enumerate(coeffs)))
    return out


def _zigzag(r: int) -> int:
    return (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _rice_cost(residual: list[int], param: int) -> int:
    return sum((_zigzag(r) >> param) + 1 + param for r in residual)


def _best_rice_param(residual: list[int]) -> int:
    best_p, best_c = 0, _rice_cost(residual, 0)
    for p in range(1, 15):
        c = _rice_cost(residual, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

_MAX_BLOCK = 4096


def _utf8_number(w: _BitWriter, n: int) -> None:
    # FLAC frame numbers use UTF-8-style variable-length coding
    if n < 0x80:
        w.write(n, 8)
    elif n < 0x800:
        w.write(0xC0 | (n >> 6), 8)
        w.write(0x80 | (n & 0x3F), 8)
    elif n < 0x10000:
        w.write(0xE0 | (n >> 12), 8)
        w.write(0x80 | ((n >> 6) & 0x3F), 8)
        w.write(0x80 | (n & 0x3F), 8)
    else:
        raise NotImplementedError("frame number >= 2^16")


def _encode_subframe(w: _BitWriter, block: list[int], bps: int) -> None:
    if all(s == block[0] for s in block):
        w.write(0, 1)  # pad
        w.write(0, 6)  # type: CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(block[0] & ((1 << bps) - 1), bps)
        return
    # pick the fixed order (0-4) with the cheapest rice'd residual
    best = None
    for order in range(min(4, len(block) - 1) + 1):
        res = _fixed_residual(block, order)
        p = _best_rice_param(res)
        cost = order * bps + _rice_cost(res, p)
        if best is None or cost < best[0]:
            best = (cost, order, p, res)
    cost, order, param, res = best
    if cost >= len(block) * bps:
        w.write(0, 1)
        w.write(1, 6)  # VERBATIM
        w.write(0, 1)
        for s in block:
            w.write(s & ((1 << bps) - 1), bps)
        return
    w.write(0, 1)
    w.write(0b001000 | order, 6)  # FIXED, order in low 3 bits
    w.write(0, 1)
    for s in block[:order]:  # warm-up
        w.write(s & ((1 << bps) - 1), bps)
    w.write(0, 2)  # residual method 0: 4-bit rice
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    for r in res:
        u = _zigzag(r)
        w.write_unary(u >> param)
        w.write(u, param)


def encode_flac(samples: list[int], sample_rate: int = 16000, bps: int = 16) -> bytes:
    """Mono fixed-profile FLAC stream: STREAMINFO + one frame per 4096
    samples (CONSTANT / VERBATIM / best FIXED order per frame, partition
    order 0 Rice residuals). Lossless by construction — pinned by the
    decode∘encode tests and the stream's own STREAMINFO MD5."""
    n = len(samples)
    if n == 0:
        raise ValueError("empty stream")
    pcm = b"".join(
        struct.pack("<i", s)[: bps // 8] for s in samples
    )
    md5 = hashlib.md5(pcm).digest()
    blocks = [samples[i : i + _MAX_BLOCK] for i in range(0, n, _MAX_BLOCK)]

    si = _BitWriter()
    # spec: min/max blocksize EXCLUDE the (possibly short) final block —
    # a 4097-sample stream must not advertise min-blocksize 1 (< the
    # 16-sample floor strict decoders enforce)
    full_blocks = blocks[:-1] if len(blocks) > 1 else blocks
    si.write(min(len(b) for b in full_blocks), 16)
    si.write(max(len(b) for b in blocks), 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(0, 3)  # channels - 1
    si.write(bps - 1, 5)
    si.write(n, 36)
    streaminfo = si.bytes() + md5

    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo

    for idx, block in enumerate(blocks):
        h = _BitWriter()
        h.write(0b11111111111110, 14)
        h.write(0, 1)  # reserved
        h.write(0, 1)  # fixed-blocksize strategy
        h.write(0b0111, 4)  # blocksize: 16-bit value at header end
        h.write(0b0000, 4)  # sample rate: from STREAMINFO
        h.write(0b0000, 4)  # channel assignment: 1 channel
        h.write({8: 0b001, 16: 0b100, 24: 0b110}[bps], 3)
        h.write(0, 1)  # reserved
        _utf8_number(h, idx)
        h.write(len(block) - 1, 16)
        header = h.bytes()
        header += bytes([crc8(header)])

        body = _BitWriter()
        _encode_subframe(body, block, bps)
        body.align()
        frame = header + body.bytes()
        frame += struct.pack(">H", crc16(frame))
        out += frame
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_BLOCKSIZES = {
    0b0001: 192, 0b0010: 576, 0b0011: 1152, 0b0100: 2304, 0b0101: 4608,
    0b1000: 256, 0b1001: 512, 0b1010: 1024, 0b1011: 2048, 0b1100: 4096,
    0b1101: 8192, 0b1110: 16384, 0b1111: 32768,
}
# RFC 9639 §9.1.3: 0b111 is 32 bps (it was reserved pre-RFC); only
# 0b011 remains reserved
_SAMPLE_SIZES = {0b001: 8, 0b010: 12, 0b100: 16, 0b101: 20, 0b110: 24, 0b111: 32}


def _read_utf8_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    for mask, bits in ((0xE0, 0xC0), (0xF0, 0xE0), (0xF8, 0xF0)):
        n_follow += 1
        if (b0 & mask) == bits:
            v = b0 & (0xFF >> (n_follow + 2))
            for _ in range(n_follow):
                nxt = r.read(8)
                if (nxt & 0xC0) != 0x80:
                    raise ValueError("bad UTF-8 continuation in frame number")
                v = (v << 6) | (nxt & 0x3F)
            return v
    raise NotImplementedError("frame numbers beyond 4-byte UTF-8")


def _decode_subframe(r: _BitReader, blocksize: int, bps: int) -> list[int]:
    if r.read(1) != 0:
        raise ValueError("subframe padding bit set")
    sf_type = r.read(6)
    wasted = 0
    if r.read(1):  # wasted-bits flag: unary count follows
        wasted = r.read_unary() + 1
        bps -= wasted
    if sf_type == 0:  # CONSTANT
        v = r.read_signed(bps)
        samples = [v] * blocksize
    elif sf_type == 1:  # VERBATIM
        samples = [r.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= sf_type <= 12:  # FIXED order 0-4
        order = sf_type & 0x07
        warm = [r.read_signed(bps) for _ in range(order)]
        method = r.read(2)
        if method not in (0, 1):
            raise ValueError(f"reserved residual method {method}")
        pbits = 4 if method == 0 else 5
        escape = (1 << pbits) - 1
        part_order = r.read(4)
        n_parts = 1 << part_order
        if blocksize % n_parts:
            raise ValueError("partition count does not divide blocksize")
        res: list[int] = []
        for part in range(n_parts):
            count = blocksize >> part_order
            if part == 0:
                count -= order
            param = r.read(pbits)
            if param == escape:
                raw_bits = r.read(5)
                res.extend(r.read_signed(raw_bits) for _ in range(count))
            else:
                for _ in range(count):
                    u = (r.read_unary() << param) | r.read(param)
                    res.append(_unzigzag(u))
        samples = _fixed_restore(warm, res, order)
    elif 32 <= sf_type <= 63:
        raise NotImplementedError("LPC subframes out of scope (fixed profile)")
    else:
        raise ValueError(f"reserved subframe type {sf_type}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes):
    """Parse a fixed-profile FLAC stream → (sample_rate, bps, samples).

    Verifies every frame-header CRC-8, every frame CRC-16, and the
    stream-level MD5 from STREAMINFO — a corrupted bit anywhere raises.
    """
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("truncated metadata")
        last = payload[pos] & 0x80
        btype = payload[pos] & 0x7F
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        if btype == 0:
            streaminfo = payload[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("missing STREAMINFO")
    si = _BitReader(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)
    si.read(24)
    sample_rate = si.read(20)
    channels = si.read(3) + 1
    bps_si = si.read(5) + 1
    total = si.read(36)
    md5_expected = streaminfo[18:34]
    if channels != 1:
        raise NotImplementedError("independent mono only in this profile")

    samples: list[int] = []
    while pos < len(payload) and len(samples) < total:
        frame_start = pos
        r = _BitReader(payload, pos)
        if r.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        r.read(1)
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan_assign = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        _read_utf8_number(r)
        if bs_code == 0b0110:
            blocksize = r.read(8) + 1
        elif bs_code == 0b0111:
            blocksize = r.read(16) + 1
        elif bs_code in _BLOCKSIZES:
            blocksize = _BLOCKSIZES[bs_code]
        else:
            raise ValueError(f"reserved blocksize code {bs_code}")
        if sr_code in (0b1100, 0b1101, 0b1110):  # rate value in header
            r.read(8 if sr_code == 0b1100 else 16)
        if ss_code == 0b011:
            # the one reserved code must fail HERE with the real cause —
            # falling back to the STREAMINFO width decodes every subframe
            # at the wrong size and surfaces only as a baffling stream-MD5
            # mismatch much later (mirrors the blocksize handling above)
            raise ValueError(f"reserved sample-size code {ss_code:#05b}")
        bps = _SAMPLE_SIZES[ss_code] if ss_code else bps_si
        if chan_assign != 0:
            raise NotImplementedError("stereo decorrelation out of scope")
        header_end = r.byte_pos()
        if header_end >= len(payload):
            raise ValueError("truncated frame header")
        if crc8(payload[frame_start:header_end]) != payload[header_end]:
            raise ValueError("frame header CRC-8 mismatch")
        r = _BitReader(payload, header_end + 1)
        block = _decode_subframe(r, blocksize, bps)
        r.align()
        footer_at = r.byte_pos()
        if footer_at + 2 > len(payload):
            raise ValueError("truncated frame footer")
        (crc_stored,) = struct.unpack_from(">H", payload, footer_at)
        if crc16(payload[frame_start:footer_at]) != crc_stored:
            raise ValueError("frame CRC-16 mismatch")
        pos = footer_at + 2
        samples.extend(block)

    if len(samples) != total:
        raise ValueError(f"decoded {len(samples)} of {total} samples")
    pcm = b"".join(struct.pack("<i", s)[: bps_si // 8] for s in samples)
    if hashlib.md5(pcm).digest() != md5_expected:
        raise ValueError("stream MD5 mismatch")
    return sample_rate, bps_si, samples
