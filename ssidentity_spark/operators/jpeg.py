"""Dependency-free baseline JPEG codec (grayscale, SOF0) — the last
compressed image format the container can support without codec libraries.

Decoder: full segment walk (DQT / SOF0 / DHT / SOS), canonical Huffman
tables built FROM THE STREAM's DHT segments (so any baseline grayscale
JPEG decodes, not just our encoder's output), entropy decode with 0xFF00
unstuffing, dequantize, dezigzag, numpy IDCT (orthonormal DCT-II basis),
level-unshift and edge-pad crop. Color/progressive/arithmetic variants
raise NotImplementedError — the boundary where libjpeg plugs in.

Encoder: the independent inverse used by the property tests — 8×8 block
DCT → quantize → zigzag → DC-diff/AC-run-length entropy coding with
self-describing canonical Huffman tables written into DHT (flat-length
tables: every symbol at one code length with the all-ones code unused,
per the JPEG canonical-code rule). With a unit quantization table the
only loss is coefficient rounding, which bounds per-pixel reconstruction
error — the property the tests pin (decode∘encode: exact dims, max
pixel error ≤ 4, mean error ≤ 1).

Reference scope note: multimodal columns are an EXT family
(BASELINE.json north star), not part of the 441-line C reference.
"""

from __future__ import annotations

import struct

import numpy as np

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_basis() -> np.ndarray:
    n = 8
    c = np.zeros((n, n))
    for k in range(n):
        for i in range(n):
            c[k, i] = np.cos((2 * i + 1) * k * np.pi / (2 * n))
    c *= np.sqrt(2.0 / n)
    c[0, :] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_basis()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _flat_huffman(symbols: list[int], length: int) -> tuple[dict[int, tuple[int, int]], bytes]:
    """Canonical table with every symbol at one code length. Returns
    (symbol → (code, length), DHT payload (16 counts + symbols)).
    Requires len(symbols) < 2**length so the all-ones code stays unused."""
    assert len(symbols) < (1 << length)
    table = {s: (i, length) for i, s in enumerate(symbols)}
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    return table, bytes(counts) + bytes(symbols)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _amplitude(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def encode_jpeg_gray(
    pixels: list[list[int]], quant: int = 1
) -> bytes:
    """Encode a row-major 8-bit grayscale image as baseline JPEG.

    ``quant`` fills the whole quantization table (1 = near-lossless:
    rounding error only)."""
    h = len(pixels)
    w = len(pixels[0])
    img = np.array(pixels, dtype=np.float64)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    q = np.full(64, quant, dtype=np.int32)

    dc_syms = list(range(12))
    ac_syms = sorted({0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)})
    dc_table, dc_dht = _flat_huffman(dc_syms, 4)
    ac_table, ac_dht = _flat_huffman(ac_syms, 9)

    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coef = _C @ block @ _C.T
            zz = np.array([coef.flat[i] for i in _ZIGZAG])
            qz = np.round(zz / q).astype(int)
            # DC
            diff = int(qz[0]) - prev_dc
            prev_dc = int(qz[0])
            s = _category(diff)
            code, ln = dc_table[s]
            bw.write(code, ln)
            bw.write(_amplitude(diff, s), s)
            # AC
            run = 0
            last_nz = max((i for i in range(1, 64) if qz[i] != 0), default=0)
            for i in range(1, last_nz + 1):
                v = int(qz[i])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    code, ln = ac_table[0xF0]
                    bw.write(code, ln)
                    run -= 16
                s = _category(v)
                code, ln = ac_table[(run << 4) | s]
                bw.write(code, ln)
                bw.write(_amplitude(v, s), s)
                run = 0
            if last_nz < 63:
                code, ln = ac_table[0x00]  # EOB
                bw.write(code, ln)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zz_q = bytes(int(q[i]) for i in range(64))
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFDB, b"\x00" + zz_q)  # DQT, table 0, 8-bit
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += seg(0xFFC4, b"\x00" + dc_dht)  # DHT class 0 (DC) id 0
    out += seg(0xFFC4, b"\x10" + ac_dht)  # DHT class 1 (AC) id 0
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return out


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        # set once a marker stops the fill: exactly ONE byte of 1-padding
        # is allowed past end-of-entropy (spec: pad bits complete the last
        # code); a decode that keeps asking after that is off the rails
        # and must raise, not spin on endless 0xFF refills.
        self.ended = False

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    # marker (EOI / restart) — end of entropy data
                    self.pos -= 1
                    byte = None
            if byte is None:
                if not self.ended:
                    self.acc = (self.acc << 8) | 0xFF  # 1-padding
                    self.nbits += 8
                    self.ended = True
                break
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                raise NotImplementedError("truncated JPEG entropy stream")
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _canonical_codes(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """DHT counts/symbols → {(length, code): symbol}."""
    codes: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[(ln, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_decode(br: _BitReader, codes: dict[tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = codes.get((ln, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_gray(payload: bytes) -> tuple[int, int, float]:
    """Decode a baseline grayscale JPEG: (width, height, mean_pixel).

    Tables come from the stream's own DQT/DHT segments; any single-
    component SOF0 stream decodes. Color, progressive (SOF2), and
    arithmetic coding raise NotImplementedError.
    """
    px = decode_jpeg_gray_pixels(payload)
    return px.shape[1], px.shape[0], float(px.mean())


def decode_jpeg_gray_pixels(payload: bytes) -> np.ndarray:
    """Full pixel decode (h×w float array in [0, 255]) — the substrate of
    ``decode_jpeg_gray`` and the per-pixel error-bound property tests."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    dims: tuple[int, int] | None = None
    scan: bytes | None = None
    dc_id = ac_id = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise NotImplementedError("malformed JPEG segment stream")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly multiple tables)
            b = body
            while b:
                if len(b) < 65:
                    raise NotImplementedError("truncated JPEG DQT segment")
                prec, tid = b[0] >> 4, b[0] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                quant[tid] = list(b[1:65])
                b = b[65:]
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if ncomp != 1:
                raise NotImplementedError("only grayscale JPEG decodable (no codec libs)")
            # body: prec(1) h(2) w(2) ncomp(1) then per component:
            # id(1) sampling(1) qtab(1)
            if body[7] != 0x11:
                raise NotImplementedError("subsampled JPEG unsupported")
            dims = (w, h)
            qtab_id = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError("only baseline (SOF0) JPEG decodable")
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            b = body
            while b:
                if len(b) < 17:
                    raise NotImplementedError("truncated JPEG DHT segment")
                cls, tid = b[0] >> 4, b[0] & 0x0F
                counts = list(b[1:17])
                n = sum(counts)
                if len(b) < 17 + n:
                    raise NotImplementedError("truncated JPEG DHT segment")
                huff[(cls, tid)] = _canonical_codes(counts, b[17 : 17 + n])
                b = b[17 + n :]
        elif marker == 0xDA:  # SOS
            dc_id = body[2] >> 4
            ac_id = body[2] & 0x0F
            scan = payload[pos + 2 + ln :]
            break
        pos += 2 + ln
    if dims is None or scan is None:
        raise NotImplementedError("JPEG missing SOF0/SOS segments")
    w, h = dims
    if (0, dc_id) not in huff or (1, ac_id) not in huff or qtab_id not in quant:
        raise NotImplementedError("JPEG scan references missing tables")
    dc_codes, ac_codes = huff[(0, dc_id)], huff[(1, ac_id)]
    q = np.array(quant[qtab_id], dtype=np.float64)

    br = _BitReader(scan)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    img = np.zeros((ph, pw))
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            zz = np.zeros(64)
            s = _huff_decode(br, dc_codes)
            prev_dc += _extend(br.read_bits(s), s)
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = _huff_decode(br, ac_codes)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if run != 15:
                        raise NotImplementedError("invalid JPEG AC symbol")
                    i += 16  # ZRL
                    continue
                i += run
                if i >= 64:
                    raise NotImplementedError("JPEG AC coefficient overflow")
                zz[i] = _extend(br.read_bits(size), size)
                i += 1
            coef = np.zeros(64)
            for k, zi in enumerate(_ZIGZAG):
                coef[zi] = zz[k] * q[k]
            block = _C.T @ coef.reshape(8, 8) @ _C + 128.0
            img[by : by + 8, bx : bx + 8] = block
    return np.clip(img[:h, :w], 0, 255)
