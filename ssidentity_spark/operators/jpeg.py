"""Dependency-free baseline JPEG codec (SOF0, grayscale AND YCbCr color)
— the last compressed image format the container can support without
codec libraries.

Decoder: full segment walk (DQT / SOF0 / DHT / SOS), canonical Huffman
tables built FROM THE STREAM's DHT segments (so any baseline JPEG
decodes, not just our encoder's output), entropy decode with 0xFF00
unstuffing, dequantize, dezigzag, numpy IDCT (orthonormal DCT-II basis),
level-unshift and edge-pad crop. 3-component scans run the interleaved
MCU walk with per-component sampling factors up to 2×2 (4:4:4 / 4:2:2 /
4:2:0), nearest-neighbour chroma upsample, and JFIF BT.601 YCbCr→RGB. Restart
intervals (DRI/RSTn) are honoured: byte-align, DC-predictor reset per
interval. SOF2 streams dispatch to the progressive codec
(operators/jpeg_progressive.py — spectral selection + successive
approximation); arithmetic coding raises NotImplementedError — the
boundary where libjpeg plugs in.

Encoder: the independent inverse used by the property tests — 8×8 block
DCT → quantize → zigzag → DC-diff/AC-run-length entropy coding with
self-describing canonical Huffman tables written into DHT (flat-length
tables: every symbol at one code length with the all-ones code unused,
per the JPEG canonical-code rule). ``encode_jpeg_color`` writes separate
luma/chroma quant + Huffman table ids and a 4:2:0 (2×2-box-mean chroma)
or 4:4:4 interleaved scan. With a unit quantization table the only loss
is coefficient rounding (plus chroma box-mean under 4:2:0), which bounds
per-pixel reconstruction error — the property the tests pin
(decode∘encode: exact dims, max pixel error ≤ 4, mean error ≤ 1 for
gray/4:4:4; chroma-flat images bounded likewise under 4:2:0).

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


def _build_flat_tables():
    """The encoder's self-describing tables: DC categories 0-11 at 4 bits,
    all (run, size) AC symbols at 9 bits."""
    dc_syms = list(range(12))
    ac_syms = sorted({0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)})
    dc_table, dc_dht = _flat_huffman(dc_syms, 4)
    ac_table, ac_dht = _flat_huffman(ac_syms, 9)
    return dc_table, dc_dht, ac_table, ac_dht


def _encode_block(bw, block, q, dc_table, ac_table, prev_dc: int) -> int:
    """DCT → quantize → zigzag → DC-diff/AC-RLE entropy code one 8×8
    block; returns the new DC predictor."""
    coef = _C @ (block - 128.0) @ _C.T
    zz = np.array([coef.flat[i] for i in _ZIGZAG])
    qz = np.round(zz / q).astype(int)
    # DC
    diff = int(qz[0]) - prev_dc
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
    return int(qz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _emit_restart(bw: _BitWriter, n: int) -> None:
    """Byte-align (1-padding per spec) and write the RSTn marker raw —
    markers are never byte-stuffed."""
    bw.flush()
    bw.out.append(0xFF)
    bw.out.append(0xD0 + (n % 8))


def encode_jpeg_gray(
    pixels: list[list[int]], quant: int = 1, restart_interval: int = 0
) -> bytes:
    """Encode a row-major 8-bit grayscale image as baseline JPEG.

    ``quant`` fills the whole quantization table (1 = near-lossless:
    rounding error only). ``restart_interval > 0`` writes a DRI segment
    and an RSTn marker every that-many MCUs (blocks, for the
    single-component non-interleaved scan), resetting the DC predictor —
    the recoverability feature real encoders emit."""
    h = len(pixels)
    w = len(pixels[0])
    img = np.array(pixels, dtype=np.float64)
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    q = np.full(64, quant, dtype=np.int32)

    dc_table, dc_dht, ac_table, ac_dht = _build_flat_tables()

    bw = _BitWriter()
    prev_dc = 0
    mcu_i = 0
    rst = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                _emit_restart(bw, rst)
                rst += 1
                prev_dc = 0
            mcu_i += 1
            prev_dc = _encode_block(
                bw, padded[by : by + 8, bx : bx + 8], q, dc_table, ac_table, prev_dc
            )
    bw.flush()

    zz_q = bytes(int(q[i]) for i in range(64))
    out = b"\xff\xd8"  # SOI
    out += _seg(0xFFDB, b"\x00" + zz_q)  # DQT, table 0, 8-bit
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xFFC4, b"\x00" + dc_dht)  # DHT class 0 (DC) id 0
    out += _seg(0xFFC4, b"\x10" + ac_dht)  # DHT class 1 (AC) id 0
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return out


# JFIF YCbCr <-> RGB (ITU-R BT.601 full-range) coefficient matrices
def _rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def encode_jpeg_color(
    pixels, quant: int = 1, subsample: bool = True, restart_interval: int = 0
) -> bytes:
    """Encode an (h × w × 3) RGB image as baseline color JPEG.

    ``subsample=True`` → 4:2:0 (Y at 2×2 sampling, chroma at 1×1 from a
    2×2 box mean — 16×16-pixel interleaved MCUs of 4 Y + 1 Cb + 1 Cr
    blocks); ``False`` → 4:4:4 (every MCU one block per component).
    Separate luma/chroma quantization and Huffman table ids exercise the
    decoder's multi-table walk; the flat-table contents are shared."""
    rgb = np.asarray(pixels, dtype=np.float64)
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_jpeg_color expects an (h, w, 3) RGB array")
    h, w = rgb.shape[:2]
    yh = yv = 2 if subsample else 1
    mcu_w, mcu_h = 8 * yh, 8 * yv
    ph = (h + mcu_h - 1) // mcu_h * mcu_h
    pw = (w + mcu_w - 1) // mcu_w * mcu_w
    rgb = np.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
    y, cb, cr = _rgb_to_ycbcr(rgb)
    if subsample:
        # 2×2 box mean — the standard chroma downsample
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

    q = np.full(64, quant, dtype=np.int32)
    dc_table, dc_dht, ac_table, ac_dht = _build_flat_tables()

    bw = _BitWriter()
    prev = [0, 0, 0]  # per-component DC predictors
    n_mcux, n_mcuy = pw // mcu_w, ph // mcu_h
    mcu_i = 0
    rst = 0
    for my in range(n_mcuy):
        for mx in range(n_mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                _emit_restart(bw, rst)
                rst += 1
                prev = [0, 0, 0]
            mcu_i += 1
            for bv in range(yv):  # Y data units, row-major within the MCU
                for bh in range(yh):
                    y0, x0 = (my * yv + bv) * 8, (mx * yh + bh) * 8
                    prev[0] = _encode_block(
                        bw, y[y0 : y0 + 8, x0 : x0 + 8], q, dc_table, ac_table, prev[0]
                    )
            for ci, plane in ((1, cb), (2, cr)):
                y0, x0 = my * 8, mx * 8
                prev[ci] = _encode_block(
                    bw, plane[y0 : y0 + 8, x0 : x0 + 8], q, dc_table, ac_table, prev[ci]
                )
    bw.flush()

    zz_q = bytes(int(q[i]) for i in range(64))
    samp_y = (yh << 4) | yv
    out = b"\xff\xd8"  # SOI
    out += _seg(0xFFDB, b"\x00" + zz_q)  # DQT id 0 (luma)
    out += _seg(0xFFDB, b"\x01" + zz_q)  # DQT id 1 (chroma)
    out += _seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xFFC4, b"\x00" + dc_dht)  # DC id 0 (luma)
    out += _seg(0xFFC4, b"\x10" + ac_dht)  # AC id 0 (luma)
    out += _seg(0xFFC4, b"\x01" + dc_dht)  # DC id 1 (chroma)
    out += _seg(0xFFC4, b"\x11" + ac_dht)  # AC id 1 (chroma)
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
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

    def align_restart(self) -> None:
        """Consume an RSTn marker at a restart-interval boundary: discard
        the pad bits of the current byte (the encoder byte-aligns before
        every marker, so nothing buffered is real data — _fill never reads
        past a marker), then step over the two marker bytes."""
        self.acc = 0
        self.nbits = 0
        self.ended = False
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise NotImplementedError(
                "JPEG restart marker missing at interval boundary"
            )


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
    component SOF0 stream decodes. Progressive (SOF2) and arithmetic
    coding raise NotImplementedError; 3-component streams go through
    ``decode_jpeg``.
    """
    px = decode_jpeg_gray_pixels(payload)
    return px.shape[1], px.shape[0], float(px.mean())


def decode_jpeg_gray_pixels(payload: bytes) -> np.ndarray:
    """Single-component pixel decode (h×w float array in [0, 255]) — the
    substrate of ``decode_jpeg_gray`` and the grayscale error-bound
    property tests."""
    px = decode_jpeg_pixels(payload)
    if px.ndim != 2:
        raise NotImplementedError(
            "3-component JPEG: use decode_jpeg / decode_jpeg_pixels"
        )
    return px


def decode_jpeg(payload: bytes) -> tuple[int, int, float]:
    """Decode a baseline JPEG (grayscale or YCbCr color):
    (width, height, mean over all channels)."""
    px = decode_jpeg_pixels(payload)
    h, w = px.shape[:2]
    return w, h, float(px.mean())


def _decode_block(br: _BitReader, dc_codes, ac_codes, q, prev_dc: int):
    """Entropy-decode + dequantize + IDCT one 8×8 data unit; returns
    (pixel block, new DC predictor)."""
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
    return _C.T @ coef.reshape(8, 8) @ _C + 128.0, prev_dc


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Full baseline decode: (h × w) grayscale or (h × w × 3) RGB floats
    in [0, 255].

    Segment walk (DQT / SOF0 / DHT / SOS) with stream-described tables;
    3-component scans run the interleaved MCU walk with per-component
    sampling factors up to 2×2 (4:4:4, 4:2:2, 4:2:0), chroma planes are
    nearest-neighbour upsampled to the luma grid, and JFIF BT.601
    YCbCr→RGB finishes. DRI/RSTn restart intervals are honoured
    (byte-align + DC reset per interval); SOF2 streams dispatch to the
    progressive decoder. Arithmetic coding, >2× sampling, and
    2/4-component scans raise NotImplementedError — the boundary where
    libjpeg plugs in."""
    if payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    quant: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    dims: tuple[int, int] | None = None
    scan: bytes | None = None
    comps: list[dict] | None = None
    scan_tabs: dict[int, tuple[int, int]] = {}
    dri = 0
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
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    "only 1- or 3-component baseline JPEG decodable"
                )
            comps = []
            for ci in range(ncomp):
                cid, samp, qt = body[6 + 3 * ci : 9 + 3 * ci]
                ch, cv = samp >> 4, samp & 0x0F
                if ch not in (1, 2) or cv not in (1, 2):
                    raise NotImplementedError(
                        "JPEG sampling factors beyond 2x2 unsupported"
                    )
                comps.append({"cid": cid, "h": ch, "v": cv, "qt": qt})
            if ncomp == 1:
                # single-component scans are non-interleaved per spec:
                # the data-unit grid ignores sampling factors
                comps[0]["h"] = comps[0]["v"] = 1
            dims = (w, h)
        elif marker == 0xC2:  # SOF2 → the progressive decoder owns it
            from ssidentity_spark.operators.jpeg_progressive import (
                decode_progressive_pixels,
            )

            return decode_progressive_pixels(payload)
        elif marker in (0xC1, 0xC3, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                "only baseline (SOF0) or progressive (SOF2) JPEG decodable"
            )
        elif marker == 0xDD:  # DRI: restart every `dri` MCUs
            dri = struct.unpack_from(">H", body, 0)[0]
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
            ns = body[0]
            for i in range(ns):
                scan_tabs[body[1 + 2 * i]] = (
                    body[2 + 2 * i] >> 4,
                    body[2 + 2 * i] & 0x0F,
                )
            scan = payload[pos + 2 + ln :]
            break
        pos += 2 + ln
    if dims is None or scan is None or comps is None:
        raise NotImplementedError("JPEG missing SOF0/SOS segments")
    w, h = dims
    if set(scan_tabs) != {c["cid"] for c in comps}:
        raise NotImplementedError("JPEG scan does not cover the SOF components")
    for c in comps:
        dc_id, ac_id = scan_tabs[c["cid"]]
        if (0, dc_id) not in huff or (1, ac_id) not in huff or c["qt"] not in quant:
            raise NotImplementedError("JPEG scan references missing tables")
        c["dc"] = huff[(0, dc_id)]
        c["ac"] = huff[(1, ac_id)]
        c["q"] = np.array(quant[c["qt"]], dtype=np.float64)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    n_mcux = (w + 8 * hmax - 1) // (8 * hmax)
    n_mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((n_mcuy * c["v"] * 8, n_mcux * c["h"] * 8)) for c in comps
    ]
    prev = [0] * len(comps)
    br = _BitReader(scan)
    mcu_i = 0
    for my in range(n_mcuy):
        for mx in range(n_mcux):
            if dri and mcu_i and mcu_i % dri == 0:
                # interval boundary: byte-align over the RSTn marker and
                # reset every DC predictor (the point of restart markers —
                # each interval decodes independently)
                br.align_restart()
                prev = [0] * len(comps)
            mcu_i += 1
            for ci, c in enumerate(comps):
                for bv in range(c["v"]):
                    for bh in range(c["h"]):
                        block, prev[ci] = _decode_block(
                            br, c["dc"], c["ac"], c["q"], prev[ci]
                        )
                        y0 = (my * c["v"] + bv) * 8
                        x0 = (mx * c["h"] + bh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample every component to the luma grid, crop to image dims
    full = []
    for ci, c in enumerate(comps):
        p = np.repeat(
            np.repeat(planes[ci], vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(full[0], 0, 255)
    return _ycbcr_to_rgb(full[0], full[1], full[2])
