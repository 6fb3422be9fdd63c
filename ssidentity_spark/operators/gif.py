"""Dependency-free GIF codec (87a/89a) — palette images + animations
under the LZW variable-code scheme, the remaining common still/animated
image container next to BMP/PNG/JPEG (operators/multimodal.py,
operators/jpeg*.py).

Decoder: header + logical screen descriptor, global/local color tables,
extension-block skipping (GCE/comment/application/plain-text), and per
frame the full GIF-LZW decode — LSB-first variable-width codes, CLEAR /
END handling, dictionary growth to 4096 with deferred-clear freeze.
Frame pixel statistics map indices through the active palette;
compositing/disposal between animation frames is out of scope (frame-
level stats only, documented), as are the obsolete sort/aspect fields.

Encoder twin: single- or multi-frame GIF with a global color table and
the matching LZW encoder (same growth rule, one code ahead of the
decoder's table). GIF is lossless, so decode∘encode is EXACT — the
property the tests pin, which also cross-checks both LZW sides
bit-for-bit.
"""

from __future__ import annotations

import struct

MAX_CODES = 4096  # 12-bit ceiling; table freezes here (deferred clear)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """GIF-LZW: LSB-first variable-width codes → index stream."""
    clear = 1 << min_code_size
    end = clear + 1
    init = [(i,) for i in range(clear)] + [(), ()]  # clear/end placeholders

    table = list(init)
    code_size = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitpos = 0
    total = len(data) * 8
    while bitpos + code_size <= total:
        code = 0
        for i in range(code_size):
            if (data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1:
                code |= 1 << i
        bitpos += code_size
        if code == clear:
            table = list(init)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise NotImplementedError("corrupt GIF LZW stream")
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + (prev[0],)  # the KwKwK case
            else:
                raise NotImplementedError("corrupt GIF LZW stream")
            if len(table) < MAX_CODES:
                table.append(prev + (entry[0],))
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        out.extend(entry)
        prev = entry
    return out


class _LSBWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc |= (value & ((1 << length) - 1)) << self.nbits
        self.nbits += length
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """GIF-LZW encoder — the decoder's exact inverse (its table runs one
    entry ahead, hence the ``next_code - 1`` growth rule)."""
    clear = 1 << min_code_size
    end = clear + 1
    bw = _LSBWriter()
    code_size = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    bw.write(clear, code_size)
    w: tuple[int, ...] = ()
    for k in indices:
        if k >= clear:
            raise ValueError("pixel index exceeds the color-table size")
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        bw.write(table[w], code_size)
        if next_code < MAX_CODES:
            table[wk] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        w = (k,)
    if w:
        bw.write(table[w], code_size)
    bw.write(end, code_size)
    return bw.flush()


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise NotImplementedError("truncated GIF sub-block stream")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out.extend(payload[pos : pos + n])
        if pos + n > len(payload):
            raise NotImplementedError("truncated GIF sub-block stream")
        pos += n


def decode_gif(payload: bytes) -> tuple[int, int, int, float]:
    """(canvas width, canvas height, n_frames, mean RGB over every
    frame's own pixels). Lossless palettes → the mean is exact."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")
    if len(payload) < 13:
        raise NotImplementedError("truncated GIF header")
    width, height = struct.unpack_from("<HH", payload, 6)
    flags = payload[10]
    pos = 13
    gct = b""
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos : pos + 3 * n]
        if len(gct) != 3 * n:
            raise NotImplementedError("truncated GIF global color table")
        pos += 3 * n
    n_frames = 0
    total = 0
    denom = 0
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks, all skippable
            pos += 1
            _, pos = _read_sub_blocks(payload, pos)
            continue
        if b != 0x2C:
            raise NotImplementedError(f"unknown GIF block 0x{b:02x}")
        if pos + 9 > len(payload):
            raise NotImplementedError("truncated GIF image descriptor")
        _left, _top, fw, fh = struct.unpack_from("<HHHH", payload, pos)
        iflags = payload[pos + 8]
        pos += 9
        table = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            table = payload[pos : pos + 3 * n]
            if len(table) != 3 * n:
                raise NotImplementedError("truncated GIF local color table")
            pos += 3 * n
        if not table:
            raise NotImplementedError("GIF frame without a color table")
        if pos >= len(payload):
            raise NotImplementedError("truncated GIF frame")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 8:
            raise NotImplementedError("invalid GIF LZW minimum code size")
        lzw, pos = _read_sub_blocks(payload, pos)
        idx = lzw_decode(min_code, lzw)
        if len(idx) < fw * fh:
            raise NotImplementedError("GIF frame pixel data underrun")
        # interlaced frames reorder ROWS only — irrelevant to pixel sums
        for i in idx[: fw * fh]:
            base = 3 * i
            if base + 3 > len(table):
                raise NotImplementedError("GIF pixel index outside color table")
            total += table[base] + table[base + 1] + table[base + 2]
        denom += fw * fh * 3
        n_frames += 1
    if n_frames == 0:
        raise NotImplementedError("GIF contains no image frames")
    return width, height, n_frames, total / denom


def encode_gif(
    frames: list[list[list[int]]], palette: list[tuple[int, int, int]]
) -> bytes:
    """Encode index frames (each h×w, indices into ``palette``) as a GIF
    with a global color table; multi-frame input becomes an animation."""
    if not frames or not palette:
        raise ValueError("need at least one frame and one palette entry")
    h = len(frames[0])
    w = len(frames[0][0])
    size_exp = max(1, (len(palette) - 1).bit_length())
    n_table = 1 << size_exp
    gct = bytearray()
    for r, g, b in palette:
        gct.extend((r, g, b))
    gct.extend(b"\x00" * (3 * n_table - len(gct)))
    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HH", w, h))
    out.append(0x80 | (size_exp - 1))  # GCT present, size 2^size_exp
    out.extend((0, 0))  # background index, aspect
    out.extend(gct)
    min_code = max(2, size_exp)
    for frame in frames:
        out.append(0x2C)
        out.extend(struct.pack("<HHHH", 0, 0, w, h))
        out.append(0)  # no LCT, not interlaced
        out.append(min_code)
        idx = [i for row in frame for i in row]
        out.extend(_sub_blocks(lzw_encode(min_code, idx)))
    out.append(0x3B)
    return bytes(out)
