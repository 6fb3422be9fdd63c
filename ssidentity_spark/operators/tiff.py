"""Dependency-free baseline TIFF decode (uncompressed strips) — the
scanned-document container next to BMP/PNG/JPEG/GIF in
operators/multimodal.py's ``decode_image`` dispatch.

Decoder: both byte orders (II little- / MM big-endian), classic 8-byte
header + IFD walk, the baseline tag set (dims, bits/sample,
samples/pixel, compression, photometric, strip offsets/byte-counts,
rows/strip), 8-bit gray and RGB(A) samples across multiple strips.
Compressed TIFF (LZW/PackBits/JPEG-in-TIFF), tiled layout, palette
color, and sub-8-bit samples raise NotImplementedError — the libtiff
boundary. Pixel stats follow the house convention: mean over colour
channels, alpha (extra samples) excluded.

Encoder twin: single-strip uncompressed writer in either byte order —
TIFF is lossless here, so decode∘encode is exact.
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _read_entry(payload: bytes, pos: int, e: str) -> tuple[int, list[int]]:
    """One 12-byte IFD entry → (tag, values) for integer types."""
    tag, typ, count = struct.unpack_from(f"{e}HHI", payload, pos)
    if typ not in _TYPE_SIZES:
        return tag, []
    size = _TYPE_SIZES[typ] * count
    if size <= 4:
        off = pos + 8
    else:
        off = struct.unpack_from(f"{e}I", payload, pos + 8)[0]
        if off + size > len(payload):
            raise NotImplementedError("TIFF value offset out of range")
    if typ == 1:
        vals = list(payload[off : off + count])
    elif typ == 3:
        vals = list(struct.unpack_from(f"{e}{count}H", payload, off))
    elif typ == 4:
        vals = list(struct.unpack_from(f"{e}{count}I", payload, off))
    else:
        vals = []
    return tag, vals


def decode_tiff(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean over colour channels) of the first IFD."""
    if len(payload) < 8 or payload[:2] not in (b"II", b"MM"):
        raise NotImplementedError("not a TIFF payload")
    e = "<" if payload[:2] == b"II" else ">"
    magic, ifd_off = struct.unpack_from(f"{e}HI", payload, 2)
    if magic != 42:
        raise NotImplementedError("not a classic TIFF (bad magic)")
    if ifd_off + 2 > len(payload):
        raise NotImplementedError("truncated TIFF IFD")
    n = struct.unpack_from(f"{e}H", payload, ifd_off)[0]
    tags: dict[int, list[int]] = {}
    for i in range(n):
        pos = ifd_off + 2 + 12 * i
        if pos + 12 > len(payload):
            raise NotImplementedError("truncated TIFF IFD")
        tag, vals = _read_entry(payload, pos, e)
        tags[tag] = vals

    def one(tag: int, default=None):
        v = tags.get(tag)
        if not v:
            if default is None:
                raise NotImplementedError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    width = one(256)
    height = one(257)
    compression = one(259, 1)
    if compression != 1:
        raise NotImplementedError(
            "only uncompressed TIFF decodable (codec libs absent)"
        )
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiled TIFF unsupported")
    photometric = one(262, 1)
    if photometric == 3:
        raise NotImplementedError("palette TIFF unsupported")
    spp = one(277, 1)
    bits = tags.get(258, [8])
    if any(b != 8 for b in bits):
        raise NotImplementedError("only 8-bit TIFF samples decodable")
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise NotImplementedError("TIFF missing strip offsets/byte counts")
    # colour channels: gray=1, RGB=3; further samples are extra (alpha)
    color = 3 if spp >= 3 else 1
    total = 0
    n_samples = 0
    for off, cnt in zip(offsets, counts):
        strip = payload[off : off + cnt]
        if len(strip) != cnt:
            raise NotImplementedError("truncated TIFF strip")
        usable = len(strip) // spp * spp
        for px in range(0, usable, spp):
            total += sum(strip[px : px + color])
            n_samples += color
    expect = width * height * color
    if n_samples != expect:
        raise NotImplementedError("TIFF strip data does not cover the image")
    if photometric == 0:  # WhiteIsZero: invert to the BlackIsZero scale
        total = n_samples * 255 - total
    return width, height, total / n_samples


def encode_tiff(pixels, big_endian: bool = False) -> bytes:
    """Encode gray (h×w) or RGB (h×w×3) 8-bit pixels as a single-strip
    uncompressed TIFF in either byte order — the decoder's exact inverse."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    color = arr.ndim == 3
    h, w = arr.shape[:2]
    spp = 3 if color else 1
    data = arr.tobytes()
    e = ">" if big_endian else "<"

    entries = [
        (256, 4, 1, w),  # ImageWidth
        (257, 4, 1, h),  # ImageLength
        (258, 3, spp, None),  # BitsPerSample (inline if spp<=2, else offset)
        (259, 3, 1, 1),  # Compression: none
        (262, 3, 1, 2 if color else 1),  # Photometric: RGB / BlackIsZero
        (273, 4, 1, None),  # StripOffsets (patched below)
        (277, 3, 1, spp),  # SamplesPerPixel
        (278, 4, 1, h),  # RowsPerStrip
        (279, 4, 1, len(data)),  # StripByteCounts
    ]
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    extra_off = ifd_off + ifd_size
    extra = b""
    bits_value_off = None
    if spp > 2:  # BitsPerSample needs an offset value (3 SHORTs)
        bits_value_off = extra_off
        extra = struct.pack(f"{e}{spp}H", *([8] * spp))
    data_off = extra_off + len(extra)

    out = bytearray()
    out += (b"MM" if big_endian else b"II") + struct.pack(f"{e}HI", 42, ifd_off)
    out += struct.pack(f"{e}H", len(entries))
    for tag, typ, count, val in entries:
        if tag == 258:
            if spp > 2:
                out += struct.pack(f"{e}HHII", tag, typ, count, bits_value_off)
            else:
                out += struct.pack(f"{e}HHIHH", tag, typ, count, 8, 0)
            continue
        if tag == 273:
            val = data_off
        if typ == 3:
            out += struct.pack(f"{e}HHIHH", tag, typ, count, val, 0)
        else:
            out += struct.pack(f"{e}HHII", tag, typ, count, val)
    out += struct.pack(f"{e}I", 0)  # next-IFD pointer: none
    out += extra
    out += data
    return bytes(out)
