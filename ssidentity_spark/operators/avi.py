"""AVI (RIFF) video container codec — dependency-free, clean-room from the
public format layout (RIFF chunk grammar + MainAVIHeader / AVIStreamHeader
/ BITMAPINFOHEADER as documented in the Microsoft AVI file-format spec).

Completes the modality set next to WAV (RIFF audio), PNG/GIF/BMP/TIFF/JPEG
(images) and FLAC: a REAL video container whose frame walk feeds the
engine's frame-sampling surface (``mm_frame_sample`` previously proved the
1→N Arrow fan-out over synthetic byte chunks; ``mm_avi_frames`` runs the
same shape over an actual container). Reference impetus: the capture
pipeline treats payloads as opaque bytes it must parse bit-exactly
(ssidentity.c:83-117); a video blob column at 100 TB is the same problem.

Two codecs:

- ``'DIB '`` — uncompressed bottom-up BGR frames (the '00db' chunk type).
  Lossless, so a SQL oracle can recompute sampled-frame pixel sums
  straight from the source bytes → the full container write→walk→decode
  loop sits under the driver hash gate.
- ``'MJPG'`` — each frame is a baseline JPEG ('00dc' chunks) decoded by
  the existing from-scratch decoder (operators/jpeg.py). Lossy, so this
  variant is pinned by pytest round-trip properties instead of the gate.

Like every decoder here, all work happens inside Arrow batches
(mapInPandas); payloads never transit the driver.
"""

from __future__ import annotations

import struct

_AVIH_FMT = "<10I"  # 40 bytes: usec/frame, maxbps, pad, flags, frames, init, streams, bufsize, w, h
_STRH_FMT = "<4s4sIHHIIIIIIIi4H"


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def _dib_encode(gray_rows: bytes, width: int, height: int) -> bytes:
    """Top-down grayscale rows → bottom-up 24-bit BGR rows padded to 4."""
    stride = (width * 3 + 3) & ~3
    out = bytearray()
    for y in range(height - 1, -1, -1):
        row = bytearray()
        for x in range(width):
            g = gray_rows[y * width + x]
            row += bytes((g, g, g))
        row += b"\x00" * (stride - len(row))
        out += row
    return bytes(out)


def _dib_decode(data: bytes, width: int, height: int) -> bytes:
    stride = (width * 3 + 3) & ~3
    if len(data) < stride * height:
        raise ValueError("truncated DIB frame")
    out = bytearray(width * height)
    for y in range(height):
        src = (height - 1 - y) * stride
        for x in range(width):
            out[y * width + x] = data[src + x * 3]  # blue channel == gray
    return bytes(out)


def build_avi(
    frames: list[bytes], width: int, height: int, fps: int = 25, codec: str = "DIB "
) -> bytes:
    """Frames (top-down grayscale bytes for DIB, or pre-encoded JPEG
    payloads for MJPG) → a complete AVI: hdrl (avih + strl), movi, idx1."""
    if codec == "DIB ":
        payloads = [_dib_encode(f, width, height) for f in frames]
        ckid = b"00db"
        compression = 0  # BI_RGB
        bitcount = 24
    elif codec == "MJPG":
        payloads = list(frames)
        ckid = b"00dc"
        compression = struct.unpack("<I", b"MJPG")[0]
        bitcount = 24
    else:
        raise ValueError(f"unsupported codec {codec!r}")

    bufsize = max((len(p) for p in payloads), default=0)
    avih = struct.pack(
        _AVIH_FMT,
        1_000_000 // fps, bufsize * fps, 0, 0x10,  # AVIF_HASINDEX
        len(payloads), 0, 1, bufsize, width, height,
    ) + b"\x00" * 16  # dwReserved[4]
    strh = struct.pack(
        _STRH_FMT,
        b"vids", codec.encode("ascii"), 0, 0, 0, 0,
        1, fps, 0, len(payloads), bufsize, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, bitcount, compression,
        len(payloads[0]) if payloads else 0, 0, 0, 0, 0,
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))

    movi_payload = b""
    idx_entries = []
    for p in payloads:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((ckid, 0x10, 4 + len(movi_payload), len(p)))
        movi_payload += _chunk(ckid, p)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            cc + struct.pack("<III", fl, off, sz) for cc, fl, off, sz in idx_entries
        ),
    )
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def parse_avi(payload: bytes) -> tuple[int, int, int, str, list[bytes]]:
    """→ (width, height, fps, codec, decoded grayscale frames).

    Walks the RIFF tree strictly: unknown top-level chunks are skipped
    (per the spec readers must tolerate them), but avih/strh/strf and the
    movi frame chunks are validated. DIB frames decode to grayscale rows;
    MJPG frames decode through operators.jpeg.decode_jpeg_pixels.
    """
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    if 8 + riff_size > len(payload):
        raise ValueError("truncated AVI container")

    width = height = fps = None
    codec = None
    frames_raw: list[bytes] = []

    def walk(data: bytes) -> None:
        nonlocal width, height, fps, codec
        pos = 0
        while pos + 8 <= len(data):
            cc = data[pos : pos + 4]
            sz = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            body = data[pos + 8 : pos + 8 + sz]
            if len(body) < sz:
                raise ValueError("truncated AVI chunk")
            if cc == b"LIST":
                walk(body[4:])
            elif cc == b"avih":
                if sz < 40:
                    raise ValueError("short avih header")
                vals = struct.unpack(_AVIH_FMT, body[:40])
                fps = 1_000_000 // vals[0] if vals[0] else 0
                width, height = vals[8], vals[9]
            elif cc == b"strh":
                if body[0:4] == b"vids":
                    codec = body[4:8].decode("ascii")
            elif cc in (b"00db", b"00dc"):
                frames_raw.append(body)
            pos += 8 + sz + (sz & 1)

    walk(payload[12 : 8 + riff_size])
    if width is None or codec is None:
        raise ValueError("AVI missing avih/strh headers")

    frames: list[bytes] = []
    for raw in frames_raw:
        if codec == "DIB ":
            frames.append(_dib_decode(raw, width, height))
        elif codec == "MJPG":
            import numpy as np

            from ssidentity_spark.operators.jpeg import decode_jpeg_pixels

            px = decode_jpeg_pixels(raw)
            if px.ndim == 3:  # RGB frame → luma-less gray (channel mean)
                px = px.mean(axis=2)
            h, w = px.shape
            if (w, h) != (width, height):
                raise ValueError("MJPG frame dims disagree with avih")
            frames.append(
                bytes(np.clip(np.rint(px), 0, 255).astype(np.uint8).ravel())
            )
        else:
            raise ValueError(f"unsupported AVI codec {codec!r}")
    return width, height, fps, codec, frames


def sample_frames(payload: bytes, every_n: int = 2) -> tuple[int, int, int, int, int, int]:
    """Decode + fixed-stride frame sample (the GOP-keyframe convention):
    → (width, height, n_frames, n_sampled, sum_px, n_px) over frames
    0, every_n, 2·every_n, …"""
    width, height, _fps, _codec, frames = parse_avi(payload)
    sampled = frames[::every_n]
    sum_px = sum(sum(f) for f in sampled)
    return (
        width,
        height,
        len(frames),
        len(sampled),
        sum_px,
        len(sampled) * width * height,
    )
