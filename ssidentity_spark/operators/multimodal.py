"""Multimodal binary-column operators (BASELINE.json north star).

``decode_image`` and ``decode_audio`` are REAL dependency-free decoders for
the two classic header-described formats — uncompressed 24/32-bit BMP and
PCM WAV — parsed straight from the byte layout (no codec library). Formats
that genuinely need a codec (JPEG/PNG/MP3/…) still raise
NotImplementedError; plug Pillow/libvips/ffmpeg into the same functions in
production. ``fake_decode`` remains the deterministic stand-in the
DuckDB-oracled queries use (an oracle can't decode BMP), and
``extract_image_features`` runs the real BMP decoder through the identical
Arrow/mapInPandas plumbing (pytest decodes generated fixture images to
known width/height/mean-pixel).

Scale: mapInPandas streams Arrow record batches per partition; payload bytes
never transit the driver, and batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch. Partition count follows the
input scan, so a 100 TB binary corpus processes with per-executor memory
bounded by (batch rows × max payload size).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("checksum_mod", LongType()),
    ]
)


def decode_image(payload: bytes) -> tuple[int, int, float]:
    """Decode an uncompressed 24/32-bit BMP: (width, height, mean_channel).

    Pure byte-layout parsing (BITMAPFILEHEADER + BITMAPINFOHEADER), no codec
    library: pixel rows are ``width*bytes_pp`` BGR(A) runs padded to 4-byte
    stride; the mean is over colour channels only (alpha excluded for
    32-bit). Compressed BMP or any other format raises NotImplementedError —
    that's where Pillow/libvips plugs in outside this container.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError("not an uncompressed BMP (codec libs absent)")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variant not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        raise NotImplementedError("only uncompressed 24/32-bit BMP decodable")
    n_rows = abs(height)  # height < 0 → top-down row order; mean is order-free
    bytes_pp = bpp // 8
    stride = (width * bytes_pp + 3) & ~3
    total = 0
    for r in range(n_rows):
        row = payload[pixel_off + r * stride : pixel_off + r * stride + width * bytes_pp]
        if len(row) != width * bytes_pp:
            raise NotImplementedError("truncated BMP pixel array")
        total += sum(row)
        if bytes_pp == 4:
            total -= sum(row[3::4])  # exclude the alpha channel
    mean = total / (width * n_rows * 3)
    return width, n_rows, mean


def decode_audio(payload: bytes) -> tuple[int, int, int, int]:
    """Decode a PCM WAV header: (channels, sample_rate, bits, n_samples).

    RIFF chunk walk (fmt + data), integer PCM only; compressed audio raises
    NotImplementedError — that's where soundfile/ffmpeg plugs in outside
    this container.
    """
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload (codec libs absent)")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt " and pos + 8 + 16 <= len(payload):
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif cid == b"data":
            if pos + 8 + size > len(payload):
                raise NotImplementedError("truncated WAV data chunk")
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise NotImplementedError("WAV missing fmt/data chunks")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1 or block_align == 0:
        raise NotImplementedError("only integer PCM WAV decodable")
    return channels, sample_rate, bits, data_size // block_align


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic decode stand-in: 'dimensions' from the first two bytes.

    Keeps the full Arrow/mapInPandas path testable without codecs.
    """
    w = payload[0] if len(payload) > 0 else 0
    h = payload[1] if len(payload) > 1 else 0
    return int(w), int(h)


def extract_features(df: DataFrame) -> DataFrame:
    """(doc_id, payload binary) → typed feature rows via mapInPandas.

    Arrow-batched: each pandas batch holds a bounded slice of payloads; the
    loop below is where a real decoder (decode_image) would run.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, sizes, checks = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload)
                w, h = fake_decode(b)
                widths.append(w)
                heights.append(h)
                sizes.append(len(b))
                checks.append(len(b) % 251)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fake_width": pd.Series(widths, dtype="int32"),
                    "fake_height": pd.Series(heights, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "checksum_mod": pd.Series(checks, dtype="int64"),
                }
            )

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_px", DoubleType()),
    ]
)


def extract_image_features(df: DataFrame) -> DataFrame:
    """(doc_id, payload binary) → real decoded features via mapInPandas —
    the same Arrow plumbing as ``extract_features`` but running the REAL
    ``decode_image`` BMP decoder (pytest feeds generated fixture bitmaps
    and pins width/height/mean-pixel)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, ms = [], [], []
            for payload in pdf["payload"]:
                w, h, m = decode_image(bytes(payload))
                ws.append(w)
                hs.append(h)
                ms.append(m)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_px": pd.Series(ms, dtype="float64"),
                }
            )

    return df.mapInPandas(_extract, schema=IMAGE_FEATURE_SCHEMA)


def resize_stub(df: DataFrame, max_px: int = 256) -> DataFrame:
    """Resize pipeline shape: binary in → binary out. The transform itself is
    the identity (no codec); schema/partitioning/batching are the real
    contract."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf  # a real implementation re-encodes each payload

    return df.mapInPandas(_resize, schema=df.schema)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_pfx_hex", StringType()),
        StructField("n_frames", IntegerType()),
    ]
)


def sample_frames(
    df: DataFrame, frame_bytes: int = 32, stride: int = 4, pfx_bytes: int = 8
) -> DataFrame:
    """Video frame-sampling shape: one payload row in → N sampled-frame rows
    out (a flatMap, expressed through mapInPandas so the fan-out happens
    inside the Arrow batch, never on the driver).

    The payload is treated as a sequence of fixed-size ``frame_bytes``
    frames; every ``stride``-th frame is emitted with a hex prefix of its
    leading bytes (what a real pipeline would replace with a decoded
    thumbnail / phash). Trailing partial frames are dropped — the same
    convention a fixed-GOP video sampler uses. Output is scalar-typed so
    the fan-out is oracle-checkable byte-for-byte (``mm_frame_sample``)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            pfxs: list[str] = []
            totals: list[int] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = len(b) // frame_bytes
                for i in range(0, n_frames, stride):
                    start = i * frame_bytes
                    ids.append(int(doc_id))
                    idxs.append(i)
                    pfxs.append(b[start : start + pfx_bytes].hex().upper())
                    totals.append(n_frames)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_pfx_hex": pd.Series(pfxs, dtype="object"),
                    "n_frames": pd.Series(totals, dtype="int32"),
                }
            )

    return df.mapInPandas(_sample, schema=FRAME_SCHEMA)


__all__ = [
    "FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "IMAGE_FEATURE_SCHEMA",
    "decode_image",
    "decode_audio",
    "fake_decode",
    "extract_features",
    "extract_image_features",
    "resize_stub",
    "sample_frames",
]
