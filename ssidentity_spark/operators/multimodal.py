"""Multimodal binary-column operators (BASELINE.json north star).

Real decode/resize/frame-sample requires codec libraries not present in this
container, so ``decode_image``/``decode_audio`` are stubs that raise
NotImplementedError; ``fake_decode`` is the deterministic stand-in used by
tests and the oracle-checked queries. The Spark-side plumbing — binary
schema, Arrow batching via mapInPandas, output StructType — is real and is
exactly what a production codec would plug into.

Scale: mapInPandas streams Arrow record batches per partition; payload bytes
never transit the driver, and batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch. Partition count follows the
input scan, so a 100 TB binary corpus processes with per-executor memory
bounded by (batch rows × max payload size).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
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


def decode_image(payload: bytes) -> Any:
    """Real image decode — requires a codec library absent from this
    container. Plug Pillow/libvips here in production."""
    raise NotImplementedError("image codec not available in this environment")


def decode_audio(payload: bytes) -> Any:
    """Real audio decode — requires a codec library absent from this
    container. Plug soundfile/ffmpeg here in production."""
    raise NotImplementedError("audio codec not available in this environment")


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


def resize_stub(df: DataFrame, max_px: int = 256) -> DataFrame:
    """Resize pipeline shape: binary in → binary out. The transform itself is
    the identity (no codec); schema/partitioning/batching are the real
    contract."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pdf  # a real implementation re-encodes each payload

    return df.mapInPandas(_resize, schema=df.schema)


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling shape: one row in → N frame rows out (flatMap
    via mapInPandas). Emits a single synthetic 'frame' per payload here."""
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_bytes", LongType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "frame_idx": pd.Series([0] * len(pdf), dtype="int32"),
                    "frame_bytes": pdf["payload"].map(lambda p: len(bytes(p))).astype(
                        "int64"
                    ),
                }
            )

    return df.mapInPandas(_sample, schema=out_schema)


__all__ = [
    "FEATURE_SCHEMA",
    "decode_image",
    "decode_audio",
    "fake_decode",
    "extract_features",
    "resize_stub",
    "frame_sample_stub",
]
