"""Streaming corpus intake — the training-data cleanup gate
(plans/pipeline.py:pipe_docs_clean) on an UNBOUNDED document stream.

A 100 TB-scale corpus doesn't arrive as one batch: crawlers drop files
continuously, and re-scanning history per increment is O(corpus) per day.
The streaming form keeps the same gates with state that does not grow with
history:

- quality/length gates are narrow filters — applied BEFORE dedup so
  rejected documents never enter dedup state;
- exact dedup becomes ``dropDuplicatesWithinWatermark`` on the content
  fingerprint — state ∝ (arrival rate × watermark), independent of corpus
  size. Cross-watermark duplicates are caught by the periodic batch sweep
  (``pipe_docs_clean``/``dedup_exact``) — the standard streaming+batch
  split: the stream bounds freshness, the batch bounds completeness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssidentity_spark.plans.pipeline import (
    _MAX_WORDS,
    _MIN_WORDS,
    _STOP_HI,
    _STOP_LO,
)
from ssidentity_spark.plans.text import _STOPWORDS

DOCS_STREAM_SCHEMA = "ts TIMESTAMP, doc_id LONG, text STRING"


def read_document_stream(spark: SparkSession, source_dir: str) -> DataFrame:
    """T1-style file-stream over a crawler drop directory of parquet."""
    return spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(source_dir)


def clean_documents_stream(
    docs: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Quality-gate then watermark-dedup an unbounded document stream.

    Same thresholds as the batch verdict (``pipe_docs_clean``); the
    keep-first-by-doc_id tiebreak of the batch form becomes keep-one-per-
    fingerprint (arrival order across micro-batches; undefined within
    one — dedup is an idempotency guarantee, not an ordering one)."""
    w = F.split(F.lower(F.col("text")), r"\s+")
    fp = F.md5(F.regexp_replace(F.trim(F.lower("text")), r"\s+", " "))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    stop_ratio = (
        F.size(F.filter(w, lambda x: F.array_contains(stop_arr, x))).cast("double")
        / F.size(w)
    )
    quality_ok = F.size(w).between(_MIN_WORDS, _MAX_WORDS) & stop_ratio.between(
        _STOP_LO, _STOP_HI
    )
    return (
        docs.filter(quality_ok)
        .withColumn("fp", fp)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .drop("fp")
    )
