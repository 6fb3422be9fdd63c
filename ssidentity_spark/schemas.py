"""Canonical engine schemas (SURVEY §1.4) — one source of truth, shared by
batch and streaming so every downstream operator works on both.

Mirrors the reference's data model:
- ``obs`` table DDL at /root/reference/schema:1-9 (TIMESTAMP/MAC/SSID/RSSI/
  FREQ/DIST) → ``OBSERVATIONS_SCHEMA`` (typed, plus sensor_id for the
  multi-sensor fleet implied by README.md:13).
- the raw frame buffer (ssidentity.h:16, ssidentity.c:73-84) →
  ``RAW_FRAMES_SCHEMA`` with the frame as a BinaryType column.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OBSERVATIONS_SCHEMA = StructType(
    [
        StructField("ts", TimestampType(), False),
        StructField("ts_str", StringType(), True),  # 'MM/dd/yy - hh:mma' compat
        StructField("sensor_id", StringType(), True),
        StructField("mac", StringType(), False),  # 12 uppercase hex chars
        StructField("ssid", StringType(), True),  # sanitized (\xNN escapes)
        StructField("rssi", IntegerType(), True),  # dBm
        StructField("freq", IntegerType(), True),  # MHz
        StructField("dist", DoubleType(), True),  # meters, FSPL, round(2)
    ]
)

# What parse_observations actually emits: the core observation row PLUS
# the P12 non-printable-SSID alarm flag (ssidentity.c:193). A store
# written from parse output carries 9 columns; readers declaring the
# 8-column OBSERVATIONS_SCHEMA silently project the flag away — declare
# THIS schema when the alarm must survive the read (r7 review).
PARSED_OBSERVATIONS_SCHEMA = StructType(
    list(OBSERVATIONS_SCHEMA.fields)
    + [StructField("ssid_was_escaped", BooleanType(), True)]
)

RAW_FRAMES_SCHEMA = StructType(
    [
        StructField("frame", BinaryType(), False),
        StructField("sensor_id", StringType(), True),
        StructField("recv_ts", TimestampType(), True),
        StructField("frame_len", IntegerType(), True),
    ]
)

SENSORS_SCHEMA = StructType(
    [
        StructField("sensor_id", StringType(), False),
        StructField("lat", DoubleType(), False),
        StructField("lon", DoubleType(), False),
    ]
)

SSID_GEO_SCHEMA = StructType(
    [
        StructField("ssid", StringType(), False),
        StructField("lat", DoubleType(), False),
        StructField("lon", DoubleType(), False),
    ]
)

WATCHLIST_SCHEMA = StructType(
    [
        StructField("mac", StringType(), False),
        StructField("label", StringType(), True),
    ]
)

ALERTS_SCHEMA = StructType(
    [
        StructField("mac", StringType(), False),
        StructField("alert_type", StringType(), False),  # arrival | departure
        StructField("ts", TimestampType(), False),
        StructField("sensor_id", StringType(), True),
    ]
)

POSITIONS_SCHEMA = StructType(
    [
        StructField("mac", StringType(), False),
        StructField("window_start", TimestampType(), False),
        StructField("lat", DoubleType(), True),
        StructField("lon", DoubleType(), True),
        StructField("n_sensors", IntegerType(), True),
        StructField("rmse_m", DoubleType(), True),
    ]
)