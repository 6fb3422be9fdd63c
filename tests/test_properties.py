"""Property-style tests (SURVEY §5): parse(build_frame(obs)) == obs over
randomized inputs, sanitize idempotence, partition pruning on the store,
and the sliding-window streaming path."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from ssidentity_spark.fixtures import build_frame, fspl
from ssidentity_spark.parse import parse_observations
from ssidentity_spark.schemas import RAW_FRAMES_SCHEMA


def _sanitize_py(ssid: bytes) -> str:
    """Python reference of the sanitize contract (escape every
    non-printable as \\xNN uppercase; keep printables)."""
    out = []
    for b in ssid:
        if 0x20 <= b <= 0x7E:
            out.append(chr(b))
        else:
            out.append(f"\\x{b:02X}")
    return "".join(out)


@pytest.fixture(scope="module")
def random_cases():
    rng = np.random.default_rng(1234)
    cases = []
    for i in range(300):
        mac = bytes(rng.integers(0, 256, size=6, dtype=np.uint8))
        n = int(rng.integers(1, 33))
        ssid = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        rssi = int(rng.integers(-120, 0))
        freq = int(rng.integers(2400, 6000))
        frame = build_frame(mac=mac, ssid=ssid, rssi=rssi, freq=freq, rng=rng)
        cases.append(
            {
                "label": f"c{i}",
                "frame": frame,
                "mac": mac.hex().upper(),
                "ssid": _sanitize_py(ssid),
                "rssi": rssi,
                "freq": freq,
                "dist": fspl(rssi, freq),
            }
        )
    return cases


def test_parse_roundtrip_property(spark, random_cases):
    """Every randomly generated accepted frame parses back to exactly the
    fields it was built from — mac hex render, sanitize, rssi/freq decode,
    FSPL derivation."""
    pdf = pd.DataFrame(
        [
            (c["frame"], c["label"], dt.datetime(2016, 7, 21, 12, 0, 0), len(c["frame"]))
            for c in random_cases
        ],
        columns=["frame", "sensor_id", "recv_ts", "frame_len"],
    )
    parsed = {
        r.sensor_id: r
        for r in parse_observations(
            spark.createDataFrame(pdf, schema=RAW_FRAMES_SCHEMA)
        ).collect()
    }
    assert len(parsed) == len(random_cases)
    for c in random_cases:
        row = parsed[c["label"]]
        assert row.mac == c["mac"], c["label"]
        assert row.ssid == c["ssid"], (c["label"], row.ssid, c["ssid"])
        assert row.rssi == c["rssi"]
        assert row.freq == c["freq"]
        assert row.dist == pytest.approx(c["dist"], abs=0.011)


def test_sanitize_idempotent_on_printable(spark):
    """Sanitizing an already-printable SSID is the identity."""
    from ssidentity_spark.parse import sanitize_ssid

    ssids = ["hello", "NET 42", "~!@#$%^&*()_+", "A" * 32]
    df = spark.createDataFrame([(s,) for s in ssids], "s STRING").select(
        "s", sanitize_ssid(F.encode("s", "UTF-8")).alias("z")
    )
    for r in df.collect():
        assert r.z == r.s


def test_store_partition_pruning(spark, observations, tmp_path):
    """A date predicate on the partitioned store must prune partitions at
    the scan (SCALE.md ingest invariant)."""
    from ssidentity_spark.io import write_observations

    path = str(tmp_path / "obs_store")
    write_observations(observations, path)
    df = spark.read.parquet(path).filter(F.col("obs_date") == "2016-07-21")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "obs_date" in plan
    # and the filter actually prunes: fewer files than the full scan
    full = spark.read.parquet(path)
    assert df.count() < full.count()


def test_sliding_window_stream(spark, tmp_path):
    """T4: sliding windows emit one row per covering window."""
    from ssidentity_spark.schemas import OBSERVATIONS_SCHEMA
    from ssidentity_spark.streaming.ingest import (
        devices_per_window,
        read_observation_stream,
    )

    base = dt.datetime(2016, 7, 21, 10, 0, 0)
    rows = []
    for minute, mac in [(5, "AAA"), (65, "BBB"), (180, "ZZZ")]:
        ts = base + dt.timedelta(minutes=minute)
        rows.append(
            (ts, ts.strftime("%m/%d/%y - %I:%M%p"), "s1", mac, "NET", -70, 2437, 35.4)
        )
    pdf = pd.DataFrame(
        rows,
        columns=["ts", "ts_str", "sensor_id", "mac", "ssid", "rssi", "freq", "dist"],
    )
    src = str(tmp_path / "src")
    spark.createDataFrame(pdf, OBSERVATIONS_SCHEMA).write.parquet(src)
    stream = devices_per_window(
        read_observation_stream(spark, src),
        window="1 hour",
        slide="30 minutes",
        watermark="5 minutes",
    )
    out = str(tmp_path / "out")
    (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = spark.read.parquet(out).collect()
    # the 10:05 event is covered by the 09:30 and 10:00 sliding windows
    starts = sorted(r.window_start.strftime("%H:%M") for r in got)
    assert "09:30" in starts and "10:00" in starts


def test_scalable_row_number_property(spark):
    """Property: the two-pass bucketed rank equals a global-window
    row_number for adversarial value distributions — heavy duplicates,
    extreme skew (90% one value), negatives, and tiny/large bucket counts."""
    from pyspark.sql import Window

    from ssidentity_spark.operators.analytics import scalable_global_row_number

    rng = np.random.default_rng(99)
    dists = [
        rng.normal(0, 1, 500),  # smooth
        np.repeat(rng.normal(0, 1, 5), 100),  # 5 distinct values x 100
        np.concatenate([np.zeros(450), rng.uniform(1e6, 2e6, 50)]),  # skew
        rng.integers(-5, 5, 500).astype(float),  # integer-valued, negative
    ]
    for di, xs in enumerate(dists):
        rows = [(int(i), float(x)) for i, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "k BIGINT, x DOUBLE")
        for n_buckets in (2, 16, 256):
            got = {
                r.k: r.rn
                for r in scalable_global_row_number(
                    df, ["x", "k"], n_buckets=n_buckets
                ).collect()
            }
            w = Window.orderBy("x", "k")
            want = {
                r.k: r.rn
                for r in df.select("k", F.row_number().over(w).alias("rn")).collect()
            }
            assert got == want, f"dist={di} buckets={n_buckets}"
