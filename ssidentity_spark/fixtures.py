"""Deterministic fixture generators (FIXTURES.md; seed=42) for the
reference-shaped tables: observations, raw_frames (binary parser input with
accept/reject labels), sensors, ssid_geo, watchlist, and trilateration
ground truth.

The four golden rows from /root/reference/observations.db appear verbatim in
``observations`` (they pin FSPL, MAC format, timestamp format; rows 3-4 are
intentionally duplicated to exercise dedup A4/T6).
"""

from __future__ import annotations

import datetime as dt
import math
import os
import uuid
import zlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession

from ssidentity_spark.parse import (
    DEST_ADDR_OFFSET,
    FRAME_CTL_OFFSET,
    FREQ_OFFSET,
    IP_PROTO_OFFSET,
    MAC_ADDR_OFFSET,
    RSSI_OFFSET,
    SSID_CHR_OFFSET,
    SSID_LEN_OFFSET,
)
from ssidentity_spark.schemas import (
    OBSERVATIONS_SCHEMA,
    RAW_FRAMES_SCHEMA,
    SENSORS_SCHEMA,
    SSID_GEO_SCHEMA,
    WATCHLIST_SCHEMA,
)

SEED = 42
FREQS = (2412, 2437, 2462, 2464, 5180, 5745)
SENSOR_IDS = ("s1", "s2", "s3", "s4", "s5")

# the reference's golden rows (observations.db) — ts 2016-07-21 11:41 local
GOLDEN_ROWS = (
    ("07/21/16 - 11:41AM", "28B2BDD02FC8", "OPTUSVD3DA15E0_EXT", -90, 2464, 306.1),
    ("07/21/16 - 11:41AM", "D42C0F2F56BB", "FOSTER WIFI", -88, 2464, 243.14),
    ("07/21/16 - 11:41AM", "D42C0F2F56BB", "FOSTER WIFI", -84, 2464, 153.41),
    ("07/21/16 - 11:41AM", "D42C0F2F56BB", "FOSTER WIFI", -84, 2464, 153.41),
)


def fspl(rssi: int, freq: int) -> float:
    return round(10 ** ((27.55 - rssi - 20 * math.log10(freq)) / 20), 2)


def _stable_hash(s: str) -> int:
    """Process-independent string hash (zlib.crc32 is seedless and stable)."""
    return zlib.crc32(s.encode("utf-8"))


# ---------------------------------------------------------------------------
# fixture snapshots — one parquet file BOTH correctness-gate engines read
# (VERDICT r4 ask #3): Spark runs the plan over the snapshot, the DuckDB
# oracle read_parquet()s the same path, so ref_* queries get real hash
# oracles instead of rows-only checks. Timestamps are written at µs
# precision (second-resolution data, lossless) as naive/NTZ values, exactly
# like the driver testdata.
# ---------------------------------------------------------------------------

SNAPSHOT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".fixture_snapshots",
)


# snapshots already written by THIS process: fixture content is a pure
# function of the name (seeded generators), so regenerating + rewriting
# identical bytes on every query registration is pure waste — and a
# non-atomic rewrite races any concurrently-running oracle reading it
_SNAPSHOTS_WRITTEN: set[str] = set()


def snapshot_fixture(name: str, pdf, memo: bool = True) -> str:
    """Write a fixture to ``.fixture_snapshots/<name>.parquet``, return path.

    ``pdf`` is a pandas DataFrame or a zero-arg callable producing one;
    pass a callable for expensive inputs (generation loops, Spark
    ``toPandas``) so the memoized fast path skips the work entirely.
    The memo assumes content is a PURE FUNCTION OF ``name`` (seeded
    generators) — pass ``memo=False`` for content that depends on
    anything else (e.g. trained-model snapshots derived from a specific
    sf_dir), or a second sf_dir in the same process would silently keep
    the first one's snapshot. The write is atomic (process-unique tmp +
    rename), so neither a concurrent reader nor a concurrent writer in
    another process sees or clobbers a half-written snapshot."""
    os.makedirs(SNAPSHOT_DIR, exist_ok=True)
    path = os.path.join(SNAPSHOT_DIR, f"{name}.parquet")
    if memo and name in _SNAPSHOTS_WRITTEN and os.path.exists(path):
        return path
    if callable(pdf):
        pdf = pdf()
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    schema = pa.schema(
        [
            pa.field(f.name, pa.timestamp("us"))
            if pa.types.is_timestamp(f.type)
            else f
            for f in table.schema
        ]
    )
    tmp = f"{path}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
    pq.write_table(table.cast(schema), tmp)
    os.replace(tmp, path)
    _SNAPSHOTS_WRITTEN.add(name)
    return path


def observations_pdf(n_rows: int = 10_000) -> pd.DataFrame:
    """Bursty per-mac observation log over a 7-day window + golden rows."""
    rng = np.random.default_rng(SEED)
    base = dt.datetime(2016, 7, 18, 0, 0, 0)
    macs = [f"{rng.integers(0, 2**48):012X}" for _ in range(50)]
    ssids = [f"NET_{i:02d}" for i in range(28)] + ["caf\\x01e", "tab\\x09stop"]
    zipf = rng.zipf(1.5, size=n_rows * 3) % len(ssids)
    rows = []
    for i in range(n_rows - len(GOLDEN_ROWS)):
        mac = macs[int(rng.integers(0, len(macs)))]
        # 2-5 active-hour blocks per device, keyed off a STABLE mac hash
        # (builtin hash() is salted per process — PYTHONHASHSEED — which
        # silently made this fixture process-local; found in r5 when the
        # snapshot-backed ref_* oracles exposed run-to-run count drift)
        blocks = 2 + (_stable_hash(mac) % 4)
        block = int(rng.integers(0, blocks))
        hour = (_stable_hash(f"{mac}:{block}") % 24 + int(rng.integers(0, 3))) % 24
        day = int(rng.integers(0, 7))
        ts = base + dt.timedelta(
            days=day, hours=hour, minutes=int(rng.integers(0, 60)),
            seconds=int(rng.integers(0, 60)),
        )
        ssid = ssids[int(zipf[i])]
        rssi = int(rng.integers(-95, -29))
        freq = int(FREQS[int(rng.integers(0, len(FREQS)))])
        rows.append(
            (
                ts,
                ts.strftime("%m/%d/%y - %I:%M%p"),
                SENSOR_IDS[int(rng.integers(0, 5))],
                mac,
                ssid,
                rssi,
                freq,
                fspl(rssi, freq),
            )
        )
    # distinct capture seconds within the 11:41 minute (ts_str pins to the
    # minute); rows 3-4 stay fully identical — the genuine duplicate pair
    golden_secs = (1, 5, 30, 30)
    for sec, (ts_str, mac, ssid, rssi, freq, dist) in zip(golden_secs, GOLDEN_ROWS):
        golden_ts = dt.datetime(2016, 7, 21, 11, 41, sec)
        rows.append((golden_ts, ts_str, "s1", mac, ssid, rssi, freq, dist))
    return pd.DataFrame(
        rows,
        columns=["ts", "ts_str", "sensor_id", "mac", "ssid", "rssi", "freq", "dist"],
    )


def observations_df(spark: SparkSession, n_rows: int = 10_000) -> DataFrame:
    return spark.createDataFrame(observations_pdf(n_rows), schema=OBSERVATIONS_SCHEMA)


# ---------------------------------------------------------------------------
# raw_frames — binary parser input (FIXTURES.md §2)
# ---------------------------------------------------------------------------


@dataclass
class FrameCase:
    frame: bytes
    expect_accept: bool
    label: str
    expected: dict | None = None  # mac/ssid/rssi/freq when accepted


def build_frame(
    mac: bytes = b"\x28\xb2\xbd\xd0\x2f\xc8",
    ssid: bytes = b"OPTUSVD3DA15E0_EXT",
    rssi: int = -90,
    freq: int = 2464,
    *,
    subtype: int = 0x4,
    dest: bytes = b"\xff" * 6,
    ip_proto: int = 0x2A,
    ssid_len: int | None = None,
    size: int = 96,
    rng: np.random.Generator | None = None,
) -> bytes:
    """Lay out a frame per /root/reference/ssidentity.h:36-42."""
    rng = rng or np.random.default_rng(SEED)
    buf = bytearray(rng.integers(0, 256, size=size, dtype=np.uint8).tobytes())
    buf[FREQ_OFFSET] = (freq >> 8) & 0xFF
    buf[FREQ_OFFSET + 1] = freq & 0xFF
    buf[RSSI_OFFSET] = (rssi + 0xFF) & 0xFF
    buf[IP_PROTO_OFFSET] = ip_proto
    buf[FRAME_CTL_OFFSET] = (subtype << 4) & 0xF0
    buf[MAC_ADDR_OFFSET : MAC_ADDR_OFFSET + 6] = mac
    buf[DEST_ADDR_OFFSET : DEST_ADDR_OFFSET + 6] = dest
    n = len(ssid) if ssid_len is None else ssid_len
    buf[SSID_LEN_OFFSET] = n & 0xFF
    buf[SSID_CHR_OFFSET : SSID_CHR_OFFSET + len(ssid)] = ssid
    if len(buf) != size:
        # bytearray slice assignment EXTENDS when the right side is longer
        # than the slice — a "truncated" negative case built via size=
        # would silently come back full-length and invert its own intent
        raise ValueError(
            f"build_frame: size={size} cannot hold the {len(ssid)}-byte "
            f"ssid at offset {SSID_CHR_OFFSET} (frame grew to {len(buf)}) "
            "— truncate the returned frame instead of shrinking size"
        )
    return bytes(buf)


def frame_cases() -> list[FrameCase]:
    rng = np.random.default_rng(SEED)
    mk = lambda **kw: build_frame(rng=rng, **kw)  # noqa: E731
    cases = [
        FrameCase(
            mk(),
            True,
            "golden_probe",
            {
                "mac": "28B2BDD02FC8",
                "ssid": "OPTUSVD3DA15E0_EXT",
                "rssi": -90,
                "freq": 2464,
                "dist": 306.1,
            },
        ),
        FrameCase(
            mk(mac=b"\xd4\x2c\x0f\x2f\x56\xbb", ssid=b"FOSTER WIFI", rssi=-88),
            True,
            "golden_probe_2",
            {
                "mac": "D42C0F2F56BB",
                "ssid": "FOSTER WIFI",
                "rssi": -88,
                "freq": 2464,
                "dist": 243.14,
            },
        ),
        FrameCase(
            mk(ssid=b"x"),
            True,
            "ssid_len_1",
            {"mac": "28B2BDD02FC8", "ssid": "x", "rssi": -90, "freq": 2464},
        ),
        FrameCase(
            mk(ssid=b"A" * 32),
            True,
            "ssid_len_32",
            {"mac": "28B2BDD02FC8", "ssid": "A" * 32, "rssi": -90, "freq": 2464},
        ),
        FrameCase(
            mk(ssid=b"caf\x01e"),
            True,
            "ssid_nonprintable",
            {"mac": "28B2BDD02FC8", "ssid": "caf\\x01e", "rssi": -90, "freq": 2464},
        ),
        FrameCase(
            mk(ssid=b"\x00\xff"),
            True,
            "ssid_all_escaped",
            {"mac": "28B2BDD02FC8", "ssid": "\\x00\\xFF", "rssi": -90, "freq": 2464},
        ),
        FrameCase(
            mk(mac=b"\x00\x00\x00\x00\x2f\xc8"),
            True,
            "mac_zero_padded",
            {"mac": "000000002FC8", "ssid": "OPTUSVD3DA15E0_EXT", "rssi": -90, "freq": 2464},
        ),
        # negative cases — one per predicate (FIXTURES.md §2)
        FrameCase(mk(subtype=0x8), False, "wrong_subtype_beacon"),
        FrameCase(mk(subtype=0x5), False, "wrong_subtype_probe_resp"),
        FrameCase(
            mk(dest=b"\xff\xff\xff\xff\xff\xfe"), False, "non_broadcast_dest"
        ),
        FrameCase(mk(ip_proto=1), False, "known_proto_icmp"),
        FrameCase(mk(ip_proto=2), False, "known_proto_igmp"),
        FrameCase(mk(ip_proto=6), False, "known_proto_tcp"),
        FrameCase(mk(ip_proto=17), False, "known_proto_udp"),
        FrameCase(mk(ssid=b"", ssid_len=0), False, "ssid_len_0"),
        FrameCase(mk(ssid=b"B" * 33, ssid_len=33), False, "ssid_len_33"),
    ]
    return cases


def raw_frames_pdf(n_extra: int = 485) -> pd.DataFrame:
    """Labeled fixture cases + seeded random accepted frames (~500 total)."""
    rng = np.random.default_rng(SEED + 1)
    rows = []
    base = dt.datetime(2016, 7, 21, 11, 0, 0)
    for i, case in enumerate(frame_cases()):
        rows.append(
            (
                case.frame,
                SENSOR_IDS[i % 5],
                base + dt.timedelta(seconds=i),
                len(case.frame),
            )
        )
    for i in range(n_extra):
        mac = bytes(rng.integers(0, 256, size=6, dtype=np.uint8))
        ssid = f"NET_{int(rng.integers(0, 30)):02d}".encode()
        accepted = build_frame(
            mac=mac,
            ssid=ssid,
            rssi=int(rng.integers(-95, -29)),
            freq=int(FREQS[int(rng.integers(0, len(FREQS)))]),
            rng=rng,
        )
        rows.append(
            (
                accepted,
                SENSOR_IDS[int(rng.integers(0, 5))],
                base + dt.timedelta(seconds=20 + i),
                len(accepted),
            )
        )
    return pd.DataFrame(rows, columns=["frame", "sensor_id", "recv_ts", "frame_len"])


def raw_frames_df(spark: SparkSession, n_extra: int = 485) -> DataFrame:
    return spark.createDataFrame(raw_frames_pdf(n_extra), schema=RAW_FRAMES_SCHEMA)


# ---------------------------------------------------------------------------
# dimensions (FIXTURES.md §3-§5)
# ---------------------------------------------------------------------------

# ~1 km box around (-27.47, 153.02); s3-s5 deliberately collinear on lat
SENSORS = (
    ("s1", -27.4700, 153.0200),
    ("s2", -27.4745, 153.0265),
    ("s3", -27.4660, 153.0150),
    ("s4", -27.4660, 153.0230),
    ("s5", -27.4660, 153.0310),
)


def sensors_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(list(SENSORS), schema=SENSORS_SCHEMA)


def ssid_geo_df(spark: SparkSession) -> DataFrame:
    rng = np.random.default_rng(SEED + 2)
    rows = [
        (f"NET_{i:02d}", -27.47 + rng.uniform(-0.01, 0.01), 153.02 + rng.uniform(-0.01, 0.01))
        for i in range(20)
    ]
    return spark.createDataFrame(rows, schema=SSID_GEO_SCHEMA)


def watchlist_df(spark: SparkSession, observed_macs: list[str]) -> DataFrame:
    rows = [(m, f"target_{i}") for i, m in enumerate(observed_macs[:5])]
    rows += [("000000000001", "ghost_1"), ("FFFFFFFFFFF0", "ghost_2")]
    return spark.createDataFrame(rows, schema=WATCHLIST_SCHEMA)


# ---------------------------------------------------------------------------
# trilateration truth (FIXTURES.md §6)
# ---------------------------------------------------------------------------

# the one geodesy constant — defined next to the solver so fixture truth
# generation and the solve can never drift apart
from ssidentity_spark.operators.trilateration import METERS_PER_DEG_LAT  # noqa: E402


def _meters(lat1, lon1, lat2, lon2) -> float:
    mlat = METERS_PER_DEG_LAT
    mlon = METERS_PER_DEG_LAT * math.cos(math.radians(-27.47))
    return math.hypot((lat1 - lat2) * mlat, (lon1 - lon2) * mlon)


def trilat_truth_observations(spark: SparkSession) -> tuple[DataFrame, dict[str, tuple[float, float]]]:
    """Observations generated FROM known positions: true distance to each
    sensor → inverse FSPL → rssi (rounded) → forward FSPL dist. Solver must
    recover position within FSPL quantization noise (FIXTURES.md §6)."""
    truth = {
        "AAAA00000001": (-27.4690, 153.0210),
        "BBBB00000002": (-27.4710, 153.0250),
        "CCCC00000003": (-27.4672, 153.0188),
    }
    freq = 2437
    ts0 = dt.datetime(2016, 7, 20, 9, 0, 0)
    rows = []
    for mac, (lat, lon) in truth.items():
        for sid, slat, slon in SENSORS:
            d = max(_meters(lat, lon, slat, slon), 1.0)
            rssi = round(27.55 - 20 * math.log10(d) - 20 * math.log10(freq))
            rows.append(
                (
                    ts0,
                    ts0.strftime("%m/%d/%y - %I:%M%p"),
                    sid,
                    mac,
                    "TRUTH_NET",
                    int(rssi),
                    freq,
                    fspl(int(rssi), freq),
                )
            )
    pdf = pd.DataFrame(
        rows,
        columns=["ts", "ts_str", "sensor_id", "mac", "ssid", "rssi", "freq", "dist"],
    )
    return spark.createDataFrame(pdf, schema=OBSERVATIONS_SCHEMA), truth


# ---------------------------------------------------------------------------
# Real-format binary fixtures (FIXTURES.md §8): dependency-free generators
# for the two header-described formats operators/multimodal.py decodes for
# real — uncompressed 24-bit BMP and PCM WAV.
# ---------------------------------------------------------------------------


def build_bmp(width: int, height: int, pixel_fn=None) -> bytes:
    """Uncompressed 24-bit bottom-up BMP. ``pixel_fn(x, y) -> (b, g, r)``
    defaults to a deterministic gradient."""
    import struct as _struct

    if pixel_fn is None:
        pixel_fn = lambda x, y: ((x * 7) % 256, (y * 11) % 256, (x + y) % 256)  # noqa: E731
    stride = (width * 3 + 3) & ~3
    pixel_bytes = bytearray()
    for y in range(height):  # bottom-up row order, rows padded to stride
        row = bytearray()
        for x in range(width):
            row.extend(pixel_fn(x, y))
        row.extend(b"\x00" * (stride - len(row)))
        pixel_bytes.extend(row)
    header_size = 14 + 40
    file_size = header_size + len(pixel_bytes)
    return (
        b"BM"
        + _struct.pack("<IHHI", file_size, 0, 0, header_size)
        + _struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixel_bytes), 2835, 2835, 0, 0)
        + bytes(pixel_bytes)
    )


def build_png(
    width: int,
    height: int,
    pixel_fn=None,
    color_type: int = 2,
    row_filters: list[int] | None = None,
) -> bytes:
    """8-bit non-interlaced PNG encoder (gray/RGB/RGBA) with per-row filter
    selection — the independent inverse of operators.multimodal.decode_png,
    so property tests can assert decode∘encode == identity across all five
    filter types. ``pixel_fn(x, y)`` returns a channel tuple; defaults to a
    deterministic gradient. ``row_filters[y]`` picks filter 0-4 per line
    (default cycles through all five)."""
    import struct as _struct
    import zlib as _zlib

    channels = {0: 1, 2: 3, 6: 4}[color_type]
    if pixel_fn is None:
        pixel_fn = lambda x, y: (  # noqa: E731
            (x * 7) % 256,
            (y * 11) % 256,
            (x + y) % 256,
            (x * y + 13) % 256,
        )[:channels]
    if row_filters is None:
        row_filters = [y % 5 for y in range(height)]
    stride = width * channels
    prev = bytes(stride)
    out = bytearray()
    for y in range(height):
        line = bytearray()
        for x in range(width):
            px = pixel_fn(x, y)
            line.extend(int(v) & 0xFF for v in px[:channels])
        f = row_filters[y]
        filt = bytearray(stride)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (line[i] - pred) & 0xFF
        out.append(f)
        out.extend(filt)
        prev = bytes(line)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data))
            + tag
            + data
            + _struct.pack(">I", _zlib.crc32(tag + data))
        )

    ihdr = _struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    idat = _zlib.compress(bytes(out))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def build_wav(
    n_samples: int, sample_rate: int = 16000, channels: int = 1, bits: int = 16
) -> bytes:
    """Integer-PCM WAV with a deterministic sawtooth payload."""
    import struct as _struct

    bytes_ps = bits // 8
    block_align = channels * bytes_ps
    data = bytearray()
    for i in range(n_samples * channels):
        data.extend(((i * 257) % (1 << bits)).to_bytes(bytes_ps, "little"))
    fmt = _struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    riff_payload = (
        b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(data)) + bytes(data)
    )
    return b"RIFF" + _struct.pack("<I", len(riff_payload)) + riff_payload
