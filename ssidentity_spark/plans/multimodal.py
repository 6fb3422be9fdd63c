"""Multimodal-column plumbing (BASELINE.json north star): image/audio/video
as opaque ``binary`` payloads with typed metadata, processed by Arrow-batched
``mapInPandas`` pipelines.

The container has no codec libraries, but three formats are decoded for
real, dependency-free (ssidentity_spark.operators.multimodal): uncompressed
BMP, PCM WAV, and — via stdlib zlib — 8-bit PNG (``mm_png_decode`` runs the
full encode→deflate→inflate→unfilter loop under the driver's hash gate).
Formats that genuinely need a codec (JPEG/MP3) raise NotImplementedError;
a deterministic fake decoder stands in for the oracle-twin queries. What
is real and tested throughout: the binary column schema, the Arrow batch
path, the mapInPandas signature/batching, and the partition strategy —
everything Spark-side that a real codec would plug into.

The driver testdata has no binary columns, so payloads are derived
deterministically from ``documents.text`` (utf-8 bytes): good enough to
exercise byte-level plumbing end-to-end with an oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ssidentity_spark.io import load_table
from ssidentity_spark.registry import register

# ---------------------------------------------------------------------------
# Binary payload + typed metadata, pure Column expressions
# ---------------------------------------------------------------------------


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           upper(substr(hex(encode(text)), 1, 16)) AS payload_pfx_hex,
           md5(text) AS payload_md5,
           CASE WHEN octet_length(encode(text)) < 200 THEN 'thumb'
                WHEN octet_length(encode(text)) < 400 THEN 'small'
                ELSE 'large' END AS size_class
    FROM documents
    """,
    survey="EXT-multimodal",
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    n_bytes = F.octet_length(payload).cast("long")
    return d.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.upper(F.substring(F.hex(payload), 1, 16)).alias("payload_pfx_hex"),
        F.md5("text").alias("payload_md5"),
        F.when(n_bytes < 200, "thumb")
        .when(n_bytes < 400, "small")
        .otherwise("large")
        .alias("size_class"),
    )


# ---------------------------------------------------------------------------
# mapInPandas feature extraction over binary payloads (the Arrow batch path
# a real image decoder would use). Deterministic fake decode: "dims" come
# from the first payload bytes — oracle-checkable.
# ---------------------------------------------------------------------------


@register(
    "mm_frame_sample",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             upper(hex(encode(text))) AS h,
             CAST(octet_length(encode(text)) // 32 AS INTEGER) AS n_frames
      FROM documents
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           substr(h, CAST(i AS BIGINT) * 64 + 1, 16) AS frame_pfx_hex,
           n_frames
    FROM t, unnest(generate_series(0, n_frames - 1, 4)) AS u(i)
    """,
    survey="EXT-multimodal,U1,U4",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over binary payloads: every 4th 32-byte
    'frame', one output row per sampled frame (a 1→N flatMap inside the
    Arrow batch — the mapInPandas shape a real GOP sampler would use). The
    oracle mirrors the byte math on the hex encoding, so the fan-out row
    set AND the sampled bytes are hash-checked, not just counted."""
    from ssidentity_spark.operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return sample_frames(with_payload, frame_bytes=32, stride=4, pfx_bytes=8)


@register(
    "mm_png_decode",
    # The oracle recomputes each document's pixel sum directly from the
    # text bytes (hex-pair arithmetic), so the Spark side's PNG
    # encode→deflate→inflate→unfilter→decode loop (operators.multimodal:
    # decode_png, all five scanline filter types via fixtures.build_png)
    # is hash-checked per document — integer-exact, no float rounding.
    oracle="""
    WITH t AS (
      SELECT doc_id,
             upper(hex(encode(text))) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    ), dims AS (
      SELECT doc_id, hx, least(n // 16, 16) AS h
      FROM t WHERE n >= 16
    )
    SELECT doc_id,
           CAST(16 AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(list_aggregate(list_transform(range(0, CAST(16 * h AS BIGINT)), i ->
             (strpos('0123456789ABCDEF', substr(hx, CAST(i * 2 + 1 AS BIGINT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(i * 2 + 2 AS BIGINT), 1)) - 1
           ), 'sum') AS BIGINT) AS sum_px,
           CAST(16 * h AS BIGINT) AS n_px
    FROM dims
    """,
    survey="EXT-multimodal,U1",
    # bench headliner (VERDICT r5 ask #5): the one Arrow/mapInPandas
    # decode in the headline set, so a regression in the Python-worker
    # path — batch sizing, Arrow serialization, the decoder itself — shows
    # up in BENCH, not only in pytest.
    bench=True,
)
def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real compressed-image decode in the production Arrow path: each
    document's bytes become an 8-bit grayscale PNG (stdlib zlib; scanline
    filters cycle through all five types) which is decoded straight back —
    proving the decoder against an independent SQL ground truth at the
    driver gate, not just in pytest."""
    from ssidentity_spark.operators.multimodal import png_roundtrip_features

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return png_roundtrip_features(d)


@register(
    "mm_gif_decode",
    # Like mm_png_decode's oracle: each document's pixel sum is
    # recomputed directly from the text bytes (hex-pair arithmetic) —
    # GIF-LZW is lossless and the palette is identity grayscale, so the
    # Spark side's LZW encode→container→decode loop (operators/gif.py)
    # is hash-checked per document, integer-exact, including the
    # two-frame animation walk.
    oracle="""
    WITH t AS (
      SELECT doc_id,
             upper(hex(encode(text))) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    ), dims AS (
      SELECT doc_id, hx, least(n // 32, 8) AS h
      FROM t WHERE n >= 32
    )
    SELECT doc_id,
           CAST(16 AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(2 AS INTEGER) AS n_frames,
           CAST(list_aggregate(list_transform(range(0, CAST(32 * h AS BIGINT)), i ->
             (strpos('0123456789ABCDEF', substr(hx, CAST(i * 2 + 1 AS BIGINT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(i * 2 + 2 AS BIGINT), 1)) - 1
           ), 'sum') AS BIGINT) AS sum_px,
           CAST(32 * h AS BIGINT) AS n_px
    FROM dims
    """,
    survey="EXT-multimodal,U1",
)
def mm_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real palette-image/animation decode in the production Arrow path:
    each document's bytes become a two-frame GIF over the identity
    grayscale palette (full LZW encode with variable-width code growth)
    which is decoded straight back — proving the codec against an
    independent SQL ground truth at the driver gate, not just in
    pytest."""
    from ssidentity_spark.operators.multimodal import gif_roundtrip_features

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return gif_roundtrip_features(d)


_HEXD = "'0123456789ABCDEF'"


def _sql_byte(pos_expr: str) -> str:
    """DuckDB expr: value 0-255 of the 0-based byte ``pos_expr`` of hx."""
    return (
        f"((strpos({_HEXD}, substr(hx, ({pos_expr}) * 2 + 1, 1)) - 1) * 16"
        f" + strpos({_HEXD}, substr(hx, ({pos_expr}) * 2 + 2, 1)) - 1)"
    )


_SIGNED16 = (
    f"(CASE WHEN {_sql_byte('i * 2')} + 256 * {_sql_byte('i * 2 + 1')} >= 32768 "
    f"THEN {_sql_byte('i * 2')} + 256 * {_sql_byte('i * 2 + 1')} - 65536 "
    f"ELSE {_sql_byte('i * 2')} + 256 * {_sql_byte('i * 2 + 1')} END)"
)


@register(
    "mm_wav_decode",
    # The audio analog of mm_png_decode: the oracle re-derives each
    # document's 16-bit little-endian signed samples from the raw bytes
    # (hex-pair arithmetic), so the Spark side's RIFF wrap → chunk walk →
    # sample decode loop is hash-checked per document, integer-exact.
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             upper(hex(encode(text))) AS hx,
             least(octet_length(encode(text)) // 2, 512) AS n
      FROM documents
    ), d AS (
      SELECT doc_id, n,
             list_transform(range(0, CAST(n AS BIGINT)), i -> {_SIGNED16}) AS sm
      FROM t WHERE n >= 1
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(list_aggregate(sm, 'sum') AS BIGINT) AS sum_samples,
           CAST(list_aggregate(list_transform(sm, x -> abs(x)), 'max') AS BIGINT)
             AS peak
    FROM d
    """,
    survey="EXT-multimodal,U1",
)
def mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio sample decode in the production Arrow path: each
    document's bytes become 16-bit PCM in a RIFF/WAVE container
    (operators.multimodal.pcm_wav_from_samples) and are decoded straight
    back (decode_audio_samples) — count/sum/peak are integer-exact, so
    the driver gate hash-checks the sample decode, not just the header
    walk the r4 decoder covered."""
    from ssidentity_spark.operators.multimodal import wav_roundtrip_features

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return wav_roundtrip_features(d)


@register(
    "mm_flac_decode",
    # Identical byte-math oracle to mm_wav_decode — deliberately: FLAC is
    # lossless, so compress→decompress must reproduce the exact samples
    # the oracle derives from raw bytes. A single wrong Rice bit, CRC,
    # predictor coefficient, or UTF-8 frame number breaks the hash.
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             upper(hex(encode(text))) AS hx,
             least(octet_length(encode(text)) // 2, 512) AS n
      FROM documents
    ), d AS (
      SELECT doc_id, n,
             list_transform(range(0, CAST(n AS BIGINT)), i -> {_SIGNED16}) AS sm
      FROM t WHERE n >= 1
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(list_aggregate(sm, 'sum') AS BIGINT) AS sum_samples,
           CAST(list_aggregate(list_transform(sm, x -> abs(x)), 'max') AS BIGINT)
             AS peak
    FROM d
    """,
    survey="EXT-multimodal,U1",
)
def mm_flac_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real COMPRESSED audio codec in the production Arrow path: each
    document's bytes become 16-bit samples, Rice-coded through the
    dependency-free FLAC encoder (operators/flac.py), decoded back with
    CRC-8/CRC-16/MD5 verification, and reduced to integer-exact stats."""
    from ssidentity_spark.operators.multimodal import flac_roundtrip_features

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return flac_roundtrip_features(d)


@register(
    "mm_decoded_features",
    # BYTE math like every other mm oracle: fake_decode reads the first
    # two BYTES of the utf-8 encoding, while ascii(substr(text,...))
    # would return Unicode CODEPOINTS — identical only for pure-ASCII
    # corpora (a doc starting 'é' is 0xC3=195 byte-wise but 233 as a
    # codepoint). try_cast+coalesce covers the <2-byte documents, where
    # fake_decode returns 0.
    oracle="""
    SELECT doc_id,
           COALESCE(TRY_CAST('0x' || substr(hex(encode(text)), 1, 2)
                             AS INTEGER), 0) AS fake_width,
           COALESCE(TRY_CAST('0x' || substr(hex(encode(text)), 3, 2)
                             AS INTEGER), 0) AS fake_height,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) % 251 AS BIGINT) AS checksum_mod
    FROM documents
    """,
    survey="EXT-multimodal,U1",
)
def mm_decoded_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ssidentity_spark.operators.multimodal import extract_features

    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return extract_features(with_payload)


@register(
    "mm_avi_frames",
    # Like mm_png_decode / mm_gif_decode: the oracle recomputes the
    # sampled-frame pixel sum straight from the text bytes (hex-pair
    # arithmetic). Frames are 8x4 (32 bytes); sampling takes the even
    # frames, so sampled byte j maps to source offset (j//32)*64 + j%32.
    # A wrong header, a dropped movi chunk, a bottom-up/BGR unpack slip,
    # or an off-by-one in the keyframe stride all break the hash.
    oracle="""
    WITH t AS (
      SELECT doc_id,
             upper(hex(encode(text))) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    ), dims AS (
      SELECT doc_id, hx,
             least(n // 32, 6) AS n_frames,
             (least(n // 32, 6) + 1) // 2 AS n_sampled
      FROM t WHERE n >= 64
    )
    SELECT doc_id,
           CAST(8 AS INTEGER) AS width,
           CAST(4 AS INTEGER) AS height,
           CAST(n_frames AS INTEGER) AS n_frames,
           CAST(n_sampled AS INTEGER) AS n_sampled,
           CAST(list_aggregate(list_transform(range(0, CAST(n_sampled * 32 AS BIGINT)), j ->
             (strpos('0123456789ABCDEF',
                substr(hx, CAST(((j // 32) * 64 + j % 32) * 2 + 1 AS BIGINT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF',
                substr(hx, CAST(((j // 32) * 64 + j % 32) * 2 + 2 AS BIGINT), 1)) - 1
           ), 'sum') AS BIGINT) AS sum_px,
           CAST(n_sampled * 32 AS BIGINT) AS n_px
    FROM dims
    """,
    survey="EXT-multimodal,U1",
)
def mm_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video-container frame sampling in the Arrow path: each
    document's bytes become uncompressed-DIB frames inside a complete
    AVI (RIFF hdrl/movi/idx1, operators/avi.py), which is walked back and
    keyframe-sampled every 2nd frame — the container write→parse→sample
    loop proven against an independent SQL ground truth at the driver
    gate. The MJPG variant (per-frame baseline JPEG through
    operators/jpeg.py) is pinned by pytest round-trip properties."""
    from ssidentity_spark.operators.multimodal import avi_roundtrip_features

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return avi_roundtrip_features(d)


# ---------------------------------------------------------------------------
# Perceptual hashing (dHash): decode -> resize -> feature-extract, the image
# near-dup primitive. The DuckDB fragment below recomputes the WHOLE pipeline
# from the raw text bytes — 9x8 integer block-average resize, then the 64
# neighbour comparisons packed into four 16-bit bands — so the gate checks
# the real PNG decode AND the resize arithmetic bit-for-bit.
# ---------------------------------------------------------------------------

# shared CTE chain: documents -> hex bytes -> 72 resize cells -> 4 bands.
# Band j carries dHash bits [16j, 16j+16); bit k = r*8+c compares resize
# cells (r, c+1) > (r, c) on the 8x9 grid (1-based list indexing: +1/+2).
DHASH_BANDS_SQL = """
    t AS (
      SELECT doc_id,
             upper(hex(encode(text))) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    ), dims AS (
      SELECT doc_id, hx, least(n // 16, 16) AS h
      FROM t WHERE n >= 16 * 8
    ), cellt AS (
      SELECT doc_id, h,
        list_transform(range(0, 72), k ->
          list_aggregate(
            list_transform(range((k // 9) * h // 8, (k // 9 + 1) * h // 8),
              rw -> list_aggregate(
                list_transform(range((k % 9) * 16 // 9,
                                     (k % 9 + 1) * 16 // 9),
                  cl -> (strpos('0123456789ABCDEF',
                           substr(hx, CAST((rw * 16 + cl) * 2 + 1 AS BIGINT),
                                  1)) - 1) * 16
                        + strpos('0123456789ABCDEF',
                           substr(hx, CAST((rw * 16 + cl) * 2 + 2 AS BIGINT),
                                  1)) - 1
                ), 'sum')
            ), 'sum')
          // (((k // 9 + 1) * h // 8 - (k // 9) * h // 8)
              * ((k % 9 + 1) * 16 // 9 - (k % 9) * 16 // 9))
        ) AS cells
      FROM dims
    ), bands AS (
      SELECT doc_id, h,
        list_transform(range(0, 4), j ->
          list_aggregate(
            list_transform(range(0, 16), b -> CASE
              WHEN cells[CAST((j*16 + b) // 8 * 9 + (j*16 + b) % 8 + 2
                              AS BIGINT)]
                 > cells[CAST((j*16 + b) // 8 * 9 + (j*16 + b) % 8 + 1
                              AS BIGINT)]
              THEN (1 << b) ELSE 0 END), 'sum')
        ) AS bd
      FROM cellt
    )
"""


@register(
    "mm_image_dhash",
    oracle=f"""
    WITH {DHASH_BANDS_SQL}
    SELECT doc_id,
           CAST(16 AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           lpad(lower(to_hex(CAST(bd[4] AS BIGINT))), 4, '0')
             || lpad(lower(to_hex(CAST(bd[3] AS BIGINT))), 4, '0')
             || lpad(lower(to_hex(CAST(bd[2] AS BIGINT))), 4, '0')
             || lpad(lower(to_hex(CAST(bd[1] AS BIGINT))), 4, '0')
             AS dhash_hex,
           count(*) OVER (
             PARTITION BY bd[4], bd[3], bd[2], bd[1]
           ) AS dup_count
    FROM bands
    """,
    survey="EXT-multimodal,A4,U1",
)
def mm_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashing in the production Arrow path: real PNG
    decode (operators/multimodal.py:decode_png_gray), 9x8 integer
    block-average RESIZE, 64-bit dHash — plus the exact-dedup
    composition (documents sharing a hash form a dup group). Docs
    shorter than 8 image rows are dropped (the resize grid would have
    empty blocks)."""
    from ssidentity_spark.operators.multimodal import image_dhash_features

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    hashed = image_dhash_features(d)
    w = Window.partitionBy("dhash_hex")
    return hashed.select(
        "doc_id",
        "width",
        "height",
        "dhash_hex",
        F.count(F.lit(1)).over(w).alias("dup_count"),
    )


@register(
    "mm_audio_features",
    # The audio feature-extraction gate: the oracle re-derives the 16-bit
    # signed samples from raw bytes, frames them, and recomputes energy,
    # zero crossings, and the Walsh-Hadamard coefficients — all integer
    # arithmetic, so the real WAV container walk + sample decode + the
    # spectral transform are hash-checked per frame. WHT over the DFT is
    # deliberate: the ±1 basis keeps coefficients exact integers (a float
    # FFT could only be rows-only checked).
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             upper(hex(encode(text))) AS hx,
             least(octet_length(encode(text)) // 2, 512) AS n
      FROM documents
    ), d AS (
      SELECT doc_id, n,
             list_transform(range(0, CAST(n AS BIGINT)), i -> {_SIGNED16}) AS sm
      FROM t WHERE n >= 64
    ), fr AS (
      SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
             list_transform(range(0, 64),
                            j -> sm[CAST(f * 64 + j + 1 AS BIGINT)]) AS w
      FROM d, unnest(generate_series(0, n // 64 - 1)) AS u(f)
    )
    SELECT doc_id, frame_idx,
           CAST(list_aggregate(list_transform(w, x -> x * x), 'sum')
                AS BIGINT) AS energy,
           CAST(coalesce(list_aggregate(list_transform(range(1, 64), j ->
                  CASE WHEN w[CAST(j AS BIGINT)] * w[CAST(j + 1 AS BIGINT)] < 0
                       THEN 1 ELSE 0 END), 'sum'), 0) AS BIGINT) AS zcr,
           CAST(list_aggregate(list_transform(range(0, 64), j ->
                  w[CAST(j + 1 AS BIGINT)]
                  * (1 - 2 * (bit_count(CAST(j AS BIGINT) & 1) % 2))),
                'sum') AS BIGINT) AS wht_1,
           CAST(list_aggregate(list_transform(range(0, 64), j ->
                  w[CAST(j + 1 AS BIGINT)]
                  * (1 - 2 * (bit_count(CAST(j AS BIGINT) & 2) % 2))),
                'sum') AS BIGINT) AS wht_2,
           CAST(list_aggregate(list_transform(range(0, 64), j ->
                  w[CAST(j + 1 AS BIGINT)]
                  * (1 - 2 * (bit_count(CAST(j AS BIGINT) & 4) % 2))),
                'sum') AS BIGINT) AS wht_4,
           CAST(list_aggregate(list_transform(range(0, 64), j ->
                  w[CAST(j + 1 AS BIGINT)]
                  * (1 - 2 * (bit_count(CAST(j AS BIGINT) & 8) % 2))),
                'sum') AS BIGINT) AS wht_8
    FROM fr
    """,
    survey="EXT-multimodal,U1,U4",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction in the production Arrow path: real WAV
    decode → 64-sample framing → per-frame energy, zero-crossing rate,
    and Walsh-Hadamard sequency coefficients (integer-exact spectral
    features), one row per frame — the framing/fan-out/feature pipeline
    a VAD or spectrogram stage runs, hash-checked end to end."""
    from ssidentity_spark.operators.multimodal import audio_frame_features

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return audio_frame_features(d)


# ---------------------------------------------------------------------------
# MM11 — video keyframe near-dup (r9): keyframe gradient signatures +
# cross-video sharing counts. The oracle recomputes the signature straight
# from the text bytes (sampled frame s, byte k lives at source offset
# s*64 + k — the even-frame sampling of mm_avi_frames), so the container
# write→walk→sample→signature loop sits under one hash.
# ---------------------------------------------------------------------------

def _px_at(off: str) -> str:
    """Hex-pair byte value at source offset ``off`` (a SQL expression)."""
    return (
        f"((strpos('0123456789ABCDEF', substr(hx, CAST(({off}) * 2 + 1 AS "
        f"BIGINT), 1)) - 1) * 16 + strpos('0123456789ABCDEF', substr(hx, "
        f"CAST(({off}) * 2 + 2 AS BIGINT), 1)) - 1)"
    )


_VKD_LEFT = _px_at("s * 64 + (b // 7) * 8 + (b % 7)")
_VKD_RIGHT = _px_at("s * 64 + (b // 7) * 8 + (b % 7) + 1")


@register(
    "mm_video_keyframe_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             upper(hex(encode(text))) AS hx,
             octet_length(encode(text)) AS n
      FROM documents
    ), dims AS (
      SELECT doc_id, hx,
             (least(n // 32, 6) + 1) // 2 AS n_sampled
      FROM t WHERE n >= 64
    ), sigs AS (
      SELECT doc_id, CAST(s AS INTEGER) AS frame_idx,
             list_aggregate(list_transform(range(0, 28), b ->
               CASE WHEN {_VKD_RIGHT} > {_VKD_LEFT}
                    THEN (1 << b) ELSE 0 END), 'sum') AS sig
      FROM dims, unnest(generate_series(0, n_sampled - 1)) AS u(s)
    )
    SELECT doc_id, frame_idx,
           lpad(lower(to_hex(CAST(sig AS BIGINT))), 7, '0') AS sig_hex,
           count(*) OVER (PARTITION BY sig) AS shared_frames
    FROM sigs
    """,
    survey="MM11,EXT-multimodal,MM9",
)
def mm_video_keyframe_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video keyframe near-dup: every sampled keyframe's 28-bit
    horizontal-gradient signature
    (operators/multimodal.py:video_keyframe_signatures) plus how many
    keyframes across the WHOLE corpus share it — duplicated or
    re-packaged clips collide keyframe-by-keyframe, the video analog of
    MM9's image dHash groups.

    Plan shape: one Arrow mapInPandas pass (container build+walk+sample+
    signature), then ONE sig-keyed exchange feeding the sharing window —
    no pairwise frame comparison anywhere. At 100 TB the signature table
    is the maintained artifact (like the LSH band index) and new clips
    probe it by equi-join on sig."""
    from ssidentity_spark.operators.multimodal import (
        video_keyframe_signatures,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = video_keyframe_signatures(d)
    w = Window.partitionBy("sig")
    return sigs.select(
        "doc_id",
        "frame_idx",
        F.lpad(F.lower(F.hex(F.col("sig"))), 7, "0").alias("sig_hex"),
        F.count(F.lit(1)).over(w).alias("shared_frames"),
    )
