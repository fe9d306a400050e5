"""Multimodal column plumbing (extension phase).

Images/audio/video ride through Spark as opaque ``binary`` columns
with a typed metadata struct alongside.  The Spark-side plumbing —
schema, partition sizing, Arrow-batched UDF signatures — is real and
tested; the codec step itself is stubbed (no image/audio libraries in
this container) behind either a deterministic fake decoder or an
explicit ``NotImplementedError``, clearly marked below.

Scale notes:
* binary payloads dominate row size: ``spark.sql.files.maxPartitionBytes``
  (set in session.py) keeps scan partitions bounded by bytes, not rows;
* decode/feature-extract runs in ``mapInPandas`` — Arrow moves the
  binary batches zero-copy into Python, one batch at a time, so peak
  executor memory is one Arrow batch of payloads, not a partition;
* everything before/after the UDF (digests, length stats, joins on
  metadata) stays JVM-side.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import load_table

#: Metadata carried next to every binary payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def as_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a column as an opaque binary payload + typed metadata.

    (`documents.text` stands in for real media bytes; with true image
    columns only `media_type` changes.)  Digest and length are computed
    JVM-side — the payload never crosses into Python here.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


def decode_and_featurize(media: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow-batched).

    STUB: the real decoder (PIL/ffmpeg/torchvision) is not available
    in this container.  ``fake=True`` substitutes a deterministic
    byte-statistics "feature" so the plumbing (batch iteration, schema,
    shapes) is fully exercised; ``fake=False`` raises
    ``NotImplementedError`` exactly where the codec call belongs.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codec not available in this environment; "
                    "plug PIL/ffmpeg decode here"
                )
            feats, widths, heights = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                # Deterministic fake "decode": fixed-shape byte stats.
                n = max(len(b), 1)
                feats.append(
                    [
                        float(len(b)),
                        float(sum(b[:64])) / min(n, 64) if b else 0.0,
                        float(b[0]) if b else 0.0,
                        float(b[-1]) if b else 0.0,
                    ]
                )
                widths.append(64)
                heights.append(64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": pd.array(widths, dtype="int32"),
                    "height": pd.array(heights, dtype="int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(featurize, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 256) -> DataFrame:
    """Frame-sampling plumbing: explode a payload into fixed-stride
    chunk offsets JVM-side (for video this is the keyframe index); the
    per-frame decode then batches through `decode_and_featurize`."""
    n_frames = F.greatest(
        F.lit(1), F.floor(F.col("n_bytes") / every_n_bytes).cast("int")
    )
    return media.select(
        "doc_id",
        "media_type",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("byte_offset", F.col("frame_idx") * every_n_bytes)


# ---------------------------------------------------------------------------
# Real codec path: BMP / WAV containers decoded with an actual header
# parser (round-4 upgrade over the byte-stats fake).  The container
# BYTES are assembled JVM-side — a constant 54/44-byte header via
# unhex() concatenated with the document's own bytes as pixel/sample
# data — so the Arrow batches carry genuine BMP/WAV files and the
# Python side performs a real decode: magic check, little-endian
# header fields, row stride, BOTTOM-UP row order (BMP stores the
# image flipped; top_left_b is only correct if the decoder re-flips).
# Because pixels == document bytes, every extracted feature has an
# exact DuckDB oracle over ascii() of the text (driver corpus is pure
# ASCII) — a codec path that is simultaneously real and value-checked.
# ---------------------------------------------------------------------------

#: 4x4 24-bpp bottom-up BMP, 102 bytes total: BITMAPFILEHEADER (14) +
#: BITMAPINFOHEADER (40) + 48 pixel bytes (stride 12, 4-aligned).
_BMP_HEADER_HEX = (
    "424d"          # 'BM'
    "66000000"      # file size 102
    "00000000"      # reserved
    "36000000"      # pixel data offset 54
    "28000000"      # info header size 40
    "04000000"      # width 4
    "04000000"      # height 4 (positive -> bottom-up rows)
    "0100"          # planes 1
    "1800"          # 24 bits per pixel
    "00000000"      # BI_RGB (uncompressed)
    "30000000"      # image size 48
    "00000000" "00000000"  # x/y pixels-per-metre
    "00000000" "00000000"  # palette sizes
)
#: 8-bit mono PCM WAV, 92 bytes: canonical 44-byte RIFF/fmt/data
#: header + 48 sample bytes at 8 kHz.
_WAV_HEADER_HEX = (
    "52494646"      # 'RIFF'
    "54000000"      # chunk size 84 (36 + data 48)
    "57415645"      # 'WAVE'
    "666d7420"      # 'fmt '
    "10000000"      # fmt chunk size 16
    "0100"          # PCM
    "0100"          # mono
    "401f0000"      # sample rate 8000
    "401f0000"      # byte rate 8000
    "0100"          # block align 1
    "0800"          # 8 bits per sample
    "64617461"      # 'data'
    "30000000"      # data size 48
)
assert len(_BMP_HEADER_HEX) == 54 * 2 and len(_WAV_HEADER_HEX) == 44 * 2

_PAYLOAD_BYTES = 48  # both containers carry the doc's first 48 bytes


def _doc_bytes(text_col: str) -> "F.Column":
    """First 48 document bytes, space-padded — the pixel/sample data."""
    return F.encode(
        F.rpad(F.substring(F.col(text_col), 1, _PAYLOAD_BYTES),
               _PAYLOAD_BYTES, " "),
        "utf-8",
    )


def as_bmp(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Assemble a REAL 4x4 24-bpp BMP per document, JVM-side: constant
    header via unhex + the doc's bytes as the 48 pixel bytes."""
    return df.select(
        "doc_id",
        F.concat(
            F.unhex(F.lit(_BMP_HEADER_HEX)), _doc_bytes(text_col)
        ).alias("payload"),
        F.lit("image/bmp").alias("media_type"),
        F.lit(54 + _PAYLOAD_BYTES).cast("long").alias("n_bytes"),
    )


def as_wav(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Assemble a REAL 8-bit mono PCM WAV per document, JVM-side."""
    return df.select(
        "doc_id",
        F.concat(
            F.unhex(F.lit(_WAV_HEADER_HEX)), _doc_bytes(text_col)
        ).alias("payload"),
        F.lit("audio/wav").alias("media_type"),
        F.lit(44 + _PAYLOAD_BYTES).cast("long").alias("n_bytes"),
    )


BMP_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, px_mean double, "
    "px_min int, px_max int, top_left_b int"
)


def decode_bmp_features(media: DataFrame) -> DataFrame:
    """REAL BMP decode in mapInPandas: parse the little-endian headers,
    honor the stride and the bottom-up row order, then reduce the
    pixel array to stats.  ``top_left_b`` (blue channel of the TOP-
    left pixel) is the proof of a correct decode — it lives in the
    LAST stored row, so a decoder that skips the flip reads the wrong
    byte."""
    import struct

    import numpy as np

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] != b"BM":
                    raise ValueError("not a BMP payload")
                (data_off,) = struct.unpack_from("<I", b, 10)
                _hdr, w, h = struct.unpack_from("<Iii", b, 14)
                _planes, bpp = struct.unpack_from("<HH", b, 26)
                (comp,) = struct.unpack_from("<I", b, 30)
                if comp != 0 or bpp != 24:
                    raise ValueError("unsupported BMP variant")
                stride = (w * 3 + 3) // 4 * 4
                stored = [
                    np.frombuffer(b, np.uint8, stride, data_off + r * stride)[
                        : w * 3
                    ]
                    for r in range(h)
                ]
                img = np.stack(stored[::-1])  # bottom-up -> top-down
                px = img.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        float(px.sum()) / px.size,
                        int(px.min()),
                        int(px.max()),
                        int(img[0, 0]),  # B of top-left pixel
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "px_mean",
                    "px_min",
                    "px_max",
                    "top_left_b",
                ],
            ).astype(
                {"width": "int32", "height": "int32", "px_min": "int32",
                 "px_max": "int32", "top_left_b": "int32"}
            )

    return media.mapInPandas(parse, BMP_FEATURE_SCHEMA)


BMP_DOWNSCALE_SCHEMA = (
    "doc_id long, width int, height int, payload binary, "
    "px_mean double, top_left_b int"
)


def bmp_downscale(media: DataFrame, factor: int = 2) -> DataFrame:
    """REAL image resize through the BMP codec: decode → integer box
    filter (each output channel = floor(mean of factor² source
    pixels)) → re-encode a valid, smaller 24-bpp BMP — the
    resize/thumbnail stage of a multimodal ingest, with the same
    Arrow-batched mapInPandas plumbing as the feature decoders (the
    shape a PIL/ffmpeg-backed production kernel drops into).

    Output keeps the re-encoded payload (a decodable BMP — the
    roundtrip is pinned by tests/test_round6b_ops.py re-decoding it
    with decode_bmp_features) plus the downscaled stats.  Integer
    arithmetic only, so results are deterministic across platforms.
    Pytest-only by design: a binary result column cannot cross the
    driver's canonicalizer (verify-skill gotcha), and the codec
    mechanism is already contract-verified via bmp_features /
    image_phash_pairs.
    """
    import struct

    import numpy as np

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] != b"BM":
                    raise ValueError("not a BMP payload")
                (data_off,) = struct.unpack_from("<I", b, 10)
                _hdr, w, h = struct.unpack_from("<Iii", b, 14)
                _planes, bpp = struct.unpack_from("<HH", b, 26)
                (comp,) = struct.unpack_from("<I", b, 30)
                if comp != 0 or bpp != 24:
                    raise ValueError("unsupported BMP variant")
                stride = (w * 3 + 3) // 4 * 4
                stored = [
                    np.frombuffer(
                        b, np.uint8, stride, data_off + r * stride
                    )[: w * 3]
                    for r in range(h)
                ]
                img = np.stack(stored[::-1]).reshape(h, w, 3).astype(
                    np.int64
                )
                oh, ow = h // factor, w // factor
                small = (
                    img[: oh * factor, : ow * factor]
                    .reshape(oh, factor, ow, factor, 3)
                    .sum(axis=(1, 3))
                    // (factor * factor)
                ).astype(np.uint8)
                ostride = (ow * 3 + 3) // 4 * 4
                body = bytearray()
                for r in range(oh - 1, -1, -1):  # top-down -> bottom-up
                    row = small[r].tobytes()
                    body += row + b"\x00" * (ostride - len(row))
                fsize = 54 + len(body)
                hdr = (
                    b"BM"
                    + struct.pack("<IHHI", fsize, 0, 0, 54)
                    + struct.pack(
                        "<IiiHHIIiiII",
                        40, ow, oh, 1, 24, 0, len(body), 2835, 2835, 0, 0,
                    )
                )
                px = small.reshape(-1).astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        ow,
                        oh,
                        bytes(hdr) + bytes(body),
                        float(px.sum()) / px.size if px.size else None,
                        int(small[0, 0, 0]) if px.size else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "payload",
                    "px_mean", "top_left_b",
                ],
            ).astype({"width": "int32", "height": "int32"})

    return media.mapInPandas(work, BMP_DOWNSCALE_SCHEMA)


WAV_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples int, duration_sec double, "
    "amp_mean double, amp_peak int"
)


def decode_wav_features(media: DataFrame) -> DataFrame:
    """REAL WAV decode in mapInPandas: validate RIFF/WAVE magic, parse
    the fmt chunk (PCM, channels, rate, bit depth) and the data chunk,
    then reduce the 8-bit samples (unsigned, 128 = silence) to
    duration / DC level / peak amplitude."""
    import struct

    import numpy as np

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    raise ValueError("not a WAV payload")
                if b[12:16] != b"fmt ":
                    raise ValueError("fmt chunk not first")
                fmt, ch = struct.unpack_from("<HH", b, 20)
                rate, _byte_rate = struct.unpack_from("<II", b, 24)
                _block, bits = struct.unpack_from("<HH", b, 32)
                if fmt != 1 or ch != 1 or bits != 8:
                    raise ValueError("unsupported WAV variant")
                if b[36:40] != b"data":
                    raise ValueError("data chunk not found")
                (size,) = struct.unpack_from("<I", b, 40)
                samples = np.frombuffer(b, np.uint8, size, 44).astype(
                    np.int64
                )
                rows.append(
                    (
                        doc_id,
                        rate,
                        size,
                        float(size) / rate,
                        float(samples.sum()) / size,
                        int(np.abs(samples - 128).max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "sample_rate",
                    "n_samples",
                    "duration_sec",
                    "amp_mean",
                    "amp_peak",
                ],
            ).astype(
                {"sample_rate": "int32", "n_samples": "int32",
                 "amp_peak": "int32"}
            )

    return media.mapInPandas(parse, WAV_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Driver-contract queries (JVM-side metadata path has a SQL oracle; the
# mapInPandas featurize path is non-SQL-expressible -> rows-only check)
# ---------------------------------------------------------------------------


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return as_media(load_table(spark, sf_dir, "documents")).drop("payload")


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Featurize path with the array feature flattened to scalar
    columns.  Two reasons: (a) the driver's canonicalizer cannot sort
    or hash ``array<double>`` cells (numpy.ndarray is unhashable —
    observed ERR rows in rounds 1-2), and (b) with scalars the fake
    byte-stats decode becomes fully SQL-expressible, so this query
    gets a real value-hash oracle instead of a rows-only check (the
    driver data's text payloads are pure ASCII, so DuckDB's per-char
    ``ascii()`` equals the byte value)."""
    media = as_media(load_table(spark, sf_dir, "documents"))
    feats = decode_and_featurize(media, fake=True)
    return feats.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        F.col("feature")[0].alias("f_len"),
        F.col("feature")[1].alias("f_head_mean"),
        F.col("feature")[2].alias("f_first"),
        F.col("feature")[3].alias("f_last"),
    )


def q_bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_bmp_features(
        as_bmp(load_table(spark, sf_dir, "documents"))
    )


def q_wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_wav_features(
        as_wav(load_table(spark, sf_dir, "documents"))
    )


QUERIES = {
    "media_metadata": q_media_metadata,
    "media_features": q_media_features,
    "bmp_features": q_bmp_features,
    "wav_features": q_wav_features,
}

#: pixel/sample data: first 48 doc bytes, space-padded (pure-ASCII
#: corpus => DuckDB ascii(char) == byte value).
_PAD_SQL = "rpad(substr(text, 1, 48), 48, ' ')"

ORACLES = {
    "media_metadata": """
SELECT doc_id,
       'application/octet-stream' AS media_type,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       sha256(text) AS sha256
FROM documents
""",
    # Byte-exact twin of the deterministic fake decode in
    # decode_and_featurize: payload bytes == utf-8 of text, and the
    # driver corpus is pure ASCII so ascii(char) == byte value.  The
    # head-mean divides two exact integers in double on both engines,
    # so the IEEE result is identical.
    "media_features": """
SELECT doc_id,
       'application/octet-stream' AS media_type,
       CAST(64 AS INTEGER) AS width,
       CAST(64 AS INTEGER) AS height,
       CAST(strlen(text) AS DOUBLE) AS f_len,
       CAST(list_sum(list_transform(range(1, LEAST(strlen(text), 64) + 1),
                                    i -> ascii(substr(text, CAST(i AS INTEGER), 1))))
            AS DOUBLE) / LEAST(strlen(text), 64) AS f_head_mean,
       CAST(ascii(substr(text, 1, 1)) AS DOUBLE) AS f_first,
       CAST(ascii(substr(text, strlen(text), 1)) AS DOUBLE) AS f_last
FROM documents
""",
    # Exact twin of the real BMP decode: pixels are the padded doc
    # bytes; the top-left pixel's blue channel sits at stored byte 36
    # (stored row 3 of 4 under bottom-up order) -> 1-based char 37.
    "bmp_features": f"""
WITH px AS (
  SELECT doc_id,
         list_transform(generate_series(1, 48),
                        i -> ascii(substr({_PAD_SQL}, CAST(i AS INTEGER), 1)))
           AS p
  FROM documents
)
SELECT doc_id,
       CAST(4 AS INTEGER) AS width,
       CAST(4 AS INTEGER) AS height,
       CAST(list_sum(p) AS DOUBLE) / 48 AS px_mean,
       CAST(list_min(p) AS INTEGER) AS px_min,
       CAST(list_max(p) AS INTEGER) AS px_max,
       CAST(p[37] AS INTEGER) AS top_left_b
FROM px
""",
    "wav_features": f"""
WITH s AS (
  SELECT doc_id,
         list_transform(generate_series(1, 48),
                        i -> ascii(substr({_PAD_SQL}, CAST(i AS INTEGER), 1)))
           AS p
  FROM documents
)
SELECT doc_id,
       CAST(8000 AS INTEGER) AS sample_rate,
       CAST(48 AS INTEGER) AS n_samples,
       CAST(48 AS DOUBLE) / 8000 AS duration_sec,
       CAST(list_sum(p) AS DOUBLE) / 48 AS amp_mean,
       CAST(list_max(list_transform(p, x -> abs(x - 128))) AS INTEGER)
         AS amp_peak
FROM s
""",
}


# ---------------------------------------------------------------------------
# PNG: a real COMPRESSED container through the same mapInPandas path
# ---------------------------------------------------------------------------

#: 8x6 grayscale-8 PNG: 48 pixels = the same padded 48 doc bytes the
#: BMP/WAV containers carry.
_PNG_W, _PNG_H = 8, 6
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def as_png(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Assemble a REAL zlib-compressed 8x6 grayscale PNG per document.

    Unlike the raw BMP/WAV containers (constant header + raw bytes,
    built JVM-side), a PNG's IDAT is DEFLATE-compressed with per-chunk
    CRC32s — inherently codec-side work, so the encoder runs in
    mapInPandas on Python's stdlib ``zlib``.  Each scanline is filtered
    with filter type ``row % 5`` (None/Sub/Up/Average/Paeth), so a
    decoder cannot round-trip the pixels without implementing the full
    filter set.  Pixel data: the document's first 48 bytes,
    space-padded — the same content contract as ``as_bmp``/``as_wav``,
    which is what gives the decoder an exact byte-arithmetic oracle.
    """
    import struct
    import zlib

    out_schema = (
        "doc_id long, payload binary, media_type string, n_bytes long"
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ihdr = struct.pack(
            ">IIBBBBB", _PNG_W, _PNG_H, 8, 0, 0, 0, 0
        )  # 8-bit grayscale, no interlace
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "")[:48].ljust(48).encode("utf-8")
                filtered = bytearray()
                prior = bytes(_PNG_W)
                for r in range(_PNG_H):
                    line = raw[r * _PNG_W : (r + 1) * _PNG_W]
                    ftype = r % 5
                    filtered.append(ftype)
                    for i, x in enumerate(line):
                        left = line[i - 1] if i else 0
                        up = prior[i]
                        ul = prior[i - 1] if i else 0
                        if ftype == 0:
                            v = x
                        elif ftype == 1:
                            v = x - left
                        elif ftype == 2:
                            v = x - up
                        elif ftype == 3:
                            v = x - ((left + up) >> 1)
                        else:
                            v = x - _paeth(left, up, ul)
                        filtered.append(v & 0xFF)
                    prior = line
                payload = (
                    _PNG_SIG
                    + _png_chunk(b"IHDR", ihdr)
                    + _png_chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
                    + _png_chunk(b"IEND", b"")
                )
                rows.append((doc_id, payload, "image/png", len(payload)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "media_type", "n_bytes"]
            )

    return df.select("doc_id", "text").mapInPandas(encode, out_schema)


PNG_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, px_mean double, "
    "px_min int, px_max int, top_left int, bottom_right int"
)


def decode_png_features(media: DataFrame) -> DataFrame:
    """REAL PNG decode in mapInPandas, stdlib-only: verify the
    signature and every chunk CRC, parse IHDR, inflate the IDAT
    stream, reverse all five scanline filters (None/Sub/Up/Average/
    Paeth), then reduce the pixel array to stats.  ``bottom_right`` is
    the proof of a correct decode: under the encoder's ``row % 5``
    filter schedule the last row is Paeth-filtered against the row
    above, so every earlier row must have been reconstructed exactly
    for its value to come out right."""
    import struct
    import zlib

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:8] != _PNG_SIG:
                    raise ValueError("not a PNG payload")
                pos, w = 8, None
                idat = bytearray()
                while pos < len(b):
                    (ln,) = struct.unpack_from(">I", b, pos)
                    typ = b[pos + 4 : pos + 8]
                    data = b[pos + 8 : pos + 8 + ln]
                    (crc,) = struct.unpack_from(">I", b, pos + 8 + ln)
                    if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
                        raise ValueError(f"bad CRC in {typ!r}")
                    if typ == b"IHDR":
                        w, h, depth, ctype, comp, filt, ilace = (
                            struct.unpack(">IIBBBBB", data)
                        )
                        if (depth, ctype, comp, filt, ilace) != (8, 0, 0, 0, 0):
                            raise ValueError("unsupported PNG variant")
                    elif typ == b"IDAT":
                        idat.extend(data)
                    elif typ == b"IEND":
                        break
                    pos += 12 + ln
                raw = zlib.decompress(bytes(idat))
                px = bytearray()
                prior = bytes(w)
                for r in range(h):
                    ftype = raw[r * (w + 1)]
                    line = raw[r * (w + 1) + 1 : (r + 1) * (w + 1)]
                    recon = bytearray()
                    for i, v in enumerate(line):
                        left = recon[i - 1] if i else 0
                        up = prior[i]
                        ul = prior[i - 1] if i else 0
                        if ftype == 0:
                            x = v
                        elif ftype == 1:
                            x = v + left
                        elif ftype == 2:
                            x = v + up
                        elif ftype == 3:
                            x = v + ((left + up) >> 1)
                        elif ftype == 4:
                            x = v + _paeth(left, up, ul)
                        else:
                            raise ValueError(f"bad filter {ftype}")
                        recon.append(x & 0xFF)
                    px.extend(recon)
                    prior = bytes(recon)
                n = len(px)
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        float(sum(px)) / n,
                        int(min(px)),
                        int(max(px)),
                        int(px[0]),
                        int(px[-1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "px_mean",
                    "px_min",
                    "px_max",
                    "top_left",
                    "bottom_right",
                ],
            ).astype(
                {"width": "int32", "height": "int32", "px_min": "int32",
                 "px_max": "int32", "top_left": "int32",
                 "bottom_right": "int32"}
            )

    return media.mapInPandas(parse, PNG_FEATURE_SCHEMA)


def q_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_png_features(
        as_png(load_table(spark, sf_dir, "documents"))
    )


QUERIES["png_features"] = q_png_features

# Exact twin of the PNG round-trip: the decoded pixels ARE the padded
# doc bytes (pure-ASCII corpus => ascii(char) == byte value), whatever
# the container did to them in between — that independence from the
# compression path is exactly what makes this an oracle.
ORACLES["png_features"] = f"""
WITH px AS (
  SELECT doc_id,
         list_transform(generate_series(1, 48),
                        i -> ascii(substr({_PAD_SQL}, CAST(i AS INTEGER), 1)))
           AS p
  FROM documents
)
SELECT doc_id,
       CAST({_PNG_W} AS INTEGER) AS width,
       CAST({_PNG_H} AS INTEGER) AS height,
       CAST(list_sum(p) AS DOUBLE) / 48 AS px_mean,
       CAST(list_min(p) AS INTEGER) AS px_min,
       CAST(list_max(p) AS INTEGER) AS px_max,
       CAST(p[1] AS INTEGER) AS top_left,
       CAST(p[48] AS INTEGER) AS bottom_right
FROM px
"""


# ---------------------------------------------------------------------------
# Perceptual image hashing: near-dup IMAGE dedup over the real codec
# ---------------------------------------------------------------------------

#: Hamming radius for "visually identical" on the 16-bit average hash.
AHASH_HAMMING_MAX = 2
AHASH_SCHEMA = "doc_id long, ahash long"


def bmp_ahash(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) each REAL BMP: decode the 4x4 pixel grid
    (same header parse + bottom-up flip as decode_bmp_features),
    grayscale each pixel as the exact channel sum, and set bit i of a
    16-bit fingerprint iff pixel i (top-down raster order) is
    strictly brighter than the image mean — the integer comparison
    ``16 * gray_i > sum(gray)``, so no float enters the hash.  This is
    the classic perceptual-hash pipeline (pHash-family) scaled down to
    the fixture's 4x4 containers; the Arrow/mapInPandas plumbing and
    the raster-order arithmetic are exactly what a production 64-bit
    aHash over 8x8 thumbnails runs.
    """
    import struct

    import numpy as np

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] != b"BM":
                    raise ValueError("not a BMP payload")
                (data_off,) = struct.unpack_from("<I", b, 10)
                _hdr, w, h = struct.unpack_from("<Iii", b, 14)
                stride = (w * 3 + 3) // 4 * 4
                stored = [
                    np.frombuffer(b, np.uint8, stride, data_off + r * stride)[
                        : w * 3
                    ]
                    for r in range(h)
                ]
                img = np.stack(stored[::-1])  # bottom-up -> top-down
                gray = img.reshape(h, w, 3).sum(axis=2).reshape(-1)
                gray = gray.astype(np.int64)
                total = int(gray.sum())
                ahash = 0
                for i, g in enumerate(gray):
                    if 16 * int(g) > total:
                        ahash |= 1 << i
                rows.append((doc_id, ahash))
            yield pd.DataFrame(rows, columns=["doc_id", "ahash"])

    return media.mapInPandas(parse, AHASH_SCHEMA)


def image_phash_pairs(
    df: DataFrame, max_hamming: int = AHASH_HAMMING_MAX
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual hash: aHash every BMP,
    then find pairs within ``max_hamming`` bits — the image analog of
    simhash_near_dup_pairs, closing the dedup family over the
    multimodal column.

    Scale shape is the banded-Hamming LSH the simhash operator proved:
    the 16-bit hash splits into 4 disjoint 4-bit bands; <= 3 flipped
    bits leave at least one band intact (pigeonhole), so an equality
    join on (band index, band value) finds every candidate at radius
    <= ``max_hamming`` (= 2) with NO quadratic pass, and bit_count-XOR
    verifies exactly.  The oracle states the quadratic ground truth,
    so parity proves the banding loses nothing.
    """
    ah = bmp_ahash(as_bmp(df))
    bands = ah.select(
        "doc_id",
        "ahash",
        F.posexplode(
            F.array(
                *[
                    (F.col("ahash").bitwiseAND(F.lit(15 << (4 * b))))
                    for b in range(4)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.ahash").alias("ah_a"),
            F.col("b.ahash").alias("ah_b"),
        )
        .agg(F.count(F.lit(1)).alias("_nbands"))
    )
    ham = F.expr("bit_count(ah_a ^ ah_b)")
    return (
        cands.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
    )


def q_image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return image_phash_pairs(load_table(spark, sf_dir, "documents"))


QUERIES["image_phash_pairs"] = q_image_phash_pairs

#: gray_i for raster index i: stored row (3 - i//4), column i%4 —
#: the same bottom-up flip the decoder performs, in list arithmetic.
_GRAY_SQL = (
    "list_transform(generate_series(0, 15), i -> "
    "p[(3 - i // 4) * 12 + (i % 4) * 3 + 1]"
    " + p[(3 - i // 4) * 12 + (i % 4) * 3 + 2]"
    " + p[(3 - i // 4) * 12 + (i % 4) * 3 + 3])"
)

ORACLES["image_phash_pairs"] = f"""
WITH px AS (
  SELECT doc_id,
         list_transform(generate_series(1, 48),
                        i -> ascii(substr({_PAD_SQL}, CAST(i AS INTEGER), 1)))
           AS p
  FROM documents
),
g AS (SELECT doc_id, {_GRAY_SQL} AS gs FROM px),
h AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(generate_series(0, 15),
              i -> CASE WHEN 16 * gs[i + 1] > list_sum(gs)
                        THEN 1 << i ELSE 0 END)) AS BIGINT) AS ahash
  FROM g
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= {AHASH_HAMMING_MAX}
"""
