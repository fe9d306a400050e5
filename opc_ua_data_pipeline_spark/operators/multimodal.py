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
