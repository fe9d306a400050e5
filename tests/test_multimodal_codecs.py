"""The BMP/WAV decoders must be REAL parsers: honor little-endian
header fields, stride padding, and BMP's bottom-up row order — checked
on hand-built containers with geometries the contract queries never
produce (2x2 image whose stride carries 2 pad bytes per row; a WAV at
a different rate/length)."""

from __future__ import annotations

import struct

import pytest

from opc_ua_data_pipeline_spark.operators.multimodal import (
    decode_bmp_features,
    decode_wav_features,
)


def _bmp_2x2(rows_bottom_up):
    """rows_bottom_up: 2 stored rows of 6 pixel bytes each (BGR x 2)."""
    stride = 8  # (2*3 + 3)//4*4 — two pad bytes per row
    data = b"".join(bytes(r) + b"\x00\x00" for r in rows_bottom_up)
    assert len(data) == 2 * stride
    header = (
        b"BM"
        + struct.pack("<IHHI", 14 + 40 + len(data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(data), 0, 0, 0, 0)
    )
    return header + data


def test_bmp_decoder_flips_rows_and_skips_stride_padding(spark):
    # stored row 0 = image BOTTOM row, stored row 1 = image TOP row
    bottom = [10, 20, 30, 40, 50, 60]
    top = [200, 7, 8, 9, 11, 12]
    df = spark.createDataFrame(
        [(1, bytearray(_bmp_2x2([bottom, top])))], "doc_id long, payload binary"
    )
    r = decode_bmp_features(df).collect()[0]
    assert (r["width"], r["height"]) == (2, 2)
    assert r["top_left_b"] == 200  # first byte of the LAST stored row
    px = bottom + top  # pad bytes must NOT leak into the stats
    assert r["px_min"] == min(px) and r["px_max"] == max(px)
    assert r["px_mean"] == pytest.approx(sum(px) / len(px))


def test_bmp_decoder_rejects_non_bmp(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"GIF89a" + b"\x00" * 60))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a BMP|ValueError"):
        decode_bmp_features(df).collect()


def _wav(samples, rate):
    data = bytes(samples)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_wav_decoder_reads_rate_and_amplitude(spark):
    samples = [128, 128, 255, 0, 130, 126]  # peak = 128 (sample 0)
    df = spark.createDataFrame(
        [(7, bytearray(_wav(samples, 16000)))], "doc_id long, payload binary"
    )
    r = decode_wav_features(df).collect()[0]
    assert r["sample_rate"] == 16000
    assert r["n_samples"] == 6
    assert r["duration_sec"] == pytest.approx(6 / 16000)
    assert r["amp_peak"] == 128
    assert r["amp_mean"] == pytest.approx(sum(samples) / 6)


def test_png_roundtrip_all_filters(spark):
    """Encoder filters rows with type row%5; the decoder must undo
    Sub/Up/Average/Paeth chains exactly to reproduce the byte stats."""
    from opc_ua_data_pipeline_spark.operators.multimodal import (
        as_png,
        decode_png_features,
    )

    text = "".join(chr(33 + (i * 7) % 90) for i in range(48))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = decode_png_features(as_png(df)).collect()[0]
    raw = text.encode()
    assert (r["width"], r["height"]) == (8, 6)
    assert r["px_mean"] == pytest.approx(sum(raw) / 48)
    assert r["px_min"] == min(raw)
    assert r["px_max"] == max(raw)
    assert r["top_left"] == raw[0]
    assert r["bottom_right"] == raw[-1]


def test_png_decoder_verifies_crc(spark):
    from opc_ua_data_pipeline_spark.operators.multimodal import (
        as_png,
        decode_png_features,
    )

    df = spark.createDataFrame([(1, "x" * 48)], "doc_id long, text string")
    payload = bytearray(as_png(df).collect()[0]["payload"])
    # flip one bit inside the IDAT data region (after sig+IHDR chunk)
    payload[8 + 25 + 12] ^= 0x01
    bad = spark.createDataFrame(
        [(1, bytes(payload))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="bad CRC|CRC"):
        decode_png_features(bad).collect()


def test_png_decoder_rejects_non_png(spark):
    from opc_ua_data_pipeline_spark.operators.multimodal import (
        decode_png_features,
    )

    df = spark.createDataFrame(
        [(1, b"BM" + b"\x00" * 100)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a PNG"):
        decode_png_features(df).collect()
