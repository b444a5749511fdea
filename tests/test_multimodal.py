"""Multimodal tests: the stdlib PNG/WAV codecs and the mapInPandas
pipeline over real media bytes.

The PNG decoder is validated against HAND-ASSEMBLED PNGs (chunks built
inline in the test, straight from the spec, NOT through encode_png) so
an encode/decode-symmetric bug cannot cancel out; the filter coverage
test then round-trips every filter type through the real encoder."""

from __future__ import annotations

import struct
import zlib

import pytest

from vault_8_hive_spark.operators.multimodal import (
    decode_header,
    encode_media,
    pixel_array,
    sample_value,
)
from vault_8_hive_spark.operators.png import decode_png, encode_png, resize_nearest
from vault_8_hive_spark.queries import all_queries

QUERIES = all_queries()


def _hand_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _hand_png(w: int, h: int, ctype: int, scanlines: bytes) -> bytes:
    """Assemble a PNG by hand from pre-filtered scanline bytes."""
    return (
        b"\x89PNG\r\n\x1a\n"
        + _hand_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + _hand_chunk(b"IDAT", zlib.compress(scanlines))
        + _hand_chunk(b"IEND", b"")
    )


def test_decode_hand_assembled_rgb():
    """2x2 RGB, filter 0 rows: pixel bytes must come back verbatim, in
    top-to-bottom row-major order."""
    px = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])
    blob = _hand_png(2, 2, 2, b"\x00" + px[:6] + b"\x00" + px[6:])
    assert decode_png(blob) == (2, 2, 3, px)


def test_decode_hand_assembled_filters():
    """Each non-trivial filter, hand-computed from the spec:
    row 0: Sub    — raw[i] = px[i] - px[i-bpp]
    row 1: Up     — raw[i] = px[i] - prev[i]
    row 2: Paeth  — raw[i] = px[i] - paeth(left, up, upleft)."""
    # 2 px wide, RGB, rows: (10,20,30),(13,24,35) / (1,2,3),(4,5,6) / (7,7,7),(8,8,8)
    r0 = bytes([10, 20, 30, 13, 24, 35])
    r1 = bytes([1, 2, 3, 4, 5, 6])
    r2 = bytes([7, 7, 7, 8, 8, 8])
    sub = bytes([10, 20, 30, (13 - 10) % 256, (24 - 20) % 256, (35 - 30) % 256])
    up = bytes((r1[i] - r0[i]) % 256 for i in range(6))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    pae = bytes(
        (r2[i] - paeth(r2[i - 3] if i >= 3 else 0, r1[i], r1[i - 3] if i >= 3 else 0))
        % 256
        for i in range(6)
    )
    blob = _hand_png(2, 3, 2, b"\x01" + sub + b"\x02" + up + b"\x04" + pae)
    assert decode_png(blob) == (2, 3, 3, r0 + r1 + r2)


def test_png_roundtrip_all_filters_rgb_rgba():
    """>=5 rows so the cycling encoder exercises every filter type."""
    for c in (3, 4):
        px = pixel_array(11, 0, 7, 6, c)
        out = decode_png(encode_png(7, 6, c, px))
        assert out == (7, 6, c, px)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    good = encode_png(2, 2, 3, bytes(12))
    bad = good[:40] + bytes([good[40] ^ 0xFF]) + good[41:]  # corrupt a byte
    with pytest.raises(ValueError):
        decode_png(bad)


def test_resize_nearest_indexing():
    """4x2 -> 2x1: NN must pick src (0,0) and (2,0) exactly."""
    w, h, c = 4, 2, 3
    px = bytes(range(w * h * c))
    small = resize_nearest(w, h, c, px, 2, 1)
    assert small == px[0:3] + px[6:9]


def test_header_roundtrip():
    blob = encode_media(7, "video", 20, 15, 3, 25, 12)
    h = decode_header(blob)
    assert (h["width"], h["height"], h["channels"], h["fps"], h["n_frames"]) == (
        20, 15, 3, 25, 12,
    )
    with pytest.raises(ValueError):
        decode_header(b"XXXX" + blob[4:])


def test_wav_payload_roundtrip():
    """The audio payload is a real WAV: stdlib wave must read back the
    exact PCM samples the content function defines."""
    import io
    import wave

    from vault_8_hive_spark.operators.multimodal import HEADER_LEN

    blob = encode_media(5, "audio", 16, 12, 1, 8000, 100)
    with wave.open(io.BytesIO(blob[HEADER_LEN:]), "rb") as wf:
        assert wf.getnchannels() == 1
        assert wf.getframerate() == 8000
        assert wf.getnframes() == 100
        raw = wf.readframes(100)
    samples = [s[0] for s in struct.iter_unpack("<h", raw)]
    assert samples == [sample_value(5, i) for i in range(100)]


def test_features_deterministic_and_shaped(spark, sf_dir):
    a = QUERIES["multimodal_features"].fn(spark, sf_dir).toPandas()
    b = QUERIES["multimodal_features"].fn(spark, sf_dir).toPandas()
    assert (a.sort_values("media_id").values == b.sort_values("media_id").values).all()
    assert (a["peak"] <= 32768).all() and (a["n_units"] > 0).all()


def test_resize_scales_metadata(spark, sf_dir):
    pdf = QUERIES["multimodal_resize"].fn(spark, sf_dir).toPandas()
    assert (pdf["width"] == 8).all()
    assert (pdf["height"] >= 1).all()
    # the emitted artifact is itself a decodable PNG of the stated size
    row = pdf.iloc[0]
    w, h, _, _ = decode_png(bytes.fromhex(row["thumb_hex"]))
    assert (w, h) == (row["width"], row["height"])


def test_frame_sampling_counts(spark, sf_dir):
    from vault_8_hive_spark.queries.multimodal import _fixture_specs

    pdf = QUERIES["multimodal_frame_sample"].fn(spark, sf_dir).toPandas()
    assert (pdf["frame_idx"] % 10 == 0).all()
    want = {
        mid: -(-nf // 10)  # ceil
        for (mid, kind, w, h, c, fps, nf) in _fixture_specs()
        if kind == "video"
    }
    got = pdf.groupby("media_id").size().to_dict()
    assert got == want
