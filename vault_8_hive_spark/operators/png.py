"""Pure-stdlib PNG codec (zlib + struct): 8-bit RGB / RGBA, non-interlaced.

This is the engine's REAL pixel boundary — no image library exists in the
runtime, so the subset of PNG a training-data pipeline actually stores
(8-bit truecolor, with/without alpha) is implemented against the spec
(RFC 2083 / W3C PNG): chunk framing with CRC-32, IHDR, zlib-compressed
IDAT scanlines, all five row filters (None/Sub/Up/Average/Paeth) on both
encode and decode. Interlace, palettes, 16-bit depth and grayscale are
out of scope and rejected loudly.

The encoder deliberately CYCLES the filter type per row: every decode of
an engine-encoded image exercises all five unfilter paths, so a filter
bug cannot hide behind filter-0-only fixtures (tests/test_multimodal.py
additionally decodes hand-assembled PNGs written against the spec, not
through this encoder)."""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (only 8-bit truecolor variants)
_CHANNELS = {2: 3, 6: 4}
_COLOR_TYPE = {3: 2, 4: 6}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(ftype: int, row: bytes, prev: bytes, bpp: int) -> bytes:
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        else:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, row: bytearray, prev: bytes, bpp: int) -> bytearray:
    if ftype not in (0, 1, 2, 3, 4):
        raise ValueError(f"bad PNG filter type {ftype}")
    for i in range(len(row)):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            row[i] = (row[i] + a) & 0xFF
        elif ftype == 2:
            row[i] = (row[i] + b) & 0xFF
        elif ftype == 3:
            row[i] = (row[i] + (a + b) // 2) & 0xFF
        elif ftype == 4:
            row[i] = (row[i] + _paeth(a, b, c)) & 0xFF
    return row


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """pixels = row-major top-to-bottom, `channels` bytes per pixel
    (3=RGB, 4=RGBA)."""
    if channels not in _COLOR_TYPE:
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0)
    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = bytes(pixels[y * stride : (y + 1) * stride])
        ftype = y % 5  # cycle all five filters — see module docstring
        raw.append(ftype)
        raw += _filter_row(ftype, row, prev, channels)
        prev = row
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(blob: bytes) -> tuple[int, int, int, bytes]:
    """-> (width, height, channels, row-major pixel bytes)."""
    if blob[:8] != _SIG:
        raise ValueError("not a PNG")
    pos, width = 8, None
    height = channels = 0
    idat = bytearray()
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        body = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", blob[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in _CHANNELS:
                raise ValueError(f"unsupported PNG (depth={depth}, color={ctype})")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG scanline data has wrong length")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        off = y * (1 + stride)
        row = _unfilter_row(raw[off], bytearray(raw[off + 1 : off + 1 + stride]), prev, channels)
        out += row
        prev = bytes(row)
    return width, height, channels, bytes(out)


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor downsample (deterministic integer source mapping:
    src = floor(dst * src_dim / dst_dim))."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = y * height // new_h
        for x in range(new_w):
            sx = x * width // new_w
            s = (sy * width + sx) * channels
            d = (y * new_w + x) * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)
