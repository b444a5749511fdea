"""Multimodal columns: binary media payloads with typed metadata.

The pattern for image/audio/video at 100 TB (SURVEY.md §2B north-star):
media travels as an opaque `binary` column next to a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over `mapInPandas`, so a partition's
blobs decode inside one Python worker pass with no per-row overhead.

The payloads are REAL bytes in real formats decodable with the stdlib
(no image/av library ships in this runtime):
  image  -> a PNG (operators/png.py — spec-true 8-bit RGB/RGBA codec)
  audio  -> a WAV (stdlib `wave`, 16-bit mono PCM)
  video  -> a toy MJPEG-style container: length-prefixed PNG frames
            (u32 frame length | PNG bytes, repeated n_frames times)
wrapped in the engine's 16-byte envelope
  magic 'V8MM' | u16 width | u16 height | u16 channels | u16 fps | u32 n_frames
so header-only metadata scans never touch the codec. Pixel/sample
content is a deterministic function of (media_id, frame, x, y, channel)
— which is what lets the VALUES oracles recompute features, thumbnails
and sampled frames INDEPENDENTLY of the PNG/WAV round trip (see
queries/composites.py): a codec bug breaks the hash.

A real deployment swaps png/wave for PIL/libav in the three `_payload_*`
builders and the decode sites; schemas, batching and partitioning do not
change. (Video as concatenated PNG frames is the honest stdlib stand-in
for a real container format — the frame-indexing arithmetic, not the
entropy coding, is what the engine owns.)"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import pandas as pd

from pyspark.sql import DataFrame

from .png import decode_png, encode_png, resize_nearest

MAGIC = b"V8MM"
HEADER_FMT = ">4sHHHHI"
HEADER_LEN = struct.calcsize(HEADER_FMT)

META_SCHEMA = (
    "media_id bigint, kind string, width int, height int, channels int, "
    "fps int, n_frames int, payload_bytes bigint"
)
FEATURE_SCHEMA = "media_id bigint, kind string, n_units bigint, sum_val bigint, peak int"
THUMB_SCHEMA = "media_id bigint, width int, height int, thumb binary, px_md5 string"
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame binary, px_md5 string"

THUMB_W = 8  # thumbnail target width (sources are 16-44 px wide)
FRAME_EVERY = 10  # sample every Nth video frame


def pixel_value(media_id: int, frame: int, x: int, y: int, ch: int) -> int:
    """Deterministic pixel content (the fixture's 'sensor')."""
    return (media_id * 31 + frame * 17 + y * 7 + x * 3 + ch * 11) % 256


def pixel_array(media_id: int, frame: int, w: int, h: int, c: int) -> bytes:
    return bytes(
        pixel_value(media_id, frame, x, y, ch)
        for y in range(h)
        for x in range(w)
        for ch in range(c)
    )


def sample_value(media_id: int, i: int) -> int:
    """Deterministic 16-bit PCM sample in [-32768, 32767]."""
    return ((media_id * 131 + i * 7919) % 65536) - 32768


def _payload_image(media_id: int, w: int, h: int, c: int) -> bytes:
    return encode_png(w, h, c, pixel_array(media_id, 0, w, h, c))


def _payload_audio(media_id: int, n_samples: int, rate: int) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            b"".join(
                struct.pack("<h", sample_value(media_id, i)) for i in range(n_samples)
            )
        )
    return buf.getvalue()


def _payload_video(media_id: int, w: int, h: int, c: int, n_frames: int) -> bytes:
    parts = []
    for f in range(n_frames):
        png = encode_png(w, h, c, pixel_array(media_id, f, w, h, c))
        parts.append(struct.pack(">I", len(png)) + png)
    return b"".join(parts)


def encode_media(media_id: int, kind: str, width: int, height: int,
                 channels: int, fps: int, n_frames: int) -> bytes:
    """Envelope + real payload (see module docstring for the formats)."""
    if kind == "image":
        payload = _payload_image(media_id, width, height, channels)
    elif kind == "audio":
        payload = _payload_audio(media_id, n_frames, fps)
    elif kind == "video":
        payload = _payload_video(media_id, width, height, channels, n_frames)
    else:
        raise ValueError(f"unknown media kind {kind!r}")
    return struct.pack(HEADER_FMT, MAGIC, width, height, channels, fps, n_frames) + payload


def decode_header(blob: bytes) -> dict:
    magic, w, h, c, fps, nf = struct.unpack(HEADER_FMT, blob[:HEADER_LEN])
    if magic != MAGIC:
        raise ValueError("not a V8MM media blob")
    return {
        "width": w,
        "height": h,
        "channels": c,
        "fps": fps,
        "n_frames": nf,
        "payload_bytes": len(blob) - HEADER_LEN,
    }


def _decode_audio(payload: bytes) -> list[int]:
    with wave.open(io.BytesIO(payload), "rb") as wf:
        raw = wf.readframes(wf.getnframes())
    return [s[0] for s in struct.iter_unpack("<h", raw)]


def _iter_video_frames(payload: bytes):
    """Yield (frame_idx, png_bytes) from the length-prefixed container."""
    pos, idx = 0, 0
    while pos < len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        yield idx, payload[pos + 4 : pos + 4 + ln]
        pos += 4 + ln
        idx += 1


def _first_frame_png(kind: str, payload: bytes) -> bytes:
    if kind == "image":
        return payload
    if kind == "video":
        return next(_iter_video_frames(payload))[1]
    raise ValueError(f"no pixel payload for kind {kind!r}")


def extract_features_batches(pdf_iter):
    """mapInPandas worker: media blob -> exact content statistics.

    Integer-exact on purpose (sums/peaks, no floats): the stats are
    reproducible bit-for-bit by the oracle's independent recompute from
    the content functions, so the driver hash checks the DECODE path.
      image/video: n_units = w*h*c samples of frame 0, sum/peak of bytes
      audio:       n_units = PCM sample count, sum/peak of |sample|
    """
    for pdf in pdf_iter:
        rows = []
        for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["blob"]):
            payload = bytes(blob)[HEADER_LEN:]
            if kind == "audio":
                samples = _decode_audio(payload)
                vals = [abs(s) for s in samples]
            else:
                _, _, _, px = decode_png(_first_frame_png(kind, payload))
                vals = list(px)
            rows.append((int(mid), kind, len(vals), sum(vals), max(vals)))
        yield pd.DataFrame(
            rows, columns=["media_id", "kind", "n_units", "sum_val", "peak"]
        )


def resize_batches(pdf_iter, target_w: int = THUMB_W):
    """mapInPandas worker: decode -> nearest-neighbor downsample ->
    re-encode PNG thumbnail. px_md5 is the md5 of the DECODED thumbnail
    pixels (thumb re-decoded after re-encode), proving the full
    decode->resize->encode->decode loop against the oracle's
    PNG-free recompute."""
    for pdf in pdf_iter:
        rows = []
        for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["blob"]):
            if kind == "audio":
                continue  # no pixels to resize
            payload = bytes(blob)[HEADER_LEN:]
            w, h, c, px = decode_png(_first_frame_png(kind, payload))
            new_h = max(1, h * target_w // w)
            small = resize_nearest(w, h, c, px, target_w, new_h)
            thumb = encode_png(target_w, new_h, c, small)
            back = decode_png(thumb)[3]
            rows.append(
                (int(mid), target_w, new_h, bytearray(thumb),
                 hashlib.md5(back).hexdigest())
            )
        yield pd.DataFrame(
            rows, columns=["media_id", "width", "height", "thumb", "px_md5"]
        )


def sample_frames_batches(pdf_iter, every: int = FRAME_EVERY):
    """mapInPandas worker: every Nth frame of the video container,
    decoded; px_md5 = md5 of the decoded frame pixels."""
    for pdf in pdf_iter:
        rows = []
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            payload = bytes(blob)[HEADER_LEN:]
            for idx, png in _iter_video_frames(payload):
                if idx % every:
                    continue
                px = decode_png(png)[3]
                rows.append(
                    (int(mid), idx, bytearray(png), hashlib.md5(px).hexdigest())
                )
        yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame", "px_md5"])


def decode_metadata(blobs: DataFrame) -> DataFrame:
    """(media_id, kind, blob) -> typed metadata table via mapInPandas
    (header-only — never touches the codec)."""

    def batches(pdf_iter):
        for pdf in pdf_iter:
            rows = []
            for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["blob"]):
                h = decode_header(bytes(blob))
                rows.append((int(mid), kind, h["width"], h["height"], h["channels"],
                             h["fps"], h["n_frames"], h["payload_bytes"]))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "channels",
                         "fps", "n_frames", "payload_bytes"],
            )

    return blobs.mapInPandas(batches, schema=META_SCHEMA)
