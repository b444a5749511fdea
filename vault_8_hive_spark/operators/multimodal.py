"""Multimodal columns: binary media payloads with typed metadata.

The pattern for image/audio/video at 100 TB (SURVEY.md §2B north-star):
media travels as an opaque `binary` column next to a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over `mapInPandas`, so the Spark-side
plumbing (schema, partitioning, batch shape) is identical whether the
codec is a real library or a stub.

This container has no image/audio libraries, so the codecs are
deterministic FAKES behind the same signatures (documented per function):
the fixture "media" format is 16 header bytes
  magic 'V8MM' | u16 width | u16 height | u16 channels | u16 fps | u32 n_frames
followed by a pseudo-random payload. A real deployment swaps `_decode_*`
for PIL/ffmpeg calls; nothing else changes.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd

from pyspark.sql import DataFrame

MAGIC = b"V8MM"
HEADER_FMT = ">4sHHHHI"
HEADER_LEN = struct.calcsize(HEADER_FMT)

META_SCHEMA = (
    "media_id bigint, kind string, width int, height int, channels int, "
    "fps int, n_frames int, payload_bytes bigint"
)
FEATURE_SCHEMA = "media_id bigint, feat_dim int, feat_head string"
THUMB_SCHEMA = "media_id bigint, width int, height int, thumb binary"
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame binary"


def encode_media(media_id: int, kind: str, width: int, height: int,
                 channels: int, fps: int, n_frames: int) -> bytes:
    """Deterministic fixture encoder (the fake wire format)."""
    payload = hashlib.sha256(f"{media_id}|{kind}".encode()).digest() * 4
    return struct.pack(HEADER_FMT, MAGIC, width, height, channels, fps, n_frames) + payload


def decode_header(blob: bytes) -> dict:
    """Header parse — REAL logic (this part is format-true, not a stub)."""
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


def _decode_pixels(blob: bytes):  # pragma: no cover - stub boundary
    """STUB: a real build decodes to an ndarray here (PIL/libav).

    Deliberately NotImplemented so nothing silently depends on fake pixel
    data; the fake feature path below derives features from the payload
    bytes instead.
    """
    raise NotImplementedError("pixel decode requires an image/av library")


def extract_features_batches(pdf_iter, dim: int = 16):
    """mapInPandas worker: media blob -> fake feature vector.

    The feature values are a deterministic hash expansion of the payload
    (STAND-IN for a real embedding model); the batch shape, schema, and
    partition behavior are exactly what a real extractor uses.
    """
    for pdf in pdf_iter:
        rows = []
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            b = bytes(blob)
            feats = [
                int.from_bytes(
                    hashlib.md5(b[HEADER_LEN:] + bytes([i])).digest()[:2], "big"
                )
                / 65535.0
                for i in range(dim)
            ]
            head = ",".join(f"{v:.4f}" for v in feats[:4])
            rows.append((int(mid), dim, head))
        yield pd.DataFrame(rows, columns=["media_id", "feat_dim", "feat_head"])


def resize_batches(pdf_iter, target_w: int = 64):
    """mapInPandas worker: 'resize' — recomputes header metadata and emits
    a (fake) thumbnail payload of proportional size. STUB pixels, real
    metadata arithmetic."""
    for pdf in pdf_iter:
        rows = []
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            h = decode_header(bytes(blob))
            if h["width"] <= 0:
                continue  # malformed record: skip, don't fail the task
            scale = target_w / h["width"]
            new_h = max(1, int(h["height"] * scale))
            thumb = struct.pack(
                HEADER_FMT, MAGIC, target_w, new_h, h["channels"], h["fps"], h["n_frames"]
            ) + hashlib.sha256(bytes(blob)).digest()
            rows.append((int(mid), target_w, new_h, bytearray(thumb)))
        yield pd.DataFrame(rows, columns=["media_id", "width", "height", "thumb"])


def sample_frames_batches(pdf_iter, every: int = 10):
    """mapInPandas worker: frame sampling — every Nth frame index with a
    deterministic fake frame payload (real impl: codec seek + decode)."""
    for pdf in pdf_iter:
        rows = []
        for mid, blob in zip(pdf["media_id"], pdf["blob"]):
            h = decode_header(bytes(blob))
            for idx in range(0, h["n_frames"], every):
                frame = hashlib.md5(bytes(blob[:HEADER_LEN]) + idx.to_bytes(4, "big")).digest()
                rows.append((int(mid), idx, bytearray(frame)))
        yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])


def decode_metadata(blobs: DataFrame) -> DataFrame:
    """(media_id, kind, blob) -> typed metadata table via mapInPandas."""

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
