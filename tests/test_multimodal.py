"""Multimodal plumbing tests: schema, determinism, and the stub boundary."""

from __future__ import annotations

import pytest

from vault_8_hive_spark.operators.multimodal import _decode_pixels, decode_header, encode_media
from vault_8_hive_spark.queries import all_queries

QUERIES = all_queries()


def test_header_roundtrip():
    blob = encode_media(7, "video", 1920, 1080, 3, 25, 250)
    h = decode_header(blob)
    assert (h["width"], h["height"], h["channels"], h["fps"], h["n_frames"]) == (
        1920, 1080, 3, 25, 250,
    )
    with pytest.raises(ValueError):
        decode_header(b"XXXX" + blob[4:])


def test_pixel_decode_is_stubbed():
    """The stub boundary must be loud, not a silent fake."""
    with pytest.raises(NotImplementedError):
        _decode_pixels(encode_media(0, "image", 8, 8, 3, 0, 1))


def test_features_deterministic_and_shaped(spark, sf_dir):
    a = QUERIES["multimodal_features"].fn(spark, sf_dir).toPandas()
    b = QUERIES["multimodal_features"].fn(spark, sf_dir).toPandas()
    assert (a.sort_values("media_id").values == b.sort_values("media_id").values).all()
    assert (a["feat_dim"] == 16).all()


def test_resize_scales_metadata(spark, sf_dir):
    pdf = QUERIES["multimodal_resize"].fn(spark, sf_dir).toPandas()
    assert (pdf["width"] == 64).all()
    assert (pdf["height"] >= 1).all()


def test_frame_sampling_counts(spark, sf_dir):
    pdf = QUERIES["multimodal_frame_sample"].fn(spark, sf_dir).toPandas()
    # every video contributes ceil(n_frames/10) frames at indices 0,10,...
    assert (pdf["frame_idx"] % 10 == 0).all()
    assert pdf.groupby("media_id").size().min() >= 10  # >=100 frames / 10
