"""Multimodal-column queries: deterministic media fixture corpus ->
metadata decode (oracle-checked), feature extraction, resize, frame
sampling (rows-only: fake codecs, real Spark plumbing — see
operators/multimodal.py for the stub boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StringType, StructField, StructType

from ..operators.multimodal import (
    decode_metadata,
    encode_media,
    extract_features_batches,
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    resize_batches,
    sample_frames_batches,
    THUMB_SCHEMA,
)
from ..session import prep
from . import register

_KINDS = ("image", "audio", "video")


def _fixture_specs(n: int = 120) -> list[tuple]:
    specs = []
    for i in range(n):
        kind = _KINDS[i % 3]
        w = 320 + (i % 8) * 160
        h = 240 + (i % 8) * 120
        channels = 3 if kind != "audio" else 1
        fps = 0 if kind == "image" else 25
        n_frames = 1 if kind == "image" else 100 + (i % 5) * 50
        specs.append((i, kind, w, h, channels, fps, n_frames))
    return specs


def media_corpus(spark: SparkSession) -> DataFrame:
    rows = [
        (mid, kind, bytearray(encode_media(mid, kind, w, h, c, fps, nf)))
        for (mid, kind, w, h, c, fps, nf) in _fixture_specs()
    ]
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("blob", BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


_META_VALUES = ", ".join(
    f"({mid}, '{kind}', {w}, {h}, {c}, {fps}, {nf})"
    for (mid, kind, w, h, c, fps, nf) in _fixture_specs()
)


@register(
    "multimodal_metadata",
    oracle=f"""
SELECT kind, width, COUNT(*) AS n_media,
       CAST(SUM(n_frames) AS BIGINT) AS total_frames
FROM (VALUES {_META_VALUES}) AS t(media_id, kind, width, height, channels, fps, n_frames)
GROUP BY kind, width
""",
    tags=("multimodal", "udf"),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media corpus -> header decode (real format logic) -> typed
    metadata rollup. Oracle = the encoder's spec table."""
    prep(spark)
    meta = decode_metadata(media_corpus(spark))
    return meta.groupBy("kind", "width").agg(
        F.count(F.lit(1)).alias("n_media"), F.sum("n_frames").alias("total_frames")
    )


@register(
    "multimodal_features",
    oracle=None,  # fake feature values — plumbing checked in tests
    tags=("multimodal", "udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over media blobs (stubbed embedding — see
    operators/multimodal.py)."""
    prep(spark)
    return media_corpus(spark).mapInPandas(extract_features_batches, schema=FEATURE_SCHEMA)


@register(
    "multimodal_resize",
    oracle=None,
    tags=("multimodal", "udf"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail 'resize': metadata arithmetic real, pixels stubbed."""
    prep(spark)
    return media_corpus(spark).mapInPandas(resize_batches, schema=THUMB_SCHEMA)


@register(
    "multimodal_frame_sample",
    oracle=None,
    tags=("multimodal", "udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-10th-frame sampling of the video fixtures (one output row per
    sampled frame)."""
    prep(spark)
    videos = media_corpus(spark).where(F.col("kind") == "video")
    return videos.mapInPandas(sample_frames_batches, schema=FRAME_SCHEMA)
