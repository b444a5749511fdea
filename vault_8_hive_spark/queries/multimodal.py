"""Multimodal-column queries over REAL media bytes: the fixture corpus
carries actual PNGs (operators/png.py, stdlib codec), WAVs (stdlib
`wave`) and PNG-frame video containers; metadata decode, feature
extraction, resize and frame sampling all run real decodes, and every
query is hash-checked against a VALUES oracle recomputed independently
of the codec round trip (from the deterministic content functions).
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
    """(media_id, kind, w, h, channels, fps, n_frames) per media.

    Dimensions are small (16-44 px) so the pure-Python codec stays fast
    at fixture scale; channels alternate RGB/RGBA so both PNG color
    types are exercised. For audio, fps = sample rate and n_frames =
    PCM sample count; for video, n_frames = container frame count."""
    specs = []
    for i in range(n):
        kind = _KINDS[i % 3]
        w = 16 + (i % 8) * 4
        h = 12 + (i % 8) * 3
        channels = 1 if kind == "audio" else 3 + (i % 6) // 3
        fps = 0 if kind == "image" else (8000 if kind == "audio" else 25)
        if kind == "image":
            n_frames = 1
        elif kind == "audio":
            n_frames = 800 + (i % 5) * 400
        else:
            n_frames = 12 + (i % 5) * 6
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


# --- independent expected values (content functions only, NO codec) ---------
#
# Every helper below recomputes what the mapInPandas workers must produce
# WITHOUT touching png/wave decode or resize_nearest: a bug anywhere in
# the codec round trip (encode, decode, any of the five PNG filters,
# the NN index arithmetic, the frame container framing) surfaces as a
# driver hash mismatch instead of cancelling out.


def _expected_features() -> list[tuple]:
    from ..operators.multimodal import pixel_array, sample_value

    rows = []
    for (mid, kind, w, h, c, fps, nf) in _fixture_specs():
        if kind == "audio":
            vals = [abs(sample_value(mid, i)) for i in range(nf)]
        else:
            vals = list(pixel_array(mid, 0, w, h, c))
        rows.append((mid, kind, len(vals), sum(vals), max(vals)))
    return rows


def _expected_thumbs() -> list[tuple]:
    import hashlib

    from ..operators.multimodal import THUMB_W, pixel_value
    from ..operators.png import encode_png

    rows = []
    for (mid, kind, w, h, c, fps, nf) in _fixture_specs():
        if kind == "audio":
            continue
        new_h = max(1, h * THUMB_W // w)
        # NN downsample straight from the content function (no decode,
        # no resize_nearest): dst (x, y) reads src (x*w//W, y*h//H).
        small = bytes(
            pixel_value(mid, 0, x * w // THUMB_W, y * h // new_h, ch)
            for y in range(new_h)
            for x in range(THUMB_W)
            for ch in range(c)
        )
        # thumb bytes: the one column recomputed THROUGH the encoder —
        # pins byte-level determinism of the emitted artifact (px_md5
        # above is the codec-independent correctness check).
        thumb_hex = encode_png(THUMB_W, new_h, c, small).hex()
        rows.append((mid, THUMB_W, new_h, thumb_hex, hashlib.md5(small).hexdigest()))
    return rows


def _expected_frames() -> list[tuple]:
    import hashlib

    from ..operators.multimodal import FRAME_EVERY, pixel_array

    rows = []
    for (mid, kind, w, h, c, fps, nf) in _fixture_specs():
        if kind != "video":
            continue
        for idx in range(0, nf, FRAME_EVERY):
            px = pixel_array(mid, idx, w, h, c)
            rows.append((mid, idx, hashlib.md5(px).hexdigest()))
    return rows


def _values_sql(rows: list[tuple], cols: list[tuple[str, str]]) -> str:
    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    body = ",\n".join("(" + ", ".join(lit(x) for x in r) + ")" for r in rows)
    sel = ", ".join(f"CAST({n} AS {t}) AS {n}" for n, t in cols)
    names = ", ".join(n for n, _ in cols)
    return f"SELECT {sel} FROM (VALUES\n{body}\n) AS t({names})"


@register(
    "multimodal_features",
    oracle=_values_sql(
        _expected_features(),
        [("media_id", "BIGINT"), ("kind", "VARCHAR"), ("n_units", "BIGINT"),
         ("sum_val", "BIGINT"), ("peak", "INTEGER")],
    ),
    tags=("multimodal", "udf"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content statistics over decoded media (PNG pixels / PCM
    samples) — integer sums/peaks so the codec-independent VALUES oracle
    hash-checks the real decode path end-to-end."""
    prep(spark)
    return media_corpus(spark).mapInPandas(extract_features_batches, schema=FEATURE_SCHEMA)


@register(
    "multimodal_resize",
    oracle=_values_sql(
        _expected_thumbs(),
        [("media_id", "BIGINT"), ("width", "INTEGER"), ("height", "INTEGER"),
         ("thumb_hex", "VARCHAR"), ("px_md5", "VARCHAR")],
    ),
    tags=("multimodal", "udf"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real thumbnailing: PNG decode -> nearest-neighbor downsample ->
    PNG re-encode. px_md5 (decoded-thumb pixels) is checked against a
    codec-free recompute; thumb_hex pins the emitted artifact bytes."""
    prep(spark)
    thumbs = media_corpus(spark).where(F.col("kind") != "audio").mapInPandas(
        resize_batches, schema=THUMB_SCHEMA
    )
    return thumbs.select(
        "media_id", "width", "height",
        F.lower(F.hex("thumb")).alias("thumb_hex"), "px_md5",
    )


@register(
    "multimodal_frame_sample",
    oracle=_values_sql(
        _expected_frames(),
        [("media_id", "BIGINT"), ("frame_idx", "INTEGER"), ("px_md5", "VARCHAR")],
    ),
    tags=("multimodal", "udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-10th-frame sampling of the video containers, each sampled
    frame PNG-decoded; px_md5 checked against the content function."""
    prep(spark)
    videos = media_corpus(spark).where(F.col("kind") == "video")
    frames = videos.mapInPandas(sample_frames_batches, schema=FRAME_SCHEMA)
    return frames.select("media_id", "frame_idx", "px_md5")
