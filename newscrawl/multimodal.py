"""Multimodal column plumbing: opaque binary payloads + typed metadata.

For a 100 TB training-data pipeline, image/audio/video live as opaque
``binary`` columns beside typed metadata, processed by Arrow-batched
pandas UDFs over ``mapInPandas``. The image/audio codec libraries are
NOT in this container, so the decode kernels are stubbed — clearly
marked, raising NotImplementedError — while everything Spark-side
(schemas, batch shapes, partitioning, UDF signatures, deterministic
fallback features) is real and tested.

Deterministic fallback "features": byte length, sha256 prefix, and
hash-derived pseudo width/height — enough to exercise the full
distributed path (scan -> mapInPandas -> explode/aggregate) without a
codec.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string"
)

FEATURE_COLUMNS = (
    "n_bytes long, sha256_16 string, width int, height int, decode_ok boolean"
)


def decode_image(payload: bytes) -> "object":
    """STUB: real image decode requires PIL/cv2 (absent in this
    container). The Spark plumbing around it is real; swap this body
    for PIL.Image.open when the codec ships."""
    raise NotImplementedError("image codec not available in this environment")


def decode_audio(payload: bytes) -> "object":
    """STUB: see decode_image."""
    raise NotImplementedError("audio codec not available in this environment")


def _fallback_features(payload: bytes | None) -> tuple[int, str, int, int, bool]:
    if payload is None:
        return 0, "", 0, 0, False
    b = bytes(payload)
    sha = hashlib.sha256(b).hexdigest()
    # deterministic pseudo-dimensions from the content hash — a stand-in
    # with the same column types a real decoder would produce
    width = 64 + int(sha[:4], 16) % 1984
    height = 64 + int(sha[4:8], 16) % 1984
    return len(b), sha[:16], width, height, True


def extract_media_features(batch_iter: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
    """mapInPandas kernel: payload binary -> typed feature columns.

    Tries the real decoder per media_type; on NotImplementedError falls
    back to the deterministic feature extractor. Payload is dropped on
    output (same never-move-raw-bytes rule as html extraction).
    """
    for pdf in batch_iter:
        feats = []
        for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
            try:
                if mtype == "image":
                    decode_image(payload)
                elif mtype == "audio":
                    decode_audio(payload)
                feats.append(_fallback_features(payload))  # pragma: no cover
            except NotImplementedError:
                feats.append(_fallback_features(payload))
        out = pdf.drop(columns=["payload"]).reset_index(drop=True)
        out[["n_bytes", "sha256_16", "width", "height", "decode_ok"]] = feats
        yield out


def media_features(media: DataFrame) -> DataFrame:
    """media(media_id, payload, media_type) -> typed features, payload
    dropped before anything shuffles."""
    in_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in media.schema.fields
        if f.name != "payload"
    )
    return media.mapInPandas(
        extract_media_features, schema=f"{in_ddl}, {FEATURE_COLUMNS}"
    )


def with_resize_plan(feats: DataFrame, max_side: int = 256) -> DataFrame:
    """Append resize-planning columns (aspect-preserving, longest side
    clamped to ``max_side``, never upscaled) to an existing features
    frame — all JVM-side, no second decode pass."""
    w, h = F.col("width"), F.col("height")
    longest = F.greatest(w, h)
    scale = F.when(longest > max_side, F.lit(max_side) / longest).otherwise(
        F.lit(1.0)
    )
    return (
        feats.withColumn("target_width", F.floor(w * scale).cast("int"))
        .withColumn("target_height", F.floor(h * scale).cast("int"))
        .withColumn("needs_resize", scale < 1.0)
    )


def resize_specs(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize plumbing: compute each image's target dimensions
    (aspect-preserving, longest side clamped to ``max_side``, never
    upscaled) from the decoded/fallback width/height — all JVM-side.
    The actual pixel resample belongs in the stubbed decode kernel;
    this is the planning half a real pipeline runs first so it can
    skip no-op resizes and size its output buffers."""
    return with_resize_plan(media_features(media), max_side).select(
        "media_id",
        "media_type",
        "width",
        "height",
        "target_width",
        "target_height",
        "needs_resize",
    )


# url extension -> media_type for the wave-level media path; anything
# else is an opaque page snapshot (still feature-extracted — the binary
# plumbing is type-agnostic by design)
_EXT_TYPES = (
    (r"\.(jpe?g|png|gif|webp)$", "image"),
    (r"\.(mp3|wav|ogg|flac)$", "audio"),
    (r"\.(mp4|webm|mkv|avi)$", "video"),
)


def media_type_from_url(url_col) -> "F.Column":
    expr = F.lit("page")
    for pat, mtype in reversed(_EXT_TYPES):
        expr = F.when(F.lower(url_col).rlike(pat), F.lit(mtype)).otherwise(expr)
    return expr


def page_media_features(
    fetched: DataFrame, max_side: int = 256
) -> DataFrame:
    """Wave-level multimodal path: treat each fetched page's raw bytes
    as an opaque media payload -> typed features + resize plan, one
    Arrow kernel pass, payload dropped before anything shuffles (the
    same never-move-raw-bytes rule as html extraction). Input needs
    (url, html); output is MEDIA_FEATURES minus wave_id."""
    media = fetched.select(
        "url",
        F.xxhash64("url").alias("media_id"),
        media_type_from_url(F.col("url")).alias("media_type"),
        F.col("html").alias("payload"),
    )
    return with_resize_plan(media_features(media), max_side)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emit one row per sampled frame
    index (real frame decode is the stubbed kernel). Shows the
    explode-shaped output a frame sampler produces, with deterministic
    frame counts derived from payload size."""
    feats = media_features(media)
    n_frames = (F.col("n_bytes") / 1024).cast("int") + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return feats.select(
        "media_id", "media_type", F.explode(idx).alias("frame_idx")
    )
