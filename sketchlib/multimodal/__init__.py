"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata, with Spark-side plumbing (schema, partitioning, Arrow batch
shape) fully real and the codec layer stubbed (no media libraries in
this environment)."""

from sketchlib.multimodal.media import (
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_media,
    extract_features,
    frame_sample,
    resize_images,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "decode_media",
    "extract_features",
    "resize_images",
    "frame_sample",
]
