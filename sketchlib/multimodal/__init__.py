"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata, with Spark-side plumbing (schema, partitioning, Arrow batch
shape) fully real and each real codec behind a module-load capability
probe (PIL for images, soundfile for audio, PyAV/ffmpeg for video —
deterministic fake decoders otherwise)."""

from sketchlib.multimodal.media import (
    MEDIA_SCHEMA,
    attach_fake_media,
    decode_audio,
    decode_media,
    decode_video_frames,
    extract_audio_features,
    extract_features,
    frame_sample,
    resize_images,
)

__all__ = [
    "MEDIA_SCHEMA",
    "attach_fake_media",
    "decode_audio",
    "decode_media",
    "decode_video_frames",
    "extract_audio_features",
    "extract_features",
    "resize_images",
    "frame_sample",
]
