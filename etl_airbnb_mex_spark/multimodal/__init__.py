"""Multimodal-column extension (north star §2.11): image/audio/video as
opaque binary columns with typed metadata."""

from .ops import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    make_fake_media,
    sample_frames,
    resize_images,
)

__all__ = [
    "MEDIA_SCHEMA",
    "decode_media",
    "extract_features",
    "make_fake_media",
    "sample_frames",
    "resize_images",
]
