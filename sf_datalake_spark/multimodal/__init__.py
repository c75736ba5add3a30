"""Multimodal (image/audio/video) column handling."""

from sf_datalake_spark.multimodal.assets import (
    ASSET_SCHEMA,
    AUDIO_FEATURE_SCHEMA,
    FRAME_SCHEMA,
    IMAGE_DECODED_SCHEMA,
    decode_images,
    image_phash,
    extract_audio_features,
    resize_images,
    sample_frames,
    with_asset_metadata,
)

__all__ = [
    "ASSET_SCHEMA",
    "AUDIO_FEATURE_SCHEMA",
    "FRAME_SCHEMA",
    "IMAGE_DECODED_SCHEMA",
    "decode_images",
    "image_phash",
    "extract_audio_features",
    "resize_images",
    "sample_frames",
    "with_asset_metadata",
]
