from jitsu_spark.multimodal.binary import (
    MEDIA_SCHEMA,
    decode_features,
    frame_sample_offsets,
    synthetic_media_df,
)

__all__ = [
    "MEDIA_SCHEMA",
    "synthetic_media_df",
    "decode_features",
    "frame_sample_offsets",
]
