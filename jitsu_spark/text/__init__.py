from jitsu_spark.text.analysis import (
    bpe_ish_token_count,
    fingerprint_expr,
    langid_expr,
    quality_features,
    token_count_ws,
)

__all__ = [
    "quality_features",
    "langid_expr",
    "token_count_ws",
    "bpe_ish_token_count",
    "fingerprint_expr",
]
