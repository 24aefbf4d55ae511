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
from jitsu_spark.text.corpus import select_training_corpus  # noqa: E402
from jitsu_spark.text.packing import pack_tokens  # noqa: E402
__all__ += ["select_training_corpus", "pack_tokens"]
