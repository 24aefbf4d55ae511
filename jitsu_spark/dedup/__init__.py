from jitsu_spark.dedup.clusters import connected_components, near_dup_components
from jitsu_spark.dedup.exact import exact_dedup
from jitsu_spark.dedup.minhash import (
    lsh_candidate_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
)
from jitsu_spark.dedup.simhash import simhash

__all__ = [
    "exact_dedup",
    "minhash_signature",
    "lsh_candidate_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "connected_components",
    "near_dup_components",
]
