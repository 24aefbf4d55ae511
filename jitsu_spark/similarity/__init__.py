from jitsu_spark.similarity.ann import (
    cosine_topk,
    cosine_topk_lsh,
    embedding_near_dups,
    ivf_topk,
    kmeans_centroids,
    nearest_centroid,
    sampled_centroids,
)

__all__ = [
    "cosine_topk",
    "cosine_topk_lsh",
    "embedding_near_dups",
    "ivf_topk",
    "kmeans_centroids",
    "nearest_centroid",
    "sampled_centroids",
]
