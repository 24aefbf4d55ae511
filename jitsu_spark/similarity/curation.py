"""Embedding-cluster corpus curation (SemDeDup / cluster-balanced
sampling family).

Modern pretrain curation clusters the corpus in embedding space and
rebalances it — capping over-represented semantic clusters instead of
sampling uniformly. This module provides the two primitives:

- :func:`assign_clusters` — every vector's nearest coarse centroid
  (same deterministic sampled-centroid quantizer as ``ivf_topk``, so the
  assignment is oracle-checkable in pure SQL; swap in
  ``kmeans_centroids`` for tighter cells);
- :func:`cluster_balanced_sample` — keep at most ``cap`` vectors per
  cluster, chosen by a salted md5-uniform rank (deterministic across
  reruns/partitionings, unbiased within cluster).

Scale shape: assignment is a broadcast crossJoin against the ~sqrt(N)
centroid set with the JVM-side cosine fold (the standard IVF build
cost); the per-cluster cap is a window partitioned by cluster — with
sqrt(N) centroids each partition is ~sqrt(N) rows, so the sort
parallelizes across clusters and no reducer sees the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jitsu_spark.similarity.ann import cosine_expr


def assign_clusters(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    centroid_stride: int = 25,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(id, cluster, cluster_sim): each vector's nearest centroid by
    cosine (6dp-rounded before the argmax so float epsilons cannot flip
    assignment across engines; ties break on centroid id)."""
    if centroids is not None:
        cent = F.broadcast(centroids.select("_cent_id", "_cent_vec"))
    else:
        cent = F.broadcast(
            df.filter((F.col(id_col) % centroid_stride) == 0).select(
                F.col(id_col).alias("_cent_id"),
                F.col(vec_col).alias("_cent_vec"),
            )
        )
    sims = df.select(F.col(id_col), F.col(vec_col).alias("_v")).crossJoin(
        cent
    ).select(
        id_col,
        "_cent_id",
        F.round(cosine_expr(F.col("_v"), F.col("_cent_vec")), 6).alias("_cs"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("_cs"), F.asc("_cent_id"))
    return (
        sims.withColumn("_cr", F.row_number().over(w))
        .filter(F.col("_cr") == 1)
        .select(
            id_col,
            F.col("_cent_id").alias("cluster"),
            F.col("_cs").alias("cluster_sim"),
        )
    )


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    cap: int = 10,
    centroid_stride: int = 25,
    seed: int = 0,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Cap every cluster at ``cap`` members: rank each cluster's vectors
    by a salted md5 draw (then id) and keep rank <= cap. Returns
    (id, cluster, pick_rank) for the survivors — the rebalanced corpus.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    assigned = assign_clusters(df, id_col, vec_col, centroid_stride, centroids)
    pick = F.md5(
        F.concat_ws(
            "#", F.lit(f"cursample:{seed}"), F.col(id_col).cast("string")
        )
    )
    w = Window.partitionBy("cluster").orderBy(pick.asc(), F.col(id_col).asc())
    return (
        assigned.withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= cap)
        .select(id_col, "cluster", "pick_rank")
    )
