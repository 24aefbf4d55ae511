"""Deterministic corpus sharding — the final step of a training-data
build: deal documents (or packed sequences) into N shard files in a
reproducible pseudo-random order, so dataloader workers stream disjoint,
well-mixed shards.

Assignment: shard = md5-uniform bucket over the id (same construction as
text/mixing.py — no RNG, stable under repartitioning); within-shard
order: rank by a SECOND, independent md5 draw. Both are pure column
expressions, so a rerun, a resume, or a different cluster produce the
identical shard layout and the DuckDB oracle replays it exactly.

Scale shape: the shard assignment is a narrow projection; the
within-shard ordering is a window PARTITIONED BY shard — N_shards
partitions of ~equal size (the md5 draw is uniform), so the sort
parallelizes across shards and no partition exceeds corpus/N. For
shard-file output, ``repartition(shard)`` + ``sortWithinPartitions``
writes each shard as one ordered file — one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from jitsu_spark.text.mixing import _uniform


def shard_corpus(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos_in_shard",
) -> DataFrame:
    """Stamp ``shard`` (0..n_shards-1) and the document's 0-based
    ``pos_in_shard`` in the shard's deterministic shuffle order."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if "_oh" in df.columns:
        raise ValueError("input already has a column named '_oh' (engine-internal)")
    u_shard = _uniform(id_col, seed, salt="shard:")
    # independent salted draw for the within-shard order — a distinct
    # hash stream from the shard assignment and from mixture/split
    order_h = F.md5(
        F.concat_ws(
            "#", F.lit(f"shardord:{seed}"), F.col(id_col).cast("string")
        )
    )
    shard = F.floor(u_shard * n_shards).cast("int")
    # u in [0,1) makes floor(u*n) land in 0..n-1 always
    out = df.withColumn(shard_col, shard).withColumn("_oh", order_h)
    w = Window.partitionBy(shard_col).orderBy(F.col("_oh").asc(), F.col(id_col).asc())
    return out.withColumn(
        pos_col, (F.row_number().over(w) - 1).cast("long")
    ).drop("_oh")
