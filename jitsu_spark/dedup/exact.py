"""Exact deduplication: hash-groupBy keep-first.

Scale notes: the groupBy on the content hash is a hash aggregate with
map-side partial combine; duplicate-heavy corpora collapse before the
shuffle. ``min(id)`` keeps the canonical representative deterministically
(no ``first()`` nondeterminism). At 100 TB prefer hashing the text once
(md5 column) and aggregating the 32-byte digest, never shuffling the
full text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(
    df: DataFrame,
    content_cols: list[str],
    id_col: str,
    keep_content: bool = False,
) -> DataFrame:
    """One row per distinct content; keeps the minimum ``id_col`` as the
    canonical representative and counts the duplicates collapsed."""
    h = F.md5(
        F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in content_cols]
        )
    ).alias("content_hash")
    aggs = [
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("n_dups"),
    ]
    if keep_content:
        aggs.append(F.min_by(F.struct(*content_cols), F.col(id_col)).alias("_c"))
    out = df.select(h, id_col, *content_cols).groupBy("content_hash").agg(*aggs)
    if keep_content:
        out = out.select("content_hash", "keep_id", "n_dups", "_c.*")
    return out
