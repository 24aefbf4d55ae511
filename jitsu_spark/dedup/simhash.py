"""SimHash near-duplicate fingerprinting.

16-bit SimHash over whitespace tokens: each token hashes to 16 bits (the
first 4 hex chars of its md5); per bit, tokens vote +1/-1 weighted by
multiplicity; the fingerprint sets bit i when the vote is positive.
Near-duplicates differ in few bits (compare with ``bit_count(a ^ b)``).

Physical plan: explode tokens -> hash agg by doc id with 16 conditional
sums. The partial combine collapses each document's votes map-side, so
the shuffle carries one 16-int row per (doc, map task) — scale-safe for
long documents. md5-based bit derivation keeps the DuckDB oracle exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS = 16


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Returns (id_col, simhash long)."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("_w")
    )
    # token hash value: first 4 hex chars of md5 -> int (16 bits)
    hv = F.conv(F.substring(F.md5(F.col("_w")), 1, 4), 16, 10).cast("long")
    toks = toks.withColumn("_hv", hv)
    votes = [
        F.sum(
            F.when(F.floor(F.col("_hv") / (1 << b)) % 2 == 1, F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"v{b}")
        for b in range(BITS)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fingerprint = None
    for b in range(BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fingerprint = bit if fingerprint is None else fingerprint + bit
    return agg.select(F.col(id_col), fingerprint.cast("long").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Pairs of documents whose SimHashes differ in <= max_hamming bits.
    Joins on the fingerprint's high byte first (blocking) to avoid the
    full cross join, then filters by exact Hamming distance."""
    sh = simhash(df, id_col, text_col).withColumn(
        "_blk", F.floor(F.col("simhash") / (1 << (BITS // 2)))
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn(
            "hamming",
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "hamming",
        )
    )
