"""Repetition-based quality signals (Gopher-rule family).

Published pretrain filters (Gopher/MassiveText, RefinedWeb) reject
documents dominated by repeated content: the fraction of duplicate
words, the share claimed by the single most frequent word, and the same
for word bigrams. This computes those signals per document.

Scale shape: ONE explode of tagged tokens (each word as ``w\\x00tok``,
each bigram as ``b\\x00tok``) → count per (doc, token) → conditional
re-aggregate per doc. Two shuffles, both keyed by doc_id(+token), both
map-side-combining — no per-doc quadratic work, so a 10^5-word document
costs O(words), not O(words²). Bigrams are built array-side with
``zip_with`` over two slices (no second explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tag separator that cannot appear in whitespace-split tokens
_SEP = "\x00"


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition features:

    - ``n_words`` / ``n_distinct_words``
    - ``dup_word_frac``   = 1 - distinct/total (0 when every word unique)
    - ``top_word_frac``   = max word multiplicity / total words
    - ``top_bigram_frac`` = max bigram multiplicity / (n_words - 1)
      (0.0 for single-word documents)

    Fractions are exact integer ratios evaluated in double and rounded
    to 6 places — cross-engine-stable because both operands are exact
    int64 counts.
    """
    # NULL text = empty document (one empty token): the doc still gets a
    # stats row instead of vanishing from the groupBy output
    w = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    bigrams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    tagged = F.concat(
        F.transform(w, lambda x: F.concat(F.lit("w" + _SEP), x)),
        F.transform(bigrams, lambda x: F.concat(F.lit("b" + _SEP), x)),
    )
    tokens = df.select(F.col(id_col), F.explode(tagged).alias("_tt"))
    per_token = tokens.groupBy(id_col, "_tt").agg(F.count("*").alias("_c"))
    is_w = F.col("_tt").startswith("w" + _SEP)
    agg = per_token.groupBy(id_col).agg(
        F.sum(F.when(is_w, F.col("_c"))).cast("long").alias("n_words"),
        F.count(F.when(is_w, F.lit(1))).cast("long").alias("n_distinct_words"),
        F.max(F.when(is_w, F.col("_c"))).cast("long").alias("_topw"),
        F.coalesce(F.max(F.when(~is_w, F.col("_c"))), F.lit(0))
        .cast("long")
        .alias("_topb"),
    )
    n = F.col("n_words").cast("double")
    return agg.select(
        id_col,
        "n_words",
        "n_distinct_words",
        F.round(F.lit(1.0) - F.col("n_distinct_words") / n, 6).alias(
            "dup_word_frac"
        ),
        F.round(F.col("_topw") / n, 6).alias("top_word_frac"),
        F.when(F.col("n_words") > 1, F.round(F.col("_topb") / (n - 1), 6))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def create_features_table(spark, root, key_field: str = "doc_id",
                          key_type=None, n_buckets: int = 16):
    """The per-document repetition-feature MIRROR: one row per live doc,
    maintained O(change) from ``changes()`` by ``sync_repetition_features``
    (the third IVM shape next to per-corpus aggregates and derived rows —
    a 1->1 per-doc feature projection keyed by the doc itself, so the
    pre-image row retracts and the post-image row asserts; a deleted doc's
    feature row disappears because it exists only in the pre-image)."""
    from pyspark.sql import types as T

    from jitsu_spark.lake.table import LakeTable

    return LakeTable.create(
        spark,
        root,
        T.StructType(
            [
                T.StructField(key_field, key_type or T.LongType()),
                T.StructField("n_words", T.LongType()),
                T.StructField("n_distinct_words", T.LongType()),
                T.StructField("dup_word_frac", T.DoubleType()),
                T.StructField("top_word_frac", T.DoubleType()),
                T.StructField("top_bigram_frac", T.DoubleType()),
            ]
        ),
        key_field,
        n_buckets=n_buckets,
        properties={"write.mode": "mor"},
    )


def sync_repetition_features(src, table, text_col: str = "text",
                             job_id: str = "rep-features", images=None):
    """Advance the feature mirror to the upstream's current version —
    invariant: ``table == repetition_signals(full upstream)``. Share
    ``images`` (lake/mirror.WindowImages) with the other views of the
    same upstream."""
    from jitsu_spark.lake.mirror import sync_derived_rows

    key = src.snapshot().key_field

    def derive(docs: DataFrame) -> DataFrame:
        return repetition_signals(
            docs.select(key, text_col), id_col=key, text_col=text_col
        )

    return sync_derived_rows(src, table, derive, job_id=job_id, images=images)
