"""Training-corpus selection: the end-to-end filter pipeline a pretrain
data build runs over a raw document table, composed from the engine's
own primitives (each independently oracle-exact):

    quality gate (length/structure) ∧ language gate (langid)
    ∧ exact-dedup keeper (md5 content hash, min-id wins)
    ∧ near-dup keeper (LSH → Jaccard → connected components, min-id wins)

Everything is anti-join / aggregation shaped: the exact-dup gate is a
hash aggregate on the content digest (never shuffles text), the near-dup
gate only touches the (tiny) clustered id set, and both attach back to
the corpus with joins on ids — broadcastable whenever the dup fraction
is small, which at 100 TB is the normal case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def select_training_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 16,
    languages: tuple[str, ...] = ("en",),
    min_jaccard: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Documents that survive every gate, with per-gate flags kept so the
    selection is auditable: (id, n_words, lang, is_exact_keeper,
    is_near_keeper, selected)."""
    from jitsu_spark.dedup import near_dup_components
    from jitsu_spark.text import langid_expr

    base = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.size(F.split(F.col(text_col), " ")).alias("n_words"),
        langid_expr(F.col(text_col)).alias("lang"),
    )

    # exact-dup keeper: min id per content hash
    exact_keep = (
        base.groupBy(F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_h"))
        .agg(F.min(id_col).alias("_keep_id"))
        .select("_keep_id")
    )
    base = base.join(
        exact_keep.withColumnRenamed("_keep_id", id_col).withColumn(
            "is_exact_keeper", F.lit(True)
        ),
        on=id_col,
        how="left",
    ).withColumn("is_exact_keeper", F.coalesce("is_exact_keeper", F.lit(False)))

    # near-dup keeper: docs in no cluster are trivially keepers
    clusters = near_dup_components(
        docs.select(id_col, text_col), id_col, text_col,
        min_jaccard=min_jaccard, shingle_n=shingle_n,
    ).select(id_col, F.col("is_keeper").alias("_near_keeper"))
    base = base.join(F.broadcast(clusters), on=id_col, how="left").withColumn(
        "is_near_keeper", F.coalesce("_near_keeper", F.lit(True))
    ).drop("_near_keeper")

    return base.select(
        id_col,
        "n_words",
        "lang",
        "is_exact_keeper",
        "is_near_keeper",
        (
            (F.col("n_words") >= min_words)
            & F.col("lang").isin(*languages)
            & F.col("is_exact_keeper")
            & F.col("is_near_keeper")
        ).alias("selected"),
    )


def select_top_k(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus head selection: the k documents with the highest quality
    rank, ordered by (mean word length x100 desc, n_words desc, id asc)
    — a deterministic total order (id breaks all ties).

    Scale shape: ``orderBy(...).limit(k)`` compiles to
    TakeOrderedAndProject — each partition keeps only its local top-k
    and the driver merges k-sized heaps, so NO global sort and no single
    fat partition; this is the scale-correct way to take a fixed-size
    head of a 100 TB corpus (contrast a global row_number window, which
    would serialize into one partition)."""
    from jitsu_spark.text.analysis import quality_features

    feats = quality_features(
        docs.select(id_col, text_col), text_col=text_col
    ).select(id_col, "n_words", "mean_word_len_x100")
    return feats.orderBy(
        F.col("mean_word_len_x100").desc(),
        F.col("n_words").desc(),
        F.col(id_col).asc(),
    ).limit(k)
