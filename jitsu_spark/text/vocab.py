"""Frequency-vocabulary build + corpus encoding.

The first step of a token-pipeline: count every token across the corpus,
keep the ``vocab_size`` most frequent as the vocabulary (deterministic
tie-break: count desc, token asc), assign dense ids 0..V-1, then encode
every document as its id sequence with OOV → -1.

Scale shape:
- counting is explode → groupBy(token) with map-side partial combine —
  the count table is |distinct tokens|, not corpus-sized;
- vocabulary selection is ``orderBy(...).limit(V)`` =
  TakeOrderedAndProject (per-partition heaps, no global sort), and the
  id assignment runs a row_number window over the ALREADY-LIMITED V-row
  frame — the single-partition window touches V rows, never the corpus;
- encoding is a broadcast LEFT join of the exploded (doc, pos, token)
  stream against the V-row vocab, re-assembled per doc with an
  array_sort over collected (pos, id) structs. One shuffle, keyed by
  doc_id. V is bounded by construction (it is the model's embedding
  width), so the broadcast is always safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: id stamped on tokens outside the vocabulary
OOV_ID = -1


def build_vocab(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
) -> DataFrame:
    """(token, token_id, n_occurrences): the ``vocab_size`` most frequent
    whitespace tokens, ids dense 0..V-1 in (count desc, token asc) order."""
    counts = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n_occurrences"))
    )
    head = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("token").asc()
    ).limit(vocab_size)
    order = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return head.withColumn(
        "token_id", (F.row_number().over(order) - 1).cast("long")
    ).select("token", "token_id", "n_occurrences")


def encode_documents(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per document: ``n_tokens``, ``n_oov`` and ``token_ids`` (array of
    long, OOV as -1, in original token order)."""
    # NULL text = empty document (one empty token) — every id keeps a row
    toks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
        ).alias("pos", "token"),
    )
    joined = toks.join(
        F.broadcast(vocab.select("token", "token_id")), on="token", how="left"
    ).select(
        id_col,
        "pos",
        F.coalesce(F.col("token_id"), F.lit(OOV_ID)).alias("tid"),
    )
    return joined.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum((F.col("tid") == OOV_ID).cast("long")).cast("long").alias("n_oov"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))),
            lambda s: s["tid"],
        ).alias("token_ids"),
    )
