"""The text family's ONE whitespace tokenizer.

Every oracle in the tokens family (lm_score, tfidf_topterms, vocab_*,
chunk_documents, ...) mirrors this exact tokenization in SQL, so a
tokenization change must happen in ONE place or the family's Spark and
DuckDB sides drift apart silently.

Note: ``vocab.build_vocab`` intentionally does NOT use this helper — its
pinned oracle semantics tokenize without the non-empty-document filter
(an empty doc contributes one empty-string token to the frequency
table). Don't "unify" it without re-deriving that oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def non_empty(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rows whose text is non-NULL and non-empty."""
    return df.filter(F.col(text_col).isNotNull() & (F.col(text_col) != ""))


def split_tokens(text_col: str = "text") -> Column:
    """The token array of one document (single-space split)."""
    return F.split(F.col(text_col), " ")


def doc_tokens(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, token) for every token of every non-empty document — a
    zero-shuffle narrow explode."""
    return non_empty(df, text_col).select(
        F.col(id_col), F.explode(split_tokens(text_col)).alias("token")
    )
