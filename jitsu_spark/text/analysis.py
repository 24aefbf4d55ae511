"""Text-analysis operators for training-data pipelines.

All pure ``pyspark.sql.functions`` expressions — JVM-side, codegen-fused,
no Python in the data path. Each has an exact ANSI-SQL twin (registered in
__spark_entry__.oracle_sql) so the driver's DuckDB gate verifies it
value-for-value; that parity constraint is why the heuristics use only
engine-portable primitives (split/regexp/md5/case).

At 100 TB these are embarrassingly parallel narrow maps over the
``documents`` scan — no shuffle, column-pruned to ``text`` + id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# whitespace tokenization: split on single spaces (synthetic corpus is
# single-spaced; use \s+ variant for real corpora)
def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(col, " "))


# BPE-ish: words, numbers, and single punctuation marks each count as a
# token (a practical proxy for byte-pair-encoded length)
_BPE_RE = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def bpe_ish_token_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(_BPE_RE), 0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stamp quality-scoring features: word count, alpha-char count,
    punctuation count, mean word length (x100, integer — exact cross-engine
    arithmetic), and a short-doc flag."""
    t = F.col(text_col)
    n_words = token_count_ws(t)
    n_alpha = F.length(F.regexp_replace(t, "[^a-zA-Z]", ""))
    n_punct = F.length(F.regexp_replace(t, "[^.,;:!?]", ""))
    return (
        df.withColumn("n_words", n_words)
        .withColumn("n_alpha", n_alpha)
        .withColumn("n_punct", n_punct)
        .withColumn(
            "mean_word_len_x100",
            F.floor(F.lit(100) * n_alpha / n_words).cast("long"),
        )
        .withColumn("is_short", (n_words < F.lit(16)).cast("boolean"))
    )


# marker-word language ID: portable CASE heuristic (a real deployment
# would swap in a fastText-style model via a pandas UDF — the plumbing is
# identical, this keeps the oracle exact)
_MARKERS = [
    ("en", " the "),
    ("de", " der "),
    ("fr", " le "),
    ("es", " el "),
]


def langid_expr(col: Column) -> Column:
    padded = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    expr = F.lit("und")
    for lang, marker in reversed(_MARKERS):
        expr = F.when(padded.contains(marker), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint_expr(col: Column) -> Column:
    """Document fingerprint: the minimum md5 over whitespace tokens — a
    1-permutation MinHash. Two documents sharing their rarest-hash token
    collide; used as a cheap near-dup prefilter and as the base of the
    k-permutation MinHash in dedup/minhash.py."""
    return F.array_min(F.transform(F.split(col, " "), lambda w: F.md5(w)))
