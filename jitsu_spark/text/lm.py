"""Bigram language-model scoring for corpus quality filtering.

CCNet-style perplexity gating re-expressed in Spark: train an add-one-
smoothed bigram model ON the corpus itself (or any reference corpus) and
score every document by its total/average negative log-likelihood —
documents whose word sequences are improbable under the corpus model
(gibberish, boilerplate soup, wrong-language residue) score high and get
filtered. Public construction throughout (count tables + Laplace
smoothing); no external model artifacts.

Reference parity: jitsu's functions layer exposes per-event scoring
hooks (reference: javascript-functions/src/lib.ts style UDF stages); the
corpus-level LM gate is the tokens-pipeline analogue — a trainable
quality signal computed entirely inside the engine.

Scale shape:
- model "training" is two partial-combinable aggregates: bigram counts
  (|distinct bigrams| rows) and unigram-context counts (|vocab| rows) —
  never corpus-sized state on any single node;
- scoring joins each document's exploded bigrams to the count tables on
  their natural keys (shuffle joins on (prev, cur) / prev — AQE sizes
  and broadcast-converts them when the model is small); bigram
  extraction is a zero-shuffle ``arrays_zip(slice, slice)`` projection,
  no self-join, no window;
- determinism across engines: the ONLY floating-point step is the
  per-bigram ``round(-ln(p) * 1e8)`` -> BIGINT; every aggregate after
  that is exact integer arithmetic, so results are order-insensitive
  and hash-stable (the gate lesson behind the repo's
  floats-through-integers rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jitsu_spark.text.tokenize import doc_tokens as _tokens
from jitsu_spark.text.tokenize import non_empty, split_tokens


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, prev, cur) for consecutive token pairs; docs with < 2 tokens
    contribute nothing. arrays_zip of two shifted slices — a narrow
    projection, no join/window."""
    w = split_tokens(text_col)
    n = F.size(w)
    pairs = F.arrays_zip(
        F.slice(w, 1, n - 1).alias("prev"), F.slice(w, 2, n - 1).alias("cur")
    )
    return (
        non_empty(df, text_col)
        .filter(n >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("_p"))
        .select(id_col, F.col("_p.prev").alias("prev"), F.col("_p.cur").alias("cur"))
    )


def bigram_model(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(bigram counts, context counts, 1-row vocab size) trained on the
    corpus. Counts are exact longs; the vocab size V feeds Laplace
    smoothing ``P(cur|prev) = (c2 + 1) / (c1 + V)``."""
    bg = _bigrams(corpus, id_col, text_col)
    c2 = bg.groupBy("prev", "cur").agg(F.count("*").cast("long").alias("c2"))
    # context counts roll up from the already-reduced bigram frame
    # (|distinct bigrams| rows), not the corpus-sized bigram stream —
    # one less full-corpus shuffle
    c1 = c2.groupBy("prev").agg(F.sum("c2").cast("long").alias("c1"))
    v = (
        _tokens(corpus, id_col, text_col)
        .agg(F.countDistinct("token").cast("long").alias("v"))
    )
    return c2, c1, v


def score_documents(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per document: ``n_bigrams``, ``sum_nll_e8`` (total add-one-smoothed
    bigram negative log-likelihood in 1e-8 units, exact BIGINT) and the
    convenience ``avg_nll`` double. Docs with < 2 tokens keep a row with
    n_bigrams = 0 / sum_nll_e8 = 0 / avg_nll NULL. A context never seen
    in training backs off to c1 = 0 (pure (c2+1)/V mass).

    The float -> integer boundary is per DISTINCT (c2, c1) pair, before
    any aggregation: ``CAST(round(-ln(p) * 1e8, 0) AS BIGINT)``. nll is
    always >= 0 (c2 <= c1 and V >= 1 imply p <= 1), values stay under
    ~2^35, and all downstream sums are exact integer arithmetic —
    order-insensitive and engine-portable.
    """
    c2, c1, v = model
    bg = _bigrams(docs, id_col, text_col)
    scored = (
        bg.join(c2, on=["prev", "cur"], how="left")
        .join(c1, on="prev", how="left")
        .crossJoin(F.broadcast(v))
        .select(
            F.col(id_col),
            F.round(
                -F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                )
                * F.lit(100000000.0),
                0,
            )
            .cast("long")
            .alias("nll_e8"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("nll_e8").cast("long").alias("sum_nll_e8"),
    )
    return (
        docs.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.coalesce(F.col("sum_nll_e8"), F.lit(0)).cast("long").alias(
                "sum_nll_e8"
            ),
            F.when(
                F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
                F.round(
                    F.col("sum_nll_e8")
                    / (F.col("n_bigrams") * F.lit(100000000.0)),
                    4,
                ),
            ).alias("avg_nll"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    max_avg_nll: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_bigrams: int = 1,
) -> DataFrame:
    """Documents whose average bigram NLL is at most ``max_avg_nll``
    (and that have at least ``min_bigrams`` bigrams — unscorable shards
    are dropped, matching CCNet's behavior of gating on the LM signal).
    Comparison happens on the exact integer total (sum_nll_e8 <=
    threshold_e8 * n) — no float threshold wobble."""
    s = score_documents(docs, model, id_col=id_col, text_col=text_col)
    thr_e8 = int(round(max_avg_nll * 1e8))
    keep = s.filter(
        (F.col("n_bigrams") >= F.lit(int(min_bigrams)))
        & (F.col("sum_nll_e8") <= F.col("n_bigrams") * F.lit(thr_e8))
    ).select(id_col)
    return docs.join(keep, on=id_col, how="left_semi")
