"""TF-IDF keyword extraction over the corpus.

Per document, the top-k terms by smoothed TF-IDF (sklearn-style
``idf = ln((1+N)/(1+df)) + 1``) — the standard signal for keyword
tagging, topic routing, and near-duplicate triage in training-data
pipelines.

Scale shape:
- term frequencies and document frequencies are partial-combinable
  aggregates (map-side combine; state is |doc x distinct-term| and
  |vocab| rows respectively — never corpus-sized on one node);
- the corpus size N rides along as a broadcast 1-row frame;
- the tf->df join shuffles on the term key (AQE-sized; broadcast-
  converted when the vocabulary is small);
- top-k per doc is a row_number window partitioned by doc_id — per-doc
  state is bounded by distinct terms per document, no global sort;
- determinism across engines: the ONLY float step is the per-(tf, df, N)
  ``round(tf * idf * 1e6)`` -> BIGINT; ranking compares exact integers
  with a term-ascending tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jitsu_spark.text.tokenize import doc_tokens, non_empty


def tfidf_top_terms(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, term_rank, token, score_e6) for each document's top-k terms by
    smoothed TF-IDF; term_rank is 1-based in (score desc, token asc) order.
    Documents with fewer than k distinct terms yield fewer rows;
    empty/NULL documents yield none."""
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = doc_tokens(docs, id_col, text_col)
    tf = toks.groupBy(id_col, "token").agg(
        F.count("*").cast("long").alias("tf")
    )
    # r7: document frequency as a window count over the SAME tf frame —
    # the previous tf->df aggregate + tf JOIN df shape evaluated the
    # whole explode+tf subtree twice (the two consumers shuffle tf on
    # different keys, so no exchange reuse) and shuffled it a third time
    # for the join. One tf pass, same exchange count, join removed; df
    # values are identical (every tf row's token trivially exists in its
    # own partition). Measured A/B vs a persisted-tf join: window 1.27 s
    # vs join 2.53 s at 10x docs (cache materialization loses). Trade-off
    # note: an unordered window still BUFFERS each token group
    # (spillable), while the join streamed its probe side — both shapes
    # hash a hot token's rows to one partition, but a stopword-dominated
    # corpus at extreme scale would prefer the join (or a stopword
    # pre-filter) over this window.
    wdf = Window.partitionBy("token")
    n = non_empty(docs, text_col).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    scored = (
        tf.withColumn("df", F.count("*").over(wdf).cast("long"))
        .crossJoin(F.broadcast(n))
        .select(
            F.col(id_col),
            F.col("token"),
            F.round(
                F.col("tf")
                * (
                    F.log((F.lit(1) + F.col("n_docs")) / (F.lit(1) + F.col("df")))
                    + F.lit(1.0)
                )
                * F.lit(1000000.0),
                0,
            )
            .cast("long")
            .alias("score_e6"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_e6").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("term_rank") <= F.lit(int(k)))
        .select(id_col, "term_rank", "token", "score_e6")
    )
