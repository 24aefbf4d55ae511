"""Sliding-window document chunking for context-length-bounded training.

Long documents are cut into ``window``-token chunks every ``stride``
tokens (stride < window => overlapping chunks, the standard trick to
avoid losing cross-boundary context). The final chunk is realigned to
end exactly at the document's last token, so every token appears in at
least one chunk and all chunks are full-width whenever the document has
at least ``window`` tokens (tokenizer "stride" semantics). Documents
shorter than ``window`` yield one whole-document chunk; empty/NULL
documents yield none.

Scale shape: a single zero-shuffle narrow projection —
``sequence``/``explode`` over start offsets plus ``slice`` — no join,
no window function, no per-row Python. Chunk explosion multiplies rows
by ~n/stride, which Spark handles as plain map-side fan-out; downstream
consumers repartition as they see fit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    window: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_no, n_tokens, chunk_text) for every sliding-window
    chunk. Start offsets are 1, 1+stride, ... up to n-window+1, with the
    last start forced to n-window+1 (tail realignment; dropped from the
    arithmetic progression if already aligned). chunk_no is the dense
    0-based rank of the start offset."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    if stride > window:
        # stride > window would skip tokens between consecutive chunks,
        # silently breaking the every-token-covered contract above
        raise ValueError("stride must be <= window (gapless coverage)")
    w = F.split(F.col(text_col), " ")
    n = F.size(w)
    last_start = F.greatest(n - F.lit(window) + 1, F.lit(1))
    seq = F.sequence(F.lit(1), last_start, F.lit(stride))
    starts: Column = F.when(
        (last_start - 1) % F.lit(stride) == 0, seq
    ).otherwise(F.concat(seq, F.array(last_start)))
    return (
        docs.filter(F.col(text_col).isNotNull() & (F.col(text_col) != ""))
        .select(F.col(id_col), w.alias("_w"), n.alias("_n"), starts.alias("_s"))
        .select(
            F.col(id_col),
            F.col("_w"),
            F.col("_n"),
            F.posexplode(F.col("_s")).alias("chunk_no", "_start"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_no").cast("long").alias("chunk_no"),
            F.least(F.lit(window), F.col("_n") - F.col("_start") + 1)
            .cast("long")
            .alias("n_tokens"),
            F.array_join(
                F.slice(F.col("_w"), F.col("_start"), F.lit(window)), " "
            ).alias("chunk_text"),
        )
    )
