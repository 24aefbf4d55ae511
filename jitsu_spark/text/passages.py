"""Cross-document passage deduplication (boilerplate removal).

Splits every document into consecutive non-overlapping W-word passages
and keeps only the globally FIRST occurrence of each distinct passage
(ordered by (doc_id, position)); later occurrences — shared headers,
licence blocks, navigation chrome — are dropped and the document is
reassembled from its surviving passages in order. This is the standard
passage/paragraph-level dedup stage that exact-document dedup misses.

Scale shape: one explode to (doc, pos, passage); the first-occurrence
rule is a ``min(struct(doc_id, pos))`` AGGREGATE per passage — partial-
combinable, so a pathologically duplicated passage (boilerplate shared
by 10^7 documents) collapses map-side instead of flooding one reducer
the way a row_number window over ``passage`` would. The winner rows ARE
the kept set, so reassembly (groupBy(doc) + array_sort of collected
(pos, passage) structs) shuffles only winners — at most one row per
DISTINCT passage — and per-doc totals come from a narrow expression on
the source joined back by id. No keep-flag join over the occurrence
stream, no full-stream regroup, no driver-side loops, nothing
quadratic, no window. At 100 TB the shuffle key would be
a passage HASH (md5) with the text carried alongside; here the text
itself is the key so the DuckDB oracle matches trivially — swapping in
the hash key is a one-line change that does not alter semantics (md5
collisions aside).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
) -> DataFrame:
    """(id, pos, passage) — consecutive non-overlapping ``window``-word
    chunks; the final chunk may be shorter. NULL text is treated as the
    empty document (one empty passage), so every input id appears in the
    output — documents must not silently vanish from a per-doc result."""
    w = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    n_chunks = F.ceil(F.size(w) / F.lit(window)).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            F.array_join(
                F.slice(w, i * window + 1, window), " "
            ).alias("passage"),
        ),
    )
    return df.select(F.col(id_col), F.explode(chunks).alias("_c")).select(
        id_col, F.col("_c.pos").alias("pos"), F.col("_c.passage").alias("passage")
    )


def dedup_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 10,
) -> DataFrame:
    """Per-document result of global passage dedup: ``n_passages``,
    ``n_kept`` and the reassembled ``clean_text`` (empty string when every
    passage was seen earlier elsewhere)."""
    p = explode_passages(df, id_col, text_col, window)
    # global first occurrence per passage: a partial-combinable min over
    # (doc_id, pos) structs — the skew defense (vs a window's single-
    # reducer hot group). The winner rows ARE the kept set, so the
    # reassembly below shuffles ONLY winners (<= distinct passages),
    # never the full occurrence stream — on a duplicate-heavy corpus the
    # two heavy shuffles the naive plan pays (mark-join + full-stream
    # regroup) disappear entirely.
    winners = p.groupBy("passage").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_w")
    ).select(
        F.col(f"_w.{id_col}").alias(id_col),
        F.col("_w.pos").alias("pos"),
        "passage",
    )
    kept = winners.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "passage"))),
                lambda s: s["passage"],
            ),
            " ",
        ).alias("clean_text"),
    )
    # n_passages is a narrow per-doc expression on the source; the join
    # ships only (id, count) on the source side and the winner aggregate
    # on the other
    w = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    totals = df.select(
        F.col(id_col),
        F.ceil(F.size(w) / F.lit(window)).cast("long").alias("n_passages"),
    )
    return totals.join(kept, on=id_col, how="left").select(
        id_col,
        "n_passages",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )
