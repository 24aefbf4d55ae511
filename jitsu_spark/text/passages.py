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
the way a row_number window over ``passage`` would. The keep-flag join
back is keyed on the full (passage, doc_id, pos) triple, so even the hot
passage's occurrences spread across reducers (only its single winner row
has one fixed key). Reassembly is a groupBy(doc) with an array_sort of
collected (pos, passage) structs — per-doc state only. No driver-side
loops, nothing quadratic, no window. At 100 TB the shuffle key would be
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
    # reducer hot group)
    winners = p.groupBy("passage").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("_w")
    ).select(
        "passage",
        F.col(f"_w.{id_col}").alias(id_col),
        F.col("_w.pos").alias("pos"),
        F.lit(True).alias("_keep"),
    )
    # triple-key join: hot-passage occurrences carry distinct (doc, pos)
    # keys, so no reducer hotspot
    marked = p.join(
        winners, on=["passage", id_col, "pos"], how="left"
    ).withColumn("_keep", F.coalesce(F.col("_keep"), F.lit(False)))
    return marked.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_passages"),
        F.sum(F.col("_keep").cast("long")).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct("pos", "passage"))
                    )
                ),
                lambda s: s["passage"],
            ),
            " ",
        ).alias("clean_text"),
    )
