"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

This is the standard n-gram-overlap protocol published for large-LM
training corpora (GPT-3 appendix C / PaLM appendix: a training document
is contaminated if any length-n word sequence also occurs in a benchmark
example). It is a training-data-pipeline operator, not a reference-jitsu
one — included because a 100 TB ingest feeding LLM training needs it
next to dedup/quality/packing.

Scale shape (the part that matters at 100 TB):
- the BENCHMARK side is small by definition (eval sets are thousands of
  documents), so its distinct shingle set is broadcast — the corpus scan
  never shuffles to discover hits;
- corpus shingles explode ONCE into a left broadcast-hash-join probe,
  and BOTH per-doc outputs (shingle-set size and hit count) fall out of
  a single partial-combining aggregate — shuffle volume is one row per
  (doc, distinct shingle) reduced map-side to one row per doc per task
  (r7 shape; the earlier two-branch form shingled the corpus twice and
  re-joined the hit counts);
- ``broadcast_hits`` is retained for API compatibility but is a no-op
  in this shape: the hit count is aggregated inline and never becomes a
  join side, so there is nothing to (mis)broadcast.

Shingles are joined on ``xxhash64`` of the shingle string by default
(8-byte keys instead of n-word strings in the broadcast + probe); set
``hash_shingles=False`` to join raw strings. Tokenization and shingling
reuse :func:`jitsu_spark.dedup.minhash._shingles` so every text operator
in the repo agrees on what an n-gram is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jitsu_spark.dedup.minhash import _shingles


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bench_text_col: str | None = None,
    hash_shingles: bool = True,
    broadcast_hits: bool = False,
) -> DataFrame:
    """Per training doc: total distinct n-gram shingles and how many also
    occur anywhere in ``bench``. Returns (id_col, n_shingles, n_hit);
    ``n_hit >= 1`` is the usual contamination flag, left to the caller so
    thresholded variants (>= k hits) need no recompute."""
    bench_text_col = bench_text_col or text_col

    def key(col):
        return F.xxhash64(col) if hash_shingles else col

    bench_keys = (
        bench.select(F.explode(_shingles(F.col(bench_text_col), n)).alias("_s"))
        .select(key(F.col("_s")).alias("_bk"))
        .distinct()
    )
    # ONE shingling pass (r7): the corpus's (distinct-per-doc) shingles are
    # exploded once, LEFT-joined against the broadcast bench keys, and both
    # per-doc outputs fall out of a single partial-combining aggregate —
    # count(*) is the shingle-set size, count(_bk) the hit count. The old
    # shape computed _shingles twice (an n_shingles projection branch plus
    # the probe branch; guide §2.3 "project before the exchange" /
    # duplicated-subtree audit). Every doc survives the explode because
    # _shingles never returns NULL or an empty array (short/NULL docs get
    # the one whole-doc shingle), so no restore join is needed. The
    # ``broadcast_hits`` escape hatch is obsolete in this shape (the hit
    # count never becomes a join side) and is accepted for API
    # compatibility.
    _ = broadcast_hits
    probe = docs.select(
        F.col(id_col), F.explode(_shingles(F.col(text_col), n)).alias("_s")
    ).select(F.col(id_col), key(F.col("_s")).alias("_dk"))
    return (
        probe.join(
            F.broadcast(bench_keys), probe["_dk"] == bench_keys["_bk"], "left"
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.count("_bk").cast("long").alias("n_hit"),
        )
    )
