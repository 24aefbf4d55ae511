"""Incrementally maintained sliding-window chunk table — the training
corpus's tokenization-ready surface kept continuously fresh from the
document table's ``changes()`` feed.

At 100 TB the chunk table (window/stride projection of every document)
is itself corpus-sized; re-chunking everything because 0.1% of documents
changed is the batch pipeline's tax. A chunk row derives from exactly
one document, so :func:`jitsu_spark.lake.mirror.sync_derived_rows`
maintains the table O(change): the pre-image's chunk rows retract, the
post-image's assert — a shortened document's now-out-of-range chunk_no
rows are deleted because they appear only in the pre-image.

Chunk key = ``doc_id # chunk_no`` with ``bucket.prefix_sep='#'``: all
chunks of one document co-locate in the bucket its doc_id hashes to, so
both the retraction merge and any per-doc read prune to the changed
docs' buckets.

Window/stride are STRUCTURAL (rows were cut under them) and persist as
table properties, read back by every sync — a caller can never mix two
chunkings in one table. Chunking itself is the batch operator
(:func:`jitsu_spark.text.chunk.chunk_documents`) — identical cuts by
construction, so the ``chunks_ivm`` gate query answers the SAME oracle
as the batch ``chunk_documents``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jitsu_spark.lake.mirror import MirrorResult, WindowImages, sync_derived_rows
from jitsu_spark.lake.table import BUCKET_PREFIX_SEP_PROP, LakeTable
from jitsu_spark.text.chunk import chunk_documents

SEP = "#"

PARAMS_PROP = "chunk_index.params"


def create_chunk_table(
    spark: SparkSession,
    root: str,
    window: int,
    stride: int,
    key_field: str = "doc_id",
    key_type: T.DataType = T.LongType(),
    n_buckets: int = 16,
) -> LakeTable:
    if window < 1 or stride < 1 or stride > window:
        # same contract as chunk_documents, enforced before any state exists
        raise ValueError("need 1 <= stride <= window (gapless coverage)")
    return LakeTable.create(
        spark,
        root,
        T.StructType(
            [
                T.StructField("ck", T.StringType()),
                T.StructField(key_field, key_type),
                T.StructField("chunk_no", T.LongType()),
                T.StructField("n_tokens", T.LongType()),
                T.StructField("chunk_text", T.StringType()),
            ]
        ),
        "ck",
        n_buckets=n_buckets,
        properties={
            "write.mode": "mor",
            BUCKET_PREFIX_SEP_PROP: SEP,
            PARAMS_PROP: json.dumps({"window": window, "stride": stride}),
        },
    )


def load_chunk_table(spark: SparkSession, root: str) -> LakeTable:
    t = LakeTable.load(spark, root)
    if t.snapshot().properties.get(PARAMS_PROP) is None:
        raise ValueError(f"{root} lacks {PARAMS_PROP!r} — not a chunk table")
    return t


def sync_chunks(
    src: LakeTable,
    table: LakeTable,
    text_col: str = "text",
    job_id: str = "chunk-index",
    images: WindowImages | None = None,
) -> MirrorResult:
    """Advance the chunk table to the upstream's current version under
    the table's own persisted window/stride. Pass a shared ``images``
    when syncing several views of the same upstream in one run."""
    p = json.loads(table.snapshot().properties[PARAMS_PROP])
    key = src.snapshot().key_field

    def derive(docs: DataFrame) -> DataFrame:
        ch = chunk_documents(
            docs.select(key, text_col), p["window"], p["stride"],
            id_col=key, text_col=text_col,
        )
        # the bucket.prefix_sep contract (table.py) requires the prefix
        # component to never contain the separator — md5-keyed tables
        # (passage/LSH index) guarantee that by construction, but here
        # the prefix is the CALLER's doc id: a string id containing SEP
        # would silently hash a different prefix than probe pruning
        # expects, so fail loudly at derive time instead
        kstr = F.col(key).cast("string")
        kchecked = F.when(
            kstr.contains(SEP),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"chunk table key prefix must not contain {SEP!r}: "
                    ),
                    kstr,
                )
            ),
        ).otherwise(kstr)
        return ch.select(
            F.concat(
                kchecked, F.lit(SEP),
                F.col("chunk_no").cast("string"),
            ).alias("ck"),
            key,
            "chunk_no",
            "n_tokens",
            "chunk_text",
        )

    return sync_derived_rows(src, table, derive, job_id=job_id, images=images)
