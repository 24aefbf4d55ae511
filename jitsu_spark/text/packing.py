"""Token-sequence packing: variable-length token arrays -> fixed-length
training sequences (the GPT-style document-boundary-agnostic packing an
LLM training pipeline runs over exactly the (doc_id, tokens) table this
engine maintains).

Semantics: concatenate every document's tokens in a deterministic global
order (doc_id ascending), then split the stream into consecutive chunks
of ``max_len`` tokens; chunk g holds global token positions
[g*max_len, (g+1)*max_len). Deterministic, so the DuckDB oracle can
recompute every pack exactly.

Scale design — the naive plan (one global window cumsum) serializes on a
single partition. Instead:

1. ``repartitionByRange(doc_id) + sortWithinPartitions`` gives a global
   doc order across partitions;
2. one cheap counting pass collects PER-PARTITION token totals (bounded
   by the partition count, driver-side) and prefix-sums them into exact
   global offsets;
3. ``mapInPandas`` streams each partition's Arrow batches once, carrying
   the running global position, and emits pack SEGMENTS (a pack can span
   partition/doc boundaries);
4. segments shuffle by pack_id (tiny: the write volume itself) and are
   stitched in position order with ``array_sort`` + ``flatten`` —
   JVM-side.

Every step is O(partition) memory; nothing global ever materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SEG_SCHEMA = T.StructType(
    [
        T.StructField("pack_id", T.LongType()),
        T.StructField("seg_start", T.IntegerType()),  # offset inside the pack
        T.StructField("seg_tokens", T.ArrayType(T.IntegerType())),
    ]
)


def pack_tokens(
    df: DataFrame,
    doc_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_len: int = 2048,
    n_partitions: int | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Pack ``tokens_col`` arrays into fixed-``max_len`` sequences.

    Returns (pack_id, tokens, n_tok); every pack except the last is
    exactly ``max_len`` long and equals the corresponding slice of the
    doc_id-ordered global token stream.

    ``reliable=False`` pins the range-partition boundaries with
    ``localCheckpoint`` — fastest, but executor-local blocks die with
    their executor, so it suits local/short-lived jobs. ``reliable=True``
    uses a reliable checkpoint when ``sc.setCheckpointDir`` points at
    durable storage (HDFS/S3), else an eager DISK_ONLY persist whose
    blocks recompute THROUGH the already-built RangePartitioner on
    executor loss (the partitioner is fixed in the shuffle dependency, so
    recovered partitions keep identical boundaries). Use it for 100 TB
    cluster runs; both modes produce identical packs."""
    n_parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = df.select(doc_col, tokens_col).repartitionByRange(
        n_parts, F.col(doc_col)
    ).sortWithinPartitions(doc_col)
    # pin the range partitioning: the counting pass and the packing pass
    # MUST see identical partition boundaries (repartitionByRange samples
    # to pick them; an independent recompute that re-samples would
    # silently misplace offsets). Materialized once — the job's working
    # set, paid exactly once.
    if reliable:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is not None:
            ordered = ordered.checkpoint(eager=True)
        else:
            from pyspark import StorageLevel

            ordered = ordered.persist(StorageLevel.DISK_ONLY)
            ordered.count()
    else:
        ordered = ordered.localCheckpoint(eager=True)

    # pass 1: per-partition token totals -> exact global start offsets
    counts = (
        ordered.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum(F.coalesce(F.size(tokens_col), F.lit(0))).alias("n"))
        .collect()
    )
    totals = {r["pid"]: r["n"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]

    # pass 2: stream each partition once, emitting pack segments
    def emit(batches):
        import numpy as np
        import pandas as pd

        pos = None  # running global position within this partition
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pos is None:
                pos = offsets[int(pdf["_pid"].iloc[0])]
            out_ids, out_starts, out_segs = [], [], []
            for toks in pdf["_toks"]:
                if toks is None or len(toks) == 0:
                    continue
                arr = np.asarray(toks, dtype="int32")
                i = 0
                while i < len(arr):
                    pack_id, in_pack = divmod(pos, max_len)
                    take = min(max_len - in_pack, len(arr) - i)
                    out_ids.append(pack_id)
                    out_starts.append(in_pack)
                    # plain lists: Arrow rejects object-Series of ndarrays
                    out_segs.append(arr[i : i + take].tolist())
                    pos += take
                    i += take
            if out_ids:
                yield pd.DataFrame(
                    {
                        "pack_id": pd.Series(out_ids, dtype="int64"),
                        "seg_start": pd.Series(out_starts, dtype="int32"),
                        "seg_tokens": pd.Series(out_segs, dtype="object"),
                    }
                )

    segs = ordered.select(
        F.spark_partition_id().alias("_pid"), F.col(tokens_col).alias("_toks")
    ).mapInPandas(emit, _SEG_SCHEMA)

    # pass 3: stitch segments per pack in position order (JVM-side)
    stitched = (
        segs.groupBy("pack_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("seg_start", "seg_tokens"))
            ).alias("_parts")
        )
        .select(
            "pack_id",
            F.flatten(
                F.transform(F.col("_parts"), lambda p: p["seg_tokens"])
            ).alias("tokens"),
        )
        .withColumn("n_tok", F.size("tokens"))
    )
    return stitched
