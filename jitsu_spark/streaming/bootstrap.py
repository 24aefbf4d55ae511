"""Snapshot bootstrap + log tail — the CDC initial-load pattern.

A new destination table rarely starts from an empty log: the upstream
has 10^10 rows of current state and a change log that only reaches back
so far. The standard pattern (public Debezium/DMS semantics; the
reference's analog is the batch "periodic uploader" catching a
destination up before the stream takes over, SURVEY.md §1.4):

1. take a CONSISTENT snapshot of the source at a known log position
   ``watermark_seq`` (every change with seq <= watermark is reflected);
2. bulk-load it (pure file append — no LWW, no bucket rewrite: snapshot
   rows are unique per key by construction, so O(snapshot) write-only
   work even at 10^10 rows);
3. tail the change log FROM the watermark: the stream applies only
   ``seq > watermark_seq``.

Exactly-once across restarts: the bulk load is recorded in the table's
commit manifest under ``{job_id}/bootstrap@{watermark}`` (a crashed and
re-run bootstrap is a no-op), and the tail inherits the stream's normal
checkpoint + manifest idempotency. The watermark filter is pushed to the
log scan (a plain comparison predicate — parquet row-group pruning
applies when the log is seq-sorted, which seq-ordered CDC logs are).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jitsu_spark.lake.merge import MergeResult, append_batch
from jitsu_spark.lake.table import LakeTable


def bootstrap_snapshot(
    table: LakeTable,
    snapshot_df: DataFrame,
    watermark_seq: int,
    job_id: str = "cdc",
) -> MergeResult:
    """Bulk-load a consistent snapshot taken at ``watermark_seq``.

    ``snapshot_df`` is payload-only (no seq/op envelope) with at most one
    row per key. Idempotent: the manifest key embeds the watermark, so a
    re-run (or a bootstrap raced by two drivers) loads exactly once."""
    return append_batch(
        table,
        snapshot_df,
        batch_id=f"bootstrap@{watermark_seq}",
        job_id=job_id,
    )


def tail_filter(
    watermark_seq: int, seq_col: str = "seq"
) -> Callable[[DataFrame], DataFrame]:
    """Transform for :class:`~jitsu_spark.streaming.runner.CdcStreamJob`:
    drop every change already reflected in the bootstrapped snapshot."""

    def _f(df: DataFrame) -> DataFrame:
        return df.filter(F.col(seq_col) > watermark_seq)

    return _f
