"""Full-snapshot pull drivers — the Firebase / Redis collection shape.

Reference semantics (re-derived, no code ported): these sources have no
time axis; they expose ONE interval of granularity ALL
(/root/reference/server/drivers/firebase.go:95-99, redis.go:70-95,
granularity.go:14) which the sync executor re-syncs on EVERY run
(synchronization/task_executor.go:224 treats ``IsAll()`` as REFRESH),
replacing the destination table wholesale. Each object is stamped with
its collection id (Firestore document id / Redis hash key —
firebase.go:118-131's ``_firestore_id`` analog).

The sandbox has no network, so the "collection" is parquet-backed; the
transport is the only stubbed piece. Refinement over the reference: the
driver exposes a content signature (an upstream watermark/version), and
because the overwrite's chunk id embeds it, a re-sync whose content is
unchanged is deduped by the engine's commit manifest — the reference
re-reads and re-stores unconditionally; here the re-read still happens
every run (faithful) but the redundant rewrite is skipped.

At 100 TB this shape is for DIMENSION-scale collections (API keys, user
directories): a full replace per run. Fact-scale sources belong on the
day-interval (GA-shaped) or CDC paths.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jitsu_spark.sources.interval_sync import IntervalDriver, TimeInterval


@dataclass
class SnapshotCollectionDriver(IntervalDriver):
    """Parquet-backed full-collection driver (Firebase/Redis shape).

    ``version`` is the upstream content watermark — mutate it between
    runs to represent upstream change (a real connector would derive it
    from the collection's update cursor, or use a run counter for the
    reference's unconditional-refresh behavior)."""

    source_path: str
    id_col: str
    version: str = "0"
    id_field: str = "_collection_id"  # stamped id column (firestore analog)

    def available_intervals(self) -> list[TimeInterval]:
        return [TimeInterval(id="ALL", lower="", upper="", is_all=True)]

    def signature(self, interval: TimeInterval) -> str:
        return str(self.version)

    def read_interval(
        self, spark: SparkSession, interval: TimeInterval
    ) -> DataFrame:
        df = spark.read.parquet(self.source_path)
        return df.withColumn(
            self.id_field, F.col(self.id_col).cast("string")
        )
