"""Streaming observability (A3 counters + ST5 lineage read path).

- ``CdcQueryListener``: a StreamingQueryListener capturing per-micro-batch
  progress (rows/sec, batch duration, watermark) off the hot path — the
  analog of the reference's async counters (events_cache/counters are
  fire-and-forget there; listener callbacks are off-thread here).
- ``lineage_frame``: the table's commit lineage (batch id, source seq
  range -> snapshot version, buckets touched, wall time) as a DataFrame —
  the per-partition "source offset -> commit snapshot" trace required by
  the north star, queryable with plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

from jitsu_spark.lake.table import LakeTable


class CdcQueryListener(StreamingQueryListener):
    """Collects micro-batch progress events; read ``snapshots`` after (or
    during) a run. Register with ``spark.streams.addListener(listener)``."""

    def __init__(self) -> None:
        self.snapshots: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.snapshots.append(
            {
                "query": p.name,
                "batch_id": p.batchId,
                "rows_per_sec": p.processedRowsPerSecond,
                "input_rows": p.numInputRows,
                "duration_ms": dict(p.durationMs or {}),
                "timestamp": p.timestamp,
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def throughput_summary(self) -> dict:
        rows = [s for s in self.snapshots if s["input_rows"]]
        if not rows:
            return {"batches": 0}
        return {
            "batches": len(rows),
            "total_rows": sum(s["input_rows"] for s in rows),
            "mean_rows_per_sec": round(
                sum(s["rows_per_sec"] or 0 for s in rows) / len(rows), 1
            ),
        }


def lineage_frame(spark: SparkSession, table: LakeTable) -> DataFrame:
    """Commit lineage as a DataFrame: one row per merge/append/compact/
    overwrite commit with seq range, bucket list, and counts."""
    rows = []
    for i, entry in enumerate(table.snapshot().lineage):
        rows.append(
            {
                "commit_index": i,
                "kind": entry.get("kind"),
                "job_id": entry.get("job_id"),
                "batch_id": str(entry.get("batch_id")),
                "seq_min": entry.get("seq_min"),
                "seq_max": entry.get("seq_max"),
                # merge lineage records the count as n_keys (pre-LWW row
                # count); older name n_events kept as a fallback
                "n_keys": entry.get("n_keys", entry.get("n_events")),
                "n_buckets_touched": len(entry.get("buckets", []) or []),
                "schema_changed": bool(
                    entry.get("schema_added") or entry.get("schema_widened")
                ),
                "wall_s": entry.get("wall_s"),
            }
        )
    schema = (
        "commit_index long, kind string, job_id string, batch_id string, "
        "seq_min long, seq_max long, n_keys long, n_buckets_touched long, "
        "schema_changed boolean, wall_s double"
    )
    return spark.createDataFrame(rows, schema)
