"""Incremental derived-table maintenance: keep a downstream LakeTable in
sync with an upstream MoR table by consuming ``changes()`` — the CDC-out
consumer loop (upstream merge -> changelog -> downstream merge) that
replaces full-table recomputes for projections/filtered mirrors of a
100 TB table.

The downstream's own commit manifest doubles as the sync cursor: each
sync commits under ``(job_id, v<upstream_version>)``, so the last synced
upstream version is recoverable from the manifest alone — no sidecar
state, and a replayed sync is idempotent like any other batch.

Change rows re-enter the normal merge kernel with
``seq = _commit_version`` (a key appears at most once per upstream
commit and versions are monotone, so LWW ordering is exact) and
``op = _change_op`` (downstream deletes mirror upstream deletes).

Consume-before-compact applies transitively: sync each mirror past an
upstream version before compacting/overwriting the upstream beyond it
(changes() raises rather than silently skipping a gap).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jitsu_spark.lake.merge import merge_batch
from jitsu_spark.lake.table import LakeTable


@dataclass
class MirrorResult:
    from_version: int
    to_version: int
    skipped: bool = False


def last_synced_version(dst: LakeTable, job_id: str = "mirror") -> int:
    """Recover the sync cursor from the destination's commit manifest."""
    pat = re.compile(re.escape(job_id) + r"/v(\d+)$")
    versions = [
        int(m.group(1))
        for key in dst.snapshot().committed
        if (m := pat.match(key))
    ]
    return max(versions, default=0)


def sync_mirror(
    src: LakeTable,
    dst: LakeTable,
    transform=None,
    job_id: str = "mirror",
) -> MirrorResult:
    """Apply all upstream changes since the last sync to ``dst``.

    ``transform`` optionally maps the change DataFrame (payload +
    ``_change_op``/``_commit_version``) before the merge — project
    columns, filter rows (a filtered mirror must keep DELETES flowing
    even for rows it filters out, so filter on payload columns only for
    insert/update semantics you actually want)."""
    since = last_synced_version(dst, job_id)
    cur = src.snapshot().version
    if cur <= since:
        return MirrorResult(from_version=since, to_version=since, skipped=True)
    ch = src.changes(since_version=since, to_version=cur)
    if transform is not None:
        ch = transform(ch)
    envelope = ch.withColumn("seq", F.col("_commit_version")).withColumn(
        "op", F.col("_change_op")
    ).drop("_change_op", "_commit_version")
    merge_batch(dst, envelope, batch_id=f"v{cur}", job_id=job_id)
    return MirrorResult(from_version=since, to_version=cur)
