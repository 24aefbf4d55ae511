"""Table maintenance beyond compaction: time-chunk re-sync (W3) and
orphan-file vacuum.

``overwrite_where`` re-expresses the reference's SyncStore delete-then-
reload of one time interval (semantics per /root/reference/server/
storages/postgres.go:165-221 and adapters/delete_condition.go:24-33 —
re-derived): replace every row matching a predicate with a fresh chunk, in
ONE atomic snapshot, idempotently (same chunk_id re-synced twice converges
to the same state). On Iceberg this is `INSERT OVERWRITE ... WHERE` /
dynamic partition overwrite; here it is a predicate-scoped CoW rewrite.

``vacuum`` deletes data files not referenced by any retained snapshot —
commit retries and killed jobs leave orphan commit-token dirs by design
(the atomic metadata swap, not the file write, is the commit point).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jitsu_spark.lake import metadata as md
from jitsu_spark.lake.metadata import Snapshot
from jitsu_spark.lake.table import BUCKET_COL, LakeTable
from jitsu_spark.typesys.align import alignment_columns
from jitsu_spark.typesys.evolution import max_columns_of, plan_evolution


@dataclass
class OverwriteResult:
    version: int
    skipped: bool = False
    n_inserted: int = 0


def _scan_entries(table: LakeTable, entries: list[dict], snap, target) -> DataFrame:
    """Aligned scan of an explicit file-entry list (grouped by physical
    schema id, no footer merging)."""
    import json as J

    from pyspark.sql import types as T

    groups: dict[str, list[str]] = {}
    for e in entries:
        groups.setdefault(e["schema_id"], []).append(
            os.path.join(table.root, e["path"])
        )
    if not groups:
        return table.spark.createDataFrame([], target)
    parts = []
    for sid, paths in groups.items():
        phys = T.StructType.fromJson(J.loads(snap.schemas[sid]))
        df = table.spark.read.schema(phys).parquet(*paths)
        parts.append(df.select(*alignment_columns(df, target)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def overwrite_where(
    table: LakeTable,
    replacement: DataFrame,
    predicate: Column,
    chunk_id: str | None = None,
    job_id: str = "sync",
    prune: tuple[str, str, str] | None = None,
) -> OverwriteResult:
    """Atomically replace all rows matching ``predicate`` with
    ``replacement`` (which must itself satisfy the predicate's intent —
    not enforced). Idempotent per (job_id, chunk_id).

    **File-level pruning** (the 100 TB path): the layout is hash-bucketed
    by key, so a time-chunk predicate touches every bucket — but NOT
    every file. With ``prune=(col, lo, hi)`` (bounds implied by the
    predicate: no row outside [lo, hi) can match) and a table that
    records ``write.stats.column`` per-file min/max, files whose stat
    range cannot intersect the chunk are KEPT in place — never read,
    never rewritten. Only intersecting files (and files without stats,
    conservatively) are scanned, filtered, and rewritten. A steady-state
    interval re-sync then costs O(chunk), not O(table). Falls back to
    the full rewrite when the table carries MoR delta files (compact
    first).
    """
    import json as J

    from pyspark.sql import types as T

    snap = table.snapshot()
    commit_key = f"{job_id}/{chunk_id}"
    if chunk_id is not None and commit_key in snap.committed:
        return OverwriteResult(version=snap.version, skipped=True)
    key = snap.key_field
    plan = plan_evolution(
        T.StructType.fromJson(J.loads(snap.schema_json)),
        replacement.schema,
        frozen=(key,),
        max_columns=max_columns_of(snap.properties),
    )
    target = plan.target

    has_delta = any(
        e.get("kind", "base") == "delta"
        for es in snap.files.values()
        for e in es
    )
    kept: dict[str, list[dict]] = {}
    if prune is not None and not has_delta:
        col, lo, hi = prune
        overlap: list[dict] = []
        for b, entries in snap.files.items():
            for e in entries:
                st = (e.get("stats") or {}).get(col)
                if st is not None and (st[1] < lo or st[0] >= hi):
                    kept.setdefault(b, []).append(e)
                else:
                    overlap.append(e)
        existing = _scan_entries(table, overlap, snap, target)
    else:
        existing = table.read(snap=snap)
        existing = existing.select(*alignment_columns(existing, target))
    survivors = existing.filter(~predicate)
    fresh = replacement.select(*alignment_columns(replacement, target))
    n_inserted = fresh.count()
    result = (
        survivors.unionByName(fresh)
        .withColumn(BUCKET_COL, table.bucket_expr(F.col(key)))
        .repartition(snap.n_buckets, F.col(BUCKET_COL))
    )
    new_files = table._write_files(result)
    schemas = dict(snap.schemas)
    sid = snap.current_schema_id
    if plan.changed:
        sid = str(max(int(s) for s in schemas) + 1)
        schemas[sid] = target.json()
    new_entries = table.build_entries(new_files, sid, snap)
    files: dict[str, list[dict]] = {}
    for b in set(kept) | set(new_entries):
        files[b] = kept.get(b, []) + new_entries.get(b, [])
    committed = list(snap.committed)
    if chunk_id is not None:
        committed.append(commit_key)
    new_snap = Snapshot(
        version=snap.version + 1,
        key_field=snap.key_field,
        n_buckets=snap.n_buckets,
        schema_json=target.json(),
        schemas=schemas,
        current_schema_id=sid,
        files=files,
        committed=committed,
        lineage=snap.lineage
        + [{"kind": "overwrite_where", "job_id": job_id, "chunk_id": chunk_id,
            "n_inserted": n_inserted}],
        properties=snap.properties,
        parent=snap.version,
    )
    table._commit(new_snap)
    return OverwriteResult(version=new_snap.version, n_inserted=n_inserted)


def vacuum(
    table: LakeTable, keep_last: int = 1, min_age_s: float = 300.0
) -> list[str]:
    """Delete data files referenced by NO retained snapshot (the newest
    ``keep_last`` snapshots are retained; older snapshots lose time-travel).
    Orphans younger than ``min_age_s`` are kept: an in-flight concurrent
    commit writes its parquet files BEFORE the atomic metadata swap, so a
    zero grace period could delete just-written files of an unpublished
    snapshot. The 300 s default is conservative; pass 0 only on a
    single-writer, quiesced table. Returns deleted relative paths."""
    current = md.current_version(table.root)
    retained = range(max(0, current - keep_last + 1), current + 1)
    referenced: set[str] = set()
    for v in retained:
        snap = table.snapshot(v)
        for es in snap.files.values():
            referenced.update(e["path"] for e in es)
    deleted: list[str] = []
    data_root = os.path.join(table.root, "data")
    now = time.time()
    for dirpath, _, filenames in os.walk(data_root):
        for fn in filenames:
            full = os.path.join(dirpath, fn)
            rel = os.path.relpath(full, table.root)
            if rel in referenced or not fn.endswith(".parquet"):
                continue
            if now - os.path.getmtime(full) < min_age_s:
                continue
            os.unlink(full)
            deleted.append(rel)
    # remove empty commit dirs
    for dirpath, dirnames, filenames in list(os.walk(data_root, topdown=False)):
        if dirpath != data_root and not dirnames and not filenames:
            os.rmdir(dirpath)
    return deleted
