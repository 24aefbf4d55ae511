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


def _observed_count(obs, df, timeout_s: float = 30.0) -> int:
    """Read an Observation's row count with a hang guard: the metrics
    arrive with the action that executed the observed plan, so this
    normally returns immediately — but if a future optimizer change eats
    the CollectMetrics node on some plan shape, fall back to counting
    ``df`` directly instead of blocking a sync forever."""
    import threading

    holder: dict = {}

    def read() -> None:
        holder["v"] = obs.get

    th = threading.Thread(target=read, daemon=True)
    th.start()
    th.join(timeout=timeout_s)
    if "v" in holder:
        return int(holder["v"]["n"])
    return df.count()


def overwrite_where(
    table: LakeTable,
    replacement: DataFrame,
    predicate: Column,
    chunk_id: str | None = None,
    job_id: str = "sync",
    prune: tuple[str, str, str] | None = None,
    max_commit_retries: int = 5,
) -> OverwriteResult:
    """Atomically replace all rows matching ``predicate`` with
    ``replacement`` (which must itself satisfy the predicate's intent —
    not enforced). Idempotent per (job_id, chunk_id). Retries on commit
    conflict (re-snapshot + recompute), so concurrent chunk syncs — the
    reference's worker pool — interleave safely; size
    ``max_commit_retries`` to at least the number of racing writers.

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
    return LakeTable._retry_commit(
        lambda: _overwrite_where_once(
            table, replacement, predicate, chunk_id, job_id, prune
        ),
        max_commit_retries=max_commit_retries,
    )


def _overwrite_where_once(
    table: LakeTable,
    replacement: DataFrame,
    predicate: Column,
    chunk_id: str | None,
    job_id: str,
    prune: tuple[str, str, str] | None,
) -> OverwriteResult:
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
    # r7: ONE Spark job per chunk. The old shape ran `fresh.count()` and
    # then the write, each executing the full replacement pipeline (for
    # an interval sync that is the whole report aggregation, twice per
    # interval — the guide-§1.4 count trap). The inserted-row count now
    # rides the write job as an Observation on the replacement branch.
    # Empty-branch safety was verified empirically on this Spark version
    # for exactly this plan shape (observe -> union -> repartition ->
    # parquet write): a runtime-empty AND a statically-empty replacement
    # both deliver {'n': 0} rather than losing the CollectMetrics node
    # (the hazard the merge kernel documents for AQE-emptied branches);
    # `_observed_count` still guards the read with a timeout + recompute
    # fallback so a regression can never hang a sync.
    from pyspark.sql import Observation

    obs = Observation()
    # The replacement rows are tagged and counted ABOVE the repartition
    # exchange (self-review r7): a CollectMetrics below a shuffle is an
    # accumulator in a map stage, and re-executed map tasks (fetch
    # failure on a cluster) would double-count; above the exchange the
    # count rides the result stage, whose successful-task updates Spark
    # applies exactly once (speculative execution, off by default, is
    # the remaining caveat). The tag is dropped before the write so the
    # file schema is unchanged; its name is derived to never collide
    # with a real table column (withColumn REPLACES same-named columns).
    tag = "_ow_fresh"
    taken = {f.name for f in target.fields}
    while tag in taken:
        tag += "_"
    fresh = replacement.select(
        *alignment_columns(replacement, target)
    ).withColumn(tag, F.lit(True))
    result = (
        survivors.withColumn(tag, F.lit(False))
        .unionByName(fresh)
        .withColumn(BUCKET_COL, table.bucket_expr(F.col(key)))
        .repartition(snap.n_buckets, F.col(BUCKET_COL))
        .observe(
            obs,
            F.coalesce(
                F.sum(F.when(F.col(tag), 1)), F.lit(0)
            ).alias("n"),
        )
        .drop(tag)
    )
    new_files = table._write_files(result)
    n_inserted = _observed_count(obs, replacement)
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
        + [{"version": snap.version + 1,
            "kind": "overwrite_where", "job_id": job_id, "chunk_id": chunk_id,
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


def expire_snapshots(table: LakeTable, keep_last: int = 100) -> list[int]:
    """Delete version DESCRIPTORS older than the newest ``keep_last``
    (Iceberg expire_snapshots analog). ``compact_manifest`` bounds the
    SIZE of the current snapshot; this bounds the COUNT of v{N}.json
    files, which otherwise grows one per commit forever — 10^6 metadata
    files after 10^6 micro-batches.

    Contract: time travel (``snapshot(v)``) and ``changes()`` ranges
    reaching below the horizon raise afterwards — sync downstream
    consumers first (consume-before-expire, the same contract as data
    compaction and lineage archiving). ``full_history`` is unaffected
    (lineage lives in the archive + current snapshot, not in old
    descriptors).

    Safety: never expires at or above the on-disk hint, so the reader
    roll-forward chain (hint -> v{hint+1} -> ...) stays intact even if
    the hint is stale from a crashed writer. ``keep_last`` must be >= 2:
    with ``keep_last=1`` the horizon equals ``current``, so a concurrent
    reader that just resolved the previous version as current would lose
    its descriptor mid-read (in-stream expiry should keep the window
    comfortably above the number of commits a reader may lag). Returns
    expired versions."""
    if keep_last < 2:
        raise ValueError(
            "keep_last must be >= 2 (a concurrent reader may lag the "
            "current version by at least one commit)"
        )
    current = md.current_version(table.root)
    try:
        with open(os.path.join(table.root, "metadata", "version-hint.txt")) as f:
            hint = int(f.read().strip())
    except (OSError, ValueError):
        hint = current
    horizon = min(current - keep_last + 1, hint)
    # enumerate what actually exists (O(retained + expirable) per call)
    # instead of probing every version number since 0 (O(stream age))
    md_dir = os.path.join(table.root, "metadata")
    expired: list[int] = []
    for fn in os.listdir(md_dir):
        if not (fn.startswith("v") and fn.endswith(".json")):
            continue
        try:
            v = int(fn[1:-5])
        except ValueError:
            continue
        if v < horizon:
            os.unlink(os.path.join(md_dir, fn))
            expired.append(v)
    return sorted(expired)


def expire_snapshots_safe(
    table: LakeTable,
    consumers: list[tuple[LakeTable, str]],
    keep_last: int = 100,
) -> list[int]:
    """Consumer-aware :func:`expire_snapshots`: floor the horizon at every
    registered downstream cursor (a mirror/aggregate's
    ``last_synced_version``), so a lagging consumer's next ``changes()``
    window is never expired out from under it. ``consumers`` is a list of
    ``(destination_table, job_id)`` pairs — the same identifiers their
    ``sync_mirror``/``sync_aggregate`` calls use."""
    from jitsu_spark.lake.mirror import last_synced_version

    current = md.current_version(table.root)
    floor = min(
        (last_synced_version(dst, job_id) for dst, job_id in consumers),
        default=current,
    )
    # horizon = current - keep_last + 1 must stay <= floor
    return expire_snapshots(
        table, keep_last=max(keep_last, current - floor + 1)
    )


@dataclass
class ManifestCompactResult:
    version: int
    skipped: bool = False
    committed_before: int = 0
    committed_after: int = 0
    lineage_archived: int = 0


def compact_manifest(
    table: LakeTable,
    keep_lineage: int = 200,
    keep_recent_batches: int = 50,
) -> ManifestCompactResult:
    """Bound snapshot-metadata growth — the silent O(stream-age) cost of a
    long-lived CDC table.

    Every merge appends one ``job/batch`` manifest entry and one lineage
    record to the snapshot, and every commit rewrites the whole snapshot
    JSON: after 10^6 micro-batches each commit is rewriting megabytes of
    history, forever. This op:

    1. **Folds contiguous integer batch-id prefixes per job into a
       high-watermark marker** ``job/<=N`` (streaming epoch ids ARE
       contiguous from 0). Exactly-once is preserved: ``is_committed``
       treats the marker as membership for every id ≤ N, and the fold
       only covers a PROVEN contiguous prefix — a gap stops it, so an
       undelivered id can never be wrongly skipped. The most recent
       ``keep_recent_batches`` ids stay explicit for debuggability.
    2. **Archives lineage older than ``keep_lineage`` entries** to
       ``metadata/lineage-archive.jsonl`` (append-only; ``history()``
       still returns the full record). ``changes()`` ranges that reach
       into archived lineage raise — sync downstream consumers first,
       the same consume-before-compact contract as data compaction.

    Retries on commit conflict (the streaming runner calls this inline in
    foreachBatch while concurrent writers may be committing), recomputing
    the fold from a fresh snapshot. A retry may re-append already-archived
    lineage lines; ``full_history`` de-duplicates (by version, and by
    content hash for version-less entries).
    """
    return LakeTable._retry_commit(
        lambda: _compact_manifest_once(table, keep_lineage, keep_recent_batches)
    )


def _compact_manifest_once(
    table: LakeTable,
    keep_lineage: int,
    keep_recent_batches: int,
) -> ManifestCompactResult:
    snap = table.snapshot()
    passthrough: list[str] = []
    per_job: dict[str, set[int]] = {}
    markers: dict[str, int] = {}
    for c in snap.committed:
        job, sep, bid = c.rpartition("/")
        if not sep:
            passthrough.append(c)
            continue
        if bid.startswith("<="):
            try:
                markers[job] = max(markers.get(job, -1), int(bid[2:]))
                continue
            except ValueError:
                passthrough.append(c)
                continue
        try:
            per_job.setdefault(job, set()).add(int(bid))
        except ValueError:
            passthrough.append(c)
    new_committed = list(passthrough)
    for job, ids in sorted(per_job.items()):
        hwm = markers.pop(job, -1)
        n = hwm
        while (n + 1) in ids:
            n += 1
        marker_hwm = max(n - keep_recent_batches, hwm)
        if marker_hwm >= 0:
            new_committed.append(f"{job}/<={marker_hwm}")
        new_committed.extend(
            f"{job}/{i}" for i in sorted(ids) if i > marker_hwm
        )
    # markers for jobs with no remaining explicit ids survive as-is
    new_committed.extend(f"{job}/<={n}" for job, n in sorted(markers.items()))

    n_archive = max(0, len(snap.lineage) - keep_lineage)
    archived = snap.lineage[:n_archive]
    kept = snap.lineage[n_archive:]
    if archived:
        import json as _json

        with open(_archive_path(table), "a") as f:
            for e in archived:
                f.write(_json.dumps(e) + "\n")

    if len(new_committed) == len(snap.committed) and not archived:
        return ManifestCompactResult(
            version=snap.version, skipped=True,
            committed_before=len(snap.committed),
            committed_after=len(snap.committed),
        )
    new_snap = Snapshot(
        version=snap.version + 1,
        key_field=snap.key_field,
        n_buckets=snap.n_buckets,
        schema_json=snap.schema_json,
        schemas=snap.schemas,
        current_schema_id=snap.current_schema_id,
        files=snap.files,
        committed=new_committed,
        lineage=kept
        + [{"version": snap.version + 1, "kind": "manifest_compact",
            "archived": len(archived),
            "committed_folded": len(snap.committed) - len(new_committed)}],
        properties=snap.properties,
        parent=snap.version,
    )
    md.commit_snapshot(table.root, new_snap)
    return ManifestCompactResult(
        version=new_snap.version,
        committed_before=len(snap.committed),
        committed_after=len(new_committed),
        lineage_archived=len(archived),
    )


def _archive_path(table: LakeTable) -> str:
    return os.path.join(table.root, "metadata", "lineage-archive.jsonl")


def full_history(table: LakeTable) -> list[dict]:
    """Complete lineage: archived entries + the snapshot's live tail.

    De-duplicates twice-archived entries — a crashed or conflict-retried
    compaction appends the same lines again (the archive write happens
    before the commit on purpose: archiving after would lose entries if
    the process dies between commit and append, since the new snapshot has
    already dropped them). Versioned entries dedupe by version; pre-stamp
    (version-less) entries dedupe by full content hash."""
    import json as _json

    out: list[dict] = []
    seen: set[int] = set()
    seen_unversioned: set[str] = set()

    def _add(e: dict) -> None:
        v = e.get("version")
        if v is None:
            k = _json.dumps(e, sort_keys=True)
            if k in seen_unversioned:
                return
            seen_unversioned.add(k)
            out.append(e)
        elif v not in seen:
            seen.add(v)
            out.append(e)

    path = _archive_path(table)
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                _add(_json.loads(line))
    for e in table.snapshot().lineage:
        _add(e)
    return out
