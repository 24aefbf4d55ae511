"""Bucketed parquet lake table with snapshot isolation and schema evolution.

Scale design (the part that must survive 100 TB / 1000 executors):

- **Hash-bucketed layout.** Every row lives in bucket
  ``pmod(xxhash64(key), n_buckets)``; a bucket is a directory of parquet
  files tracked in the snapshot. A CDC merge touches ONLY the buckets that
  contain changed keys — bucket pruning happens at the metadata layer
  (driver-side file-list selection), strictly better than relying on
  catalog partition discovery. Size ``n_buckets`` so one bucket's live data
  fits a task comfortably (e.g. 100 TB / 4096 buckets ≈ 25 GB per bucket,
  split further into parquet row-groups → many input splits per bucket).
- **Copy-on-write per bucket, zero-shuffle rewrite.** The merge rewrites an
  affected bucket by streaming its files through a broadcast anti-join
  (see merge.py) — the big existing side never shuffles.
- **Reads are pruned + aligned.** Files record the physical schema id they
  were written under; the reader groups files by schema id, reads each
  group with its exact schema (no inference, no mergeSchema scan), and
  casts to the current logical schema in one projection.
- **Atomic snapshot commits** (metadata.py) give readers snapshot isolation
  and writers optimistic concurrency.

This is the same architecture as Iceberg CoW tables; it exists from scratch
here because the sandbox has no lakehouse jars. On a real cluster the
public API of this class maps onto Iceberg DDL + MERGE INTO directly.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jitsu_spark.lake import metadata as md
from jitsu_spark.lake.metadata import CommitConflict, Snapshot
from jitsu_spark.typesys.align import align_to_schema

BUCKET_COL = "_jb"  # internal bucket column used only around writes
MOR_OP_COL = "_mor_op_file"  # op column persisted inside MoR delta files
WRITE_MODE_PROP = "write.mode"  # "cow" (default) | "mor"
# Optional: bucket on the key's PREFIX up to (excluding) the first
# occurrence of this separator instead of the whole key. Keys sharing a
# prefix then co-locate in one bucket, so a read can bucket-prune by the
# prefix alone — the inverted-index layout (e.g. all occurrences of one
# passage keyed "hash#doc#pos" land together). A probe value that contains
# no separator hashes to itself, so bucket_expr(prefix) == the bucket of
# every full key with that prefix. Requires a STRING key; the separator
# must never appear inside the prefix component.
BUCKET_PREFIX_SEP_PROP = "bucket.prefix_sep"


@dataclass
class CommitResult:
    version: int
    skipped: bool = False
    n_rows: int | None = None


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)

    # -- lifecycle ----------------------------------------------------------

    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_field: str,
        n_buckets: int = 16,
        properties: dict | None = None,
    ) -> "LakeTable":
        if key_field not in schema.fieldNames():
            raise ValueError(f"key field {key_field!r} not in schema")
        kt = schema[key_field].dataType
        if isinstance(kt, (T.ArrayType, T.StructType, T.MapType)):
            raise ValueError("key field must be scalar (never key on arrays)")
        if (properties or {}).get(BUCKET_PREFIX_SEP_PROP) and not isinstance(
            kt, T.StringType
        ):
            raise ValueError(
                f"{BUCKET_PREFIX_SEP_PROP} requires a string key "
                "(the bucket is the hash of the key's prefix component)"
            )
        snap = Snapshot(
            version=0,
            key_field=key_field,
            n_buckets=n_buckets,
            schema_json=schema.json(),
            schemas={"0": schema.json()},
            current_schema_id="0",
            files={},
            properties=properties or {},
            parent=None,
        )
        md.init_table_dir(os.path.abspath(root), snap)
        return LakeTable(spark, root)

    @staticmethod
    def load(spark: SparkSession, root: str) -> "LakeTable":
        md.current_version(os.path.abspath(root))  # raises if absent
        return LakeTable(spark, root)

    @staticmethod
    def exists(root: str) -> bool:
        try:
            md.current_version(os.path.abspath(root))
            return True
        except FileNotFoundError:
            return False

    # -- snapshot / schema --------------------------------------------------

    def snapshot(self, version: int | None = None) -> Snapshot:
        return md.load_snapshot(self.root, version)

    def schema(self, version: int | None = None) -> T.StructType:
        return T.StructType.fromJson(
            __import__("json").loads(self.snapshot(version).schema_json)
        )

    def bucket_expr(self, key_col, n_buckets: int | None = None) -> F.Column:
        """Bucket id for a key value. With ``bucket.prefix_sep`` set, the
        hash covers only the key's prefix (text before the first
        separator) — a bare prefix therefore hashes to the same bucket as
        every full key carrying it, which is what makes prefix-pruned
        reads exact."""
        snap = self.snapshot()
        n = snap.n_buckets if n_buckets is None else n_buckets
        sep = snap.properties.get(BUCKET_PREFIX_SEP_PROP)
        base = F.substring_index(key_col, sep, 1) if sep else key_col
        return F.pmod(F.xxhash64(base), F.lit(n)).cast("int")

    def write_mode(self, snap: Snapshot | None = None) -> str:
        """'cow' (default): merges rewrite affected buckets, reads are
        plain scans. 'mor': merges append LWW'd delta files (O(batch)
        writes regardless of table size), reads reconcile base+deltas;
        compaction folds deltas back into base."""
        snap = snap or self.snapshot()
        return snap.properties.get(WRITE_MODE_PROP, "cow")

    # -- read path ----------------------------------------------------------

    def read(
        self,
        buckets: list[int] | None = None,
        version: int | None = None,
        snap: Snapshot | None = None,
        prune: tuple[str, str, str] | None = None,
    ) -> DataFrame:
        """Snapshot-consistent merged scan, pruned to ``buckets`` if given.

        Files are grouped by physical schema id (and, for merge-on-read
        deltas, by commit sequence); each group is read with its exact
        schema (no footer-merging scan) and cast to the logical schema in a
        single projection.

        MoR reconcile is **delta-aware per bucket**: rows are hash-bucketed
        by key, so a key never spans buckets, and only the buckets that
        actually contain delta files need the LWW reconcile aggregate
        (max_by commit-seq per key, delta tombstones drop the key). Clean
        buckets — including every bucket of a CoW table — union in as plain
        pruned scans with no aggregate and no shuffle. At 100 TB with one
        hot delta'd bucket this shuffles that one bucket, not the table.

        ``prune=(col, lo, hi)``: additionally skip CLEAN-bucket files
        whose per-file stats (write.stats.column tables) cannot contain a
        row with ``col`` in [lo, hi). The result is a SUPERSET of the
        matching rows — the caller still applies its own filter; pruning
        only avoids opening files that cannot matter. Dirty buckets are
        never file-pruned: the LWW reconcile must see every delta of a
        key regardless of the pruned column's range.
        """
        snap = snap or self.snapshot(version)
        logical = T.StructType.fromJson(__import__("json").loads(snap.schema_json))
        wanted = (
            set(str(b) for b in buckets) if buckets is not None else set(snap.files)
        )

        def excluded(e: dict) -> bool:
            if prune is None:
                return False
            col, lo, hi = prune
            st = (e.get("stats") or {}).get(col)
            return st is not None and (st[1] < lo or st[0] >= hi)

        # split selected buckets: clean (base-only) vs dirty (>=1 delta file)
        clean_groups: dict[str, list[str]] = {}  # schema_id -> paths
        dirty_groups: dict[tuple[str, int], list[str]] = {}  # (sid, mseq) -> paths
        for b, entries in snap.files.items():
            if b not in wanted:
                continue
            if any(e.get("kind", "base") == "delta" for e in entries):
                for e in entries:
                    dirty_groups.setdefault(
                        (e["schema_id"], int(e.get("mseq", 0))), []
                    ).append(os.path.join(self.root, e["path"]))
            else:
                for e in entries:
                    if excluded(e):
                        continue
                    clean_groups.setdefault(e["schema_id"], []).append(
                        os.path.join(self.root, e["path"])
                    )
        if not clean_groups and not dirty_groups:
            return self.spark.createDataFrame([], logical)

        parts = []
        for sid, paths in clean_groups.items():
            phys = T.StructType.fromJson(__import__("json").loads(snap.schemas[sid]))
            df = self.spark.read.schema(phys).parquet(*paths)
            parts.append(align_to_schema(df, logical))
        if dirty_groups:
            parts.append(self._reconcile_scan(dirty_groups, snap, logical))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _reconcile_scan(
        self,
        groups: dict[tuple[str, int], list[str]],
        snap: Snapshot,
        logical: T.StructType,
    ) -> DataFrame:
        """LWW-reconcile base+delta files of delta-bearing buckets: base
        rows carry (_mseq=0, _op='u'); delta rows their commit seq and real
        op; latest wins, 'd' drops the key."""
        key = snap.key_field
        from jitsu_spark.typesys.align import alignment_columns

        parts = []
        for (sid, mseq), paths in groups.items():
            phys = T.StructType.fromJson(__import__("json").loads(snap.schemas[sid]))
            if mseq > 0:  # delta files persist their op column
                phys = T.StructType(
                    list(phys.fields) + [T.StructField(MOR_OP_COL, T.StringType())]
                )
            df = self.spark.read.schema(phys).parquet(*paths)
            op_col = F.col(MOR_OP_COL) if mseq > 0 else F.lit("u")
            parts.append(
                df.select(
                    *alignment_columns(df, logical),
                    F.lit(mseq).cast("long").alias("_mor_seq"),
                    op_col.alias("_mor_op"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        payload = [f.name for f in logical.fields if f.name != key]
        winner = F.max_by(
            F.struct(*[F.col(c) for c in payload], F.col("_mor_op")),
            F.col("_mor_seq"),
        ).alias("_w")
        return (
            out.groupBy(key)
            .agg(winner)
            .select(key, "_w.*")
            .filter(F.col("_mor_op") != "d")
            .drop("_mor_op")
            .select(*[f.name for f in logical.fields])
        )

    def changes(
        self, since_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Incremental (CDC-out) read: the change rows committed in
        versions (since_version, to_version] — the engine's analog of an
        Iceberg changelog scan, feeding downstream incremental pipelines
        without a full-table diff.

        Exact for merge-on-read tables: each MoR merge lands one
        LWW'd-per-batch delta file per bucket, stamped with its commit
        sequence, so the changelog IS those files. Returns the payload
        columns plus ``_change_op`` ('i'/'u'/'d') and ``_commit_version``.

        Raises if the range contains a commit whose row-level changes are
        not reconstructible from files (CoW merge rewrites, overwrites) —
        exactly the Iceberg changelog-scan caveat. Maintenance commits are
        tolerated where they provably preserve the window's deltas:
        ``manifest_compact`` always (metadata-only — data files untouched),
        and ``compact``/``rebucket`` when no unconsumed merge PRECEDES the
        fold inside the window (the fold erases prior merges' delta files,
        so a lagging consumer must raise; a fully-caught-up consumer whose
        window merely STARTS before a background compaction is fine — the
        steady-state regime of every continuously-compacted stream)."""
        snap = self.snapshot(to_version)
        hi = snap.version if to_version is None else to_version
        logical = T.StructType.fromJson(__import__("json").loads(snap.schema_json))
        if self.write_mode(snap) != "mor":
            raise ValueError(
                "changes() needs write.mode=mor (CoW merges rewrite whole "
                "buckets; row-level changes are not reconstructible)"
            )
        # verify every in-range commit is a MoR delta merge. Entries are
        # matched by their stamped "version"; positional lookup remains as
        # the fallback for pre-stamp tables (full, untruncated lineage
        # only — after compact_manifest archives old entries, position no
        # longer encodes the version).
        by_version = {
            e["version"]: e for e in snap.lineage if "version" in e
        }
        full_positional = len(snap.lineage) == snap.version
        merges_before_fold = 0
        for v in range(since_version + 1, hi + 1):
            entry = by_version.get(v)
            if entry is None and full_positional and v - 1 < len(snap.lineage):
                entry = snap.lineage[v - 1]
            if entry is None:
                raise ValueError(
                    f"changes({since_version}, {hi}): lineage for commit "
                    f"{v} is archived (manifest compaction) — sync "
                    "downstream consumers before compact_manifest"
                )
            kind = entry.get("kind")
            if kind == "merge":
                merges_before_fold += 1
            elif kind == "manifest_compact":
                continue  # metadata-only: every delta file survives
            elif kind in ("compact", "rebucket"):
                if merges_before_fold:
                    raise ValueError(
                        f"changes({since_version}, {hi}): commit {v} is a "
                        f"{kind} that folded {merges_before_fold} "
                        "not-yet-consumed merge(s)' delta files into base — "
                        "row-level changes are lost (sync consumers past "
                        "every merge BEFORE compact/rebucket)"
                    )
            else:
                raise ValueError(
                    f"changes({since_version}, {hi}): commit {v} is "
                    f"{kind!r}, not a delta merge — row-level "
                    "changes are not reconstructible (consume changes "
                    "before overwrite/append, or use MoR write mode)"
                )
        groups: dict[tuple[str, int], list[str]] = {}
        for entries in snap.files.values():
            for e in entries:
                mseq = int(e.get("mseq", 0))
                if e.get("kind", "base") == "delta" and since_version < mseq <= hi:
                    groups.setdefault((e["schema_id"], mseq), []).append(
                        os.path.join(self.root, e["path"])
                    )
        if not groups:
            out_schema = T.StructType(
                list(logical.fields)
                + [
                    T.StructField("_change_op", T.StringType()),
                    T.StructField("_commit_version", T.LongType()),
                ]
            )
            return self.spark.createDataFrame([], out_schema)
        from jitsu_spark.typesys.align import alignment_columns

        parts = []
        for (sid, mseq), paths in groups.items():
            phys = T.StructType.fromJson(__import__("json").loads(snap.schemas[sid]))
            phys = T.StructType(
                list(phys.fields) + [T.StructField(MOR_OP_COL, T.StringType())]
            )
            df = self.spark.read.schema(phys).parquet(*paths)
            parts.append(
                df.select(
                    *alignment_columns(df, logical),
                    F.col(MOR_OP_COL).alias("_change_op"),
                    F.lit(mseq).cast("long").alias("_commit_version"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # -- write path (internal; public entry points are in merge.py) ---------

    def _write_files(self, df_with_bucket: DataFrame) -> dict[str, list[str]]:
        """Write ``df`` (carrying BUCKET_COL) under a fresh commit-token dir,
        one subdir per bucket; returns {bucket: [relative paths]}.

        No shuffle is introduced here: ``partitionBy`` splits by value within
        each task, and upstream merge plans keep each task single-bucket.
        """
        token = uuid.uuid4().hex[:12]
        rel_dir = os.path.join("data", f"c-{token}")
        out_dir = os.path.join(self.root, rel_dir)
        (
            df_with_bucket.write.partitionBy(BUCKET_COL)
            .mode("error")
            .parquet(out_dir)
        )
        files: dict[str, list[str]] = {}
        if os.path.isdir(out_dir):
            for d in os.listdir(out_dir):
                if not d.startswith(f"{BUCKET_COL}="):
                    continue
                b = d.split("=", 1)[1]
                for fn in os.listdir(os.path.join(out_dir, d)):
                    if fn.endswith(".parquet"):
                        files.setdefault(b, []).append(os.path.join(rel_dir, d, fn))
        return files

    def _commit(self, snap: Snapshot) -> None:
        md.commit_snapshot(self.root, snap)

    @staticmethod
    def _retry_commit(fn, max_commit_retries: int = 5):
        """Optimistic-concurrency wrapper for maintenance commits (same
        contract as merge_batch's loop): on CommitConflict re-snapshot and
        recompute the whole op. Without this a conflict raised out of a
        maintenance call inside foreachBatch (the runner compacts inline)
        kills the stream even though the op is safely repeatable.

        A short linearly-growing sleep between attempts de-synchronizes
        racing workers (N writers racing the same version otherwise retry
        in lockstep and one can starve through the whole budget)."""
        import time as _time

        last: CommitConflict | None = None
        for attempt in range(max_commit_retries):
            try:
                return fn()
            except CommitConflict as e:
                last = e
                _time.sleep(0.05 * attempt)
        raise last  # type: ignore[misc]

    # -- per-file column stats (Iceberg-manifest-style pruning metadata) ----

    STATS_COL_PROP = "write.stats.column"

    def stats_column(self, snap: Snapshot | None = None) -> str | None:
        """Column whose per-file min/max is recorded at write time (table
        property ``write.stats.column``) — enables file-level pruning for
        predicate-scoped rewrites (overwrite_where) even though the
        layout is hash-bucketed by key, not by that column."""
        snap = snap or self.snapshot()
        return snap.properties.get(self.STATS_COL_PROP)

    def build_entries(
        self,
        new_files: dict[str, list[str]],
        schema_id: str,
        snap: Snapshot | None = None,
        **extra,
    ) -> dict[str, list[dict]]:
        """File entries for a commit, with per-file stats attached when
        the table declares a stats column."""
        scol = self.stats_column(snap)
        stats = self.file_stats(new_files, scol) if scol else {}
        return {
            b: [
                {
                    "path": p,
                    "schema_id": schema_id,
                    **extra,
                    **({"stats": {scol: stats[p]}} if p in stats else {}),
                }
                for p in paths
            ]
            for b, paths in new_files.items()
        }

    def file_stats(
        self, files: dict[str, list[str]], col: str
    ) -> dict[str, list]:
        """[min, max] of ``col`` per written file, read from the parquet
        FOOTERS driver-side (no Spark job; bounded by files-per-commit).
        Timestamps normalize to naive-UTC ``str(datetime)`` so stored
        stats compare lexicographically with predicate bounds."""
        import datetime as dt

        import pyarrow.parquet as pq

        def norm(v):
            if isinstance(v, dt.datetime):
                if v.tzinfo is not None:
                    v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
                return str(v)
            return v

        out: dict[str, list] = {}
        for paths in files.values():
            for rel in paths:
                meta = pq.read_metadata(os.path.join(self.root, rel))
                names = [meta.schema.column(i).name for i in range(meta.num_columns)]
                if col not in names:
                    continue
                ci = names.index(col)
                lo = hi = None
                ok = True
                for rg in range(meta.num_row_groups):
                    st = meta.row_group(rg).column(ci).statistics
                    if st is None or not st.has_min_max:
                        ok = False
                        break
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
                if ok and lo is not None:
                    out[rel] = [norm(lo), norm(hi)]
        return out

    # -- maintenance --------------------------------------------------------

    def compact(self, max_files_per_bucket: int = 8) -> CommitResult:
        """Rewrite fragmented buckets (small-file compaction).

        CoW merges add a few files per affected bucket per micro-batch; this
        folds any bucket whose file count exceeds the threshold back to one
        file. Analogous to Iceberg rewrite_data_files. Retries on commit
        conflict (concurrent writers), recomputing from a fresh snapshot.
        """
        return self._retry_commit(lambda: self._compact_once(max_files_per_bucket))

    def _compact_once(self, max_files_per_bucket: int) -> CommitResult:
        snap = self.snapshot()
        frag = [b for b, es in snap.files.items() if len(es) > max_files_per_bucket]
        if not frag:
            return CommitResult(version=snap.version, skipped=True)
        df = self.read(buckets=[int(b) for b in frag], snap=snap)
        key = snap.key_field
        df = df.withColumn(BUCKET_COL, self.bucket_expr(F.col(key)))
        df = df.repartition(len(frag), F.col(BUCKET_COL))
        new_files = self._write_files(df)
        files = dict(snap.files)
        compact_entries = self.build_entries(
            new_files, snap.current_schema_id, snap
        )
        for b in frag:
            if b in compact_entries:
                files[b] = compact_entries[b]
            else:
                files.pop(b, None)
        new_snap = Snapshot(
            version=snap.version + 1,
            key_field=snap.key_field,
            n_buckets=snap.n_buckets,
            schema_json=snap.schema_json,
            schemas=snap.schemas,
            current_schema_id=snap.current_schema_id,
            files=files,
            committed=snap.committed,
            lineage=snap.lineage
            + [{"version": snap.version + 1, "kind": "compact",
                "buckets": frag}],
            properties=snap.properties,
            parent=snap.version,
        )
        self._commit(new_snap)
        return CommitResult(version=new_snap.version)

    def rebucket(self, factor: int = 2) -> CommitResult:
        """Bucket-count evolution: grow the hash-bucket count by an integer
        ``factor`` (admin op for table growth — a table created at 16
        buckets for 10^8 rows needs more at 10^10, or per-bucket files
        outgrow executor memory and merge parallelism caps at n_buckets).

        Because bucketing is ``pmod(xxhash64(key), n)`` and
        ``new_n = factor * n``, every old bucket b's rows land ONLY in the
        factor new buckets {b, b+n, ..., b+(factor-1)n} — the rewrite is a
        narrow per-task split (``partitionBy`` at write), never a global
        shuffle. The commit manifest carries over, so exactly-once
        continuity is preserved across the resize; subsequent merges hash
        against the new count automatically (bucket_expr reads the
        snapshot). MoR deltas are folded into base during the rewrite.

        Like compaction, a rebucket folds delta files — a ``changes()``
        window is legal across it only when every in-window merge comes
        AFTER it (a fully-caught-up consumer; a lagging one still raises,
        see ``changes()``). Consumers reading pre-images at an older
        version must resolve bucket ids against THAT version's layout
        (``snapshot(v).n_buckets``), as ``lake/mirror.WindowImages``
        does — current-layout ids don't exist in the old snapshot.
        Retries on commit conflict, recomputing from a fresh snapshot."""
        if factor < 2:
            raise ValueError("factor must be >= 2")
        return self._retry_commit(lambda: self._rebucket_once(factor))

    def _rebucket_once(self, factor: int) -> CommitResult:
        snap = self.snapshot()
        new_n = snap.n_buckets * factor
        key = snap.key_field
        df = self.read(snap=snap).withColumn(
            BUCKET_COL, self.bucket_expr(F.col(key), n_buckets=new_n)
        )
        new_files = self._write_files(df)
        entries = self.build_entries(new_files, snap.current_schema_id, snap)
        new_snap = Snapshot(
            version=snap.version + 1,
            key_field=key,
            n_buckets=new_n,
            schema_json=snap.schema_json,
            schemas=snap.schemas,
            current_schema_id=snap.current_schema_id,
            files=entries,
            committed=snap.committed,
            lineage=snap.lineage
            + [{"version": snap.version + 1, "kind": "rebucket",
                "from": snap.n_buckets, "to": new_n}],
            properties=snap.properties,
            parent=snap.version,
        )
        self._commit(new_snap)
        return CommitResult(version=new_snap.version)

    def history(self) -> list[dict]:
        return list(self.snapshot().lineage)
