"""API-source interval pull-sync (S8): chunked time-interval re-sync.

Reference semantics (re-derived, no code ported):
- a pull driver enumerates the time intervals it can load and returns
  the objects of one interval at a time
  (/root/reference/server/drivers/driver.go:8-22);
- the sync service keeps a per-interval SIGNATURE (a change watermark
  with a trailing-lag rule, /root/reference/server/drivers/
  time_interval.go:32-39) and re-syncs only intervals whose signature
  changed, replacing that interval's rows in the destination.

Spark-first re-expression: an interval re-sync IS
``lake.maintenance.overwrite_where`` — an atomic, idempotent,
predicate-scoped replace. The chunk_id is ``<interval>:<signature>``, so
a re-run of an unchanged interval is skipped by the engine's own commit
manifest even if the sidecar state is lost (two independent idempotency
layers), while a changed signature mints a new chunk_id and re-applies.

At 100 TB: each interval chunk is an independent bounded job (the
reference's 16-task worker pool maps to running several interval syncs
concurrently — each overwrite commits optimistically); the destination
scan prunes to the predicate's time range via min/max stats.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jitsu_spark.lake.maintenance import overwrite_where
from jitsu_spark.lake.table import LakeTable


@dataclass(frozen=True)
class TimeInterval:
    """One loadable chunk: [lower, upper) as ISO strings; ``id`` is the
    stable chunk identity (reference: TZ_granularity_time string).

    ``is_all=True`` marks the reference's ALL granularity (full-snapshot
    sources like Firebase/Redis, drivers/granularity.go:14): the chunk
    covers the WHOLE table and is re-evaluated on every run."""

    id: str
    lower: str  # inclusive, e.g. "2024-01-01 00:00:00"
    upper: str  # exclusive
    is_all: bool = False


class IntervalDriver:
    """A pull source = interval enumeration + per-interval read + a
    change signature (watermark). Implement for each upstream API."""

    def available_intervals(self) -> list[TimeInterval]:  # pragma: no cover
        raise NotImplementedError

    def read_interval(
        self, spark: SparkSession, interval: TimeInterval
    ) -> DataFrame:  # pragma: no cover
        raise NotImplementedError

    def read_interval_pages(
        self, spark: SparkSession, interval: TimeInterval, start_page: int = 0
    ):
        """Yield the interval's rows as one or more page frames — the
        reference's paginated report loop (google_analytics.go:124
        GetObjectsFor pages through report rows). Drivers whose upstream
        pages responses override this; the sync job unions all pages
        into ONE chunk commit, so pagination never changes the
        signature/commit semantics. ``start_page`` resumes a partially
        fetched interval (pages before it were already durably spooled by
        the sync job — the upstream fetches they stand for are NOT
        repeated). Default: a single page."""
        if start_page == 0:
            yield self.read_interval(spark, interval)

    def signature(self, interval: TimeInterval) -> str:  # pragma: no cover
        raise NotImplementedError

    def layout_signature(self) -> str:
        """Identity of the report/pagination LAYOUT (page size, requested
        dimensions/metrics, granularity — anything that changes how the
        same upstream data is sliced into page frames). The page spool
        binds this alongside the interval signature, so a config change
        between a crash and its resume discards half-fetched pages
        instead of silently mixing two pagination layouts. Time-based
        signatures alone cannot see a config edit. Default: empty
        (driver has a single fixed layout)."""
        return ""


@dataclass
class SyncReport:
    synced: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    # per-interval decision, mirroring the reference sync executor's log
    # states (/root/reference/server/synchronization/task_executor.go:
    # 221-228, re-derived): NEW (no stored signature), REFRESH (signature
    # changed), UPTODATE (unchanged — skipped)
    statuses: dict[str, str] = field(default_factory=dict)


class IntervalSyncJob:
    """Signature-gated interval re-sync into a LakeTable."""

    def __init__(
        self,
        table: LakeTable,
        driver: IntervalDriver,
        ts_col: str,
        state_path: str,
        job_id: str = "interval-sync",
        page_spool_dir: str | None = None,
    ):
        self.table = table
        self.driver = driver
        self.ts_col = ts_col
        self.state_path = state_path
        self.job_id = job_id
        #: when set, page frames are spooled durably as they are fetched
        #: and a crash mid-interval resumes at the next UNFETCHED page
        #: (same signature) instead of repeating the upstream page reads —
        #: the reference GA driver's page loop plus chunked-state resume.
        #: The interval still lands as ONE atomic overwrite at the end, so
        #: readers never see a partial interval.
        self.page_spool_dir = page_spool_dir

    # -- durable page spool (mid-interval resume) ---------------------------

    def _spool_base(self, itv: TimeInterval) -> str:
        # namespaced by job_id: two sync jobs sharing one page_spool_dir
        # (e.g. a GA report and an FB report, both DAY granularity) must
        # never serve each other's spooled frames even when their interval
        # ids and timestamp signatures coincide
        def _safe(s: str) -> str:
            return "".join(c if c.isalnum() or c in "-_." else "_" for c in s)

        return os.path.join(
            self.page_spool_dir, _safe(self.job_id), _safe(itv.id)
        )

    def _spool_pages(self, spark: SparkSession, itv: TimeInterval,
                     sig: str) -> DataFrame:
        """Fetch the interval's pages from the first one not yet durably
        spooled, then return one frame over ALL spooled pages. Page
        progress is only advanced AFTER a page's parquet rename, so every
        crash window re-fetches at most one page; a signature change
        discards the spool (the upstream mutated — partial pages of the
        old report must not mix with new ones)."""
        import hashlib
        import shutil

        from pyspark.sql import types as T

        base = self._spool_base(itv)
        # the spool tag binds the layout signature TOO: a page_size /
        # report-config change between crash and resume must discard the
        # spool (old-layout pages 0..k-1 + new-layout pages k.. would
        # silently drop or duplicate rows)
        tag = hashlib.md5(
            (sig + "\x00" + self.driver.layout_signature()).encode()
        ).hexdigest()[:12]
        meta_path = os.path.join(base, "pages.json")
        meta: dict = {}
        try:
            with open(meta_path) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            pass
        if meta.get("sig") != tag:
            shutil.rmtree(base, ignore_errors=True)
            meta = {"sig": tag, "next_page": 0, "schema": None}
        os.makedirs(base, exist_ok=True)
        start = int(meta.get("next_page", 0))
        for k, page in enumerate(
            self.driver.read_interval_pages(spark, itv, start_page=start),
            start=start,
        ):
            pdir = os.path.join(base, f"p{k:06d}")
            tmp = pdir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            page.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(pdir, ignore_errors=True)
            os.rename(tmp, pdir)
            meta["schema"] = page.schema.json()
            meta["next_page"] = k + 1
            with open(meta_path + ".tmp", "w") as f:
                json.dump(meta, f)
            os.replace(meta_path + ".tmp", meta_path)
        pages = sorted(
            os.path.join(base, d)
            for d in os.listdir(base)
            if d.startswith("p") and not d.endswith((".tmp", ".json"))
        )
        if meta["schema"] is None or not pages:
            # a driver that yielded zero pages — fall through to the
            # unpaged read (nothing was fetched, nothing is saved)
            return self.driver.read_interval(spark, itv)
        # explicit schema: an all-empty report writes footer-less page
        # dirs that schema inference cannot read
        schema = T.StructType.fromJson(json.loads(meta["schema"]))
        return spark.read.schema(schema).parquet(*pages)

    def _spool_cleanup(self, itv: TimeInterval) -> None:
        import shutil

        shutil.rmtree(self._spool_base(itv), ignore_errors=True)

    def _load_state(self) -> dict:
        try:
            with open(self.state_path) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {}

    def _save_state(self, state: dict) -> None:
        tmp = self.state_path + ".tmp"
        os.makedirs(os.path.dirname(self.state_path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.state_path)

    def run_once(self, spark: SparkSession, max_workers: int = 1) -> SyncReport:
        """Sync every interval whose signature changed since the last
        run. Each interval is one atomic overwrite; state is saved after
        each interval so a crash resumes where it left off.

        ``max_workers > 1`` syncs intervals CONCURRENTLY (the reference
        executor's worker pool re-expressed): each interval's overwrite
        commits optimistically and retries on conflict, and the sidecar
        state is updated under a lock as each interval lands. On failure
        the completed intervals stay committed — the next run resumes
        with only the unfinished ones."""
        import threading
        from concurrent.futures import ThreadPoolExecutor

        state = self._load_state()
        report = SyncReport()
        todo: list[tuple[TimeInterval, str]] = []
        for itv in self.driver.available_intervals():
            sig = self.driver.signature(itv)
            stored = state.get(itv.id)
            # an ALL interval bypasses the signature gate (reference:
            # task_executor.go:224 re-syncs on `interval.IsAll()` every
            # run); the engine's commit manifest still dedupes a re-sync
            # whose content signature is unchanged (chunk_id embeds it)
            if stored == sig and not itv.is_all:
                report.statuses[itv.id] = "UPTODATE"
                report.skipped.append(itv.id)
                continue
            report.statuses[itv.id] = "NEW" if stored is None else "REFRESH"
            todo.append((itv, sig))

        lock = threading.Lock()
        done: set[str] = set()

        def sync_one(itv: TimeInterval, sig: str) -> None:
            from functools import reduce

            if self.page_spool_dir is not None:
                df = self._spool_pages(spark, itv, sig)
            else:
                pages = list(self.driver.read_interval_pages(spark, itv))
                df = (
                    pages[0]
                    if len(pages) == 1
                    else reduce(DataFrame.unionByName, pages)
                )
            if itv.is_all:
                pred = F.lit(True)
            else:
                pred = (
                    F.col(self.ts_col) >= F.lit(itv.lower).cast("timestamp")
                ) & (F.col(self.ts_col) < F.lit(itv.upper).cast("timestamp"))
            overwrite_where(
                self.table, df, pred,
                chunk_id=f"{itv.id}:{sig}", job_id=self.job_id,
                # files whose ts stats can't intersect [lower, upper) are
                # kept in place (needs table property write.stats.column;
                # harmlessly rewrites everything without it). An ALL
                # interval replaces the whole table — nothing to prune.
                prune=None if itv.is_all
                else (self.ts_col, itv.lower, itv.upper),
                # worst case every other worker lands one commit while
                # this one recomputes — budget a retry per peer, plus
                # the single-writer default
                max_commit_retries=5 + 2 * max(max_workers - 1, 0),
            )
            with lock:
                state[itv.id] = sig
                self._save_state(state)
                done.add(itv.id)
            if self.page_spool_dir is not None:
                # after the state save: a crash between overwrite and
                # save re-reads the finished spool (zero refetches) and
                # dedups on the chunk manifest
                self._spool_cleanup(itv)

        if max_workers <= 1:
            for itv, sig in todo:
                sync_one(itv, sig)
                report.synced.append(itv.id)
        else:
            with ThreadPoolExecutor(max_workers=max_workers) as pool:
                futures = [pool.submit(sync_one, itv, sig) for itv, sig in todo]
                errors = [f.exception() for f in futures if f.exception()]
            report.synced = [itv.id for itv, _ in todo if itv.id in done]
            if errors:
                raise errors[0]
        return report
