"""Source-sync scheduling (ST9): cron-timed, deduplicated, prioritized
task dispatch for the sync jobs in :mod:`jitsu_spark.sources`.

Reference semantics (re-derived, no code ported):
- one cron entry per (source, collection), standard 5-field specs plus
  the ``@``-descriptors; double-scheduling a pair is an error reporting
  next/last run (`server/scheduling/cron.go:42-64`);
- a fired entry does NOT run inline — it enqueues a sync task, skipped
  if the same pair is already queued or currently running
  (`server/synchronization/task_service.go:106-152`);
- queue order is ``priority_value * 10^12 - created_at_unix`` popped
  highest-first, so NOW > HIGH > LOW and, within a priority, older
  tasks first (`server/synchronization/priority.go:21-24`);
- a task that fails to schedule is retried up to 2 more times with a
  linear backoff of ``retry_count`` minutes
  (`server/synchronization/task_service.go:88-94`).

Everything is driven by an explicit ``now`` (a ``datetime``), never the
wall clock, so schedules are deterministic and testable with a fake
clock; a production loop just calls ``tick(datetime.now())`` on its own
cadence. This is driver-side control plane — the work a task does is a
sync job that launches distributed Spark jobs; the scheduler itself
holds O(entries + queued tasks) state.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta
from enum import IntEnum
from typing import Callable

_DESCRIPTORS = {
    "@hourly": "0 * * * *",
    "@daily": "0 0 * * *",
    "@midnight": "0 0 * * *",
    "@weekly": "0 0 * * 0",
    "@monthly": "0 0 1 * *",
    "@yearly": "0 0 1 1 *",
    "@annually": "0 0 1 1 *",
}

_FIELD_RANGES = ((0, 59), (0, 23), (1, 31), (1, 12), (0, 6))


def _parse_field(spec: str, lo: int, hi: int) -> frozenset[int]:
    vals: set[int] = set()
    for part in spec.split(","):
        step, stepped = 1, False
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            stepped = True
            if step < 1:
                raise ValueError(f"bad cron step: {step_s}")
        if part == "*":
            start, end = lo, hi
        elif "-" in part:
            a, b = part.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = end = int(part)
            if stepped:
                end = hi  # "N/step" means start at N (vixie-cron extension)
        if not (lo <= start <= hi and lo <= end <= hi and start <= end):
            raise ValueError(f"cron field out of range: {part} not in {lo}-{hi}")
        vals.update(range(start, end + 1, step))
    return frozenset(vals)


@dataclass(frozen=True)
class CronSpec:
    """5-field cron (minute hour day-of-month month day-of-week, Sunday=0)
    with lists/ranges/steps, the @-descriptors, and @every <N>{s,m,h,d}.
    Standard cron OR rule: when BOTH dom and dow are restricted, a time
    matches if EITHER does."""

    minute: frozenset[int]
    hour: frozenset[int]
    dom: frozenset[int]
    month: frozenset[int]
    dow: frozenset[int]
    dom_star: bool
    dow_star: bool
    every: timedelta | None = None
    source: str = ""

    @staticmethod
    def parse(spec: str) -> "CronSpec":
        raw = spec.strip()
        if raw.split(None, 1)[:1] == ["@every"]:
            parts = raw.split(None, 1)
            qty = parts[1].strip() if len(parts) == 2 else ""
            unit = {"s": 1, "m": 60, "h": 3600, "d": 86400}.get(qty[-1:])
            if unit is None or not qty[:-1].isdigit():
                raise ValueError(f"bad @every duration: {spec!r}")
            secs = int(qty[:-1]) * unit
            if secs <= 0:
                raise ValueError(f"bad @every duration: {spec}")
            star = frozenset()
            return CronSpec(star, star, star, star, star, True, True,
                            timedelta(seconds=secs), raw)
        raw = _DESCRIPTORS.get(raw, raw)
        fields = raw.split()
        if len(fields) != 5:
            raise ValueError(f"cron spec needs 5 fields: {spec!r}")
        parsed = [
            _parse_field(f, lo, hi) for f, (lo, hi) in zip(fields, _FIELD_RANGES)
        ]
        return CronSpec(
            *parsed,
            # vixie/robfig star BIT: set when the field begins with '*'
            # (including '*/n' steps) — governs the dom/dow AND-vs-OR rule
            dom_star=fields[2].startswith("*"),
            dow_star=fields[4].startswith("*"),
            source=spec,
        )

    def _matches(self, t: datetime) -> bool:
        if t.minute not in self.minute or t.hour not in self.hour:
            return False
        if t.month not in self.month:
            return False
        dom_ok = t.day in self.dom
        dow_ok = (t.isoweekday() % 7) in self.dow  # Sunday=0
        # vixie/robfig rule: if EITHER field carries the star bit ('*' or
        # '*/n'), both must match (a '*/2' dom is still a real restriction
        # via dom_ok); only when BOTH are non-star does the OR rule apply
        if self.dom_star or self.dow_star:
            return dom_ok and dow_ok
        return dom_ok or dow_ok

    def next_fire(self, after: datetime) -> datetime:
        """First fire time strictly after ``after`` (minute granularity
        for cron specs; exact interval for @every)."""
        if self.every is not None:
            return after + self.every
        t = after.replace(second=0, microsecond=0) + timedelta(minutes=1)
        # bounded scan: any 5-field spec fires within 4 years (leap dom)
        for _ in range(4 * 366 * 24 * 60):
            if self._matches(t):
                return t
            t += timedelta(minutes=1)
        raise ValueError(f"cron spec never fires: {self.source!r}")


class Priority(IntEnum):
    LOW = 1
    HIGH = 2
    NOW = 3

    def value_at(self, t: datetime) -> int:
        # priority * 10^12 - created_at: higher class always wins; within
        # a class, smaller unix time (older task) wins
        return int(self) * 10**12 - int(t.timestamp())


@dataclass
class Task:
    source: str
    collection: str
    priority: Priority
    created_at: datetime
    retry_count: int = 0
    not_before: datetime | None = None

    @property
    def key(self) -> tuple[str, str]:
        # keyed on the TUPLE, never an ambiguous joined string:
        # ("a_b","c") and ("a","b_c") must not collide in dedup,
        # double-schedule detection, or the running lock
        return (self.source, self.collection)


@dataclass
class _Entry:
    source: str
    collection: str
    spec: CronSpec
    fn: Callable[[str, str, int], None]
    next_run: datetime
    last_run: datetime | None = None


class SyncScheduler:
    """Cron entries -> dedup'd priority queue -> executed sync tasks."""

    MAX_RETRIES = 2

    def __init__(self, start: datetime):
        self._start = start
        self._entries: dict[tuple[str, str], _Entry] = {}
        self._queue: list[Task] = []
        self._running: set[tuple[str, str]] = set()
        self.history: list[tuple[datetime, str, str, int]] = []

    # -- registration ---------------------------------------------------

    def schedule(
        self,
        source: str,
        collection: str,
        timing: str,
        fn: Callable[[str, str, int], None],
    ) -> None:
        key = (source, collection)
        if key in self._entries:
            e = self._entries[key]
            raise ValueError(
                f"{source}/{collection} already scheduled "
                f"(next run: {e.next_run} | last run: {e.last_run})"
            )
        spec = CronSpec.parse(timing)
        self._entries[key] = _Entry(
            source, collection, spec, fn, spec.next_fire(self._start)
        )

    def remove(self, source: str, collection: str) -> None:
        self._entries.pop((source, collection), None)

    # -- queue ------------------------------------------------------------

    def _enqueue(self, task: Task) -> bool:
        if task.key in self._running:
            return False  # in-progress lock
        if any(t.key == task.key for t in self._queue):
            return False  # already queued
        self._queue.append(task)
        return True

    def sync_now(self, source: str, collection: str, now: datetime) -> bool:
        """Manual trigger — NOW priority, same dedup rules."""
        if (source, collection) not in self._entries:
            raise KeyError(f"unknown source/collection: {source}/{collection}")
        return self._enqueue(Task(source, collection, Priority.NOW, now))

    def _pop(self, now: datetime) -> Task | None:
        ready = [
            t for t in self._queue if t.not_before is None or t.not_before <= now
        ]
        if not ready:
            return None
        best = max(ready, key=lambda t: t.priority.value_at(t.created_at))
        self._queue.remove(best)
        return best

    # -- execution ----------------------------------------------------------

    def tick(self, now: datetime, max_tasks: int | None = None) -> int:
        """Fire due cron entries into the queue, then execute queued tasks
        (up to ``max_tasks``). Returns the number of tasks executed. Failed
        tasks re-enqueue with retry_count+1 and a retry_count-minute
        backoff, up to MAX_RETRIES extra attempts."""
        for e in self._entries.values():
            while e.next_run <= now:
                self._enqueue(
                    Task(e.source, e.collection, Priority.HIGH, e.next_run)
                )
                e.last_run = e.next_run
                e.next_run = e.spec.next_fire(e.next_run)

        executed = 0
        while max_tasks is None or executed < max_tasks:
            task = self._pop(now)
            if task is None:
                break
            entry = self._entries.get(task.key)
            if entry is None:
                continue  # removed after enqueue
            self._running.add(task.key)
            try:
                entry.fn(task.source, task.collection, task.retry_count)
                self.history.append(
                    (now, task.source, task.collection, task.retry_count)
                )
            except Exception:  # noqa: BLE001 — task boundary, retried
                if task.retry_count < self.MAX_RETRIES:
                    retry = Task(
                        task.source,
                        task.collection,
                        task.priority,
                        task.created_at,
                        task.retry_count + 1,
                        not_before=now + timedelta(minutes=task.retry_count + 1),
                    )
                    self._queue.append(retry)  # bypass dedup: it IS the task
            finally:
                self._running.discard(task.key)
            executed += 1
        return executed

    # -- introspection --------------------------------------------------------

    def next_runs(self) -> dict[tuple[str, str], datetime]:
        return {k: e.next_run for k, e in self._entries.items()}

    def queued(self) -> list[Task]:
        return list(self._queue)
