"""ST9: cron-timed, deduplicated, prioritized sync scheduling.

Reference parity targets: server/scheduling/cron.go (5-field specs +
descriptors, double-schedule error), server/synchronization/
task_service.go (queue dedup vs queued/running, priority value
priority*10^12 - created_at, retry <= 2 with linear-minute backoff)."""

from datetime import datetime, timedelta

import pytest

from jitsu_spark.scheduling import CronSpec, Priority, SyncScheduler

T0 = datetime(2024, 3, 14, 10, 7, 23)


def fires(spec, start, n):
    s, t, out = CronSpec.parse(spec), start, []
    for _ in range(n):
        t = s.next_fire(t)
        out.append(t)
    return out


def test_cron_next_fire_shapes():
    assert fires("*/15 * * * *", T0, 3) == [
        datetime(2024, 3, 14, 10, 15),
        datetime(2024, 3, 14, 10, 30),
        datetime(2024, 3, 14, 10, 45),
    ]
    assert fires("0 3 * * *", T0, 2) == [
        datetime(2024, 3, 15, 3, 0),
        datetime(2024, 3, 16, 3, 0),
    ]
    assert fires("30 2 1 * *", T0, 2) == [
        datetime(2024, 4, 1, 2, 30),
        datetime(2024, 5, 1, 2, 30),
    ]
    # vixie "N/step": start at 5, every 10 minutes
    assert fires("5/10 * * * *", T0, 2) == [
        datetime(2024, 3, 14, 10, 15),
        datetime(2024, 3, 14, 10, 25),
    ]
    # lists + ranges; a plain value in a list must NOT inherit a step
    assert fires("1,40-42 10 * * *", T0, 3) == [
        datetime(2024, 3, 14, 10, 40),
        datetime(2024, 3, 14, 10, 41),
        datetime(2024, 3, 14, 10, 42),
    ]
    assert fires("@daily", T0, 1) == [datetime(2024, 3, 15, 0, 0)]
    assert fires("@every 90m", T0, 2) == [
        T0 + timedelta(minutes=90),
        T0 + timedelta(minutes=180),
    ]


def test_cron_dom_dow_or_rule():
    # both dom and dow restricted: fires on the 13th OR on Fridays
    got = fires("0 0 13 3 5", datetime(2024, 3, 1), 4)
    assert got == [
        datetime(2024, 3, 8),   # Friday
        datetime(2024, 3, 13),  # the 13th (a Wednesday)
        datetime(2024, 3, 15),  # Friday
        datetime(2024, 3, 22),  # Friday
    ]
    # dow-only: Sunday == 0
    assert fires("0 0 * * 0", T0, 1) == [datetime(2024, 3, 17)]


def test_cron_rejects_bad_specs():
    for bad in ("* * * *", "61 * * * *", "* 24 * * *", "*/0 * * * *",
                "@every 0m", "a * * * *", "@every", "@every 5x",
                "@every x5m", "@every -3m"):
        with pytest.raises(ValueError):
            CronSpec.parse(bad)


def test_cron_step_star_bit_uses_and_rule():
    """vixie/robfig semantics: '*/2' in dom carries the star BIT, so with
    a restricted dow the rule is AND (both must match), not cron's
    both-restricted OR — '0 0 */2 * 1' fires only on Mondays whose
    day-of-month is odd, never on non-Monday odd days."""
    spec = CronSpec.parse("0 0 */2 * 1")
    got, t = [], datetime(2024, 3, 1)
    while len(got) < 3:
        t = spec.next_fire(t)
        got.append(t)
    assert got == [
        datetime(2024, 3, 11),  # Monday the 11th (odd dom)
        datetime(2024, 3, 25),  # Monday the 25th (Mar 18 is even -> skipped)
        datetime(2024, 4, 1),   # Monday the 1st
    ]
    # plain-star dom with restricted dow still fires every Monday
    plain = CronSpec.parse("0 0 * * 1")
    assert plain.next_fire(datetime(2024, 3, 1)) == datetime(2024, 3, 4)


def test_schedule_dedup_priority_and_removal():
    ran = []
    sch = SyncScheduler(start=T0)
    sch.schedule("ga", "report", "*/10 * * * *",
                 lambda s, c, r: ran.append((s, c, r)))
    sch.schedule("fb", "insights", "*/10 * * * *",
                 lambda s, c, r: ran.append((s, c, r)))
    with pytest.raises(ValueError, match="already scheduled"):
        sch.schedule("ga", "report", "* * * * *", lambda s, c, r: None)

    # three missed fires collapse into ONE queued task per pair (dedup)
    now = T0 + timedelta(minutes=35)
    sch.tick(now, max_tasks=0)
    assert len(sch.queued()) == 2

    # manual NOW beats scheduled HIGH; within a priority, older first.
    # fb/insights was scheduled second but its fire time ties ga's; ga
    # enqueued first and (tie on created_at) max() keeps the first max.
    assert sch.sync_now("ga", "report", now) is False  # already queued
    sch.remove("fb", "insights")
    executed = sch.tick(now)
    # fb's queued task is skipped (entry removed after enqueue)
    assert executed >= 1 and ran == [("ga", "report", 0)]

    # nothing due until the next boundary
    assert sch.tick(now) == 0
    sch.tick(T0 + timedelta(minutes=45))
    assert ran[-1] == ("ga", "report", 0) and len(ran) == 2


def test_schedule_keys_are_tuples_not_joined_strings():
    """('a_b','c') and ('a','b_c') join to the same 'a_b_c' string — they
    must stay distinct pairs for scheduling, dedup, and execution."""
    ran = []
    sch = SyncScheduler(start=T0)
    sch.schedule("a_b", "c", "*/10 * * * *",
                 lambda s, c, r: ran.append((s, c)))
    # not a double-schedule: a different (source, collection) pair
    sch.schedule("a", "b_c", "*/10 * * * *",
                 lambda s, c, r: ran.append((s, c)))
    now = T0 + timedelta(minutes=10)
    sch.tick(now, max_tasks=0)
    # both pairs enqueue — queue dedup must not collapse them either
    assert len(sch.queued()) == 2
    sch.tick(now)
    assert sorted(ran) == [("a", "b_c"), ("a_b", "c")]


def test_retry_backoff_and_cap():
    calls = []

    def flaky(s, c, r):
        calls.append(r)
        if len(calls) <= 2:
            raise RuntimeError("transient")

    sch = SyncScheduler(start=T0)
    sch.schedule("src", "col", "@every 1h", flaky)
    t1 = T0 + timedelta(hours=1)
    sch.tick(t1)
    assert calls == [0]  # failed; retry queued with 1-minute backoff
    sch.tick(t1)
    assert calls == [0]  # not_before gates the retry at the same instant
    sch.tick(t1 + timedelta(minutes=1))
    assert calls == [0, 1]  # failed again; second retry, 2-minute backoff
    sch.tick(t1 + timedelta(minutes=3))
    assert calls == [0, 1, 2] and sch.history[-1][3] == 2  # succeeded

    # permanent failure: retries stop after MAX_RETRIES extra attempts
    calls.clear()
    always = SyncScheduler(start=T0)

    def dead(s, c, r):
        calls.append(r)
        raise RuntimeError("permanent")

    always.schedule("src", "col", "@every 1h", dead)
    for m in (0, 1, 3, 10, 30):
        always.tick(t1 + timedelta(minutes=m))
    assert calls == [0, 1, 2] and always.history == []


def test_priority_value_ordering():
    older, newer = T0, T0 + timedelta(minutes=5)
    assert Priority.NOW.value_at(newer) > Priority.HIGH.value_at(older)
    assert Priority.HIGH.value_at(older) > Priority.HIGH.value_at(newer)
    assert Priority.HIGH.value_at(newer) > Priority.LOW.value_at(older)


def test_scheduler_drives_real_interval_sync(spark, tmpdir_path):
    """End-to-end composition: a cron entry fires, the task runs a REAL
    IntervalSyncJob into a lake table; the second fire is signature-gated
    (skips all intervals) and the scheduler's dedup never double-runs a
    sync that is already queued."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from jitsu_spark.lake import LakeTable
    from jitsu_spark.sources.interval_sync import (
        IntervalDriver,
        IntervalSyncJob,
        TimeInterval,
    )

    schema = T.StructType(
        [
            T.StructField("rid", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )

    class OneMonthAPI(IntervalDriver):
        def available_intervals(self):
            return [
                TimeInterval("2024-01", "2024-01-01 00:00:00", "2024-02-01 00:00:00")
            ]

        def signature(self, itv):
            return "sig-0"

        def read_interval(self, spark_, itv):
            rows = [(f"r{i}", "2024-01-15 00:00:00", 1.0) for i in range(3)]
            return spark_.createDataFrame(rows, ["rid", "ts_s", "amount"]).select(
                "rid", F.col("ts_s").cast("timestamp").alias("ts"), "amount"
            )

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), schema, "rid", n_buckets=4
    )
    job = IntervalSyncJob(
        t, OneMonthAPI(), "ts", os.path.join(tmpdir_path, "state.json")
    )
    reports = []
    sch = SyncScheduler(start=T0)
    sch.schedule(
        "api", "sales", "@every 1h",
        lambda s, c, r: reports.append(job.run_once(spark)),
    )
    sch.tick(T0 + timedelta(hours=1))
    assert reports[0].synced == ["2024-01"] and t.read().count() == 3
    sch.tick(T0 + timedelta(hours=2))
    assert reports[1].synced == [] and reports[1].skipped == ["2024-01"]
    assert t.read().count() == 3
