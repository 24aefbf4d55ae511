"""Streaming listener metrics + lineage DataFrame (A3/ST5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from jitsu_spark.changelog import CHANGELOG_SCHEMA, changelog_df
from jitsu_spark.lake import LakeTable
from jitsu_spark.streaming import CdcStreamJob
from jitsu_spark.streaming.metrics import CdcQueryListener, lineage_frame
from tests.test_merge import TARGET_SCHEMA


def test_listener_and_lineage(spark, tmpdir_path):
    log = changelog_df(spark, 1500, 100, seed=31)
    src = os.path.join(tmpdir_path, "log")
    for i in range(3):
        log.filter((F.col("seq") >= i * 500) & (F.col("seq") < (i + 1) * 500)) \
            .coalesce(1).write.mode("append").parquet(src)
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), TARGET_SCHEMA, "doc_id", n_buckets=4
    )
    listener = CdcQueryListener()
    spark.streams.addListener(listener)
    try:
        job = CdcStreamJob(
            table=table, source_dir=src,
            checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
            source_schema=CHANGELOG_SCHEMA, max_files_per_trigger=1,
            job_id="t-metrics",
        )
        job.run_available_now(spark)
    finally:
        spark.streams.removeListener(listener)

    # listener delivery is async — poll briefly for the tail events
    import time

    for _ in range(40):
        if len({s["batch_id"] for s in listener.snapshots}) >= 3:
            break
        time.sleep(0.25)
    batch_ids = {s["batch_id"] for s in listener.snapshots}
    assert batch_ids == {0, 1, 2}
    summary = listener.throughput_summary()
    assert summary["batches"] >= 3
    # NB: numInputRows counts every action's scan of the micro-batch source
    # inside foreachBatch (stats pass + write job), so total_rows is a
    # multiple of the true input size
    assert summary["total_rows"] % 1500 == 0 and summary["total_rows"] >= 1500
    assert summary["mean_rows_per_sec"] > 0

    lf = lineage_frame(spark, table)
    merges = lf.filter(F.col("kind") == "merge").collect()
    assert len(merges) >= 3
    # seq ranges must tile the log monotonically (per-partition lineage)
    ranges = sorted((m["seq_min"], m["seq_max"]) for m in merges)
    assert ranges[0][0] == 0 and ranges[-1][1] == 1499
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert a1 < b0  # disjoint, ordered
    assert all(m["n_buckets_touched"] > 0 for m in merges)


def test_statistics_frame_counters(spark, tmpdir_path):
    """Counter read API: per-period per-job success/delete counts folded
    from FULL lineage (archive included), plus DLQ error rows at rest."""
    import datetime as dt
    import os

    from pyspark.sql import types as T

    from jitsu_spark.lake import LakeTable
    from jitsu_spark.lake.maintenance import compact_manifest
    from jitsu_spark.lake.merge import merge_batch
    from jitsu_spark.streaming.metrics import statistics_frame

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), schema, "doc_id", n_buckets=4
    )
    b0 = spark.createDataFrame(
        [("a", 1.0, 0, "i"), ("b", 2.0, 1, "i"), ("c", 3.0, 2, "i")],
        "doc_id string, value double, seq long, op string",
    )
    b1 = spark.createDataFrame(
        [("a", 9.0, 3, "u"), ("b", 0.0, 4, "d")],
        "doc_id string, value double, seq long, op string",
    )
    merge_batch(table, b0, batch_id=0, job_id="jobA")
    merge_batch(table, b1, batch_id=1, job_id="jobA")
    # archive lineage to prove the fold reads FULL history
    compact_manifest(table, keep_lineage=1, keep_recent_batches=0)

    # derive the expected bucket from the lineage stamp itself (reading
    # the wall clock again here would flake across a midnight boundary)
    from jitsu_spark.lake.maintenance import full_history

    ts_ms = [e["ts_ms"] for e in full_history(table) if e.get("kind") == "merge"]
    periods = {
        dt.datetime.fromtimestamp(t / 1000, dt.timezone.utc).strftime("%Y-%m-%d")
        for t in ts_ms
    }
    stats = {
        (r["period"], r["job_id"], r["status"]): r["n"]
        for r in statistics_frame(spark, table).collect()
    }
    assert sum(
        stats.get((p, "jobA", "success"), 0) for p in periods
    ) == 4  # 3 + (2 - 1 delete)
    assert sum(stats.get((p, "jobA", "delete"), 0) for p in periods) == 1

    # hour granularity buckets by hour; error rows come from the DLQ dir
    dlq = os.path.join(tmpdir_path, "dlq")
    spark.createDataFrame(
        [("boom", "{}",)], "error string, raw string"
    ).write.parquet(os.path.join(dlq, "batch_id=0"))
    hstats = statistics_frame(
        spark, table, dead_letter_dir=dlq, granularity="hour"
    ).collect()
    hkeys = {(r["period"], r["status"]) for r in hstats}
    hours = {
        dt.datetime.fromtimestamp(t / 1000, dt.timezone.utc).strftime(
            "%Y-%m-%d %H:00"
        )
        for t in ts_ms
    }
    assert any((h, "success") in hkeys for h in hours)
    errs = [r["n"] for r in hstats if r["status"] == "error"]
    assert errs == [1]
