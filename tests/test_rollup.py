"""Watermarked event-time rollup: finalized windows emitted exactly once;
open windows held in state across restarts; batch/stream parity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from jitsu_spark.changelog import CHANGELOG_SCHEMA, changelog_df
from jitsu_spark.streaming.rollup import run_rollup_stream, windowed_rollup


def test_batch_rollup_matches_manual(spark):
    log = changelog_df(spark, 5000, 400, seed=41)
    out = windowed_rollup(log, window="1 day", watermark="1 hour")
    manual = (
        log.groupBy(
            F.date_trunc("day", F.col("ts")).alias("window_start"), "source"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("n_tok").alias("sum_tok"))
    )
    a = {
        (r["window_start"], r["source"]): (r["n_events"], r["sum_tok"])
        for r in out.collect()
    }
    b = {
        (r["window_start"], r["source"]): (r["n_events"], r["sum_tok"])
        for r in manual.collect()
    }
    assert a == b


def test_stream_rollup_emits_finalized_windows_once(spark, tmpdir_path):
    # events span 30 days; the final watermark closes everything except the
    # trailing watermark-delay worth of windows
    log = changelog_df(spark, 8000, 500, seed=43)
    src = os.path.join(tmpdir_path, "log")
    log.coalesce(2).write.parquet(src)
    out_dir = os.path.join(tmpdir_path, "rollup")
    ckpt = os.path.join(tmpdir_path, "ckpt")

    run_rollup_stream(
        spark, src, CHANGELOG_SCHEMA, out_dir, ckpt,
        window="1 day", watermark="1 hour",
    )
    emitted = spark.read.parquet(out_dir)
    n1 = emitted.count()
    assert n1 > 0
    # emitted counts must match a batch rollup for the same closed windows
    max_ts = log.agg(F.max("ts")).collect()[0][0]
    batch = windowed_rollup(log, window="1 day", watermark="1 hour")
    closed = {
        (r["window_start"], r["source"]): r["n_events"]
        for r in batch.collect()
        if r["window_end"] <= max_ts.replace(minute=0, second=0, microsecond=0)
    }
    got = {
        (r["window_start"], r["source"]): r["n_events"] for r in emitted.collect()
    }
    for k, v in got.items():
        assert closed.get(k, v) == v  # every emitted window is correct

    # re-run with no new data: nothing is emitted twice
    run_rollup_stream(
        spark, src, CHANGELOG_SCHEMA, out_dir, ckpt,
        window="1 day", watermark="1 hour",
    )
    assert spark.read.parquet(out_dir).count() == n1
