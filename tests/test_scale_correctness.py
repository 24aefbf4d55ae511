"""t2-grade correctness (FIXTURES.md §6): larger oracle replays including
extreme hot-key skew and high duplicate-delivery rates — the regimes the
skew/exactly-once machinery exists for."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from jitsu_spark.changelog import assert_matches_oracle, changelog_df, dict_replay
from jitsu_spark.lake import LakeTable
from jitsu_spark.lake.merge import merge_batch
from tests.test_merge import TARGET_SCHEMA


def _replay(spark, tmpdir_path, log, n_events, n_batches=5, **table_kw):
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), TARGET_SCHEMA, "doc_id",
        n_buckets=16, **table_kw,
    )
    per = n_events // n_batches + 1
    for i in range(n_batches):
        part = log.filter((F.col("seq") >= i * per) & (F.col("seq") < (i + 1) * per))
        merge_batch(t, part, batch_id=i)
    return t


def test_oracle_replay_100k(spark, tmpdir_path):
    """100k events, 8k keys, duplicates + moderate skew, 5 batches."""
    log = changelog_df(
        spark, n_events=100_000, n_docs=8_000, seed=101,
        hot_key_pct=0.15, dup_pct=0.02,
    )
    expected = dict_replay([r.asDict(recursive=True) for r in log.collect()])
    t = _replay(spark, tmpdir_path, log, 100_000)
    assert_matches_oracle(t.read(), expected)


def test_extreme_hot_key_skew(spark, tmpdir_path):
    """Half of ALL events hit one key. The LWW partial combine must keep
    this batch from melting a reducer; correctness must hold; runtime must
    stay in the same ballpark as the uniform case."""
    n = 60_000
    uniform = changelog_df(spark, n, 5_000, seed=7, hot_key_pct=0.0)
    skewed = changelog_df(spark, n, 5_000, seed=7, hot_key_pct=0.5)

    t0 = time.time()
    tu = _replay(spark, os.path.join(tmpdir_path, "u"), uniform, n)
    uniform_s = time.time() - t0
    t0 = time.time()
    ts = _replay(spark, os.path.join(tmpdir_path, "s"), skewed, n)
    skewed_s = time.time() - t0

    expected = dict_replay([r.asDict(recursive=True) for r in skewed.collect()])
    assert_matches_oracle(ts.read(), expected)
    # the hot key holds the LWW winner among ~30k events
    hot = [r for r in ts.read().collect() if r["doc_id"] == "doc000000000"]
    assert len(hot) <= 1
    # skew must not blow up runtime (generous 3x bound: shared-host noise)
    assert skewed_s < uniform_s * 3, (skewed_s, uniform_s)
    assert tu.read().count() > 0  # uniform table sane too


def test_mor_100k_with_periodic_compaction(spark, tmpdir_path):
    log = changelog_df(spark, 50_000, 4_000, seed=55, dup_pct=0.03)
    expected = dict_replay([r.asDict(recursive=True) for r in log.collect()])
    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "mor"), TARGET_SCHEMA, "doc_id",
        n_buckets=16, properties={"write.mode": "mor"},
    )
    per = 10_000
    for i in range(5):
        part = log.filter((F.col("seq") >= i * per) & (F.col("seq") < (i + 1) * per))
        merge_batch(t, part, batch_id=i)
        t.compact(max_files_per_bucket=3)
    assert_matches_oracle(t.read(), expected)
