"""Structured Streaming end-to-end: availableNow replay, exactly-once across
restarts, resume-from-checkpoint mid-log (FIXTURES.md §5)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from jitsu_spark.changelog import (
    CHANGELOG_SCHEMA,
    assert_matches_oracle,
    changelog_df,
    dict_replay,
)
from jitsu_spark.lake import LakeTable
from jitsu_spark.streaming import CdcStreamJob
from tests.test_merge import TARGET_SCHEMA


def _write_log_chunks(log, out_dir, boundaries):
    """Write contiguous seq ranges as separate parquet drops (one file each),
    emulating rotated incoming log files arriving over time."""
    prev = 0
    for i, b in enumerate(boundaries):
        chunk = log.filter((F.col("seq") >= prev) & (F.col("seq") < b))
        chunk.coalesce(1).write.mode("append").parquet(out_dir)
        prev = b


def test_stream_replay_matches_oracle(spark, tmpdir_path):
    log = changelog_df(spark, n_events=3000, n_docs=200, seed=11, dup_pct=0.03)
    expected = dict_replay([r.asDict(recursive=True) for r in log.collect()])

    src = os.path.join(tmpdir_path, "log")
    _write_log_chunks(log, src, [1000, 2000, 3000])
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), TARGET_SCHEMA, "doc_id", n_buckets=8
    )
    job = CdcStreamJob(
        table=table,
        source_dir=src,
        checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
        source_schema=CHANGELOG_SCHEMA,
        max_files_per_trigger=1,
        job_id="t-replay",
    )
    results = job.run_available_now(spark)
    assert len([r for r in results if not r.skipped]) >= 3
    assert_matches_oracle(table.read(), expected)
    m = job.metrics()
    assert m["upserted_keys"] > 0 and m["seq_range"][1] == 2999


def test_stream_resume_from_checkpoint(spark, tmpdir_path):
    """Process half the log, 'crash', drop more files, restart with the same
    checkpoint + job_id: final state equals the oracle, and re-delivered
    batches are skipped by the commit manifest."""
    log = changelog_df(spark, n_events=2000, n_docs=150, seed=13)
    expected = dict_replay([r.asDict(recursive=True) for r in log.collect()])

    src = os.path.join(tmpdir_path, "log")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    _write_log_chunks(log, src, [500, 1000])
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), TARGET_SCHEMA, "doc_id", n_buckets=8
    )

    job1 = CdcStreamJob(
        table=table, source_dir=src, checkpoint_dir=ckpt,
        source_schema=CHANGELOG_SCHEMA, max_files_per_trigger=1, job_id="t-resume",
    )
    job1.run_available_now(spark)
    v_mid = table.snapshot().version
    assert v_mid >= 1

    # late files arrive; restart from the same checkpoint
    _write_log_chunks(log, src, [1500, 2000])
    job2 = CdcStreamJob(
        table=table, source_dir=src, checkpoint_dir=ckpt,
        source_schema=CHANGELOG_SCHEMA, max_files_per_trigger=1, job_id="t-resume",
    )
    job2.run_available_now(spark)
    assert_matches_oracle(table.read(), expected)

    # a third run with nothing new must commit nothing
    job3 = CdcStreamJob(
        table=table, source_dir=src, checkpoint_dir=ckpt,
        source_schema=CHANGELOG_SCHEMA, job_id="t-resume",
    )
    job3.run_available_now(spark)
    assert table.snapshot().version == table.snapshot().version
    assert_matches_oracle(table.read(), expected)


def test_foreachbatch_redelivery_is_noop(spark, tmpdir_path):
    """Simulate at-least-once foreachBatch: deliver batch 0 twice via a
    fresh checkpoint (same job_id) — the manifest must reject the replay."""
    log = changelog_df(spark, n_events=300, n_docs=50, seed=17)
    expected = dict_replay([r.asDict(recursive=True) for r in log.collect()])
    src = os.path.join(tmpdir_path, "log")
    log.coalesce(1).write.parquet(src)
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), TARGET_SCHEMA, "doc_id", n_buckets=4
    )
    for i in range(2):  # two runs, two checkpoints, same job id -> batch 0 twice
        job = CdcStreamJob(
            table=table, source_dir=src,
            checkpoint_dir=os.path.join(tmpdir_path, f"ckpt{i}"),
            source_schema=CHANGELOG_SCHEMA, job_id="t-redeliver",
        )
        job.run_available_now(spark)
    skipped = [l for l in table.history() if l["kind"] == "merge"]
    assert len(skipped) == 1  # second delivery committed nothing
    assert_matches_oracle(table.read(), expected)


# ---------------------------------------------------------------------------
# offset-based (non-file) sources
# ---------------------------------------------------------------------------

def _rate_expected_state(hi: int) -> dict:
    """Python oracle for default_rate_envelope over offsets 0..hi."""
    state = {}
    for v in range(hi + 1):
        doc = f"doc{v % 100}"
        if v % 10 == 0:
            state.pop(doc, None)
        else:
            state[doc] = [v % 97, v % 31]
    return state


def test_rate_source_stream_and_exactly_once_resume(spark, tmpdir_path):
    """CdcStreamJob over an offset-ordered non-file source (Spark rate
    format mapped to CDC envelopes): the stream merges, stops, resumes
    from the checkpoint, and the final state matches a pure-python replay
    of the contiguous offset range — proving no offset is lost or applied
    twice across the restart."""
    import time

    from pyspark.sql import types as T

    from jitsu_spark.sources import RateSource

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("source", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), schema, "doc_id", n_buckets=4
    )
    ckpt = os.path.join(tmpdir_path, "ckpt")

    def run_until(min_batches: int) -> None:
        job = CdcStreamJob(
            table=table,
            checkpoint_dir=ckpt,
            job_id="rate-cdc",
            source=RateSource(rows_per_second=2000, num_partitions=2),
        )
        q = job.start_continuous(spark, processing_time="1 seconds")
        try:
            deadline = time.time() + 60
            while time.time() < deadline and (
                len([r for r in job.results if not r.skipped]) < min_batches
            ):
                time.sleep(0.5)
        finally:
            q.stop()
            q.awaitTermination(60)
        assert len([r for r in job.results if not r.skipped]) >= min_batches

    def applied_hi() -> int:
        return max(
            e["seq_max"]
            for e in table.snapshot().lineage
            if e.get("kind") == "merge" and e.get("seq_max") is not None
        )

    run_until(2)
    hi1 = applied_hi()
    rows = {r["doc_id"]: r["tokens"] for r in table.read().collect()}
    assert rows == _rate_expected_state(hi1)

    # resume: same checkpoint, new job object — offsets continue, nothing
    # is lost or double-applied
    run_until(1)
    hi2 = applied_hi()
    assert hi2 > hi1
    rows2 = {r["doc_id"]: r["tokens"] for r in table.read().collect()}
    assert rows2 == _rate_expected_state(hi2)
    # merge lineage seq ranges tile the offset line disjointly
    ranges = sorted(
        (e["seq_min"], e["seq_max"])
        for e in table.snapshot().lineage
        if e.get("kind") == "merge" and e.get("seq_min") is not None
    )
    for (a0, a1), (b0, b1) in zip(ranges, ranges[1:]):
        assert a1 < b0


def test_kafka_source_options():
    """KafkaSource is the production seam: reader options must follow the
    spark-sql-kafka contract (no cluster here to integration-test)."""
    from jitsu_spark.sources import KafkaSource

    src = KafkaSource(
        bootstrap_servers="broker:9092",
        topic="cdc.tokens",
        max_offsets_per_trigger=50000,
        extra_options={"kafka.security.protocol": "SASL_SSL"},
    )
    opts = src.options()
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert opts["subscribe"] == "cdc.tokens"
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "50000"
    assert opts["kafka.security.protocol"] == "SASL_SSL"


def test_merge_routed_multi_table_exactly_once(spark, tmpdir_path):
    """One batch fans out into per-table lake tables; redelivery after a
    partial failure (one table committed, one not) heals with no
    duplicates and no loss — exactly-once composes per destination."""
    from pyspark.sql import types as T

    from jitsu_spark.operators import route_to_tables
    from jitsu_spark.streaming.multiroute import merge_routed

    schema = T.StructType(
        [
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    rows = [
        (1, "i", "a", "2024-01-05 00:00:00", 1.0),
        (2, "i", "b", "2024-02-05 00:00:00", 2.0),
        (3, "u", "a", "2024-01-06 00:00:00", 3.0),
    ]
    df = spark.createDataFrame(
        [(s, o, d, None, v) for s, o, d, _, v in rows], schema
    ).withColumn(
        "ts",
        F.element_at(
            F.array(*[F.lit(r[3]).cast("timestamp") for r in rows]),
            F.col("seq").cast("int"),
        ),
    )
    routed = route_to_tables(df, "events_{ts:yyyy_MM}")
    root = os.path.join(tmpdir_path, "dests")
    r1 = merge_routed(spark, root, routed, "doc_id", batch_id=0)
    assert set(r1.per_table) == {"events_2024_01", "events_2024_02"}

    jan = LakeTable.load(spark, os.path.join(root, "events_2024_01"))
    feb = LakeTable.load(spark, os.path.join(root, "events_2024_02"))
    assert {r["doc_id"]: r["value"] for r in jan.read().collect()} == {"a": 3.0}
    assert {r["doc_id"]: r["value"] for r in feb.read().collect()} == {"b": 2.0}

    # simulate partial failure: wipe feb's manifest entry by pretending a
    # redelivery where jan already committed — rerun the whole batch
    r2 = merge_routed(spark, root, routed, "doc_id", batch_id=0)
    assert all(res.skipped for res in r2.per_table.values())
    assert jan.read().count() == 1 and feb.read().count() == 1

    # next batch goes only to one table; the other is untouched
    df2 = spark.createDataFrame(
        [(4, "u", "b", None, 9.0)], schema
    ).withColumn("ts", F.lit("2024-02-07 00:00:00").cast("timestamp"))
    r3 = merge_routed(spark, root, route_to_tables(df2, "events_{ts:yyyy_MM}"),
                      "doc_id", batch_id=1)
    assert set(r3.per_table) == {"events_2024_02"}
    assert {r["value"] for r in feb.read().filter("doc_id='b'").collect()} == {9.0}
    assert jan.snapshot().version == 1


def test_token_multiplex_routes_to_per_token_destinations(spark, tmpdir_path):
    """F4 engine path: two tokens with disjoint destinations plus one token
    multiplexing to TWO destinations; each destination gets its own
    exactly-once manifest (reference: server/handlers/event.go:92-108)."""
    import datetime as dt

    from pyspark.sql import types as T

    from jitsu_spark.streaming.multiroute import merge_routed, multiplex_by_token

    schema = T.StructType(
        [
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("api_key", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    rows = [
        (0, "i", "a", "tok_A", 1),
        (1, "i", "b", "tok_B", 2),
        (2, "i", "c", "tok_AB", 3),   # multiplexes to two destinations
        (3, "i", "d", "tok_unknown", 4),
    ]
    df = spark.createDataFrame(rows, schema)
    token_map = {
        "tok_A": ["dest_a"],
        "tok_B": ["dest_b"],
        "tok_AB": ["dest_a", "dest_b"],
    }
    routed = multiplex_by_token(df, token_map)
    root = os.path.join(tmpdir_path, "dests")
    r1 = merge_routed(spark, root, routed, "doc_id", batch_id=0, job_id="mux")
    assert set(r1.per_table) == {"dest_a", "dest_b"}

    from jitsu_spark.lake import LakeTable

    a = {r["doc_id"] for r in LakeTable.load(spark, os.path.join(root, "dest_a")).read().collect()}
    b = {r["doc_id"] for r in LakeTable.load(spark, os.path.join(root, "dest_b")).read().collect()}
    assert a == {"a", "c"}          # tok_A + multiplexed tok_AB
    assert b == {"b", "c"}          # tok_B + multiplexed tok_AB
    # unknown token dropped (reference 400s it)
    assert "d" not in a | b

    # redelivery: both destination manifests skip the replayed batch
    r2 = merge_routed(spark, root, routed, "doc_id", batch_id=0, job_id="mux")
    assert all(res.skipped for res in r2.per_table.values())

    # keep_unmatched surfaces the dropped event for a dead-letter path
    kept = multiplex_by_token(df, token_map, keep_unmatched=True)
    nulls = [r["doc_id"] for r in kept.filter("_table IS NULL").collect()]
    assert nulls == ["d"]


def test_stream_survives_mid_stream_rebucket(spark, tmpdir_path):
    """An admin bucket resize between checkpointed runs must not disturb
    exactness: the resumed stream merges against the grown layout and the
    final state still matches the dict oracle."""
    from jitsu_spark.changelog import dict_replay

    log = changelog_df(spark, n_events=2000, n_docs=150, seed=31, dup_pct=0.02)
    expected = dict_replay([r.asDict(recursive=True) for r in log.collect()])

    src = os.path.join(tmpdir_path, "log")
    ckpt = os.path.join(tmpdir_path, "ckpt")
    _write_log_chunks(log, src, [1000])
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), TARGET_SCHEMA, "doc_id",
        n_buckets=4, properties={"write.mode": "mor"},
    )

    def job():
        return CdcStreamJob(
            table=table, source_dir=src, checkpoint_dir=ckpt,
            source_schema=CHANGELOG_SCHEMA, max_files_per_trigger=1,
            job_id="t-rebucket",
        )

    job().run_available_now(spark)
    table.rebucket(factor=4)
    assert table.snapshot().n_buckets == 16

    _write_log_chunks(log, src, [1500, 2000])
    job().run_available_now(spark)
    assert_matches_oracle(table.read(), expected)
    # post-resize merges landed in the grown bucket space
    assert set(map(int, table.snapshot().files)) <= set(range(16))


def test_bootstrap_snapshot_then_tail(spark, tmpdir_path):
    """Debezium-style initial load: bulk-append a consistent snapshot at a
    log watermark, then tail the FULL log with the watermark filter — the
    final state equals replaying the whole log from scratch; a re-run
    bootstrap is a manifest no-op and the tail resumes idempotently."""
    from jitsu_spark.streaming import bootstrap_snapshot, tail_filter

    log = changelog_df(spark, n_events=2000, n_docs=150, seed=29)
    rows = [r.asDict(recursive=True) for r in log.collect()]
    expected = dict_replay(rows)

    watermark = 999
    snap_state = dict_replay([r for r in rows if r["seq"] <= watermark])
    snap_rows = [
        {"doc_id": k, **v} for k, v in snap_state.items()
    ]
    snapshot_df = spark.createDataFrame(snap_rows, TARGET_SCHEMA)

    src = os.path.join(tmpdir_path, "log")
    _write_log_chunks(log, src, [1000, 2000])
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), TARGET_SCHEMA, "doc_id",
        n_buckets=8,
    )

    r1 = bootstrap_snapshot(table, snapshot_df, watermark, job_id="boot")
    assert not r1.skipped
    assert table.read().count() == len(snap_rows)
    # idempotent: crashed-and-rerun bootstrap loads exactly once
    r2 = bootstrap_snapshot(table, snapshot_df, watermark, job_id="boot")
    assert r2.skipped

    job = CdcStreamJob(
        table=table,
        source_dir=src,
        checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
        source_schema=CHANGELOG_SCHEMA,
        max_files_per_trigger=1,
        job_id="boot",
        transform=tail_filter(watermark),
    )
    job.run_available_now(spark)
    assert_matches_oracle(table.read(), expected)

    # restart with the same checkpoint: nothing new, nothing applied
    job2 = CdcStreamJob(
        table=table,
        source_dir=src,
        checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
        source_schema=CHANGELOG_SCHEMA,
        job_id="boot",
        transform=tail_filter(watermark),
    )
    job2.run_available_now(spark)
    assert_matches_oracle(table.read(), expected)


def test_stream_with_inline_text_pipeline_gates(spark, tmpdir_path):
    """The r5 text operators compose into the streaming data path: a
    document change stream runs PII scrub + a quality gate INSIDE the
    pre-merge transform (deletes flow through the gate untouched), and
    the lake table converges to the scrubbed, gated LWW state."""
    from pyspark.sql import types as T

    from jitsu_spark.text.pii import scrub_pii

    doc_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
    ])
    events = [
        ("a", "reach me at bob@example.com for the data", 0, "u"),
        ("b", "plain words only here today", 1, "u"),
        ("c", "tiny", 2, "u"),                      # fails quality gate
        ("a", "updated text with 10.1.2.3 inside it", 3, "u"),
        ("b", None, 4, "d"),                        # delete must pass gate
    ]
    src = os.path.join(tmpdir_path, "log")
    spark.createDataFrame(events[:3], doc_schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(events[3:], doc_schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    tbl_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("clean_text", T.StringType()),
        T.StructField("pii_total", T.LongType()),
        T.StructField("n_words", T.IntegerType()),
    ])
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), tbl_schema, "doc_id", n_buckets=4
    )

    def gated_scrub(df):
        out = scrub_pii(df).withColumn(
            "n_words", F.size(F.split(F.coalesce(F.col("text"), F.lit("")), " "))
        )
        out = out.filter((F.col("op") == "d") | (F.col("n_words") >= 3))
        return out.select(
            "doc_id", "clean_text", "pii_total", "n_words", "seq", "op"
        )

    job = CdcStreamJob(
        table=table,
        source_dir=src,
        checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
        source_schema=doc_schema,
        max_files_per_trigger=1,
        job_id="t-textgate",
        transform=gated_scrub,
    )
    job.run_available_now(spark)

    rows = {r["doc_id"]: r for r in table.read().collect()}
    assert set(rows) == {"a"}  # b deleted, c gated out
    assert rows["a"]["clean_text"] == "updated text with <IP> inside it"
    assert rows["a"]["pii_total"] == 1


def test_stream_with_inline_lm_gate(spark, tmpdir_path):
    """The bigram-LM perplexity gate composes into the streaming data
    path: a model pre-trained on a static reference corpus scores every
    incoming document version INSIDE the pre-merge transform (keyed by
    seq so multiple versions of one doc in a batch score independently);
    improbable docs are gated out, deletes flow through untouched."""
    from pyspark.sql import types as T

    from jitsu_spark.text.lm import bigram_model, score_documents

    ref = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(20)],
        "doc_id long, text string",
    )
    model = bigram_model(ref)  # V=5; fluent avg_nll ~0.41, unseen 1.609

    doc_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
    ])
    events = [
        ("a", "zz qq ww ee rr tt", 0, "u"),          # gibberish v0: gated
        ("a", "the cat sat on the mat", 1, "u"),     # fluent v1: kept
        ("b", "the cat sat on the mat", 2, "u"),
        ("c", "qq ww ee rr tt yy uu", 3, "u"),       # gibberish: gated
        ("b", None, 4, "d"),                         # delete passes gate
    ]
    src = os.path.join(tmpdir_path, "log")
    spark.createDataFrame(events, doc_schema).coalesce(1).write.parquet(src)

    tbl_schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("avg_nll", T.DoubleType()),
    ])
    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), tbl_schema, "doc_id", n_buckets=4
    )

    def lm_gate(df):
        s = score_documents(df, model, id_col="seq")
        out = df.join(s.select("seq", "avg_nll"), on="seq", how="left")
        out = out.filter((F.col("op") == "d") | (F.col("avg_nll") <= 1.0))
        return out.select("doc_id", "text", "avg_nll", "seq", "op")

    job = CdcStreamJob(
        table=table,
        source_dir=src,
        checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
        source_schema=doc_schema,
        job_id="t-lmgate",
        transform=lm_gate,
    )
    job.run_available_now(spark)

    rows = {r["doc_id"]: r for r in table.read().collect()}
    assert set(rows) == {"a"}  # b deleted, c gated; a's fluent v1 won
    assert rows["a"]["text"] == "the cat sat on the mat"
    assert rows["a"]["avg_nll"] is not None and rows["a"]["avg_nll"] < 1.0
