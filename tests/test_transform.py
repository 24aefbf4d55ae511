"""User event-function stage (the reference's designed-but-unbuilt JS
transformation, design-docs/transformations.md): 1 -> 0..N fan-out with a
dead-letter surface, wired into CdcStreamJob with exactly-once preserved
across redelivery."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jitsu_spark.changelog import CHANGELOG_SCHEMA
from jitsu_spark.lake import LakeTable
from jitsu_spark.operators.transform import (
    split_dead_letter,
    transform_events,
    transform_events_vectorized,
)
from jitsu_spark.streaming import CdcStreamJob
from tests.test_merge import TARGET_SCHEMA

TS = dt.datetime(2024, 1, 1)


def ev(seq, doc_id, toks, op="i"):
    return {
        "seq": seq, "op": op, "ts": TS, "doc_id": doc_id,
        "tokens": toks, "n_tok": len(toks), "source": "s1",
    }


def _events_df(spark, rows):
    return spark.createDataFrame(rows, CHANGELOG_SCHEMA)


def test_transform_events_drop_fanout_and_dead_letter(spark):
    def fn(e):
        if e["doc_id"] == "drop-me":
            return None                              # 1 -> 0
        if e["doc_id"] == "poison":
            raise ValueError("bad event")            # dead letter
        if e["doc_id"] == "fan":
            # 1 -> 2: deterministic derived keys (never uuid)
            shadow = dict(e, doc_id=e["doc_id"] + "#shadow")
            return [e, shadow]
        return e                                     # 1 -> 1

    df = _events_df(
        spark,
        [ev(1, "keep", [1]), ev(2, "drop-me", [2]), ev(3, "fan", [3]),
         ev(4, "poison", [4])],
    )
    good, dead = split_dead_letter(transform_events(df, fn))
    got = {r["doc_id"]: r for r in good.collect()}
    assert set(got) == {"keep", "fan", "fan#shadow"}
    assert got["fan#shadow"]["tokens"] == [3]
    dl = dead.collect()
    assert len(dl) == 1
    assert "bad event" in dl[0]["_error"]
    assert '"doc_id": "poison"' in dl[0]["_raw"]


def test_transform_events_missing_fields_null_and_reserved_guard(spark):
    df = _events_df(spark, [ev(1, "a", [1])])
    # fn returns a partial dict: unmentioned output fields become NULL
    good, _ = split_dead_letter(
        transform_events(df, lambda e: {"seq": e["seq"], "doc_id": e["doc_id"]})
    )
    row = good.collect()[0]
    assert row["doc_id"] == "a" and row["tokens"] is None

    bad_schema = T.StructType([T.StructField("_error", T.StringType())])
    with pytest.raises(ValueError, match="reserved"):
        transform_events(df, lambda e: e, output_schema=bad_schema)


def test_transform_events_vectorized_matches_per_event(spark):
    df = _events_df(spark, [ev(i, f"d{i}", [i]) for i in range(1, 21)])

    def per_event(e):
        return None if e["seq"] % 2 else e

    def vec(pdf):
        return pdf[pdf["seq"] % 2 == 0]

    a = {r["doc_id"] for r in
         split_dead_letter(transform_events(df, per_event))[0].collect()}
    b = {r["doc_id"] for r in
         split_dead_letter(transform_events_vectorized(df, vec))[0].collect()}
    assert a == b == {f"d{i}" for i in range(2, 21, 2)}

    def vec_boom(pdf):
        raise RuntimeError("batch failed")

    good, dead = split_dead_letter(transform_events_vectorized(df, vec_boom))
    assert good.count() == 0 and dead.count() == 20


def test_cdc_stream_with_event_fn_exactly_once(spark, tmpdir_path):
    """End-to-end: fan-out + drop + poison through CdcStreamJob; a full
    redelivery (same checkpoint, new job object) changes neither the table
    nor the dead-letter dir."""

    def fn(e):
        if e["doc_id"] == "d-drop":
            return None
        if e["doc_id"] == "d-poison":
            raise ValueError("poison pill")
        if e["op"] != "d" and e["doc_id"] == "d-fan":
            return [e, dict(e, doc_id="d-fan#s")]
        return e

    rows = [
        ev(0, "d-keep", [10]), ev(1, "d-drop", [11]), ev(2, "d-fan", [12]),
        ev(3, "d-poison", [13]), ev(4, "d-keep", [14], op="u"),
    ]
    src = os.path.join(tmpdir_path, "log")
    _df = _events_df(spark, rows)
    _df.filter(F.col("seq") < 3).coalesce(1).write.mode("append").parquet(src)
    _df.filter(F.col("seq") >= 3).coalesce(1).write.mode("append").parquet(src)

    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), TARGET_SCHEMA, "doc_id",
        n_buckets=4,
    )
    dlq = os.path.join(tmpdir_path, "dlq")

    def make_job():
        return CdcStreamJob(
            table=table,
            source_dir=src,
            checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
            source_schema=CHANGELOG_SCHEMA,
            max_files_per_trigger=1,
            job_id="t-evfn",
            event_fn=fn,
            dead_letter_dir=dlq,
        )

    make_job().run_available_now(spark)
    state = {r["doc_id"]: r["tokens"] for r in table.read().collect()}
    assert state == {
        "d-keep": [14],          # LWW: the update won
        "d-fan": [12],
        "d-fan#s": [12],         # fan-out sibling merged under its own key
    }
    dead = spark.read.parquet(dlq).collect()
    assert len(dead) == 1 and "poison pill" in dead[0]["_error"]
    v_before = table.snapshot().version

    # redelivery: same checkpoint -> no new commits, identical DLQ
    res2 = make_job().run_available_now(spark)
    assert all(r.skipped for r in res2 if r is not None) or not res2
    assert table.snapshot().version == v_before
    state2 = {r["doc_id"]: r["tokens"] for r in table.read().collect()}
    assert state2 == state
    dead2 = spark.read.parquet(dlq).collect()
    assert len(dead2) == 1


def test_replay_dead_letters_recovers_and_reprocesses(spark, tmpdir_path):
    """Poisoned events recovered from the DLQ re-enter the pipeline under a
    FIXED transform; events the fix still rejects dead-letter again."""
    from jitsu_spark.operators.transform import replay_dead_letters

    def broken(e):
        if e["doc_id"].startswith("d-bad"):
            raise ValueError("cannot handle")
        return e

    rows = [ev(0, "d-ok", [1]), ev(1, "d-bad1", [2]), ev(2, "d-bad2", [3])]
    src = os.path.join(tmpdir_path, "log")
    _events_df(spark, rows).coalesce(1).write.parquet(src)

    table = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), TARGET_SCHEMA, "doc_id",
        n_buckets=4,
    )
    dlq = os.path.join(tmpdir_path, "dlq")
    CdcStreamJob(
        table=table, source_dir=src,
        checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
        source_schema=CHANGELOG_SCHEMA, job_id="t-dlq",
        event_fn=broken, dead_letter_dir=dlq,
    ).run_available_now(spark)
    assert {r["doc_id"] for r in table.read().collect()} == {"d-ok"}

    # recover the raw inputs losslessly
    recovered = replay_dead_letters(spark, dlq, CHANGELOG_SCHEMA)
    got = {r["doc_id"]: r for r in recovered.collect()}
    assert set(got) == {"d-bad1", "d-bad2"}
    assert got["d-bad1"]["tokens"] == [2] and got["d-bad1"]["seq"] == 1
    assert got["d-bad2"]["ts"] == TS      # timestamp survives the round trip

    # re-run under a fix that still rejects d-bad2
    def fixed(e):
        if e["doc_id"] == "d-bad2":
            raise ValueError("still broken")
        return e

    combined = replay_dead_letters(spark, dlq, CHANGELOG_SCHEMA, fn=fixed)
    good, dead = split_dead_letter(combined)
    assert {r["doc_id"] for r in good.collect()} == {"d-bad1"}
    assert dead.count() == 1
