"""Source readers: NDJSON with dead-letter capture, fallback-envelope
replay, typed CSV with header normalization (S4-S6 / W11)."""

from __future__ import annotations

import os

from pyspark.sql import types as T

from jitsu_spark.sources import (
    parse_fallback_envelope,
    read_csv_typed,
    read_ndjson,
    split_malformed,
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def test_ndjson_dead_letter_split(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "in.json")
    with open(p, "w") as f:
        f.write('{"event_id": "a", "n": 1}\n')
        f.write("{this is not json\n")
        f.write('{"event_id": "b", "n": 2}\n')
    good, bad = read_ndjson(spark, p, EVENT_SCHEMA)
    assert {r["event_id"] for r in good.collect()} == {"a", "b"}
    bads = bad.collect()
    assert len(bads) == 1
    assert "not json" in bads[0]["raw"] and bads[0]["error"] == "malformed json"


def test_fallback_envelope_roundtrip(spark, tmpdir_path):
    import json

    p = os.path.join(tmpdir_path, "fb.json")
    with open(p, "w") as f:
        f.write(json.dumps({"event": {"event_id": "x", "n": 7}, "error": "boom"}) + "\n")
    raw = spark.read.text(p).withColumnRenamed("value", "raw")
    out = parse_fallback_envelope(raw, EVENT_SCHEMA)
    rows = out.collect()
    assert rows[0]["event_id"] == "x" and rows[0]["n"] == 7


def test_csv_typed_normalized_headers(spark, tmpdir_path):
    p = os.path.join(tmpdir_path, "in.csv")
    with open(p, "w") as f:
        f.write("User ID,Amount (USD),When\n")
        f.write("u1,12.5,2024-03-05T10:00:00Z\n")
    df = read_csv_typed(
        spark, p,
        {"user_id": "string", "amount__usd_": "double", "when": "timestamp"},
    )
    assert set(df.columns) == {"user_id", "amount__usd_", "when"}
    r = df.collect()[0]
    assert r["amount__usd_"] == 12.5
    assert r["when"].year == 2024


def test_split_malformed_column(spark):
    df = spark.createDataFrame(
        [("ok", '{"event_id":"a","n":1}'), ("bad", "{nope"), ("nul", None)],
        ["tag", "payload"],
    )
    good, bad = split_malformed(df, "payload", EVENT_SCHEMA)
    assert {r["tag"] for r in good.collect()} == {"ok", "nul"}
    assert bad.collect()[0]["raw"] == "{nope"


# ---------------------------------------------------------------------------
# S8: interval pull-sync
# ---------------------------------------------------------------------------

def test_interval_sync_signature_gated(spark, tmpdir_path):
    """Initial sync loads every interval; an unchanged re-run skips all;
    a single-interval upstream change re-syncs ONLY that interval and the
    final state reflects it (reference driver.go/time_interval.go
    semantics over overwrite_where)."""
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

    class FakeAPI(IntervalDriver):
        """Two monthly intervals; `bump` simulates an upstream edit to
        January (new rows + new watermark)."""

        def __init__(self):
            self.bump = 0

        def available_intervals(self):
            return [
                TimeInterval("2024-01", "2024-01-01 00:00:00", "2024-02-01 00:00:00"),
                TimeInterval("2024-02", "2024-02-01 00:00:00", "2024-03-01 00:00:00"),
            ]

        def signature(self, itv):
            return f"sig-{self.bump}" if itv.id == "2024-01" else "sig-0"

        def read_interval(self, spark_, itv):
            month = itv.id
            amount = 100.0 + self.bump if month == "2024-01" else 200.0
            rows = [
                (f"{month}-r{i}", f"{month}-15 00:00:0{i}", amount)
                for i in range(3)
            ]
            return spark_.createDataFrame(rows, ["rid", "ts_s", "amount"]).select(
                "rid", F.col("ts_s").cast("timestamp").alias("ts"), "amount"
            )

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "tbl"), schema, "rid", n_buckets=4
    )
    api = FakeAPI()
    job = IntervalSyncJob(t, api, "ts", os.path.join(tmpdir_path, "state.json"))

    r1 = job.run_once(spark)
    assert r1.synced == ["2024-01", "2024-02"] and r1.skipped == []
    assert t.read().count() == 6

    # unchanged upstream: everything skipped, table untouched
    v = t.snapshot().version
    r2 = job.run_once(spark)
    assert r2.synced == [] and set(r2.skipped) == {"2024-01", "2024-02"}
    assert t.snapshot().version == v

    # upstream edit to January only
    api.bump = 1
    r3 = job.run_once(spark)
    assert r3.synced == ["2024-01"] and r3.skipped == ["2024-02"]
    rows = {r["rid"]: r["amount"] for r in t.read().collect()}
    assert len(rows) == 6
    assert all(v == 101.0 for k, v in rows.items() if k.startswith("2024-01"))
    assert all(v == 200.0 for k, v in rows.items() if k.startswith("2024-02"))

    # lost sidecar state + unchanged upstream: the engine's commit
    # manifest still makes the re-apply idempotent (same chunk_id:sig)
    os.remove(os.path.join(tmpdir_path, "state.json"))
    v = t.snapshot().version
    r4 = job.run_once(spark)
    assert set(r4.synced) == {"2024-01", "2024-02"}  # state says resync...
    assert t.snapshot().version == v  # ...but the manifest skipped both
