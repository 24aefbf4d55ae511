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
