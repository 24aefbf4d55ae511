"""Transform-surface tests: flatten golden case (FIXTURES.md §4), mapping
rules, enrichment determinism, routing skip semantics, salted aggregation
equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from jitsu_spark.changelog import changelog_df
from jitsu_spark.operators import (
    apply_mappings,
    flatten,
    normalize_name,
    parse_rule,
    route_to_tables,
    salted_agg,
    salted_lww,
    table_name_expr,
    with_context_enrichment,
    with_deterministic_event_id,
)
from jitsu_spark.operators.mapping import MappingRule


def test_flatten_golden_case(spark):
    """The reference's canonical fixture shape: nested maps -> a_b columns,
    arrays -> JSON strings, scalars pass through."""
    df = spark.createDataFrame(
        [
            Row(
                eventn_ctx=Row(event_id="123"),
                key1=Row(inner_key_1=["1", "2", "3"], inner_key_2="test"),
                key2=5,
            )
        ]
    )
    out = flatten(df)
    row = out.collect()[0].asDict()
    assert row == {
        "eventn_ctx_event_id": "123",
        "key1_inner_key_1": '["1","2","3"]',
        "key1_inner_key_2": "test",
        "key2": 5,
    }


def test_flatten_deep_nesting_and_keep(spark):
    df = spark.createDataFrame(
        [Row(a=Row(b=Row(c=1)), tokens=[1, 2, 3])]
    )
    out = flatten(df, keep=("tokens",))
    row = out.collect()[0].asDict()
    assert row["a_b_c"] == 1
    assert row["tokens"] == [1, 2, 3]  # native array preserved


@pytest.mark.parametrize(
    "raw,want",
    [
        ("Shoes san-francisco", "shoes_san_francisco"),
        ("column(with)specials!", "column_with_specials_"),
        ("a.b,c;d:e", "a_b_c_d_e"),
        ("UPPER", "upper"),
    ],
)
def test_normalize_name(raw, want):
    assert normalize_name(raw) == want


def test_parse_rule_styles():
    r = parse_rule("/a/b -> (integer) /c")
    assert (r.kind, r.src, r.dst, r.cast_type) == ("cast", "a_b", "c", "integer")
    r = parse_rule("/a/b -> /c/d")
    assert (r.kind, r.src, r.dst) == ("move", "a_b", "c_d")
    r = parse_rule("/drop/me -> ")
    assert (r.kind, r.src) == ("remove", "drop_me")


def test_apply_mappings_move_cast_constant_strict(spark):
    df = spark.createDataFrame([Row(a_b="7", drop_me=1, untouched="x")])
    rules = [
        parse_rule("/a/b -> (integer) /c"),
        parse_rule("/drop/me -> "),
        MappingRule(kind="constant", dst="v", value="const"),
    ]
    out = apply_mappings(df, rules, keep_unmapped=True)
    row = out.collect()[0].asDict()
    assert row == {"untouched": "x", "c": 7, "v": "const"}
    strict = apply_mappings(df, rules, keep_unmapped=False)
    assert set(strict.columns) == {"c", "v"}


def test_deterministic_event_id(spark):
    df = spark.createDataFrame([Row(a=1, b="x"), Row(a=1, b="x"), Row(a=2, b="y")])
    out = with_deterministic_event_id(df).collect()
    assert out[0]["event_id"] == out[1]["event_id"]  # same payload, same id
    assert out[0]["event_id"] != out[2]["event_id"]
    # existing ids are preserved (coalesce)
    df2 = spark.createDataFrame([Row(a=1, event_id="keep"), Row(a=2, event_id=None)])
    got = {r["a"]: r["event_id"] for r in with_deterministic_event_id(df2).collect()}
    assert got[1] == "keep" and got[2] is not None


def test_context_enrichment_conditional_src(spark):
    df = spark.createDataFrame([Row(a=1, src="api"), Row(a=2, src=None)])
    out = with_context_enrichment(df, api_key="tok1", src="js")
    rows = {r["a"]: r for r in out.collect()}
    assert rows[1]["src"] == "api"  # api events keep their src (P13)
    assert rows[2]["src"] == "js"
    assert rows[1]["api_key"] == "tok1"
    assert rows[1]["_timestamp"] is not None


def test_table_routing_and_skip(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [
            Row(event_type="Sign-Up", ts=dt.datetime(2024, 3, 5)),
            Row(event_type=None, ts=dt.datetime(2024, 3, 5)),
        ]
    )
    out = route_to_tables(df.withColumn("_t", table_name_expr("events_{ts:yyyy_MM}")),
                          "events_{ts:yyyy_MM}")
    assert [r["_table"] for r in out.collect()] == ["events_2024_03", "events_2024_03"]
    # content-based routing; NULL column -> empty name -> row skipped
    routed = route_to_tables(df, "{event_type}")
    rows = routed.collect()
    assert len(rows) == 1 and rows[0]["_table"] == "sign_up"


def test_salted_agg_equals_plain(spark):
    log = changelog_df(spark, n_events=2000, n_docs=50, seed=5, hot_key_pct=0.3)
    plain = {
        (r["source"]): (r["n"], r["s"])
        for r in log.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tok").alias("s"))
        .collect()
    }
    salted = {
        (r["source"]): (r["n"], r["s"])
        for r in salted_agg(
            log, ["source"], {"n": ("count", "*"), "s": ("sum", "n_tok")}, n_salts=8
        ).collect()
    }
    assert plain == salted


def test_salted_lww_equals_hash_agg_lww(spark):
    log = changelog_df(spark, n_events=3000, n_docs=40, seed=9, hot_key_pct=0.4)
    via_salt = {
        r["doc_id"]: (r["seq"], r["n_tok"])
        for r in salted_lww(
            log, "doc_id", "seq", ["op", "n_tok", "source"], n_salts=8
        ).collect()
    }
    via_agg = {
        r["doc_id"]: (r["seq"], r["n_tok"])
        for r in log.groupBy("doc_id")
        .agg(
            F.max_by(F.struct("n_tok"), F.col("seq")).alias("_w"),
            F.max("seq").alias("seq"),
        )
        .select("doc_id", "seq", "_w.n_tok")
        .collect()
    }
    assert via_salt == via_agg
